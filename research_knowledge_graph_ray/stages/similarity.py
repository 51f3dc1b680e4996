"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — numpy matmul per batch against a
broadcast query matrix, per-batch partial top-k, tiny global sort. Scale path:
IVF (coarse-quantizer bucketing with nprobe probing) — the same per-batch
kernel over a pruned subset. Both deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data


def _load_query_vec(sf_dir: str, query_vec_id: int) -> np.ndarray:
    
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "=", query_vec_id)],
    )
    return np.asarray(t["embedding"].to_pylist()[0], dtype=np.float64)


def _batch_vecs(batch: pa.Table) -> np.ndarray:
    emb = batch["embedding"]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    flat = np.asarray(emb.flatten().to_numpy(zero_copy_only=False), dtype=np.float64)
    return flat.reshape(batch.num_rows, -1)


def knn_topk(sf_dir: str, query_vec_id: int = 0, k: int = 10) -> "ray.data.Dataset":
    """(vec_id, sim_e6) — exact cosine top-k vs one stored query vector.

    The query vector is broadcast once (ray.put), per-batch partial top-k keeps
    only k rows per batch, and the global sort runs over ~k×n_batches rows."""
    q = _load_query_vec(sf_dir, query_vec_id)
    q = q / np.linalg.norm(q)
    q_ref = ray.put(q)

    def score(batch: pa.Table) -> pd.DataFrame:
        qv = ray.get(q_ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = ids != query_vec_id
        vecs = _batch_vecs(batch)[mask]
        ids = ids[mask]
        if len(ids) == 0:
            return pd.DataFrame({"vec_id": pd.Series(dtype=np.int64),
                                 "sim_e6": pd.Series(dtype=np.int64)})
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        sims = (vecs @ qv) / norms
        top = np.argsort(-sims, kind="stable")[:k]
        return pd.DataFrame(
            {"vec_id": ids[top],
             "sim_e6": np.round(sims[top] * 1e6).astype(np.int64)}
        )

    scored = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return scored.sort(["sim_e6", "vec_id"], descending=[True, False]).limit(k)


def kmeans_centroids(
    ds: "ray.data.Dataset", k: int = 16, iters: int = 5,
) -> np.ndarray:
    """Distributed Lloyd's k-means over an ``embedding`` column (the
    production coarse quantizer for IVF). Deterministic: init = first ``k``
    vectors, unit-normalized. Each iteration broadcasts the (tiny) centroid
    matrix, computes per-batch partial (sum, count) per centroid with one
    matmul, and reduces the k×(dim+1) partials on the driver — the classic
    broadcast-partials pattern; no shuffle, data never leaves its blocks."""
    head = ds.limit(k).to_pandas()
    cents = np.stack([np.asarray(v, dtype=np.float64) for v in head["embedding"]])
    n = np.linalg.norm(cents, axis=1, keepdims=True)
    n[n == 0] = 1.0
    cents = cents / n

    for _ in range(iters):
        c_ref = ray.put(cents)

        def partial(batch: pa.Table) -> pd.DataFrame:
            cv = ray.get(c_ref)
            vecs = _batch_vecs(batch)
            norms = np.linalg.norm(vecs, axis=1)
            norms[norms == 0] = 1.0
            unit = vecs / norms[:, None]
            assign = np.argmax(unit @ cv.T, axis=1)
            sums = np.zeros_like(cv)
            np.add.at(sums, assign, unit)
            counts = np.bincount(assign, minlength=len(cv)).astype(np.float64)
            return pd.DataFrame(
                {"cid": np.arange(len(cv)),
                 "vsum": [row.tobytes() for row in sums],
                 "cnt": counts}
            )

        parts = ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
        sums = np.zeros_like(cents)
        counts = np.zeros(len(cents))
        for cid, blob, cnt in zip(parts["cid"], parts["vsum"], parts["cnt"]):
            sums[cid] += np.frombuffer(blob, dtype=np.float64)
            counts[cid] += cnt
        nonzero = counts > 0
        new = cents.copy()
        new[nonzero] = sums[nonzero] / counts[nonzero, None]
        norms = np.linalg.norm(new, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cents = new / norms
    return cents


def knn_topk_ivf(
    sf_dir: str, query_vec_id: int = 0, k: int = 10,
    n_centroids: int = 16, nprobe: int = 4, centroid_mode: str = "head",
    kmeans_iters: int = 5,
) -> "ray.data.Dataset":
    """Approximate IVF top-k: vectors bucketed to their nearest centroid;
    only the query's ``nprobe`` nearest buckets are scanned.

    ``centroid_mode="head"`` uses the first ``n_centroids`` stored vectors as
    the deterministic coarse quantizer (cheap default); ``"kmeans"`` trains
    :func:`kmeans_centroids` (the production path — better-balanced buckets
    at the cost of ``iters`` passes over the embeddings).

    At cluster scale the centroid matrix is broadcast and the non-probed
    buckets are pruned before any distance work. Recall vs exact top-k is
    validated in pytest; not SQL-expressible → rows-only oracle."""
    if centroid_mode == "kmeans":
        ds0 = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        cents = kmeans_centroids(ds0, k=n_centroids, iters=kmeans_iters)
    else:
        t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        head = t.slice(0, n_centroids)
        cents = np.stack([np.asarray(v, dtype=np.float64)
                          for v in head["embedding"].to_pylist()])
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)

    q = _load_query_vec(sf_dir, query_vec_id)
    q = q / np.linalg.norm(q)
    probe = set(np.argsort(-(cents @ q), kind="stable")[:nprobe].tolist())
    c_ref = ray.put(cents)
    q_ref = ray.put(q)
    probe_ref = ray.put(probe)

    def score(batch: pa.Table) -> pd.DataFrame:
        cv, qv, pr = ray.get(c_ref), ray.get(q_ref), ray.get(probe_ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = _batch_vecs(batch)
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        assign = np.argmax(unit @ cv.T, axis=1)
        mask = np.array([a in pr for a in assign]) & (ids != query_vec_id)
        ids, unit = ids[mask], unit[mask]
        if len(ids) == 0:
            return pd.DataFrame({"vec_id": pd.Series(dtype=np.int64),
                                 "sim_e6": pd.Series(dtype=np.int64)})
        sims = unit @ qv
        top = np.argsort(-sims, kind="stable")[:k]
        return pd.DataFrame(
            {"vec_id": ids[top], "sim_e6": np.round(sims[top] * 1e6).astype(np.int64)}
        )

    scored = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return scored.sort(["sim_e6", "vec_id"], descending=[True, False]).limit(k)
