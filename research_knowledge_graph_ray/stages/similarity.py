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
import pyarrow.compute as pc
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
    if (pa.types.is_list(emb.type) or pa.types.is_large_list(emb.type)
            or pa.types.is_fixed_size_list(emb.type)):
        flat = np.asarray(emb.flatten().to_numpy(zero_copy_only=False),
                          dtype=np.float64)
        return flat.reshape(batch.num_rows, -1)
    # Ray tensor extension array (in-pipeline embedder output)
    return np.asarray(emb.to_numpy(zero_copy_only=False), dtype=np.float64)


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
        # Pre-cut on the ORACLE's order — (round(sim*1e6) DESC, vec_id ASC) —
        # not raw floats, so two vectors rounding to the same sim_e6 that
        # straddle a block's k-boundary can't diverge from the SQL gate.
        sims_e6 = np.round(sims * 1e6).astype(np.int64)
        top = np.argsort(_topk_keys(sims_e6, ids), kind="stable")[:k]
        return pd.DataFrame({"vec_id": ids[top], "sim_e6": sims_e6[top]})

    scored = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return scored.sort(["sim_e6", "vec_id"], descending=[True, False]).limit(k)


def hash_sample_vectors(ds: "ray.data.Dataset", k: int) -> np.ndarray:
    """Deterministic content-hash sample of ``k`` vectors from an
    ``embedding`` column: each block keeps its k smallest md5(vector-bytes)
    rows, the driver merges the tiny partials. Hashing the CONTENT (not the
    row position) spreads the sample uniformly even when the table is sorted
    or clustered — the failure mode of first-N initialization, where every
    seed lands in one cluster and one IVF bucket degenerates to brute force."""
    import hashlib

    def part(batch: pa.Table) -> pd.DataFrame:
        vecs = _batch_vecs(batch)
        keys = [hashlib.md5(row.tobytes()).hexdigest()[:16] for row in vecs]
        df = pd.DataFrame({"hkey": keys, "v": [row.tobytes() for row in vecs]})
        return df.sort_values("hkey").head(k)

    parts = ds.map_batches(part, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    sel = parts.sort_values("hkey").drop_duplicates("hkey").head(k)
    return np.stack([np.frombuffer(b, np.float64) for b in sel["v"]])


def kmeans_centroids(
    ds: "ray.data.Dataset", k: int = 16, iters: int = 5,
) -> np.ndarray:
    """Distributed Lloyd's k-means over an ``embedding`` column (the
    production coarse quantizer for IVF). Deterministic: init = content-hash
    sample (:func:`hash_sample_vectors` — robust to sorted/clustered input),
    unit-normalized. Each iteration broadcasts the (tiny) centroid matrix,
    computes per-batch partial (sum, count) per centroid with one matmul,
    and reduces the k×(dim+1) partials on the driver — the classic
    broadcast-partials pattern; no shuffle, data never leaves its blocks."""
    cents = hash_sample_vectors(ds, k)
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
    n_centroids: int = 16, nprobe: int = 4, centroid_mode: str = "kmeans",
    kmeans_iters: int = 3,
) -> "ray.data.Dataset":
    """Approximate IVF top-k: vectors bucketed to their nearest centroid;
    only the query's ``nprobe`` nearest buckets are scanned.

    ``centroid_mode="kmeans"`` (default — the production path) trains
    :func:`kmeans_centroids`: content-hash-sampled init + ``kmeans_iters``
    Lloyd passes, giving balanced buckets even on sorted/clustered tables;
    ``"head"`` keeps the first ``n_centroids`` stored vectors as a cheap
    quantizer for comparison (degenerates on clustered data — pinned by
    ``test_ivf_kmeans_beats_head_on_clustered``).

    At cluster scale the centroid matrix is broadcast and the non-probed
    buckets are pruned before any distance work. With ``nprobe ==
    n_centroids`` every bucket is scanned and the result is EXACT — that
    configuration (:func:`knn_topk_ivf_exact`) is the SQL oracle gate, same
    contract as :func:`knn_join_ivf`; recall at smaller ``nprobe`` is
    validated in pytest."""
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
        # same oracle-order pre-cut as knn_topk: rounded sim + vec_id tie-break
        sims_e6 = np.round(sims * 1e6).astype(np.int64)
        top = np.argsort(_topk_keys(sims_e6, ids), kind="stable")[:k]
        return pd.DataFrame({"vec_id": ids[top], "sim_e6": sims_e6[top]})

    scored = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return scored.sort(["sim_e6", "vec_id"], descending=[True, False]).limit(k)


def knn_topk_ivf_exact(sf_dir: str, query_vec_id: int = 0,
                       k: int = 10) -> "ray.data.Dataset":
    """:func:`knn_topk_ivf` at ``nprobe == n_centroids`` — the full IVF
    dataflow (centroid assign → bucket prune → per-bucket matmul top-k →
    tiny global sort) with every bucket probed, so the answer equals the
    brute-force top-k and the ``knn_topk`` SQL oracle gates it exactly."""
    return knn_topk_ivf(sf_dir, query_vec_id=query_vec_id, k=k,
                        n_centroids=16, nprobe=16)


_KEY_SHIFT = np.int64(1) << np.int64(32)  # lexicographic (−sim_e6, nn_id) key


def _topk_keys(sims_e6: np.ndarray, nn_ids: np.ndarray) -> np.ndarray:
    """int64 sort keys ordering by (sim_e6 DESC, nn_id ASC) — one argsort per
    row instead of a per-row lexsort."""
    return (np.int64(1_000_000) - sims_e6) * _KEY_SHIFT + nn_ids


def _load_unit_matrix(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy().astype(np.int64)
    flat = np.asarray(t["embedding"].combine_chunks().flatten()
                      .to_numpy(zero_copy_only=False), dtype=np.float64)
    mat = flat.reshape(len(ids), -1)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, mat / norms


def knn_join(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """(vec_id, nn_id, nn_rank, sim_e6) — cosine k-nearest-neighbor SELF-JOIN:
    every vector's top-k neighbors (self excluded; ties broken by nn_id).

    The brute-force baseline the brief names: the build side is broadcast
    ONCE as a unit-normalized matrix (``ray.put``), each batch of query rows
    is one matmul against it, and per-row top-k is a single argsort over a
    packed (−sim, id) integer key — no per-row Python, no shuffle at all.
    Valid while the build side is broadcast-sized; past that, switch to
    :func:`knn_join_ivf`, whose bucketed exchange never materializes the
    build side in one place."""
    ids, unit = _load_unit_matrix(sf_dir)
    b_ref = ray.put((ids, unit))

    def score(batch: pa.Table) -> pd.DataFrame:
        b_ids, b_unit = ray.get(b_ref)
        q_ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = _batch_vecs(batch)
        nq = np.linalg.norm(q, axis=1, keepdims=True)
        nq[nq == 0] = 1.0
        sims_e6 = np.round((q / nq) @ b_unit.T * 1e6).astype(np.int64)
        keys = _topk_keys(sims_e6, b_ids[None, :].repeat(len(q_ids), axis=0))
        keys[q_ids[:, None] == b_ids[None, :]] = np.iinfo(np.int64).max  # self
        top = np.argsort(keys, axis=1, kind="stable")[:, :k]
        rows = np.repeat(np.arange(len(q_ids)), k)
        cols = top.ravel()
        return pd.DataFrame(
            {
                "vec_id": q_ids[rows],
                "nn_id": b_ids[cols],
                "nn_rank": np.tile(np.arange(1, k + 1, dtype=np.int64),
                                   len(q_ids)),
                "sim_e6": sims_e6[rows, cols],
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def knn_join_ivf(
    sf_dir: str, k: int = 3, n_centroids: int = 16, nprobe: int = 16,
    centroid_mode: str = "kmeans", kmeans_iters: int = 3,
) -> "ray.data.Dataset":
    """(vec_id, nn_id, nn_rank, sim_e6) — the DISTRIBUTED kNN self-join: IVF
    bucketing with nprobe probing, no broadcast of the build side.

    Dataflow: one map assigns each vector to its nearest-centroid bucket
    (build role) and fans it out to its ``nprobe`` nearest buckets (query
    role) — a build vector lives in exactly one bucket, so (query, build)
    pairs are never duplicated across buckets. One exchange co-locates each
    bucket; the per-bucket kernel is the same matmul + packed-key argsort as
    the brute path, emitting per-bucket top-k partials. A second, tiny
    exchange on vec_id (≤ nprobe·k rows per query) merges partials into the
    global top-k. With ``nprobe == n_centroids`` the result is EXACT (that
    configuration is the oracle gate); smaller nprobe trades recall for a
    pruned candidate set — pinned by pytest against the brute join."""
    from .shuffle import bucketed_group_apply

    emb_ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                   columns=["vec_id", "embedding"])
    if centroid_mode == "kmeans":
        cents = kmeans_centroids(emb_ds, k=n_centroids, iters=kmeans_iters)
    else:
        t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        head = t.slice(0, n_centroids)
        cents = np.stack([np.asarray(v, dtype=np.float64)
                          for v in head["embedding"].to_pylist()])
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    c_ref = ray.put(cents)
    nprobe = min(nprobe, n_centroids)

    def fanout(batch: pa.Table) -> pd.DataFrame:
        cv = ray.get(c_ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = _batch_vecs(batch)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        sims_c = unit @ cv.T
        order = np.argsort(-sims_c, axis=1, kind="stable")
        build_b = order[:, 0]
        probe_b = order[:, :nprobe]
        n, d = unit.shape
        vb = [row.tobytes() for row in unit]
        return pd.DataFrame(
            {
                "bucket": np.concatenate([build_b, probe_b.ravel()]),
                "vid": np.concatenate([ids, np.repeat(ids, nprobe)]),
                "role": np.concatenate(
                    [np.zeros(n, np.int8), np.ones(n * nprobe, np.int8)]
                ),
                "v": vb + [vb[i] for i in np.repeat(np.arange(n), nprobe)],
            }
        )

    def bucket_knn(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"vec_id": pd.Series(dtype=np.int64),
             "nn_id": pd.Series(dtype=np.int64),
             "sim_e6": pd.Series(dtype=np.int64)}
        )
        if df.empty:
            return empty
        out = []
        for _, g in df.groupby("bucket", sort=False):
            b = g[g["role"] == 0]
            q = g[g["role"] == 1]
            if b.empty or q.empty:
                continue
            b_ids = b["vid"].to_numpy(np.int64)
            q_ids = q["vid"].to_numpy(np.int64)
            b_m = np.frombuffer(b"".join(b["v"]), np.float64).reshape(len(b), -1)
            q_m = np.frombuffer(b"".join(q["v"]), np.float64).reshape(len(q), -1)
            sims_e6 = np.round(q_m @ b_m.T * 1e6).astype(np.int64)
            keys = _topk_keys(sims_e6, b_ids[None, :].repeat(len(q_ids), axis=0))
            keys[q_ids[:, None] == b_ids[None, :]] = np.iinfo(np.int64).max
            kk = min(k, len(b_ids))
            top = np.argsort(keys, axis=1, kind="stable")[:, :kk]
            rows = np.repeat(np.arange(len(q_ids)), kk)
            cols = top.ravel()
            sel = keys[rows, cols] != np.iinfo(np.int64).max  # drop self-only
            out.append(pd.DataFrame(
                {"vec_id": q_ids[rows][sel], "nn_id": b_ids[cols][sel],
                 "sim_e6": sims_e6[rows, cols][sel]}
            ))
        return pd.concat(out, ignore_index=True) if out else empty

    partials = bucketed_group_apply(
        emb_ds.map_batches(fanout, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["bucket"],
        lambda df: df,
        bucket_knn,
    )

    def merge_topk(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"vec_id": pd.Series(dtype=np.int64),
             "nn_id": pd.Series(dtype=np.int64),
             "nn_rank": pd.Series(dtype=np.int64),
             "sim_e6": pd.Series(dtype=np.int64)}
        )
        if df.empty:
            return empty
        df = df.copy()
        df["key"] = _topk_keys(df["sim_e6"].to_numpy(np.int64),
                               df["nn_id"].to_numpy(np.int64))
        df = df.sort_values(["vec_id", "key"], kind="mergesort")
        df = df.groupby("vec_id", sort=False).head(k)
        df["nn_rank"] = df.groupby("vec_id", sort=False).cumcount() + 1
        return df[["vec_id", "nn_id", "nn_rank", "sim_e6"]]

    def shrink(df: pd.DataFrame) -> pd.DataFrame:
        # per-block partial top-k before the exchange on vec_id
        if df.empty:
            return df
        df = df.copy()
        df["key"] = _topk_keys(df["sim_e6"].to_numpy(np.int64),
                               df["nn_id"].to_numpy(np.int64))
        df = df.sort_values(["vec_id", "key"], kind="mergesort")
        return df.groupby("vec_id", sort=False).head(k)[
            ["vec_id", "nn_id", "sim_e6"]]

    return bucketed_group_apply(partials, ["vec_id"], shrink, merge_topk)


def _knn_join_plan(sf_dir: str, broadcast_cap_bytes: int) -> str:
    """'brute' while the build side's unit matrix (n × d float64) fits under
    the broadcast cap, else 'ivf'. Sizing comes from parquet metadata plus
    one single-row batch for the dimension — no data scan."""
    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    n = pf.metadata.num_rows
    if n == 0:
        return "brute"
    first = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
    d = len(first["embedding"][0])
    return "brute" if n * d * 8 <= broadcast_cap_bytes else "ivf"


def knn_join_auto(sf_dir: str, k: int = 3,
                  broadcast_cap_bytes: int = 256 << 20) -> "ray.data.Dataset":
    """:func:`knn_join` behind an ADAPTIVE dispatch (the auto_hash_join
    precedent): the brute broadcast path runs only while the build side's
    unit matrix fits under ``broadcast_cap_bytes``; past that the
    distributed IVF twin runs in its EXACT configuration
    (``nprobe == n_centroids``) — same oracle either way, so the broadcast
    assumption can never be violated silently at scale."""
    if _knn_join_plan(sf_dir, broadcast_cap_bytes) == "brute":
        return knn_join(sf_dir, k=k)
    return knn_join_ivf(sf_dir, k=k, n_centroids=16, nprobe=16)


# ---------------------------------------------------------------------------
# Integer-exact k-means (oracle-gated iterative clustering)
# ---------------------------------------------------------------------------

_KM_SCALE = 1_000_000
# translation to keep every quantized coordinate nonnegative: DuckDB's `//`
# truncates toward zero while numpy floors, so negative centroid sums would
# diverge — a distance-invariant shift makes every sum nonnegative and the
# two divisions identical. |x| < 4.0 is loudly asserted per batch.
_KM_OFFSET = 4 * _KM_SCALE


def _km_quant(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    x = _batch_vecs(batch)
    q = np.floor(x * _KM_SCALE).astype(np.int64) + _KM_OFFSET
    if q.min() < 0:
        raise ValueError(
            "embedding coordinate below -4.0; raise _KM_OFFSET "
            "(kmeans quantizer translation bound)")
    return ids, q


def _km_assign(q: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """argmin_c Σ(q−c)² with smallest-cid tie-break — expanded to exact
    int64 matmul form (‖q‖² − 2q·c + ‖c‖²; np.argmin takes the first min)."""
    qq = (q * q).sum(axis=1)
    cc = (cents * cents).sum(axis=1)
    d = qq[:, None] - 2 * (q @ cents.T) + cc[None, :]
    return np.argmin(d, axis=1), d


def kmeans_centroids_int(ds: "ray.data.Dataset", k: int = 8,
                         iters: int = 2) -> np.ndarray:
    """The integer Lloyd trainer behind :func:`embedding_kmeans` (and
    :func:`~.dedup.semdedup`): returns the k×d int64 centroid matrix in the
    translated quantized space. See :func:`embedding_kmeans` for the full
    doctrine; split out so composed operators train once and run their own
    label pass."""
    from .sampling import _hkeys

    def init_part(batch: pa.Table) -> pd.DataFrame:
        ids, q = _km_quant(batch)
        hk = _hkeys(ids)
        order = np.lexsort((ids, hk))[:k]
        return pd.DataFrame({
            "vec_id": ids[order], "hk": hk[order],
            "q": [q[o].tobytes() for o in order],
        })

    cand = (ds.map_batches(init_part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .to_pandas()  # ≤ k rows per block
            .sort_values(["hk", "vec_id"]).head(k))
    cents = np.stack([np.frombuffer(b, dtype=np.int64) for b in cand["q"]])

    for _ in range(iters):
        ref = ray.put(cents)

        def part(batch: pa.Table) -> pd.DataFrame:
            cv = ray.get(ref)
            ids, q = _km_quant(batch)
            assign, _ = _km_assign(q, cv)
            sums = np.zeros_like(cv)
            np.add.at(sums, assign, q)
            counts = np.bincount(assign, minlength=len(cv)).astype(np.int64)
            return pd.DataFrame({
                "cid": np.arange(len(cv), dtype=np.int64),
                "s": [row.tobytes() for row in sums],
                "n": counts,
            })

        parts = ds.map_batches(part, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
        sums = np.zeros_like(cents)
        counts = np.zeros(len(cents), dtype=np.int64)
        for cid, blob, n in zip(parts["cid"], parts["s"], parts["n"]):
            sums[cid] += np.frombuffer(blob, dtype=np.int64)
            counts[cid] += n
        live = counts > 0
        new = cents.copy()
        new[live] = sums[live] // counts[live, None]  # nonneg ⇒ floor==trunc
        cents = new
    return cents


def embedding_kmeans(sf_dir: str, k: int = 8,
                     iters: int = 2) -> "ray.data.Dataset":
    """(vec_id, cluster, dist) — Lloyd's k-means over the embeddings table in
    EXACT integer arithmetic, so the iterative algorithm itself is
    oracle-gated (``EMBEDDING_KMEANS_SQL`` replays every round bit-for-bit;
    same doctrine as the all-integer :func:`~.graphalgs.hits`).

    Coordinates quantize to ``floor(x·10⁶) + 4·10⁶`` (the translation keeps
    sums nonnegative — see ``_KM_OFFSET`` — and squared-L2 distances are
    translation-invariant, so cluster geometry is the float geometry at 1e-6
    resolution). Init is the k vectors of smallest ``(md5-hkey, vec_id)``
    (the repo's deterministic content-hash sampling convention — robust to
    sorted/clustered input, unlike first-N); each round assigns by exact
    int64 matmul and recomputes centroids as ``Σq // n`` with empty clusters
    carrying forward. ``dist`` is the final squared distance.

    Dataflow per round: centroid matrix broadcast via ``ray.put`` (k×d,
    model-sized), per-block partials collapse to k×(d+1) int64 sums/counts,
    driver fold — no shuffle, vectors never leave their blocks (the same
    broadcast-partials shape as the float :func:`kmeans_centroids` the IVF
    quantizer uses; this variant trades L2-normalized means for integer
    exactness to be driver-gatable). The final labeled output streams from
    one more map pass. Overflow: q ≤ 8·10⁶ ⇒ q·c sums < 2⁶³ for d ≤ 10⁵.

    Reference parity note: no counterpart in the reference — brief-mandated
    embedding-pipeline clustering (the iterative-ML family, oracle-gated
    where rows-only checks would otherwise apply)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    cents = kmeans_centroids_int(ds, k=k, iters=iters)
    final_ref = ray.put(cents)

    def label(batch: pa.Table) -> pd.DataFrame:
        cv = ray.get(final_ref)
        ids, q = _km_quant(batch)
        assign, d = _km_assign(q, cv)
        return pd.DataFrame({
            "vec_id": ids,
            "cluster": assign.astype(np.int64),
            "dist": d[np.arange(len(ids)), assign],
        })

    # the corpus-sized label table STREAMS — only centroids ever held
    return ds.map_batches(label, batch_format="pyarrow",
                          zero_copy_batch=True)


def embedding_kmeans_sql(k: int = 8, iters: int = 2) -> str:
    """Exact chained-CTE restatement of :func:`embedding_kmeans`."""
    head = f"""
WITH q AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS i,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {_KM_SCALE})
              AS BIGINT) + {_KM_OFFSET} AS qx
  FROM embeddings),
init AS (
  SELECT vec_id,
         ROW_NUMBER() OVER (
           ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))
                    ::UBIGINT, vec_id) - 1 AS cid
  FROM embeddings
  QUALIFY cid < {k}),
c0 AS (
  SELECT init.cid, q.i, q.qx AS cx FROM init JOIN q USING (vec_id))"""
    steps = []
    for t in range(1, iters + 1):
        steps.append(f"""
d{t} AS (
  SELECT q.vec_id, c.cid, SUM((q.qx - c.cx) * (q.qx - c.cx)) AS d
  FROM q JOIN c{t-1} c ON q.i = c.i GROUP BY 1, 2),
a{t} AS (
  SELECT vec_id, cid FROM d{t}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1),
s{t} AS (
  SELECT a.cid, q.i, SUM(q.qx) // COUNT(*) AS cx
  FROM a{t} a JOIN q USING (vec_id) GROUP BY 1, 2),
c{t} AS (
  SELECT c.cid, c.i, COALESCE(s.cx, c.cx) AS cx
  FROM c{t-1} c LEFT JOIN s{t} s ON c.cid = s.cid AND c.i = s.i)""")
    tail = f"""
df AS (
  SELECT q.vec_id, c.cid, SUM((q.qx - c.cx) * (q.qx - c.cx)) AS d
  FROM q JOIN c{iters} c ON q.i = c.i GROUP BY 1, 2)
SELECT vec_id, CAST(cid AS BIGINT) AS cluster, CAST(d AS BIGINT) AS dist
FROM df
QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1
ORDER BY vec_id"""
    return head + "," + ",".join(steps) + "," + tail


# ---------------------------------------------------------------------------
# Centroid silhouette (cluster-quality evaluation)
# ---------------------------------------------------------------------------


def cluster_silhouette(sf_dir: str, k: int = 8,
                       iters: int = 2) -> "ray.data.Dataset":
    """(vec_id, cluster, d_own, d_next, sil_e6) — centroid silhouette, the
    scale-friendly clustering-quality eval: per vector, ``d_own`` = squared
    distance to its own (argmin) centroid, ``d_next`` = the smallest squared
    distance to any OTHER centroid, and ``sil_e6 = (d_next − d_own)·10⁶ //
    max(d_own, d_next, 1)`` — the silhouette formula with the O(n²)
    point-pair means replaced by centroid distances (the standard
    approximation at corpus scale; exact integers end-to-end because it
    rides the :func:`kmeans_centroids_int` trainer). d_own ≤ d_next by
    construction, so the score is in [0, 1e6] and the floor-division is
    nonnegative (numpy floor == DuckDB trunc).

    Dataflow: the trained k×d centroid matrix broadcasts once; the scoring
    pass is one streaming map (one matmul per batch) — no shuffle, the
    :func:`embedding_kmeans` shape with a two-column wider output."""
    ds = _read_embeddings(sf_dir)
    cents = kmeans_centroids_int(ds, k=k, iters=iters)
    ref = ray.put(cents)

    def score(batch: pa.Table) -> pd.DataFrame:
        cv = ray.get(ref)
        ids, q = _km_quant(batch)
        assign, d = _km_assign(q, cv)
        rows = np.arange(len(ids))
        d_own = d[rows, assign]
        d2 = d.copy()
        d2[rows, assign] = np.iinfo(np.int64).max
        d_next = d2.min(axis=1)
        denom = np.maximum(np.maximum(d_own, d_next), 1)
        # (d_next − d_own)·1e6 exceeds int64 once squared distances pass
        # ~9e12 (unnormalized embeddings) — exact Python-int products
        # through an object-dtype C loop (HUGEINT in the oracle); the
        # quotient is ≤ 1e6 so the result always fits int64
        sil = ((d_next - d_own).astype(object) * 1_000_000
               // denom.astype(object)).astype(np.int64)
        return pd.DataFrame({
            "vec_id": ids, "cluster": assign.astype(np.int64),
            "d_own": d_own, "d_next": d_next, "sil_e6": sil})

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def cluster_silhouette_sql(k: int = 8, iters: int = 2) -> str:
    """Exact restatement of :func:`cluster_silhouette` — the
    :func:`embedding_kmeans_sql` chain with an own/next-centroid tail."""
    base = embedding_kmeans_sql(k, iters)
    chain = base[:base.index("SELECT vec_id, CAST(cid AS BIGINT)")]
    return chain + """
, own AS (
  SELECT vec_id, cid AS cluster, d AS d_own FROM df
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1),
nxt AS (
  SELECT f.vec_id, MIN(f.d) AS d_next
  FROM df f JOIN own o ON f.vec_id = o.vec_id AND f.cid != o.cluster
  GROUP BY 1)
SELECT o.vec_id, CAST(o.cluster AS BIGINT) AS cluster,
       CAST(o.d_own AS BIGINT) AS d_own,
       CAST(n.d_next AS BIGINT) AS d_next,
       CAST((n.d_next - o.d_own) * 1000000
            // GREATEST(o.d_own, n.d_next, 1) AS BIGINT) AS sil_e6
FROM own o JOIN nxt n ON n.vec_id = o.vec_id
ORDER BY o.vec_id"""


# ---------------------------------------------------------------------------
# Product quantization (PQ codes + asymmetric-distance search)
# ---------------------------------------------------------------------------

_PQ_K = 4       # codes per subspace (production: 256 = one byte per sub)
_PQ_ITERS = 2   # Lloyd rounds per subspace codebook
_PQ_TOPK = 10


def _half_embeddings(ds: "ray.data.Dataset", first_half: bool) -> "ray.data.Dataset":
    """(vec_id, embedding=one half of the dims) — vectorized ListArray
    rebuild (offsets + flat values), no per-row Python."""

    def cut(batch: pa.Table) -> pa.Table:
        x = _batch_vecs(batch)
        h = x.shape[1] // 2
        part = np.ascontiguousarray(x[:, :h] if first_half else x[:, h:])
        offs = np.arange(len(part) + 1, dtype=np.int32) * part.shape[1]
        emb = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()),
            pa.array(part.ravel(), type=pa.float64()))
        return pa.table({"vec_id": batch["vec_id"].cast(pa.int64()),
                         "embedding": emb})

    return ds.map_batches(cut, batch_format="pyarrow", zero_copy_batch=True)


def _pq_codebooks(ds: "ray.data.Dataset", k: int,
                  iters: int) -> list[np.ndarray]:
    """Two per-subspace integer codebooks from the shared Lloyd trainer.
    Init is identical for both subspaces by construction (the md5-rank init
    depends only on vec_id), which the single `init` CTE in the SQL
    restatement relies on."""
    return [kmeans_centroids_int(_half_embeddings(ds, True), k=k, iters=iters),
            kmeans_centroids_int(_half_embeddings(ds, False), k=k, iters=iters)]


def _read_embeddings(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def pq_codes(sf_dir: str, k: int = _PQ_K,
             iters: int = _PQ_ITERS) -> "ray.data.Dataset":
    """(vec_id, sub, code, dist) — product-quantization encoding (Jégou et
    al. 2011): the dims split into two subspaces, each with its own
    k-centroid integer codebook (the :func:`kmeans_centroids_int` trainer per
    subspace, same e6-quantized translated space), every vector stored as
    m=2 small codes. ``dist`` is the exact squared quantization error per
    subspace, so the oracle value-gates the whole codebook, not just the
    argmax.

    Dataflow: two Lloyd trainings (broadcast-partials, no shuffle — see
    :func:`embedding_kmeans`) + ONE streaming encode pass; at 100 TB the
    output is the 4-byte-per-vector index an ANN serving tier ships instead
    of the raw vectors (the memory path beyond :func:`embedding_quantize`'s
    int8). Long-form (vec_id, sub, code) so every code is value-hash gated.

    Reference parity note: no counterpart in the reference — brief-mandated
    similarity-search family; completes brute → IVF → int8 → PQ."""
    ds = _read_embeddings(sf_dir)
    ref = ray.put(_pq_codebooks(ds, k, iters))

    def code(batch: pa.Table) -> pd.DataFrame:
        cv = ray.get(ref)
        ids, q = _km_quant(batch)
        h = q.shape[1] // 2
        outs = []
        for sub, (sl, c) in enumerate(((slice(0, h), cv[0]),
                                       (slice(h, None), cv[1]))):
            a, d = _km_assign(q[:, sl], c)
            outs.append(pd.DataFrame({
                "vec_id": ids, "sub": np.full(len(ids), sub, np.int64),
                "code": a.astype(np.int64),
                "dist": d[np.arange(len(ids)), a]}))
        return pd.concat(outs, ignore_index=True)

    return ds.map_batches(code, batch_format="pyarrow", zero_copy_batch=True)


def pq_search(sf_dir: str, query_vec_id: int = 0, k: int = _PQ_K,
              iters: int = _PQ_ITERS, topk: int = _PQ_TOPK) -> pd.DataFrame:
    """(rank, vec_id, adist) — approximate top-k by PQ asymmetric distance:
    ``adist(v) = Σ_sub ‖q_sub − codebook[sub][code_v]‖²`` (exact ints). The
    per-(sub, code) lookup table is m×k entries computed ONCE from the query
    — per candidate the distance is two table reads and an add, never a
    d-dim dot product; that asymmetry is the whole point of PQ serving.

    Dataflow: codebooks broadcast, one streaming encode+score pass with
    per-block partial top-k (smallest (adist, vec_id)), report-sized driver
    cut — the :func:`knn_topk` shape. The query row itself is excluded."""
    ds = _read_embeddings(sf_dir)
    cents = _pq_codebooks(ds, k, iters)

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "==", query_vec_id)])
    qv = np.asarray(t["embedding"][0].as_py(), dtype=np.float64)
    qq = np.floor(qv * _KM_SCALE).astype(np.int64) + _KM_OFFSET
    h = len(qq) // 2
    lut = [((qq[sl][None, :] - c) ** 2).sum(axis=1)
           for sl, c in ((slice(0, h), cents[0]), (slice(h, None), cents[1]))]
    ref = ray.put((cents, lut))

    def part(batch: pa.Table) -> pd.DataFrame:
        cv, lt = ray.get(ref)
        ids, q = _km_quant(batch)
        a0, _ = _km_assign(q[:, :h], cv[0])
        a1, _ = _km_assign(q[:, h:], cv[1])
        adist = lt[0][a0] + lt[1][a1]
        keep = ids != query_vec_id
        ids, adist = ids[keep], adist[keep]
        order = np.lexsort((ids, adist))[:topk]
        return pd.DataFrame({"vec_id": ids[order], "adist": adist[order]})

    cand = (ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
            .to_pandas()
            .sort_values(["adist", "vec_id"]).head(topk)
            .reset_index(drop=True))
    cand.insert(0, "rank", np.arange(1, len(cand) + 1, dtype=np.int64))
    return cand


def _pq_chain_sql(k: int, iters: int) -> str:
    """Shared WITH-body: subspace explode → single init → per-round
    assign/recenter with `sub` in every key → final per-(vec, sub) argmin
    in `pqf`. Exact restatement of the two :func:`kmeans_centroids_int`
    runs inside :func:`pq_codes` (one chain suffices because the rounds
    never mix subspaces)."""
    head = f"""
WITH q0 AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS i,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {_KM_SCALE})
              AS BIGINT) + {_KM_OFFSET} AS qx,
         len(embedding) AS dd
  FROM embeddings),
qs AS (
  SELECT vec_id,
         CASE WHEN i <= dd // 2 THEN 0 ELSE 1 END AS sub,
         CASE WHEN i <= dd // 2 THEN i ELSE i - dd // 2 END AS i,
         qx
  FROM q0),
init AS (
  SELECT vec_id,
         ROW_NUMBER() OVER (
           ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))
                    ::UBIGINT, vec_id) - 1 AS cid
  FROM embeddings
  QUALIFY cid < {k}),
c0 AS (
  SELECT qs.sub, init.cid, qs.i, qs.qx AS cx FROM init JOIN qs USING (vec_id))"""
    steps = []
    for t in range(1, iters + 1):
        steps.append(f"""
d{t} AS (
  SELECT q.vec_id, q.sub, c.cid, SUM((q.qx - c.cx) * (q.qx - c.cx)) AS d
  FROM qs q JOIN c{t-1} c ON q.sub = c.sub AND q.i = c.i GROUP BY 1, 2, 3),
a{t} AS (
  SELECT vec_id, sub, cid FROM d{t}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d, cid) = 1),
s{t} AS (
  SELECT a.sub, a.cid, q.i, SUM(q.qx) // COUNT(*) AS cx
  FROM a{t} a JOIN qs q ON q.vec_id = a.vec_id AND q.sub = a.sub
  GROUP BY 1, 2, 3),
c{t} AS (
  SELECT c.sub, c.cid, c.i, COALESCE(s.cx, c.cx) AS cx
  FROM c{t-1} c LEFT JOIN s{t} s
    ON c.sub = s.sub AND c.cid = s.cid AND c.i = s.i)""")
    tail = f"""
pqd AS (
  SELECT q.vec_id, q.sub, c.cid, SUM((q.qx - c.cx) * (q.qx - c.cx)) AS d
  FROM qs q JOIN c{iters} c ON q.sub = c.sub AND q.i = c.i GROUP BY 1, 2, 3),
pqf AS (
  SELECT vec_id, sub, cid, d FROM pqd
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d, cid) = 1)"""
    return head + "," + ",".join(steps) + "," + tail


def pq_codes_sql(k: int = _PQ_K, iters: int = _PQ_ITERS) -> str:
    """Exact restatement of :func:`pq_codes`."""
    return _pq_chain_sql(k, iters) + """
SELECT vec_id, CAST(sub AS BIGINT) AS sub, CAST(cid AS BIGINT) AS code,
       CAST(d AS BIGINT) AS dist
FROM pqf ORDER BY vec_id, sub"""


def pq_search_sql(query_vec_id: int = 0, k: int = _PQ_K,
                  iters: int = _PQ_ITERS, topk: int = _PQ_TOPK) -> str:
    """Exact restatement of :func:`pq_search` (codes chain + query lookup
    table + two-read ADC sum)."""
    return _pq_chain_sql(k, iters) + f""",
lut AS (
  SELECT c.sub, c.cid, SUM((q.qx - c.cx) * (q.qx - c.cx)) AS l
  FROM c{iters} c JOIN qs q ON q.sub = c.sub AND q.i = c.i
  WHERE q.vec_id = {query_vec_id} GROUP BY 1, 2),
ad AS (
  SELECT v.vec_id, SUM(l.l) AS adist
  FROM pqf v JOIN lut l ON l.sub = v.sub AND l.cid = v.cid
  WHERE v.vec_id != {query_vec_id} GROUP BY 1)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY adist, vec_id) AS BIGINT) AS rank,
       vec_id, CAST(adist AS BIGINT) AS adist
FROM ad
QUALIFY rank <= {topk}
ORDER BY rank"""


# ---------------------------------------------------------------------------
# Cluster prototypes (per-cluster representative selection)
# ---------------------------------------------------------------------------


def cluster_prototypes(sf_dir: str, k: int = 8, iters: int = 2) -> pd.DataFrame:
    """(cluster, vec_id, dist) — the prototype of every k-means cluster: the
    member vector closest to its centroid (smallest (dist, vec_id)), i.e.
    the medoid-style representative a cluster-based data-pruning recipe
    keeps (the "prototypes" half of SemDeDup-style curation: keep one
    exemplar, drop the redundant shell).

    Dataflow: the integer Lloyd trainer + ONE streaming pass emitting a
    per-block (cluster, best-dist, best-id) partial — k rows per block, k
    rows to the driver fold; vectors never move."""
    ds = _read_embeddings(sf_dir)
    cents = kmeans_centroids_int(ds, k=k, iters=iters)
    ref = ray.put(cents)

    def part(batch: pa.Table) -> pd.DataFrame:
        cv = ray.get(ref)
        ids, q = _km_quant(batch)
        assign, d = _km_assign(q, cv)
        dd = d[np.arange(len(ids)), assign]
        df = pd.DataFrame({"cluster": assign.astype(np.int64),
                           "vec_id": ids, "dist": dd})
        df = df.sort_values(["cluster", "dist", "vec_id"], kind="stable")
        return df.drop_duplicates("cluster")

    parts = ds.map_batches(part, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    out = (parts.sort_values(["cluster", "dist", "vec_id"], kind="stable")
           .drop_duplicates("cluster").reset_index(drop=True))
    return out[["cluster", "vec_id", "dist"]].astype(np.int64)


def cluster_prototypes_sql(k: int = 8, iters: int = 2) -> str:
    """Exact restatement of :func:`cluster_prototypes` (kmeans chain +
    per-cluster argmin tail)."""
    base = embedding_kmeans_sql(k, iters)
    chain = base[:base.index("SELECT vec_id, CAST(cid AS BIGINT)")]
    return chain + """
, asg AS (
  SELECT vec_id, cid, d FROM df
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1)
SELECT CAST(cid AS BIGINT) AS cluster, vec_id, CAST(d AS BIGINT) AS dist
FROM asg
QUALIFY ROW_NUMBER() OVER (PARTITION BY cid ORDER BY d, vec_id) = 1
ORDER BY cluster"""


# ---------------------------------------------------------------------------
# Hard-negative mining (contrastive-training pair generation)
# ---------------------------------------------------------------------------

_HN_CAND = 10


def hard_negatives(sf_dir: str, n_cand: int = _HN_CAND) -> "ray.data.Dataset":
    """(vec_id, neg_id, sim_e6) — hard-negative mining for contrastive
    training: each vector's most similar neighbor with a DIFFERENT label
    among its ``n_cand`` nearest (highest sim, smallest neg_id on ties).
    Vectors whose whole candidate list shares their label emit nothing —
    exactly the rows a contrastive batch builder can use.

    Dataflow mirrors :func:`knn_classify`: candidates from
    :func:`knn_join_auto`, neighbor labels through ONE nn_id hash join,
    then ONE vec_id exchange carrying (vec_id, nn_id, sim, neighbor-label)
    + (vec_id, own-label) key rows; the reducer filters label mismatches
    and keeps the per-vector best — ≤ n_cand+1 rows per vector moved,
    vectors never."""
    from .join import hash_join
    from .shuffle import hash_exchange_apply

    knn = knn_join_auto(sf_dir, k=n_cand).map_batches(
        lambda t: t.select(["vec_id", "nn_id", "sim_e6"]),
        batch_format="pyarrow", zero_copy_batch=True)

    labels = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"]
    ).map_batches(
        lambda t: pa.table({"nid": t["vec_id"].cast(pa.int64()),
                            "nl": t["label"].cast(pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)

    nn_labeled = hash_join(knn, labels, "nn_id", "nid",
                           ["vec_id", "nn_id", "sim_e6"], ["nid", "nl"],
                           n_buckets=16).map_batches(
        lambda t: pa.table({
            "vec_id": t["vec_id"].cast(pa.int64()).combine_chunks(),
            "nn_id": t["nn_id"].cast(pa.int64()).combine_chunks(),
            "sim_e6": t["sim_e6"].cast(pa.int64()).combine_chunks(),
            "nl": t["nl"].cast(pa.int64()).combine_chunks(),
            "side": pa.array(["nn"] * t.num_rows)}),
        batch_format="pyarrow", zero_copy_batch=True)

    own = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"]
    ).map_batches(
        lambda t: pa.table({"vec_id": t["vec_id"].cast(pa.int64()),
                            "nn_id": pa.array([0] * len(t), pa.int64()),
                            "sim_e6": pa.array([0] * len(t), pa.int64()),
                            "nl": t["label"].cast(pa.int64()),
                            "side": pa.array(["own"] * len(t))}),
        batch_format="pyarrow", zero_copy_batch=True)

    _schema = pa.schema([("vec_id", pa.int64()), ("neg_id", pa.int64()),
                         ("sim_e6", pa.int64())])

    def pick(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "side" not in t.column_names:
            return _schema.empty_table()
        df = t.to_pandas()
        nn = df[df["side"] == "nn"]
        ow = df[df["side"] == "own"][["vec_id", "nl"]].rename(
            columns={"nl": "own"})
        if nn.empty or ow.empty:
            return _schema.empty_table()
        j = nn.merge(ow, on="vec_id", how="inner")
        j = j[j["nl"] != j["own"]]
        if j.empty:
            return _schema.empty_table()
        j = j.sort_values(["vec_id", "sim_e6", "nn_id"],
                          ascending=[True, False, True], kind="stable")
        j = j.drop_duplicates("vec_id")
        return pa.Table.from_pandas(
            j.rename(columns={"nn_id": "neg_id"})
            [["vec_id", "neg_id", "sim_e6"]].astype(np.int64)
            .reset_index(drop=True), preserve_index=False)

    return hash_exchange_apply(nn_labeled.union(own), ["vec_id"],
                               lambda t: t, pick, n_buckets=16)


def hard_negatives_sql(n_cand: int = _HN_CAND) -> str:
    """Exact restatement of :func:`hard_negatives`."""
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (SELECT a.vec_id AS vec_id, b.vec_id AS nn_id,
        CAST(ROUND(list_cosine_similarity(a.v, b.v) * 1000000) AS BIGINT)
          AS sim_e6
      FROM e a JOIN e b ON a.vec_id <> b.vec_id),
r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY sim_e6 DESC, nn_id) AS rnk
      FROM s),
knn AS (SELECT vec_id, nn_id, sim_e6 FROM r WHERE rnk <= {n_cand}),
lab AS (SELECT k.vec_id, k.nn_id, k.sim_e6, e1.label AS own, e2.label AS nl
        FROM knn k
        JOIN embeddings e1 ON e1.vec_id = k.vec_id
        JOIN embeddings e2 ON e2.vec_id = k.nn_id)
SELECT vec_id, nn_id AS neg_id, sim_e6
FROM lab WHERE nl != own
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY vec_id ORDER BY sim_e6 DESC, nn_id) = 1
ORDER BY vec_id"""


# ---------------------------------------------------------------------------
# kNN classification (majority vote over the kNN graph)
# ---------------------------------------------------------------------------

_KC_K = 5


def knn_classify(sf_dir: str, k: int = _KC_K) -> "ray.data.Dataset":
    """(vec_id, pred, label, correct) — k-nearest-neighbor label prediction
    over the embeddings table: each vector's label predicted by majority
    vote among its k cosine neighbors' labels (count DESC, smallest label on
    ties), compared against its own label. The classic leave-one-out eval of
    embedding quality — ``SUM(correct)/COUNT(*)`` is the kNN accuracy.

    Dataflow: candidate generation rides :func:`knn_join_auto` (brute
    broadcast under the byte cap, exact-config IVF past it — never a silent
    broadcast of a corpus-sized build side); neighbor labels attach through
    ONE hash join on nn_id (labels never broadcast — they are corpus-sized);
    the vote is ONE tagged-union exchange on vec_id carrying (vec_id,
    neighbor-label) + (vec_id, own-label) key rows only — ≤ k+1 rows per
    vector, vectors themselves never move."""
    from .join import hash_join
    from .shuffle import hash_exchange_apply

    knn = knn_join_auto(sf_dir, k=k).map_batches(
        lambda t: t.select(["vec_id", "nn_id"]),
        batch_format="pyarrow", zero_copy_batch=True)

    labels = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"]
    ).map_batches(
        lambda t: pa.table({"nid": t["vec_id"].cast(pa.int64()),
                            "nl": t["label"].cast(pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)

    nn_labeled = hash_join(knn, labels, "nn_id", "nid",
                           ["vec_id", "nn_id"], ["nid", "nl"],
                           n_buckets=16).map_batches(
        lambda t: pa.table({
            "vec_id": t["vec_id"].cast(pa.int64()).combine_chunks(),
            "nl": t["nl"].cast(pa.int64()).combine_chunks(),
            "side": pa.array(["nn"] * t.num_rows)}),
        batch_format="pyarrow", zero_copy_batch=True)

    own = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"]
    ).map_batches(
        lambda t: pa.table({"vec_id": t["vec_id"].cast(pa.int64()),
                            "nl": t["label"].cast(pa.int64()),
                            "side": pa.array(["own"] * t.num_rows)}),
        batch_format="pyarrow", zero_copy_batch=True)

    _schema = pa.schema([("vec_id", pa.int64()), ("pred", pa.int64()),
                         ("label", pa.int64()), ("correct", pa.int64())])

    def vote(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "side" not in t.column_names:
            return _schema.empty_table()
        df = t.to_pandas()
        nn = df[df["side"] == "nn"]
        ow = df[df["side"] == "own"]
        if nn.empty or ow.empty:
            return _schema.empty_table()
        c = (nn.groupby(["vec_id", "nl"], as_index=False)
             .agg(c=("nl", "size")))
        c = c.sort_values(["vec_id", "c", "nl"],
                          ascending=[True, False, True], kind="stable")
        p = c.drop_duplicates("vec_id")[["vec_id", "nl"]].rename(
            columns={"nl": "pred"})
        out = p.merge(ow[["vec_id", "nl"]].rename(columns={"nl": "label"}),
                      on="vec_id", how="inner")
        out["correct"] = (out["pred"] == out["label"]).astype(np.int64)
        return pa.Table.from_pandas(
            out.astype(np.int64)[["vec_id", "pred", "label", "correct"]],
            preserve_index=False)

    return hash_exchange_apply(nn_labeled.union(own), ["vec_id"],
                               lambda t: t, vote, n_buckets=16)


def knn_classify_sql(k: int = _KC_K) -> str:
    """Exact restatement of :func:`knn_classify` (knn CTE at rank ≤ k +
    neighbor-label majority with count DESC, label ASC)."""
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (SELECT a.vec_id AS vec_id, b.vec_id AS nn_id,
        CAST(ROUND(list_cosine_similarity(a.v, b.v) * 1000000) AS BIGINT)
          AS sim_e6
      FROM e a JOIN e b ON a.vec_id <> b.vec_id),
r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY sim_e6 DESC, nn_id) AS rnk
      FROM s),
knn AS (SELECT vec_id, nn_id FROM r WHERE rnk <= {k}),
v AS (SELECT kk.vec_id, e2.label AS nl
      FROM knn kk JOIN embeddings e2 ON e2.vec_id = kk.nn_id),
c AS (SELECT vec_id, nl, COUNT(*) AS c FROM v GROUP BY 1, 2),
p AS (SELECT vec_id, nl AS pred FROM c
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY vec_id ORDER BY c DESC, nl ASC) = 1)
SELECT p.vec_id, CAST(p.pred AS BIGINT) AS pred,
       CAST(e3.label AS BIGINT) AS label,
       CAST(CASE WHEN p.pred = e3.label THEN 1 ELSE 0 END AS BIGINT)
         AS correct
FROM p JOIN embeddings e3 ON e3.vec_id = p.vec_id
ORDER BY p.vec_id"""


# ---------------------------------------------------------------------------
# Johnson–Lindenstrauss random projection (dim reduction before ANN)
# ---------------------------------------------------------------------------

_RP_DIMS = 8


def _rp_sign(i: int, j: int) -> int:
    """±1 from the md5 parity of '{i}-{j}' (the repo's seeded-draw
    convention — DuckDB rebuilds the identical matrix)."""
    import hashlib as _h

    v = int(_h.md5(f"{i}-{j}".encode()).hexdigest()[:8], 16)
    return 1 if v % 2 == 0 else -1


def random_projection(sf_dir: str, out_dims: int = _RP_DIMS) -> "ray.data.Dataset":
    """(vec_id, j, y) — signed random projection (Achlioptas 2003, the
    database-friendly ±1 JL variant): ``y_j = Σ_i floor(x_i·10⁶) ·
    s(i, j)`` with the sign matrix derived from md5 parity, so the
    projection is a pure function of (dim, target) — identical on every
    worker, every run, every cluster size, and rebuilt bit-for-bit by the
    SQL oracle. Exact integer output ⇒ value-hash gated.

    Dataflow: the d×D sign matrix is model-sized and broadcast; each batch
    is ONE int64 matmul and a long-form explode — embarrassingly parallel,
    zero shuffle, the cheapest pre-ANN compression there is (feeds the
    sign-LSH and IVF paths at 100 TB where even int8 vectors are too wide
    to exchange)."""
    ds = _read_embeddings(sf_dir)

    # probe dims from one row (metadata-sized read)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    d = len(t["embedding"][0])
    S = np.array([[_rp_sign(i, j) for j in range(1, out_dims + 1)]
                  for i in range(1, d + 1)], dtype=np.int64)
    ref = ray.put(S)

    def proj(batch: pa.Table) -> pa.Table:
        sm = ray.get(ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = np.floor(_batch_vecs(batch) * _KM_SCALE).astype(np.int64)
        y = q @ sm  # n×D
        n, dd = y.shape
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, dd)),
            "j": pa.array(np.tile(np.arange(1, dd + 1, dtype=np.int64), n)),
            "y": pa.array(y.ravel()),
        })

    return ds.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)


def random_projection_sql(out_dims: int = _RP_DIMS) -> str:
    """Exact restatement of :func:`random_projection`."""
    return f"""
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {_KM_SCALE})
              AS BIGINT) AS qx
  FROM embeddings),
dims AS (SELECT DISTINCT i FROM q),
js AS (SELECT unnest(generate_series(1, {out_dims})) AS j),
s AS (
  SELECT i, j,
         CASE WHEN ('0x' || substr(md5(CAST(i AS VARCHAR) || '-'
                                   || CAST(j AS VARCHAR)), 1, 8))::UBIGINT
                   % 2 = 0
              THEN 1 ELSE -1 END AS sgn
  FROM dims CROSS JOIN js)
SELECT q.vec_id, s.j, CAST(SUM(q.qx * s.sgn) AS BIGINT) AS y
FROM q JOIN s USING (i)
GROUP BY 1, 2
ORDER BY vec_id, j"""


# ---------------------------------------------------------------------------
# MMR diversified rerank (retrieval diversification)
# ---------------------------------------------------------------------------

_MMR_LAM = 7   # λ·relevance −
_MMR_DIV = 3   # (1−λ)·max-similarity-to-selected, scaled ×10 to stay integer


def mmr_rerank(sf_dir: str, query_vec_id: int = 0, n_cand: int = 50,
               k: int = 5) -> pd.DataFrame:
    """(rank, vec_id, rel_e6, mmr_e6) — maximal-marginal-relevance rerank
    (Carbonell & Goldstein 1998): greedily pick k results maximizing
    ``7·rel − 3·max_{s∈selected} sim(c, s)`` (λ=0.7 in tenths — exact
    integer scores over the e6-rounded cosines, smallest-vec_id tie-break),
    so near-duplicate hits don't crowd the result list.

    Dataflow: candidate generation IS the distributed part —
    :func:`knn_topk` with ``k = n_cand`` (broadcast query, per-block
    partial top-k, tiny sort). The greedy selection then runs on the
    driver over the REPORT-SIZED candidate set (n_cand² pairwise
    e6-cosines — 50² here; never corpus-sized), the same bounded-driver
    doctrine as the quantile candidate pass. The SQL oracle replays the
    greedy chain as k CTE steps over identical rounded cosines.

    Reference parity note: no counterpart in the reference —
    brief-mandated similarity-search family (the diversification stage a
    RAG retriever runs after top-k; composes with `hybrid_search`)."""
    cand = knn_topk(sf_dir, query_vec_id, k=n_cand).to_pandas()
    ids = cand["vec_id"].to_numpy(np.int64)
    rel = dict(zip(ids.tolist(), cand["sim_e6"].astype(np.int64).tolist()))

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", ids.tolist())])
    tid = t["vec_id"].to_numpy().astype(np.int64)
    mat = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)).astype(
        np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = mat / norms
    P = np.round((unit @ unit.T) * 1e6).astype(np.int64)
    pos = {int(v): i for i, v in enumerate(tid)}

    remaining = ids.tolist()
    out_rows = []
    selected: list[int] = []
    for rank in range(1, k + 1):
        if not remaining:  # fewer candidates than k: emit fewer rows,
            break          # exactly like the SQL chain's empty s_t CTEs
        best = None
        for c in remaining:
            if selected:
                maxdiv = max(P[pos[c], pos[s]] for s in selected)
                score = _MMR_LAM * rel[c] - _MMR_DIV * int(maxdiv)
            else:
                score = _MMR_LAM * rel[c]
            key = (-score, c)
            if best is None or key < best[0]:
                best = (key, c, score)
        _, chosen, score = best
        selected.append(chosen)
        remaining.remove(chosen)
        out_rows.append((rank, chosen, rel[chosen], score))

    return pd.DataFrame(out_rows,
                        columns=["rank", "vec_id", "rel_e6", "mmr_e6"]) \
        .astype({"rank": np.int64, "vec_id": np.int64,
                 "rel_e6": np.int64, "mmr_e6": np.int64})


def mmr_rerank_sql(query_vec_id: int = 0, n_cand: int = 50,
                   k: int = 5) -> str:
    """Exact greedy-chain restatement of :func:`mmr_rerank`."""
    head = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
           WHERE vec_id = {query_vec_id}),
cand AS (
  SELECT vec_id,
         CAST(ROUND(list_cosine_similarity(embedding::DOUBLE[],
                                           (SELECT qv FROM q)) * 1000000)
              AS BIGINT) AS rel
  FROM embeddings WHERE vec_id <> {query_vec_id}
  ORDER BY rel DESC, vec_id LIMIT {n_cand}),
pair AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         CAST(ROUND(list_cosine_similarity(ea.embedding::DOUBLE[],
                                           eb.embedding::DOUBLE[]) * 1000000)
              AS BIGINT) AS s
  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id),
s1 AS (SELECT vec_id, rel, CAST({_MMR_LAM} * rel AS BIGINT) AS mmr
       FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
sel1 AS (SELECT vec_id FROM s1)"""
    steps = []
    for t in range(2, k + 1):
        steps.append(f"""
s{t} AS (
  SELECT c.vec_id, c.rel,
         CAST({_MMR_LAM} * c.rel - {_MMR_DIV} * (
           SELECT MAX(p.s) FROM pair p
           WHERE p.va = c.vec_id
             AND p.vb IN (SELECT vec_id FROM sel{t-1})) AS BIGINT) AS mmr
  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{t-1})
  ORDER BY mmr DESC, c.vec_id LIMIT 1),
sel{t} AS (SELECT vec_id FROM sel{t-1} UNION ALL SELECT vec_id FROM s{t})""")
    tail = "\nUNION ALL\n".join(
        f"SELECT CAST({t} AS BIGINT) AS rank, vec_id, rel AS rel_e6, "
        f"mmr AS mmr_e6 FROM s{t}" for t in range(1, k + 1))
    return (head + "," + ",".join(steps)
            + "\nSELECT * FROM (\n" + tail + "\n) ORDER BY rank")


# ---------------------------------------------------------------------------
# Int8 scalar quantization (embedding storage compression)
# ---------------------------------------------------------------------------


def embedding_quantize(sf_dir: str) -> "ray.data.Dataset":
    """(vec_id, i, q, scale_e9) — symmetric int8 scalar quantization of the
    embedding column: per-vector scale = max|x|, ``q = floor(x/scale·127
    + 0.5) ∈ [−127, 127]`` — the 4× storage/bandwidth compression an ANN
    serving tier stores, with reconstruction ``x ≈ q·scale/127`` (error ≤
    scale/254 per coordinate, pinned in pytest). Long-form output (one row
    per coordinate) so every quantized value is value-hash gated; the
    production sink would pack q back into a fixed_size_list<int8> column.

    Row-local (zero shuffle): both the scale and the codes derive from the
    row alone, so this is a pure streaming map at any corpus size. The
    float division x/scale is one IEEE double op on both sides — bit-equal
    in numpy and DuckDB — and floor(+0.5) is the repo's ROUND convention.
    Zero vectors emit q = 0 with scale_e9 = 0 (guarded in both).

    Reference parity note: no counterpart in the reference — brief-mandated
    embedding-pipeline family (compression ahead of similarity serving)."""

    def quant(batch: pa.Table) -> pd.DataFrame:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = _batch_vecs(batch)
        n, d = x.shape
        scale = np.abs(x).max(axis=1)
        safe = np.where(scale == 0, 1.0, scale)
        q = np.floor(x / safe[:, None] * 127 + 0.5).astype(np.int64)
        q[scale == 0] = 0
        return pd.DataFrame({
            "vec_id": np.repeat(ids, d),
            "i": np.tile(np.arange(1, d + 1, dtype=np.int64), n),
            "q": q.ravel(),
            "scale_e9": np.repeat(
                np.floor(scale * 1e9 + 0.5).astype(np.int64), d),
        })

    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(quant, batch_format="pyarrow", zero_copy_batch=True)


EMBEDDING_QUANTIZE_SQL = """
WITH x AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings),
s AS (SELECT vec_id, MAX(ABS(v)) AS scale FROM x GROUP BY 1)
SELECT x.vec_id, CAST(x.i AS BIGINT) AS i,
       CAST(CASE WHEN s.scale = 0 THEN 0
                 ELSE FLOOR(x.v / s.scale * 127 + 0.5) END AS BIGINT) AS q,
       CAST(FLOOR(s.scale * 1e9 + 0.5) AS BIGINT) AS scale_e9
FROM x JOIN s ON x.vec_id = s.vec_id
"""


def reciprocal_nn_pairs(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """(vec_a, vec_b, sim_e6) — reciprocal (mutual) k-nearest-neighbor
    pairs: kept iff a ∈ kNN(b) AND b ∈ kNN(a) — the classic high-precision
    near-duplicate / re-ranking filter (one-directional kNN hits from hub
    vectors are exactly what mutuality removes).

    Composes :func:`knn_join`: its directed (vec_id → nn_id) edges are
    keyed by the UNORDERED pair (min, max) and ONE pair exchange keeps the
    pairs seen from both directions (each group holds ≤ 2 rows). Output is
    canonical vec_a < vec_b with the pair's sim_e6 (symmetric — both
    directions agree by construction).

    Reference parity note: no counterpart in the reference — brief-mandated
    similarity family (precision filter over the kNN graph)."""
    from .shuffle import bucketed_group_apply

    knn = knn_join(sf_dir, k=k)

    def pair_key(df: pd.DataFrame) -> pd.DataFrame:
        a = df["vec_id"].to_numpy(np.int64)
        b = df["nn_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "lo": np.minimum(a, b), "hi": np.maximum(a, b),
            "sim_e6": df["sim_e6"].to_numpy(np.int64),
        })

    def mutual(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["lo", "hi"], as_index=False)
             .agg(n=("sim_e6", "size"), sim_e6=("sim_e6", "max")))
        g = g[g["n"] >= 2]
        return pd.DataFrame({
            "vec_a": g["lo"].to_numpy(np.int64),
            "vec_b": g["hi"].to_numpy(np.int64),
            "sim_e6": g["sim_e6"].to_numpy(np.int64),
        })

    return bucketed_group_apply(
        knn.map_batches(pair_key, batch_format="pandas"),
        ["lo", "hi"], lambda d: d, mutual, n_buckets=8)


def reciprocal_nn_pairs_sql(k: int = 3) -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (SELECT a.vec_id AS vec_id, b.vec_id AS nn_id,
        CAST(ROUND(list_cosine_similarity(a.v, b.v) * 1000000) AS BIGINT)
          AS sim_e6
      FROM e a JOIN e b ON a.vec_id <> b.vec_id),
r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY sim_e6 DESC, nn_id) AS rnk
      FROM s),
knn AS (SELECT vec_id, nn_id, sim_e6 FROM r WHERE rnk <= {k})
SELECT a.vec_id AS vec_a, a.nn_id AS vec_b,
       GREATEST(a.sim_e6, b.sim_e6) AS sim_e6
FROM knn a JOIN knn b ON a.vec_id = b.nn_id AND a.nn_id = b.vec_id
WHERE a.vec_id < a.nn_id
"""


# ---------------------------------------------------------------------------
# Greedy k-center coreset selection (farthest-point traversal)
# ---------------------------------------------------------------------------

_KC_SCALE = 1_000_000
_KCENTER_K = 8


def kcenter_select(sf_dir: str, k: int = _KCENTER_K) -> pd.DataFrame:
    """(step, vec_id, d2_min) — greedy k-center (farthest-point) coreset
    over the embedding table: the classic 2-approximation for diverse-subset
    selection used to pick representative training examples. Step 0 seeds at
    the smallest vec_id; each later step picks the point MAXIMIZING its
    minimum squared distance to the already-selected set (tie-break smallest
    vec_id) and reports that distance.

    Exactness: embeddings are quantized once to int64 on the repo's
    ``floor(x·1e6 + 0.5)`` grid (the ``embedding_quantize`` convention, the
    identical double expression the oracle evaluates) so every distance is
    an exact integer — no float argmax ambiguity between engines. The int64
    headroom of d·(2·max|q|)² is asserted at runtime (guard below) instead
    of hand-waved.

    Distribution: the pinned-loop shape the graph algorithms use — the
    quantized blocks are pinned ONCE (`to_arrow_refs`), then each of the
    k−1 rounds is one wave of raw block tasks, each updating that block's
    running min-distance array IN the object store (incremental: only the
    NEW center's distances are computed, so total work is O(k·n·d), not
    O(k²·n·d)) and returning just its local winner (id, d², vector) — the
    winner's vector rides back with the argmax, so no lookup pass is needed.
    The driver folds O(blocks) winners per round and holds only the selected
    set (k×d ints). Raw tasks instead of per-round Dataset stages because
    the loop is inherently driver-sequential: k Dataset executions would pay
    k× the ~0.5 s fixed stage latency for zero extra parallelism (measured
    4.9 s → the task loop removes ~3 s of pure stage overhead at sf0.1).

    Reference parity note: no counterpart in the reference — brief-mandated
    data-selection family (coreset / diverse sampling).
    """
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def quant(batch: pa.Table) -> pa.Table:
        v = _batch_vecs(batch)
        q = np.floor(v * _KC_SCALE + 0.5).astype(np.int64)
        # overflow guard: d · (2·max|q|)² must stay under 2^63
        mq = int(np.abs(q).max()) if q.size else 0
        if q.shape[1] * (2 * mq) ** 2 >= 2 ** 63:
            raise ValueError(
                f"kcenter_select: quantized magnitude {mq} with d="
                f"{q.shape[1]} can overflow int64 distances")
        return pa.table({
            "vec_id": batch["vec_id"].cast(pa.int64()),
            "q": pa.array(list(q), type=pa.list_(pa.int64()))})

    refs = ds.map_batches(quant, batch_format="pyarrow",
                          zero_copy_batch=True).to_arrow_refs()

    # seed: smallest vec_id — one wave of per-block min-row tasks
    seeds = [s for s in ray.get([_kc_seed_task.remote(r) for r in refs]) if s]
    if not seeds:
        return pd.DataFrame({"step": pd.Series(dtype=np.int64),
                             "vec_id": pd.Series(dtype=np.int64),
                             "d2_min": pd.Series(dtype=np.int64)})
    vid, center = min(seeds, key=lambda s: s[0])
    out = [(0, vid, 0)]
    chosen = {vid}
    dmin_refs: list = [None] * len(refs)

    for step in range(1, k):
        waves = [_kc_round_task.remote(r, dmin_refs[i], center,
                                       tuple(sorted(chosen)))
                 for i, r in enumerate(refs)]
        dmin_refs = [w[0] for w in waves]
        winners = [w for w in ray.get([w[1] for w in waves]) if w]
        if not winners:  # every remaining point already selected
            break
        vid, d2, center = max(winners, key=lambda w: (w[1], -w[0]))
        chosen.add(vid)
        out.append((step, vid, d2))

    return pd.DataFrame(out, columns=["step", "vec_id", "d2_min"]).astype(
        np.int64)


def _kc_block(tab: pa.Table):
    if "vec_id" not in tab.column_names:  # empty blocks can be schema-less
        return np.empty(0, np.int64), None
    ids = tab["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(ids) == 0:
        return ids, None
    emb = tab["q"]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    return ids, emb.flatten().to_numpy(zero_copy_only=False).reshape(
        len(ids), -1)


@ray.remote
def _kc_seed_task(tab: pa.Table):
    ids, Q = _kc_block(tab)
    if Q is None:
        return None
    j = int(np.argmin(ids))
    return int(ids[j]), Q[j].copy()


@ray.remote(num_returns=2)
def _kc_round_task(tab: pa.Table, dmin, center: np.ndarray, chosen: tuple):
    """One k-center round on one pinned block: fold the new center into the
    running min-distance array (stored back as this task's first return, so
    the next round reads it from the object store) and emit the block's
    eligible argmax (max d², tie min id) with its vector."""
    ids, Q = _kc_block(tab)
    if Q is None:
        return np.empty(0, np.int64), None
    d2 = ((Q - center[None, :]) ** 2).sum(axis=1)
    nd = d2 if dmin is None else np.minimum(dmin, d2)
    elig = ~np.isin(ids, np.asarray(chosen, dtype=np.int64))
    if not elig.any():
        return nd, None
    cand = np.flatnonzero(elig)
    j = cand[int(np.lexsort((ids[cand], -nd[cand]))[0])]
    return nd, (int(ids[j]), int(nd[j]), Q[j].copy())


def kcenter_select_sql(k: int = _KCENTER_K) -> str:
    """Unrolled-CTE oracle for :func:`kcenter_select` — one CTE layer per
    greedy step (the recursive structure stated explicitly, k is small), on
    the same int64 quantization grid. Every CTE is ``MATERIALIZED``: each
    layer references all previous layers, so letting the optimizer inline
    them re-evaluates the chain exponentially (measured: k=8 plain never
    returns; materialized is milliseconds)."""
    d2 = ("list_sum(list_transform(list_zip(q.v, {c}.v), "
          "s -> (s[1]-s[2])*(s[1]-s[2])))")
    parts = [f"""
q AS MATERIALIZED (SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(FLOOR(CAST(x AS DOUBLE) * {_KC_SCALE}
                                            + 0.5) AS BIGINT)) AS v
      FROM embeddings),
c0 AS MATERIALIZED (SELECT vec_id, v FROM q ORDER BY vec_id LIMIT 1)"""]
    selected = ["c0"]
    for i in range(1, k):
        mind = "LEAST(" + ", ".join(
            d2.format(c=c) for c in selected) + ")" if len(selected) > 1 \
            else d2.format(c=selected[0])
        parts.append(f"""
c{i} AS MATERIALIZED (SELECT q.vec_id, q.v, {mind} AS d2
         FROM q{"".join(f", {c}" for c in selected)}
         WHERE q.vec_id NOT IN ({" UNION ALL ".join(f"SELECT vec_id FROM {c}" for c in selected)})
         ORDER BY d2 DESC, q.vec_id LIMIT 1)""")
        selected.append(f"c{i}")
    sel = ["SELECT 0 AS step, vec_id, 0 AS d2_min FROM c0"] + [
        f"SELECT {i} AS step, vec_id, d2 AS d2_min FROM c{i}"
        for i in range(1, k)]
    return ("WITH " + ",".join(parts) + "\nSELECT CAST(step AS BIGINT) AS step, "
            "CAST(vec_id AS BIGINT) AS vec_id, CAST(d2_min AS BIGINT) AS d2_min "
            "FROM (" + " UNION ALL ".join(sel) + ")")


# ---------------------------------------------------------------------------
# kNN density / outlier scoring
# ---------------------------------------------------------------------------

# Outlier gate on the k-th neighbor similarity: measured sf0.001/sf0.01
# 3rd-NN sim_e6 p05 ~ 277k, median ~ 314k, so 280k exercises both classes
# at test scale.
_KNN_DENSITY_TAU_E6 = 280_000


def knn_density(sf_dir: str, k: int = 3,
                tau_e6: int = _KNN_DENSITY_TAU_E6) -> "ray.data.Dataset":
    """(vec_id, kth_sim_e6, is_outlier) — kNN-density outlier score per
    embedding: the cosine similarity of each vector's k-th nearest neighbor
    (low k-th-NN similarity == isolated point), with a fixed-threshold
    outlier flag. The distance-to-kth-neighbor score is the classic
    density-based anomaly detector for embedding-space corpus audits
    (mislabeled / off-distribution documents sit alone).

    Rides :func:`knn_join_auto` — brute broadcast matmul under the byte cap,
    exact-config IVF past it — then a zero-shuffle rank filter; no work
    beyond the join itself. Exact integers end-to-end given the join's e6
    quantization, so the SQL oracle (rank-k row of the same self-join)
    matches bit-for-bit."""

    ds = knn_join_auto(sf_dir, k=k)

    def kth(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["nn_rank"], k))
        sim = t["sim_e6"].cast(pa.int64())
        return pa.table({
            "vec_id": t["vec_id"].cast(pa.int64()),
            "kth_sim_e6": sim,
            "is_outlier": pc.cast(pc.less(sim, tau_e6), pa.int64()),
        })

    return ds.map_batches(kth, batch_format="pyarrow", zero_copy_batch=True)


def knn_density_sql(k: int = 3, tau_e6: int = _KNN_DENSITY_TAU_E6) -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (SELECT a.vec_id AS vec_id, b.vec_id AS nn_id,
        CAST(ROUND(list_cosine_similarity(a.v, b.v) * 1000000) AS BIGINT)
          AS sim_e6
      FROM e a JOIN e b ON a.vec_id <> b.vec_id),
r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY sim_e6 DESC, nn_id) AS rnk
      FROM s)
SELECT vec_id, sim_e6 AS kth_sim_e6,
       CAST(CASE WHEN sim_e6 < {tau_e6} THEN 1 ELSE 0 END AS BIGINT)
         AS is_outlier
FROM r WHERE rnk = {k}
"""


KNN_DENSITY_SQL = knn_density_sql()


# ---------------------------------------------------------------------------
# Exact KNN-Shapley data valuation
# ---------------------------------------------------------------------------

_SHAP_TEST_MOD = 50
_SHAP_K = 3


def knn_shapley(sf_dir: str, k: int = _SHAP_K,
                test_mod: int = _SHAP_TEST_MOD) -> "ray.data.Dataset":
    """(test_id, train_id, rnk, shapley_e9) — exact closed-form KNN-Shapley
    data valuation (Jia et al. 2019, "Efficient task-specific data valuation
    for nearest neighbor algorithms", PVLDB 12(11)): each training point's
    Shapley contribution to a K-NN classifier's accuracy on an eval slice
    (vec_id % test_mod == 0), computed by the backward recursion
    ``s_(N) = 1[y_(N)=y]/N``, ``s_(i) = s_(i+1) +
    (1[y_(i)=y] - 1[y_(i+1)=y]) * min(K,i) / (K*i)`` over training points
    ranked by cosine similarity (ties: smaller train_id nearer).

    Dataflow: the eval slice is broadcast once (decontaminate recipe —
    eval-slice-bounded by definition); ONE streamed pass emits (test,
    train, sim, indicator) key rows; ONE exchange on test_id co-locates
    each test point's ranking. The stated scale bound: a per-test group is
    TRAIN-CORPUS-sized (the closed form ranks the whole training set — it
    is inherently a per-test global sort); past worker-heap sizes, truncate
    to the top-M candidates via the IVF prefilter — contributions beyond
    rank M are O(1/M) by the recursion's min(K,i)/i factor. Float parity:
    every term is one integer-numerator IEEE division and the recursion
    fixes the summation order, so e9 rounding matches the recursive-CTE
    oracle bit-for-bit."""
    from .shuffle import bucketed_group_apply

    def test_slice(batch: pa.Table) -> pa.Table:
        ids_b = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(ids_b % test_mod == 0))

    t = (ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding", "label"])
         .map_batches(test_slice, batch_format="pyarrow",
                      zero_copy_batch=True)
         .to_arrow_refs())
    # eval-slice-bounded; drop empty blocks (schema-less, the known Ray
    # Data empty-block gotcha) before the concat
    tabs = [tab for tab in map(ray.get, t) if tab.num_rows]
    t = pa.concat_tables(tabs)
    ids = t["vec_id"].to_numpy().astype(np.int64)
    order = np.argsort(ids, kind="stable")
    flat = np.asarray(t["embedding"].combine_chunks().flatten()
                      .to_numpy(zero_copy_only=False), dtype=np.float64)
    mat = flat.reshape(len(ids), -1)[order]
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    # raw vectors + norms (NOT pre-normalized): the scorer restates DuckDB
    # list_cosine_similarity's association dot/(|a|·|b|) so the e6 rounding
    # boundary cannot diverge from the oracle
    test_ref = ray.put((ids[order], mat, norms,
                        t["label"].to_numpy().astype(np.int64)[order]))

    def fan(batch: pa.Table) -> pd.DataFrame:
        t_ids, t_mat, t_norms, t_lab = ray.get(test_ref)
        ids_b = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ids_b % test_mod != 0
        if not keep.any():
            return pd.DataFrame({c: pd.Series(dtype=np.int64)
                                 for c in ("test_id", "train_id", "sim_e6",
                                           "ind")})
        q = _batch_vecs(batch)[keep]
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(
            np.int64)[keep]
        ids_b = ids_b[keep]
        nq = np.linalg.norm(q, axis=1)
        nq[nq == 0] = 1.0
        # dot/(|a|·|b|) — list_cosine_similarity's association, not
        # (q/|q|)·(t/|t|): one division per pair instead of two per-vector
        # scalings, so the float rounding path matches the oracle's; the e6
        # rounding itself must be half-AWAY-from-zero (DuckDB ROUND), not
        # np.round's half-to-even
        from .stats import _round_e6_vec

        sims = _round_e6_vec(q @ t_mat.T / (nq[:, None] * t_norms[None, :]))
        nt = len(t_ids)
        ntr = len(ids_b)
        return pd.DataFrame({
            "test_id": np.tile(t_ids, ntr),
            "train_id": np.repeat(ids_b, nt),
            "sim_e6": sims.ravel(),
            "ind": (lab[:, None] == t_lab[None, :]).astype(np.int64).ravel(),
        })

    rows = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"]
    ).map_batches(fan, batch_format="pyarrow", zero_copy_batch=True)

    def shap(df: pd.DataFrame) -> pd.DataFrame:
        from .stats import _round_e9_vec

        out = []
        for tid, sub in df.groupby("test_id"):
            sub = sub.sort_values(["sim_e6", "train_id"],
                                  ascending=[False, True])
            ind = sub["ind"].to_numpy(np.int64)
            n = len(ind)
            ranks = np.arange(1, n, dtype=np.int64)          # i = 1..N-1
            diff = (ind[:-1] - ind[1:]) * np.minimum(k, ranks)
            terms = diff.astype(np.float64) / (k * ranks).astype(np.float64)
            # cumsum order == the recursion: s_N, then +t_{N-1}, ... +t_1
            seq = np.concatenate(([float(ind[-1]) / float(n)], terms[::-1]))
            s = np.cumsum(seq)[::-1]                          # rank 1..N
            out.append(pd.DataFrame({
                "test_id": np.full(n, tid, dtype=np.int64),
                "train_id": sub["train_id"].to_numpy(np.int64),
                "rnk": np.arange(1, n + 1, dtype=np.int64),
                "shapley_e9": _round_e9_vec(s),
            }))
        if not out:
            return pd.DataFrame({c: pd.Series(dtype=np.int64)
                                 for c in ("test_id", "train_id", "rnk",
                                           "shapley_e9")})
        return pd.concat(out, ignore_index=True)

    return bucketed_group_apply(rows, ["test_id"], lambda d: d, shap,
                                n_buckets=8)


def knn_shapley_sql(k: int = _SHAP_K, test_mod: int = _SHAP_TEST_MOD) -> str:
    return f"""
WITH RECURSIVE
e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
tst AS (SELECT * FROM e WHERE vec_id % {test_mod} = 0),
trn AS (SELECT * FROM e WHERE vec_id % {test_mod} <> 0),
s AS (SELECT t.vec_id AS test_id, r.vec_id AS train_id,
        CAST(ROUND(list_cosine_similarity(t.v, r.v) * 1000000) AS BIGINT)
          AS sim_e6,
        CASE WHEN r.label = t.label THEN 1 ELSE 0 END AS ind
      FROM tst t, trn r),
rk AS (SELECT *, row_number() OVER (PARTITION BY test_id
                                    ORDER BY sim_e6 DESC, train_id) AS rnk,
          COUNT(*) OVER (PARTITION BY test_id) AS n
       FROM s),
step(test_id, train_id, rnk, shap) AS (
  SELECT test_id, train_id, rnk, CAST(ind AS DOUBLE) / n FROM rk
  WHERE rnk = n
  UNION ALL
  SELECT cur.test_id, cur.train_id, cur.rnk,
         st.shap + CAST((cur.ind - prv.ind) * LEAST({k}, cur.rnk) AS DOUBLE)
                   / ({k} * cur.rnk)
  FROM step st
  JOIN rk prv ON prv.test_id = st.test_id AND prv.rnk = st.rnk
  JOIN rk cur ON cur.test_id = st.test_id AND cur.rnk = st.rnk - 1)
SELECT test_id, train_id, CAST(rnk AS BIGINT) AS rnk,
       CAST(ROUND(shap * 1000000000) AS BIGINT) AS shapley_e9
FROM step
"""


KNN_SHAPLEY_SQL = knn_shapley_sql()
