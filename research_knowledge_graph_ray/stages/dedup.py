"""Deduplication operators: exact, MinHash+LSH, SimHash, embedding-cosine.

Training-data-pipeline primitives over the documents/embeddings tables.
Exact dedup is SQL-checkable; the near-dup families are deterministic
(seeded hash permutations) and validated against brute-force oracles in
pytest. All follow the sketch pattern: vectorized per-batch sketching →
explode to (bucket, doc) rows → groupby bucket → candidate pairs → verify.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Min

from .embed import lsh_band_keys, lsh_planes
from .shuffle import bucketed_group_apply, grouped_aggregate

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(sf_dir: str) -> "ray.data.Dataset":
    """(fp, keep_doc_id, n_dupes) — group by content hash, keep min doc_id.

    The hash-partition + per-group-first pattern: content hash computed
    vectorized per batch, survivors chosen by groupby aggregate (no sort)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fp(batch: pa.Table) -> pd.DataFrame:
        texts = batch["text"].to_pylist()
        return pd.DataFrame(
            {
                "fp": [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts],
                "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True).groupby(
        "fp"
    ).aggregate(Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="n_dupes"))


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

# 31-bit Mersenne prime: a*h + b stays within int64 → fully vectorized
_MERSENNE = (1 << 31) - 1


def _perm_params(n_perm: int, seed: int = 13):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.int64)
    return a, b


def hash64(s: str) -> int:
    """First 8 bytes of md5 as a big-endian uint64 — the feature hash for the
    sketch family. md5 (not crc32/xxhash) so the ENTIRE sketch pipeline is
    restatable in ANSI SQL: DuckDB's
    ``('0x' || substr(md5(s), 1, 16))::UBIGINT`` produces the identical value,
    which is what lets dedup_minhash_pairs / dedup_simhash_pairs carry full
    value-hash oracles instead of rows-only checks."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def word_shingles(text: str, k: int = 3) -> set[int]:
    """Hashed k-word shingles (md5 → uint64 space; see :func:`hash64`)."""
    words = text.lower().split()
    return {
        hash64(" ".join(words[i : i + k]))
        for i in range(max(0, len(words) - k + 1))
    }


def minhash_signature(shingles: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """n_perm-wide MinHash signature (uint64)."""
    if not shingles:
        return np.full(len(a), _MERSENNE, dtype=np.uint64)
    h = (np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
         % np.uint64(_MERSENNE)).astype(np.int64)
    # (n_perm, n_shingles) universal hashing mod Mersenne prime; int64-safe
    vals = (a[:, None] * h[None, :] + b[:, None]) % _MERSENNE
    return np.min(vals, axis=1).astype(np.uint64)


class MinHashSketcher:
    """Actor-pool stage: documents batch → (band, band_hash, doc_id) rows.

    Band rows deliberately do NOT carry the signature — at corpus scale that
    multiplies shuffle bytes by ~16×512B per doc. Similarity is instead
    estimated downstream from the number of colliding bands m:
    ``P[band match] = j^r`` → ``ĵ = (m / n_bands)^(1/r)``."""

    def __init__(self, n_perm: int = 128, n_bands: int = 8, shingle_k: int = 3):
        self.a, self.b = _perm_params(n_perm)
        self.n_bands = n_bands
        self.rows_per_band = n_perm // n_bands
        self.shingle_k = shingle_k

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        band_col, hash_col, doc_col = [], [], []
        for did, text in zip(doc_ids, texts):
            sig = minhash_signature(word_shingles(text, self.shingle_k), self.a, self.b)
            for band in range(self.n_bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                band_col.append(band)
                # md5 over comma-joined decimals (not raw bytes) so the band
                # key is restatable in SQL: md5(string_agg(v, ',' ORDER BY i))
                hash_col.append(
                    hashlib.md5(",".join(map(str, chunk.tolist())).encode()).hexdigest()
                )
                doc_col.append(did)
        return pd.DataFrame(
            {"band": np.asarray(band_col, dtype=np.int64), "band_hash": hash_col,
             "doc_id": np.asarray(doc_col, dtype=np.int64)}
        )


_SKETCHER_CACHE: dict = {}


def _sketch_tasks(ds, n_perm: int, n_bands: int, shingle_k: int):
    """Stateless-task sketching with a per-worker-process sketcher cache —
    the deterministic sketcher's only state is the permutation table, so it
    runs on Ray's pre-started workers (no actor cold start)."""

    def sketch(batch: pa.Table) -> pd.DataFrame:
        key = (n_perm, n_bands, shingle_k)
        if key not in _SKETCHER_CACHE:
            _SKETCHER_CACHE[key] = MinHashSketcher(n_perm, n_bands, shingle_k)
        return _SKETCHER_CACHE[key](batch)

    return ds.map_batches(sketch, batch_format="pyarrow", zero_copy_batch=True)


def minhash_candidate_pairs(
    sf_dir: str, n_perm: int = 128, n_bands: int = 8, shingle_k: int = 3,
    est_threshold: float = 0.5,
) -> "ray.data.Dataset":
    """(doc_a, doc_b, est_jaccard_bp) over ``{sf_dir}/documents.parquet``."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return minhash_candidate_pairs_ds(ds, n_perm, n_bands, shingle_k, est_threshold)


def minhash_candidate_pairs_ds(
    ds: "ray.data.Dataset", n_perm: int = 128, n_bands: int = 8, shingle_k: int = 3,
    est_threshold: float = 0.5, max_docs_per_bucket: int = 256,
) -> "ray.data.Dataset":
    """(doc_a, doc_b, est_jaccard_bp) — near-dup candidates via banded LSH,
    similarity estimated from band-collision counts (ĵ = (m/b)^(1/r), basis
    points). Deterministic. ``ds`` must have (doc_id:int64, text) columns."""
    sketches = _sketch_tasks(ds, n_perm, n_bands, shingle_k)

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        # hot-bucket cap: a bucket of k docs emits C(k,2) pairs — templated /
        # boilerplate-heavy corpora produce huge near-dup clusters, so pair
        # emission is bounded (sorted doc list, first max_docs_per_bucket).
        # The cluster-mode operator (minhash_dedup_clusters) is the scale
        # path: it needs only chain edges, never the quadratic pair set.
        docs = np.sort(group["doc_id"].unique())[:max_docs_per_bucket]
        if len(docs) < 2:
            return pd.DataFrame({"doc_a": pd.Series(dtype=np.int64),
                                 "doc_b": pd.Series(dtype=np.int64),
                                 "n_band_hits": pd.Series(dtype=np.int64)})
        ia, ib = np.triu_indices(len(docs), 1)
        return pd.DataFrame(
            {"doc_a": docs[ia], "doc_b": docs[ib],
             "n_band_hits": np.ones(len(ia), dtype=np.int64)}
        )

    def bucket_final(df: pd.DataFrame) -> pd.DataFrame:
        # almost every (band, band_hash) group is a singleton — filter them
        # out vectorized before the per-group Python pair loop
        key = df["band"].astype(str) + "|" + df["band_hash"]
        df = df.assign(_k=key)
        sizes = df["_k"].map(df["_k"].value_counts())
        df = df[sizes >= 2]
        outs = [bucket_pairs(g) for _, g in df.groupby("_k")]
        out = (pd.concat(outs, ignore_index=True) if outs
               else bucket_pairs(df.drop(columns="_k")))
        return out.groupby(["doc_a", "doc_b"], as_index=False).agg(
            n_band_hits=("n_band_hits", "sum")
        )

    pair_hits = bucketed_group_apply(
        sketches, ["band", "band_hash"], lambda df: df, bucket_final
    )

    # total colliding bands per pair m → ĵ = (m/n_bands)^(1/r); no signature
    # bytes ever cross the exchange (16×512B per doc saved at corpus scale)
    rows_per_band = n_perm // n_bands

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["doc_a", "doc_b"], as_index=False).agg(
            n_band_hits=("n_band_hits", "sum")
        )
        est = (g["n_band_hits"] / n_bands) ** (1.0 / rows_per_band)
        g["est_jaccard_bp"] = (est * 10000).round().astype(np.int64)
        return g

    pairs = bucketed_group_apply(pair_hits, ["doc_a", "doc_b"], agg, agg)

    def threshold(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["est_jaccard_bp"] >= int(est_threshold * 10000)][
            ["doc_a", "doc_b", "est_jaccard_bp"]
        ]

    return pairs.map_batches(threshold, batch_format="pandas")


def minhash_dedup_clusters(
    ds: "ray.data.Dataset", n_perm: int = 128, n_bands: int = 8, shingle_k: int = 3,
    max_cc_iters: int = 16, cc_driver_limit: int = 2_000_000,
) -> "ray.data.Dataset":
    """Cluster-mode MinHash dedup — the 100 TB-scale path, end-to-end
    distributed (neither the edge set nor the labels ever land on the driver).

    Docs sharing any LSH band belong to one near-dup cluster. Instead of the
    quadratic all-pairs set, each bucket emits a *star* of k-1 edges
    (min_doc → other) — sufficient for connected components, linear in the
    band rows, and star topology keeps component diameters at
    O(#overlapping buckets) so the distributed min-label propagation
    (:func:`~.canonicalize.connected_components_ds`) converges in a few
    rounds even for boilerplate mega-clusters with millions of members.

    Returns a Dataset (doc_id, cluster_id, keep) for every doc belonging to a
    non-singleton cluster (cluster_id = min doc_id = the survivor); docs
    absent from the result are their own cluster.
    """
    sketches = _sketch_tasks(ds, n_perm, n_bands, shingle_k)

    def star_edges(df: pd.DataFrame) -> pd.DataFrame:
        key = df["band"].astype(str) + "|" + df["band_hash"]
        df = df.assign(_k=key)
        sizes = df["_k"].map(df["_k"].value_counts())
        sub = df[sizes >= 2]
        if not len(sub):
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64)})
        sub = sub.drop_duplicates(["_k", "doc_id"])
        hub = sub.groupby("_k")["doc_id"].transform("min")
        mask = (sub["doc_id"] != hub).to_numpy()
        return pd.DataFrame(
            {"a": hub.to_numpy()[mask].astype(np.int64),
             "b": sub["doc_id"].to_numpy()[mask].astype(np.int64)}
        ).drop_duplicates()

    edges = bucketed_group_apply(
        sketches, ["band", "band_hash"], lambda df: df, star_edges
    ).materialize()

    # small edge sets (clean corpora) take the driver union-find fast path —
    # the multi-round distributed propagation costs several full executions
    # of pure overhead on a 20-row edge list. Past ``cc_driver_limit`` edges
    # (boilerplate-heavy corpora: edge volume is linear in near-dup docs,
    # billions at 100 TB) the fully distributed CC takes over; nothing
    # driver-sized ever materializes on that path.
    from .canonicalize import connected_components_driver, connected_components_ds

    try:
        pdf = edges.to_pandas(limit=cc_driver_limit)
    except ValueError:
        labels = connected_components_ds(edges, max_iters=max_cc_iters)

        def finalize(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "doc_id": df["node"].astype(np.int64),
                    "cluster_id": df["label"].astype(np.int64),
                    "keep": (df["node"] == df["label"]).to_numpy(),
                }
            )

        return labels.map_batches(finalize, batch_format="pandas")

    if "a" not in pdf.columns:  # zero near-dups: empty frame loses its schema
        pdf = pd.DataFrame({"a": pd.Series(dtype=np.int64),
                            "b": pd.Series(dtype=np.int64)})
    mapping = connected_components_driver(
        (int(a), int(b)) for a, b in zip(pdf["a"], pdf["b"])
    )
    members = sorted(set(mapping) | set(mapping.values()))
    out = pd.DataFrame(
        {"doc_id": np.asarray(members, dtype=np.int64),
         "cluster_id": np.asarray([mapping.get(d, d) for d in members], dtype=np.int64)}
    )
    out["keep"] = out["doc_id"] == out["cluster_id"]
    return ray.data.from_pandas(out) if len(out) else ray.data.from_pandas(
        pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                      "cluster_id": pd.Series(dtype=np.int64),
                      "keep": pd.Series(dtype=bool)}))


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Brute-force k-word-shingle Jaccard (test oracle for MinHash)."""
    sa, sb = word_shingles(text_a, k), word_shingles(text_b, k)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def _shingle_intersections(sf_dir: str, k: int, max_doc_id: int,
                           max_docs_per_shingle: int):
    """Shared shingle-pair core (ngram_jaccard_pairs / containment_pairs):
    distinct (doc, shingle) rows → shingle exchange emits co-occurrence
    pairs → returns (inter Dataset of per-bucket |A∩B| partials, size_ref
    broadcast of per-doc distinct-shingle counts)."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        filter=pc.field("doc_id") < max_doc_id,
    )

    def shingle_rows(batch: pa.Table) -> pd.DataFrame:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        out_d, out_s = [], []
        for did, text in zip(doc_ids, texts):
            words = text.lower().split()
            shs = {" ".join(words[i : i + k]) for i in range(max(0, len(words) - k + 1))}
            out_d.extend([did] * len(shs))
            out_s.extend(shs)
        return pd.DataFrame({"doc_id": np.asarray(out_d, dtype=np.int64), "sh": out_s})

    rows = ds.map_batches(shingle_rows, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()

    # per-doc distinct-shingle counts: tiny (one row per doc) → broadcast
    sizes = (
        rows.map_batches(
            lambda df: df.groupby("doc_id", as_index=False).agg(n=("sh", "nunique")),
            batch_format="pandas")
        .groupby("doc_id").sum("n").to_pandas()
    )
    size_map = dict(zip(sizes["doc_id"], sizes[sizes.columns[-1]]))
    size_ref = ray.put(size_map)

    def shingle_pairs(df: pd.DataFrame) -> pd.DataFrame:
        sub = df.drop_duplicates(["sh", "doc_id"])
        counts = sub["sh"].map(sub["sh"].value_counts())
        sub = sub[(counts >= 2) & (counts <= max_docs_per_shingle)]
        out = []
        for _, g in sub.groupby("sh"):
            docs = np.sort(g["doc_id"].unique())
            ia, ib = np.triu_indices(len(docs), 1)
            out.append(pd.DataFrame({"doc_a": docs[ia], "doc_b": docs[ib]}))
        if not out:
            return pd.DataFrame({"doc_a": pd.Series(dtype=np.int64),
                                 "doc_b": pd.Series(dtype=np.int64),
                                 "inter": pd.Series(dtype=np.int64)})
        res = pd.concat(out, ignore_index=True)
        return res.groupby(["doc_a", "doc_b"], as_index=False).agg(
            inter=("doc_a", "size"))

    inter = bucketed_group_apply(rows, ["sh"], lambda df: df, shingle_pairs)
    return inter, size_ref


def ngram_jaccard_pairs(
    sf_dir: str, k: int = 3, threshold_bp: int = 100, max_doc_id: int = 100,
    max_docs_per_shingle: int = 512,
) -> "ray.data.Dataset":
    """(doc_a, doc_b, jac_bp) — EXACT k-word-shingle Jaccard ≥ threshold, as
    pure dataflow: distinct (doc, shingle) rows → shingle-keyed exchange emits
    per-shingle co-occurrence pairs → pair-keyed exchange sums |A∩B| → union
    sizes via broadcast of the per-doc shingle counts → integer-bp Jaccard.

    The inner n-gram Jaccard dedup family (exact verifier to MinHash's
    estimate). ``max_doc_id`` bounds the subset for the SQL-oracle gate;
    production use verifies MinHash candidates instead of all pairs, and hot
    shingles (boilerplate) are capped at ``max_docs_per_shingle`` docs —
    a shingle shared by more docs than that carries no discriminative signal.
    """
    inter, size_ref = _shingle_intersections(sf_dir, k, max_doc_id,
                                             max_docs_per_shingle)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["doc_a", "doc_b"], as_index=False).agg(inter=("inter", "sum"))
        sm = ray.get(size_ref)
        na = g["doc_a"].map(sm).astype(np.int64)
        nb = g["doc_b"].map(sm).astype(np.int64)
        union = na + nb - g["inter"]
        g["jac_bp"] = (g["inter"] * 10000 // union).astype(np.int64)
        g = g[g["jac_bp"] >= threshold_bp]
        return g[["doc_a", "doc_b", "jac_bp"]]

    return bucketed_group_apply(inter, ["doc_a", "doc_b"],
                                lambda df: df, finalize)


# binds at both test scales (measured max containment 10000/1250 bp at
# sf0.001/0.01, p90 ~ 470)
_CONT_THRESHOLD_BP = 1000


def containment_pairs(
    sf_dir: str, k: int = 3, threshold_bp: int = _CONT_THRESHOLD_BP,
    max_doc_id: int = 100, max_docs_per_shingle: int = 512,
) -> "ray.data.Dataset":
    """(doc_a, doc_b, cont_ab_bp, cont_ba_bp) — exact ASYMMETRIC shingle
    containment for co-shingled pairs: cont(A→B) = |A∩B| / |A|. Jaccard
    misses quote-inclusion (a short doc fully embedded in a long one keeps
    Jaccard low while containment hits 100%) — this is the standard
    complement for catching partial-copy/quotation duplication. Pairs kept
    when EITHER direction reaches ``threshold_bp``.

    Identical dataflow to :func:`ngram_jaccard_pairs` (shared
    `_shingle_intersections` core) — only the finalize ratio differs."""
    inter, size_ref = _shingle_intersections(sf_dir, k, max_doc_id,
                                             max_docs_per_shingle)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["doc_a", "doc_b"], as_index=False).agg(inter=("inter", "sum"))
        sm = ray.get(size_ref)
        na = g["doc_a"].map(sm).astype(np.int64)
        nb = g["doc_b"].map(sm).astype(np.int64)
        g["cont_ab_bp"] = (g["inter"] * 10000 // na).astype(np.int64)
        g["cont_ba_bp"] = (g["inter"] * 10000 // nb).astype(np.int64)
        g = g[(g["cont_ab_bp"] >= threshold_bp)
              | (g["cont_ba_bp"] >= threshold_bp)]
        return g[["doc_a", "doc_b", "cont_ab_bp", "cont_ba_bp"]]

    return bucketed_group_apply(inter, ["doc_a", "doc_b"],
                                lambda df: df, finalize)


def containment_pairs_sql(k: int = 3,
                          threshold_bp: int = _CONT_THRESHOLD_BP,
                          max_doc_id: int = 100) -> str:
    concat = " || ' ' || ".join(f"ws[i+{j}]" for j in range(k))
    return rf"""
WITH d AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
           FROM documents WHERE doc_id < {max_doc_id}),
g AS (SELECT DISTINCT doc_id, {concat} AS sh
      FROM d, UNNEST(range(1, len(ws) - {k - 2})) AS t(i)),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY 1),
inter AS (SELECT a.doc_id AS da, b.doc_id AS db,
                 CAST(COUNT(*) AS BIGINT) AS i
          FROM g a JOIN g b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT da AS doc_a, db AS doc_b,
       CAST(i * 10000 // sa.n AS BIGINT) AS cont_ab_bp,
       CAST(i * 10000 // sb.n AS BIGINT) AS cont_ba_bp
FROM inter JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
WHERE i * 10000 // sa.n >= {threshold_bp}
   OR i * 10000 // sb.n >= {threshold_bp}
"""


CONTAINMENT_PAIRS_SQL = containment_pairs_sql()


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


# word → 64-bit feature hash cache. Corpus vocabulary is Zipf-distributed, so
# the per-actor hit rate is high; bounded to keep long-lived workers in heap.
_WORD_H: dict = {}
_WORD_H_CAP = 1 << 20
_SHIFTS = np.arange(64, dtype=np.uint64)


def _word_hashes(words: np.ndarray) -> np.ndarray:
    """uint64 feature hashes for an object array of words (cached md5)."""
    if len(_WORD_H) > _WORD_H_CAP:
        _WORD_H.clear()
    out = np.empty(len(words), dtype=np.uint64)
    for i, w in enumerate(words):
        h = _WORD_H.get(w)
        if h is None:
            h = hash64(w)
            _WORD_H[w] = h
        out[i] = h
    return out


def simhash64(text: str) -> int:
    """64-bit SimHash over word features (md5-derived, see :func:`hash64`;
    words weighted by occurrence count). Bit i is set iff the signed
    occurrence-weighted vote for bit i is strictly positive — the same rule
    the SQL oracle restates (registry.DEDUP_SIMHASH_SQL)."""
    words = text.lower().split()
    if not words:
        return 0
    uniq, counts = np.unique(np.asarray(words, dtype=object), return_counts=True)
    h = _word_hashes(uniq)
    bits = ((h[:, None] >> _SHIFTS[None, :]) & np.uint64(1)).astype(np.int64)
    acc = ((2 * bits - 1) * counts[:, None]).sum(axis=0)
    return int(np.bitwise_or.reduce(
        np.where(acc > 0, np.uint64(1) << _SHIFTS, np.uint64(0))))


def simhash_pairs(sf_dir: str, max_hamming: int = 3) -> "ray.data.Dataset":
    """(doc_a, doc_b, hamming) — pairs within Hamming ≤ max_hamming, found via
    4×16-bit band blocking (any pair with distance ≤ 3 shares ≥ 1 exact band)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def sketch(batch: pa.Table) -> pd.DataFrame:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        rows = {"band": [], "band_val": [], "doc_id": [], "sim": []}
        for did, text in zip(doc_ids, texts):
            sh = simhash64(text)
            for band in range(4):
                rows["band"].append(band)
                rows["band_val"].append((sh >> (band * 16)) & 0xFFFF)
                rows["doc_id"].append(did)
                rows["sim"].append(sh)
        return pd.DataFrame(
            {"band": np.asarray(rows["band"], dtype=np.int64),
             "band_val": np.asarray(rows["band_val"], dtype=np.int64),
             "doc_id": np.asarray(rows["doc_id"], dtype=np.int64),
             "sim": np.asarray(rows["sim"], dtype=np.uint64)}
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        sub = group.drop_duplicates(subset=["doc_id"]).sort_values("doc_id")
        rows = {"doc_a": [], "doc_b": [], "hamming": []}
        docs = sub["doc_id"].to_numpy()
        sims = sub["sim"].to_numpy()
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                d = int(bin(int(sims[i]) ^ int(sims[j])).count("1"))
                if d <= max_hamming:
                    rows["doc_a"].append(docs[i])
                    rows["doc_b"].append(docs[j])
                    rows["hamming"].append(d)
        return pd.DataFrame({k: np.asarray(v, dtype=np.int64) for k, v in rows.items()})

    def bucket_final(df: pd.DataFrame) -> pd.DataFrame:
        key = df["band"].astype(str) + "|" + df["band_val"].astype(str)
        df = df.assign(_k=key)
        sizes = df["_k"].map(df["_k"].value_counts())
        sub = df[sizes >= 2]
        outs = [bucket_pairs(g) for _, g in sub.groupby("_k")]
        return (pd.concat(outs, ignore_index=True) if outs
                else bucket_pairs(df.drop(columns="_k").head(0)))

    pairs = bucketed_group_apply(
        ds.map_batches(sketch, batch_format="pyarrow", zero_copy_batch=True),
        ["band", "band_val"], lambda df: df, bucket_final,
    )

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["doc_a", "doc_b"], as_index=False).agg(hamming=("hamming", "min"))

    return grouped_aggregate(pairs, ["doc_a", "doc_b"], agg)


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_dups(sf_dir: str, tau: float = 0.95) -> "ray.data.Dataset":
    """(vec_a, vec_b, sim_e6) — embedding pairs with cosine ≥ τ, via the same
    sign-LSH banding used by entity linking (shared semantic)."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def sketch(batch: pa.Table) -> pd.DataFrame:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = np.stack(batch["embedding"].to_pandas().to_numpy()).astype(np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        planes = lsh_planes(dim=unit.shape[1], n_bits=32)
        bands = lsh_band_keys(unit.astype(np.float32), planes, n_bands=8)
        rows = {"bucket": [], "vec_id": [], "vec": []}
        for i, ks in enumerate(bands):
            for k in ks:
                rows["bucket"].append(k)
                rows["vec_id"].append(ids[i])
                rows["vec"].append(unit[i].astype(np.float64).tobytes())
        return pd.DataFrame(rows)

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        sub = group.drop_duplicates(subset=["vec_id"]).sort_values("vec_id")
        ids = sub["vec_id"].to_numpy(np.int64)
        vecs = np.frombuffer(b"".join(sub["vec"]), dtype=np.float64)
        vecs = vecs.reshape(len(ids), -1) if len(ids) else vecs.reshape(0, 0)
        sims = vecs @ vecs.T
        ii, jj = np.nonzero(np.triu(sims >= tau, k=1))
        return pd.DataFrame(
            {"vec_a": ids[ii], "vec_b": ids[jj],
             "sim_e6": np.round(sims[ii, jj] * 1e6).astype(np.int64)}
        )

    def bucket_final(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df["bucket"].map(df["bucket"].value_counts())
        sub = df[sizes >= 2]
        outs = [bucket_pairs(g) for _, g in sub.groupby("bucket")]
        return (pd.concat(outs, ignore_index=True) if outs
                else bucket_pairs(df.head(0)))

    pairs = bucketed_group_apply(
        ds.map_batches(sketch, batch_format="pyarrow", zero_copy_batch=True),
        ["bucket"], lambda df: df, bucket_final,
    )

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["vec_a", "vec_b"], as_index=False).agg(sim_e6=("sim_e6", "min"))

    return grouped_aggregate(pairs, ["vec_a", "vec_b"], agg)


_QLSH_BITS = 32   # hyperplanes (md5-parity signs, shared with the SQL oracle)
_QLSH_BANDS = 4   # 8 bits/band → 256 buckets/band


def _qlsh_signs(n_bits: int, dim: int) -> np.ndarray:
    """±1 hyperplane signs from md5(f"{k}-{d}") parity — the deterministic
    plane convention both engines derive independently."""
    s = np.empty((n_bits, dim), np.int64)
    for k in range(n_bits):
        for d in range(dim):
            h = int.from_bytes(hashlib.md5(f"{k}-{d}".encode()).digest()[:4],
                               "big")
            s[k, d] = 1 if h % 2 == 0 else -1
    return s


def embedding_near_dups_q(sf_dir: str, tau_num: int = 1, tau_den: int = 4,
                          n_bits: int = _QLSH_BITS,
                          n_bands: int = _QLSH_BANDS) -> "ray.data.Dataset":
    """(vec_a, vec_b, sim_e6) — sign-LSH embedding near-dup pairs with the
    ENTIRE approximate operator value-hash gated: hyperplanes are md5-parity
    signs, vector components quantize to e6 integers, band keys come from
    integer projection signs, and the cosine threshold cos ≥ tau_num/tau_den
    is the integer test ``S>0 ∧ tau_den²·S² ≥ tau_num²·‖a‖²·‖b‖²`` (128-bit
    exact on both engines) — so DuckDB reproduces the buckets, the LSH
    misses, and every similarity bit-for-bit. The float sign-LSH
    (:func:`embedding_near_dups`) remains the internal scale path for
    clustering; this is the REGISTERED pair operator.

    Scale shape identical to the float path: sketch is one zero-shuffle map
    emitting (bucket, vec_id, qvec) rows, ONE bucket exchange computes
    per-bucket integer Gram matrices, one tiny pair-key exchange dedups
    across bands. Candidate load is bounded by the 2^(bits/band) buckets per
    band; at 100 TB raise bits/band to keep buckets ∝ vectors."""
    per_band = n_bits // n_bands
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def sketch(batch: pa.Table) -> pd.DataFrame:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = np.stack(batch["embedding"].to_pandas().to_numpy()).astype(np.float64)
        ax = np.abs(vecs * 1e6)
        fl = np.floor(ax)
        fl[ax - fl >= 0.5] += 1.0
        q = (fl * np.where(vecs >= 0, 1.0, -1.0)).astype(np.int64)  # half-away
        signs = _qlsh_signs(n_bits, q.shape[1])
        proj = q @ signs.T                       # (n, n_bits) exact int64
        bits = proj > 0
        w = (1 << np.arange(per_band)).astype(np.int64)
        rows = {"bucket": [], "vec_id": [], "vec": []}
        for b in range(n_bands):
            key = bits[:, b * per_band : (b + 1) * per_band] @ w
            bucket = b * (1 << per_band) + key
            rows["bucket"].extend(bucket.tolist())
            rows["vec_id"].extend(ids.tolist())
            rows["vec"].extend(q[i].tobytes() for i in range(len(ids)))
        return pd.DataFrame(rows)

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        sub = group.drop_duplicates(subset=["vec_id"]).sort_values("vec_id")
        ids = sub["vec_id"].to_numpy(np.int64)
        if len(ids) < 2:
            return pd.DataFrame({"vec_a": pd.Series(dtype=np.int64),
                                 "vec_b": pd.Series(dtype=np.int64),
                                 "sim_e6": pd.Series(dtype=np.int64)})
        q = np.frombuffer(b"".join(sub["vec"]), dtype=np.int64).reshape(len(ids), -1)
        S = q @ q.T                                  # ≤ dim·1e12: exact int64
        nn = np.einsum("ij,ij->i", q, q)             # ‖·‖² exact int64
        ii, jj = np.triu_indices(len(ids), 1)
        s = S[ii, jj]
        pos = s > 0
        ii, jj, s = ii[pos], jj[pos], s[pos]
        # 128-bit-exact threshold: tau_den²·S² ≥ tau_num²·Na·Nb
        lhs = (s.astype(object) ** 2) * (tau_den * tau_den)
        rhs = (nn[ii].astype(object) * nn[jj].astype(object)) * (tau_num * tau_num)
        keep = np.asarray(lhs >= rhs, dtype=bool)
        ii, jj, s = ii[keep], jj[keep], s[keep]
        # sim_e6: (1e6·S)/sqrt(double(Na)·double(Nb)), ROUND half-away —
        # identical IEEE op sequence to the SQL restatement
        den = np.sqrt(nn[ii].astype(np.float64) * nn[jj].astype(np.float64))
        x = (1000000.0 * s.astype(np.float64)) / den
        f = np.floor(x)
        f[x - f >= 0.5] += 1
        return pd.DataFrame({"vec_a": ids[ii], "vec_b": ids[jj],
                             "sim_e6": f.astype(np.int64)})

    def bucket_final(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df["bucket"].map(df["bucket"].value_counts())
        sub = df[sizes >= 2]
        outs = [bucket_pairs(g) for _, g in sub.groupby("bucket")]
        return (pd.concat(outs, ignore_index=True) if outs
                else bucket_pairs(df.head(0)))

    pairs = bucketed_group_apply(
        ds.map_batches(sketch, batch_format="pyarrow", zero_copy_batch=True),
        ["bucket"], lambda df: df, bucket_final,
    )

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["vec_a", "vec_b"], as_index=False).agg(
            sim_e6=("sim_e6", "min"))
        for c in ("vec_a", "vec_b", "sim_e6"):
            g[c] = g[c].astype(np.int64)
        return g

    return grouped_aggregate(pairs, ["vec_a", "vec_b"], agg)


EMBEDDING_NEAR_DUPS_Q_SQL = f"""
WITH el AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         -- widen float32 -> DOUBLE before scaling (float32 * int would
         -- multiply in float32 and round differently from the engine)
         CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT) AS q
  FROM embeddings
),
pl AS (
  SELECT k, d,
         CASE WHEN ('0x' || substr(md5(CAST(k AS VARCHAR) || '-'
                    || CAST(d AS VARCHAR)), 1, 8))::UBIGINT % 2 = 0
              THEN 1 ELSE -1 END AS s
  FROM range({_QLSH_BITS}) t1(k)
       CROSS JOIN (SELECT DISTINCT d FROM el) t2
),
proj AS (
  SELECT vec_id, k, CAST(SUM(q * s) AS BIGINT) AS p
  FROM el JOIN pl USING (d) GROUP BY 1, 2
),
bk AS (
  SELECT vec_id,
         (k // {_QLSH_BITS // _QLSH_BANDS}) * {1 << (_QLSH_BITS // _QLSH_BANDS)}
           + SUM(CASE WHEN p > 0 THEN 1 ELSE 0 END
                 * (1 << (k % {_QLSH_BITS // _QLSH_BANDS}))) AS bucket
  FROM proj GROUP BY vec_id, k // {_QLSH_BITS // _QLSH_BANDS}
),
cand AS (
  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
),
nq AS (SELECT vec_id, CAST(SUM(q * q) AS BIGINT) AS nn FROM el GROUP BY 1),
dots AS (
  SELECT va, vb, CAST(SUM(ea.q * eb.q) AS BIGINT) AS s
  FROM cand JOIN el ea ON ea.vec_id = va
            JOIN el eb ON eb.vec_id = vb AND ea.d = eb.d
  GROUP BY va, vb
),
f AS (
  SELECT va, vb, s, na.nn AS na, nb.nn AS nb
  FROM dots JOIN nq na ON na.vec_id = va JOIN nq nb ON nb.vec_id = vb
  WHERE s > 0
    AND CAST(s AS HUGEINT) * CAST(s AS HUGEINT) * 16
        >= CAST(na.nn AS HUGEINT) * CAST(nb.nn AS HUGEINT)
)
SELECT va AS vec_a, vb AS vec_b,
       -- 1e6 is a DOUBLE literal (1000000.0 would parse as DECIMAL and keep
       -- the product exact where the engine's float64 rounds — 1-ulp skew)
       CAST(ROUND((1e6 * CAST(s AS DOUBLE))
                  / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
            AS BIGINT) AS sim_e6
FROM f
"""


def embedding_exact_pairs(sf_dir: str, tau: float = 0.4) -> "ray.data.Dataset":
    """(vec_a, vec_b, sim_e6) — EXACT cosine pairs with sim ≥ τ: the
    brute-force broadcast baseline, kept as the PYTEST GATE ONLY (the
    registered exact operator is :func:`embedding_exact_pairs_blocked`, which
    distributes the same answer with no broadcast; the sub-quadratic scale
    path is the sign-LSH :func:`embedding_near_dups`).

    The normalized matrix is broadcast once (``ray.put``), each batch does a
    single matmul against it, and a pair is emitted only from the batch
    holding its smaller vec_id — exactly-once without a dedup pass.
    Partitioning assumption: O(n·dim) embedding matrix fits one worker
    (valid when dedup runs per shard / per LSH block).
    sim_e6 = floor(sim·1e6 + 0.5), matching SQL ROUND."""
    import ray as _ray
    import pyarrow.parquet as pq

    full = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    all_ids = full["vec_id"].to_numpy().astype(np.int64)
    mat = np.stack(full["embedding"].to_pandas().to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = mat / norms
    ref = _ray.put((all_ids, unit))
    tau_e6 = int(round(tau * 1e6))

    def pairs(batch: pa.Table) -> pd.DataFrame:
        ids_all, u_all = _ray.get(ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = np.stack(batch["embedding"].to_pandas().to_numpy()).astype(np.float64)
        n = np.linalg.norm(vecs, axis=1, keepdims=True)
        n[n == 0] = 1.0
        sims = (vecs / n) @ u_all.T
        e6 = np.floor(sims * 1e6 + 0.5).astype(np.int64)
        # emit (i, j) only where my id < other id: exactly-once globally
        ii, jj = np.nonzero((e6 >= tau_e6) & (ids[:, None] < ids_all[None, :]))
        return pd.DataFrame(
            {"vec_a": ids[ii], "vec_b": ids_all[jj], "sim_e6": e6[ii, jj]}
        )

    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)


def embedding_exact_pairs_blocked(
    sf_dir: str, tau: float = 0.4, n_blocks: int = 8,
) -> "ray.data.Dataset":
    """(vec_a, vec_b, sim_e6) — EXACT cosine pairs with sim ≥ τ as a
    DISTRIBUTED block-nested self-join: no driver matrix, no broadcast.

    Each vector hashes to one of ``n_blocks`` blocks and fans out to the
    ``n_blocks`` block-pair buckets it participates in; one exchange
    co-locates each (block_i ≤ block_j) bucket, whose kernel is a single
    cross-block matmul emitting (min_id, max_id) pairs exactly once (upper
    triangle for the diagonal bucket). Total compute is the inherent O(n²·d)
    of an exact similarity self-join, but per-task memory is 2·(n/B)·d and
    every bucket runs in parallel — the scale-safe exact path. The broadcast
    kernel (:func:`embedding_exact_pairs`) remains only as the pytest gate;
    the sub-quadratic scale path is :func:`embedding_near_dups` (sign-LSH).
    sim_e6 = floor(sim·1e6 + 0.5), matching SQL ROUND."""
    tau_e6 = int(round(tau * 1e6))
    nb = n_blocks

    def fanout(batch: pa.Table) -> pd.DataFrame:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = np.stack(batch["embedding"].to_pandas().to_numpy()).astype(np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        # splitmix-style id hash → block, so sorted/clustered ids still spread
        h = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        blk = (h % np.uint64(nb)).astype(np.int64)
        n = len(ids)
        other = np.arange(nb, dtype=np.int64)
        lo = np.minimum(blk[:, None], other[None, :])
        hi = np.maximum(blk[:, None], other[None, :])
        bucket = (lo * nb + hi).ravel()
        rep = np.repeat(np.arange(n), nb)
        vb = [row.tobytes() for row in unit]
        return pd.DataFrame(
            {"bucket": bucket, "blk": blk[rep], "vid": ids[rep],
             "v": [vb[i] for i in rep]}
        )

    def bucket_sims(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_a": pd.Series(dtype=np.int64),
                              "vec_b": pd.Series(dtype=np.int64),
                              "sim_e6": pd.Series(dtype=np.int64)})
        if df.empty:
            return empty
        out = []
        for bkt, g in df.groupby("bucket", sort=False):
            g = g.drop_duplicates("vid")
            lo_b, hi_b = int(bkt) // nb, int(bkt) % nb
            if lo_b == hi_b:  # diagonal: within-block upper triangle
                g = g.sort_values("vid")
                ids = g["vid"].to_numpy(np.int64)
                m = np.frombuffer(b"".join(g["v"]), np.float64).reshape(len(g), -1)
                e6 = np.floor(m @ m.T * 1e6 + 0.5).astype(np.int64)
                ii, jj = np.nonzero(np.triu(e6 >= tau_e6, k=1))
                out.append(pd.DataFrame(
                    {"vec_a": ids[ii], "vec_b": ids[jj], "sim_e6": e6[ii, jj]}))
            else:
                a = g[g["blk"] == lo_b]
                b = g[g["blk"] == hi_b]
                if a.empty or b.empty:
                    continue
                a_ids = a["vid"].to_numpy(np.int64)
                b_ids = b["vid"].to_numpy(np.int64)
                a_m = np.frombuffer(b"".join(a["v"]), np.float64).reshape(len(a), -1)
                b_m = np.frombuffer(b"".join(b["v"]), np.float64).reshape(len(b), -1)
                e6 = np.floor(a_m @ b_m.T * 1e6 + 0.5).astype(np.int64)
                ii, jj = np.nonzero(e6 >= tau_e6)
                va, vb_ = a_ids[ii], b_ids[jj]
                out.append(pd.DataFrame(
                    {"vec_a": np.minimum(va, vb_), "vec_b": np.maximum(va, vb_),
                     "sim_e6": e6[ii, jj]}))
        return pd.concat(out, ignore_index=True) if out else empty

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(fanout, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_group_apply(ds, ["bucket"], lambda df: df, bucket_sims)


def embedding_dedup_clusters(
    sf_dir: str, tau: float = 0.4, mode: str = "exact", n_blocks: int = 8,
) -> "ray.data.Dataset":
    """(vec_id, component, is_canonical) — cluster-mode embedding dedup,
    resolved by the fully distributed min-label-propagation CC
    (`canonicalize.connected_components_ds`): neither the edge set, the label
    table, nor any embedding matrix ever lands on the driver.

    ``mode="exact"`` (registered, oracle-gated) builds CC edges from the
    distributed block-nested exact join (:func:`embedding_exact_pairs_blocked`)
    — exact by construction, O(n²·d) total compute spread across block-pair
    buckets. ``mode="lsh"`` rides the sign-LSH near-dup pairs
    (:func:`embedding_near_dups`) — sub-quadratic, the true 100-TB path;
    its recall vs the exact graph is pinned in pytest. Every vector appears;
    singletons are their own component; is_canonical=1 marks the kept
    representative (min vec_id)."""
    from .canonicalize import connected_components_ds

    if mode == "lsh":
        raw = embedding_near_dups(sf_dir, tau=tau)
    else:
        raw = embedding_exact_pairs_blocked(sf_dir, tau=tau, n_blocks=n_blocks)
    pair_edges = raw.map_batches(
        lambda df: pd.DataFrame({"a": df["vec_a"], "b": df["vec_b"]}),
        batch_format="pandas",
    )
    identity = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    ).map_batches(
        lambda df: pd.DataFrame(
            {"a": df["vec_id"].astype(np.int64), "b": df["vec_id"].astype(np.int64)}
        ),
        batch_format="pandas",
    )
    labels = connected_components_ds(pair_edges.union(identity))

    def out(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "vec_id": df["node"].astype(np.int64),
                "component": df["label"].astype(np.int64),
                "is_canonical": (df["node"] == df["label"]).astype(np.int64),
            }
        )

    return labels.map_batches(out, batch_format="pandas")


# ---------------------------------------------------------------------------
# Edit-distance fuzzy matching (entity-resolution near-dup family)
# ---------------------------------------------------------------------------

_FUZZY_BLOCK_CAP = 10_000  # distinct names per blocking key before loud failure


def _levenshtein(a: str, b: str) -> int:
    """Classic unit-cost edit distance (insert/delete/substitute) — the same
    DP DuckDB's levenshtein() implements, so the oracle matches exactly."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def fuzzy_name_pairs(sf_dir: str, max_dist: int = 3) -> "ray.data.Dataset":
    """(name_a, name_b, dist) — distinct part names within edit distance
    ``max_dist``, blocked on the name's last token.

    The fuzzy self-join pattern: global distinct via per-block dedup + one
    exchange on the blocking key, then pairwise verification only WITHIN a
    block (never all-pairs). Block sizes are vocabulary-bound; a block
    exceeding _FUZZY_BLOCK_CAP raises loudly (pick a finer blocking key)
    instead of going quadratic in silence."""
    ds = ray.data.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])

    def part_fn(df: pd.DataFrame) -> pd.DataFrame:
        names = df["p_name"].dropna().unique()
        return pd.DataFrame(
            {"p_name": names, "blk": [n.rsplit(" ", 1)[-1] for n in names]}
        )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates("p_name")
        rows_a, rows_b, dist = [], [], []
        for _, grp in df.groupby("blk"):
            names = sorted(grp["p_name"])
            if len(names) > _FUZZY_BLOCK_CAP:
                raise ValueError(
                    f"fuzzy block of {len(names)} names exceeds cap "
                    f"{_FUZZY_BLOCK_CAP}; use a finer blocking key"
                )
            for i in range(len(names)):
                for j in range(i + 1, len(names)):
                    d = _levenshtein(names[i], names[j])
                    if d <= max_dist:
                        rows_a.append(names[i])
                        rows_b.append(names[j])
                        dist.append(d)
        return pd.DataFrame(
            {"name_a": rows_a, "name_b": rows_b,
             "dist": np.asarray(dist, dtype=np.int64)}
        ).astype({"name_a": "string", "name_b": "string"})

    return bucketed_group_apply(ds, ["blk"], part_fn, fin)


_PACK_ID = 1 << 40  # doc ids below this pack losslessly beside n_chars


def keep_best_dedup(sf_dir: str) -> "ray.data.Dataset":
    """(fp, keep_doc_id, keep_n_chars, n_dupes) — exact-dup groups by content
    hash with REPRESENTATIVE SELECTION: instead of min-id first-wins
    (:func:`exact_dedup`), each group keeps its highest-quality member —
    longest text, min doc_id tiebreak — the curation policy used when
    near-identical crawls differ in truncation.

    Same hash-partition shape as exact_dedup, argmax carried as ONE packed
    int64 (n_chars ≪ 40 | ~doc_id) so partials stay a two-column aggregate —
    the vectorized argmin-pack trick from canonicalize.build_edges."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "n_chars"])

    def fp_pack(batch: pa.Table) -> pd.DataFrame:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame(
            {
                "fp": [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts],
                "pack": nc * _PACK_ID + (_PACK_ID - 1 - ids),
                "n": np.int64(1),
            }
        )
        return df.groupby("fp", as_index=False).agg(pack=("pack", "max"),
                                                    n=("n", "sum"))

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("fp", as_index=False).agg(pack=("pack", "max"),
                                                 n=("n", "sum"))
        pack = g["pack"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "fp": g["fp"],
                "keep_doc_id": _PACK_ID - 1 - (pack % _PACK_ID),
                "keep_n_chars": pack // _PACK_ID,
                "n_dupes": g["n"].astype(np.int64),
            }
        )

    return bucketed_group_apply(
        ds.map_batches(fp_pack, batch_format="pyarrow", zero_copy_batch=True),
        ["fp"],
        lambda df: df,
        fin,
    )


_CDC_WIN = 8    # rolling-window width (bytes)
_CDC_MOD = 61   # boundary: window byte-sum ≡ 0 (mod 61) → avg chunk ≈ 61 B


def _cdc_chunks(texts_arr: pa.ChunkedArray | pa.Array) -> pd.DataFrame:
    """Vectorized content-defined chunk split of a batch of documents.

    Boundaries are position-stateless (a cut after byte i of a doc iff the
    trailing 8-byte window sum ≡ 0 mod 61 and i ≥ 7), so identical content
    produces identical chunks regardless of where it appears — the property
    storage dedup needs — and the rule restates exactly in SQL (window SUM
    over per-char rows). Window sums for EVERY doc come from one global
    cumsum over the Arrow data buffer; only the per-chunk md5 is per-chunk
    Python (chunk count ≈ bytes/61 ≪ bytes)."""
    arr = texts_arr
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    base = off[0]
    lens = np.diff(off)
    slab = data[off[0] : off[-1]].astype(np.int64)
    n = slab.size
    csum = np.concatenate([[0], np.cumsum(slab)])
    doc_idx = np.repeat(np.arange(len(arr), dtype=np.int64), lens)
    starts = np.repeat(off[:-1] - base, lens)
    local = np.arange(n, dtype=np.int64) - starts
    # trailing-window sum at each global position (full windows only)
    win = np.full(n, -1, dtype=np.int64)
    full = local >= _CDC_WIN - 1
    gpos = np.arange(n, dtype=np.int64)
    win[full] = csum[gpos[full] + 1] - csum[gpos[full] + 1 - _CDC_WIN]
    cut = full & (win % _CDC_MOD == 0)

    hashes, sizes = [], []
    cut_pos = np.flatnonzero(cut)
    cut_doc = doc_idx[cut_pos]
    texts = arr.to_pylist()
    bounds_per_doc: list[list[int]] = [[] for _ in range(len(arr))]
    for p, dix in zip(cut_pos, cut_doc):
        bounds_per_doc[dix].append(int(p - (off[dix] - base)) + 1)
    for dix, text in enumerate(texts):
        prev = 0
        for b in bounds_per_doc[dix]:
            hashes.append(hashlib.md5(text[prev:b].encode()).hexdigest())
            sizes.append(b - prev)
            prev = b
        if prev < len(text):
            hashes.append(hashlib.md5(text[prev:].encode()).hexdigest())
            sizes.append(len(text) - prev)
    return pd.DataFrame({"h": hashes, "nb": np.asarray(sizes, dtype=np.int64)})


def cdc_chunk_dedup(sf_dir: str) -> pd.DataFrame:
    """One row (n_chunks, n_distinct, dup_bytes) — storage-level dedup
    accounting via content-defined chunking: split every document into
    content-addressed chunks, count how many chunk instances exist, how many
    are unique, and how many bytes a content-addressed store would save
    (Σ (count−1)·size over distinct chunks).

    Map side splits + hashes and shrinks each block to per-hash (count,
    size) partials; ONE exchange on the chunk hash makes the distinct/dup
    accounting local per bucket (equal hash ⇒ equal bytes ⇒ equal size);
    each bucket emits a 3-int summary row and the driver folds O(buckets)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def part(batch: pa.Table) -> pd.DataFrame:
        df = _cdc_chunks(batch["text"])
        return (df.groupby("h", as_index=False)
                .agg(cnt=("nb", "size"), nb=("nb", "first")))

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"n_chunks": [0], "n_distinct": [0],
                                 "dup_bytes": [0]}, dtype=np.int64)
        g = df.groupby("h").agg(cnt=("cnt", "sum"), nb=("nb", "first"))
        return pd.DataFrame(
            {
                "n_chunks": [int(g["cnt"].sum())],
                "n_distinct": [len(g)],
                "dup_bytes": [int(((g["cnt"] - 1) * g["nb"]).sum())],
            },
            dtype=np.int64,
        )

    parts = bucketed_group_apply(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["h"], lambda df: df, fin).to_pandas()
    s = parts.sum()
    return pd.DataFrame({"n_chunks": [np.int64(s["n_chunks"])],
                         "n_distinct": [np.int64(s["n_distinct"])],
                         "dup_bytes": [np.int64(s["dup_bytes"])]})


CDC_CHUNK_DEDUP_SQL = """
WITH p0 AS (
  SELECT doc_id, text,
         unnest(range(1, length(text) + 1)) AS i
  FROM documents),
pos AS (
  SELECT doc_id, text, i,
         ascii(substring(text, CAST(i AS INT), 1)) AS code
  FROM p0),
w AS (
  SELECT doc_id, text, i,
         SUM(code) OVER (PARTITION BY doc_id ORDER BY i
                         ROWS 7 PRECEDING) AS s,
         COUNT(*) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS 7 PRECEDING) AS wn
  FROM pos),
b AS (
  SELECT doc_id, CAST(i AS BIGINT) AS e FROM w
  WHERE wn = 8 AND s % 61 = 0
  UNION ALL
  SELECT doc_id, length(text) FROM documents
  WHERE length(text) > 0),
bd AS (SELECT DISTINCT doc_id, e FROM b),
sp AS (
  SELECT doc_id, e,
         COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY e), 0) AS st
  FROM bd),
chunks AS (
  SELECT md5(substring(d.text, CAST(sp.st + 1 AS INT),
                       CAST(sp.e - sp.st AS INT))) AS h,
         sp.e - sp.st AS nb
  FROM sp JOIN documents d USING (doc_id)
  WHERE sp.e > sp.st),
g AS (SELECT h, COUNT(*) AS cnt, MIN(nb) AS nb FROM chunks GROUP BY h)
SELECT CAST(SUM(cnt) AS BIGINT) AS n_chunks,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM((cnt - 1) * nb) AS BIGINT) AS dup_bytes
FROM g
"""


# ---------------------------------------------------------------------------
# Passage-level dedup with document reassembly
# ---------------------------------------------------------------------------

PASSAGE_W = 20


def passage_dedup_ds(docs: "ray.data.Dataset", w: int = PASSAGE_W,
                     n_buckets: int = 32) -> "ray.data.Dataset":
    """(doc_id, clean_text, n_passages, n_dropped) — cross-corpus
    passage-level dedup with document reassembly: every globally-repeated
    passage except its first occurrence (min (doc_id, idx)) is removed and
    the document re-joined from its surviving passages (the CCNet /
    RefinedWeb-style sub-document cleaning step; passages are fixed
    ``w``-word windows since this corpus has no paragraph breaks).

    Dataflow (100 TB shape):
    - map: split each doc into ``w``-word passages, emit KEY-ONLY rows
      (fp = md5(passage), doc_id, idx) — passage text never leaves its
      block.
    - exchange 1 (fp): first occurrence survives; only LOSER coordinates
      (doc_id, idx) leave the reducers — traffic bounded by the duplicate
      count, not the corpus.
    - exchange 2 (doc_id): documents co-located with their loser lists;
      each reducer re-splits its docs locally and drops losing windows.
    Nothing corpus-sized reaches the driver; both exchanges reuse the
    standard hash-exchange primitive.
    """

    def passages(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        fps, dids, idxs = [], [], []
        for did, t in zip(ids, batch["text"].to_pylist()):
            words = [x for x in t.split(" ") if x]
            for i in range(0, (len(words) + w - 1) // w):
                fps.append(hashlib.md5(
                    " ".join(words[i * w:(i + 1) * w]).encode()).hexdigest())
                dids.append(did)
                idxs.append(i)
        return pd.DataFrame({"fp": fps,
                             "doc_id": np.asarray(dids, dtype=np.int64),
                             "idx": np.asarray(idxs, dtype=np.int64)})

    def losers(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "idx": pd.Series(dtype=np.int64)})
        df = df.sort_values(["fp", "doc_id", "idx"], kind="stable")
        lose = df.duplicated("fp", keep="first")
        return df.loc[lose, ["doc_id", "idx"]]

    keys = docs.map_batches(passages, batch_format="pyarrow",
                            zero_copy_batch=True)
    lost = bucketed_group_apply(keys, ["fp"], lambda df: df, losers,
                                n_buckets=n_buckets)

    def tag(name):
        def add(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__t"] = name
            return df
        return add

    u = (docs.map_batches(tag("d"), batch_format="pandas")
         .union(lost.map_batches(tag("x"), batch_format="pandas")))

    def rebuild(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                              "clean_text": pd.Series(dtype="string"),
                              "n_passages": pd.Series(dtype=np.int64),
                              "n_dropped": pd.Series(dtype=np.int64)})
        if df.empty or "__t" not in df.columns:
            return empty
        d = df[df["__t"] == "d"]
        if d.empty:
            return empty
        xx = df[df["__t"] == "x"]
        lost_by_doc = {did: set(g["idx"].astype(np.int64))
                       for did, g in xx.groupby("doc_id")} if len(xx) else {}
        out_id, out_txt, out_np, out_nd = [], [], [], []
        for did, t in zip(d["doc_id"].astype(np.int64), d["text"]):
            words = [x for x in t.split(" ") if x]
            n_p = (len(words) + w - 1) // w
            drop = lost_by_doc.get(did, ())
            kept = [" ".join(words[i * w:(i + 1) * w])
                    for i in range(n_p) if i not in drop]
            out_id.append(did)
            out_txt.append(" ".join(kept))
            out_np.append(n_p)
            out_nd.append(len(drop))
        return pd.DataFrame({"doc_id": np.asarray(out_id, dtype=np.int64),
                             "clean_text": pd.Series(out_txt, dtype="string"),
                             "n_passages": np.asarray(out_np, dtype=np.int64),
                             "n_dropped": np.asarray(out_nd, dtype=np.int64)})

    return bucketed_group_apply(u, ["doc_id"], lambda df: df, rebuild,
                                n_buckets=n_buckets)


def passage_dedup(sf_dir: str, w: int = PASSAGE_W) -> "ray.data.Dataset":
    """Registry entry point for :func:`passage_dedup_ds` over the documents
    table (exactly restated in ``PASSAGE_DEDUP_SQL``)."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return passage_dedup_ds(docs, w=w)


PASSAGE_DEDUP_SQL = f"""
WITH s AS (SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws
           FROM documents),
n AS (SELECT doc_id, ws,
             CAST((len(ws) + {PASSAGE_W} - 1) // {PASSAGE_W} AS BIGINT) AS np
      FROM s),
p AS (SELECT doc_id, unnest(range(np)) AS idx, ws FROM n WHERE np > 0),
q AS (SELECT doc_id, idx,
             array_to_string(
               ws[idx * {PASSAGE_W} + 1 : idx * {PASSAGE_W} + {PASSAGE_W}],
               ' ') AS para
      FROM p),
r AS (SELECT doc_id, idx, para,
        ROW_NUMBER() OVER (PARTITION BY md5(para)
                           ORDER BY doc_id, idx) AS rn
      FROM q),
k AS (SELECT doc_id,
        COALESCE(string_agg(CASE WHEN rn = 1 THEN para END, ' '
                            ORDER BY idx), '') AS clean_text,
        CAST(COUNT(*) AS BIGINT) AS n_passages,
        CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
      FROM r GROUP BY doc_id)
SELECT d.doc_id, COALESCE(k.clean_text, '') AS clean_text,
       COALESCE(k.n_passages, 0) AS n_passages,
       COALESCE(k.n_dropped, 0) AS n_dropped
FROM documents d LEFT JOIN k USING (doc_id)
"""


def source_overlap(sf_dir: str, w: int = PASSAGE_W,
                   n_buckets: int = 32) -> pd.DataFrame:
    """(source_a, source_b, n_shared) — cross-source contamination matrix:
    for every unordered pair of sources, how many distinct ``w``-word
    passages appear in BOTH (the train/eval-leakage and between-crawl
    overlap audit; passage granularity because this corpus has no exact
    whole-document duplicates).

    Dataflow: per-block distinct (fp, source) key rows (passage text never
    ships) → ONE fp exchange where each reducer self-joins its fp groups
    into ordered source pairs and pre-counts them → |sources|²-bounded
    partials folded on the driver. Output is |sources|²-sized by
    construction."""

    def fps(batch: pa.Table) -> pd.DataFrame:
        srcs = batch["source"].to_pylist()
        out_fp, out_src = [], []
        for src, t in zip(srcs, batch["text"].to_pylist()):
            words = [x for x in t.split(" ") if x]
            for i in range(0, (len(words) + w - 1) // w):
                out_fp.append(hashlib.md5(
                    " ".join(words[i * w:(i + 1) * w]).encode()).hexdigest())
                out_src.append(src)
        return (pd.DataFrame({"fp": out_fp, "source": out_src})
                .drop_duplicates())

    def pair_counts(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"source_a": pd.Series(dtype="string"),
                              "source_b": pd.Series(dtype="string"),
                              "n_shared": pd.Series(dtype=np.int64)})
        if df.empty:
            return empty
        df = df.drop_duplicates(["fp", "source"])
        m = df.merge(df, on="fp")
        m = m[m["source_x"] < m["source_y"]]
        if m.empty:
            return empty
        g = (m.groupby(["source_x", "source_y"], as_index=False)
             .agg(n_shared=("fp", "count")))
        return pd.DataFrame({"source_a": g["source_x"].astype("string"),
                             "source_b": g["source_y"].astype("string"),
                             "n_shared": g["n_shared"].astype(np.int64)})

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "source"])
    parts = bucketed_group_apply(
        docs.map_batches(fps, batch_format="pyarrow", zero_copy_batch=True),
        ["fp"], lambda df: df.drop_duplicates(["fp", "source"]), pair_counts,
        n_buckets=n_buckets).to_pandas()
    if parts.empty:
        return pd.DataFrame({"source_a": pd.Series(dtype="string"),
                             "source_b": pd.Series(dtype="string"),
                             "n_shared": pd.Series(dtype=np.int64)})
    return (parts.groupby(["source_a", "source_b"], as_index=False)
            .agg(n_shared=("n_shared", "sum"))
            .astype({"n_shared": np.int64})
            .sort_values(["source_a", "source_b"]).reset_index(drop=True))


SOURCE_OVERLAP_SQL = f"""
WITH s AS (SELECT doc_id, source,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws
           FROM documents),
n AS (SELECT doc_id, source, ws,
             CAST((len(ws) + {PASSAGE_W} - 1) // {PASSAGE_W} AS BIGINT) AS np
      FROM s),
p AS (SELECT doc_id, source, unnest(range(np)) AS idx, ws FROM n
      WHERE np > 0),
q AS (SELECT DISTINCT
        md5(array_to_string(
          ws[idx * {PASSAGE_W} + 1 : idx * {PASSAGE_W} + {PASSAGE_W}],
          ' ')) AS fp,
        source
      FROM p)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM q a JOIN q b ON a.fp = b.fp AND a.source < b.source
GROUP BY 1, 2 ORDER BY 1, 2
"""


def dup_passage_share(sf_dir: str, w: int = PASSAGE_W,
                      n_buckets: int = 32) -> "ray.data.Dataset":
    """(doc_id, n_passages, n_dup, dup_share_bp) — per document, how many of
    its ``w``-word passages are duplicated ANYWHERE in the corpus (count > 1
    globally, first occurrences included), as a basis-point share. The
    corpus-wide counterpart of the within-doc repetition filter — the
    RefinedWeb/Gopher "duplicated line fraction" rule at web scale flags
    boilerplate/templated pages this way.

    Two key-only exchanges, no text shipped: (fp, doc_id) rows → fp
    exchange marks passages whose global count exceeds one and emits
    per-doc partial dup counts; a doc_id exchange folds partials and joins
    the per-doc passage totals (carried as partials from the same first
    pass)."""

    def keys(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        fps, dids = [], []
        for did, t in zip(ids, batch["text"].to_pylist()):
            words = [x for x in t.split(" ") if x]
            for i in range(0, (len(words) + w - 1) // w):
                fps.append(hashlib.md5(
                    " ".join(words[i * w:(i + 1) * w]).encode()).hexdigest())
                dids.append(did)
        return pd.DataFrame({"fp": fps,
                             "doc_id": np.asarray(dids, dtype=np.int64)})

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    keyed = docs.map_batches(keys, batch_format="pyarrow",
                             zero_copy_batch=True)

    def dup_partials(df: pd.DataFrame) -> pd.DataFrame:
        """Per-bucket: per-doc counts of total passages and of passages whose
        fp repeats corpus-wide (fps are co-located here, so the global
        count is exact)."""
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "n_passages": pd.Series(dtype=np.int64),
                                 "n_dup": pd.Series(dtype=np.int64)})
        cnt = df.groupby("fp")["doc_id"].transform("size")
        g = (df.assign(dup=(cnt > 1).astype(np.int64))
             .groupby("doc_id", as_index=False)
             .agg(n_passages=("fp", "size"), n_dup=("dup", "sum")))
        return g.astype({"doc_id": np.int64, "n_passages": np.int64,
                         "n_dup": np.int64})

    partials = bucketed_group_apply(keyed, ["fp"], lambda df: df,
                                    dup_partials, n_buckets=n_buckets)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "n_passages": pd.Series(dtype=np.int64),
                                 "n_dup": pd.Series(dtype=np.int64),
                                 "dup_share_bp": pd.Series(dtype=np.int64)})
        g = (df.groupby("doc_id", as_index=False)
             .agg(n_passages=("n_passages", "sum"), n_dup=("n_dup", "sum")))
        np_ = g["n_passages"].to_numpy(np.int64)
        nd = g["n_dup"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "n_passages": np_,
            "n_dup": nd,
            "dup_share_bp": nd * 10000 // np.maximum(np_, 1),
        })

    return grouped_aggregate(partials, ["doc_id"], fold, n_buckets=n_buckets)


DUP_PASSAGE_SHARE_SQL = f"""
WITH s AS (SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws
           FROM documents),
n AS (SELECT doc_id, ws,
             CAST((len(ws) + {PASSAGE_W} - 1) // {PASSAGE_W} AS BIGINT) AS np
      FROM s),
p AS (SELECT doc_id, unnest(range(np)) AS idx, ws FROM n WHERE np > 0),
q AS (SELECT doc_id,
             md5(array_to_string(
               ws[idx * {PASSAGE_W} + 1 : idx * {PASSAGE_W} + {PASSAGE_W}],
               ' ')) AS fp
      FROM p),
c AS (SELECT fp, COUNT(*) AS cnt FROM q GROUP BY 1),
d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_passages,
             CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup
      FROM q JOIN c USING (fp) GROUP BY doc_id)
SELECT doc_id, n_passages, n_dup,
       CAST(n_dup * 10000 // GREATEST(n_passages, 1) AS BIGINT)
         AS dup_share_bp
FROM d
"""


# ---------------------------------------------------------------------------
# Exact substring dedup (stride-1 sliding windows, ExactSubstr-style)
# ---------------------------------------------------------------------------

SUBSTR_W = 10


def substring_dedup_ds(docs: "ray.data.Dataset", w: int = SUBSTR_W,
                       n_buckets: int = 32) -> "ray.data.Dataset":
    """(doc_id, clean_text, n_tokens, n_dup_tokens) — EXACT substring dedup:
    every ``w``-consecutive-word window that occurs more than once corpus-wide
    loses all occurrences except the global first (min (doc_id, pos)); tokens
    covered by any losing window are removed and the document reassembled from
    the survivors. The stride-1 counterpart of :func:`passage_dedup_ds` — the
    suffix-array ExactSubstr rule of "Deduplicating Training Data Makes
    Language Models Better" (Lee et al. 2021) restated as sliding-window
    fingerprints so it runs as two key-only hash exchanges instead of a
    global suffix sort.

    Dataflow (100 TB shape):
    - map: per doc emit (fp = md5(window), doc_id, pos) for every stride-1
      window — ~1 key row per token; window text never leaves its block.
    - exchange 1 (fp): first occurrence survives; only LOSER coordinates
      (doc_id, pos) leave the reducers — traffic bounded by duplicate mass.
    - exchange 2 (doc_id): docs co-located with their loser lists; each
      reducer merges the loser intervals [pos, pos+w) into a token mask and
      rebuilds the doc. Nothing corpus-sized reaches the driver.
    """

    def windows(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        fps, dids, poss = [], [], []
        for did, t in zip(ids, batch["text"].to_pylist()):
            words = [x for x in t.split(" ") if x]
            for i in range(len(words) - w + 1):
                fps.append(hashlib.md5(
                    " ".join(words[i:i + w]).encode()).hexdigest())
                dids.append(did)
                poss.append(i)
        return pd.DataFrame({"fp": fps,
                             "doc_id": np.asarray(dids, dtype=np.int64),
                             "pos": np.asarray(poss, dtype=np.int64)})

    def losers(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "pos": pd.Series(dtype=np.int64)})
        df = df.sort_values(["fp", "doc_id", "pos"], kind="stable")
        lose = df.duplicated("fp", keep="first")
        return df.loc[lose, ["doc_id", "pos"]]

    keys = docs.map_batches(windows, batch_format="pyarrow",
                            zero_copy_batch=True)
    lost = bucketed_group_apply(keys, ["fp"], lambda df: df, losers,
                                n_buckets=n_buckets)

    def tag(name):
        def add(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__t"] = name
            return df
        return add

    u = (docs.map_batches(tag("d"), batch_format="pandas")
         .union(lost.map_batches(tag("x"), batch_format="pandas")))

    def rebuild(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                              "clean_text": pd.Series(dtype="string"),
                              "n_tokens": pd.Series(dtype=np.int64),
                              "n_dup_tokens": pd.Series(dtype=np.int64)})
        if df.empty or "__t" not in df.columns:
            return empty
        d = df[df["__t"] == "d"]
        if d.empty:
            return empty
        xx = df[df["__t"] == "x"]
        lost_by_doc = ({did: g["pos"].to_numpy(np.int64)
                        for did, g in xx.groupby("doc_id")}
                       if len(xx) else {})
        out_id, out_txt, out_nt, out_nd = [], [], [], []
        for did, t in zip(d["doc_id"].astype(np.int64), d["text"]):
            words = [x for x in t.split(" ") if x]
            n = len(words)
            mask = np.zeros(n, dtype=bool)
            for p in lost_by_doc.get(did, ()):
                mask[p:p + w] = True
            out_id.append(did)
            out_txt.append(" ".join(
                wd for wd, m in zip(words, mask) if not m))
            out_nt.append(n)
            out_nd.append(int(mask.sum()))
        return pd.DataFrame({"doc_id": np.asarray(out_id, dtype=np.int64),
                             "clean_text": pd.Series(out_txt, dtype="string"),
                             "n_tokens": np.asarray(out_nt, dtype=np.int64),
                             "n_dup_tokens": np.asarray(out_nd,
                                                        dtype=np.int64)})

    return bucketed_group_apply(u, ["doc_id"], lambda df: df, rebuild,
                                n_buckets=n_buckets)


def substring_dedup(sf_dir: str, w: int = SUBSTR_W) -> "ray.data.Dataset":
    """Registry entry point for :func:`substring_dedup_ds` over the documents
    table (exactly restated in ``SUBSTRING_DEDUP_SQL``)."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return substring_dedup_ds(docs, w=w)


SUBSTRING_DEDUP_SQL = f"""
WITH s AS (SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws
           FROM documents),
t AS (SELECT doc_id, ws, len(ws) AS n FROM s),
win AS (SELECT doc_id, pos,
          md5(array_to_string(ws[pos + 1 : pos + {SUBSTR_W}], ' ')) AS fp
        FROM (SELECT doc_id, ws, unnest(range(n - {SUBSTR_W} + 1)) AS pos
              FROM t WHERE n >= {SUBSTR_W})),
r AS (SELECT doc_id, pos,
        ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id, pos) AS rn
      FROM win),
dup_tok AS (SELECT DISTINCT r.doc_id, r.pos + u.i AS ti
            FROM r, UNNEST(range({SUBSTR_W})) AS u(i)
            WHERE r.rn > 1),
tok AS (SELECT doc_id, unnest(range(len(ws))) AS ti, ws FROM t
        WHERE len(ws) > 0),
k AS (SELECT tok.doc_id,
        COALESCE(string_agg(CASE WHEN d.ti IS NULL THEN ws[tok.ti + 1] END,
                            ' ' ORDER BY tok.ti), '') AS clean_text,
        CAST(COUNT(*) AS BIGINT) AS n_tokens,
        CAST(SUM(CASE WHEN d.ti IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_dup_tokens
      FROM tok LEFT JOIN dup_tok d
        ON tok.doc_id = d.doc_id AND tok.ti = d.ti
      GROUP BY tok.doc_id)
SELECT doc_id, COALESCE(k.clean_text, '') AS clean_text,
       COALESCE(k.n_tokens, 0) AS n_tokens,
       COALESCE(k.n_dup_tokens, 0) AS n_dup_tokens
FROM documents LEFT JOIN k USING (doc_id)
"""


def top_similar_pairs(sf_dir: str, topk: int = 20,
                      max_doc_id: int = 100) -> pd.DataFrame:
    """(doc_a, doc_b, jac_bp) — the ``topk`` most similar document pairs
    corpus-wide by EXACT 3-word-shingle Jaccard (similarity-join top-k, the
    'show me the worst near-duplicates' audit view). Rides the
    :func:`ngram_jaccard_pairs` dataflow with the threshold opened to every
    co-shingled pair, then one tiny global sort over the (already
    shingle-bounded) pair set; ties break on (doc_a, doc_b) so the cut is
    deterministic. Production swap: MinHash candidates feed the exact
    rescoring instead of all co-shingled pairs."""
    # the SQL oracle models NO hot-shingle cap, so the cap must never bind:
    # a shingle can co-occur in at most max_doc_id docs here
    pairs = ngram_jaccard_pairs(sf_dir, threshold_bp=1,
                                max_doc_id=max_doc_id,
                                max_docs_per_shingle=max(512, max_doc_id))
    out = pairs.sort(["jac_bp", "doc_a", "doc_b"],
                     descending=[True, False, False]).limit(topk).to_pandas()
    if "jac_bp" not in out.columns:  # zero co-shingled pairs anywhere:
        # sort+limit on an all-empty Dataset loses schema — typed empty
        out = pd.DataFrame({c: pd.Series(dtype=np.int64)
                            for c in ("doc_a", "doc_b", "jac_bp")})
    return out  # topk-bounded by construction


TOP_SIMILAR_PAIRS_SQL = r"""
WITH d AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
           FROM documents WHERE doc_id < 100),
g AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
      FROM d, UNNEST(range(1, len(ws) - 1)) AS t(i)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY 1),
inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
          FROM g a JOIN g b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT da AS doc_a, db AS doc_b,
       CAST((i * 10000) // (sa.n + sb.n - i) AS BIGINT) AS jac_bp
FROM inter JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
WHERE (i * 10000) // (sa.n + sb.n - i) >= 1
ORDER BY jac_bp DESC, doc_a, doc_b LIMIT 20
"""


# ---------------------------------------------------------------------------
# SemDeDup — semantic dedup inside k-means clusters (Abbas et al. 2023)
# ---------------------------------------------------------------------------


def semdedup(sf_dir: str, tau: float = 0.4, k: int = 8,
             iters: int = 2) -> "ray.data.Dataset":
    """(vec_id, cluster, component, is_canonical) — SemDeDup: k-means the
    embedding space, then dedup ONLY within clusters — pairs with cosine
    ≥ τ form components, the min-id member survives. The point at 100 TB:
    the O(n²) pair work shrinks to Σ(n_c²) ≈ n²/k, and each cluster's
    kernel runs independently after ONE exchange on the cluster key.

    Composition: centroids from the integer Lloyd trainer
    (:func:`~.similarity.kmeans_centroids_int` — deterministic, oracle-gated
    via `embedding_kmeans`), a fused assign+fan-out map (each vector ships
    its unit float vector once, tagged with its cluster), and a per-cluster
    reducer that does the τ-pair matmul plus LOCAL union-find (edges never
    cross clusters by construction, so no global CC pass — contrast
    `embedding_dedup_clusters`, which pays the full block-nested n² for the
    unclustered exact semantics). sim_e6 = floor(sim·1e6 + 0.5) matching
    SQL ROUND; cluster-local state is n_c-sized.

    The documented SemDeDup trade: a τ-pair that straddles a cluster
    boundary is NOT deduped (that is the algorithm, not an approximation
    bug) — the oracle restates exactly this clustered semantics.

    Reference parity note: no counterpart in the reference — brief-mandated
    embedding-dedup family, the named scale path from the literature."""
    from .similarity import _km_assign, _km_quant, kmeans_centroids_int
    from .shuffle import bucketed_group_apply

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    cents = kmeans_centroids_int(ds, k=k, iters=iters)
    ref = ray.put(cents)
    tau_e6 = int(round(tau * 1e6))

    def assign_fan(batch: pa.Table) -> pd.DataFrame:
        from .similarity import _batch_vecs

        cv = ray.get(ref)
        ids, q = _km_quant(batch)
        a, _ = _km_assign(q, cv)
        vecs = _batch_vecs(batch)  # one conversion; tensor-column aware
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        return pd.DataFrame({
            "cluster": a.astype(np.int64), "vec_id": ids,
            "v": [row.tobytes() for row in unit],
        })

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for cl, g in df.groupby("cluster", sort=False):
            g = g.sort_values("vec_id")
            ids = g["vec_id"].to_numpy(np.int64)
            u = np.stack([np.frombuffer(b, dtype=np.float64) for b in g["v"]])
            sim = np.floor(u @ u.T * 1e6 + 0.5).astype(np.int64)
            n = len(ids)
            # local union-find over the τ-pair graph (cluster-sized)
            parent = np.arange(n)

            def find(i):
                while parent[i] != i:
                    parent[i] = parent[parent[i]]
                    i = parent[i]
                return i

            ii, jj = np.nonzero(np.triu(sim >= tau_e6, k=1))
            for i, j in zip(ii, jj):
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
            comp = ids[np.fromiter((find(i) for i in range(n)), np.int64, n)]
            out.append(pd.DataFrame({
                "vec_id": ids, "cluster": np.int64(cl), "component": comp,
                "is_canonical": (ids == comp).astype(np.int64),
            }))
        if not out:
            return pd.DataFrame({
                "vec_id": pd.Series(dtype=np.int64),
                "cluster": pd.Series(dtype=np.int64),
                "component": pd.Series(dtype=np.int64),
                "is_canonical": pd.Series(dtype=np.int64)})
        return pd.concat(out, ignore_index=True)

    fanned = ds.map_batches(assign_fan, batch_format="pyarrow",
                            zero_copy_batch=True)
    return bucketed_group_apply(fanned, ["cluster"], lambda d: d, finish,
                                n_buckets=8)


def semdedup_sql(tau: float = 0.4, k: int = 8, iters: int = 2) -> str:
    """Exact restatement: the `embedding_kmeans` label CTE chain, within-
    cluster τ-pairs, recursive min-reachable closure, min-id canonical."""
    from .similarity import embedding_kmeans_sql

    tau_e6 = int(round(tau * 1e6))
    labels = embedding_kmeans_sql(k=k, iters=iters)
    return f"""
WITH RECURSIVE labels AS ({labels}),
p AS (
  SELECT la.vec_id AS va, lb.vec_id AS vb
  FROM labels la JOIN labels lb
    ON la.cluster = lb.cluster AND la.vec_id < lb.vec_id
  JOIN embeddings ea ON ea.vec_id = la.vec_id
  JOIN embeddings eb ON eb.vec_id = lb.vec_id
  WHERE CAST(ROUND(list_cosine_similarity(ea.embedding::DOUBLE[],
                                          eb.embedding::DOUBLE[]) * 1000000)
             AS BIGINT) >= {tau_e6}),
e AS (SELECT va AS a, vb AS b FROM p UNION SELECT vb, va FROM p),
reach(n, m) AS (
  SELECT vec_id, vec_id FROM labels
  UNION
  SELECT r.n, e.b FROM reach r JOIN e ON r.m = e.a)
SELECT l.vec_id, l.cluster, MIN(r.m) AS component,
       CAST(CASE WHEN l.vec_id = MIN(r.m) THEN 1 ELSE 0 END AS BIGINT)
         AS is_canonical
FROM labels l JOIN reach r ON r.n = l.vec_id
GROUP BY l.vec_id, l.cluster
"""


# ---------------------------------------------------------------------------
# Incremental-ingest exact dedup (new increment vs already-ingested state)
# ---------------------------------------------------------------------------

_INCR_SPLIT = 300  # doc_id < SPLIT = the already-ingested base corpus


def dedup_incremental(sf_dir: str, split: int = _INCR_SPLIT) -> "ray.data.Dataset":
    """(doc_id, fp, keep, reason) for the INCREMENT (doc_id ≥ split) —
    exact dedup of a new ingest batch against already-ingested state: an
    increment doc is dropped if its content hash exists ANYWHERE in the base
    corpus (reason='base'), else if an earlier increment doc has it
    (reason='incr', min-doc_id-first), else kept (reason='' , keep=1). Base
    rows are never re-emitted — the re-run/append production pattern the
    one-shot `dedup_exact` can't express.

    Dataflow: both sides emit (fp, side, doc_id) key-only rows (text never
    ships — the `dedup_exact` doctrine); ONE fp exchange; the reducer sees
    each fingerprint's full history and decides per increment doc. At
    production the base side's (fp, min_doc) table is a persisted index
    (e.g. the previous run's output parquet) and only the increment is
    re-scanned; here both derive from the one documents table so the oracle
    can restate the split exactly.

    Reference parity note: extends the reference's incremental-ingest story
    (SURVEY §3.1 re-run semantics / kg_incremental_* queries) to the dedup
    family."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def fp(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        fps = [hashlib.md5(t.encode()).hexdigest()
               for t in batch["text"].to_pylist()]
        return pd.DataFrame({"fp": fps, "doc_id": ids,
                             "base": (ids < split).astype(np.int64)})

    def decide(df: pd.DataFrame) -> pd.DataFrame:
        inc = df[df["base"] == 0]
        if inc.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "fp": pd.Series(dtype=str),
                                 "keep": pd.Series(dtype=np.int64),
                                 "reason": pd.Series(dtype=str)})
        # vectorized decision — no per-fingerprint Python loop
        base_fps = df.loc[df["base"] == 1, "fp"].unique()
        inc = inc.sort_values(["fp", "doc_id"])
        first = ~inc.duplicated("fp")           # min doc_id per fp
        in_base = inc["fp"].isin(base_fps).to_numpy()
        keep = (~in_base) & first.to_numpy()
        reason = np.where(in_base, "base",
                          np.where(first.to_numpy(), "", "incr"))
        return pd.DataFrame({
            "doc_id": inc["doc_id"].to_numpy(np.int64),
            "fp": inc["fp"].to_numpy(),
            "keep": keep.astype(np.int64),
            "reason": reason,
        })

    from .shuffle import bucketed_group_apply

    return bucketed_group_apply(
        ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True),
        ["fp"], lambda d: d, decide, n_buckets=16)


def dedup_incremental_sql(split: int = _INCR_SPLIT) -> str:
    return f"""
WITH f AS (SELECT doc_id, md5(text) AS fp,
                  CASE WHEN doc_id < {split} THEN 1 ELSE 0 END AS base
           FROM documents),
inbase AS (SELECT DISTINCT fp FROM f WHERE base = 1),
inc AS (SELECT doc_id, fp,
               ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM f WHERE base = 0)
SELECT i.doc_id, i.fp,
       CAST(CASE WHEN b.fp IS NOT NULL THEN 0
                 WHEN i.rn = 1 THEN 1 ELSE 0 END AS BIGINT) AS keep,
       CASE WHEN b.fp IS NOT NULL THEN 'base'
            WHEN i.rn = 1 THEN '' ELSE 'incr' END AS reason
FROM inc i LEFT JOIN inbase b ON b.fp = i.fp
"""


# ---------------------------------------------------------------------------
# MinHash-LSH quality audit: confusion matrix vs exact Jaccard
# ---------------------------------------------------------------------------

_CONF_TAU_BP = 5000  # "true near-dup" = exact 3-shingle Jaccard ≥ 0.5


def minhash_confusion(sf_dir: str, tau_bp: int = _CONF_TAU_BP,
                      max_doc_id: int = 500) -> pd.DataFrame:
    """(cls, n) with cls ∈ {tp, fp, fn} — the sketch-quality audit: MinHash
    LSH candidates (est ≥ 0.5, the registered `dedup_minhash_pairs` config)
    judged against EXACT shingle Jaccard ≥ τ on the bounded audit domain
    (doc_id < max_doc_id, the `dedup_ngram_jaccard` oracle domain).

    tp = candidate AND truly near-dup; fp = candidate whose true Jaccard
    < τ (band collision / estimator optimism); fn = true near-dup the LSH
    missed. The operational dashboard number for tuning bands/rows before a
    100-TB dedup run — composed entirely from the two oracle-gated pair
    dataflows, so the audit itself is value-gated. Both pair sets are
    audit-domain-bounded (≤ max_doc_id²/2 rows) before the driver-side
    outer join.

    Reference parity note: no counterpart in the reference — brief-mandated
    dedup family, the recall/precision audit composition."""
    lsh = (minhash_candidate_pairs(sf_dir)
           .map_batches(  # domain filter BEFORE the driver materialization
               lambda df: df[(df["doc_a"] < max_doc_id)
                             & (df["doc_b"] < max_doc_id)],
               batch_format="pandas")
           .to_pandas())
    # zero-candidate / zero-true corpora lose schema in to_pandas (the
    # all-empty block gotcha) — empty sets are the correct audit inputs
    cand = (set(zip(lsh["doc_a"].astype(int), lsh["doc_b"].astype(int)))
            if "doc_a" in lsh.columns else set())
    true = ngram_jaccard_pairs(sf_dir, max_doc_id=max_doc_id).to_pandas()
    if "jac_bp" in true.columns:
        true = true[true["jac_bp"] >= tau_bp]
        pos = set(zip(true["doc_a"].astype(int), true["doc_b"].astype(int)))
    else:
        pos = set()
    counts = {
        "tp": len(cand & pos),
        "fp": len(cand - pos),
        "fn": len(pos - cand),
    }
    return pd.DataFrame({"cls": ["fn", "fp", "tp"],
                         "n": np.array([counts["fn"], counts["fp"],
                                        counts["tp"]], dtype=np.int64)})


def minhash_pairs_sql() -> str:
    """Exact SQL restatement of minhash_candidate_pairs: md5-derived shingle
    hashes mod the Mersenne prime, the seeded permutation table inlined as
    literals, md5-of-joined-decimals band keys, per-bucket 256-doc cap, and
    the m→est_jaccard_bp map precomputed HERE with numpy so rounding is
    bit-identical by construction.

    Lives beside the operator (not in pipelines/registry) so the SQL and the
    kernel share one module and registry's import stays a forward edge —
    minhash_confusion_sql composing it from here used to create a
    stages→pipelines back-import that only worked by definition order."""
    n_perm, n_bands = 128, 8
    rows_per_band = n_perm // n_bands
    a, b = _perm_params(n_perm)
    perms = ", ".join(f"({i}, {int(a[i])}, {int(b[i])})" for i in range(n_perm))
    bp = {m: int(np.round((m / n_bands) ** (1.0 / rows_per_band) * 10000))
          for m in range(1, n_bands + 1)}
    bp_case = " ".join(f"WHEN {m} THEN {v}" for m, v in bp.items())
    return rf"""
WITH ws AS (SELECT doc_id,
              list_filter(string_split_regex(lower(text), '\s+'),
                          x -> x <> '') AS ws
            FROM documents),
sh AS (SELECT DISTINCT doc_id,
         CAST(('0x' || substr(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]),
                              1, 16))::UBIGINT % {_MERSENNE} AS BIGINT) AS h
       FROM ws, UNNEST(range(1, len(ws) - 1)) t(i)),
perms(i, a, b) AS (VALUES {perms}),
sigs AS (SELECT s.doc_id, p.i, MIN((p.a * s.h + p.b) % {_MERSENNE}) AS v
         FROM sh s CROSS JOIN perms p GROUP BY 1, 2),
alls AS (SELECT d.doc_id, p.i, COALESCE(sg.v, {_MERSENNE}) AS v
         FROM documents d CROSS JOIN perms p
         LEFT JOIN sigs sg ON sg.doc_id = d.doc_id AND sg.i = p.i),
bands AS (SELECT doc_id, i // {rows_per_band} AS band,
                 md5(string_agg(CAST(v AS VARCHAR), ',' ORDER BY i)) AS band_hash
          FROM alls GROUP BY doc_id, i // {rows_per_band}),
capped AS (SELECT band, band_hash, doc_id,
                  row_number() OVER (PARTITION BY band, band_hash
                                     ORDER BY doc_id) AS rn
           FROM bands),
hits AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS m
         FROM capped a JOIN capped b
           ON a.band = b.band AND a.band_hash = b.band_hash
          AND a.doc_id < b.doc_id
         WHERE a.rn <= 256 AND b.rn <= 256
         GROUP BY 1, 2)
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       CAST(CASE m {bp_case} END AS BIGINT) AS est_jaccard_bp
FROM hits WHERE CASE m {bp_case} END >= 5000
"""


DEDUP_MINHASH_SQL = minhash_pairs_sql()


def minhash_confusion_sql(tau_bp: int = _CONF_TAU_BP,
                          max_doc_id: int = 500) -> str:
    """Composed restatement: the `dedup_minhash_pairs` SQL (domain-
    restricted) FULL OUTER JOIN the exact-Jaccard CTE (the
    `dedup_ngram_jaccard` oracle parameterized to this audit domain),
    classified and counted. Zero-count classes still emit (cls, 0) rows."""
    jaccard = rf"""
WITH d AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
           FROM documents WHERE doc_id < {max_doc_id}),
g AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
      FROM d, UNNEST(range(1, len(ws) - 1)) AS t(i)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY 1),
inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
          FROM g a JOIN g b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT da AS doc_a, db AS doc_b,
       CAST((i * 10000) // (sa.n + sb.n - i) AS BIGINT) AS jac_bp
FROM inter JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id"""
    return f"""
WITH lsh AS (
  SELECT doc_a, doc_b FROM ({DEDUP_MINHASH_SQL})
  WHERE doc_a < {max_doc_id} AND doc_b < {max_doc_id}),
tru AS (
  SELECT doc_a, doc_b FROM ({jaccard})
  WHERE jac_bp >= {tau_bp}),
j AS (
  SELECT CASE WHEN l.doc_a IS NOT NULL AND t.doc_a IS NOT NULL THEN 'tp'
              WHEN l.doc_a IS NOT NULL THEN 'fp' ELSE 'fn' END AS cls
  FROM lsh l FULL OUTER JOIN tru t
    ON l.doc_a = t.doc_a AND l.doc_b = t.doc_b),
classes(cls) AS (VALUES ('fn'), ('fp'), ('tp'))
SELECT c.cls, CAST(COALESCE(COUNT(j.cls), 0) AS BIGINT) AS n
FROM classes c LEFT JOIN j ON j.cls = c.cls
GROUP BY c.cls ORDER BY c.cls
"""


def dedup_rate_by_source(sf_dir: str) -> pd.DataFrame:
    """(source, n_docs, n_distinct, n_dups) — the per-source duplicate-rate
    report a curation run publishes: how much of each source is exact-dup
    mass (md5 content fingerprint, the `dedup_exact` convention). All-integer
    output — exact oracle parity.

    One key-only exchange: per-block distinct (source, fp) pairs with their
    in-block multiplicities (text never leaves the scan task), hash-split on
    fp so a fingerprint's rows land in one bucket, per-bucket collapse to
    (source, n_docs, n_distinct) partials — the driver folds
    O(buckets × |sources|) rows, source-domain-bounded."""
    from .shuffle import hash_exchange_apply

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "text"])

    def part(batch: pa.Table) -> pa.Table:
        fps = pa.array([hashlib.md5(t.encode("utf-8")).hexdigest()
                        for t in batch["text"].to_pylist()])
        t = pa.table({"source": batch["source"], "fp": fps})
        g = t.group_by(["source", "fp"]).aggregate([([], "count_all")])
        return pa.table({"source": g["source"], "fp": g["fp"],
                         "n": g["count_all"].cast(pa.int64())})

    _out = pa.schema([("source", pa.string()), ("n_docs", pa.int64()),
                      ("n_distinct", pa.int64())])

    def fin(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0 or "fp" not in tab.column_names:
            return _out.empty_table()
        g = tab.group_by(["source", "fp"]).aggregate([("n", "sum")])
        per_src = g.group_by("source").aggregate(
            [("n_sum", "sum"), ([], "count_all")])
        return pa.table({"source": per_src["source"],
                         "n_docs": per_src["n_sum_sum"].cast(pa.int64()),
                         "n_distinct": per_src["count_all"].cast(pa.int64())})

    parts = hash_exchange_apply(ds, ["fp"], part, fin,
                                n_buckets=16).to_pandas()
    out = parts.groupby("source", as_index=False).agg(
        n_docs=("n_docs", "sum"), n_distinct=("n_distinct", "sum"))
    out["n_dups"] = out["n_docs"] - out["n_distinct"]
    return out.sort_values("source").reset_index(drop=True).astype(
        {"n_docs": np.int64, "n_distinct": np.int64, "n_dups": np.int64})


DEDUP_RATE_BY_SOURCE_SQL = """
WITH f AS (SELECT source, md5(text) AS fp FROM documents),
g AS (SELECT source, fp, COUNT(*) AS n FROM f GROUP BY 1, 2)
SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dups
FROM g GROUP BY source
"""


def dedup_cluster_histogram(sf_dir: str) -> pd.DataFrame:
    """(cluster_size, n_clusters) — the size distribution of exact-dup
    clusters (md5 fp): the shape report that decides whether dup mass is a
    few mega-clusters (boilerplate) or a long tail (mirrors), i.e. which
    near-dup strategy to run next. All-integer.

    Per-block fp counts → ONE key-only fp exchange → per-bucket cluster
    sizes collapse to a (size → count) histogram partial; the driver folds
    O(buckets × |distinct sizes|) rows — size-domain-bounded (a corpus has
    far fewer distinct cluster sizes than clusters)."""
    from .shuffle import hash_exchange_apply

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def part(batch: pa.Table) -> pa.Table:
        fps = pa.array([hashlib.md5(t.encode("utf-8")).hexdigest()
                        for t in batch["text"].to_pylist()])
        g = pa.table({"fp": fps}).group_by("fp").aggregate([([], "count_all")])
        return pa.table({"fp": g["fp"],
                         "n": g["count_all"].cast(pa.int64())})

    _out = pa.schema([("cluster_size", pa.int64()), ("n_clusters", pa.int64())])

    def fin(tab: pa.Table) -> pa.Table:
        if tab.num_rows == 0 or "fp" not in tab.column_names:
            return _out.empty_table()
        sizes = tab.group_by("fp").aggregate([("n", "sum")])
        h = sizes.group_by("n_sum").aggregate([([], "count_all")])
        return pa.table({"cluster_size": h["n_sum"].cast(pa.int64()),
                         "n_clusters": h["count_all"].cast(pa.int64())})

    parts = hash_exchange_apply(ds, ["fp"], part, fin,
                                n_buckets=16).to_pandas()
    out = parts.groupby("cluster_size", as_index=False).agg(
        n_clusters=("n_clusters", "sum"))
    return out.sort_values("cluster_size").reset_index(drop=True).astype(
        np.int64)


DEDUP_CLUSTER_HISTOGRAM_SQL = """
WITH f AS (SELECT md5(text) AS fp FROM documents),
c AS (SELECT fp, CAST(COUNT(*) AS BIGINT) AS n FROM f GROUP BY fp)
SELECT n AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM c GROUP BY n
"""


_SDECON_EVERY = 20    # vec_id % EVERY == 0 -> held-out eval/benchmark set
_SDECON_NUM = 3       # flag train vecs with cosine >= 3/10 vs ANY eval vec
_SDECON_DEN = 10


def semantic_decontaminate(sf_dir: str, every: int = _SDECON_EVERY,
                           tau_num: int = _SDECON_NUM,
                           tau_den: int = _SDECON_DEN) -> pd.DataFrame:
    """(vec_id, n_hits) — embedding-space decontamination: training vectors
    whose cosine similarity to ANY held-out eval/benchmark vector reaches
    tau, with the exact count of offending eval vectors. The semantic
    complement of the n-gram `textops.decontaminate` — catches paraphrased
    eval leakage that token overlap misses (the contamination analyses in
    GPT-3/PaLM appendices do both).

    Same value-hash-gated integer metric as
    :func:`embedding_near_dups_q`: components quantize half-away to e6
    ints, the threshold is ``S>0 ∧ tau_den²·S² ≥ tau_num²·‖a‖²·‖b‖²``
    evaluated exactly (object/HUGEINT on both engines).

    Scale shape: the eval set is benchmark-sized BY DEFINITION, so its
    (m×d int64) matrix broadcasts once via ``ray.put``; scoring is one
    zero-shuffle streaming pass (exact int64 matmul per batch, n_hits
    folded per block), output bounded by contaminated docs. The exact
    pairwise test costs O(batch·m) big-int comparisons on the S>0 half —
    at larger m, prefilter in float64 with an epsilon margin and recheck
    only the border exactly (the sketch path is unnecessary while m stays
    benchmark-sized)."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def _q_e6(vecs: np.ndarray) -> np.ndarray:
        ax = np.abs(vecs * 1e6)
        fl = np.floor(ax)
        fl[ax - fl >= 0.5] += 1.0
        return (fl * np.where(vecs >= 0, 1.0, -1.0)).astype(np.int64)

    def eval_rows(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(ids % every == 0))

    etab = ds.map_batches(eval_rows, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    if len(etab) == 0:
        return pd.DataFrame({"vec_id": pd.Series(dtype=np.int64),
                             "n_hits": pd.Series(dtype=np.int64)})
    qe = _q_e6(np.stack(etab["embedding"].to_numpy()).astype(np.float64))
    ne = np.einsum("ij,ij->i", qe, qe)            # ‖eval‖² exact int64
    bcast = ray.put((qe, ne))

    def score(t: pa.Table) -> pa.Table:
        qm, nm = ray.get(bcast)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        train = ids % every != 0
        ids = ids[train]
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "n_hits": pa.array([], pa.int64())})
        vecs = np.stack(
            t["embedding"].to_pandas().to_numpy()[train]).astype(np.float64)
        q = _q_e6(vecs)
        S = q @ qm.T                               # ≤ dim·1e12: exact int64
        na = np.einsum("ij,ij->i", q, q)
        ii, jj = np.nonzero(S > 0)
        s = S[ii, jj]
        # exact big-int threshold on the positive-dot survivors
        lhs = (s.astype(object) ** 2) * (tau_den * tau_den)
        rhs = (na[ii].astype(object) * nm[jj].astype(object)) \
            * (tau_num * tau_num)
        hit_rows = ii[np.asarray(lhs >= rhs, dtype=bool)]
        n_hits = np.bincount(hit_rows, minlength=len(ids)).astype(np.int64)
        keep = n_hits > 0
        return pa.table({"vec_id": pa.array(ids[keep]),
                         "n_hits": pa.array(n_hits[keep])})

    out = ds.map_batches(score, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    if len(out) == 0:
        return pd.DataFrame({"vec_id": pd.Series(dtype=np.int64),
                             "n_hits": pd.Series(dtype=np.int64)})
    return out.sort_values("vec_id").reset_index(drop=True).astype(
        {"vec_id": np.int64, "n_hits": np.int64})


SEMANTIC_DECONTAMINATE_SQL = f"""
WITH el AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT) AS q
  FROM embeddings
),
nq AS (SELECT vec_id, CAST(SUM(q * q) AS BIGINT) AS nn FROM el GROUP BY 1),
dots AS (
  SELECT t.vec_id AS tid, e.vec_id AS eid, CAST(SUM(t.q * e.q) AS BIGINT) AS s
  FROM el t JOIN el e ON t.d = e.d
  WHERE t.vec_id % {_SDECON_EVERY} <> 0 AND e.vec_id % {_SDECON_EVERY} = 0
  GROUP BY 1, 2
)
SELECT tid AS vec_id, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM dots JOIN nq na ON na.vec_id = tid JOIN nq nb ON nb.vec_id = eid
WHERE s > 0
  AND CAST(s AS HUGEINT) * CAST(s AS HUGEINT)
      * {_SDECON_DEN * _SDECON_DEN}
      >= CAST(na.nn AS HUGEINT) * CAST(nb.nn AS HUGEINT)
        * {_SDECON_NUM * _SDECON_NUM}
GROUP BY 1 ORDER BY 1
"""


# exact SQL restatement of stages/dedup.py simhash_pairs: md5-derived word
# feature hashes (occurrence-weighted sign votes, bit set iff vote > 0),
# 4×16-bit band blocking, Hamming ≤ 3 via bit_count(xor)
DEDUP_SIMHASH_SQL = r"""
WITH w AS (SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS w
           FROM documents),
h AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 16))::UBIGINT AS h FROM w),
bits AS (SELECT doc_id, b.bit,
                SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS acc
         FROM h CROSS JOIN (SELECT unnest(range(64)) AS bit) b GROUP BY 1, 2),
sims AS (SELECT doc_id,
                SUM(CASE WHEN acc > 0 THEN (1::UBIGINT << bit)
                         ELSE 0::UBIGINT END)::UBIGINT AS sh
         FROM bits GROUP BY 1),
alldocs AS (SELECT d.doc_id, COALESCE(s.sh, 0::UBIGINT) AS sh
            FROM documents d LEFT JOIN sims s USING (doc_id)),
bands AS (SELECT doc_id, sh, b.band, (sh >> (b.band * 16)) & 65535 AS band_val
          FROM alldocs CROSS JOIN (SELECT unnest(range(4)) AS band) b),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                a.sh AS sa, b.sh AS sb
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.band_val = b.band_val
          AND a.doc_id < b.doc_id)
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= 3
"""


# ---------------------------------------------------------------------------
# Ensemble dedup audit (exact ∪ MinHash ∪ SimHash)
# ---------------------------------------------------------------------------

_ENSEMBLE_CC_DRIVER_CAP = 1 << 21  # pairs; past this the distributed CC runs


def dedup_ensemble(sf_dir: str) -> pd.DataFrame:
    """(n_pairs_exact, n_pairs_minhash, n_pairs_simhash, n_pairs_union,
    n_docs_linked, n_clusters, max_cluster) — ensemble near-dup audit: the
    union of three already-gated pair dataflows (exact content-hash star
    pairs, MinHash-LSH candidates, SimHash band pairs) closed into connected
    components. The production question this answers: how much MORE does
    each sketch family link beyond the others, and how big do merged dup
    clusters get when all detectors vote.

    Composition, not new machinery: exact pairs are STAR edges (fp-min →
    member), linear in group size and CC-equivalent to the clique; the
    union is one pair-key dedup exchange; components run on the fully
    distributed min-label-propagation CC (no driver edge set). The one-row
    summary is aggregated with Dataset ops; only 7 scalars land on the
    driver. Empty-graph convention: max_cluster = -1 (stated in the
    oracle)."""
    from .canonicalize import connected_components_ds
    from .shuffle import bucketed_group_apply

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def fp(batch: pa.Table) -> pd.DataFrame:
        texts = batch["text"].to_pylist()
        return pd.DataFrame({
            "fp": [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts],
            "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64)})

    def star(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["fp", "doc_id"])
        m = df.groupby("fp")["doc_id"].transform("min")
        keep = df["doc_id"] > m
        return pd.DataFrame({"doc_a": m[keep].to_numpy(np.int64),
                             "doc_b": df["doc_id"][keep].to_numpy(np.int64)})

    # materialize each pair table once: count() and the union otherwise
    # re-execute the whole sketch dataflow (pair sets are key-only — tiny)
    ex = bucketed_group_apply(
        ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True),
        ["fp"], lambda d: d, star).materialize()
    mh = minhash_candidate_pairs(sf_dir).map_batches(
        lambda t: t.select(["doc_a", "doc_b"]), batch_format="pyarrow",
        zero_copy_batch=True).materialize()
    sh = simhash_pairs(sf_dir).map_batches(
        lambda t: t.select(["doc_a", "doc_b"]), batch_format="pyarrow",
        zero_copy_batch=True).materialize()

    n_ex, n_mh, n_sh = ex.count(), mh.count(), sh.count()

    def pair_distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["doc_a", "doc_b"])

    union = bucketed_group_apply(ex.union(mh).union(sh),
                                 ["doc_a", "doc_b"],
                                 pair_distinct, pair_distinct).materialize()
    n_union = union.count()
    # adaptive closure (the auto-join precedent): under the cap the pair
    # set is driver-comfortable — one union-find beats several distributed
    # label-propagation rounds' fixed costs; past it the fully distributed
    # CC runs (no driver edge set). Same summary either way.
    if n_union <= _ENSEMBLE_CC_DRIVER_CAP:
        from .canonicalize import driver_component_summary

        up = union.to_pandas()  # pair-count-bounded (just checked)
        n_linked, n_clusters, max_cluster = driver_component_summary(
            up, "doc_a", "doc_b")
    else:
        edges = union.map_batches(
            lambda df: pd.DataFrame({"a": df["doc_a"], "b": df["doc_b"]}),
            batch_format="pandas")
        labels = connected_components_ds(edges)
        n_linked = labels.count()
        if n_linked:
            sizes = labels.groupby("label").count()
            n_clusters = sizes.count()
            max_cluster = int(sizes.max("count()"))
        else:
            n_clusters, max_cluster = 0, -1
    return pd.DataFrame(
        [[n_ex, n_mh, n_sh, n_union, n_linked, n_clusters, max_cluster]],
        columns=["n_pairs_exact", "n_pairs_minhash", "n_pairs_simhash",
                 "n_pairs_union", "n_docs_linked", "n_clusters",
                 "max_cluster"]).astype(np.int64)


def dedup_ensemble_sql() -> str:
    return f"""
WITH RECURSIVE
ex AS (
  SELECT g.m AS doc_a, d.doc_id AS doc_b
  FROM (SELECT md5(text) AS fp, MIN(doc_id) AS m
        FROM documents GROUP BY 1) g
  JOIN (SELECT doc_id, md5(text) AS fp FROM documents) d USING (fp)
  WHERE d.doc_id > g.m),
mh AS (SELECT doc_a, doc_b FROM ({minhash_pairs_sql()})),
sh AS (SELECT doc_a, doc_b FROM ({DEDUP_SIMHASH_SQL})),
up AS (SELECT DISTINCT doc_a, doc_b FROM (
       SELECT * FROM ex UNION ALL SELECT * FROM mh
       UNION ALL SELECT * FROM sh)),
e AS (SELECT DISTINCT a, b FROM (
       SELECT doc_a AS a, doc_b AS b FROM up
       UNION ALL SELECT doc_b, doc_a FROM up)),
nodes AS (SELECT DISTINCT a AS n FROM e),
reach(n, m) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT r.n, e.b FROM reach r JOIN e ON r.m = e.a),
comp AS (SELECT n, MIN(m) AS c FROM reach GROUP BY n),
cl AS (SELECT c, COUNT(*) AS sz FROM comp GROUP BY c)
SELECT CAST((SELECT COUNT(*) FROM ex) AS BIGINT) AS n_pairs_exact,
       CAST((SELECT COUNT(*) FROM mh) AS BIGINT) AS n_pairs_minhash,
       CAST((SELECT COUNT(*) FROM sh) AS BIGINT) AS n_pairs_simhash,
       CAST((SELECT COUNT(*) FROM up) AS BIGINT) AS n_pairs_union,
       CAST((SELECT COUNT(*) FROM comp) AS BIGINT) AS n_docs_linked,
       CAST((SELECT COUNT(*) FROM cl) AS BIGINT) AS n_clusters,
       CAST(COALESCE((SELECT MAX(sz) FROM cl), -1) AS BIGINT) AS max_cluster
"""
