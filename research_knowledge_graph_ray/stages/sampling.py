"""Deterministic sampling / corpus-mixing operators over the documents table.

Training-data pipeline primitives: hash-Bernoulli sampling, stratified
per-language quotas, per-source mixture reweighting, and a global
token/char-budget prefix sample. Every operator keys its randomness off
``md5(doc_id)`` — no RNG state, so (a) results are reproducible across runs
and cluster sizes, (b) each is restatable in ANSI SQL for the value-hash
oracle gate, and (c) re-running a failed partition re-selects the same rows
(safe under Ray task retry).

Scale notes: hash_sample / corpus_mix are embarrassingly parallel (no
shuffle). stratified_sample shuffles only per-block top-N partials (N×langs
rows per block, not the corpus). sample_char_budget is a distributed
prefix-sum: 256 order-preserving range buckets on the hash key, per-bucket
totals (256-row aggregate) drive driver-computed offsets, then one exchange
does local sort+cumsum per bucket — no global sort, and buckets whose offset
already exceeds the budget are dropped before the exchange.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import pyarrow.compute as pc

import ray.data

from .shuffle import bucketed_group_apply, grouped_aggregate

# 2^32 — hash keys are the first 8 hex chars of md5(doc_id) read as uint32,
# so P(hkey < f * 2^32) = f exactly (up to md5 uniformity).
_HSPACE = 1 << 32


def _hkeys(doc_ids: np.ndarray) -> np.ndarray:
    """uint32 sampling keys: first 4 bytes of md5(str(doc_id)), big-endian —
    identical to DuckDB's ``('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1,
    8))::UBIGINT``."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(int(d)).encode()).digest()[:4], "big")
            for d in doc_ids
        ),
        dtype=np.int64,
        count=len(doc_ids),
    )


def _read_docs(sf_dir: str, columns: list[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def hash_sample(sf_dir: str, fraction: float = 0.2) -> "ray.data.Dataset":
    """(doc_id, lang, source, n_chars) — deterministic Bernoulli sample:
    keep iff md5-hkey < fraction·2^32. Stateless, shuffle-free, stable under
    retries and across cluster sizes."""
    thr = int(fraction * _HSPACE)

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = pa.array(_hkeys(ids) < thr)
        return batch.filter(mask)

    return _read_docs(sf_dir, ["doc_id", "lang", "source", "n_chars"]).map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True
    )


def stratified_sample(sf_dir: str, per_lang: int = 30) -> "ray.data.Dataset":
    """(doc_id, lang, hkey) — per-language quota: the ``per_lang`` docs with
    the smallest md5-hkey in each language (doc_id tiebreak). The per-block
    partial keeps only N rows per language, so the exchange moves
    O(blocks × langs × N) rows regardless of corpus size."""

    def topn(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        df = df.sort_values(["lang", "hkey", "doc_id"], kind="mergesort")
        return df.groupby("lang", sort=False).head(per_lang)

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["hkey"] = _hkeys(df["doc_id"].to_numpy(dtype=np.int64))
        return topn(df)

    ds = _read_docs(sf_dir, ["doc_id", "lang"])
    return bucketed_group_apply(ds, ["lang"], prep, topn)


# Per-source mixture weight: sources "srcK" keep fraction (K % 4 + 1)/4 of
# their docs (thresholds in exact multiples of 2^30 so the Python and SQL
# integer comparisons agree bit-for-bit).
_MIX_QUANTUM = 1 << 30


def corpus_mix(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, source) — weighted corpus mixing: per-source deterministic
    downsampling with weight (K%4+1)/4 for source "srcK". The standard
    mixture-reweighting step of a training-data pipeline, shuffle-free."""

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.asarray(batch["source"].to_pylist(), dtype=object)
        k = np.array([int(s[3:]) for s in src], dtype=np.int64)
        thr = (k % 4 + 1) * _MIX_QUANTUM
        keep = pa.array(_hkeys(ids) < thr)
        return pa.table(
            {"doc_id": batch["doc_id"].cast(pa.int64()), "source": batch["source"]}
        ).filter(keep)

    return _read_docs(sf_dir, ["doc_id", "source"]).map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True
    )


_N_RANGE_BUCKETS = 256  # top 8 bits of the 32-bit hkey


def sample_char_budget(sf_dir: str, budget: int = 40_000) -> "ray.data.Dataset":
    """(doc_id, n_chars, cum_chars) — greedy global prefix sample: walk docs
    in md5-hkey order, keep while the running char total stays ≤ budget.

    Distributed prefix-sum, no global sort: hkey's top byte is an
    order-preserving range partition (hkey uniform ⇒ balanced); pass 1
    aggregates per-bucket char totals (≤256 rows), the driver turns them
    into per-bucket offsets, and pass 2 exchanges each bucket to one reducer
    that sorts locally, cumsums, adds its offset and filters. Buckets whose
    offset already exceeds the budget are pruned before the exchange ever
    ships them."""

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hk = _hkeys(ids)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_chars": batch["n_chars"].cast(pa.int64()),
                "hkey": pa.array(hk),
                "bucket": pa.array(hk >> 24),
            }
        )

    ds = _read_docs(sf_dir, ["doc_id", "n_chars"]).map_batches(
        keyed, batch_format="pyarrow", zero_copy_batch=True
    )

    # pass 1: per-bucket totals (exchange output is ≤ _N_RANGE_BUCKETS rows)
    def tot(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("bucket", as_index=False)["n_chars"].sum()

    totals = (
        grouped_aggregate(ds.select_columns(["bucket", "n_chars"]), ["bucket"], tot)
        .to_pandas()
        .sort_values("bucket")
    )
    csum = totals["n_chars"].cumsum()
    offsets = dict(zip(totals["bucket"], csum - totals["n_chars"]))
    live = {int(b) for b, off in offsets.items() if off <= budget}

    # pass 2: per-bucket local sort + cumsum + offset; dead buckets pruned
    # BEFORE the exchange so at 100 TB only the prefix's bytes move.
    def prune(batch: pa.Table) -> pa.Table:
        mask = pa.array([int(b) in live for b in batch["bucket"].to_pylist()])
        return batch.filter(mask)

    def ident(df: pd.DataFrame) -> pd.DataFrame:
        return df

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype=np.int64),
                 "n_chars": pd.Series(dtype=np.int64),
                 "cum_chars": pd.Series(dtype=np.int64)}
            )
        out = []
        for b, g in df.groupby("bucket", sort=False):
            g = g.sort_values(["hkey", "doc_id"], kind="mergesort")
            cum = g["n_chars"].cumsum() + offsets.get(b, 0)
            keep = g.loc[cum <= budget, ["doc_id", "n_chars"]].copy()
            keep["cum_chars"] = cum[cum <= budget]
            out.append(keep)
        res = pd.concat(out) if out else df.iloc[:0][["doc_id", "n_chars"]]
        return res.reset_index(drop=True)

    pruned = ds.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_group_apply(pruned, ["bucket"], ident, fin)


def sample_weighted(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, lang, n_chars) — weighted Bernoulli sample: each document is
    kept with probability n_chars / max(n_chars), i.e. proportional-to-size
    sampling keyed off the same md5 hash as :func:`hash_sample`.

    Entirely integer arithmetic (hkey · max_w < w · 2^32), so selection is
    bit-reproducible across runs, cluster sizes and the SQL oracle — no float
    thresholds to disagree at the boundary. One tiny max() aggregate, then a
    shuffle-free vectorized filter."""
    cols = ["doc_id", "lang", "n_chars"]
    max_w = int(_read_docs(sf_dir, ["n_chars"]).max("n_chars"))

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(_hkeys(ids) * max_w < w * _HSPACE))

    return _read_docs(sf_dir, cols).map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle (global training order)
# ---------------------------------------------------------------------------

SHUFFLE_SEED = 7


def epoch_shuffle_ds(docs: "ray.data.Dataset", seed: int = SHUFFLE_SEED,
                     n_hist: int = 4096,
                     n_buckets: int = 32) -> "ray.data.Dataset":
    """(doc_id, pos) — the deterministic global training order for one epoch:
    every document's exact 0-based position under ORDER BY md5(doc_id-seed).

    The distributed rank-attach pattern (same recipe as the exact global
    RANK operator): the seeded hash key is uniform by construction, so the
    first 8 hex chars bucket the keyspace order-preservingly (hex sorts
    lexicographically and '0'-'9' < 'a'-'f' in ASCII); one tiny histogram
    pass pins each bucket's global offset, ONE key-only exchange co-locates
    buckets, and each reducer sorts just its own slice — no global sort,
    no text shipped, positions exact at any parallelism. Changing ``seed``
    reshuffles every epoch reproducibly. Works over any Dataset with a
    ``doc_id`` column (the curate CLI runs it over the curated output)."""

    def keyed(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = [hashlib.md5(f"{d}-{seed}".encode()).hexdigest() for d in ids]
        pref = np.array([int(k[:8], 16) for k in keys], dtype=np.int64)
        return pd.DataFrame({
            "doc_id": ids,
            "skey": keys,
            "b": (pref * n_hist) >> 32,
        })

    # pin the keyed projection: it feeds BOTH the histogram pass and the
    # exchange, and un-materialized Ray lineage recomputes the full upstream
    # read per consumer. The projection is id-sized (no text), so
    # materializing it is cheap at any corpus scale.
    ds = docs.map_batches(keyed, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        c = np.bincount(df["b"].to_numpy(np.int64), minlength=n_hist)
        nz = np.nonzero(c)[0]
        return pd.DataFrame({"b": nz, "cnt": c[nz]})

    counts = (ds.map_batches(hist, batch_format="pandas").to_pandas()
              .groupby("b", as_index=False).agg(cnt=("cnt", "sum")))
    full = np.zeros(n_hist, dtype=np.int64)
    full[counts["b"].to_numpy(np.int64)] = counts["cnt"].to_numpy(np.int64)
    offsets = np.concatenate([[0], np.cumsum(full)[:-1]])

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "pos": pd.Series(dtype=np.int64)})
        outs = []
        for b, g in df.groupby("b"):
            g = g.sort_values(["skey", "doc_id"], kind="stable")
            outs.append(pd.DataFrame({
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "pos": offsets[int(b)] + np.arange(len(g), dtype=np.int64),
            }))
        return pd.concat(outs, ignore_index=True)

    return bucketed_group_apply(ds, ["b"], lambda df: df, rank,
                                n_buckets=n_buckets)


def epoch_shuffle(sf_dir: str, seed: int = SHUFFLE_SEED,
                  n_hist: int = 4096,
                  n_buckets: int = 32) -> "ray.data.Dataset":
    """Registry entry point for :func:`epoch_shuffle_ds` over the documents
    table (exactly restated in ``EPOCH_SHUFFLE_SQL``)."""
    return epoch_shuffle_ds(_read_docs(sf_dir, ["doc_id"]), seed=seed,
                            n_hist=n_hist, n_buckets=n_buckets)


EPOCH_SHUFFLE_SQL = f"""
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (
              ORDER BY md5(CAST(doc_id AS VARCHAR) || '-{SHUFFLE_SEED}'),
                       doc_id) - 1 AS BIGINT) AS pos
FROM documents
"""


# ---------------------------------------------------------------------------
# Token-balanced shard planning
# ---------------------------------------------------------------------------

N_SHARDS = 8


def shard_plan(sf_dir: str, n_shards: int = N_SHARDS,
               n_hist: int = 2048, n_buckets: int = 32) -> "ray.data.Dataset":
    """(doc_id, n_tokens, shard_id) — deterministic token-balanced shard
    assignment: docs ranked longest-first (ties by doc_id) and dealt
    serpentine across ``n_shards`` (0..N-1 then N-1..0), the classic
    balance heuristic for pre-planning training shards so no worker drags a
    token-heavy tail.

    The global longest-first rank reuses the rank-attach pattern: a
    histogram over (negated) token counts pins per-bucket offsets (value →
    bucket is order-preserving, equal counts share a bucket so ties stay
    local), ONE key-only exchange co-locates buckets, each reducer sorts
    its slice and deals its ranks. Nothing corpus-sized reaches the driver;
    output is one small row per doc (no text)."""

    def toks(batch: pa.Table) -> pd.DataFrame:
        text = batch["text"]
        n_chars = pc.utf8_length(text).cast(pa.int64())
        no_space = pc.utf8_length(
            pc.replace_substring(text, pattern=" ", replacement=""))
        nt = pc.add(pc.subtract(n_chars, no_space.cast(pa.int64())), 1)
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "n_tokens": nt.to_numpy(zero_copy_only=False).astype(np.int64),
        })

    # materialized: the toks projection feeds THREE consumers (min/max
    # aggregate, histogram, exchange) — without pinning, Ray lineage re-runs
    # the full text read per consumer. Two int64 columns, corpus-safe.
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(toks, batch_format="pyarrow", zero_copy_batch=True).materialize()

    from ray.data.aggregate import Max, Min
    agg = ds.aggregate(Min("n_tokens"), Max("n_tokens"))
    lo, hi = -int(agg["max(n_tokens)"]), -int(agg["min(n_tokens)"])
    width = (hi - lo) or 1
    scale = n_hist / width

    def bucket_of(neg: np.ndarray) -> np.ndarray:
        return np.clip(((neg - lo) * scale).astype(np.int64), 0, n_hist - 1)

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        b = bucket_of(-df["n_tokens"].to_numpy(np.int64))
        c = np.bincount(b, minlength=n_hist)
        nz = np.nonzero(c)[0]
        return pd.DataFrame({"b": nz, "cnt": c[nz]})

    counts = (ds.map_batches(hist, batch_format="pandas").to_pandas()
              .groupby("b", as_index=False).agg(cnt=("cnt", "sum")))
    full = np.zeros(n_hist, dtype=np.int64)
    full[counts["b"].to_numpy(np.int64)] = counts["cnt"].to_numpy(np.int64)
    offsets = np.concatenate([[0], np.cumsum(full)[:-1]])

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["b"] = bucket_of(-df["n_tokens"].to_numpy(np.int64))
        return df

    def deal(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "n_tokens": pd.Series(dtype=np.int64),
                                 "shard_id": pd.Series(dtype=np.int64)})
        outs = []
        for b, g in df.groupby("b"):
            g = g.assign(neg=-g["n_tokens"].to_numpy(np.int64)).sort_values(
                ["neg", "doc_id"], kind="stable")
            rn = offsets[int(b)] + np.arange(len(g), dtype=np.int64)
            pos = rn % n_shards
            shard = np.where((rn // n_shards) % 2 == 0, pos,
                             n_shards - 1 - pos)
            outs.append(pd.DataFrame({
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "n_tokens": g["n_tokens"].to_numpy(np.int64),
                "shard_id": shard.astype(np.int64),
            }))
        return pd.concat(outs, ignore_index=True)

    return bucketed_group_apply(ds.map_batches(keyed, batch_format="pandas"),
                                ["b"], lambda df: df, deal,
                                n_buckets=n_buckets)


SHARD_PLAN_SQL = f"""
WITH t AS (SELECT doc_id,
             length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
           FROM documents),
r AS (SELECT doc_id, n_tokens,
        ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id) - 1 AS rn
      FROM t)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(CASE WHEN (rn // {N_SHARDS}) % 2 = 0 THEN rn % {N_SHARDS}
                 ELSE {N_SHARDS} - 1 - rn % {N_SHARDS} END AS BIGINT)
         AS shard_id
FROM r
"""


SOURCE_CAP = 20


def source_cap_sample(sf_dir: str, cap: int = SOURCE_CAP,
                      n_buckets: int = 16) -> "ray.data.Dataset":
    """(doc_id, source) — deterministic per-source cap: each source keeps its
    ``cap`` docs with the smallest seeded hash (ties by doc_id). The
    domain-rebalancing step of corpus mixing — over-represented sources are
    down-sampled reproducibly, and because the pick is a pure function of
    doc_id the same docs survive at any parallelism or corpus order.

    Grouped top-k by hash: each block keeps ≤cap rows per source (partial
    top-k), ONE exchange on source moves ≤cap×blocks key rows, reducers
    re-apply the same rule. Never ships text, never sorts globally."""

    def part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["hk"] = [hashlib.md5(f"{d}-cap".encode()).hexdigest()
                    for d in df["doc_id"].astype(np.int64)]
        return (df.sort_values(["source", "hk", "doc_id"], kind="stable")
                .groupby("source", as_index=False, sort=False).head(cap))

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "source": pd.Series(dtype="string")})
        kept = (df.sort_values(["source", "hk", "doc_id"], kind="stable")
                .groupby("source", as_index=False, sort=False).head(cap))
        return pd.DataFrame({
            "doc_id": kept["doc_id"].to_numpy(np.int64),
            "source": kept["source"].astype("string"),
        })

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source"])
    return bucketed_group_apply(
        ds.map_batches(part, batch_format="pandas"),
        ["source"], lambda df: df, fin, n_buckets=n_buckets)


SOURCE_CAP_SAMPLE_SQL = f"""
WITH h AS (SELECT doc_id, source,
             md5(CAST(doc_id AS VARCHAR) || '-cap') AS hk
           FROM documents),
r AS (SELECT doc_id, source,
        ROW_NUMBER() OVER (PARTITION BY source ORDER BY hk, doc_id) AS rn
      FROM h)
SELECT CAST(doc_id AS BIGINT) AS doc_id, source
FROM r WHERE rn <= {SOURCE_CAP}
"""


# ---------------------------------------------------------------------------
# Exact-ratio stratified train/val/test split
# ---------------------------------------------------------------------------

_SPLIT_TRAIN_PCT = 80
_SPLIT_VAL_PCT = 10  # test = remainder


def dataset_split(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, source, split) with split ∈ {train, val, test} — exhaustive
    80/10/10 partition with EXACT per-source ratios: within each source,
    docs rank by (md5-hkey, doc_id) and the first ``floor(n·0.8)`` are
    train, the next ``floor(n·0.1)`` val, the rest test. Contrast
    `hash_sample` (Bernoulli, approximate ratios) and `stratified_sample`
    (fixed per-group quota): this is the eval-protocol split where exact,
    reproducible group-wise counts matter and EVERY doc gets a label.

    Dataflow: key-only (doc_id, source, hkey) rows — text never ships —
    through ONE source-keyed exchange; the per-source reducer sorts its
    group (group-sized, the per-source partition a rank split inherently
    needs) and cuts at the two exact boundaries. Deterministic across runs
    and cluster sizes (md5-hkey order, doc_id tie-break).

    Reference parity note: no counterpart in the reference — brief-mandated
    sampling family (the train/eval protocol split)."""
    from .shuffle import bucketed_group_apply

    ds = _read_docs(sf_dir, ["doc_id", "source"])

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": ids, "source": df["source"].astype(str),
            "hk": _hkeys(ids),
        })

    def cut(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for src, g in df.groupby("source", sort=False):
            g = g.sort_values(["hk", "doc_id"])
            n = len(g)
            n_tr = n * _SPLIT_TRAIN_PCT // 100
            n_va = n * _SPLIT_VAL_PCT // 100
            split = np.full(n, "test", dtype=object)
            split[:n_tr] = "train"
            split[n_tr:n_tr + n_va] = "val"
            out.append(pd.DataFrame({
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "source": src, "split": split,
            }))
        if not out:
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "source": pd.Series(dtype=str),
                                 "split": pd.Series(dtype=str)})
        return pd.concat(out, ignore_index=True)

    return bucketed_group_apply(
        ds.map_batches(keyed, batch_format="pandas"),
        ["source"], lambda d: d, cut, n_buckets=8)


DATASET_SPLIT_SQL = f"""
WITH k AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT AS hk
  FROM documents),
r AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY hk, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM k)
SELECT doc_id, source,
       CASE WHEN rn <= n * {_SPLIT_TRAIN_PCT} // 100 THEN 'train'
            WHEN rn <= n * {_SPLIT_TRAIN_PCT} // 100
                     + n * {_SPLIT_VAL_PCT} // 100 THEN 'val'
            ELSE 'test' END AS split
FROM r
"""


# ---------------------------------------------------------------------------
# Temperature-mixing plan
# ---------------------------------------------------------------------------

def mixing_plan(sf_dir: str) -> pd.DataFrame:
    """(source, tokens, weight, required_tokens, epochs_e6, upsampled) —
    temperature-resampling plan across sources: target sampling weights
    proportional to tokens^(1/2) (the standard alpha=0.5 temperature that
    flattens the source distribution without inverting it), applied to a
    budget equal to the total corpus token count. ``epochs_e6`` =
    required/available; > 1e6 means the source must repeat (upsampled = 1)
    — exactly the report a data-mixing stage consumes to build its
    per-source repeat factors.

    Exactness: the weight is the INTEGER floor(sqrt(tokens)) (the same
    IEEE double sqrt then floor on both engines — loudly bounded to
    tokens < 2^52 where the double is exact), so every downstream ratio is
    integer floor division: no float summation order anywhere. One
    streamed pass of per-block (source, tokens) partials; source-bounded
    driver fold."""

    def tok(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        text = batch["text"]
        n_chars = pc.utf8_length(text).cast(pa.int64())
        no_space = pc.utf8_length(
            pc.replace_substring(text, pattern=" ", replacement="")
        ).cast(pa.int64())
        nt = pc.add(pc.subtract(n_chars, no_space), 1)
        df = pd.DataFrame({
            "source": batch["source"].to_pandas(),
            "tokens": nt.to_numpy(zero_copy_only=False).astype(np.int64)})
        return df.groupby("source", as_index=False)["tokens"].sum()

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text", "source"])
    g = (ds.map_batches(tok, batch_format="pyarrow", zero_copy_batch=True)
         .to_pandas().groupby("source", as_index=False)["tokens"].sum())
    toks = g["tokens"].to_numpy(np.int64)
    if toks.size and int(toks.max()) >= 1 << 52:
        raise ValueError("per-source token count exceeds the exact-double "
                         "sqrt bound (2^52); switch the weight to isqrt")
    import math as _m

    w = np.asarray([int(_m.floor(_m.sqrt(float(t)))) for t in toks],
                   dtype=np.int64)
    total = int(toks.sum())
    denom = int(w.sum())
    req = [total * int(wi) // denom for wi in w]
    ep = [r * 1_000_000 // int(t) for r, t in zip(req, toks)]
    out = pd.DataFrame({
        "source": g["source"], "tokens": toks, "weight": w,
        "required_tokens": np.asarray(req, dtype=np.int64),
        "epochs_e6": np.asarray(ep, dtype=np.int64),
        "upsampled": (np.asarray(ep, dtype=np.int64)
                      > 1_000_000).astype(np.int64)})
    return out.sort_values("source").reset_index(drop=True)


MIXING_PLAN_SQL = """
WITH t AS (
  SELECT source,
    CAST(SUM(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) AS BIGINT)
      AS tokens
  FROM documents GROUP BY 1),
w AS (SELECT source, tokens,
             CAST(FLOOR(SQRT(CAST(tokens AS DOUBLE))) AS BIGINT) AS weight
      FROM t),
n AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total,
             CAST(SUM(weight) AS BIGINT) AS denom FROM w)
SELECT source, tokens, weight,
       CAST(CAST(n.total AS HUGEINT) * weight // n.denom AS BIGINT)
         AS required_tokens,
       CAST((CAST(n.total AS HUGEINT) * weight // n.denom) * 1000000
            // tokens AS BIGINT) AS epochs_e6,
       CAST(CASE WHEN (CAST(n.total AS HUGEINT) * weight // n.denom)
                      * 1000000 // tokens > 1000000
                 THEN 1 ELSE 0 END AS BIGINT) AS upsampled
FROM w, n
"""


# ---------------------------------------------------------------------------
# Shuffle-quality audit (inter-epoch rank correlation)
# ---------------------------------------------------------------------------

def shuffle_quality(sf_dir: str, seed_a: int = SHUFFLE_SEED,
                    seed_b: int = SHUFFLE_SEED + 1) -> pd.DataFrame:
    """(n, rho_e9) — Spearman rank correlation between two epochs' training
    orders (seeds a and b): the shuffle-quality audit — a sound epoch
    shuffler decorrelates consecutive epochs, so rho should sit near 0; a
    biased keying scheme (e.g. hashing a correlated field) shows up here
    before it shows up as a training-order artifact.

    Positions are permutations, so rho has the exact rational closed form
    ``1 − 6·Σd² / (n(n²−1))``: two rank-attach passes (no global sort),
    ONE doc_id hash join, per-block Σd² partials carried as decimal strings
    (Σd² is O(n³) — far past int64 at corpus scale; HUGEINT in the
    oracle), and the single rho division is one identical-double from
    exact ints. Degenerate n ≤ 1 emits rho_e9 = 1e9 by stated
    convention."""
    from .shuffle import bucketed_group_apply

    a = epoch_shuffle_ds(_read_docs(sf_dir, ["doc_id"]), seed=seed_a)
    b = epoch_shuffle_ds(_read_docs(sf_dir, ["doc_id"]), seed=seed_b)

    def tag(side: str):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"doc_id": df["doc_id"].astype(np.int64),
                                 "pos": df["pos"].astype(np.int64),
                                 "side": side})
        return f

    both = (a.map_batches(tag("a"), batch_format="pandas")
            .union(b.map_batches(tag("b"), batch_format="pandas")))

    def pair_d2(df: pd.DataFrame) -> pd.DataFrame:
        piv = df.pivot_table(index="doc_id", columns="side", values="pos",
                             aggfunc="first")
        if "a" not in piv or "b" not in piv:
            return pd.DataFrame({"n": [0], "sd2": ["0"]})
        d = piv["a"].to_numpy(np.int64) - piv["b"].to_numpy(np.int64)
        # Σd² in unbounded Python ints — np.dot would accumulate in int64
        # and wrap silently at the corpus sizes the fold is meant to cover
        sd2 = sum(int(v) * int(v) for v in d)
        return pd.DataFrame({"n": [len(d)], "sd2": [str(sd2)]})

    parts = bucketed_group_apply(both, ["doc_id"], lambda d: d,
                                 pair_d2).to_pandas()
    n = int(parts["n"].sum())
    sd2 = sum(int(v) for v in parts["sd2"])
    if n <= 1:
        rho_e9 = 1_000_000_000
    else:
        from .stats import _round_e9

        den = n * (n * n - 1)
        rho_e9 = _round_e9(float(den - 6 * sd2) / float(den))
    return pd.DataFrame([[n, rho_e9]], columns=["n", "rho_e9"]).astype(
        np.int64)


def shuffle_quality_sql(seed_a: int = SHUFFLE_SEED,
                        seed_b: int = SHUFFLE_SEED + 1) -> str:
    return f"""
WITH a AS (SELECT doc_id,
             CAST(ROW_NUMBER() OVER (
                    ORDER BY md5(CAST(doc_id AS VARCHAR) || '-{seed_a}'),
                             doc_id) - 1 AS HUGEINT) AS pos
           FROM documents),
b AS (SELECT doc_id,
             CAST(ROW_NUMBER() OVER (
                    ORDER BY md5(CAST(doc_id AS VARCHAR) || '-{seed_b}'),
                             doc_id) - 1 AS HUGEINT) AS pos
      FROM documents),
j AS (SELECT a.pos - b.pos AS d FROM a JOIN b USING (doc_id)),
s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(d * d) AS sd2 FROM j)
SELECT CAST(n AS BIGINT) AS n,
       CAST(CASE WHEN n <= 1 THEN 1000000000
                 ELSE ROUND(CAST(n * (n * n - 1) - 6 * sd2 AS DOUBLE)
                            / CAST(n * (n * n - 1) AS DOUBLE)
                            * 1000000000)
            END AS BIGINT) AS rho_e9
FROM s
"""


SHUFFLE_QUALITY_SQL = shuffle_quality_sql()


# ---------------------------------------------------------------------------
# Deterministic token-mask corruption pairs (T5/MLM-style)
# ---------------------------------------------------------------------------

_MASK_P_BP = 1500   # 15% token mask rate
_MASK_SEED = 11


def mask_corruption_pairs(sf_dir: str, p_bp: int = _MASK_P_BP,
                          seed: int = _MASK_SEED) -> "ray.data.Dataset":
    """(doc_id, n_tokens, n_masked, visible_fp, target_fp) — deterministic
    denoising-objective pair generation (the T5/MLM data prep): each
    whitespace token is masked iff ``md5(doc_id:pos:seed) < p``, the
    visible stream is the unmasked tokens in order, the target stream the
    masked ones. Fingerprints (md5 of each side) stand in for the payloads
    so the output stays narrow (contrastive_pairs precedent); a real
    pipeline would carry the streams themselves.

    Hash-keyed masking is the scale story: the mask is a pure function of
    (doc_id, pos, seed) — no RNG state, stable under retries, cluster-size
    independent, and restatable in SQL. One streamed pass, zero shuffle."""
    thr = p_bp * (1 << 32) // 10000

    def corrupt(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = {"doc_id": [], "n_tokens": [], "n_masked": [],
               "visible_fp": [], "target_fp": []}
        for did, text in zip(ids, batch["text"].to_pylist()):
            toks = text.split(" ")
            vis, tgt = [], []
            for pos, t in enumerate(toks, start=1):
                u = int.from_bytes(
                    hashlib.md5(f"{did}:{pos}:{seed}".encode()).digest()[:4],
                    "big")
                (tgt if u < thr else vis).append(t)
            out["doc_id"].append(int(did))
            out["n_tokens"].append(len(toks))
            out["n_masked"].append(len(tgt))
            out["visible_fp"].append(
                hashlib.md5(" ".join(vis).encode()).hexdigest())
            out["target_fp"].append(
                hashlib.md5(" ".join(tgt).encode()).hexdigest())
        return pd.DataFrame(out)

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(corrupt, batch_format="pyarrow", zero_copy_batch=True)


def mask_corruption_pairs_sql(p_bp: int = _MASK_P_BP,
                              seed: int = _MASK_SEED) -> str:
    thr = p_bp * (1 << 32) // 10000
    return f"""
WITH toks AS (
  SELECT doc_id, w AS tok, pos
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       LATERAL (SELECT unnest(ws) AS w,
                       generate_subscripts(ws, 1) AS pos)),
m AS (
  SELECT doc_id, tok, pos,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                             CAST(pos AS VARCHAR) || ':{seed}'), 1, 8))
           ::UBIGINT < {thr} AS masked
  FROM toks)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
       md5(COALESCE(string_agg(tok, ' ' ORDER BY pos)
                    FILTER (WHERE NOT masked), '')) AS visible_fp,
       md5(COALESCE(string_agg(tok, ' ' ORDER BY pos)
                    FILTER (WHERE masked), '')) AS target_fp
FROM m GROUP BY doc_id
"""


MASK_CORRUPTION_PAIRS_SQL = mask_corruption_pairs_sql()
