"""Curation-evaluation report operators over the documents table.

The quality-filter family (textops.quality_logreg / gopher_filter) tells a
pipeline WHAT to keep; these operators tell its operators whether the
filters can be trusted: inter-classifier agreement (Cohen's kappa), score
calibration against an independent rule set, ensemble voting, corpus
n-gram diversity (the distinct-share half of Self-BLEU), training
padding-waste planning, and a two-sample Kolmogorov-Smirnov drift gate.

All outputs are exact integers (basis points / counts) so the DuckDB
oracles compare bit-for-bit; every driver-side fold in this module is
domain-bounded (2x2 confusion cells, score bins, fixed length buckets,
sources x buckets, the drift column's value domain) — never corpus-bounded.

Reference parity note: no counterpart in the reference (sequential
LLM-agent app); brief-mandated training-data curation family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .textops import (
    STOPWORD_PATTERN,
    _GOPHER_KINDS_SQL,
    _GOPHER_MAX_WLEN100,
    _GOPHER_MAX_WORDS,
    _GOPHER_MIN_ALPHA_BP,
    _GOPHER_MIN_STOP_KINDS,
    _GOPHER_MIN_WLEN100,
    _GOPHER_MIN_WORDS,
    _GOPHER_STOPWORDS,
    _QLR_BIAS,
    _QLR_LEN_CAP,
    _QLR_W_DIGIT,
    _QLR_W_LEN,
    _QLR_W_STOP,
    _QLR_W_WLEN,
    _doc_ngrams,
)


def _doc_features(batch: pa.Table) -> dict[str, np.ndarray]:
    """Shared vectorized feature pass: every signal both classifiers need,
    computed once per batch (one Arrow scan, no Python rows)."""
    text = batch["text"]
    n_chars = pc.utf8_length(text).cast(pa.int64())
    no_space = pc.utf8_length(
        pc.replace_substring(text, pattern=" ", replacement="")
    ).cast(pa.int64())
    n_tokens = pc.add(pc.subtract(n_chars, no_space), 1)
    low = pc.utf8_lower(text)
    n_stop = pc.count_substring_regex(low, pattern=STOPWORD_PATTERN).cast(pa.int64())
    n_digit = pc.count_substring_regex(text, pattern="[0-9]").cast(pa.int64())
    n_alpha = pc.count_substring_regex(low, pattern="[a-z]").cast(pa.int64())
    kinds = None
    for w in _GOPHER_STOPWORDS:
        k = pc.cast(
            pc.greater(
                pc.count_substring_regex(low, pattern=rf"\b{w}\b"), 0
            ),
            pa.int64(),
        )
        kinds = k if kinds is None else pc.add(kinds, k)
    out = {
        "n_chars": n_chars,
        "no_space": no_space,
        "n_tokens": n_tokens,
        "n_stop": n_stop,
        "n_digit": n_digit,
        "n_alpha": n_alpha,
        "n_stop_kinds": kinds,
    }
    return {k: v.to_numpy(zero_copy_only=False).astype(np.int64)
            for k, v in out.items()}


def _logreg_logit(f: dict[str, np.ndarray]) -> np.ndarray:
    safe_tok = np.maximum(f["n_tokens"], 1)
    safe_chr = np.maximum(f["n_chars"], 1)
    stop_bp = f["n_stop"] * 10000 // safe_tok
    digit_bp = f["n_digit"] * 10000 // safe_chr
    wlen100 = f["no_space"] * 100 // safe_tok
    len_cap = np.minimum(f["n_tokens"], _QLR_LEN_CAP)
    return (_QLR_BIAS + _QLR_W_LEN * len_cap + _QLR_W_STOP * stop_bp
            + _QLR_W_DIGIT * digit_bp + _QLR_W_WLEN * wlen100)


def _gopher_keep(f: dict[str, np.ndarray]) -> np.ndarray:
    safe_tok = np.maximum(f["n_tokens"], 1)
    safe_chr = np.maximum(f["n_chars"], 1)
    wlen100 = f["no_space"] * 100 // safe_tok
    alpha_bp = f["n_alpha"] * 10000 // safe_chr
    keep = (
        (f["n_tokens"] >= _GOPHER_MIN_WORDS)
        & (f["n_tokens"] <= _GOPHER_MAX_WORDS)
        & (wlen100 >= _GOPHER_MIN_WLEN100)
        & (wlen100 <= _GOPHER_MAX_WLEN100)
        & (alpha_bp >= _GOPHER_MIN_ALPHA_BP)
        & (f["n_stop_kinds"] >= _GOPHER_MIN_STOP_KINDS)
    )
    return keep.astype(np.int64)


# SQL fragments restating the two keep rules (shared by every oracle below).
_LOGIT_SQL = f"""
  {_QLR_BIAS}
  + {_QLR_W_LEN} * LEAST(n_tokens, {_QLR_LEN_CAP})
  + {_QLR_W_STOP} * (n_stop * 10000 // GREATEST(n_tokens, 1))
  + ({_QLR_W_DIGIT}) * (n_digit * 10000 // GREATEST(n_chars, 1))
  + {_QLR_W_WLEN} * ((n_chars - n_space) * 100 // GREATEST(n_tokens, 1))
"""

_GKEEP_SQL = f"""
  CASE WHEN n_tokens BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS}
        AND (n_chars - n_space) * 100 // GREATEST(n_tokens, 1)
            BETWEEN {_GOPHER_MIN_WLEN100} AND {_GOPHER_MAX_WLEN100}
        AND n_alpha * 10000 // GREATEST(n_chars, 1) >= {_GOPHER_MIN_ALPHA_BP}
        AND n_stop_kinds >= {_GOPHER_MIN_STOP_KINDS}
       THEN 1 ELSE 0 END
"""

_FEAT_SQL = rf"""
  SELECT doc_id, source,
    CAST(LENGTH(text) AS BIGINT) AS n_chars,
    CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS BIGINT) AS n_space,
    CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT)
      AS n_tokens,
    CAST(COALESCE(len(regexp_extract_all(lower(text), '\b(the|a)\b')), 0)
      AS BIGINT) AS n_stop,
    CAST(COALESCE(len(regexp_extract_all(text, '[0-9]')), 0) AS BIGINT)
      AS n_digit,
    CAST(len(regexp_extract_all(lower(text), '[a-z]')) AS BIGINT) AS n_alpha,
    CAST({_GOPHER_KINDS_SQL} AS BIGINT) AS n_stop_kinds
  FROM documents
"""


def classifier_kappa(sf_dir: str) -> pd.DataFrame:
    """(n, n00, n01, n10, n11, po_bp, pe_bp, kappa_bp) — Cohen's kappa
    between the two deterministic quality gates (quality_logreg keep vs
    gopher_filter keep): the inter-classifier agreement check a curation
    pipeline runs before trusting an ensemble of filters.

    Plan: ONE fused vectorized pass computes both verdicts per doc (the two
    gates share their feature extraction — no join, no second scan); each
    block emits a 4-cell confusion partial; the driver folds the cells in
    unbounded Python ints (cell-domain-bounded: 4 ints per block), so the
    kappa numerator ``po_num*N - pe_num`` is exact at ANY corpus size —
    ``pe_num`` is O(N^2) and would wrap int64 past ~3e9 docs, hence Python
    ints here and HUGEINT in the oracle. Degenerate marginals (pe == 1,
    which forces po == 1) emit kappa_bp = 10000 by convention, stated in
    the oracle too. Floor-division basis points throughout.
    """

    def confusion(batch: pa.Table) -> pd.DataFrame:
        f = _doc_features(batch)
        a = (_logreg_logit(f) >= 0).astype(np.int64)
        b = _gopher_keep(f)
        cell = a * 2 + b
        cnt = np.bincount(cell, minlength=4).astype(np.int64)
        return pd.DataFrame(
            {"n00": [cnt[0]], "n01": [cnt[1]], "n10": [cnt[2]], "n11": [cnt[3]]}
        )

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    parts = ds.map_batches(confusion, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    n00, n01 = int(parts["n00"].sum()), int(parts["n01"].sum())
    n10, n11 = int(parts["n10"].sum()), int(parts["n11"].sum())
    n = n00 + n01 + n10 + n11
    if n == 0:
        raise ValueError("classifier_kappa: empty documents table")
    po_num = n00 + n11
    pe_num = (n00 + n01) * (n00 + n10) + (n10 + n11) * (n01 + n11)
    po_bp = 10000 * po_num // n
    pe_bp = 10000 * pe_num // (n * n)
    denom = n * n - pe_num
    if denom == 0:
        kappa_bp = 10000
    else:
        # DuckDB's integer `//` truncates toward zero while Python floors;
        # kappa can be negative, so truncate explicitly to match the oracle
        num = 10000 * (po_num * n - pe_num)
        kappa_bp = abs(num) // denom * (1 if num >= 0 else -1)
    return pd.DataFrame(
        [[n, n00, n01, n10, n11, po_bp, pe_bp, kappa_bp]],
        columns=["n", "n00", "n01", "n10", "n11", "po_bp", "pe_bp",
                 "kappa_bp"],
    ).astype(np.int64)


CLASSIFIER_KAPPA_SQL = f"""
WITH f AS ({_FEAT_SQL}),
v AS (
  SELECT CASE WHEN ({_LOGIT_SQL}) >= 0 THEN 1 ELSE 0 END AS a,
         {_GKEEP_SQL} AS b
  FROM f),
c AS (
  SELECT
    CAST(SUM(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS n00,
    CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS n01,
    CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS n10,
    CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS n11
  FROM v),
k AS (
  SELECT n00 + n01 + n10 + n11 AS n, n00, n01, n10, n11,
         n00 + n11 AS po_num,
         (n00 + n01) * (n00 + n10) + (n10 + n11) * (n01 + n11) AS pe_num
  FROM c)
SELECT CAST(n AS BIGINT) AS n, CAST(n00 AS BIGINT) AS n00,
       CAST(n01 AS BIGINT) AS n01, CAST(n10 AS BIGINT) AS n10,
       CAST(n11 AS BIGINT) AS n11,
       CAST(10000 * po_num // n AS BIGINT) AS po_bp,
       CAST(10000 * pe_num // (n * n) AS BIGINT) AS pe_bp,
       CAST(CASE WHEN n * n - pe_num = 0 THEN 10000
                 ELSE 10000 * (po_num * n - pe_num) // (n * n - pe_num)
            END AS BIGINT) AS kappa_bp
FROM k
"""


def fleiss_kappa(sf_dir: str) -> pd.DataFrame:
    """(n, c0, c1, c2, c3, kappa_bp) — Fleiss' kappa for the THREE
    deterministic quality gates (stopword-band, linear classifier, Gopher
    rules) as raters over binary keep/drop: the multi-rater generalization
    of :func:`classifier_kappa` — the agreement statistic to quote when an
    ensemble of ≥3 filters votes (quality_ensemble's histogram, reduced to
    one chance-corrected scalar).

    With r=3 raters and 2 categories the per-doc vote count v ∈ {0..3} is a
    sufficient statistic: P̄ = Σ_v c_v·w_v / (6N) with w = (6,2,2,6)
    (pairwise-agreement weights v(v−1)+(3−v)(2−v)), and
    P̄_e = (V² + (3N−V)²)/(9N²) with V = Σ v·c_v. kappa =
    (3NS − 2E)/(18N² − 2E), E = V² + (3N−V)² — every fold an unbounded
    Python int (E is O(N²), past int64 at ~1e9 docs → HUGEINT oracle).
    Degenerate chance agreement (V=0 or V=3N) emits the 10000 sentinel,
    stated identically in SQL; truncating division matches DuckDB ``//``.

    Dataflow: ONE fused pass (all three gates share _doc_features), 4-cell
    bincount partials, cell-domain-bounded driver fold."""

    def votes(batch: pa.Table) -> pd.DataFrame:
        f = _doc_features(batch)
        stop_bp = f["n_stop"] * 10000 // np.maximum(f["n_tokens"], 1)
        v1 = ((stop_bp >= _ENS_STOP_LO)
              & (stop_bp <= _ENS_STOP_HI)).astype(np.int64)
        v2 = (_logreg_logit(f) >= 0).astype(np.int64)
        v3 = _gopher_keep(f)
        cnt = np.bincount(v1 + v2 + v3, minlength=4).astype(np.int64)
        return pd.DataFrame({"c0": [cnt[0]], "c1": [cnt[1]],
                             "c2": [cnt[2]], "c3": [cnt[3]]})

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    parts = ds.map_batches(votes, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    c = [int(parts[f"c{v}"].sum()) for v in range(4)]
    n = sum(c)
    if n == 0:
        raise ValueError("fleiss_kappa: empty documents table")
    s = 6 * c[0] + 2 * c[1] + 2 * c[2] + 6 * c[3]
    vv = c[1] + 2 * c[2] + 3 * c[3]
    ee = vv * vv + (3 * n - vv) ** 2
    den = 18 * n * n - 2 * ee
    if den == 0:
        kappa_bp = 10000
    else:
        # DuckDB // truncates toward zero; Python floors — kappa can be
        # negative, so truncate explicitly (the classifier_kappa recipe)
        num = 10000 * (3 * n * s - 2 * ee)
        kappa_bp = abs(num) // den * (1 if num >= 0 else -1)
    return pd.DataFrame(
        [[n, *c, kappa_bp]],
        columns=["n", "c0", "c1", "c2", "c3", "kappa_bp"]).astype(np.int64)


# _ENS_STOP_LO/_ENS_STOP_HI are defined below with quality_ensemble; the SQL
# is assembled after them (module bottom ordering keeps one source of truth).


# Calibration binning: logit bins of width 500, shifted by a fixed lower
# bound so floor division is sign-safe identically in numpy and SQL. The
# logit is bounded below by BIAS + W_DIGIT*10000 = -67500 > _CAL_LB
# (feature shares are <= 10000 bp by construction); enforced at runtime.
_CAL_LB = -100_000
_CAL_W = 500


def calibration_bins(sf_dir: str) -> pd.DataFrame:
    """(bin_lo, n_docs, n_pos, pos_rate_bp) — reliability diagram of the
    linear quality classifier's score against the independent Gopher rule
    set: per logit bin, how often does the rule-based gate agree? The
    standard calibration check before using a learned filter's score as a
    sampling weight (CCNet-style).

    Same fused single pass as classifier_kappa; per-block (bin, n, n_pos)
    partials; driver fold is bin-domain-bounded (score range / bin width,
    a few hundred cells, independent of corpus size). Exact integers.
    """

    def per_bin(batch: pa.Table) -> pd.DataFrame:
        f = _doc_features(batch)
        logit = _logreg_logit(f)
        if logit.size and int(logit.min()) < _CAL_LB:
            raise ValueError("logit below the fixed calibration lower bound")
        b = (logit - _CAL_LB) // _CAL_W
        pos = _gopher_keep(f)
        df = pd.DataFrame({"b": b, "pos": pos})
        g = df.groupby("b", as_index=False).agg(
            n_docs=("pos", "size"), n_pos=("pos", "sum"))
        return g

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    parts = ds.map_batches(per_bin, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if parts.empty:  # all-empty input loses schema in Ray → guard explicitly
        return pd.DataFrame({c: pd.Series(dtype=np.int64)
                             for c in ("bin_lo", "n_docs", "n_pos",
                                       "pos_rate_bp")})
    g = parts.groupby("b", as_index=False).sum()
    g["bin_lo"] = _CAL_LB + g["b"] * _CAL_W
    g["pos_rate_bp"] = g["n_pos"] * 10000 // g["n_docs"]
    out = g[["bin_lo", "n_docs", "n_pos", "pos_rate_bp"]].astype(np.int64)
    return out.sort_values("bin_lo").reset_index(drop=True)


CALIBRATION_BINS_SQL = f"""
WITH f AS ({_FEAT_SQL}),
v AS (
  SELECT ({_LOGIT_SQL}) AS logit, {_GKEEP_SQL} AS pos FROM f),
b AS (
  SELECT {_CAL_LB} + ((logit - ({_CAL_LB})) // {_CAL_W}) * {_CAL_W} AS bin_lo,
         pos
  FROM v)
SELECT CAST(bin_lo AS BIGINT) AS bin_lo,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(pos) AS BIGINT) AS n_pos,
       CAST(SUM(pos) * 10000 // COUNT(*) AS BIGINT) AS pos_rate_bp
FROM b GROUP BY 1
"""


# Ensemble vote thresholds for the cheap stopword-ratio gate (vote 1).
_ENS_STOP_LO = 100
_ENS_STOP_HI = 5000


def quality_ensemble(sf_dir: str) -> pd.DataFrame:
    """(source, votes, n_docs) — ensemble quality report: three independent
    deterministic gates vote per document (stopword-ratio in
    [_ENS_STOP_LO, _ENS_STOP_HI] bp, linear-classifier keep, Gopher rules
    keep) and the corpus is summarized by per-source vote histogram — the
    curation-dashboard view of how filters overlap across sources.

    One fused pass (all three gates share the feature extraction), per-block
    (source, votes) partials, driver fold bounded by sources x 4 cells.
    """

    def votes(batch: pa.Table) -> pd.DataFrame:
        f = _doc_features(batch)
        stop_bp = f["n_stop"] * 10000 // np.maximum(f["n_tokens"], 1)
        v1 = ((stop_bp >= _ENS_STOP_LO) & (stop_bp <= _ENS_STOP_HI)).astype(np.int64)
        v2 = (_logreg_logit(f) >= 0).astype(np.int64)
        v3 = _gopher_keep(f)
        df = pd.DataFrame(
            {"source": batch["source"].to_pandas(), "votes": v1 + v2 + v3})
        return df.groupby(["source", "votes"], as_index=False).agg(
            n_docs=("votes", "size"))

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "source"])
    parts = ds.map_batches(votes, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if parts.empty:  # all-empty input loses schema in Ray → guard explicitly
        return pd.DataFrame({"source": pd.Series(dtype=object),
                             "votes": pd.Series(dtype=np.int64),
                             "n_docs": pd.Series(dtype=np.int64)})
    g = parts.groupby(["source", "votes"], as_index=False)["n_docs"].sum()
    g["votes"] = g["votes"].astype(np.int64)
    g["n_docs"] = g["n_docs"].astype(np.int64)
    return g.sort_values(["source", "votes"]).reset_index(drop=True)


QUALITY_ENSEMBLE_SQL = f"""
WITH f AS ({_FEAT_SQL}),
v AS (
  SELECT source,
    (CASE WHEN n_stop * 10000 // GREATEST(n_tokens, 1)
               BETWEEN {_ENS_STOP_LO} AND {_ENS_STOP_HI}
          THEN 1 ELSE 0 END)
    + (CASE WHEN ({_LOGIT_SQL}) >= 0 THEN 1 ELSE 0 END)
    + ({_GKEEP_SQL}) AS votes
  FROM f)
SELECT source, CAST(votes AS BIGINT) AS votes,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM v GROUP BY 1, 2
"""


FLEISS_KAPPA_SQL = f"""
WITH f AS ({_FEAT_SQL}),
v AS (
  SELECT
    (CASE WHEN n_stop * 10000 // GREATEST(n_tokens, 1)
               BETWEEN {_ENS_STOP_LO} AND {_ENS_STOP_HI}
          THEN 1 ELSE 0 END)
    + (CASE WHEN ({_LOGIT_SQL}) >= 0 THEN 1 ELSE 0 END)
    + ({_GKEEP_SQL}) AS votes
  FROM f),
c AS (
  SELECT
    CAST(SUM(CASE WHEN votes = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS c0,
    CAST(SUM(CASE WHEN votes = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS c1,
    CAST(SUM(CASE WHEN votes = 2 THEN 1 ELSE 0 END) AS HUGEINT) AS c2,
    CAST(SUM(CASE WHEN votes = 3 THEN 1 ELSE 0 END) AS HUGEINT) AS c3
  FROM v),
k AS (
  SELECT c0 + c1 + c2 + c3 AS n, c0, c1, c2, c3,
         6*c0 + 2*c1 + 2*c2 + 6*c3 AS s,
         c1 + 2*c2 + 3*c3 AS vv
  FROM c),
e AS (SELECT *, vv*vv + (3*n - vv)*(3*n - vv) AS ee FROM k)
SELECT CAST(n AS BIGINT) AS n, CAST(c0 AS BIGINT) AS c0,
       CAST(c1 AS BIGINT) AS c1, CAST(c2 AS BIGINT) AS c2,
       CAST(c3 AS BIGINT) AS c3,
       CAST(CASE WHEN 18*n*n - 2*ee = 0 THEN 10000
                 ELSE 10000 * (3*n*s - 2*ee) // (18*n*n - 2*ee)
            END AS BIGINT) AS kappa_bp
FROM e
"""


def ngram_diversity(sf_dir: str, n: int = 2) -> pd.DataFrame:
    """(source, n_grams, n_distinct, ttr_bp) — per-source word n-gram
    type/token ratio: the distinct-share half of Self-BLEU, the standard
    diversity audit for synthetic/generated training corpora (low ttr ==
    mode-collapsed or templated source).

    Plan: per-block (source, gram, count) partials feed ONE hash exchange
    on the gram (the decontaminate/doc_logprob_bigram machinery — only the
    shrunk gram table moves, never text); each bucket finishes its share of
    the distinct/total sums per source, and the driver folds
    sources x buckets rows. No corpus-bounded state anywhere: the exchange
    output is n-gram-vocabulary-bounded, the fold is fixed-size.
    """
    from .shuffle import hash_exchange_apply

    def gram_partial(batch: pa.Table) -> pa.Table:
        doc_idx, grams = _doc_ngrams(batch, n)
        src = batch["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        t = pa.table({"source": src.take(pa.array(doc_idx)), "g": grams})
        return (t.group_by(["source", "g"])
                .aggregate([("g", "count")])
                .rename_columns(["source", "g", "cnt"]))

    def bucket_final(tab: pa.Table) -> pa.Table:
        merged = (tab.group_by(["source", "g"])
                  .aggregate([("cnt", "sum")])
                  .rename_columns(["source", "g", "cnt"]))
        return (merged.group_by("source")
                .aggregate([("g", "count"), ("cnt", "sum")])
                .rename_columns(["source", "n_distinct", "n_grams"]))

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "source"])
    parts = hash_exchange_apply(ds, ["g"], gram_partial, bucket_final,
                                n_buckets=16).to_pandas()
    g = parts.groupby("source", as_index=False)[["n_distinct", "n_grams"]].sum()
    g["ttr_bp"] = g["n_distinct"] * 10000 // g["n_grams"]
    out = g[["source", "n_grams", "n_distinct", "ttr_bp"]]
    out = out.astype({"n_grams": np.int64, "n_distinct": np.int64,
                      "ttr_bp": np.int64})
    return out.sort_values("source").reset_index(drop=True)


def ngram_diversity_sql(n: int = 2) -> str:
    """k-parameterized oracle (the bm25_search_sql precedent) so a
    non-default ``n`` cannot silently diverge from the registered SQL."""
    return f"""
WITH toks AS (
  SELECT source,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS w
  FROM documents),
bg AS (
  SELECT source,
         unnest(list_transform(range(1, len(w) - {n - 2}),
                i -> array_to_string(list_slice(w, i, i + {n - 1}), ' ')))
           AS g
  FROM toks WHERE len(w) >= {n})
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(DISTINCT g) AS BIGINT) AS n_distinct,
       CAST(COUNT(DISTINCT g) * 10000 // COUNT(*) AS BIGINT) AS ttr_bp
FROM bg GROUP BY 1
"""


NGRAM_DIVERSITY_SQL = ngram_diversity_sql()


# Power-of-two sequence-length buckets (tokens). Fixed, small, and raised
# loudly if a document overflows the largest bucket.
_PAD_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096)


def padding_waste(sf_dir: str) -> pd.DataFrame:
    """(bucket, n_docs, sum_tokens, pad_tokens, waste_bp) — training batch
    padding plan: documents are assigned to the smallest power-of-two
    sequence-length bucket that fits their whitespace token count, and the
    report gives the padding overhead per bucket — the planning input for
    length-bucketed batching (pack_sequences' histogram sibling).

    One streamed pass, per-block bucket partials, driver fold bounded by
    len(_PAD_BUCKETS) cells. Exact integers; a document longer than the
    largest bucket raises (extend the table deliberately, don't truncate
    silently).
    """
    buckets = np.asarray(_PAD_BUCKETS, dtype=np.int64)

    def per_bucket(batch: pa.Table) -> pd.DataFrame:
        text = batch["text"]
        n_chars = pc.utf8_length(text).cast(pa.int64())
        no_space = pc.utf8_length(
            pc.replace_substring(text, pattern=" ", replacement="")
        ).cast(pa.int64())
        n_tokens = (pc.add(pc.subtract(n_chars, no_space), 1)
                    .to_numpy(zero_copy_only=False).astype(np.int64))
        idx = np.searchsorted(buckets, n_tokens, side="left")
        if idx.size and int(idx.max()) >= len(buckets):
            raise ValueError("document exceeds the largest padding bucket")
        df = pd.DataFrame({"bucket": buckets[idx], "tok": n_tokens})
        return df.groupby("bucket", as_index=False).agg(
            n_docs=("tok", "size"), sum_tokens=("tok", "sum"))

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    parts = ds.map_batches(per_bucket, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    g = parts.groupby("bucket", as_index=False).sum()
    # fold in Python ints: bucket*n_docs*1e4 is O(N) x 4096 x 1e4 and would
    # wrap int64 on extreme corpora (HUGEINT covers the oracle side)
    rows = []
    for b, nd, st in zip(g["bucket"], g["n_docs"], g["sum_tokens"]):
        b, nd, st = int(b), int(nd), int(st)
        pad = b * nd - st
        rows.append((b, nd, st, pad, pad * 10000 // (b * nd)))
    out = pd.DataFrame(rows, columns=["bucket", "n_docs", "sum_tokens",
                                      "pad_tokens", "waste_bp"])
    return (out.astype(np.int64).sort_values("bucket")
            .reset_index(drop=True))


_PAD_BUCKET_SQL = "CASE " + " ".join(
    f"WHEN n_tokens <= {b} THEN {b}" for b in _PAD_BUCKETS
) + " END"

PADDING_WASTE_SQL = f"""
WITH t AS (
  SELECT CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT)
           AS n_tokens
  FROM documents),
b AS (SELECT {_PAD_BUCKET_SQL} AS bucket, n_tokens FROM t)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(CAST(bucket AS HUGEINT) * COUNT(*) - SUM(n_tokens) AS BIGINT)
         AS pad_tokens,
       CAST((CAST(bucket AS HUGEINT) * COUNT(*) - SUM(n_tokens)) * 10000
            // (CAST(bucket AS HUGEINT) * COUNT(*)) AS BIGINT) AS waste_bp
FROM b GROUP BY bucket
"""


_KS_SRC_A = "src0"
_KS_SRC_B = "src1"


def _value_side_counts(sf_dir: str, src_a: str, src_b: str):
    """Shared pass-1 of the distribution-free drift family (ks_drift /
    emd_drift): per-block (n_chars value, side) count partials — the only
    thing that moves — folded into the sorted support with per-side count
    vectors. The driver fold is bounded by the drift column's VALUE DOMAIN
    (document character lengths; for unbounded-domain columns use
    psi_drift's fixed binning instead — stated bound, loudly checked)."""
    _DOMAIN_CAP = 1_000_000

    def per_value(df: pd.DataFrame) -> pd.DataFrame:
        m = df["source"].isin([src_a, src_b])
        df = df[m]
        side = (df["source"] == src_b).astype(np.int64)
        g = pd.DataFrame({"v": df["n_chars"].astype(np.int64), "side": side})
        out = g.groupby(["v", "side"], as_index=False).size()
        return out.rename(columns={"size": "cnt"})

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "n_chars"])
    parts = ds.map_batches(per_value, batch_format="pandas").to_pandas()
    if "v" not in parts.columns:  # NEITHER source present: every block is
        # empty and to_pandas loses the schema — empty support, both sides 0
        z = np.array([], dtype=np.int64)
        return z, z, z
    g = parts.groupby(["v", "side"], as_index=False)["cnt"].sum()
    if g["v"].nunique() > _DOMAIN_CAP:
        raise ValueError("drift column value domain exceeds the driver-fold "
                         "bound; use the binned psi_drift recipe")
    piv = g.pivot_table(index="v", columns="side", values="cnt",
                        fill_value=0, aggfunc="sum").sort_index()
    # a side absent from the data must yield a ZERO vector aligned with the
    # support, not an empty one (one-sided input hits the sentinel paths)
    zeros = pd.Series(0, index=piv.index, dtype=np.int64)
    ca = piv[0].to_numpy(np.int64) if 0 in piv.columns \
        else zeros.to_numpy(np.int64)
    cb = piv[1].to_numpy(np.int64) if 1 in piv.columns \
        else zeros.to_numpy(np.int64)
    return piv.index.to_numpy(np.int64), ca, cb


def ks_drift(sf_dir: str, src_a: str = _KS_SRC_A,
             src_b: str = _KS_SRC_B) -> pd.DataFrame:
    """(n_a, n_b, at_value, ks_bp) — exact two-sample Kolmogorov-Smirnov
    statistic between two sources' document-length (n_chars) distributions:
    the distribution-free drift gate that complements psi_drift (binned) and
    source_js (token-level) — ships with no binning choice at all.

    Plan: per-block (value, side) count partials — the only thing that
    moves; the driver folds a table bounded by the drift column's VALUE
    DOMAIN (document character lengths, thousands of distinct values at
    most — for unbounded-domain columns use psi_drift's fixed binning
    instead; stated bound, loudly checked). The sup statistic is computed
    in unbounded Python ints (cum_a*n_b - cum_b*n_a is O(N^2) and would
    wrap int64 past ~3e9 docs — HUGEINT in the oracle); ties broken to the
    smallest value attaining the sup so the report row is deterministic.

    One-sided input (a source with zero docs) emits the sentinel
    ks_bp = −1 with at_value = the smallest support value, stated
    identically in the oracle; an empty support (neither source present)
    returns the typed empty frame, matching the oracle's zero rows."""
    vals, ca, cb = _value_side_counts(sf_dir, src_a, src_b)
    if len(vals) == 0:
        return pd.DataFrame({c: pd.Series(dtype=np.int64)
                             for c in ("n_a", "n_b", "at_value", "ks_bp")})
    n_a, n_b = int(ca.sum()), int(cb.sum())
    cum_a, cum_b = np.cumsum(ca), np.cumsum(cb)
    best_num, best_v = -1, -1
    for v, a, b in zip(vals, cum_a, cum_b):
        num = abs(int(a) * n_b - int(b) * n_a)
        if num > best_num:
            best_num, best_v = num, int(v)
    ks_bp = (-1 if n_a == 0 or n_b == 0
             else 10000 * best_num // (n_a * n_b))
    return pd.DataFrame(
        [[n_a, n_b, best_v, ks_bp]],
        columns=["n_a", "n_b", "at_value", "ks_bp"]).astype(np.int64)


KS_DRIFT_SQL = f"""
WITH d AS (
  SELECT CAST(n_chars AS BIGINT) AS v,
         CASE WHEN source = '{_KS_SRC_B}' THEN 1 ELSE 0 END AS side
  FROM documents WHERE source IN ('{_KS_SRC_A}', '{_KS_SRC_B}')),
g AS (
  SELECT v,
         CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS ca,
         CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS cb
  FROM d GROUP BY 1),
c AS (
  SELECT v, SUM(ca) OVER (ORDER BY v) AS cum_a,
         SUM(cb) OVER (ORDER BY v) AS cum_b
  FROM g),
n AS (SELECT SUM(ca) AS n_a, SUM(cb) AS n_b FROM g),
k AS (
  SELECT v, ABS(cum_a * n.n_b - cum_b * n.n_a) AS dnum, n.n_a, n.n_b
  FROM c, n)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(v AS BIGINT) AS at_value,
       CAST(CASE WHEN n_a = 0 OR n_b = 0 THEN -1
                 ELSE 10000 * dnum // (n_a * n_b) END AS BIGINT) AS ks_bp
FROM k ORDER BY dnum DESC, v ASC LIMIT 1
"""


def emd_drift(sf_dir: str, src_a: str = _KS_SRC_A,
              src_b: str = _KS_SRC_B) -> pd.DataFrame:
    """(n_a, n_b, n_support, emd_e6) — exact 1-D Wasserstein-1 (earth
    mover's) distance between two sources' document-length distributions:
    W₁ = Σᵢ |F_a(xᵢ) − F_b(xᵢ)| · (xᵢ₊₁ − xᵢ) over the sorted union
    support — the drift number that, unlike KS (sup only) and PSI (binned),
    weights HOW FAR the mass moved in character units. Completes the
    drift-gate family (psi_drift / ks_drift / source_js / chi²).

    Same pass-1 as ks_drift (per-(value, side) count partials, value-domain-
    bounded driver fold); the sum runs in unbounded Python ints
    (cum·n·gap is O(N²·range), far past int64 — HUGEINT in the oracle) and
    the single division is one identical-double ROUND at e6. An empty side
    emits the sentinel emd_e6 = −1 (the embedding_mean_drift convention),
    stated identically in SQL."""
    vals, ca, cb = _value_side_counts(sf_dir, src_a, src_b)
    n_a, n_b = int(ca.sum()), int(cb.sum())
    cum_a, cum_b = np.cumsum(ca), np.cumsum(cb)
    num = 0
    for i in range(len(vals) - 1):
        num += (abs(int(cum_a[i]) * n_b - int(cum_b[i]) * n_a)
                * int(vals[i + 1] - vals[i]))
    if n_a == 0 or n_b == 0:
        emd_e6 = -1
    else:
        from .stats import _round_e6_vec

        emd_e6 = int(_round_e6_vec(
            np.array([float(num) / float(n_a * n_b)]))[0])
    return pd.DataFrame(
        [[n_a, n_b, len(vals), emd_e6]],
        columns=["n_a", "n_b", "n_support", "emd_e6"]).astype(np.int64)


EMD_DRIFT_SQL = f"""
WITH d AS (
  SELECT CAST(n_chars AS BIGINT) AS v,
         CASE WHEN source = '{_KS_SRC_B}' THEN 1 ELSE 0 END AS side
  FROM documents WHERE source IN ('{_KS_SRC_A}', '{_KS_SRC_B}')),
g AS (
  SELECT v,
         CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS ca,
         CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS cb
  FROM d GROUP BY 1),
c AS (
  SELECT v, SUM(ca) OVER (ORDER BY v) AS cum_a,
         SUM(cb) OVER (ORDER BY v) AS cum_b,
         LEAD(v) OVER (ORDER BY v) AS nxt
  FROM g),
n AS (SELECT COALESCE(SUM(ca), 0) AS n_a, COALESCE(SUM(cb), 0) AS n_b,
             CAST(COUNT(*) AS BIGINT) AS n_support
      FROM g),
s AS (SELECT COALESCE(SUM(ABS(c.cum_a * n.n_b - c.cum_b * n.n_a)
                          * (c.nxt - c.v)), 0) AS num
      FROM c, n WHERE c.nxt IS NOT NULL)
SELECT CAST(n.n_a AS BIGINT) AS n_a, CAST(n.n_b AS BIGINT) AS n_b,
       n.n_support,
       CAST(CASE WHEN n.n_a = 0 OR n.n_b = 0 THEN -1
                 ELSE ROUND(CAST(s.num AS DOUBLE)
                            / CAST(n.n_a * n.n_b AS DOUBLE) * 1000000)
            END AS BIGINT) AS emd_e6
FROM n, s
"""


# ---------------------------------------------------------------------------
# Stylometry (Burrows' Delta, integer-MAD variant)
# ---------------------------------------------------------------------------

_STYLO_TOP = 30  # most-frequent-token basis, the classic Delta feature set
_Z_SHIFT = 10 ** 13  # > max |centered e9 freq| * 1e4; sign-safe floor div


def stylometry_delta(sf_dir: str, top_t: int = _STYLO_TOP) -> pd.DataFrame:
    """(src_a, src_b, delta) — Burrows' Delta authorship/style distance
    between every source pair over the ``top_t`` globally most frequent
    tokens, in an integer-exact variant: per-source relative frequencies as
    e9 basis (cnt*1e9 // tokens), centered on the across-source integer
    mean and scaled by the integer mean-absolute-deviation (MAD replaces
    the classic z-score's std — same spirit, no float), Delta = mean |z_a -
    z_b|. The duplicate-source / style-drift audit for corpus provenance.

    Plan: ONE token exchange produces global counts; the top-T basis (a
    fixed-size table) and the (source, token) count matrix are both
    sources×T-bounded, so the driver fold and the pairwise Delta loop are
    O(S²·T) on fixed domains — no second corpus pass, no floats anywhere.
    Ties in the top-T cut break lexicographically (stated in the oracle)."""
    from .shuffle import hash_exchange_apply

    def tok_partial(batch: pa.Table) -> pa.Table:
        doc_idx, grams = _doc_ngrams(batch, 1)
        src = batch["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        t = pa.table({"source": src.take(pa.array(doc_idx)), "g": grams})
        return (t.group_by(["source", "g"]).aggregate([("g", "count")])
                .rename_columns(["source", "g", "cnt"]))

    def bucket_final(tab: pa.Table) -> pa.Table:
        return (tab.group_by(["source", "g"]).aggregate([("cnt", "sum")])
                .rename_columns(["source", "g", "cnt"]))

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "source"])
    st = hash_exchange_apply(ds, ["g"], tok_partial, bucket_final,
                             n_buckets=16).to_pandas()
    # global top-T basis: count desc, token asc (vocabulary-bounded table)
    tot = (st.groupby("g", as_index=False)["cnt"].sum()
           .sort_values(["cnt", "g"], ascending=[False, True]))
    basis = list(tot.head(top_t)["g"])
    srcs = sorted(st["source"].unique())
    toks_per_src = st.groupby("source")["cnt"].sum().to_dict()
    cnt = {(r["source"], r["g"]): int(r["cnt"])
           for _, r in st[st["g"].isin(basis)].iterrows()}
    S = len(srcs)
    # integer e9 relative frequencies, per-token mean and MAD across sources
    z = {}
    for g in basis:
        f = [cnt.get((s, g), 0) * 1_000_000_000 // int(toks_per_src[s])
             for s in srcs]
        mean = sum(f) // S
        mad = sum(abs(v - mean) for v in f) // S
        for s, v in zip(srcs, f):
            z[(s, g)] = ((v - mean) * 10_000 + _Z_SHIFT) // max(mad, 1)
    rows = []
    for i in range(S):
        for j in range(i + 1, S):
            d = sum(abs(z[(srcs[i], g)] - z[(srcs[j], g)])
                    for g in basis) // len(basis)
            rows.append((srcs[i], srcs[j], d))
    out = pd.DataFrame(rows, columns=["src_a", "src_b", "delta"])
    out["delta"] = out["delta"].astype(np.int64)
    return out


def stylometry_delta_sql(top_t: int = _STYLO_TOP) -> str:
    return f"""
WITH toks AS (
  SELECT source,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            t -> t <> '')) AS g
  FROM documents),
st AS (SELECT source, g, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM toks GROUP BY 1, 2),
basis AS (SELECT g FROM (SELECT g, SUM(cnt) AS n FROM st GROUP BY 1)
          ORDER BY n DESC, g LIMIT {top_t}),
tps AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS toks FROM st GROUP BY 1),
f AS (SELECT s.source, b.g,
        CAST(COALESCE(st.cnt, 0) AS HUGEINT) * 1000000000 // s.toks AS fbp
      FROM tps s CROSS JOIN basis b
      LEFT JOIN st ON st.source = s.source AND st.g = b.g),
m AS (SELECT g, CAST(SUM(fbp) AS BIGINT) // COUNT(*) AS mean FROM f
      GROUP BY 1),
md AS (SELECT f.g, CAST(SUM(ABS(fbp - m.mean)) AS BIGINT) // COUNT(*) AS mad
       FROM f JOIN m USING (g) GROUP BY f.g),
z AS (SELECT f.source, f.g,
        ((fbp - m.mean) * 10000 + 10000000000000) // GREATEST(md.mad, 1) AS z
      FROM f JOIN m USING (g) JOIN md ON md.g = f.g)
SELECT a.source AS src_a, b.source AS src_b,
       CAST(SUM(ABS(a.z - b.z)) // COUNT(*) AS BIGINT) AS delta
FROM z a JOIN z b ON a.g = b.g AND a.source < b.source
GROUP BY 1, 2
"""


STYLOMETRY_DELTA_SQL = stylometry_delta_sql()


# ---------------------------------------------------------------------------
# Group-DRO source weights
# ---------------------------------------------------------------------------

_DRO_ETA_E3 = 100  # eta = 0.1 per 1000 logit-units of mean loss


def group_dro_weights(sf_dir: str) -> pd.DataFrame:
    """(source, n_docs, sum_loss, mean_loss_e6, dro_w_e9) — Group-DRO
    style source weights (Sagawa et al. 2020): per-source mean hinge loss
    of the linear quality classifier (loss = max(0, -logit) — how badly the
    gate rejects a source), exponentiated into an unnormalized
    distributionally-robust up-weight ``exp(eta * mean_loss)``. High-loss
    sources get up-weighted for the next curation round — the worst-group
    focus that plain mixture weights miss.

    One fused feature pass, per-block (source, n, sum_loss) integer
    partials, source-bounded fold. Floats appear ONLY in the final per-row
    exp (one identical-double expression per source from exact integers —
    no cross-row float accumulation, hence the unnormalized weight:
    normalizing would sum floats in engine-dependent order)."""
    import math

    from .stats import _round_e9

    def per_src(batch: pa.Table) -> pd.DataFrame:
        f = _doc_features(batch)
        loss = np.maximum(-_logreg_logit(f), 0)
        df = pd.DataFrame({"source": batch["source"].to_pandas(),
                           "loss": loss})
        return df.groupby("source", as_index=False).agg(
            n_docs=("loss", "size"), sum_loss=("loss", "sum"))

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "source"])
    parts = ds.map_batches(per_src, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    g = parts.groupby("source", as_index=False).sum()
    mean_e6 = [int(s) * 1_000_000 // int(n)
               for s, n in zip(g["sum_loss"], g["n_docs"])]
    w = [_round_e9(math.exp(_DRO_ETA_E3 * m / 1_000_000_000_000.0))
         for m in mean_e6]
    out = pd.DataFrame({
        "source": g["source"], "n_docs": g["n_docs"].astype(np.int64),
        "sum_loss": g["sum_loss"].astype(np.int64),
        "mean_loss_e6": np.asarray(mean_e6, dtype=np.int64),
        "dro_w_e9": np.asarray(w, dtype=np.int64)})
    return out.sort_values("source").reset_index(drop=True)


GROUP_DRO_WEIGHTS_SQL = f"""
WITH f AS ({_FEAT_SQL}),
l AS (SELECT source, GREATEST(-({_LOGIT_SQL}), 0) AS loss FROM f),
g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(loss) AS BIGINT) AS sum_loss
      FROM l GROUP BY 1)
SELECT source, n_docs, sum_loss,
       CAST(sum_loss * 1000000 // n_docs AS BIGINT) AS mean_loss_e6,
       CAST(ROUND(EXP({_DRO_ETA_E3} * (sum_loss * 1000000 // n_docs)
                      / 1000000000000.0) * 1000000000) AS BIGINT) AS dro_w_e9
FROM g
"""



# ---------------------------------------------------------------------------
# Split-conformal calibration of the quality gate
# ---------------------------------------------------------------------------

_CONF_ALPHA_BP = 1000   # alpha = 0.10 -> 90% target coverage
_CONF_CAL_MOD = 10      # calibration slice: doc_id % 10 == 0


def conformal_threshold(sf_dir: str, alpha_bp: int = _CONF_ALPHA_BP,
                        cal_mod: int = _CONF_CAL_MOD) -> pd.DataFrame:
    """(n_cal, q_rank, threshold, n_eval, n_covered, coverage_bp) — split
    conformal calibration of the linear quality gate: nonconformity score =
    −logit on a deterministic calibration slice (doc_id % cal_mod == 0);
    the threshold is the ``ceil((n+1)(1−alpha))``-th smallest calibration
    score (the finite-sample-corrected quantile), then coverage
    (score ≤ threshold) is measured on the held-out rest. The
    distribution-free guarantee says eval coverage ≥ 1−alpha in
    expectation — this op is the audit that checks it on real data.

    Exactness: the order statistic is found by counting, never sorting —
    per-block (score, slice) value counts, driver fold bounded by the SCORE
    VALUE DOMAIN (the integer logit range; loudly capped like ks_drift),
    cumulative walk to the rank. Integer everything."""
    _DOMAIN_CAP = 1_000_000

    def per_value(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        score = -_logreg_logit(_doc_features(batch))
        cal = (ids % cal_mod == 0).astype(np.int64)
        df = pd.DataFrame({"v": score, "cal": cal})
        return (df.groupby(["v", "cal"], as_index=False).size()
                .rename(columns={"size": "cnt"}))

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    parts = ds.map_batches(per_value, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    g = parts.groupby(["v", "cal"], as_index=False)["cnt"].sum()
    if g["v"].nunique() > _DOMAIN_CAP:
        raise ValueError("score value domain exceeds the driver-fold bound")
    piv = g.pivot_table(index="v", columns="cal", values="cnt",
                        fill_value=0, aggfunc="sum").sort_index()
    ev = piv[0].to_numpy(np.int64) if 0 in piv else np.zeros(len(piv), np.int64)
    ca = piv[1].to_numpy(np.int64) if 1 in piv else np.zeros(len(piv), np.int64)
    vals = piv.index.to_numpy(np.int64)
    n_cal, n_eval = int(ca.sum()), int(ev.sum())
    # ceil((n+1)(1-alpha)) with integer arithmetic; clamp to n_cal
    q_rank = min(((n_cal + 1) * (10000 - alpha_bp) + 9999) // 10000, n_cal)
    cum = np.cumsum(ca)
    ti = int(np.searchsorted(cum, q_rank))
    threshold = int(vals[ti])
    n_cov = int(ev[vals <= threshold].sum())
    coverage_bp = 10000 * n_cov // n_eval if n_eval else -1
    return pd.DataFrame(
        [[n_cal, q_rank, threshold, n_eval, n_cov, coverage_bp]],
        columns=["n_cal", "q_rank", "threshold", "n_eval", "n_covered",
                 "coverage_bp"]).astype(np.int64)


def conformal_threshold_sql(alpha_bp: int = _CONF_ALPHA_BP,
                            cal_mod: int = _CONF_CAL_MOD) -> str:
    return f"""
WITH f AS ({_FEAT_SQL}),
s AS (SELECT doc_id, -({_LOGIT_SQL}) AS v FROM f),
cal AS (SELECT v FROM s WHERE doc_id % {cal_mod} = 0),
ev AS (SELECT v FROM s WHERE doc_id % {cal_mod} <> 0),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM cal),
q AS (SELECT n_cal,
             LEAST(((n_cal + 1) * {10000 - alpha_bp} + 9999) // 10000,
                   n_cal) AS q_rank
      FROM n),
rk AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn FROM cal),
thr AS (SELECT q.n_cal, q.q_rank, rk.v AS threshold
        FROM q JOIN rk ON rk.rn = q.q_rank)
SELECT n_cal, CAST(q_rank AS BIGINT) AS q_rank,
       CAST(threshold AS BIGINT) AS threshold,
       CAST((SELECT COUNT(*) FROM ev) AS BIGINT) AS n_eval,
       CAST((SELECT COUNT(*) FROM ev WHERE v <= thr.threshold) AS BIGINT)
         AS n_covered,
       CAST(CASE WHEN (SELECT COUNT(*) FROM ev) > 0
                 THEN 10000 * (SELECT COUNT(*) FROM ev
                               WHERE v <= thr.threshold)
                      // (SELECT COUNT(*) FROM ev)
                 ELSE -1 END AS BIGINT) AS coverage_bp
FROM thr
"""


CONFORMAL_THRESHOLD_SQL = conformal_threshold_sql()


# ---------------------------------------------------------------------------
# Per-source length percentiles (corpus profiling)
# ---------------------------------------------------------------------------

_LEN_PCTS_BP = (5000, 9000, 9900)   # P50 / P90 / P99


def length_percentiles(sf_dir: str) -> pd.DataFrame:
    """(source, n_docs, p50, p90, p99) — exact per-source document-length
    (n_chars) percentiles, the corpus-profiling summary a curation dashboard
    keys on (sudden P99 inflation == boilerplate/concatenation bugs).

    percentile_disc semantics: the smallest value whose cumulative count
    reaches ceil(p·n) — found by COUNTING, never sorting: one pass of
    per-block (source, n_chars) count partials, driver fold bounded by
    sources × the length value domain (loudly capped, ks_drift recipe)."""
    _DOMAIN_CAP = 1_000_000

    def per_value(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "n_chars"], as_index=False).size()
        return g.rename(columns={"size": "cnt"})

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "n_chars"])
    parts = ds.map_batches(per_value, batch_format="pandas").to_pandas()
    g = parts.groupby(["source", "n_chars"], as_index=False)["cnt"].sum()
    if len(g) > _DOMAIN_CAP:
        raise ValueError("source x length domain exceeds the driver-fold "
                         "bound; bucket lengths first")
    rows = []
    for src, sub in g.groupby("source"):
        sub = sub.sort_values("n_chars")
        vals = sub["n_chars"].to_numpy(np.int64)
        cnt = sub["cnt"].to_numpy(np.int64)
        n = int(cnt.sum())
        cum = np.cumsum(cnt)
        pct = []
        for p_bp in _LEN_PCTS_BP:
            rank = (n * p_bp + 9999) // 10000  # ceil(p*n), integer
            pct.append(int(vals[int(np.searchsorted(cum, rank))]))
        rows.append((src, n, *pct))
    out = pd.DataFrame(rows, columns=["source", "n_docs", "p50", "p90",
                                      "p99"])
    for c in out.columns[1:]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("source").reset_index(drop=True)


LENGTH_PERCENTILES_SQL = """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS BIGINT)
         AS p50,
       CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars) AS BIGINT)
         AS p90,
       CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY n_chars) AS BIGINT)
         AS p99
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Ingest-batch dup-rate monitor
# ---------------------------------------------------------------------------

_DUP_BATCH = 100  # docs per ingest batch (doc_id order = ingest order)


def dup_rate_by_batch(sf_dir: str, batch: int = _DUP_BATCH) -> pd.DataFrame:
    """(batch, n_docs, n_dup, dup_bp) — exact-duplicate rate per ingest
    batch (doc_id // batch): a document is a dup iff ANY earlier doc_id has
    identical text. The per-ingest-wave dedup monitor — a rising curve says
    the crawl is re-visiting content and the incremental-dedup gate should
    tighten.

    ONE key-only fp exchange decides dup-ness IN the reducer (each bucket
    holds every (fp, doc_id) row of its hashes, so ``dup = doc_id >
    min(doc_id of fp)`` is local — the first-occurrence table is
    corpus-sized and must never be broadcast); reducers emit
    batch-domain-bounded (batch, n, n_dup) partials for a tiny driver
    fold. Text never moves."""
    import hashlib

    from .shuffle import hash_exchange_apply

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def fp_rows(batch_t: pd.DataFrame) -> pd.DataFrame:
        fps = [hashlib.md5(t.encode("utf-8")).hexdigest()
               for t in batch_t["text"]]
        return pd.DataFrame({"fp": fps,
                             "doc_id": batch_t["doc_id"].astype(np.int64)})

    def bucket_rates(df: pd.DataFrame) -> pd.DataFrame:
        first = df.groupby("fp")["doc_id"].transform("min")
        out = pd.DataFrame({"batch": df["doc_id"].astype(np.int64) // batch,
                            "dup": (df["doc_id"] > first).astype(np.int64)})
        g = out.groupby("batch", as_index=False).agg(
            n_docs=("dup", "size"), n_dup=("dup", "sum"))
        return g

    parts = hash_exchange_apply(ds, ["fp"], fp_rows, bucket_rates,
                                fmt="pandas").to_pandas()
    g = parts.groupby("batch", as_index=False).sum()
    g["dup_bp"] = g["n_dup"] * 10000 // g["n_docs"]
    return (g[["batch", "n_docs", "n_dup", "dup_bp"]].astype(np.int64)
            .sort_values("batch").reset_index(drop=True))


def dup_rate_by_batch_sql(batch: int = _DUP_BATCH) -> str:
    return f"""
WITH fp AS (SELECT doc_id, md5(text) AS fp FROM documents),
first AS (SELECT fp, MIN(doc_id) AS first_doc FROM fp GROUP BY 1),
d AS (SELECT fp.doc_id // {batch} AS batch,
             CASE WHEN f.first_doc < fp.doc_id THEN 1 ELSE 0 END AS dup
      FROM fp JOIN first f USING (fp))
SELECT CAST(batch AS BIGINT) AS batch, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(dup) AS BIGINT) AS n_dup,
       CAST(SUM(dup) * 10000 // COUNT(*) AS BIGINT) AS dup_bp
FROM d GROUP BY 1
"""


DUP_RATE_BY_BATCH_SQL = dup_rate_by_batch_sql()


def quality_percentile(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, logit, pct_bp) — exact percentile normalization of the
    quality classifier's score: pct = 10000·|{docs with smaller logit}|/n.
    Sampling weights and mixture curricula want a scale-free [0,1] score,
    not raw logits — and the rank transform is the distribution-free way
    to get one.

    Percentiles by COUNTING (never a global sort): one pass folds the
    logit value-count table (value-domain-bounded, loudly capped — the
    conformal_threshold recipe), the cumulative map is broadcast once, and
    a second streamed pass attaches each doc's percentile with one
    searchsorted. Exact integers end-to-end."""
    _DOMAIN_CAP = 1_000_000

    def per_value(batch: pa.Table) -> pd.DataFrame:
        logit = _logreg_logit(_doc_features(batch))
        return (pd.DataFrame({"v": logit}).groupby("v", as_index=False)
                .size().rename(columns={"size": "cnt"}))

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    parts = ds.map_batches(per_value, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    g = (parts.groupby("v", as_index=False)["cnt"].sum()
         .sort_values("v").reset_index(drop=True))
    if len(g) > _DOMAIN_CAP:
        raise ValueError("logit value domain exceeds the driver-fold bound")
    vals = g["v"].to_numpy(np.int64)
    below = np.concatenate(([0], np.cumsum(g["cnt"].to_numpy(np.int64))[:-1]))
    n = int(g["cnt"].sum())
    ref = ray.put((vals, below, n))

    def attach(batch: pa.Table) -> pa.Table:
        v, b, total = ray.get(ref)
        logit = _logreg_logit(_doc_features(batch))
        idx = np.searchsorted(v, logit)
        pct = b[idx] * 10000 // total
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "logit": pa.array(logit),
            "pct_bp": pa.array(pct)})

    return ds.map_batches(attach, batch_format="pyarrow",
                          zero_copy_batch=True)


QUALITY_PERCENTILE_SQL = f"""
WITH f AS ({_FEAT_SQL}),
s AS (SELECT doc_id, ({_LOGIT_SQL}) AS logit FROM f),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM s)
SELECT a.doc_id, CAST(a.logit AS BIGINT) AS logit,
       CAST((SELECT COUNT(*) FROM s b WHERE b.logit < a.logit) * 10000
            // (SELECT t FROM n) AS BIGINT) AS pct_bp
FROM s a
"""
