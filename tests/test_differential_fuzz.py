"""Differential fuzzing: documents-table operators replayed against their
DuckDB oracles on RANDOMIZED corpora (seeded), not just the fixed testdata —
edge content (single-token docs, heavy repetition, digits/punctuation, skewed
sources) that the driver's fixed-corpus gate never exercises."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from research_knowledge_graph_ray.pipelines.registry import QUERIES

# documents-only operators with exact SQL oracles (each must reference no
# table but `documents`)
FUZZ_QUERIES = [
    "text_stats", "text_quality", "token_fertility", "classifier_kappa",
    "fleiss_kappa", "calibration_bins", "quality_ensemble", "ks_drift",
    "emd_drift", "gopher_filter", "char_diversity", "retrieval_eval",
    "dedup_exact", "lang_id", "length_percentiles", "ngram_diversity",
    "doc_fingerprint", "repetition_filter", "repetition_stats",
    "dedup_minhash_pairs", "dedup_simhash_pairs", "dedup_keep_best",
    "quality_logreg", "quality_percentile", "oov_rate", "source_quality",
    "top_tokens", "zipf_fit", "token_spectrum", "vocab_sharing",
    "bm25_search", "term_search", "source_js", "nb_classify",
    "nb_confusion", "padding_waste", "stylometry_delta",
]

_WORDS = ["the", "hash", "join", "sort", "merge", "window", "stream",
          "filter", "scan", "a", "of", "fast", "slow", "x9", "q_q", "..",
          "alpha", "beta", "data", "spark"]


def _random_corpus(seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 60))
    texts, sources = [], []
    for i in range(n):
        kind = rng.integers(0, 4)
        if kind == 0:  # single token
            t = str(rng.choice(_WORDS))
        elif kind == 1:  # heavy repetition
            t = " ".join([str(rng.choice(_WORDS))] * int(rng.integers(2, 40)))
        elif kind == 2:  # digits + punctuation mix
            t = " ".join(str(rng.choice(_WORDS + ["123", "4.5", "a1b2"]))
                         for _ in range(int(rng.integers(2, 30))))
        else:  # plain random sentence
            t = " ".join(str(rng.choice(_WORDS))
                         for _ in range(int(rng.integers(2, 80))))
        texts.append(t)
        sources.append(f"src{int(rng.integers(0, 3))}")  # skewed few sources
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("seed", [11, 23, 37])
def test_documents_ops_match_oracle_on_random_corpus(seed, tmp_path):
    import ray.data

    tbl = _random_corpus(seed)
    pq.write_table(tbl, tmp_path / "documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')")

    for name in FUZZ_QUERIES:
        fn, sql = QUERIES[name]
        assert sql is not None, name
        got = fn(str(tmp_path))
        if isinstance(got, ray.data.Dataset):
            got = got.to_pandas()
        elif not isinstance(got, pd.DataFrame):
            got = got.to_pandas()
        got = _canon(got)
        want = _canon(con.execute(sql).fetchdf())
        assert list(got.columns) == list(want.columns), (name, seed)
        assert len(got) == len(want), (name, seed, len(got), len(want))
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      check_exact=True)


# ---------------------------------------------------------------------------
# events-table operators (windowing / sessionization / attribution family)
# ---------------------------------------------------------------------------

EVENT_FUZZ_QUERIES = [
    "hourly_anomalies", "events_sessions", "events_by_type", "events_hourly",
    "events_daily_pivot", "value_outliers", "user_top_event", "props_k_stats",
    "event_type_drift", "value_outliers_mad", "latest_event_per_user",
    "events_hourly_dense", "events_sliding", "purchase_attribution",
    "user_retention", "signup_purchase_funnel", "rolling_active_users",
    "event_transitions", "events_debounced", "linear_attribution",
    "user_activity_segments", "daily_type_corr", "late_events",
    "events_hopping", "events_next_purchase", "user_journeys",
    "events_unpivot", "watermark_drops", "event_type_islands",
    "events_seasonality", "events_dup_audit",
]

_EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


def _random_events(seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    n = int(rng.integers(30, 300))
    # timestamps: bursty, duplicated, and OUT OF ORDER in the file — a few
    # days span so daily/hourly/session windows all have multiple buckets
    base = np.int64(1_704_067_200_000_000)  # 2024-01-01 in epoch micros
    ts = base + rng.integers(0, 4 * 86_400_000_000, n)
    dup = rng.integers(0, n, max(1, n // 10))
    ts[dup] = ts[(dup + 1) % n]  # planted exact-duplicate timestamps
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, max(2, n // 8), n)),
        "event_type": pa.array([str(rng.choice(_EVENT_TYPES))
                                for _ in range(n)], pa.string()),
        "value": pa.array(np.round(rng.uniform(0, 500, n), 2)),
        "props": pa.array([f'{{"k": {int(rng.integers(0, 100))}}}'
                           for _ in range(n)], pa.string()),
    })


@pytest.mark.parametrize("seed", [5, 19])
def test_events_ops_match_oracle_on_random_events(seed, tmp_path):
    import ray.data

    pq.write_table(_random_events(seed), tmp_path / "events.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')")

    for name in EVENT_FUZZ_QUERIES:
        fn, sql = QUERIES[name]
        got = fn(str(tmp_path))
        if not isinstance(got, pd.DataFrame):
            got = got.to_pandas()
        got = _canon(got)
        want = _canon(con.execute(sql).fetchdf())
        assert list(got.columns) == list(want.columns), (name, seed)
        assert len(got) == len(want), (name, seed, len(got), len(want))
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      check_exact=True)
