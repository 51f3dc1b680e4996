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
