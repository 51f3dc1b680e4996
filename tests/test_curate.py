"""End-to-end test of the composed curation pipeline (pipelines/curate.py):
funnel count conservation, packed-output invariants, and agreement between
the written corpus and the independently-computed funnel report."""

import glob
import os

import duckdb
import pandas as pd
import pytest

from research_knowledge_graph_ray.pipelines.curate import (
    CURATION_FUNNEL_SQL, curate_corpus, curation_funnel)


@pytest.fixture(scope="module")
def report(sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("curated"))
    rep = curate_corpus(sf_dir, out, budget=512, n_parts=4)
    return rep, out


def test_funnel_conservation(report):
    rep, _ = report
    assert rep["n_raw"] == (rep["n_quality_drop"] + rep["n_lang_drop"]
                            + rep["n_exact_drop"] + rep["n_neardup_drop"]
                            + rep["n_kept"])
    assert rep["n_kept"] > 0 and rep["n_sequences"] > 0


def test_funnel_matches_sql_prefix(report, sf_dir):
    """The quality/lang/exact gate counts in the composed run must equal the
    oracle-checked curation_funnel query on the same input."""
    rep, _ = report
    fun = curation_funnel(sf_dir)
    assert rep["n_raw"] == int(fun.loc[0, "n_in"])
    assert rep["n_quality_drop"] == int(fun.loc[0, "n_drop"])
    assert rep["n_lang_drop"] == int(fun.loc[1, "n_drop"])
    assert rep["n_exact_drop"] == int(fun.loc[2, "n_drop"])


def test_output_invariants(report):
    rep, out = report
    files = sorted(glob.glob(os.path.join(out, "curated-*.parquet")))
    assert [os.path.basename(f) for f in files] == rep["files"]
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    assert len(df) == rep["n_kept"]
    assert df["doc_id"].is_unique
    assert set(df["pred_lang"]) == {"en"}
    # every packed sequence respects the token budget unless it is a single
    # oversized doc (greedy packer semantics)
    per_seq = df.groupby("seq_id").agg(tok=("n_tokens", "sum"),
                                       n=("doc_id", "count"))
    bad = per_seq[(per_seq["tok"] > 512) & (per_seq["n"] > 1)]
    assert bad.empty, bad
    assert rep["n_sequences"] == df["seq_id"].nunique()
    # partition purity: each file holds exactly its bucket's doc_ids
    for f in files:
        b = int(os.path.basename(f)[len("curated-"):-len(".parquet")])
        part = pd.read_parquet(f, columns=["doc_id"])
        assert (part["doc_id"] % 4 == b).all()


def test_no_exact_duplicate_texts_survive(report, sf_dir):
    _, out = report
    df = pd.concat([pd.read_parquet(f) for f in
                    glob.glob(os.path.join(out, "curated-*.parquet"))],
                   ignore_index=True)
    assert not df["text"].duplicated().any()


def test_curate_order_seed(sf_dir, tmp_path):
    """--order-seed writes a training-order plan: an exact permutation of the
    kept doc_ids."""
    import glob

    from research_knowledge_graph_ray.pipelines.curate import curate_corpus

    out = str(tmp_path / "c")
    rep = curate_corpus(sf_dir, out, n_parts=4, order_seed=3)
    assert rep["order_file"] == "order-3.parquet"
    o = pd.read_parquet(os.path.join(out, "order-3.parquet"))
    kept = pd.concat([pd.read_parquet(f, columns=["doc_id"]) for f in
                      glob.glob(os.path.join(out, "curated-*.parquet"))])
    assert sorted(o["pos"]) == list(range(rep["n_kept"]))
    assert set(o["doc_id"]) == set(kept["doc_id"])
