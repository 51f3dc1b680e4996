"""Algorithmic invariants for the round-5 additions (retrieval_eval,
fleiss_kappa, token_fertility, graph_modularity, _exact_medians_multi).
Value parity vs DuckDB is pinned registry-wide in test_queries_vs_duckdb;
these pin the math on structural invariants, planted inputs, and sequential
brute-force replays."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from research_knowledge_graph_ray.stages import evalops, graphalgs, textops
from research_knowledge_graph_ray.stages.stats import _exact_medians_multi


def _n_docs(sf_dir):
    return pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows


# ---------------------------------------------------------------------------
# fleiss_kappa
# ---------------------------------------------------------------------------


def test_fleiss_kappa_cells_partition_and_formula(sf_dir):
    got = evalops.fleiss_kappa(sf_dir).iloc[0]
    n = int(got["n"])
    c = [int(got[f"c{v}"]) for v in range(4)]
    assert sum(c) == n == _n_docs(sf_dir)
    # recompute with the textbook float formula and compare at bp precision
    s = 6 * c[0] + 2 * c[1] + 2 * c[2] + 6 * c[3]
    vv = c[1] + 2 * c[2] + 3 * c[3]
    p_bar = s / (6 * n)
    p1 = vv / (3 * n)
    p_e = p1 * p1 + (1 - p1) * (1 - p1)
    if p_e < 1:
        expect = (p_bar - p_e) / (1 - p_e)
        assert abs(int(got["kappa_bp"]) - expect * 10000) <= 1
    assert -10000 <= int(got["kappa_bp"]) <= 10000


def test_fleiss_kappa_degenerate_unanimous(tmp_path):
    # identical docs -> all raters vote identically on every doc -> V = 0 or
    # 3N -> chance agreement is 1 -> sentinel kappa_bp = 10000
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": ["x y z", "x y z", "x y z"],
    }), tmp_path / "documents.parquet")
    got = evalops.fleiss_kappa(str(tmp_path)).iloc[0]
    assert int(got["kappa_bp"]) == 10000


# ---------------------------------------------------------------------------
# _exact_medians_multi
# ---------------------------------------------------------------------------


def _disc_median(v: np.ndarray) -> int:
    s = np.sort(v)
    return int(s[math.ceil(0.5 * len(s)) - 1])


def test_exact_medians_multi_mixed_scales():
    # three columns whose ranges differ by ~9 orders of magnitude — the
    # per-column histogram ranges are what keeps this exact (a shared range
    # would collapse the small columns into one bucket)
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "a": rng.integers(1_500_000_000_000_000, 1_800_000_000_000_000, 5000),
        "b": rng.integers(1, 40, 5000),
        "m": rng.integers(10_000, 60_000_000, 5000),
    })
    got = _exact_medians_multi(ray.data.from_pandas(df), ("a", "b", "m"))
    want = [_disc_median(df[c].to_numpy(np.int64)) for c in ("a", "b", "m")]
    assert got == want


def test_exact_medians_multi_spiked():
    # heavily tied / constant columns exercise the within-bucket rank path
    df = pd.DataFrame({
        "a": np.array([5] * 999 + [6], dtype=np.int64),
        "b": np.arange(1000, dtype=np.int64),
    })
    got = _exact_medians_multi(ray.data.from_pandas(df), ("a", "b"))
    assert got == [5, _disc_median(df["b"].to_numpy())]


# ---------------------------------------------------------------------------
# retrieval_eval
# ---------------------------------------------------------------------------


def test_retrieval_eval_invariants(sf_dir):
    from research_knowledge_graph_ray.pipelines.kgflat import (
        _REVAL_K,
        retrieval_eval,
    )

    got = retrieval_eval(sf_dir)
    assert list(got["query_id"]) == list(range(len(got)))
    for _, r in got.iterrows():
        assert 0 <= r["rel_at_k"] <= min(_REVAL_K, max(int(r["n_rel"]), 0))
        if r["first_rel_rank"] > 0:
            assert r["rr_e9"] == 1_000_000_000 // int(r["first_rel_rank"])
        else:
            assert r["rr_e9"] == 0
        if r["n_rel"] == 0:
            assert r["recall_bp"] == -1
        else:
            assert r["recall_bp"] == r["rel_at_k"] * 10000 // r["n_rel"]


def test_retrieval_eval_planted_perfect_hit(tmp_path):
    from research_knowledge_graph_ray.pipelines.kgflat import retrieval_eval

    # doc 0 contains both terms; doc 1 spams one term (tf-saturated, half
    # the idf mass); doc 2 matches nothing — the relevant doc must rank 1st
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": ["alpha beta gamma",
                 "alpha alpha alpha alpha alpha alpha alpha alpha",
                 "delta epsilon zeta"],
    }), tmp_path / "documents.parquet")
    got = retrieval_eval(str(tmp_path), queries=(("alpha", "beta"),))
    r = got.iloc[0]
    assert int(r["n_rel"]) == 1
    assert int(r["first_rel_rank"]) == 1
    assert int(r["rr_e9"]) == 1_000_000_000
    assert int(r["rel_at_k"]) == 1 and int(r["recall_bp"]) == 10000


# ---------------------------------------------------------------------------
# token_fertility
# ---------------------------------------------------------------------------


def test_token_fertility_totals(sf_dir):
    got = textops.token_fertility(sf_dir)
    assert int(got["n_docs"].sum()) == _n_docs(sf_dir)
    assert (got["tokens_per_kchar"]
            == got["n_tokens"] * 1000 // np.maximum(got["n_chars"], 1)).all()
    assert got["source"].is_monotonic_increasing


# ---------------------------------------------------------------------------
# graph_modularity
# ---------------------------------------------------------------------------


def test_graph_modularity_vs_sequential_replay(sf_dir):
    got = graphalgs.graph_modularity(sf_dir)

    # sequential replay: same labels, same symmetrized edge set, pandas joins
    lab = graphalgs.label_propagation(sf_dir).to_pandas()
    edges = graphalgs._symmetrized_edges(
        graphalgs._supplier_part_edges(sf_dir)).to_pandas()
    cmap = dict(zip(lab["node"], lab["community"]))
    c_src = edges["src"].map(cmap)
    c_dst = edges["dst"].map(cmap)
    m2 = len(edges)

    deg = edges.groupby("src").size()
    want = (pd.DataFrame({"node": lab["node"], "community": lab["community"]})
            .assign(d=lambda df: df["node"].map(deg).fillna(0).astype(np.int64))
            .groupby("community")
            .agg(n_nodes=("node", "size"), d_sum=("d", "sum")))
    intra = pd.Series(c_src[c_src.to_numpy() == c_dst.to_numpy()]
                      ).value_counts()
    want["intra2"] = want.index.map(intra).fillna(0).astype(np.int64)

    merged = got.set_index("community").join(want, rsuffix="_w")
    assert (merged["n_nodes"] == merged["n_nodes_w"]).all()
    assert (merged["d_sum"] == merged["d_sum_w"]).all()
    assert (merged["intra2"] == merged["intra2_w"]).all()
    assert int(got["d_sum"].sum()) == m2
    assert int(got["intra2"].sum()) <= m2
    # Q = sum of terms is a valid modularity: bounded by (-0.5, 1)
    q = got["term_e9"].sum() / 1e9
    assert -0.5 <= q <= 1.0


# ---------------------------------------------------------------------------
# emd_drift
# ---------------------------------------------------------------------------


def test_emd_drift_planted_shift(tmp_path):
    """Two point masses distance d apart have W1 exactly d; a half-shifted
    distribution has W1 = d/2."""
    from research_knowledge_graph_ray.stages.evalops import emd_drift

    def write(rows):
        pq.write_table(pa.table({
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "source": pa.array([s for s, _ in rows], pa.string()),
            "text": pa.array(["x" * n for _, n in rows], pa.string()),
            "n_chars": pa.array([n for _, n in rows], pa.int64()),
        }), tmp_path / "documents.parquet")

    write([("src0", 100)] * 4 + [("src1", 140)] * 4)
    r = emd_drift(str(tmp_path)).iloc[0]
    assert int(r["emd_e6"]) == 40 * 1_000_000
    assert int(r["n_support"]) == 2

    write([("src0", 100)] * 4 + [("src1", 100)] * 2 + [("src1", 140)] * 2)
    r = emd_drift(str(tmp_path)).iloc[0]
    assert int(r["emd_e6"]) == 20 * 1_000_000


def test_emd_drift_missing_side_sentinel(sf_dir):
    from research_knowledge_graph_ray.stages.evalops import emd_drift

    r = emd_drift(sf_dir, src_b="no_such_source").iloc[0]
    assert int(r["n_b"]) == 0
    assert int(r["emd_e6"]) == -1


# ---------------------------------------------------------------------------
# jsonl / csv corpus loaders
# ---------------------------------------------------------------------------


def test_jsonl_corpus_loader(tmp_path):
    import gzip
    import json

    from research_knowledge_graph_ray.sources.files import read_jsonl_corpus

    recs = [
        {"id": "dolma-0", "text": "NeRF is evaluated on DTU.",
         "source": "cc", "metadata": {"lang": "en"}},
        {"doc_id": "fallback-1", "text": "Plenoxels uses DTU."},
        {"text": "no id at all"},
    ]
    jp = tmp_path / "corpus.jsonl"
    jp.write_text("\n".join(json.dumps(r) for r in recs))
    rows = read_jsonl_corpus(str(jp)).to_pandas().sort_values("doc_id")
    assert len(rows) == 3
    assert {"dolma-0", "fallback-1"} < set(rows["doc_id"])
    assert rows["doc_id"].str.startswith(("dolma", "fallback", "jsonl-")).all()
    assert rows.set_index("doc_id").loc["dolma-0", "spans"][0]["text"] \
        .startswith("NeRF")

    # gz transparency (the on-disk format of every public LLM corpus)
    gz = tmp_path / "corpus2.jsonl.gz"
    with gzip.open(gz, "wt") as f:
        f.write("\n".join(json.dumps(r) for r in recs))
    assert read_jsonl_corpus(str(gz)).count() == 3


def test_csv_corpus_loader(tmp_path):
    from research_knowledge_graph_ray.sources.files import read_csv_corpus

    cp = tmp_path / "corpus.csv"
    cp.write_text("doc_id,text\nd1,Scaffold GS improves on NeRF.\n"
                  "d2,Zip NeRF is fast.\n")
    rows = read_csv_corpus(str(cp)).to_pandas().sort_values("doc_id")
    assert list(rows["doc_id"]) == ["d1", "d2"]
    assert rows.iloc[0]["spans"][0]["text"].startswith("Scaffold GS")


def test_jsonl_corpus_feeds_build_graph(tmp_path):
    import json

    from research_knowledge_graph_ray.pipelines.construct import build_graph
    from research_knowledge_graph_ray.sources.files import read_jsonl_corpus

    recs = [{"id": f"d{i}", "text": "NeRF is evaluated on DTU. "
             "Gaussian Splatting improves on NeRF."} for i in range(4)]
    jp = tmp_path / "c.jsonl"
    jp.write_text("\n".join(json.dumps(r) for r in recs))
    res = build_graph(read_jsonl_corpus(str(jp)))
    assert res.edges.count() > 0


def test_ks_drift_one_sided_and_empty_sentinels(tmp_path):
    from research_knowledge_graph_ray.stages.evalops import ks_drift

    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "source": pa.array(["src0", "src0"], pa.string()),
        "text": pa.array(["aa", "bbbb"], pa.string()),
        "n_chars": pa.array([2, 4], pa.int64()),
    }), tmp_path / "documents.parquet")
    r = ks_drift(str(tmp_path)).iloc[0]  # src1 absent → one-sided
    assert int(r["n_b"]) == 0 and int(r["ks_bp"]) == -1
    assert int(r["at_value"]) == 2  # smallest support value (SQL tie order)

    r2 = ks_drift(str(tmp_path), src_a="no_a", src_b="no_b")
    assert len(r2) == 0  # empty support → typed empty frame (oracle: 0 rows)
