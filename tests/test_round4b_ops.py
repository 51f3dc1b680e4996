"""Algorithmic invariants for the round-4 drift / robust-stats / coverage /
coreset operators (value parity vs DuckDB is pinned registry-wide in
test_queries_vs_duckdb; these pin the math on adversarial inputs)."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from research_knowledge_graph_ray.stages import similarity, stats, textops


def test_psi_terms_nonnegative_and_counts_partition(sf_dir):
    df = stats.psi_drift(sf_dir)
    # (p_a - p_b) and ln(p_a/p_b) always share sign → every term >= 0
    assert (df["psi_term_e9"] >= 0).all()
    # the two histograms partition the orders table
    orders = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
    assert int(df["cnt_a"].sum() + df["cnt_b"].sum()) == orders.num_rows
    # one-sided bins carry the smoothing-free 0 convention
    one_sided = df[(df["cnt_a"] == 0) | (df["cnt_b"] == 0)]
    assert (one_sided["psi_term_e9"] == 0).all()


def test_trimmed_stats_matches_bruteforce(sf_dir):
    got = stats.trimmed_stats(sf_dir)
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_totalprice"]).to_pandas()
    orders["c"] = np.rint(orders["o_totalprice"].to_numpy() * 100).astype(np.int64)
    for _, row in got.iterrows():
        vals = np.sort(orders.loc[
            orders["o_orderpriority"] == row["o_orderpriority"], "c"].to_numpy())
        k = len(vals) * 5 // 100
        kept = vals[k: len(vals) - k]
        assert row["n_kept"] == len(kept)
        assert row["sum_kept_cents"] == int(kept.sum())


def test_trimmed_stats_full_trim_is_empty_group(tmp_path):
    # a group smaller than the trim mass on each side keeps the middle only
    tab = pa.table({
        "o_orderpriority": ["A"] * 3,
        "o_totalprice": [1.0, 2.0, 3.0],
    })
    pq.write_table(tab, tmp_path / "orders.parquet")
    out = stats.trimmed_stats(str(tmp_path), trim_pct=34)  # k = floor(3*.34)=1
    assert out.loc[0, "n_kept"] == 1 and out.loc[0, "sum_kept_cents"] == 200


def test_oov_rate_bounds_and_vocab_cover(sf_dir):
    df = textops.oov_rate(sf_dir)
    assert (df["n_oov"] <= df["n_tokens"]).all()
    assert (df["n_tokens"] > 0).all()
    # total token mass matches the exact token counter's global sum
    top = textops.top_tokens(sf_dir, k=10**6)  # full vocabulary
    assert int(df["n_tokens"].sum()) == int(top["n"].sum())
    # with the FULL vocabulary nothing is OOV
    full = textops.oov_rate(sf_dir, v=10**6)
    assert (full["n_oov"] == 0).all()


def test_source_js_symmetric_and_bounded(sf_dir):
    ab = textops.source_js_divergence(sf_dir, "src0", "src1")
    ba = textops.source_js_divergence(sf_dir, "src1", "src0")
    assert (ab["js_term_e9"] >= 0).all()
    # JSD <= ln 2 (natural-log units)
    assert int(ab["js_term_e9"].sum()) <= int(math.log(2) * 1e9) + 1
    # symmetry: swapping sources swaps the count columns, terms identical
    m = ab.merge(ba, on="token", suffixes=("_ab", "_ba"))
    assert (m["cnt_a_ab"] == m["cnt_b_ba"]).all()
    assert (m["js_term_e9_ab"] == m["js_term_e9_ba"]).all()


def test_source_js_identical_distributions_zero(tmp_path):
    tab = pa.table({
        "source": ["src0", "src1"],
        "text": ["x y y z", "x y y z"],
    })
    pq.write_table(tab, tmp_path / "documents.parquet")
    df = textops.source_js_divergence(str(tmp_path))
    assert (df["js_term_e9"] == 0).all()


@pytest.fixture()
def corner_embeddings(tmp_path):
    # 2-D corners plus a center point: greedy farthest-point from the seed
    # (min vec_id = corner (0,0)) must walk the corners before the center
    pts = [(0.0, 0.0), (0.4, 0.4), (0.0, 0.4), (0.4, 0.0), (0.2, 0.2)]
    tab = pa.table({
        "vec_id": pa.array(range(len(pts)), pa.int64()),
        "embedding": pa.array([list(p) for p in pts],
                              pa.list_(pa.float32())),
    })
    pq.write_table(tab, tmp_path / "embeddings.parquet")
    return str(tmp_path)


def test_kcenter_walks_corners_before_center(corner_embeddings):
    out = similarity.kcenter_select(corner_embeddings, k=5)
    assert out["step"].tolist() == [0, 1, 2, 3, 4]
    assert out["vec_id"].iloc[0] == 0          # seed = min vec_id
    assert out["vec_id"].iloc[1] == 1          # opposite corner is farthest
    assert set(out["vec_id"].iloc[2:4]) == {2, 3}  # remaining corners (tie→2 first)
    assert out["vec_id"].iloc[2] == 2          # tie broken by min vec_id
    assert out["vec_id"].iloc[4] == 4          # center last
    # max-min distances are non-increasing along the greedy walk
    d = out["d2_min"].iloc[1:].to_numpy()
    assert (np.diff(d) <= 0).all()


def test_kcenter_k_exceeding_points_stops(corner_embeddings):
    out = similarity.kcenter_select(corner_embeddings, k=10)
    assert len(out) == 5  # degenerate: stops once every point is selected
    assert out["vec_id"].is_unique


def test_q10_top20_bound_and_money_exact(sf_dir):
    from research_knowledge_graph_ray.pipelines import relational

    df = relational.q10_returned_items(sf_dir)
    assert len(df) <= 20
    # ranked by revenue desc with custkey tie-break
    r = df["revenue_de4"].to_numpy()
    assert (r[:-1] >= r[1:]).all()
    assert (r > 0).all()


def test_q14_share_bounds(sf_dir):
    from research_knowledge_graph_ray.pipelines import relational

    df = relational.q14_promo_revenue(sf_dir)
    assert df.loc[0, "promo_de4"] <= df.loc[0, "total_de4"]
    assert 0 <= df.loc[0, "promo_share_e9"] <= 10**9


def test_dedup_rate_partition(sf_dir):
    import pyarrow.parquet as pq

    from research_knowledge_graph_ray.stages import dedup

    df = dedup.dedup_rate_by_source(sf_dir)
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    assert int(df["n_docs"].sum()) == docs.num_rows
    assert (df["n_distinct"] <= df["n_docs"]).all()
    assert (df["n_dups"] == df["n_docs"] - df["n_distinct"]).all()


def test_label_balance_shares_and_entropy(sf_dir):
    from research_knowledge_graph_ray.stages import stats

    df = stats.label_balance(sf_dir)
    # shares sum to 1 (±1 ulp-of-e9 per label from rounding)
    assert abs(int(df["share_e9"].sum()) - 10**9) <= len(df)
    # entropy <= ln(|labels|)
    assert int(df["entropy_term_e9"].sum()) <= int(
        math.log(len(df)) * 1e9) + len(df)
    assert (df["entropy_term_e9"] >= 0).all()


def test_embedding_standardize_is_zero_mean_unit_var(sf_dir):
    from research_knowledge_graph_ray.stages import stats

    df = stats.embedding_standardize(sf_dir).to_pandas()
    z = df.pivot(index="vec_id", columns="i", values="z_e6").to_numpy() / 1e6
    # per-dimension population stats of the emitted z-scores
    assert np.abs(z.mean(axis=0)).max() < 1e-3
    assert np.abs(z.std(axis=0) - 1.0).max() < 1e-3


def test_dedup_cluster_histogram_planted(tmp_path):
    from research_knowledge_graph_ray.stages import dedup

    texts = ["unique %d" % i for i in range(6)] + ["dup a"] * 3 + ["dup b"] * 2
    tab = pa.table({"text": texts})
    pq.write_table(tab, tmp_path / "documents.parquet")
    df = dedup.dedup_cluster_histogram(str(tmp_path))
    got = dict(zip(df["cluster_size"], df["n_clusters"]))
    assert got == {1: 6, 2: 1, 3: 1}


def test_event_type_islands_bruteforce(tmp_path):
    import itertools

    from research_knowledge_graph_ray.pipelines import windows

    # two users, interleaved runs incl. same-type re-entry and a ts tie
    ts = pd.to_datetime([
        "2020-01-01 00:00", "2020-01-01 00:01", "2020-01-01 00:02",
        "2020-01-01 00:03", "2020-01-01 00:03", "2020-01-01 00:05",
        "2020-01-01 00:00", "2020-01-01 00:10",
    ])
    tab = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 1, 1, 2, 2], pa.int64()),
        "event_id": pa.array(range(8), pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "event_type": ["a", "a", "b", "b", "a", "a", "c", "c"],
    })
    pq.write_table(tab, tmp_path / "events.parquet")
    df = windows.event_type_islands(str(tmp_path))
    runs = [(u, et, n) for u, et, n
            in zip(df["user_id"], df["event_type"], df["n_events"])]
    # user 1: a-run(2), b-run(2), a-run(2 — re-entry after the ts-tie row);
    # user 2: one c-run(2)
    assert runs == [(1, "a", 2), (1, "b", 2), (1, "a", 2), (2, "c", 2)]
    # intervals tile each user's events exactly
    assert int(df["n_events"].sum()) == 8
    assert (df["valid_from"] <= df["valid_to"]).all()
