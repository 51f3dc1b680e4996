"""Algorithmic invariants for the round-4c TPC-H-shape additions (Q17/Q18/
Q21/Q22 analogues). Value parity vs DuckDB is pinned registry-wide in
test_queries_vs_duckdb; these pin the math on adversarial/planted inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from research_knowledge_graph_ray.pipelines import relational


def test_q17_small_qty_matches_bruteforce(sf_dir):
    got = relational.q17_small_qty_revenue(sf_dir)
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"]).to_pandas()
    keys = set(part.loc[part["p_brand"] == relational._Q17_BRAND, "p_partkey"])
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"]).to_pandas()
    li = li[li["l_partkey"].isin(keys)].copy()
    li["q"] = np.rint(li["l_quantity"]).astype(np.int64)
    li["cents"] = np.rint(li["l_extendedprice"] * 100).astype(np.int64)
    agg = li.groupby("l_partkey").agg(sq=("q", "sum"), n=("q", "size"))
    li = li.join(agg, on="l_partkey")
    small = li[5 * li["q"] * li["n"] < li["sq"]]
    assert int(got.loc[0, "n_small"]) == len(small)
    assert int(got.loc[0, "revenue_cents"]) == int(small["cents"].sum())


def test_q18_threshold_and_ranking(sf_dir):
    got = relational.q18_large_orders(sf_dir)
    # every returned order genuinely exceeds the quantity threshold
    assert (got["total_qty"] > relational._Q18_MIN_QTY).all()
    # ranking is by totalprice desc with orderkey tiebreak
    key = list(zip(-got["totalprice_cents"], got["o_orderkey"]))
    assert key == sorted(key)
    assert len(got) <= 100
    # the HAVING set is complete (no qualifying order missing below the cap)
    li = pq.read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_quantity"]).to_pandas()
    li["q"] = np.rint(li["l_quantity"]).astype(np.int64)
    qual = li.groupby("l_orderkey")["q"].sum()
    n_qual = int((qual > relational._Q18_MIN_QTY).sum())
    assert len(got) == min(100, n_qual)


def test_q21_sole_blame_planted(tmp_path):
    # order 1: two suppliers, only supplier 7 returned -> blamed
    # order 2: two suppliers, both returned -> nobody blamed
    # order 3: single supplier returned -> not multi-supplier, excluded
    tab = pa.table({
        "l_orderkey": [1, 1, 1, 2, 2, 3],
        "l_suppkey": [7, 7, 8, 7, 8, 7],
        "l_returnflag": ["R", "N", "N", "R", "R", "R"],
    })
    pq.write_table(tab, tmp_path / "lineitem.parquet")
    out = relational.q21_blame_supplier(str(tmp_path))
    assert out.to_dict("records") == [{"l_suppkey": 7, "n_orders": 1}]


def test_q22_idle_rich_partitions_customers(sf_dir):
    got = relational.q22_idle_rich_customers(sf_dir)
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_acctbal", "c_mktsegment"]).to_pandas()
    orders = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_custkey", "o_orderdate"]).to_pandas()
    cents = np.rint(cust["c_acctbal"] * 100).astype(np.int64)
    pos = cents[cents > 0]
    rich = cust[cents * len(pos) > pos.sum()]
    active = set(orders.loc[
        orders["o_orderdate"] >= pd.Timestamp(relational._Q22_CUTOFF),
        "o_custkey"])
    idle_rich = rich[~rich["c_custkey"].isin(active)]
    assert int(got["n_cust"].sum()) == len(idle_rich)
    want = np.rint(idle_rich["c_acctbal"] * 100).astype(np.int64).sum()
    assert int(got["sum_acctbal_cents"].sum()) == int(want)


def test_q22_empty_probe_keeps_all_rich(tmp_path):
    # no recent orders at all: every above-avg-balance customer is idle
    pq.write_table(pa.table({
        "c_custkey": [1, 2, 3],
        "c_acctbal": [10.0, 20.0, 60.0],
        "c_mktsegment": ["A", "A", "B"],
    }), tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "o_custkey": pa.array([], pa.int64()),
        "o_orderdate": pa.array([], pa.timestamp("us")),
    }), tmp_path / "orders.parquet")
    out = relational.q22_idle_rich_customers(str(tmp_path))
    # avg positive balance = 30.0 -> only custkey 3 qualifies
    assert out.to_dict("records") == [
        {"c_mktsegment": "B", "n_cust": 1, "sum_acctbal_cents": 6000}]


def test_link_prediction_nonedges_and_scores(sf_dir):
    from research_knowledge_graph_ray.stages import graphalgs

    got = graphalgs.link_prediction(sf_dir)
    assert len(got) > 0
    # rebuild the edge set brute-force and check every candidate is a
    # NON-edge with the claimed common-neighbor count
    li = pq.read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]).to_pandas()
    li = li.drop_duplicates()
    pairs = {}
    for _, g in li.groupby("l_orderkey"):
        ps = sorted(set(g["l_partkey"]))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pairs[(ps[i], ps[j])] = pairs.get((ps[i], ps[j]), 0) + 1
    edges = {p for p, w in pairs.items() if w >= graphalgs._LP_MIN_CO}
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for row in got.itertuples():
        p = (int(row.part_a), int(row.part_b))
        assert p not in edges  # predicted links must be non-edges
        common = adj.get(p[0], set()) & adj.get(p[1], set())
        assert row.cn == len(common)
        assert row.ra_e9 == sum(10**9 // len(adj[z]) for z in common)
        assert row.pa == len(adj[p[0]]) * len(adj[p[1]])


def test_assortativity_bounds_and_symmetry(sf_dir):
    from research_knowledge_graph_ray.stages import graphalgs

    got = graphalgs.degree_assortativity(sf_dir)
    r = int(got.loc[0, "r_e9"])
    assert -10**9 <= r <= 10**9  # a correlation, scaled
    assert int(got.loc[0, "n_edges"]) % 2 == 0  # symmetrized edge list


def test_zipf_fit_slope_negative_and_exact(sf_dir):
    import math

    from research_knowledge_graph_ray.stages import textops

    got = textops.zipf_fit(sf_dir)
    # frequencies are non-increasing in rank -> OLS slope <= 0
    assert int(got.loc[0, "slope_e9"]) <= 0
    # brute-force the same quantized regression from top_tokens
    top = textops.top_tokens(sf_dir, k=textops._ZIPF_K)
    n = len(top)
    xs = [textops._round_half_away(math.log(r) * 1e6)
          for r in range(1, n + 1)]
    ys = [textops._round_half_away(math.log(int(c)) * 1e6)
          for c in top["n"]]
    sx, sy = sum(xs), sum(ys)
    num = n * sum(x * y for x, y in zip(xs, ys)) - sx * sy
    den = n * sum(x * x for x in xs) - sx * sx
    want = textops._round_half_away(num / den * 1e9)
    assert int(got.loc[0, "slope_e9"]) == want


def test_zipf_fit_degenerate_single_token(tmp_path):
    import pyarrow as pa_mod

    from research_knowledge_graph_ray.stages import textops

    pq.write_table(pa_mod.table({"doc_id": [1], "text": ["hello"]}),
                   tmp_path / "documents.parquet")
    out = textops.zipf_fit(str(tmp_path))
    assert out.loc[0, "n_ranks"] == 1
    assert out.loc[0, "slope_e9"] == 0


def test_q9_profit_matches_bruteforce(sf_dir):
    got = relational.q9_product_profit(sf_dir)
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_retailprice"]).to_pandas()
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"]).to_pandas()
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"]).to_pandas()
    li = (li.merge(part, left_on="l_partkey", right_on="p_partkey")
            .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
            .merge(nation, left_on="s_nationkey", right_on="n_nationkey"))
    cents = np.rint(li["l_extendedprice"] * 100).astype(np.int64)
    bp = np.rint(li["l_discount"] * 10000).astype(np.int64)
    retail = np.rint(li["p_retailprice"] * 100).astype(np.int64)
    qty = np.rint(li["l_quantity"]).astype(np.int64)
    li["profit"] = cents * (10000 - bp) - retail * qty * 10000
    li["l_year"] = li["l_shipdate"].dt.year.astype(np.int64)
    want = (li.groupby(["n_name", "l_year"], as_index=False)
              .agg(profit_de4=("profit", "sum"))
              .sort_values(["n_name", "l_year"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, want[["n_name", "l_year", "profit_de4"]], check_dtype=False)


def test_q8_share_bounds_and_consistency(sf_dir):
    got = relational.q8_market_share(sf_dir)
    # nation revenue never exceeds total; share in [0, 1e9]
    assert (got["nation_de4"] <= got["total_de4"]).all()
    assert got["share_e9"].between(0, 1_000_000_000).all()
    # share is the exact e9 rounding of the integer ratio
    for _, r in got.iterrows():
        if r["total_de4"]:
            want = relational._round_e9_local(
                float(r["nation_de4"]) / float(r["total_de4"]))
            assert int(r["share_e9"]) == want
    # years confined to the window
    lo = int(relational._Q8_LO[:4])
    hi = int(relational._Q8_HI[:4])
    assert got["o_year"].between(lo, hi).all()


def test_q8_empty_window_returns_typed_empty(tmp_path, sf_dir):
    import shutil

    for t in ["region", "nation", "customer", "supplier", "part",
              "lineitem"]:
        shutil.copy(f"{sf_dir}/{t}.parquet", tmp_path / f"{t}.parquet")
    orders = pq.read_table(f"{sf_dir}/orders.parquet")
    pq.write_table(orders.slice(0, 0), tmp_path / "orders.parquet")
    out = relational.q8_market_share(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["o_year", "nation_de4", "total_de4",
                                 "share_e9"]
