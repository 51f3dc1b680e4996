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
