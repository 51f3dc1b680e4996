"""Algorithmic invariants for the round-4d TPC-H-shape additions
(Q2/Q8/Q9 batch follow-on: Q12/Q13/Q15/Q16/Q19/Q20 analogues). Value
parity vs DuckDB is pinned registry-wide in test_queries_vs_duckdb;
these pin the math on planted/adversarial inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from research_knowledge_graph_ray.pipelines import relational


def test_q13_histogram_covers_every_customer(sf_dir):
    got = relational.q13_customer_distribution(sf_dir)
    n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    # the distribution partitions the customer set exactly
    assert int(got["custdist"].sum()) == n_cust
    # ordering: custdist desc, c_count desc
    key = list(zip(-got["custdist"], -got["c_count"]))
    assert key == sorted(key)


def test_q13_zero_bucket_counts_orderless_customers(tmp_path):
    pq.write_table(pa.table({"c_custkey": [1, 2, 3]}),
                   tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "o_custkey": [1, 1, 2],
        "o_orderpriority": ["5-LOW", "5-LOW", relational._Q13_EXCLUDE],
    }), tmp_path / "orders.parquet")
    out = relational.q13_customer_distribution(str(tmp_path))
    # cust 1 -> 2 orders; cust 2 -> excluded-only -> 0; cust 3 -> 0
    d = dict(zip(out["c_count"], out["custdist"]))
    assert d == {0: 2, 2: 1}


def test_q15_winner_is_argmax(sf_dir):
    got = relational.q15_top_supplier(sf_dir)
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"]).to_pandas()
    lo = pd.Timestamp(relational._Q15_LO)
    hi = pd.Timestamp(relational._Q15_HI)
    li = li[(li["l_shipdate"] >= lo) & (li["l_shipdate"] < hi)]
    cents = np.rint(li["l_extendedprice"] * 100).astype(np.int64)
    bp = np.rint(li["l_discount"] * 10000).astype(np.int64)
    rev = pd.DataFrame({"sk": li["l_suppkey"],
                        "r": cents * (10000 - bp)}).groupby("sk")["r"].sum()
    assert set(got["s_suppkey"]) == set(rev[rev == rev.max()].index)
    assert (got["total_revenue_de4"] == int(rev.max())).all()


def test_q19_matches_bruteforce(sf_dir):
    got = relational.q19_disjunctive_revenue(sf_dir)
    part = pq.read_table(f"{sf_dir}/part.parquet").to_pandas()
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"]).to_pandas()
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    qty = np.rint(j["l_quantity"]).astype(np.int64)
    keep = np.zeros(len(j), dtype=bool)
    for b, slo, shi, qlo, qhi in relational._Q19_CLAUSES:
        keep |= ((j["p_brand"] == b) & j["p_size"].between(slo, shi)
                 & (qty >= qlo) & (qty <= qhi)).to_numpy()
    cents = np.rint(j["l_extendedprice"] * 100).astype(np.int64)
    bp = np.rint(j["l_discount"] * 10000).astype(np.int64)
    want = int((cents[keep] * (10000 - bp[keep])).sum())
    assert int(got.loc[0, "revenue_de4"]) == want


def test_q16_excluded_supplier_never_counted(tmp_path):
    # part 1 in-class; suppliers 5 (clean) and 17 (name ends in '7' ->
    # complaint-excluded) both ship it; only supplier 5 counts
    pq.write_table(pa.table({
        "p_partkey": [1], "p_brand": ["Brand#1"], "p_type": ["SMALL"],
        "p_size": [relational._Q16_SIZES[0]],
    }), tmp_path / "part.parquet")
    pq.write_table(pa.table({
        "s_suppkey": [5, 17],
        "s_name": ["Supplier#000000005", "Supplier#000000017"],
    }), tmp_path / "supplier.parquet")
    pq.write_table(pa.table({
        "l_partkey": [1, 1, 1], "l_suppkey": [5, 17, 5],
    }), tmp_path / "lineitem.parquet")
    out = relational.q16_supplier_part_counts(str(tmp_path))
    assert out.to_dict("records") == [{
        "p_brand": "Brand#1", "p_type": "SMALL",
        "p_size": relational._Q16_SIZES[0], "supplier_cnt": 1}]


def test_q20_majority_threshold_planted(tmp_path):
    # part 1: supplier 3 ships 60 of 100 -> dominant; supplier 4 ships 40
    # part 2: 50/50 split -> nobody dominant (strict >)
    pq.write_table(pa.table({
        "p_partkey": [1, 2],
        "p_name": [f"{relational._Q20_PREFIX} ring",
                   f"{relational._Q20_PREFIX} bolt"],
    }), tmp_path / "part.parquet")
    pq.write_table(pa.table({
        "s_suppkey": [3, 4],
        "s_name": ["Supplier#000000003", "Supplier#000000004"],
    }), tmp_path / "supplier.parquet")
    ship = pd.Timestamp(relational._Q20_LO)
    pq.write_table(pa.table({
        "l_partkey": [1, 1, 2, 2],
        "l_suppkey": [3, 4, 3, 4],
        "l_quantity": [60.0, 40.0, 50.0, 50.0],
        "l_shipdate": pa.array([ship] * 4, pa.timestamp("us")),
    }), tmp_path / "lineitem.parquet")
    out = relational.q20_dominant_suppliers(str(tmp_path))
    assert out["s_suppkey"].tolist() == [3]


def test_q12_counts_partition_joined_lines(sf_dir):
    got = relational.q12_priority_lines(sf_dir)
    li = pq.read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_returnflag",
                                "l_shipdate"]).to_pandas()
    lo = pd.Timestamp(relational._Q12_LO)
    hi = pd.Timestamp(relational._Q12_HI)
    li = li[(li["l_shipdate"] >= lo) & (li["l_shipdate"] < hi)]
    orders = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey"]).to_pandas()
    n_joined = len(li.merge(orders, left_on="l_orderkey",
                            right_on="o_orderkey"))
    assert int((got["high_line_count"] + got["low_line_count"]).sum()) \
        == n_joined


def test_q2_packed_argmin_tiebreaks_on_suppkey(tmp_path):
    # two suppliers at the identical min price -> lower suppkey wins
    pq.write_table(pa.table({
        "p_partkey": [1], "p_size": [relational._Q2_SIZE_LO],
        "p_type": [relational._Q2_TYPE],
    }), tmp_path / "part.parquet")
    pq.write_table(pa.table({
        "s_suppkey": [8, 9], "s_name": ["Supplier#8", "Supplier#9"],
        "s_nationkey": [0, 0], "s_acctbal": [10.0, 99.0],
    }), tmp_path / "supplier.parquet")
    pq.write_table(pa.table({"n_nationkey": [0], "n_name": ["NATION_0"]}),
                   tmp_path / "nation.parquet")
    pq.write_table(pa.table({
        "l_partkey": [1, 1], "l_suppkey": [9, 8],
        "l_extendedprice": [5.00, 5.00],
    }), tmp_path / "lineitem.parquet")
    out = relational.q2_min_cost_supplier(str(tmp_path))
    assert len(out) == 1
    assert out.loc[0, "s_name"] == "Supplier#8"
    assert out.loc[0, "min_price_cents"] == 500


def test_q11_threshold_planted(tmp_path):
    # values 100, 100, 100, 1000 -> mean 325; 1.5x mean = 487.5; only the
    # 1000-value part qualifies
    pq.write_table(pa.table({
        "l_partkey": [1, 2, 3, 4],
        "l_quantity": [1.0, 1.0, 1.0, 1.0],
        "l_extendedprice": [1.00, 1.00, 1.00, 10.00],
    }), tmp_path / "lineitem.parquet")
    out = relational.q11_important_stock(str(tmp_path))
    assert out.to_dict("records") == [{"p_partkey": 4, "value_cents": 1000}]


def test_semantic_decontaminate_planted(tmp_path):
    from research_knowledge_graph_ray.stages import dedup

    d = 8
    ev = [1.0] + [0.0] * (d - 1)        # eval vec (id 20 -> id % 20 == 0)
    leak = [0.9] + [0.1] * (d - 1)      # near-copy of the eval vec
    ortho = [0.0] * (d - 1) + [1.0]     # orthogonal -> S <= 0 vs eval
    pq.write_table(pa.table({
        "vec_id": pa.array([20, 1, 2], pa.int64()),
        "embedding": pa.array([ev, leak, ortho], pa.list_(pa.float32())),
    }), tmp_path / "embeddings.parquet")
    out = dedup.semantic_decontaminate(str(tmp_path))
    assert out.to_dict("records") == [{"vec_id": 1, "n_hits": 1}]


def test_nb_classify_separable_classes(tmp_path):
    from research_knowledge_graph_ray.stages import textops

    rows = []
    for i in range(10):
        rows.append((i, "apple banana apple", "fruit"))
        rows.append((100 + i, "bolt gear bolt", "metal"))
    # one doc that mixes but leans fruit
    rows.append((200, "apple apple gear", "fruit"))
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    }), tmp_path / "documents.parquet")
    out = textops.nb_classify(str(tmp_path))
    by_id = dict(zip(out["doc_id"], out["pred_source"]))
    assert all(by_id[i] == "fruit" for i in range(10))
    assert all(by_id[100 + i] == "metal" for i in range(10))
    assert by_id[200] == "fruit"
    assert int(out["correct"].sum()) == len(rows)


def test_token_label_mi_signal_ranks_top(tmp_path):
    from research_knowledge_graph_ray.stages import textops

    # 'apple' appears only under fruit, 'shared' under both equally:
    # the discriminative token's MI term must rank strictly higher
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["apple apple shared", "bolt bolt shared"],
        "source": ["fruit", "metal"],
    }), tmp_path / "documents.parquet")
    out = textops.token_label_mi(str(tmp_path))
    term = {(t, s): m for t, s, m in
            zip(out["token"], out["source"], out["mi_term_e9"])}
    assert term[("apple", "fruit")] > term[("shared", "fruit")]
    # shared token carries zero information (p_tl = p_t * p_l exactly)
    assert term[("shared", "fruit")] == 0
    assert term[("shared", "metal")] == 0
