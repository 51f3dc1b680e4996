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



def _to_df(res) -> pd.DataFrame:
    """Schema-aware Dataset→DataFrame: Ray's to_pandas() drops the columns
    of an ALL-empty Dataset even when ds.schema() is correct (the documented
    empty-block gotcha) — rebuild the typed empty frame from the schema, per
    the repo convention 'compare empty results at the Arrow/schema level'."""
    import ray.data

    if isinstance(res, ray.data.Dataset):
        df = res.to_pandas()
        if df.shape[1] == 0:
            schema = res.schema()
            df = pa.table({n: pa.array([], type=t) for n, t in
                           zip(schema.names, schema.types)}).to_pandas()
        return df
    return res if isinstance(res, pd.DataFrame) else res.to_pandas()


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
        got = _canon(_to_df(fn(str(tmp_path))))
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
        got = _canon(_to_df(fn(str(tmp_path))))
        want = _canon(con.execute(sql).fetchdf())
        assert list(got.columns) == list(want.columns), (name, seed)
        assert len(got) == len(want), (name, seed, len(got), len(want))
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      check_exact=True)


# ---------------------------------------------------------------------------
# relational (orders/lineitem/catalog) operators — the TPC-H-analogue family
# ---------------------------------------------------------------------------

REL_FUZZ_QUERIES = ['graph_pagerank', 'graph_sssp', 'graph_kcore', 'assoc_rules', 'price_quantiles', 'rfm_segments', 'fk_integrity', 'q1_pricing_summary', 'q3_shipping_priority', 'revenue_by_nation', 'nation_year_revenue', 'customer_order_totals', 'graph_ppr', 'graph_hits', 'graph_label_prop', 'graph_modularity', 'graph_walks', 'walk_skipgrams', 'neighbor_sample', 'price_quantile_sketch', 'approx_distinct_custkey', 'top10_orders', 'orders_by_month', 'orders_rollup', 'orders_cube', 'price_qty_regression', 'customer_balance_zscore', 'order_price_histogram', 'customer_year_setops', 'table_profile', 'fuzzy_name_pairs', 'item_jaccard', 'clv_by_cohort', 'nation_supplier_hhi', 'order_quartiles', 'quantity_cume_dist', 'price_quantiles_cont', 'orders_running_total', 'table_checksum', 'key_skew', 'order_price_rank', 'top_orders_per_customer', 'customers_without_orders', 'customer_rolling', 'vip_order_totals', 'bucketed_order_totals', 'customer_order_counts_all', 'customer_order_totals_salted', 'customer_order_totals_auto', 'order_rank_in_month', 'customer_order_gaps', 'revenue_mom_growth', 'snapshot_diff', 'revenue_share_by_nation', 'revenue_by_balance_decile', 'skyline_orders', 'benford_totalprice', 'above_nation_avg', 'orders_box_probe', 'revenue_rollup', 'q4_order_priority', 'q5_local_supplier_volume', 'q6_forecast_revenue', 'q7_volume_shipping', 'orders_no_returns', 'cheapest_supplier', 'psi_drift', 'trimmed_stats', 'q10_returned_items', 'q14_promo_revenue', 'q17_small_qty_revenue', 'q18_large_orders', 'q21_blame_supplier', 'q22_idle_rich', 'link_prediction', 'q9_product_profit', 'q8_market_share', 'q13_customer_distribution', 'q15_top_supplier', 'q19_disjunctive_revenue', 'q2_min_cost_supplier', 'q16_supplier_part_counts', 'q20_dominant_suppliers', 'q12_priority_lines', 'q11_important_stock', 'itemsets3', 'bootstrap_ci', 'regression_by_group', 'graph_diameter', 'graph_robustness', 'pair_betweenness', 'graph_closeness', 'graph_hop_histogram', 'rich_club', 'revenue_concentration', 'revenue_gini', 'theil_terms']

_SEGS = ["HOUSEHOLD", "MACHINERY", "BUILDING", "FURNITURE", "AUTOMOBILE"]
_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
_ADJ = ["blue", "cold", "small", "green", "red", "dark", "pale"]
_NOUN = ["anvil", "bolt", "gear", "gizmo", "ring", "rod", "widget"]


def random_relational(seed: int) -> dict:
    rng = np.random.default_rng(seed)
    tabs = {}
    tabs["region"] = pa.table({
        "r_regionkey": pa.array(range(5), pa.int64()),
        "r_name": pa.array(["AFRICA", "AMERICA", "ASIA", "EUROPE",
                            "MIDDLE EAST"], pa.string())})
    tabs["nation"] = pa.table({
        "n_nationkey": pa.array(range(25), pa.int64()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)], pa.string()),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int64())})
    n_supp = int(rng.integers(5, 12))
    tabs["supplier"] = pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype("int32"),
                                pa.int32()),
        "s_acctbal": pa.array(np.round(rng.uniform(-500, 5000, n_supp), 2))})
    n_part = int(rng.integers(20, 80))
    tabs["part"] = pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": pa.array([f"{rng.choice(_ADJ)} {rng.choice(_NOUN)}"
                            for _ in range(n_part)]),
        "p_brand": pa.array([f"Brand#{int(rng.integers(1, 26))}"
                             for _ in range(n_part)]),
        "p_type": pa.array([str(rng.choice(_TYPES)) for _ in range(n_part)]),
        "p_size": pa.array(rng.integers(1, 11, n_part).astype("int32"),
                           pa.int32()),
        "p_retailprice": pa.array(np.round(900 + rng.uniform(0, 100, n_part),
                                           2))})
    n_cust = int(rng.integers(15, 60))
    tabs["customer"] = pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust).astype("int32"),
                                pa.int32()),
        "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n_cust), 2)),
        "c_mktsegment": pa.array([str(rng.choice(_SEGS))
                                  for _ in range(n_cust)])})
    n_ord = int(rng.integers(80, 300))
    base = np.int64(788_918_400_000_000)  # 1995-01-01 epoch micros
    odate = base + rng.integers(0, 6 * 365, n_ord) * 86_400_000_000
    # some customers never order (q13 / customers_without_orders paths)
    custs = rng.integers(0, max(2, n_cust - 3), n_ord)
    tabs["orders"] = pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(custs, pa.int64()),
        "o_orderstatus": pa.array([str(rng.choice(["P", "O", "F"]))
                                   for _ in range(n_ord)]),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 300000, n_ord),
                                          2)),
        "o_orderdate": pa.array(odate).cast(pa.timestamp("us")),
        "o_orderpriority": pa.array([str(rng.choice(_PRIOS))
                                     for _ in range(n_ord)])})
    ok, pk, sk, ln, qty, ep, disc, tax, rf, ls, sd = \
        [], [], [], [], [], [], [], [], [], [], []
    for o in range(n_ord):
        for line in range(int(rng.integers(1, 7))):
            ok.append(o); pk.append(int(rng.integers(0, n_part)))
            sk.append(int(rng.integers(0, n_supp))); ln.append(line + 1)
            qty.append(float(rng.integers(1, 51)))
            ep.append(round(float(rng.uniform(900, 100000)), 2))
            disc.append(round(float(rng.integers(0, 11)) / 100, 2))
            tax.append(round(float(rng.integers(0, 9)) / 100, 2))
            rf.append(str(rng.choice(["R", "N", "A"])))
            ls.append(str(rng.choice(["O", "F"])))
            sd.append(int(odate[o]) + int(rng.integers(1, 91))
                      * 86_400_000_000)
    tabs["lineitem"] = pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_partkey": pa.array(pk, pa.int64()),
        "l_suppkey": pa.array(sk, pa.int64()),
        "l_linenumber": pa.array(ln, pa.int32()),
        "l_quantity": pa.array(qty, pa.float64()),
        "l_extendedprice": pa.array(ep, pa.float64()),
        "l_discount": pa.array(disc, pa.float64()),
        "l_tax": pa.array(tax, pa.float64()),
        "l_returnflag": pa.array(rf, pa.string()),
        "l_linestatus": pa.array(ls, pa.string()),
        "l_shipdate": pa.array(sd, pa.int64()).cast(pa.timestamp("us"))})
    return tabs


@pytest.mark.parametrize("seed", [42, 77])
def test_relational_ops_match_oracle_on_random_db(seed, tmp_path):
    """97 relational operators replayed on a seeded random FK-consistent
    micro-database (skewed custkeys, customers without orders, degenerate
    single-customer nations, sparse co-purchase graphs whose k-core peels
    bare). Found on first contact: the zero-variance nation in
    customer_balance_zscore (now the clamped z=0 convention on both sides)
    and graph_kcore's schema-less empty-peel crash."""
    tabs = random_relational(seed)
    con = duckdb.connect()
    for t, tb in tabs.items():
        pq.write_table(tb, tmp_path / f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{t}.parquet')")

    for name in REL_FUZZ_QUERIES:
        fn, sql = QUERIES[name]
        got = _canon(_to_df(fn(str(tmp_path))))
        want = _canon(con.execute(sql).fetchdf())
        assert list(got.columns) == list(want.columns), (name, seed)
        assert len(got) == len(want), (name, seed, len(got), len(want))
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      check_exact=True)


# ---------------------------------------------------------------------------
# embeddings-table operators (ANN / clustering / valuation family)
# ---------------------------------------------------------------------------

EMB_FUZZ_QUERIES = [
    "dedup_embedding_exact", "dedup_embedding_clusters", "knn_topk",
    "knn_topk_ivf", "embedding_kmeans", "dedup_embedding_pairs", "semdedup",
    "mmr_rerank", "embedding_quantize", "pq_codes", "pq_search",
    "random_projection", "knn_classify", "cluster_silhouette",
    "cluster_prototypes", "hard_negatives", "reciprocal_nn",
    "embedding_moments", "knn_join", "knn_join_ivf", "knn_join_auto",
    "kcenter_select", "label_balance", "embedding_standardize",
    "semantic_decontaminate", "knn_density", "knn_shapley",
    "embedding_mean_drift",
]


def random_embeddings(seed: int, with_zero: bool = False) -> pa.Table:
    rng = np.random.default_rng(seed)
    n = int(rng.integers(30, 150))
    dim = 64
    m = rng.standard_normal((n, dim)).astype(np.float32)
    # planted exact duplicates (dedup paths) and near-duplicates
    for _ in range(max(1, n // 12)):
        i, j = rng.integers(0, n, 2)
        m[j] = m[i]
    for _ in range(max(1, n // 15)):
        i, j = rng.integers(0, n, 2)
        m[j] = m[i] + rng.standard_normal(dim).astype(np.float32) * 1e-4
    if with_zero:
        m[int(rng.integers(0, n))] = 0.0
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([row for row in m.tolist()],
                              pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n).astype("int32"), pa.int32()),
    })


@pytest.mark.parametrize("seed", [42, 99])
def test_embedding_ops_match_oracle_on_random_vectors(seed, tmp_path):
    """28 embedding operators on seeded random UNNORMALIZED vectors with
    planted exact- and near-duplicates. Found on first contact:
    cluster_silhouette's (d_next − d_own)·1e6 wrapped int64 on unnormalized
    magnitudes (now exact object-int, HUGEINT-oracle parity).

    Zero-norm vectors stay OUT of the generator by input contract:
    trained/hashed embeddings are never all-zero; the engine degrades to
    sim = 0 where DuckDB's list_cosine_similarity NaN-poisons — a
    documented, deliberate divergence outside the contract."""
    pq.write_table(random_embeddings(seed), tmp_path / "embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')")

    for name in EMB_FUZZ_QUERIES:
        fn, sql = QUERIES[name]
        got = _canon(_to_df(fn(str(tmp_path))))
        want = _canon(con.execute(sql).fetchdf())
        assert list(got.columns) == list(want.columns), (name, seed)
        assert len(got) == len(want), (name, seed, len(got), len(want))
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      check_exact=True)


# ---------------------------------------------------------------------------
# everything else: KG pipeline, dedup variants, sampling, cross-table ops —
# one combined random database (documents + events + embeddings + relational)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [42, 77])
def test_remaining_registry_ops_match_oracle_on_random_db(seed, tmp_path):
    """Replays every oracle-gated registry query NOT covered by the four
    family-specific fuzz tests above (KG construction included) on a
    combined random database. Found on first contact: the paper-node
    under-model in the kg_graph_nodes / kg_node_properties oracles
    (zero-mention docs), kg_edge_growth's missing zero-edge years,
    curation_funnel's NULL-vs-0 empty-stage SUM, schema-less empty frames
    in the incremental-update / minhash-confusion / ensemble union-find
    paths, and top_similar_pairs' schema-less sort-of-empty."""
    from research_knowledge_graph_ray.pipelines.registry import QUERIES as Q

    covered = (set(FUZZ_QUERIES) | set(EVENT_FUZZ_QUERIES)
               | set(REL_FUZZ_QUERIES) | set(EMB_FUZZ_QUERIES))
    rest = [n for n, (f, s) in Q.items() if s is not None and n not in covered]

    pq.write_table(_random_corpus(seed), tmp_path / "documents.parquet")
    pq.write_table(_random_events(seed), tmp_path / "events.parquet")
    pq.write_table(random_embeddings(seed), tmp_path / "embeddings.parquet")
    for t, tb in random_relational(seed).items():
        pq.write_table(tb, tmp_path / f"{t}.parquet")
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{t}.parquet')")

    for name in rest:
        fn, sql = Q[name]
        got = _canon(_to_df(fn(str(tmp_path))))
        want = _canon(con.execute(sql).fetchdf())
        assert list(got.columns) == list(want.columns), (name, seed)
        assert len(got) == len(want), (name, seed, len(got), len(want))
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      check_exact=True)
