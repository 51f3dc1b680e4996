"""Algorithmic invariants for the curation-evaluation report family
(stages/evalops.py). Value parity vs DuckDB is pinned registry-wide in
test_queries_vs_duckdb; these pin the math on structural invariants and
planted degenerate inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from research_knowledge_graph_ray.stages import evalops


def _n_docs(sf_dir):
    return pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows


def test_kappa_confusion_partitions_corpus(sf_dir):
    got = evalops.classifier_kappa(sf_dir)
    row = got.iloc[0]
    assert row["n00"] + row["n01"] + row["n10"] + row["n11"] == row["n"]
    assert row["n"] == _n_docs(sf_dir)
    assert -10000 <= row["kappa_bp"] <= 10000
    assert 0 <= row["po_bp"] <= 10000 and 0 <= row["pe_bp"] <= 10000


def test_kappa_degenerate_marginals_convention(tmp_path):
    # every doc fails both gates identically -> pe == po == 1, kappa := 1
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": ["x y z", "x y z", "x y z"],
    }), tmp_path / "documents.parquet")
    got = evalops.classifier_kappa(str(tmp_path))
    row = got.iloc[0]
    assert row["n00"] == 3 and row["n11"] == 0
    assert row["kappa_bp"] == 10000


def test_calibration_bins_partition_and_rates(sf_dir):
    got = evalops.calibration_bins(sf_dir)
    assert int(got["n_docs"].sum()) == _n_docs(sf_dir)
    assert (got["n_pos"] <= got["n_docs"]).all()
    assert (got["pos_rate_bp"] == got["n_pos"] * 10000 // got["n_docs"]).all()
    assert (got["bin_lo"] % evalops._CAL_W == 0).all()
    assert got["bin_lo"].is_monotonic_increasing


def test_quality_ensemble_votes_partition(sf_dir):
    got = evalops.quality_ensemble(sf_dir)
    assert int(got["n_docs"].sum()) == _n_docs(sf_dir)
    assert got["votes"].between(0, 3).all()
    # one row per (source, votes) cell
    assert not got.duplicated(["source", "votes"]).any()


def test_ngram_diversity_bounds(sf_dir):
    got = evalops.ngram_diversity(sf_dir)
    assert (got["n_distinct"] <= got["n_grams"]).all()
    assert got["ttr_bp"].between(1, 10000).all()
    # trigram diversity uses the same machinery with n=3: per source there
    # are strictly fewer trigrams than bigrams (one fewer per document)
    tri = evalops.ngram_diversity(sf_dir, n=3)
    merged = got.merge(tri, on="source", suffixes=("_2", "_3"))
    assert len(merged) == len(got)
    assert (merged["n_grams_3"] < merged["n_grams_2"]).all()
    assert (merged["n_distinct_3"] <= merged["n_grams_3"]).all()


def test_padding_waste_accounting(sf_dir):
    got = evalops.padding_waste(sf_dir)
    assert int(got["n_docs"].sum()) == _n_docs(sf_dir)
    assert set(got["bucket"]).issubset(set(evalops._PAD_BUCKETS))
    assert (got["pad_tokens"] == got["bucket"] * got["n_docs"]
            - got["sum_tokens"]).all()
    assert (got["waste_bp"] < 10000).all() and (got["waste_bp"] >= 0).all()


def test_padding_waste_overflow_raises(tmp_path):
    import pytest

    pq.write_table(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": [" ".join(["w"] * (evalops._PAD_BUCKETS[-1] + 1))],
    }), tmp_path / "documents.parquet")
    with pytest.raises(Exception, match="largest padding bucket"):
        evalops.padding_waste(str(tmp_path))


def test_ks_drift_bounds_and_identity(sf_dir, tmp_path):
    got = evalops.ks_drift(sf_dir)
    row = got.iloc[0]
    assert 0 <= row["ks_bp"] <= 10000
    assert row["n_a"] > 0 and row["n_b"] > 0
    # identical distributions -> KS sup is 0 at every value; smallest wins
    pq.write_table(pa.table({
        "source": ["src0", "src1", "src0", "src1"],
        "n_chars": pa.array([10, 10, 20, 20], pa.int64()),
    }), tmp_path / "documents.parquet")
    same = evalops.ks_drift(str(tmp_path)).iloc[0]
    assert same["ks_bp"] == 0 and same["at_value"] == 10


def test_itemsets3_planted_triples(tmp_path):
    # orders 1..3 share basket {10,20,30}; order 4 adds a non-repeating one
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4], pa.int64()),
        "l_partkey": pa.array([10, 20, 30, 10, 20, 30, 10, 20, 30,
                               40, 50, 60], pa.int64()),
    }), tmp_path / "lineitem.parquet")
    from research_knowledge_graph_ray.stages.graphalgs import itemsets3
    got = itemsets3(str(tmp_path)).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert (row["p1"], row["p2"], row["p3"], row["support"]) == (10, 20, 30, 3)


def test_itemsets3_downward_closure(sf_dir):
    from research_knowledge_graph_ray.stages.graphalgs import (
        _basket_pair_stats, itemsets3)
    got = itemsets3(sf_dir).to_pandas()
    assert (got["p1"] < got["p2"]).all() and (got["p2"] < got["p3"]).all()
    assert (got["support"] >= 2).all()
    co = _basket_pair_stats(sf_dir)[0].to_pandas()
    freq = {(a, b) for a, b, c in zip(co["pa"], co["pb"], co["co"]) if c >= 2}
    for _, r in got.iterrows():
        assert (r["p1"], r["p2"]) in freq
        assert (r["p1"], r["p3"]) in freq
        assert (r["p2"], r["p3"]) in freq


def test_knn_density_matches_join_rank_k(sf_dir):
    from research_knowledge_graph_ray.stages.similarity import (
        _KNN_DENSITY_TAU_E6, knn_density, knn_join)
    got = knn_density(sf_dir).to_pandas().sort_values("vec_id")
    base = knn_join(sf_dir, k=3).to_pandas()
    kth = (base[base["nn_rank"] == 3].set_index("vec_id")["sim_e6"]
           .sort_index())
    assert got["vec_id"].is_unique
    assert (got.set_index("vec_id")["kth_sim_e6"] == kth).all()
    assert (got["is_outlier"]
            == (got["kth_sim_e6"] < _KNN_DENSITY_TAU_E6).astype(int)).all()
    assert 0 < got["is_outlier"].sum() < len(got)  # threshold binds


def test_novelty_curve_planted_duplicate(tmp_path):
    from research_knowledge_graph_ray.stages.textops import novelty_curve
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": ["alpha beta gamma", "alpha beta gamma", "delta epsilon"],
    }), tmp_path / "documents.parquet")
    got = (novelty_curve(str(tmp_path)).to_pandas()
           .set_index("doc_id").sort_index())
    # doc 0 introduces everything; its verbatim copy introduces nothing
    assert got.loc[0, "novelty_bp"] == 10000
    assert got.loc[1, "n_novel"] == 0 and got.loc[1, "novelty_bp"] == 0
    assert got.loc[2, "novelty_bp"] == 10000


def test_novelty_curve_bounds(sf_dir):
    from research_knowledge_graph_ray.stages.textops import novelty_curve
    got = novelty_curve(sf_dir).to_pandas()
    assert (got["n_novel"] <= got["n_grams"]).all()
    assert got["novelty_bp"].between(0, 10000).all()
    # the earliest doc with a bigram is all-novel by construction
    first = got.sort_values("doc_id").iloc[0]
    assert first["novelty_bp"] == 10000


def test_bootstrap_ci_deterministic_weights(sf_dir, tmp_path):
    import hashlib

    from research_knowledge_graph_ray.stages import stats as st
    got = st.bootstrap_ci(sf_dir)
    assert len(got) == st._BOOT_REPS
    again = st.bootstrap_ci(sf_dir)
    assert got.equals(again)
    assert (got["mean_e6"] > 0).all()
    # planted single order: weight equals the integer inverse CDF of its hash
    pq.write_table(pa.table({
        "o_orderkey": pa.array([7], pa.int64()),
        "o_totalprice": pa.array([10.0]),
    }), tmp_path / "orders.parquet")
    one = st.bootstrap_ci(str(tmp_path), n_reps=4).set_index("replicate")
    thresh = np.asarray(st._BOOT_THRESH)
    for r in range(4):
        u = int.from_bytes(hashlib.md5(f"7|{r}".encode()).digest()[:4], "big")
        w = int(np.searchsorted(thresh, u, side="right"))
        assert one.loc[r, "n"] == w
        assert one.loc[r, "sum_cents"] == w * 1000


def test_dedup_ensemble_invariants(sf_dir):
    from research_knowledge_graph_ray.stages.dedup import dedup_ensemble
    row = dedup_ensemble(sf_dir).iloc[0]
    assert row["n_pairs_union"] >= max(row["n_pairs_exact"],
                                       row["n_pairs_minhash"],
                                       row["n_pairs_simhash"])
    assert row["n_pairs_union"] <= (row["n_pairs_exact"]
                                    + row["n_pairs_minhash"]
                                    + row["n_pairs_simhash"])
    if row["n_clusters"]:
        assert row["n_docs_linked"] >= 2 * row["n_clusters"]
        assert 2 <= row["max_cluster"] <= row["n_docs_linked"]


def test_dedup_ensemble_planted_triplet(tmp_path):
    from research_knowledge_graph_ray.stages.dedup import dedup_ensemble
    text = " ".join(["alpha beta gamma delta"] * 10)
    other = " ".join(["zeta eta theta iota"] * 10)
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": [text, text, text, other],
    }), tmp_path / "documents.parquet")
    row = dedup_ensemble(str(tmp_path)).iloc[0]
    assert row["n_pairs_exact"] == 2        # star: 0-1, 0-2
    assert row["n_clusters"] == 1
    assert row["max_cluster"] == 3 and row["n_docs_linked"] == 3


def test_regression_by_group_partition_and_degenerate(sf_dir, tmp_path):
    from research_knowledge_graph_ray.stages.stats import (
        _round_e9, regression_by_group)
    got = regression_by_group(sf_dir)
    n_li = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
    assert int(got["n"].sum()) == n_li
    assert got["group"].is_unique
    assert got["corr_e9"].abs().le(1_000_000_000).all()
    # degenerate group (one row): corr = slope = 0, intercept = mean cents
    pq.write_table(pa.table({
        "l_returnflag": ["X"],
        "l_quantity": pa.array([5.0]),
        "l_extendedprice": pa.array([12.34]),
    }), tmp_path / "lineitem.parquet")
    one = regression_by_group(str(tmp_path)).iloc[0]
    assert one["corr_e9"] == 0 and one["slope_e9"] == 0
    assert one["intercept_e9"] == _round_e9(1234.0)


def test_mixing_plan_accounting(sf_dir):
    from research_knowledge_graph_ray.stages.sampling import mixing_plan
    got = mixing_plan(sf_dir)
    total = int(got["tokens"].sum())
    assert int(got["required_tokens"].sum()) <= total  # floor division
    assert (got["weight"] ** 2 <= got["tokens"]).all()
    assert ((got["weight"] + 1) ** 2 > got["tokens"]).all()
    assert (got["upsampled"] == (got["epochs_e6"] > 1_000_000)
            .astype(int)).all()
    # temperature flattening: the smallest source is upsampled relative to
    # the largest (epochs ordering is inverse to size ordering)
    smallest = got.loc[got["tokens"].idxmin()]
    largest = got.loc[got["tokens"].idxmax()]
    assert smallest["epochs_e6"] >= largest["epochs_e6"]


def test_knn_shapley_efficiency_axiom(tmp_path):
    # 1 test point (id 0), 4 train points; d=2 unit-ish vectors.
    # Efficiency: sum of Shapley values == utility of the full training set
    # == (1/K) * (matching labels among the K nearest).
    from research_knowledge_graph_ray.stages.similarity import knn_shapley
    vecs = [[1.0, 0.0], [1.0, 0.1], [0.9, 0.2], [0.0, 1.0], [-1.0, 0.5]]
    labs = [7, 7, 3, 7, 3]   # test label 7
    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float64())),
        "label": pa.array(labs, pa.int64()),
    }), tmp_path / "embeddings.parquet")
    got = knn_shapley(str(tmp_path), k=3, test_mod=5).to_pandas()
    assert len(got) == 4 and got["test_id"].eq(0).all()
    # nearest 3 by cosine: ids 1 (lab 7), 2 (lab 3), 3 (lab 7) -> utility 2/3
    total = got["shapley_e9"].sum()
    assert abs(total - round(2 / 3 * 1e9)) <= 4  # per-row e9 rounding slack
    # symmetry/null: the farthest non-matching point contributes least
    worst = got.sort_values("rnk").iloc[-1]
    assert worst["shapley_e9"] <= got["shapley_e9"].max()


def test_knn_shapley_rank_coverage(sf_dir):
    from research_knowledge_graph_ray.stages.similarity import (
        _SHAP_TEST_MOD, knn_shapley)
    got = knn_shapley(sf_dir).to_pandas()
    n_emb = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    n_test = len([i for i in range(n_emb) if i % _SHAP_TEST_MOD == 0])
    n_train = n_emb - n_test
    assert len(got) == n_test * n_train
    # every test point ranks the full training set exactly once
    per = got.groupby("test_id")["rnk"].agg(["min", "max", "size"])
    assert (per["min"] == 1).all() and (per["max"] == n_train).all()
    assert (per["size"] == n_train).all()
    assert not got.duplicated(["test_id", "train_id"]).any()


def test_stylometry_delta_metric_properties(sf_dir):
    from research_knowledge_graph_ray.stages.evalops import stylometry_delta
    got = stylometry_delta(sf_dir)
    n_src = got[["src_a", "src_b"]].stack().nunique()
    assert len(got) == n_src * (n_src - 1) // 2   # every unordered pair once
    assert (got["src_a"] < got["src_b"]).all()
    assert (got["delta"] >= 0).all()


def test_stylometry_delta_identical_sources(tmp_path):
    from research_knowledge_graph_ray.stages.evalops import stylometry_delta
    # two sources with identical token distributions -> delta 0 between
    # them; a third, different source sits at positive distance
    docs = {"doc_id": [], "text": [], "source": []}
    for i, (src, text) in enumerate(
            [("a", "x y z w"), ("b", "x y z w"),
             ("c", "q q q q")] * 3):
        docs["doc_id"].append(i)
        docs["text"].append(text)
        docs["source"].append(src)
    pq.write_table(pa.table({
        "doc_id": pa.array(docs["doc_id"], pa.int64()),
        "text": docs["text"], "source": docs["source"],
    }), tmp_path / "documents.parquet")
    got = stylometry_delta(str(tmp_path)).set_index(["src_a", "src_b"])
    assert got.loc[("a", "b"), "delta"] == 0
    assert got.loc[("a", "c"), "delta"] > 0
    assert got.loc[("a", "c"), "delta"] == got.loc[("b", "c"), "delta"]


def test_group_dro_weights_monotone_in_loss(sf_dir):
    from research_knowledge_graph_ray.stages.evalops import group_dro_weights
    got = group_dro_weights(sf_dir)
    assert (got["dro_w_e9"] >= 1_000_000_000).all()   # exp(x>=0) >= 1
    s = got.sort_values("mean_loss_e6")
    assert s["dro_w_e9"].is_monotonic_increasing
    assert (got["mean_loss_e6"]
            == got["sum_loss"] * 1_000_000 // got["n_docs"]).all()


def test_nb_margin_topk_is_global_minimum(sf_dir):
    from research_knowledge_graph_ray.stages.textops import nb_margin_topk
    got = nb_margin_topk(sf_dir, k=10)
    assert len(got) == 10
    assert (got["margin_e9"] >= 0).all()
    assert got["margin_e9"].is_monotonic_increasing
    # the cut is global: a larger k contains the smaller k's set
    bigger = nb_margin_topk(sf_dir, k=25)
    assert set(got["doc_id"]) <= set(bigger["doc_id"])


def test_conformal_threshold_guarantee_shape(sf_dir):
    from research_knowledge_graph_ray.stages.evalops import (
        _CONF_CAL_MOD, conformal_threshold)
    row = conformal_threshold(sf_dir).iloc[0]
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    n_cal = len([i for i in range(n_docs) if i % _CONF_CAL_MOD == 0])
    assert row["n_cal"] == n_cal and row["n_eval"] == n_docs - n_cal
    assert 1 <= row["q_rank"] <= row["n_cal"]
    assert 0 <= row["coverage_bp"] <= 10000
    # tighter alpha -> larger rank -> weakly larger threshold & coverage
    strict = conformal_threshold(sf_dir, alpha_bp=100).iloc[0]
    assert strict["q_rank"] >= row["q_rank"]
    assert strict["threshold"] >= row["threshold"]
    assert strict["coverage_bp"] >= row["coverage_bp"]


def test_nb_confusion_consistent_with_classify(sf_dir):
    from research_knowledge_graph_ray.stages.textops import (
        nb_classify, nb_confusion)
    conf = nb_confusion(sf_dir)
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    assert int(conf["n_docs"].sum()) == n_docs
    # diagonal mass equals nb_classify's correct count
    diag = int(conf[conf["source"] == conf["pred_source"]]["n_docs"].sum())
    cls = nb_classify(sf_dir)
    assert diag == int(cls["correct"].sum())


def test_length_percentiles_ordering(sf_dir):
    from research_knowledge_graph_ray.stages.evalops import length_percentiles
    got = length_percentiles(sf_dir)
    assert (got["p50"] <= got["p90"]).all() and (got["p90"] <= got["p99"]).all()
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    assert int(got["n_docs"].sum()) == n_docs


def test_dup_rate_by_batch_planted(tmp_path):
    from research_knowledge_graph_ray.stages.evalops import dup_rate_by_batch
    # batch 0: originals; batch 1: all copies of batch 0
    texts = [f"unique text number {i}" for i in range(4)]
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(8)), pa.int64()),
        "text": texts + texts,
    }), tmp_path / "documents.parquet")
    got = dup_rate_by_batch(str(tmp_path), batch=4).set_index("batch")
    assert got.loc[0, "n_dup"] == 0 and got.loc[0, "dup_bp"] == 0
    assert got.loc[1, "n_dup"] == 4 and got.loc[1, "dup_bp"] == 10000


def test_graph_diameter_two_sweep_improves(sf_dir):
    from research_knowledge_graph_ray.stages.graphalgs import graph_diameter
    row = graph_diameter(sf_dir).iloc[0]
    # the 2-sweep invariant: ecc from the far endpoint >= first ecc
    assert row["ecc_b"] >= row["ecc_a"] > 0
    assert row["src_a"] != row["src_b"]
    assert row["n_reached"] > 1


def test_graph_robustness_fragmentation_bounds(sf_dir):
    from research_knowledge_graph_ray.stages.graphalgs import (
        graph_robustness, _sp_weighted_edges, _symmetrize)
    row = graph_robustness(sf_dir).iloc[0]
    assert row["n_removed"] == 5
    assert row["largest_cc"] <= row["n_nodes"]
    assert row["n_components"] >= 1
    # removing hubs strictly shrinks the edge set
    sym = _symmetrize(_sp_weighted_edges(sf_dir))
    total_undirected = sym.count() // 2
    assert row["n_edges"] < total_undirected


def test_shuffle_quality_identity_and_decorrelation(sf_dir):
    from research_knowledge_graph_ray.stages.sampling import shuffle_quality
    same = shuffle_quality(sf_dir, seed_a=7, seed_b=7).iloc[0]
    assert same["rho_e9"] == 1_000_000_000   # identical permutation
    diff = shuffle_quality(sf_dir).iloc[0]
    assert abs(diff["rho_e9"]) < 200_000_000  # epochs decorrelate
    assert diff["n"] == pq.read_metadata(
        f"{sf_dir}/documents.parquet").num_rows


def test_events_seasonality_partition(sf_dir):
    from research_knowledge_graph_ray.pipelines.windows import (
        events_seasonality)
    got = events_seasonality(sf_dir)
    n_ev = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    assert int(got["n_events"].sum()) == n_ev
    assert got["dow"].between(1, 7).all()
    assert 9990 <= int(got["share_bp"].sum()) <= 10000  # floor rounding


def test_pair_betweenness_exact_path_algebra(tmp_path):
    # diamond graph: 1 - {10,11} - 2 plus a longer detour 1-12-13-2
    # shortest 1->2 distance 2 via two parallel middles, sigma_st = 2
    from research_knowledge_graph_ray.stages.graphalgs import (
        _PART_OFFSET, pair_betweenness)
    # encode edges via lineitem rows (suppkey-part edges, weight=min qty<=5)
    rows = [(1, 10, 1.0), (2, 10, 1.0), (1, 11, 1.0), (2, 11, 1.0),
            (1, 12, 1.0), (3, 12, 1.0), (3, 13, 1.0), (2, 13, 1.0)]
    pq.write_table(pa.table({
        "l_suppkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_quantity": pa.array([r[2] for r in rows]),
    }), tmp_path / "lineitem.parquet")
    got = pair_betweenness(str(tmp_path), src=1, dst=2)
    assert (got["sigma_st"] == 2).all()
    mids = dict(zip(got["node"], got["sigma_prod"]))
    assert mids[10 + _PART_OFFSET] == 1 and mids[11 + _PART_OFFSET] == 1
    # detour nodes (distance 2+2 > 2) are not on any shortest path
    assert (12 + _PART_OFFSET) not in mids and 3 not in mids
    assert (got["share_e9"] == 500_000_000).all()


def test_pair_betweenness_share_bounds(sf_dir):
    from research_knowledge_graph_ray.stages.graphalgs import pair_betweenness
    got = pair_betweenness(sf_dir)
    if len(got):
        assert (got["sigma_prod"] >= 1).all()
        assert (got["sigma_prod"] <= got["sigma_st"]).all()
        assert got["share_e9"].between(0, 1_000_000_000).all()


def test_graph_closeness_identity(sf_dir):
    from research_knowledge_graph_ray.stages.graphalgs import (
        _sp_weighted_edges, _symmetrize, graph_closeness, sssp_ds)
    got = graph_closeness(sf_dir).set_index("seed")
    # each seed's row must reproduce an independent SSSP run's aggregates
    sym = _symmetrize(_sp_weighted_edges(sf_dir)).materialize()
    for seed in got.index:
        d = sssp_ds(sym, int(seed)).to_pandas()
        assert got.loc[seed, "n_reached"] == len(d)
        assert got.loc[seed, "sum_dist"] == int(d["d"].sum())
        assert got.loc[seed, "closeness_e9"] == (
            (len(d) - 1) * 1_000_000_000 // int(d["d"].sum()))
    assert (got["closeness_e9"] > 0).all()
    assert (got["sum_dist"] > got["n_reached"] - 1).all()  # weights >= 1


def test_graph_hop_histogram_shell_algebra(sf_dir):
    from research_knowledge_graph_ray.stages.graphalgs import (
        graph_hop_histogram)
    got = graph_hop_histogram(sf_dir)
    assert got.iloc[0]["d"] == 0 and got.iloc[0]["n_nodes"] == 1
    assert got.iloc[0]["sum_sigma"] == 1
    assert got["d"].is_monotonic_increasing
    # path counts per shell grow at least as fast as node counts
    assert (got["sum_sigma"] >= got["n_nodes"]).all()


def test_mask_corruption_pairs_deterministic_and_rate(sf_dir):
    from research_knowledge_graph_ray.stages.sampling import (
        mask_corruption_pairs)
    a = mask_corruption_pairs(sf_dir).to_pandas().sort_values("doc_id")
    b = mask_corruption_pairs(sf_dir).to_pandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    assert (a["n_masked"] <= a["n_tokens"]).all()
    # empirical mask rate within a loose band of the 15% target
    rate = a["n_masked"].sum() / a["n_tokens"].sum()
    assert 0.10 < rate < 0.20
    # a different seed produces different masks somewhere
    c = mask_corruption_pairs(sf_dir, seed=12).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert not c["visible_fp"].equals(a.reset_index(drop=True)["visible_fp"])


def test_negative_sampling_table_smoothing(sf_dir):
    from research_knowledge_graph_ray.stages.textops import (
        negative_sampling_table)
    got = negative_sampling_table(sf_dir)
    assert got["cnt"].is_monotonic_decreasing
    # ^0.75 smoothing compresses the range: weight ratios < count ratios
    hi, lo = got.iloc[0], got.iloc[-1]
    if lo["cnt"] < hi["cnt"]:
        assert (hi["weight_e6"] / lo["weight_e6"]
                < hi["cnt"] / lo["cnt"])


def test_token_spectrum_mass_identity(sf_dir):
    from research_knowledge_graph_ray.stages.textops import token_spectrum
    got = token_spectrum(sf_dir)
    assert (got["m_k"] >= 1).all() and (got["k"] >= 1).all()
    # sum k*m_k == total token instances; shares nearly partition 10000
    assert 9900 <= int(got["mass_bp"].sum()) <= 10000


def test_ktruss_adaptive_path_matches_distributed(sf_dir):
    from research_knowledge_graph_ray.stages import graphalgs as g
    drv = (g.ktruss(sf_dir).to_pandas()
           .sort_values(["ta", "tb"]).reset_index(drop=True))
    cap = g._TRUSS_DRIVER_CAP
    g._TRUSS_DRIVER_CAP = -1
    try:
        dist = (g.ktruss(sf_dir).to_pandas()
                .sort_values(["ta", "tb"]).reset_index(drop=True))
    finally:
        g._TRUSS_DRIVER_CAP = cap
    pd.testing.assert_frame_equal(drv, dist)


def test_events_dup_audit_planted(tmp_path):
    from research_knowledge_graph_ray.pipelines.windows import (
        events_dup_audit)
    ts = pd.to_datetime(["2026-01-01 00:00:00", "2026-01-01 00:10:00",
                         "2026-01-05 00:00:00", "2026-01-01 00:00:00"])
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "event_type": ["click", "click", "click", "click"],
        "props": ["p", "p", "p", "p"],
        "ts": pa.array(ts, pa.timestamp("us")),
    }), tmp_path / "events.parquet")
    got = events_dup_audit(str(tmp_path), window_s=3600).iloc[0]
    # the 10-minute repeat is a dup; the 4-days-later one is not; user 2
    # has no prior delivery
    assert got["n_events"] == 4 and got["n_dups"] == 1


def test_embedding_mean_drift_shapes(sf_dir):
    from research_knowledge_graph_ray.stages.stats import embedding_mean_drift
    got = embedding_mean_drift(sf_dir)
    assert got["dim"].is_monotonic_increasing and got["dim"].iloc[0] == 0
    n = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    assert (got["n_a"] + got["n_b"] == n).all()
    # the translation keeps sums positive; deltas stay small vs the offset
    assert (got["sum_a_q"] > 0).all() and (got["sum_b_q"] > 0).all()


def test_permutation_test_null_and_signal(tmp_path):
    from research_knowledge_graph_ray.stages.stats import permutation_test
    # identical distributions: observed diff 0 -> every replicate extreme
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(8)), pa.int64()),
        "source": ["src0", "src1"] * 4,
        "n_chars": pa.array([100, 100, 200, 200, 300, 300, 400, 400],
                            pa.int64()),
    }), tmp_path / "documents.parquet")
    null = permutation_test(str(tmp_path)).iloc[0]
    assert null["obs_diff_num"] == 0 and null["p_bp"] == 10000
    # strong signal: disjoint ranges -> few replicates as extreme
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(20)), pa.int64()),
        "source": ["src0"] * 10 + ["src1"] * 10,
        "n_chars": pa.array([10] * 10 + [10_000] * 10, pa.int64()),
    }), tmp_path / "documents.parquet")
    sig = permutation_test(str(tmp_path)).iloc[0]
    assert sig["obs_diff_num"] > 0
    assert sig["p_bp"] < 2000


def test_containment_pairs_quote_inclusion(tmp_path):
    # doc 1 is a verbatim excerpt of doc 0: containment(1 in 0) == 100%
    # while Jaccard stays low — the case this op exists for
    from research_knowledge_graph_ray.stages.dedup import containment_pairs
    long = " ".join(f"w{i}" for i in range(60))
    short = " ".join(f"w{i}" for i in range(10))     # prefix excerpt
    other = " ".join(f"z{i}" for i in range(30))
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": [long, short, other],
    }), tmp_path / "documents.parquet")
    got = containment_pairs(str(tmp_path)).to_pandas()
    row = got[(got["doc_a"] == 0) & (got["doc_b"] == 1)].iloc[0]
    assert row["cont_ba_bp"] == 10000          # the excerpt is fully inside
    assert row["cont_ab_bp"] < 2000            # the long doc is not
    assert not ((got["doc_a"] == 0) & (got["doc_b"] == 2)).any()


def test_quality_percentile_rank_properties(sf_dir):
    from research_knowledge_graph_ray.stages.evalops import quality_percentile
    got = quality_percentile(sf_dir).to_pandas()
    assert len(got) == _n_docs(sf_dir)
    assert got["pct_bp"].between(0, 9999).all()
    # rank transform is monotone in the score
    s = got.sort_values(["logit", "doc_id"])
    assert s["pct_bp"].is_monotonic_increasing
    # the minimum-score docs sit at percentile 0
    assert got.loc[got["logit"].idxmin(), "pct_bp"] == 0


def test_related_terms_serving_shape(sf_dir):
    from research_knowledge_graph_ray.pipelines.kgflat import related_terms
    got = related_terms(sf_dir).to_pandas()
    per = got.groupby("term")
    assert (per["rnk"].min() == 1).all()
    assert (per["rnk"].max() <= 5).all()
    # ranking is by count desc within each term
    for _, sub in per:
        s = sub.sort_values("rnk")
        assert s["n_docs"].is_monotonic_decreasing or len(s) == 1
    assert not got.duplicated(["term", "related"]).any()


def test_rich_club_monotone_sets(sf_dir):
    from research_knowledge_graph_ray.stages.graphalgs import rich_club
    got = rich_club(sf_dir).sort_values("k")
    # larger threshold -> smaller (or equal) rich set and edge count
    assert got["n_rich"].is_monotonic_decreasing
    assert got["e_rich"].is_monotonic_decreasing
    assert got["phi_bp"].between(-1, 10000).all()


def test_revenue_concentration_pareto_bounds(sf_dir):
    from research_knowledge_graph_ray.stages.stats import (
        revenue_concentration)
    row = revenue_concentration(sf_dir).iloc[0]
    # P90 cut keeps ~10% of customers (ties can push it slightly over)
    assert row["n_top"] >= row["n_customers"] // 10
    assert row["n_top"] <= row["n_customers"] // 5
    assert row["top_revenue_cents"] <= row["total_revenue_cents"]
    # top decile must hold at least its proportional share
    assert row["share_bp"] >= 1000


def test_revenue_gini_bounds_and_extremes(sf_dir, tmp_path):
    from research_knowledge_graph_ray.stages.stats import revenue_gini
    row = revenue_gini(sf_dir).iloc[0]
    assert 0 <= row["gini_e9"] < 1_000_000_000
    # perfectly equal revenues -> Gini exactly (n-1)/n - ... == 0? For
    # equal x: 2*srx = (n+1)*sx exactly -> gini 0
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_totalprice": pa.array([10.0, 10.0, 10.0, 10.0]),
    }), tmp_path / "orders.parquet")
    eq = revenue_gini(str(tmp_path)).iloc[0]
    assert eq["gini_e9"] == 0
    # one customer holding everything -> Gini -> (n-1)/n
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_totalprice": pa.array([0.0, 0.0, 0.0, 100.0]),
    }), tmp_path / "orders.parquet")
    one = revenue_gini(str(tmp_path)).iloc[0]
    assert one["gini_e9"] == 750_000_000  # (n-1)/n with n=4


def test_token_snippets_window_semantics(sf_dir):
    from research_knowledge_graph_ray.stages.textops import (
        _KWIC_PAD, token_snippets)
    got = token_snippets(sf_dir)
    assert got.groupby("token").size().le(3).all()
    for _, r in got.iterrows():
        # the snippet window contains the token at the right offset
        assert r["token"] in r["snippet"].lower()
        assert len(r["snippet"]) <= 2 * _KWIC_PAD + len(r["token"])
    # per token, the smallest doc_ids win
    for _, sub in got.groupby("token"):
        assert sub["doc_id"].is_monotonic_increasing or len(sub) == 1


def test_theil_terms_sum_nonnegative(sf_dir):
    from research_knowledge_graph_ray.stages.stats import theil_terms
    got = theil_terms(sf_dir).to_pandas()
    # Theil index (sum of terms) is >= 0 by Jensen; equality iff uniform
    assert int(got["term_e9"].sum()) >= 0
    # share-weighted log terms: the largest earner has a positive term
    assert got.loc[got["cents"].idxmax(), "term_e9"] > 0
