"""Benchmark harness. Prints ONE final JSON line:

  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N, ...}

Headline: full knowledge-graph construction (extraction → validation → entity
linking → canonicalization → cross-doc linking → node/edge materialization)
over a deterministic synthetic interleaved-span corpus (GRAFT_KG_DOCS docs,
default 50000; generated in parallel once and cached in /tmp), plus a
representative query suite over $GRAFT_SF_DIR (default /root/testdata/sf0.1).

Crash isolation (round-4): the orchestrating parent process NEVER starts Ray.
The headline and each ~11-query suite chunk run in their own subprocess with
their own Ray session, so a raylet death (this host's co-tenancy killed three
consecutive round-3 driver runs at the C++ level) costs one section, not the
artifact. Failed sections are retried with reduced memory pressure
(staggered consumers / smaller object store), partial snapshots are printed
as each section completes (lines tagged "partial": true), and the complete
merged result is the LAST line.

``--scaling`` runs the headline twice in fresh processes at num_cpus=8 and
num_cpus=32 on identical input and reports throughput scaling efficiency
(sandbox stand-in for the N vs 4N node criterion — see BASELINE.md).
"""

from __future__ import annotations

import importlib
import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
KG_DOCS = int(os.environ.get("GRAFT_KG_DOCS", "50000"))
CORPUS_DIR = f"/tmp/rkg_bench_corpus_{KG_DOCS}"
_REPO = os.path.dirname(os.path.abspath(__file__))

# ---------------------------------------------------------------------------
# query suite (name -> "module.function"), in the order benched since r2 so
# per-round timings stay comparable
# ---------------------------------------------------------------------------
_MODS = {
    "kgflat": "research_knowledge_graph_ray.pipelines.kgflat",
    "link": "research_knowledge_graph_ray.stages.link",
    "relational": "research_knowledge_graph_ray.pipelines.relational",
    "windows": "research_knowledge_graph_ray.pipelines.windows",
    "curate": "research_knowledge_graph_ray.pipelines.curate",
    "dedup": "research_knowledge_graph_ray.stages.dedup",
    "similarity": "research_knowledge_graph_ray.stages.similarity",
    "textops": "research_knowledge_graph_ray.stages.textops",
    "graphalgs": "research_knowledge_graph_ray.stages.graphalgs",
    "stats": "research_knowledge_graph_ray.stages.stats",
    "sampling": "research_knowledge_graph_ray.stages.sampling",
    "evalops": "research_knowledge_graph_ray.stages.evalops",
}

SUITE: list[tuple[str, str]] = [
    ("kg_graph_edges", "kgflat.graph_edges"),
    ("kg_cooccurrence", "kgflat.cooccurrence"),
    ("kg_media_edges", "kgflat.media_edges"),
    ("q1_pricing_summary", "relational.q1_pricing_summary"),
    ("revenue_by_nation", "relational.revenue_by_nation"),
    ("top10_orders", "relational.top10_orders"),
    ("text_quality", "textops.text_quality"),
    ("dedup_minhash_pairs", "dedup.minhash_candidate_pairs"),
    ("dedup_embedding_pairs", "dedup.embedding_near_dups_q"),
    ("knn_topk", "similarity.knn_topk"),
    ("graph_pagerank", "graphalgs.pagerank"),
    ("price_quantiles", "stats.price_quantiles"),
    ("purchase_attribution", "windows.purchase_attribution"),
    ("decontaminate", "textops.decontaminate"),
    ("decontaminate_bloom", "textops.decontaminate_bloom"),
    ("doc_logprob", "textops.doc_logprob"),
    ("item_jaccard", "graphalgs.item_jaccard"),
    ("nation_year_revenue", "windows.nation_year_revenue"),
    ("price_qty_regression", "stats.price_qty_regression"),
    ("char_diversity", "textops.char_diversity"),
    ("doc_logprob_bigram", "textops.doc_logprob_bigram"),
    ("knn_join", "similarity.knn_join"),
    ("rolling_active_users", "windows.rolling_active_users"),
    ("event_transitions", "windows.event_transitions"),
    ("graph_sssp", "graphalgs.sssp"),
    ("dedup_keep_best", "dedup.keep_best_dedup"),
    ("assoc_rules", "graphalgs.assoc_rules"),
    ("skyline_orders", "stats.skyline_orders"),
    ("late_events", "windows.late_events"),
    ("term_search", "kgflat.term_search"),
    ("watermark_drops", "windows.watermark_drops"),
    ("hybrid_search", "kgflat.hybrid_search"),
    ("orders_box_probe", "relational.orders_box_probe"),
    ("revenue_rollup", "relational.revenue_rollup"),
    ("linear_attribution", "windows.linear_attribution"),
    ("q3_shipping_priority", "relational.q3_shipping_priority"),
    ("q4_order_priority", "relational.q4_order_priority"),
    ("passage_dedup", "dedup.passage_dedup"),
    ("substring_dedup", "dedup.substring_dedup"),
    ("dup_passage_share", "dedup.dup_passage_share"),
    ("source_overlap", "dedup.source_overlap"),
    ("dsir_weights", "textops.dsir_weights"),
    ("dsir_resample", "textops.dsir_resample"),
    ("kg_entity_trend", "kgflat.entity_trend"),
    ("epoch_shuffle", "sampling.epoch_shuffle"),
    ("shard_plan", "sampling.shard_plan"),
    ("cheapest_supplier", "relational.cheapest_supplier_per_part"),
    ("vocab_sharing", "textops.vocab_sharing"),
    ("graph_hits", "graphalgs.hits"),
    ("gopher_filter", "textops.gopher_filter"),
    ("embedding_moments", "stats.embedding_moments"),
    ("embedding_kmeans", "similarity.embedding_kmeans"),
    ("bpe_merge_counts", "textops.bpe_merge_counts"),
    ("top_tokens_cms", "textops.top_tokens_cms"),
    ("graph_walks", "graphalgs.graph_walks"),
    ("mmr_rerank", "similarity.mmr_rerank"),
    ("semdedup", "dedup.semdedup"),
    ("bm25_search", "kgflat.bm25_search"),
    ("neighbor_sample", "graphalgs.neighbor_sample"),
    ("embedding_quantize", "similarity.embedding_quantize"),
    ("dedup_incremental", "dedup.dedup_incremental"),
    ("minhash_confusion", "dedup.minhash_confusion"),
    ("reciprocal_nn", "similarity.reciprocal_nn_pairs"),
    ("dataset_split", "sampling.dataset_split"),
    ("price_quantile_sketch", "stats.price_quantile_sketch"),
    ("semantic_link_pairs", "link.semantic_link_pairs"),
    ("repetition_filter", "textops.repetition_filter"),
    ("graph_label_prop", "graphalgs.label_propagation"),
    ("pq_codes", "similarity.pq_codes"),
    ("pq_search", "similarity.pq_search"),
    ("q5_local_supplier_volume", "relational.q5_local_supplier_volume"),
    ("q6_forecast_revenue", "relational.q6_forecast_revenue"),
    ("random_projection", "similarity.random_projection"),
    ("knn_classify", "similarity.knn_classify"),
    ("events_hopping", "windows.events_hopping"),
    ("q7_volume_shipping", "relational.q7_volume_shipping"),
    ("cluster_silhouette", "similarity.cluster_silhouette"),
    ("graph_ktruss", "graphalgs.ktruss"),
    ("cluster_prototypes", "similarity.cluster_prototypes"),
    ("hard_negatives", "similarity.hard_negatives"),
    ("orders_no_returns", "relational.orders_no_returns"),
    ("psi_drift", "stats.psi_drift"),
    ("trimmed_stats", "stats.trimmed_stats"),
    ("oov_rate", "textops.oov_rate"),
    ("source_js", "textops.source_js_divergence"),
    ("kcenter_select", "similarity.kcenter_select"),
    ("q10_returned_items", "relational.q10_returned_items"),
    ("q14_promo_revenue", "relational.q14_promo_revenue"),
    ("dedup_rate_by_source", "dedup.dedup_rate_by_source"),
    ("label_balance", "stats.label_balance"),
    ("embedding_standardize", "stats.embedding_standardize"),
    ("dedup_cluster_histogram", "dedup.dedup_cluster_histogram"),
    ("event_type_islands", "windows.event_type_islands"),
    ("q17_small_qty_revenue", "relational.q17_small_qty_revenue"),
    ("q18_large_orders", "relational.q18_large_orders"),
    ("q21_blame_supplier", "relational.q21_blame_supplier"),
    ("q22_idle_rich", "relational.q22_idle_rich_customers"),
    ("link_prediction", "graphalgs.link_prediction"),
    ("graph_assortativity", "graphalgs.degree_assortativity"),
    ("zipf_fit", "textops.zipf_fit"),
    ("q9_product_profit", "relational.q9_product_profit"),
    ("q8_market_share", "relational.q8_market_share"),
    ("q13_customer_distribution", "relational.q13_customer_distribution"),
    ("q15_top_supplier", "relational.q15_top_supplier"),
    ("q19_disjunctive_revenue", "relational.q19_disjunctive_revenue"),
    ("q2_min_cost_supplier", "relational.q2_min_cost_supplier"),
    ("q16_supplier_part_counts", "relational.q16_supplier_part_counts"),
    ("q20_dominant_suppliers", "relational.q20_dominant_suppliers"),
    ("q12_priority_lines", "relational.q12_priority_lines"),
    ("q11_important_stock", "relational.q11_important_stock"),
    ("semantic_decontaminate", "dedup.semantic_decontaminate"),
    ("nb_classify", "textops.nb_classify"),
    ("token_label_mi", "textops.token_label_mi"),
    ("classifier_kappa", "evalops.classifier_kappa"),
    ("calibration_bins", "evalops.calibration_bins"),
    ("quality_ensemble", "evalops.quality_ensemble"),
    ("ngram_diversity", "evalops.ngram_diversity"),
    ("padding_waste", "evalops.padding_waste"),
    ("ks_drift", "evalops.ks_drift"),
    ("emd_drift", "evalops.emd_drift"),
    ("itemsets3", "graphalgs.itemsets3"),
    ("knn_density", "similarity.knn_density"),
    ("novelty_curve", "textops.novelty_curve"),
    ("bootstrap_ci", "stats.bootstrap_ci"),
    ("dedup_ensemble", "dedup.dedup_ensemble"),
    ("regression_by_group", "stats.regression_by_group"),
    ("mixing_plan", "sampling.mixing_plan"),
    ("knn_shapley", "similarity.knn_shapley"),
    ("stylometry_delta", "evalops.stylometry_delta"),
    ("group_dro_weights", "evalops.group_dro_weights"),
    ("nb_margin_topk", "textops.nb_margin_topk"),
    ("conformal_threshold", "evalops.conformal_threshold"),
    ("nb_confusion", "textops.nb_confusion"),
    ("length_percentiles", "evalops.length_percentiles"),
    ("dup_rate_by_batch", "evalops.dup_rate_by_batch"),
    ("graph_diameter", "graphalgs.graph_diameter"),
    ("graph_robustness", "graphalgs.graph_robustness"),
    ("shuffle_quality", "sampling.shuffle_quality"),
    ("events_seasonality", "windows.events_seasonality"),
    ("pair_betweenness", "graphalgs.pair_betweenness"),
    ("graph_closeness", "graphalgs.graph_closeness"),
    ("graph_hop_histogram", "graphalgs.graph_hop_histogram"),
    ("mask_corruption_pairs", "sampling.mask_corruption_pairs"),
    ("negative_sampling_table", "textops.negative_sampling_table"),
    ("token_spectrum", "textops.token_spectrum"),
    ("events_dup_audit", "windows.events_dup_audit"),
    ("embedding_mean_drift", "stats.embedding_mean_drift"),
    ("permutation_test", "stats.permutation_test"),
    ("containment_pairs", "dedup.containment_pairs"),
    ("quality_percentile", "evalops.quality_percentile"),
    ("related_terms", "kgflat.related_terms"),
    ("rich_club", "graphalgs.rich_club"),
    ("revenue_concentration", "stats.revenue_concentration"),
    ("revenue_gini", "stats.revenue_gini"),
    ("token_snippets", "textops.token_snippets"),
    ("theil_terms", "stats.theil_terms"),
    ("retrieval_eval", "kgflat.retrieval_eval"),
    ("graph_modularity", "graphalgs.graph_modularity"),
    ("fleiss_kappa", "evalops.fleiss_kappa"),
    ("token_fertility", "textops.token_fertility"),
    ("rfm_segments", "stats.rfm_segments"),
    ("clv_by_cohort", "stats.clv_by_cohort"),
    ("nation_supplier_hhi", "stats.nation_supplier_hhi"),
    ("curate_corpus", "__curate__"),  # composed flagship, special-cased
]

CHUNK = max(4, int(os.environ.get("GRAFT_SUITE_CHUNK", "11")))


def _resolve(spec: str):
    mod_alias, attr = spec.split(".", 1)
    return getattr(importlib.import_module(_MODS[mod_alias]), attr)


def _ray_up(num_cpus: int | None = None, default_store_gb: float = 24.0):
    """One Ray session per section subprocess, with a capped object store:
    the full 30%-of-RAM default (~38 GiB of /dev/shm) is far beyond what
    sf0.1 / the 50k-doc corpus needs, and trimming it leaves headroom when
    the driver's own Ray session or a co-tenant runs in the same window."""
    import ray

    store_gb = float(os.environ.get("GRAFT_OBJ_STORE_GB", str(default_store_gb)))
    ray.init(
        address="local",
        num_cpus=num_cpus or NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        object_store_memory=int(store_gb * (1 << 30)),
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def _ensure_corpus():
    """Generate the bench corpus once, atomically: a crash mid-write must not
    leave a half-corpus that poisons every retry, so completion is recorded
    in a sibling .ok marker and an unmarked directory is wiped."""
    marker = CORPUS_DIR + ".ok"
    if os.path.isdir(CORPUS_DIR) and os.path.exists(marker):
        return
    import shutil

    shutil.rmtree(CORPUS_DIR, ignore_errors=True)
    from research_knowledge_graph_ray.sources.corpus import write_corpus_parallel

    write_corpus_parallel(CORPUS_DIR, KG_DOCS, seed=42)
    with open(marker, "w") as f:
        f.write("ok")


# ---------------------------------------------------------------------------
# section: headline KG construction
# ---------------------------------------------------------------------------
def run_headline() -> dict:
    ray = _ray_up()
    import ray.data

    from research_knowledge_graph_ray.pipelines.construct import build_graph
    from research_knowledge_graph_ray.sources.corpus import generate_documents

    _ensure_corpus()
    # warm the OS page cache with a real byte read (Dataset.count() is
    # metadata-only for parquet and warms nothing)
    for root, _d, files in os.walk(CORPUS_DIR):
        for fn in files:
            with open(os.path.join(root, fn), "rb") as f:
                while f.read(1 << 24):
                    pass

    # untimed warm-up: run the pipeline over a small slice first so Ray's
    # worker processes exist and have imported their modules — the timed run
    # then measures steady-state throughput (the quantity that matters for a
    # long-running 100 TB job), not one-time process spawning
    warm = build_graph(
        ray.data.from_arrow(generate_documents(2000, seed=7)),
        entity_linking=True, link=True, embed_docs=True,
    )
    warm.edges.count(); warm.nodes.count(); warm.embeddings.count()

    # --- headline: the full training-data KG pipeline over the span corpus:
    #     near-dup scan (MinHash bands) → KG construction (extraction,
    #     linking, canonicalization, cross-doc) ∥ per-doc embeddings --------
    import pandas as pd

    from research_knowledge_graph_ray.stages.dedup import minhash_dedup_clusters
    from research_knowledge_graph_ray.stages.extract import _doc_texts_from_batch

    def flat_view(batch):
        ids, texts = _doc_texts_from_batch(batch)
        return pd.DataFrame(
            {"doc_id": [int(i.rsplit("-", 1)[1]) for i in ids], "text": texts}
        )

    stagger = os.environ.get("GRAFT_HEADLINE_STAGGER", "0") == "1"
    t0 = time.perf_counter()
    docs = ray.data.read_parquet(CORPUS_DIR)

    def dup_count() -> int:
        return int(minhash_dedup_clusters(
            docs.map_batches(flat_view, batch_format="pyarrow",
                             zero_copy_batch=True)).count())

    if stagger:
        # reduced-pressure retry mode: consume the corpus sequentially so the
        # near-dup sketch's exchange barrier and the KG build's extraction
        # wave never spike the object store at the same instant
        n_dup_docs = dup_count()
        res = build_graph(docs, entity_linking=True, link=True, embed_docs=True)
        n_edges = res.edges.count()
        n_nodes = res.nodes.count()
        n_emb = res.embeddings.count()
    else:
        # the near-dup sketch and the KG build are independent consumers of
        # the same corpus — run them concurrently (a streaming engine
        # schedules them as one DAG; sequential consumption would idle the
        # cluster during the sketch's exchange barriers)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            f_dup = pool.submit(dup_count)
            res = build_graph(docs, entity_linking=True, link=True,
                              embed_docs=True)
            n_edges = res.edges.count()
            n_nodes = res.nodes.count()
            n_emb = res.embeddings.count()
            n_dup_docs = f_dup.result()
    headline = time.perf_counter() - t0

    out = {
        "value": round(headline, 3),
        "kg_docs": KG_DOCS,
        "kg_nodes": n_nodes,
        "kg_edges": n_edges,
        "kg_embeddings": n_emb,
        "neardup_docs": n_dup_docs,
        "docs_per_sec": round(KG_DOCS / headline, 2),
        "triples_per_sec": round(n_edges / headline, 2),
        "headline_cpus": NUM_CPUS,
        "headline_stagger": stagger,
    }
    ray.shutdown()
    return out


# ---------------------------------------------------------------------------
# section: one chunk of the query suite
# ---------------------------------------------------------------------------
def run_suite_chunk(lo: int, hi: int) -> dict:
    ray = _ray_up(default_store_gb=16.0)
    import ray.data

    # untimed warm-up so chunk timings don't pay worker spawn
    ray.data.range(10_000, override_num_blocks=NUM_CPUS).map_batches(
        lambda b: b).count()

    timings: dict[str, float] = {}
    extras: dict[str, int] = {}
    for name, spec in SUITE[lo:hi]:
        if spec == "__curate__":
            import shutil
            import tempfile

            from research_knowledge_graph_ray.pipelines import curate

            cdir = tempfile.mkdtemp(prefix="rkg_curate_bench_")
            t = time.perf_counter()
            curate.curate_corpus(SF_DIR, cdir, n_parts=16)
            timings[name] = round(time.perf_counter() - t, 3)
            shutil.rmtree(cdir, ignore_errors=True)
            continue
        fn = _resolve(spec)
        t = time.perf_counter()
        res = fn(SF_DIR)
        n = res.count() if hasattr(res, "count") else len(res)
        timings[name] = round(time.perf_counter() - t, 3)
        if name == "kg_media_edges":
            extras["media_edges"] = int(n)
    out = {"timings": timings, **extras}
    ray.shutdown()
    return out


# ---------------------------------------------------------------------------
# parent orchestrator — never starts Ray
# ---------------------------------------------------------------------------
def _run_section(args: list[str], extra_env: dict[str, str] | None = None,
                 timeout: float = 1800.0) -> dict | None:
    env = dict(os.environ)
    env.update(extra_env or {})
    try:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), *args],
            env=env, capture_output=True, text=True, timeout=timeout,
            cwd=_REPO,
        )
    except subprocess.TimeoutExpired:
        print(f"[bench] section {args} timed out after {timeout}s",
              file=sys.stderr, flush=True)
        return None
    if p.returncode != 0:
        tail = (p.stderr or p.stdout or "")[-500:]
        print(f"[bench] section {args} rc={p.returncode}: ...{tail}",
              file=sys.stderr, flush=True)
        return None
    for line in reversed((p.stdout or "").strip().splitlines()):
        try:
            return json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
    print(f"[bench] section {args} produced no JSON line",
          file=sys.stderr, flush=True)
    return None


def run_bench() -> dict:
    result: dict = {
        "metric": "kg_construct_wall_sec",
        "value": None,
        "unit": "sec",
        "queries": {},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "kg_docs": KG_DOCS,
        "sections_failed": [],
    }

    def flush(final: bool = False):
        snap = dict(result)
        if not final:
            snap["partial"] = True
        line = json.dumps(snap)
        print(line, flush=True)
        try:
            with open("/tmp/rkg_bench_progress.json", "w") as f:
                f.write(line + "\n")
        except OSError:
            pass

    # headline: three attempts, each with progressively reduced pressure
    attempts: list[dict[str, str]] = [
        {},
        {"GRAFT_HEADLINE_STAGGER": "1", "GRAFT_OBJ_STORE_GB": "16"},
        {"GRAFT_HEADLINE_STAGGER": "1", "GRAFT_OBJ_STORE_GB": "12",
         "RAY_GRAFT_CPUS": str(max(8, NUM_CPUS // 2))},
    ]
    head = None
    for extra in attempts:
        head = _run_section(["--section", "headline"], extra)
        if head is not None:
            break
    if head is not None:
        result.update(head)
        result["queries"]["kg_construct"] = head["value"]
    else:
        result["sections_failed"].append("headline")
    flush()

    if os.environ.get("GRAFT_BENCH_SUITE", "1") == "1":
        for lo in range(0, len(SUITE), CHUNK):
            hi = min(lo + CHUNK, len(SUITE))
            chunk = _run_section(["--section", f"suite:{lo}:{hi}"],
                                 timeout=900.0)
            if chunk is None:  # one reduced-pressure retry per chunk
                chunk = _run_section(["--section", f"suite:{lo}:{hi}"],
                                     {"GRAFT_OBJ_STORE_GB": "8"}, timeout=900.0)
            if chunk is None:
                result["sections_failed"].append(f"suite:{lo}:{hi}")
                continue
            result["queries"].update(chunk["timings"])
            if "media_edges" in chunk:
                result["media_edges"] = chunk["media_edges"]
            flush()

    if not result["sections_failed"]:
        del result["sections_failed"]
    flush(final=True)
    return result


def run_incremental() -> dict:
    """Measures the incremental-update claim: appending a 10% increment via
    pipelines/incremental.update_graph vs rebuilding the combined corpus from
    scratch (the reference reprocesses everything on update,
    reference/README.md:400-405). Both paths produce identical tables
    (tests/test_incremental.py); this reports the wall-clock ratio."""
    ray = _ray_up()
    import pyarrow.compute as pc
    import ray.data

    from research_knowledge_graph_ray.pipelines.construct import build_graph
    from research_knowledge_graph_ray.pipelines.incremental import update_graph
    from research_knowledge_graph_ray.sources.corpus import generate_documents

    _ensure_corpus()
    cut_id = f"doc-{int(KG_DOCS * 0.9):06d}"
    docs = ray.data.read_parquet(CORPUS_DIR)
    old_docs = docs.map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], cut_id)),
        batch_format="pyarrow", zero_copy_batch=True)
    inc_docs = docs.map_batches(
        lambda t: t.filter(pc.greater_equal(t["doc_id"], cut_id)),
        batch_format="pyarrow", zero_copy_batch=True)

    # warm-up (worker spawn/imports outside all timed windows)
    w = build_graph(ray.data.from_arrow(generate_documents(2000, seed=7)),
                    entity_linking=True, link=True)
    w.edges.count(); w.nodes.count()

    # pre-existing graph state (untimed — it exists before the update arrives)
    old = build_graph(old_docs, entity_linking=True, link=True)
    old.nodes = old.nodes.materialize()
    old.base_edges = old.base_edges.materialize()
    old.cross_edges = old.cross_edges.materialize()

    t0 = time.perf_counter()
    res = update_graph(old.nodes, old.base_edges, old.cross_edges, inc_docs,
                       frozen_mapping=old.canonical_mapping)
    inc_nodes, inc_edges = res.nodes.count(), res.edges.count()
    t_inc = time.perf_counter() - t0

    t0 = time.perf_counter()
    full = build_graph(docs, entity_linking=True, link=True)
    full_nodes, full_edges = full.nodes.count(), full.edges.count()
    t_full = time.perf_counter() - t0

    # self-gating: a speedup is only meaningful at equal output — refuse to
    # report one if the increment diverged from the rebuild (e.g. a new
    # alias merge outside the frozen mapping)
    if inc_nodes != full_nodes or inc_edges != full_edges:
        raise AssertionError(
            f"incremental output diverged from rebuild: nodes "
            f"{inc_nodes}!={full_nodes} or edges {inc_edges}!={full_edges}")
    out = {
        "metric": "incremental_append_sec",
        "value": round(t_inc, 3),
        "unit": "sec",
        "rebuild_sec": round(t_full, 3),
        "speedup_vs_rebuild": round(t_full / t_inc, 2),
        "increment_docs": int(KG_DOCS * 0.1),
        "total_docs": KG_DOCS,
        "nodes_match": inc_nodes == full_nodes,
        "edges_match": inc_edges == full_edges,
        "num_cpus": NUM_CPUS,
    }
    ray.shutdown()
    return out


def _burn(n):
    import hashlib

    h = b"x"
    for _ in range(n):
        h = hashlib.sha256(h).digest()
    return h[0]


def _hardware_ceiling(pairs) -> dict:
    """Coordination-free parallel-scaling ceiling of THIS host: plain
    multiprocessing sha256 busy-loops (no Ray, no shuffle, no object store).
    On shared-tenancy sandboxes this lands well below 1.0 (measured
    0.74-0.77); pipeline efficiencies are reported raw AND normalized
    against it — the engine cannot out-scale the machine."""
    import multiprocessing as mp

    per = 2_000_000
    reps = max(1, int(os.environ.get("GRAFT_CEILING_REPS", "3")))
    tput = {}
    for w in sorted({c for p in pairs for c in p}):
        # pool created and warmed OUTSIDE the timed window — fork/teardown
        # overhead grows with worker count and would deflate the high-CPU
        # ceiling by several percent if timed
        with mp.Pool(w) as pool:
            pool.map(_burn, [1000] * w)  # warm workers
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                pool.map(_burn, [per] * w)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
        tput[w] = w * per / best
    return {
        f"{lo}v{hi}": round((tput[hi] / tput[lo]) / (hi / lo), 3)
        for lo, hi in pairs
    }


def run_scaling() -> dict:
    """Identical input at both levels; corpus size defaults to 600k docs for
    the scaling measurement so scalable compute dominates fixed per-job
    overhead (the OS page cache is warmed with a real byte read first, which
    removes most run-to-run variance)."""

    def run_once(ncpu: int) -> dict:
        extra = {
            "RAY_GRAFT_CPUS": str(ncpu),
            "GRAFT_KG_DOCS": os.environ.get("GRAFT_KG_DOCS", "600000"),
            "GRAFT_OBJ_STORE_GB": os.environ.get("GRAFT_OBJ_STORE_GB", "32"),
        }
        out = _run_section(["--section", "headline"], extra, timeout=5400.0)
        if out is None:
            raise RuntimeError(f"scaling headline at {ncpu} cpus failed")
        return out

    cache: dict[int, dict] = {}
    # best-of-N per level: this host's co-tenancy makes single samples swing
    # 2-3x (see BASELINE.md); GRAFT_SCALE_SAMPLES=2+ recommended when time allows
    n_samples = max(1, int(os.environ.get("GRAFT_SCALE_SAMPLES", "1")))

    def run_at(ncpu: int) -> dict:
        if ncpu not in cache:
            runs = [run_once(ncpu) for _ in range(n_samples)]
            cache[ncpu] = max(runs, key=lambda d: d["docs_per_sec"])
        return cache[ncpu]

    # BOTH N-vs-4N pairs are measured and reported (SURVEY.md §4 named 8v32;
    # 4v16 shows the same ratio with less single-machine contention — on one
    # box both "clusters" share the object store/raylet, see BASELINE.md)
    if os.environ.get("GRAFT_SCALE_LO"):
        pairs = [(int(os.environ["GRAFT_SCALE_LO"]),
                  int(os.environ.get("GRAFT_SCALE_HI", "16")))]
    else:
        pairs = [(4, 16), (8, 32)]

    pair_out: dict[str, dict] = {}
    for n_lo, n_hi in pairs:
        lo, hi = run_at(n_lo), run_at(n_hi)
        eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (n_hi / n_lo)
        pair_out[f"{n_lo}v{n_hi}"] = {
            "efficiency": round(eff, 3),
            "cpus_lo": n_lo, "cpus_hi": n_hi,
            "sec_lo": lo["value"], "sec_hi": hi["value"],
            "docs_per_sec_lo": lo["docs_per_sec"],
            "docs_per_sec_hi": hi["docs_per_sec"],
            "triples_per_sec_lo": lo["triples_per_sec"],
            "triples_per_sec_hi": hi["triples_per_sec"],
        }
    ceiling = _hardware_ceiling(pairs)
    for key, p in pair_out.items():
        p["hw_ceiling"] = ceiling.get(key)
        if ceiling.get(key):
            p["efficiency_vs_hw_ceiling"] = round(p["efficiency"] / ceiling[key], 3)

    primary = pair_out[f"{pairs[0][0]}v{pairs[0][1]}"]
    return {
        "metric": "scaling_efficiency",
        "value": primary["efficiency"],
        "unit": "ratio",
        "pairs": pair_out,
        "kg_docs": next(iter(cache.values()))["kg_docs"],
        **{k: primary.get(k) for k in ("cpus_lo", "cpus_hi", "sec_lo", "sec_hi",
                                       "docs_per_sec_lo", "docs_per_sec_hi",
                                       "hw_ceiling", "efficiency_vs_hw_ceiling")},
    }


if __name__ == "__main__":
    if "--section" in sys.argv:
        which = sys.argv[sys.argv.index("--section") + 1]
        if which == "headline":
            print(json.dumps(run_headline()))
        elif which.startswith("suite:"):
            _, lo, hi = which.split(":")
            print(json.dumps(run_suite_chunk(int(lo), int(hi))))
        else:
            raise SystemExit(f"unknown section {which!r}")
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--incremental" in sys.argv:
        print(json.dumps(run_incremental()))
    else:
        run_bench()
