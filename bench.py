"""Benchmark harness. Prints ONE JSON line:

  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N, ...}

Headline: full knowledge-graph construction (extraction → validation → entity
linking → canonicalization → cross-doc linking → node/edge materialization)
over a deterministic synthetic interleaved-span corpus (GRAFT_KG_DOCS docs,
default 20000; generated in parallel once and cached in /tmp), plus a
representative query suite over $GRAFT_SF_DIR (default /root/testdata/sf0.1).

``--scaling`` runs the plain bench twice in fresh processes at num_cpus=8 and
num_cpus=32 on identical input and reports throughput scaling efficiency
(sandbox stand-in for the N vs 4N node criterion — see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
KG_DOCS = int(os.environ.get("GRAFT_KG_DOCS", "50000"))
CORPUS_DIR = f"/tmp/rkg_bench_corpus_{KG_DOCS}"


def run_bench() -> dict:
    import ray

    ray.init(
        address="local", num_cpus=NUM_CPUS, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data

    from research_knowledge_graph_ray.pipelines import kgflat, relational
    from research_knowledge_graph_ray.pipelines.construct import build_graph
    from research_knowledge_graph_ray.sources.corpus import write_corpus_parallel
    from research_knowledge_graph_ray.stages import dedup, similarity, textops

    # --- corpus: generate once (untimed), then warm the page cache ---------
    if not os.path.isdir(CORPUS_DIR) or not os.listdir(CORPUS_DIR):
        write_corpus_parallel(CORPUS_DIR, KG_DOCS, seed=42)
    # warm the OS page cache with a real byte read (Dataset.count() is
    # metadata-only for parquet and warms nothing)
    for root, _d, files in os.walk(CORPUS_DIR):
        for fn in files:
            with open(os.path.join(root, fn), "rb") as f:
                while f.read(1 << 24):
                    pass

    timings: dict[str, float] = {}

    # untimed warm-up: run the pipeline over a small slice first so Ray's
    # worker processes exist and have imported their modules — the timed run
    # then measures steady-state throughput (the quantity that matters for a
    # long-running 100 TB job), not one-time process spawning
    from research_knowledge_graph_ray.sources.corpus import generate_documents

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

    from concurrent.futures import ThreadPoolExecutor

    t0 = time.perf_counter()
    docs = ray.data.read_parquet(CORPUS_DIR)
    # the near-dup sketch and the KG build are independent consumers of the
    # same corpus — run them concurrently (a streaming engine schedules
    # them as one DAG; sequential consumption would idle the cluster during
    # the sketch's exchange barriers)
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_dup = pool.submit(lambda: int(minhash_dedup_clusters(
            docs.map_batches(flat_view, batch_format="pyarrow",
                             zero_copy_batch=True)).count()))
        res = build_graph(docs, entity_linking=True, link=True, embed_docs=True)
        n_edges = res.edges.count()
        n_nodes = res.nodes.count()
        n_emb = res.embeddings.count()
        n_dup_docs = f_dup.result()
    headline = time.perf_counter() - t0
    timings["kg_construct"] = round(headline, 3)

    # --- query suite over the sf tables ------------------------------------
    def timed(name, fn):
        t = time.perf_counter()
        out = fn(SF_DIR)
        # consume: Datasets are lazy
        if hasattr(out, "count"):
            out.count()
        timings[name] = round(time.perf_counter() - t, 3)

    n_media_edges = 0
    if os.environ.get("GRAFT_BENCH_SUITE", "1") == "1":
        timed("kg_graph_edges", kgflat.graph_edges)
        timed("kg_cooccurrence", kgflat.cooccurrence)
        # multimodal → KG: media inventory + caption-mention edges
        t = time.perf_counter()
        n_media_edges = int(kgflat.media_edges(SF_DIR).count())
        timings["kg_media_edges"] = round(time.perf_counter() - t, 3)
        timed("q1_pricing_summary", relational.q1_pricing_summary)
        timed("revenue_by_nation", relational.revenue_by_nation)
        timed("top10_orders", relational.top10_orders)
        timed("text_quality", textops.text_quality)
        timed("dedup_minhash_pairs", dedup.minhash_candidate_pairs)
        timed("dedup_embedding_pairs", dedup.embedding_near_dups_q)
        timed("knn_topk", similarity.knn_topk)
        from research_knowledge_graph_ray.pipelines import windows
        from research_knowledge_graph_ray.stages import graphalgs, stats

        timed("graph_pagerank", graphalgs.pagerank)
        timed("price_quantiles", stats.price_quantiles)
        timed("purchase_attribution", windows.purchase_attribution)
        timed("decontaminate", textops.decontaminate)
        timed("decontaminate_bloom", textops.decontaminate_bloom)
        timed("doc_logprob", textops.doc_logprob)
        timed("item_jaccard", graphalgs.item_jaccard)
        timed("nation_year_revenue", windows.nation_year_revenue)
        timed("price_qty_regression", stats.price_qty_regression)
        timed("char_diversity", textops.char_diversity)
        timed("doc_logprob_bigram", textops.doc_logprob_bigram)
        timed("knn_join", similarity.knn_join)
        timed("rolling_active_users", windows.rolling_active_users)
        timed("event_transitions", windows.event_transitions)
        timed("graph_sssp", graphalgs.sssp)
        timed("dedup_keep_best", dedup.keep_best_dedup)
        timed("assoc_rules", graphalgs.assoc_rules)
        timed("skyline_orders", stats.skyline_orders)
        timed("late_events", windows.late_events)
        timed("term_search", kgflat.term_search)
        timed("watermark_drops", windows.watermark_drops)
        timed("hybrid_search", kgflat.hybrid_search)
        timed("orders_box_probe", relational.orders_box_probe)
        timed("revenue_rollup", relational.revenue_rollup)
        timed("linear_attribution", windows.linear_attribution)
        timed("q3_shipping_priority", relational.q3_shipping_priority)
        timed("q4_order_priority", relational.q4_order_priority)
        from research_knowledge_graph_ray.stages import sampling

        timed("passage_dedup", dedup.passage_dedup)
        timed("substring_dedup", dedup.substring_dedup)
        timed("dup_passage_share", dedup.dup_passage_share)
        timed("source_overlap", dedup.source_overlap)
        timed("dsir_weights", textops.dsir_weights)
        timed("dsir_resample", textops.dsir_resample)
        timed("kg_entity_trend", kgflat.entity_trend)
        timed("epoch_shuffle", sampling.epoch_shuffle)
        timed("shard_plan", sampling.shard_plan)
        timed("cheapest_supplier", relational.cheapest_supplier_per_part)
        timed("vocab_sharing", textops.vocab_sharing)
        timed("graph_hits", graphalgs.hits)
        timed("gopher_filter", textops.gopher_filter)
        timed("embedding_moments", stats.embedding_moments)
        timed("embedding_kmeans", similarity.embedding_kmeans)
        timed("bpe_merge_counts", textops.bpe_merge_counts)
        timed("top_tokens_cms", textops.top_tokens_cms)
        timed("graph_walks", graphalgs.graph_walks)
        timed("mmr_rerank", similarity.mmr_rerank)
        timed("semdedup", dedup.semdedup)
        timed("bm25_search", kgflat.bm25_search)
        timed("neighbor_sample", graphalgs.neighbor_sample)
        timed("embedding_quantize", similarity.embedding_quantize)
        timed("dedup_incremental", dedup.dedup_incremental)
        timed("minhash_confusion", dedup.minhash_confusion)
        timed("reciprocal_nn", similarity.reciprocal_nn_pairs)
        timed("dataset_split", sampling.dataset_split)
        timed("price_quantile_sketch", stats.price_quantile_sketch)

        # composed curation flagship: quality -> lang -> exact dedup ->
        # minhash near-dup -> pack -> partitioned parquet, one timed run
        import shutil
        import tempfile

        from research_knowledge_graph_ray.pipelines import curate

        cdir = tempfile.mkdtemp(prefix="rkg_curate_bench_")
        t = time.perf_counter()
        curate.curate_corpus(SF_DIR, cdir, n_parts=16)
        timings["curate_corpus"] = round(time.perf_counter() - t, 3)
        shutil.rmtree(cdir, ignore_errors=True)

    result = {
        "metric": "kg_construct_wall_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "kg_docs": KG_DOCS,
        "kg_nodes": n_nodes,
        "kg_edges": n_edges,
        "kg_embeddings": n_emb,
        "neardup_docs": n_dup_docs,
        "media_edges": n_media_edges,
        "docs_per_sec": round(KG_DOCS / headline, 2),
        "triples_per_sec": round(n_edges / headline, 2),
    }
    ray.shutdown()
    return result


def run_incremental() -> dict:
    """Measures the incremental-update claim: appending a 10% increment via
    pipelines/incremental.update_graph vs rebuilding the combined corpus from
    scratch (the reference reprocesses everything on update,
    reference/README.md:400-405). Both paths produce identical tables
    (tests/test_incremental.py); this reports the wall-clock ratio."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import pyarrow.compute as pc
    import ray.data

    from research_knowledge_graph_ray.pipelines.construct import build_graph
    from research_knowledge_graph_ray.pipelines.incremental import update_graph
    from research_knowledge_graph_ray.sources.corpus import (
        generate_documents,
        write_corpus_parallel,
    )

    if not os.path.isdir(CORPUS_DIR) or not os.listdir(CORPUS_DIR):
        write_corpus_parallel(CORPUS_DIR, KG_DOCS, seed=42)
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
    """Identical input at both levels; corpus size defaults to 800k docs for
    the scaling measurement so scalable compute dominates fixed per-job
    overhead (the OS page cache is warmed with a real byte read first, which
    removes most run-to-run variance)."""

    def run_once(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_SUITE="0")
        env.setdefault("GRAFT_KG_DOCS", "600000")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

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
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--incremental" in sys.argv:
        print(json.dumps(run_incremental()))
    else:
        print(json.dumps(run_bench()))
