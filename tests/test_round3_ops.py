"""Round-3 regression tests: ADVICE.md defects + new scale-path operators."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def whitespace_corpus(tmp_path, ray_session):
    """Docs with leading/trailing/consecutive spaces — the empty-token shapes
    pc.split_pattern produces that must not crash any scorer."""
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                "  the quick  brown fox  ",           # leading/double/trailing
                "the the the quick quick fox jumps",  # normal
                " lazy  dog   sat ",                  # runs of spaces
                "quick brown fox " * 20,              # long, quality-passing
            ],
            "lang": ["en"] * 4,
            "source": ["s0"] * 4,
            "n_chars": np.int64([24, 33, 18, 320]),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_curate_neardup_canonical_reelected(tmp_path, ray_session):
    """A near-dup cluster whose sketch-canonical (min doc_id) was
    quality-dropped must still keep exactly one SURVIVING member — the
    sequential-gate semantic (ADVICE r2): previously the whole cluster
    vanished because the dropped canonical suppressed its duplicates."""
    from research_knowledge_graph_ray.pipelines.curate import curate_corpus

    base = "the and of " + " ".join(
        f"alpha{i} beta{i} gamma{i}" for i in range(10))  # 33 words, distinct
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(3, dtype=np.int64),
            "text": [
                "the and of alpha0",          # doc 0: < MIN_WORDS → dropped
                base,                         # doc 1: near-dup of doc 2
                base + " deltax",             # doc 2: 1-word tail
            ],
            "lang": ["en"] * 3,
            "source": ["s0"] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    out = tmp_path / "curated"
    rep = curate_corpus(str(tmp_path), str(out), n_parts=2)
    import glob
    kept = pd.concat(
        [pq.read_table(f).to_pandas()
         for f in glob.glob(str(out / "curated-*.parquet"))],
        ignore_index=True)
    # docs 1 and 2 are near-dups of each other; exactly ONE must survive,
    # and it must be doc 1 (the min surviving member)
    assert set(kept["doc_id"]) == {1}
    assert rep["n_neardup_drop"] == 1


def test_curate_neardup_dropped_canonical_does_not_suppress(tmp_path,
                                                            ray_session):
    """Planted ADVICE case: the min member of the near-dup cluster fails the
    quality gate, the other member passes — the survivor must be kept."""
    from research_knowledge_graph_ray.pipelines.curate import curate_corpus

    base = "the and of " + " ".join(
        f"alpha{i} beta{i} gamma{i}" for i in range(10))
    repet = "dup dup dup " * 40  # repetitive prefix → dup_bp over threshold
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(2, dtype=np.int64),
            # doc 0 shares all of doc 1's shingles but its repeated prefix
            # pushes dup_bp past the gate → quality-dropped cluster canonical
            "text": [repet + base, base],
            "lang": ["en"] * 2,
            "source": ["s0"] * 2,
        }
    )
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    out = tmp_path / "curated"
    rep = curate_corpus(str(tmp_path), str(out), n_parts=2)
    import glob
    files = glob.glob(str(out / "curated-*.parquet"))
    kept = (pd.concat([pq.read_table(f).to_pandas() for f in files],
                      ignore_index=True)
            if files else pd.DataFrame({"doc_id": []}))
    # whether or not the sketches cluster the two docs, doc 1 passes every
    # gate and must never be suppressed by the quality-dropped doc 0
    assert 1 in set(kept["doc_id"])
    assert rep["n_quality_drop"] >= 1


def test_sssp_frontier_join_large_node_set(ray_session):
    """SSSP on a 100k-node tree — a node set well past any per-round
    driver-side distance map one would accept. The frontier-join core keeps
    distances as co-partitioned object-store slices; the driver reads only
    scalar improved-counts. Distances on a unit-weight tree are exactly the
    node depths."""
    import ray.data
    from research_knowledge_graph_ray.stages.graphalgs import sssp_ds

    n, branch = 100_000, 10
    child = np.arange(1, n, dtype=np.int64)
    parent = (child - 1) // branch
    edges = pd.DataFrame({
        "u": np.concatenate([parent, child]),
        "v": np.concatenate([child, parent]),
        "w": np.ones(2 * (n - 1), dtype=np.int64),
    })
    sym = ray.data.from_pandas(edges).repartition(8)
    out = sssp_ds(sym, src=0, max_rounds=12).to_pandas()
    assert len(out) == n
    depth = np.zeros(n, dtype=np.int64)
    for i in range(1, n):
        depth[i] = depth[(i - 1) // branch] + 1
    got = out.sort_values("node")["d"].to_numpy(np.int64)
    assert (got == depth).all()


def test_ivf_kmeans_beats_head_on_clustered(tmp_path, ray_session):
    """On a table SORTED by cluster, first-N centroid init lands every seed
    in one cluster (one hot bucket ≈ brute force, terrible recall at small
    nprobe); the content-hash-sample + Lloyd quantizer must recover it."""
    from research_knowledge_graph_ray.stages import similarity

    rng = np.random.RandomState(7)
    dim, per = 16, 200
    centers = rng.normal(size=(8, dim)) * 4
    vecs = np.concatenate(
        [c + rng.normal(size=(per, dim)) * 0.2 for c in centers])
    ids = np.arange(len(vecs), dtype=np.int64)  # sorted by cluster
    tab = pa.table({"vec_id": ids, "embedding": list(vecs),
                    "label": ["x"] * len(ids)})
    pq.write_table(tab, str(tmp_path / "embeddings.parquet"))
    sf = str(tmp_path)

    exact = set(similarity.knn_topk(sf, query_vec_id=5, k=10)
                .to_pandas()["vec_id"])
    head = set(similarity.knn_topk_ivf(
        sf, query_vec_id=5, k=10, n_centroids=8, nprobe=2,
        centroid_mode="head").to_pandas()["vec_id"])
    km = set(similarity.knn_topk_ivf(
        sf, query_vec_id=5, k=10, n_centroids=8, nprobe=2,
        centroid_mode="kmeans").to_pandas()["vec_id"])
    r_head = len(exact & head) / len(exact)
    r_km = len(exact & km) / len(exact)
    assert r_km > r_head  # the verdict's done-criterion
    assert r_km >= 0.9    # and the kmeans path is actually good


def test_media_kg_adapter_and_feature_plumbing(ray_session, sf_dir):
    """The deterministic media synthesis: even doc_ids carry exactly one
    media span (table when %6==0 else figure), captions are text prefixes,
    and the decode→feature actor plumbing runs end-to-end over the same
    inventory the kg_media_* queries use."""
    from research_knowledge_graph_ray.pipelines.kgflat import media_edges, media_nodes
    from research_knowledge_graph_ray.sources.adapter import (
        MEDIA_CAPTION_CHARS, read_flat_documents_with_media)
    from research_knowledge_graph_ray.stages.multimodal import media_feature_pipeline

    docs = read_flat_documents_with_media(sf_dir)
    nodes = media_nodes(sf_dir).to_pandas()
    n_docs = int(pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows)
    assert len(nodes) == (n_docs + 1) // 2  # one media node per even doc_id
    assert set(nodes["node_type"]) == {"figure", "table"}
    kinds = nodes.set_index("label")["node_type"]
    assert kinds["fig:0"] == "table" and kinds["fig:2"] == "figure"

    edges = media_edges(sf_dir).to_pandas()
    has = edges[edges["edge_type"].isin(["HAS_FIGURE", "HAS_TABLE"])]
    assert len(has) == len(nodes)  # exactly one containment edge per media
    dep = edges[edges["edge_type"] == "DEPICTS"]
    # caption term totals agree between the node and edge projections
    assert len(dep) == int(nodes["n_caption_terms"].sum())

    # decode (fake) → byte-histogram features over the same inventory
    # (concurrency=1: two 2-actor pools would starve the 4-CPU test session's
    # read tasks of a scheduling slot)
    feats = media_feature_pipeline(docs, fake_decode=True, concurrency=1).to_pandas()
    assert len(feats) == len(nodes)
    assert all(len(f) == 32 for f in feats["feature"])


def test_llm_actor_pool_quarantines_poison(ray_session):
    """Fault injection through the flagship: poisoned docs become
    EXTRACTION_FAILED provenance rows, transiently-flaky docs succeed via
    retry, and the graph over the surviving docs matches the rule-path graph
    over the same corpus."""
    import ray.data
    from research_knowledge_graph_ray.pipelines.construct import build_graph
    from research_knowledge_graph_ray.sources.corpus import generate_documents
    from research_knowledge_graph_ray.stages.llm_client import (
        FaultInjectionTransport)

    table = generate_documents(24, seed=3)
    all_ids = set(table["doc_id"].to_pylist())
    poison = sorted(all_ids)[3:5]
    flaky = sorted(all_ids)[7:9]

    res = build_graph(
        ray.data.from_arrow(table), entity_linking=False, link=True,
        extract_actor_pool=True, extract_backend="llm",
        extract_transport=FaultInjectionTransport(poison, flaky),
        extract_concurrency=2, extract_batch_size=8,
    )
    from research_knowledge_graph_ray.functions.ids import paper_node_id

    poison_ids = {paper_node_id(d) for d in poison}
    edges = res.edges.to_pandas()
    failed = edges[edges["edge_type"] == "EXTRACTION_FAILED"]
    assert set(failed["src_id"]) == poison_ids  # quarantined, not fatal
    assert (failed["confidence"] == 0.0).all()

    # surviving graph == rule path over the SURVIVOR corpus (poisoned docs
    # removed before extraction). Cross-doc inference depends on corpus-wide
    # co-occurrence, so the reference must drop the docs, not filter edges.
    # Flaky docs retried to success, so they must be present and identical.
    import pyarrow.compute as pc

    survivor = table.filter(
        pc.invert(pc.is_in(table["doc_id"], pa.array(poison))))
    ref = build_graph(ray.data.from_arrow(survivor), entity_linking=False,
                      link=True)
    key = lambda df: sorted(zip(df["src_id"], df["dst_id"], df["edge_type"]))
    ok = edges[edges["edge_type"] != "EXTRACTION_FAILED"]
    assert key(ok) == key(ref.edges.to_pandas())


def test_llm_client_provider_routing_and_rpm():
    from research_knowledge_graph_ray.stages.llm_client import (
        RateLimitedLLMClient)

    assert RateLimitedLLMClient(model="gpt-4o").provider == "openai"
    assert RateLimitedLLMClient(model="o1-mini").provider == "openai"
    assert RateLimitedLLMClient(model="llama-3-70b").provider == "together"
    # rpm throttle admits exactly rpm calls without sleeping
    import json as _json
    c = RateLimitedLLMClient(requests_per_minute=1000, max_concurrency=4)
    prompts = [_json.dumps({"doc_id": f"d{i}", "text": "NeRF uses DTU."})
               for i in range(8)]
    outs = c.complete_many(prompts)
    assert all(not isinstance(o, Exception) for o in outs)


def test_dsir_weights_survives_whitespace_runs(whitespace_corpus):
    from research_knowledge_graph_ray.stages.textops import dsir_weights

    out = dsir_weights(whitespace_corpus).to_pandas()
    assert set(out["doc_id"]) == {0, 1, 2, 3}
    # token counts ignore the empty splits
    assert out.set_index("doc_id").loc[0, "n_tokens"] == 4


def test_doc_logprob_survives_whitespace_runs(whitespace_corpus):
    from research_knowledge_graph_ray.stages.textops import doc_logprob

    out = doc_logprob(whitespace_corpus).to_pandas()
    assert set(out["doc_id"]) == {0, 1, 2, 3}
    assert out.set_index("doc_id").loc[2, "n_tokens"] == 3
    # every log-prob is negative, so the sums must be too
    assert (out["sum_logp_e9"] < 0).all()
