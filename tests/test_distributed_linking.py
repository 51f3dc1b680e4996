"""The distributed entity-linking path (exchange + LSH buckets + propagation)
must produce the same canonical mapping as the driver fast path."""

import ray.data

from research_knowledge_graph_ray.pipelines.construct import extract_validated
from research_knowledge_graph_ray.sources.corpus import ALIASES, generate_documents
from research_knowledge_graph_ray.stages.canonicalize import (
    build_alias_key_map,
    compute_canonical_mapping,
    compute_canonical_mapping_from_validated,
    distinct_entities_ds,
)


def test_distributed_path_matches_driver_path():
    table = generate_documents(100, seed=42)
    validated = extract_validated(ray.data.from_arrow(table)).materialize()
    amap = build_alias_key_map(ALIASES)

    driver = compute_canonical_mapping_from_validated(validated, amap)
    # force the distributed branch: entity limit below the distinct count
    distributed = compute_canonical_mapping_from_validated(
        validated, amap, small_entity_limit=1
    )
    assert driver == distributed
    assert driver, "expected non-empty alias mapping"


def test_distributed_cc_fallback_on_large_edges():
    """compute_canonical_mapping falls back to label propagation when the
    edge list exceeds driver_limit — results must agree."""
    table = generate_documents(80, seed=42)
    validated = extract_validated(ray.data.from_arrow(table)).materialize()
    amap = build_alias_key_map(ALIASES)
    ents = distinct_entities_ds(validated)
    normal = compute_canonical_mapping(ents, amap)
    forced = compute_canonical_mapping(
        distinct_entities_ds(validated), amap, driver_limit=0
    )
    assert normal == forced


def test_graph_edges_broadcast_excludes_paper_nodes():
    """graph_edges resolves labels via a broadcast that must be
    vocabulary-bound: entity rows only, never the O(corpus) paper nodes."""
    from research_knowledge_graph_ray.pipelines.construct import build_graph
    from research_knowledge_graph_ray.pipelines.kgflat import KG_FLAT_VOCAB, entity_label_map
    from research_knowledge_graph_ray.sources.adapter import read_flat_documents_as_spans

    res = build_graph(
        read_flat_documents_as_spans("/root/testdata/sf0.001"),
        vocab=KG_FLAT_VOCAB, aliases={}, entity_linking=False, link=False,
    )
    m = entity_label_map(res.nodes)
    nodes = res.nodes.to_pandas()
    n_papers = int((nodes["node_type"] == "paper").sum())
    n_entities = int((nodes["node_type"] != "paper").sum())
    assert n_papers >= 100          # corpus-sized side exists
    assert len(m) == n_entities      # broadcast payload is entity-only
    assert set(m.values()) == set(nodes[nodes["node_type"] != "paper"]["label"])
