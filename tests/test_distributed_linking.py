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
