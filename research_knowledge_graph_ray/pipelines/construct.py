"""The flagship knowledge-graph construction pipeline.

Ray-native restatement of the reference's ``ingest`` flow (SURVEY.md §3.1):

    read spans → map_batches(TripleExtractor actors)     # extraction
              → map_batches(validate_records)            # normalize + ids
              → entity linking (alias + LSH embedding) → union-find mapping
              → apply mapping
              → build_nodes / build_edges (groupby-aggregate)
              → cross-doc linking (blocking → pairs → judge)
              → edges = intra ∪ cross

All stages stream Arrow batches; the only materialized intermediate is the
validated record stream (it feeds four consumers and is orders of magnitude
smaller than the input docs). With ``checkpoint_dir`` set, that intermediate is
written as partitioned parquet with a manifest instead, making the run
resumable (see state/checkpoint.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import ray.data

from ..sources.corpus import ALIASES
from ..stages.canonicalize import (
    DEFAULT_COSINE_TAU,
    apply_canonical_mapping,
    build_alias_key_map,
    build_edges,
    build_nodes,
    compute_canonical_mapping,
    distinct_entities_ds,
)
from ..stages.extract import TripleExtractor
from ..stages.link import DEFAULT_MAX_DOCS_PER_ENTITY, link_cross_documents
from ..stages.validate import validate_records


@dataclass
class GraphResult:
    nodes: "ray.data.Dataset"
    edges: "ray.data.Dataset"
    canonical_mapping: dict = field(default_factory=dict)


def extract_validated(
    docs: "ray.data.Dataset",
    vocab: dict | None = None,
    batch_size: int = 64,
    concurrency=None,
) -> "ray.data.Dataset":
    """Extraction actor pool + validation, as one streamed sub-pipeline."""
    if concurrency is None:
        # actor-pool size: leave headroom for read/shuffle stages
        import ray

        n_cpus = int(ray.cluster_resources().get("CPU", 4))
        concurrency = max(2, (3 * n_cpus) // 4)
    records = docs.map_batches(
        TripleExtractor,
        fn_constructor_kwargs={"vocab": vocab},
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )
    return records.map_batches(validate_records, batch_format="pyarrow", zero_copy_batch=True)


def build_graph(
    docs: "ray.data.Dataset",
    *,
    vocab: dict | None = None,
    aliases: dict | None = None,
    entity_linking: bool = True,
    link: bool = True,
    tau: float = DEFAULT_COSINE_TAU,
    max_docs_per_entity: int = DEFAULT_MAX_DOCS_PER_ENTITY,
    extract_batch_size: int = 64,
    extract_concurrency=None,
    checkpoint_dir: str | None = None,
) -> GraphResult:
    """Run the full construction pipeline over a span-document Dataset.

    ``entity_linking=False`` skips alias/LSH canonicalization (content-hash ids
    only) — used for SQL-oracle-checkable runs where the emitted graph must be
    expressible in ANSI SQL. ``link=False`` skips cross-doc linking, mirroring
    the reference's ``--no-link`` toggle (src/main.py:70-71,138-141).
    """
    validated = extract_validated(
        docs, vocab=vocab, batch_size=extract_batch_size, concurrency=extract_concurrency
    )

    if checkpoint_dir is not None:
        from ..state.checkpoint import checkpoint_dataset

        validated = checkpoint_dataset(validated, f"{checkpoint_dir}/validated")
    else:
        validated = validated.materialize()

    mapping: dict = {}
    if entity_linking:
        alias_key_map = build_alias_key_map(ALIASES if aliases is None else aliases)
        entities = distinct_entities_ds(validated)
        mapping = compute_canonical_mapping(entities, alias_key_map, tau=tau)
        validated = apply_canonical_mapping(validated, mapping).materialize()

    nodes = build_nodes(validated)
    edges = build_edges(validated)
    if link:
        edges = edges.union(link_cross_documents(validated, max_docs_per_entity))
    return GraphResult(nodes=nodes, edges=edges, canonical_mapping=mapping)
