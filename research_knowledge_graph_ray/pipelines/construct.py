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
    compute_canonical_mapping_from_validated,
)
from ..stages.extract import TripleExtractor
from ..stages.link import (
    DEFAULT_MAX_DOCS_PER_ENTITY,
    link_cross_documents,
    link_cross_documents_semantic,
)
from ..stages.validate import validate_records


@dataclass
class GraphResult:
    nodes: "ray.data.Dataset"
    edges: "ray.data.Dataset"
    canonical_mapping: dict = field(default_factory=dict)
    embeddings: "ray.data.Dataset | None" = None  # (doc_id, embedding) when embed_docs
    # split views of ``edges`` kept for incremental update (pipelines/incremental.py):
    # base = within-doc triples, cross = cross-document links; edges == base ∪ cross
    base_edges: "ray.data.Dataset | None" = None
    cross_edges: "ray.data.Dataset | None" = None


def extract_validated(
    docs: "ray.data.Dataset",
    vocab: dict | None = None,
    batch_size: int = 256,
    concurrency=None,
    use_actor_pool: bool = False,
    with_meta: bool = False,
    backend: str = "rule",
    llm_transport=None,
    llm_model: str = "det-extractor-v1",
) -> "ray.data.Dataset":
    """Extraction + validation, as one streamed sub-pipeline.

    Execution modes for the extraction stage:

    - ``use_actor_pool=False`` (default for the deterministic backend): a
      stateless task with a per-worker compiled-pattern cache, fused with
      validation into one map stage — runs on Ray's pre-started workers with
      zero actor cold-start.
    - ``use_actor_pool=True, backend="rule"``: the :class:`TripleExtractor`
      callable-class actor pool — state builds once per actor in ``__init__``.
    - ``use_actor_pool=True, backend="llm"``: the
      :class:`~..stages.llm_client.LLMTripleExtractor` actor pool — the
      production LLM shape: rate-limited async client per actor, pluggable
      ``llm_transport`` (deterministic in tests), per-document quarantine
      (``EXTRACTION_FAILED`` provenance rows) on transport failure.
    """
    if use_actor_pool:
        if concurrency is None:
            # actor-pool size: leave headroom for read/shuffle stages
            import ray

            n_cpus = int(ray.cluster_resources().get("CPU", 4))
            concurrency = max(2, (3 * n_cpus) // 4)
        if backend == "llm":
            from ..stages.llm_client import LLMTripleExtractor

            cls: type = LLMTripleExtractor
            kwargs = {"vocab": vocab, "with_meta": with_meta,
                      "model": llm_model, "transport": llm_transport}
        else:
            cls = TripleExtractor
            kwargs = {"vocab": vocab, "with_meta": with_meta}
        records = docs.map_batches(
            cls,
            fn_constructor_kwargs=kwargs,
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
            concurrency=concurrency,
        )
        return records.map_batches(
            validate_records, batch_format="pyarrow", zero_copy_batch=True
        )

    from ..stages.extract import extract_batch

    vocab_key = "default" if vocab is None else str(sorted(vocab))

    def extract_and_validate(batch):
        out = validate_records(extract_batch(batch, vocab_key, vocab, with_meta))
        # raw pre-normalization labels are dead after validation — drop them
        # before the record stream is materialized/shuffled
        return out.drop_columns(["subj_label", "obj_label"])

    return docs.map_batches(
        extract_and_validate, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )


def build_graph(
    docs: "ray.data.Dataset",
    *,
    vocab: dict | None = None,
    aliases: dict | None = None,
    entity_linking: bool = True,
    frozen_mapping: dict | None = None,
    link: bool = True,
    link_mode: str = "entity",  # "entity" (shared-entity blocking) | "semantic"
    link_k_neighbors: int = 10,
    tau: float = DEFAULT_COSINE_TAU,
    max_docs_per_entity: int = DEFAULT_MAX_DOCS_PER_ENTITY,
    extract_batch_size: int = 256,
    extract_concurrency=None,
    extract_actor_pool: bool = False,
    extract_backend: str = "rule",
    extract_transport=None,
    embed_docs: bool = False,
    paper_node_attrs: bool = True,
    checkpoint_dir: str | None = None,
    checkpoint_partitions: int = 8,
    checkpoint_fingerprint: str = "",
) -> GraphResult:
    """Run the full construction pipeline over a span-document Dataset.

    ``entity_linking=False`` skips alias/LSH canonicalization (content-hash ids
    only) — used for SQL-oracle-checkable runs where the emitted graph must be
    expressible in ANSI SQL. ``link=False`` skips cross-doc linking, mirroring
    the reference's ``--no-link`` toggle (src/main.py:70-71,138-141).
    """
    if checkpoint_dir is not None:
        # partition-level resumable extraction: completed partitions are
        # never re-extracted (state/checkpoint.py). The fingerprint carries a
        # record-schema version + the meta toggle so checkpoints written by an
        # older build (or a different paper_node_attrs setting) invalidate
        # instead of feeding stale-schema parquet into build_nodes.
        from ..state.checkpoint import partitioned_stage_checkpoint

        checkpoint_fingerprint = (
            f"{checkpoint_fingerprint}|records=v2|meta={paper_node_attrs}"
        )
        validated = partitioned_stage_checkpoint(
            docs,
            lambda d: extract_validated(
                d, vocab=vocab, batch_size=extract_batch_size,
                concurrency=extract_concurrency, use_actor_pool=extract_actor_pool,
                with_meta=paper_node_attrs, backend=extract_backend,
                llm_transport=extract_transport,
            ),
            f"{checkpoint_dir}/validated",
            n_partitions=checkpoint_partitions,
            fingerprint=checkpoint_fingerprint,
        )
    else:
        validated = extract_validated(
            docs, vocab=vocab, batch_size=extract_batch_size,
            concurrency=extract_concurrency, use_actor_pool=extract_actor_pool,
            with_meta=paper_node_attrs, backend=extract_backend,
            llm_transport=extract_transport,
        ).materialize()

    return finish_from_validated(
        validated, docs,
        aliases=aliases, entity_linking=entity_linking,
        frozen_mapping=frozen_mapping, link=link, link_mode=link_mode,
        link_k_neighbors=link_k_neighbors, tau=tau,
        max_docs_per_entity=max_docs_per_entity, embed_docs=embed_docs,
    )


def finish_from_validated(
    validated: "ray.data.Dataset",
    docs: "ray.data.Dataset | None" = None,
    *,
    aliases: dict | None = None,
    entity_linking: bool = True,
    frozen_mapping: dict | None = None,
    link: bool = True,
    link_mode: str = "entity",
    link_k_neighbors: int = 10,
    tau: float = DEFAULT_COSINE_TAU,
    max_docs_per_entity: int = DEFAULT_MAX_DOCS_PER_ENTITY,
    embed_docs: bool = False,
) -> GraphResult:
    """Everything downstream of extraction: canonicalization, node/edge
    materialization, cross-doc linking, optional embeddings. Factored out so
    a cached record stream (the extraction checkpoint) can be re-finished
    without touching the corpus — the removal path (:func:`rebuild_without`)
    and any re-linking with different knobs enter here. ``docs`` is needed
    only for semantic link_mode and embed_docs."""
    if docs is None and (embed_docs or (link and link_mode == "semantic")):
        raise ValueError("semantic linking / embeddings need the span docs")
    from ..stages.canonicalize import make_remap_fn

    mapping: dict = {}
    if entity_linking:
        alias_key_map = build_alias_key_map(ALIASES if aliases is None else aliases)
        mapping = compute_canonical_mapping_from_validated(validated, alias_key_map, tau=tau)
    elif frozen_mapping:
        # incremental update path (pipelines/incremental.py): REUSE a prior
        # run's canonical mapping on the increment instead of recomputing a
        # corpus-global one — mentions of already-canonicalized entities land
        # on their existing node ids; genuinely new entities keep content
        # hashes (they join the mapping at the next full canonicalization)
        mapping = dict(frozen_mapping)
    # the remap is a cheap broadcast lookup FUSED into each consumer's first
    # exchange partial (``pre`` hook): the record stream stays the single
    # materialized intermediate — no second object-store copy, and no
    # per-consumer map execution (~0.5s fixed latency each) for the rewrite
    remap_fn = make_remap_fn(mapping)

    # The three downstream exchanges are independent consumers of the single
    # materialized record stream; their map/shuffle phases overlap via
    # threads so fixed per-execution costs don't serialize.
    from concurrent.futures import ThreadPoolExecutor

    # paper-node description/properties (title/abstract/year/venue/authors —
    # reference ingestion_service.py:176-222) arrive as __PAPER_META__ records
    # fused into the extraction pass (with_meta above) — no second corpus
    # scan, no broadcast; build_nodes consumes them through the same exchange
    embeddings = None
    with ThreadPoolExecutor(max_workers=4) as pool:
        f_nodes = pool.submit(build_nodes, validated, remap_fn)
        f_edges = pool.submit(build_edges, validated, remap_fn)
        if not link:
            f_cross = None
        elif link_mode == "semantic":
            # the reference's v1 pruned linker: embedding top-k blocking +
            # shared-dataset filter (graph_service.py:70-165); consumes the
            # record stream in several stages, so it takes the remap as a
            # wrapped dataset rather than a fused pre hook
            f_cross = pool.submit(
                link_cross_documents_semantic,
                apply_canonical_mapping(validated, mapping), docs,
                link_k_neighbors, max_docs_per_entity,
            )
        else:
            f_cross = pool.submit(
                link_cross_documents, validated, max_docs_per_entity, remap_fn)
        if embed_docs:
            # reference parity: every document gets an embedding vector
            # (ingestion step 5, src/services/ingestion_service.py:82-89) —
            # an actor-pool stage over the raw span docs, independent of the
            # record stream, so it overlaps the graph consumers
            from ..stages.embed import embed_docs_tasks

            f_embed = pool.submit(lambda: embed_docs_tasks(docs).materialize())
        nodes = f_nodes.result()
        base_edges = f_edges.result()
        cross_edges = f_cross.result() if f_cross is not None else None
        edges = (base_edges.union(cross_edges) if cross_edges is not None
                 else base_edges)
        if embed_docs:
            embeddings = f_embed.result()
    return GraphResult(nodes=nodes, edges=edges, canonical_mapping=mapping,
                       embeddings=embeddings, base_edges=base_edges,
                       cross_edges=cross_edges)
