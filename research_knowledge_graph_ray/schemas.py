"""Arrow schemas for the engine's logical tables.

The input contract (BASELINE.json input_hint) is an interleaved text+media
document table::

    doc_id: string
    spans:  list<struct<kind:string, text:string, media_ref:string, offset:int32>>

Span order within the list is the per-row invariant the whole pipeline must
preserve: ``(kind, text, media_ref, order)`` — the Ray-native analogue of the
reference's chunk ordering (reference: src/agents/paper_ingestion_agent.py:187-221).

Output tables mirror the reference's relational schema
(reference: sql/schema.sql:8-37) with content-derived deterministic IDs instead
of random UUIDs so canonicalization is a pure groupby.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Input: interleaved span documents
# ---------------------------------------------------------------------------

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),       # "title" | "abstract" | "text" | "figure" | "table" | "equation"
        ("text", pa.string()),       # textual content ("" for pure-media spans)
        ("media_ref", pa.string()),  # "" for text kinds, "media://{doc_id}/{i}" for media kinds
        ("offset", pa.int32()),      # cumulative char offset, strictly increasing per doc
    ]
)

DOCS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

TEXT_KINDS = ("title", "abstract", "text")
MEDIA_KINDS = ("figure", "table", "equation")

# ---------------------------------------------------------------------------
# Intermediate: unified extraction records (label space, pre-canonicalization)
#
# One stream carries both entity mentions and triples; mentions are rows whose
# predicate is a doc->entity structural edge (MENTIONS / INTRODUCES /
# AUTHORED_BY). This keeps extraction single-pass (the reference does two LLM
# calls per paper; we do one vectorized pass per batch).
# ---------------------------------------------------------------------------

RECORDS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("subj_type", pa.string()),   # "paper" for doc-anchored records
        ("subj_label", pa.string()),  # raw (pre-normalization) label; doc_id for papers
        ("pred", pa.string()),
        ("obj_type", pa.string()),
        ("obj_label", pa.string()),
        ("confidence", pa.float32()),
        ("rationale", pa.string()),
        ("evidence_span", pa.string()),
        # JSON properties for the OBJECT entity (set on mention records and
        # __PAPER_META__ records; "{}" on relational triples). Carried through
        # canonicalization into the nodes table, mirroring the reference's
        # entity description/properties (src/agents/validation_agent.py:73-91,
        # src/services/ingestion_service.py:105-129: cross-paper the first
        # writer wins — deterministically restated as min-doc-wins). The node
        # description is DERIVED from the merged properties at finalize
        # (canonicalize.describe_node) so it costs no second string column in
        # the record stream.
        ("obj_props", pa.string()),
    ]
)

# Node-type vocabulary (reference: src/services/graph_visualizer.py:67, src/main.py:160)
NODE_TYPES = ("paper", "concept", "method", "dataset", "metric", "author", "task")

# Intra-doc edge types (reference: src/agents/entity_extraction_agent.py:92-99,
# src/services/ingestion_service.py:131-147)
INTRA_DOC_EDGE_TYPES = (
    "MENTIONS",
    "INTRODUCES",
    "AUTHORED_BY",
    "USES_CONCEPT",
    "USES_DATASET",
    "EVALUATES_WITH",
    "EVALUATES_ON",
    "IMPROVES_ON",
    "COMPARES_WITH",
)

# Cross-doc edge types (reference: src/agents/relationship_linking_agent.py:82-97)
CROSS_DOC_EDGE_TYPES = ("IMPROVES_ON", "EXTENDS", "COMPARES_TO", "SIMILAR_TO", "REFINES_CONCEPT")

# Edge types whose direction is inverted (doc_b -> doc_a) in cross-doc linking
# (reference: src/agents/relationship_linking_agent.py:144-154)
INVERTED_EDGE_TYPES = ("IMPROVES_ON", "EXTENDS", "REFINES_CONCEPT")

# ---------------------------------------------------------------------------
# Outputs
# ---------------------------------------------------------------------------

NODES_SCHEMA = pa.schema(
    [
        ("node_id", pa.string()),      # sha1("{type}\x00{normalized_label.lower()}") — deterministic
        ("node_type", pa.string()),
        ("label", pa.string()),        # normalized display label
        ("description", pa.string()),
        ("properties", pa.string()),   # JSON-encoded open-ended properties
        ("n_docs", pa.int64()),        # number of distinct documents mentioning this node
    ]
)

EDGES_SCHEMA = pa.schema(
    [
        ("src_id", pa.string()),
        ("dst_id", pa.string()),
        ("edge_type", pa.string()),
        ("confidence", pa.float32()),  # clamped to [0,1]
        ("rationale", pa.string()),
        ("evidence_span", pa.string()),
        ("doc_id", pa.string()),       # provenance: min doc_id that emitted this edge
    ]
)

MENTIONS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("entity_type", pa.string()),
        ("label", pa.string()),
        ("node_id", pa.string()),
    ]
)


def flatten_spans(batch):
    """(doc-count, flat span fields, rebased offsets) for a span batch.

    Handles chunked and plain/sliced list arrays: ``ListArray.offsets`` are
    *physical* (not rebased) on sliced arrays while ``flatten()`` returns only
    the referenced values, so offsets are rebased to the flattened values.
    """
    import pyarrow as _pa

    spans = batch["spans"]
    if isinstance(spans, _pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    offs = spans.offsets.to_pylist()
    base = offs[0]
    offs = [o - base for o in offs]
    return flat, offs
