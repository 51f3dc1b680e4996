"""Incremental graph update: append new documents WITHOUT reprocessing the corpus.

The reference lists "full reprocessing on update" as a known non-scalability
(reference/README.md:400-405 — every corpus change reruns ingestion for all
papers). This module makes update cost proportional to the INCREMENT:

- new documents run through the normal construction pipeline alone;
- node tables merge exactly (content-hash node ids make the union keyed;
  min/label/type and doc counts are associative, property provenance follows
  append order);
- base edge tables merge exactly (each final edge row retains its min-doc
  provenance, so the (max confidence, min-doc) reduce re-applies losslessly);
- cross-document linking runs ONLY for pairs touching a new document — the
  mention index is reconstructed from the merged INTRODUCES edges, and
  old x old pairs are already in the old cross-edge set (a pair's shared-entity
  features depend only on its two docs, so old pairs never change).

Exactness preconditions (asserted by tests/test_incremental.py, which checks
byte-equality of incremental vs full-rebuild output):

1. doc ids are append-ordered: every new doc_id sorts AFTER all old ones in
   the padded lexicographic order of canonicalize._pack_attr (true for
   monotonically assigned ids) — this makes "old properties win" equal to
   "min-doc properties win";
2. ``entity_linking=False`` (content-hash ids), OR the frozen-mapping
   variant: pass the prior run's ``canonical_mapping`` as
   ``frozen_mapping=`` — the increment reuses existing canonical ids and
   the result equals a full linked rebuild whenever the increment
   introduces no NEW alias/LSH merges (tested);
3. the ``max_docs_per_entity`` cap keeps the FIRST k sorted doc ids, and
   appended ids sort after all old ones (precondition 1) — so a capped
   entity's doc subset is prefix-stable under append and capped runs stay
   exactly equal to a capped full rebuild (an already-full entity simply
   admits no pairs with new docs, same as the rebuild).

Violating precondition 1 degrades to a documented approximation, never a
crash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..schemas import EDGES_SCHEMA, NODES_SCHEMA
from ..stages.canonicalize import _PAD, _SEP, _unpack_attr, describe_node
from ..stages.link import BLOCKING_TYPES, DEFAULT_MAX_DOCS_PER_ENTITY, _EMPTY_PAIRS
from ..stages.shuffle import arrow_group_agg, hash_exchange_apply

CROSS_DOC_TYPES = ("IMPROVES_ON", "EXTENDS", "COMPARES_TO",
                   "REFINES_CONCEPT", "SIMILAR_TO")


def _tag_half(half: int):
    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "half", pa.array(np.full(t.num_rows, half, np.int64)))
    return tag


def merge_nodes(old: "ray.data.Dataset", new: "ray.data.Dataset") -> "ray.data.Dataset":
    """Union two FINAL node tables built over doc-disjoint corpus halves into
    the node table of the combined corpus. One exchange on node_id.

    n_docs adds (halves are doc-disjoint); node_type/label take the
    associative min; properties follow half precedence (old half wins when it
    has any — equal to global min-doc under append ordering); description is
    re-derived from the merged properties exactly as build_nodes does."""

    ds = old.map_batches(_tag_half(0), batch_format="pyarrow",
                         zero_copy_batch=True).union(
        new.map_batches(_tag_half(1), batch_format="pyarrow",
                        zero_copy_batch=True))

    def agg(t: pa.Table) -> pa.Table:
        if "properties" in t.column_names:  # first pass sees final-table rows
            ppack = pc.if_else(
                pc.equal(t["properties"], "{}"),
                pa.scalar(None, type=pa.string()),
                pc.binary_join_element_wise(
                    pc.cast(t["half"], pa.string()), t["properties"], _SEP),
            )
            t = pa.table({
                "node_id": t["node_id"], "node_type": t["node_type"],
                "label": t["label"], "ppack": ppack, "n_docs": t["n_docs"],
            })
        return arrow_group_agg(
            t, ["node_id"],
            [("node_type", "min"), ("label", "min"),
             ("ppack", "min"), ("n_docs", "sum")],
        )

    merged = hash_exchange_apply(ds, ["node_id"], agg, agg)

    def finalize(batch: pa.Table) -> pa.Table:
        def one(a):
            return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        props = one(_unpack_attr(batch["ppack"], "{}"))
        desc = pa.array([describe_node(p) for p in props.to_pylist()],
                        type=pa.string())
        return pa.Table.from_arrays(
            [one(batch["node_id"].cast(pa.string())),
             one(batch["node_type"].cast(pa.string())),
             one(batch["label"].cast(pa.string())),
             desc, props, one(batch["n_docs"].cast(pa.int64()))],
            schema=NODES_SCHEMA,
        )

    return merged.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True)


def merge_base_edges(old: "ray.data.Dataset", new: "ray.data.Dataset") -> "ray.data.Dataset":
    """Union two FINAL base-edge tables into the combined-corpus edge table.

    Lossless because every final row still carries its provenance triple
    (doc_id, rationale, evidence_span): re-pack it and re-run the exact
    (confidence max, packed min) reduce build_edges uses."""
    ds = old.union(new)

    def agg(t: pa.Table) -> pa.Table:
        if "doc_id" in t.column_names:  # first pass sees final-table rows
            packed = pc.binary_join_element_wise(
                pc.utf8_lpad(t["doc_id"], _PAD, padding=" "),
                t["rationale"], t["evidence_span"], _SEP)
            t = pa.table({
                "src_id": t["src_id"], "dst_id": t["dst_id"],
                "edge_type": t["edge_type"], "confidence": t["confidence"],
                "packed": packed,
            })
        return arrow_group_agg(
            t, ["src_id", "dst_id", "edge_type"],
            [("confidence", "max"), ("packed", "min")],
        )

    deduped = hash_exchange_apply(ds, ["src_id"], agg, agg)

    def finalize(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch["packed"], _SEP, max_splits=2)
        flat = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) else parts
        def one(a, typ):
            a = a.cast(typ)
            return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        return pa.Table.from_arrays(
            [one(batch["src_id"], pa.string()), one(batch["dst_id"], pa.string()),
             one(batch["edge_type"], pa.string()),
             one(batch["confidence"], pa.float32()),
             one(pc.list_element(flat, 1), pa.string()),
             one(pc.list_element(flat, 2), pa.string()),
             one(pc.utf8_ltrim_whitespace(pc.list_element(flat, 0)), pa.string())],
            schema=EDGES_SCHEMA,
        )

    return deduped.map_batches(finalize, batch_format="pyarrow",
                               zero_copy_batch=True)


def mention_index(base_edges: "ray.data.Dataset",
                  nodes: "ray.data.Dataset") -> "ray.data.Dataset":
    """(entity_id, doc_id, entity_type, label) reconstructed from the merged
    graph: INTRODUCES edges supply the (doc, entity) incidence (one row per
    pair after build_edges' dedup), the vocabulary-bound entity rows of the
    node table supply type/label via a broadcast lookup — no shuffle join.

    Known approximation (affects evidence_span only, never the pair/edge
    set): the node table's label is the min norm over ALL endpoint mentions,
    while the full-rebuild blocking uses the min over INTRODUCES objects
    only. Under a frozen canonical mapping, a cluster whose lexicographic
    min-norm surface appears only as a triple SUBJECT would carry that
    surface as evidence where the rebuild carries the min INTRODUCES-object
    norm. The equality tests cover the shipped corpora; a provenance-exact
    variant would carry obj_norm on INTRODUCES edges."""
    ent = nodes.map_batches(
        lambda t: t.filter(pc.is_in(t["node_type"],
                                    value_set=pa.array(list(BLOCKING_TYPES)))),
        batch_format="pyarrow", zero_copy_batch=True,
    ).select_columns(["node_id", "node_type", "label"]).to_pandas()
    ref = ray.put((
        pa.array(ent["node_id"], type=pa.string()),
        pa.array(ent["node_type"], type=pa.string()),
        pa.array(ent["label"], type=pa.string()),
    ))

    def project(t: pa.Table) -> pa.Table:
        ids, types, labels = ray.get(ref)
        t = t.filter(pc.equal(t["edge_type"], "INTRODUCES"))
        idx = pc.index_in(t["dst_id"], value_set=ids)
        keep = pc.is_valid(idx)
        t, idx = t.filter(keep), idx.filter(keep)
        return pa.table({
            "entity_id": t["dst_id"], "doc_id": t["doc_id"],
            "entity_type": pc.take(types, idx), "label": pc.take(labels, idx),
        })

    return base_edges.map_batches(project, batch_format="pyarrow",
                                  zero_copy_batch=True)


def incremental_pair_rows(
    mentions: "ray.data.Dataset",
    new_doc_ids: set[str],
    max_docs_per_entity: int = DEFAULT_MAX_DOCS_PER_ENTITY,
) -> "ray.data.Dataset":
    """candidate_pair_rows over the merged mention index, restricted to pairs
    with at least one NEW doc (old x old pairs are already linked — their
    shared-entity features depend only on the two docs themselves). The new
    doc-id set is increment-sized and ships as a broadcast."""
    new_ref = ray.put(frozenset(new_doc_ids))

    def partial(t: pa.Table) -> pa.Table:
        return arrow_group_agg(
            t, ["entity_id", "doc_id"], [("entity_type", "min"), ("label", "min")]
        )

    def final(t: pa.Table) -> pa.Table:
        newset = ray.get(new_ref)
        df = t.to_pandas()
        out = []
        for _, g in df.groupby("entity_id"):
            docs = sorted(g["doc_id"].unique().tolist())
            dropped = max(0, len(docs) - max_docs_per_entity)
            docs = docs[:max_docs_per_entity]
            k = len(docs)
            if k < 2:
                continue
            etype = g["entity_type"].iloc[0]
            # O(k) membership checks, then a vectorized pair mask — never a
            # Python test per pair (pairs are O(k²))
            new_mask = np.fromiter((d in newset for d in docs), bool, count=k)
            if not new_mask.any():
                continue
            ia, ib = np.triu_indices(k, 1)
            isnew = new_mask[ia] | new_mask[ib]
            docs_arr = np.array(docs, dtype=object)
            da, db = docs_arr[ia][isnew], docs_arr[ib][isnew]
            out.append(pd.DataFrame({
                "doc_a": da, "doc_b": db,
                "is_method": np.int64(1 if etype == "method" else 0),
                "is_dataset": np.int64(1 if etype == "dataset" else 0),
                "is_concept": np.int64(1 if etype == "concept" else 0),
                "label": g["label"].min(),
                "n_dropped_docs": np.int64(dropped),
            }))
        if not out:
            return pa.Table.from_pandas(pd.DataFrame(_EMPTY_PAIRS),
                                        preserve_index=False)
        return pa.Table.from_pandas(pd.concat(out, ignore_index=True),
                                    preserve_index=False)

    return hash_exchange_apply(mentions, ["entity_id"], partial, final)


def update_graph(
    old_nodes: "ray.data.Dataset",
    old_base_edges: "ray.data.Dataset",
    old_cross_edges: "ray.data.Dataset | None",
    new_docs: "ray.data.Dataset",
    *,
    vocab: dict | None = None,
    max_docs_per_entity: int = DEFAULT_MAX_DOCS_PER_ENTITY,
    link: bool = True,
    frozen_mapping: dict | None = None,
    **build_kw,
):
    """Append ``new_docs`` to an existing graph. Work is proportional to the
    increment: extraction/validation runs on new docs only; merges are one
    exchange each over tables keyed by content-hash ids; linking re-judges
    only pairs that involve a new doc.

    Returns a GraphResult whose nodes/edges equal a full rebuild over the
    combined corpus under the module preconditions (entity_linking=False,
    append-ordered doc ids, uncapped entities)."""
    from ..stages.link import candidate_pairs, judge_pairs
    from .construct import build_graph

    inc = build_graph(
        new_docs, vocab=vocab, entity_linking=False, link=False,
        frozen_mapping=frozen_mapping,
        max_docs_per_entity=max_docs_per_entity, **build_kw,
    )
    nodes = merge_nodes(old_nodes, inc.nodes).materialize()
    base = merge_base_edges(old_base_edges, inc.base_edges).materialize()

    cross = old_cross_edges
    if link:
        new_doc_df = new_docs.select_columns(["doc_id"]).to_pandas()
        # an EMPTY increment loses its schema in to_pandas (the all-empty
        # block gotcha) — there is nothing to link either way
        new_ids = (set(new_doc_df["doc_id"].astype(str).tolist())
                   if "doc_id" in new_doc_df.columns else set())
        new_cross = judge_pairs(candidate_pairs(incremental_pair_rows(
            mention_index(base, nodes), new_ids, max_docs_per_entity)))
        cross = (old_cross_edges.union(new_cross)
                 if old_cross_edges is not None else new_cross)

    from .construct import GraphResult

    edges = base.union(cross) if cross is not None else base
    return GraphResult(nodes=nodes, edges=edges, base_edges=base,
                       cross_edges=cross,
                       canonical_mapping=dict(frozen_mapping or {}))


def rebuild_without(
    checkpoint_dir: str,
    removed_doc_ids,
    *,
    entity_linking: bool = False,
    frozen_mapping: dict | None = None,
    link: bool = True,
    max_docs_per_entity: int = DEFAULT_MAX_DOCS_PER_ENTITY,
):
    """Exact document REMOVAL without reprocessing the corpus: filter the
    checkpointed extraction records (the expensive stage's cached output)
    and re-finish the graph from them. Extraction is per-document and
    deterministic, so the filtered record stream equals what a full rebuild
    of the reduced corpus would extract — every downstream exchange is
    order-independent, making the result BYTE-IDENTICAL to that rebuild
    (pytest-gated) at the cost of the cheap aggregation/linking stages only.

    Completes the update story next to append (:func:`update_graph`): the
    reference reprocesses everything on any change (reference
    README.md:400-405); here append touches only the increment and removal
    touches only cached records."""
    from .construct import finish_from_validated

    validated = ray.data.read_parquet(f"{checkpoint_dir}/validated",
                                      file_extensions=["parquet"])
    gone = pa.array(sorted({str(d) for d in removed_doc_ids}),
                    type=pa.string())
    gone_ref = ray.put(gone)

    def drop(batch: pa.Table) -> pa.Table:
        keep = pc.invert(pc.is_in(batch["doc_id"],
                                  value_set=ray.get(gone_ref)))
        return batch.filter(keep)

    filtered = validated.map_batches(drop, batch_format="pyarrow",
                                     zero_copy_batch=True).materialize()
    return finish_from_validated(
        filtered, None, entity_linking=entity_linking,
        frozen_mapping=frozen_mapping, link=link,
        max_docs_per_entity=max_docs_per_entity,
    )
