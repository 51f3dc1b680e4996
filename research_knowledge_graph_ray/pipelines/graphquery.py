"""Query/traversal layer over the materialized node/edge tables (SURVEY §2.9).

Thin filter/join pipelines mirroring the reference's serving queries
(reference: src/services/graph_service.py:318-458, src/db/repository.py:191-223,
src/services/graph_visualizer.py:238-311, src/services/qa_service.py:10-30).
All operate on the Datasets produced by ``build_graph`` (or their parquet
materializations); small lookup sides (the nodes table slice needed for label
resolution, BFS frontiers) broadcast rather than shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.ids import paper_node_id
from ..stages.embed import DEFAULT_DIM, embed_text


def edges_from_node(edges: "ray.data.Dataset", node_id: str,
                    edge_type: str | None = None) -> "ray.data.Dataset":
    """Outgoing edges of a node (reference: repository.py:191-206)."""

    def f(t: pa.Table) -> pa.Table:
        mask = pc.equal(t["src_id"], node_id)
        if edge_type is not None:
            mask = pc.and_(mask, pc.equal(t["edge_type"], edge_type))
        return t.filter(mask)

    return edges.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def edges_to_node(edges: "ray.data.Dataset", node_id: str,
                  edge_type: str | None = None) -> "ray.data.Dataset":
    """Incoming edges of a node (reference: repository.py:208-223)."""

    def f(t: pa.Table) -> pa.Table:
        mask = pc.equal(t["dst_id"], node_id)
        if edge_type is not None:
            mask = pc.and_(mask, pc.equal(t["edge_type"], edge_type))
        return t.filter(mask)

    return edges.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def doc_neighbors_of_type(
    edges: "ray.data.Dataset", nodes: "ray.data.Dataset", doc_id: str,
    node_type: str, edge_types: tuple[str, ...] = ("INTRODUCES",),
) -> pd.DataFrame:
    """Entities of one type attached to a document — the
    get_paper_concepts/datasets/metrics family (graph_service.py:342-396)."""
    pid = paper_node_id(doc_id)
    out = edges_from_node(edges, pid).to_pandas()
    out = out[out["edge_type"].isin(edge_types)]
    typed = nodes.map_batches(
        lambda t: t.filter(pc.equal(t["node_type"], node_type)),
        batch_format="pyarrow", zero_copy_batch=True,
    ).to_pandas()
    return out.merge(
        typed[["node_id", "label"]], left_on="dst_id", right_on="node_id"
    )[["dst_id", "label", "edge_type", "confidence"]].sort_values("label").reset_index(drop=True)


def doc_improvements(edges: "ray.data.Dataset", doc_id: str) -> pd.DataFrame:
    """Incoming IMPROVES_ON/EXTENDS edges — papers improving on this one
    (reference: graph_service.py:318-340)."""
    pid = paper_node_id(doc_id)
    df = edges_to_node(edges, pid).to_pandas()
    return df[df["edge_type"].isin(["IMPROVES_ON", "EXTENDS"])].reset_index(drop=True)


def similar_docs(edges: "ray.data.Dataset", doc_id: str) -> set[str]:
    """SIMILAR_TO in both directions, deduped (graph_service.py:403-458)."""
    pid = paper_node_id(doc_id)
    df = edges.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.equal(t["edge_type"], "SIMILAR_TO"),
                pc.or_(pc.equal(t["src_id"], pid), pc.equal(t["dst_id"], pid)),
            )
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    ).to_pandas()
    out = set(df["src_id"]) | set(df["dst_id"])
    out.discard(pid)
    return out


def bfs_subgraph(edges: "ray.data.Dataset", start_node_id: str,
                 max_depth: int = 2) -> pd.DataFrame:
    """Breadth-first neighborhood to ``max_depth``, both edge directions
    (reference: graph_visualizer.py:238-311). Iterative frontier expansion:
    the frontier set broadcasts into a filter per round (semi-join), so only
    matching edges ever leave the workers."""
    frontier = {start_node_id}
    seen = {start_node_id}
    rows = []
    for _ in range(max_depth):
        if not frontier:
            break
        ref = ray.put(frontier)

        def expand(t: pa.Table) -> pa.Table:
            fr = pa.array(list(ray.get(ref)))
            mask = pc.or_(pc.is_in(t["src_id"], value_set=fr),
                          pc.is_in(t["dst_id"], value_set=fr))
            return t.filter(mask)

        hit = edges.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
        rows.append(hit)
        nxt = (set(hit["src_id"]) | set(hit["dst_id"])) - seen
        seen |= nxt
        frontier = nxt
    if not rows:
        return pd.DataFrame()
    return pd.concat(rows, ignore_index=True).drop_duplicates(
        subset=["src_id", "dst_id", "edge_type"]
    ).reset_index(drop=True)


def improvement_chain(edges: "ray.data.Dataset", start_node_id: str,
                      max_depth: int = 5) -> list[str]:
    """Recursive IMPROVES_ON chain with cycle guard (reference:
    sql/example_queries.sql:128-160, depth ≤ 5)."""
    df = edges.map_batches(
        lambda t: t.filter(pc.equal(t["edge_type"], "IMPROVES_ON")),
        batch_format="pyarrow", zero_copy_batch=True,
    ).to_pandas()
    adj: dict[str, list[str]] = {}
    for s, d in zip(df["src_id"], df["dst_id"]):
        adj.setdefault(s, []).append(d)
    chain, cur, seen = [start_node_id], start_node_id, {start_node_id}
    for _ in range(max_depth):
        nxts = sorted(x for x in adj.get(cur, []) if x not in seen)
        if not nxts:
            break
        cur = nxts[0]
        chain.append(cur)
        seen.add(cur)
    return chain


def semantic_top_doc(docs: "ray.data.Dataset", question: str,
                     dim: int = DEFAULT_DIM) -> pd.DataFrame:
    """RAG retrieval step: embed the question, score every document embedding,
    return the top-1 (reference QA: qa_service.py:10-30 — the LLM answer step
    is the pluggable actor; retrieval is the data op)."""
    from ..stages.embed import DocEmbedder

    q = embed_text(question, dim).astype(np.float64)
    q_ref = ray.put(q)
    emb = docs.map_batches(DocEmbedder, fn_constructor_kwargs={"dim": dim},
                           batch_format="pyarrow", zero_copy_batch=True, concurrency=2)

    def score(batch: dict) -> pd.DataFrame:
        qv = ray.get(q_ref)
        vecs = np.asarray(batch["embedding"], dtype=np.float64)
        sims = vecs @ qv
        top = int(np.argmax(sims))
        return pd.DataFrame({"doc_id": [batch["doc_id"][top]],
                             "sim_e6": [int(round(sims[top] * 1e6))]})

    return (
        emb.map_batches(score, batch_format="numpy")
        .to_pandas()
        .sort_values(["sim_e6", "doc_id"], ascending=[False, True])
        .head(1)
        .reset_index(drop=True)
    )


def semantic_top_docs(docs: "ray.data.Dataset", question: str, k: int = 3,
                      dim: int = DEFAULT_DIM) -> pd.DataFrame:
    """Top-k generalization of :func:`semantic_top_doc` (per-batch partial
    top-k, tiny driver-side final sort)."""
    from ..stages.embed import embed_docs_tasks

    q = embed_text(question, dim).astype(np.float64)
    q_ref = ray.put(q)

    def score(batch: dict) -> pd.DataFrame:
        qv = ray.get(q_ref)
        vecs = np.asarray(batch["embedding"], dtype=np.float64)
        ids = np.asarray(batch["doc_id"])
        # rank by the SAME rounded key + doc_id tiebreak the global sort uses,
        # so a rounding-tied doc is never cut at the batch boundary
        sims_e6 = np.round((vecs @ qv) * 1e6).astype(np.int64)
        top = sorted(range(len(ids)), key=lambda j: (-sims_e6[j], ids[j]))[:k]
        return pd.DataFrame({"doc_id": ids[top], "sim_e6": sims_e6[top]})

    out = embed_docs_tasks(docs, dim=dim).map_batches(
        score, batch_format="numpy").to_pandas()
    if "sim_e6" not in out.columns:  # all-empty result loses schema in Ray
        return pd.DataFrame({"doc_id": pd.Series(dtype=object),
                             "sim_e6": pd.Series(dtype=np.int64)})
    return (
        out.sort_values(["sim_e6", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


class DeterministicAnswerer:
    """The answer-synthesis slot of the RAG loop
    (reference: src/services/qa_service.py:10-30 — LLM completion over the
    retrieved papers' title/year/abstract context). This deterministic
    template backend holds the same interface an LLM-client actor would:
    constructed once (state in ``__init__``), ``answer()`` per question."""

    def answer(self, question: str, contexts: list[dict]) -> str:
        lines = [
            f"- {c.get('title') or c['doc_id']} ({c.get('year')}): {c.get('abstract', '')}"
            for c in contexts
        ]
        return (
            f"Answering from {len(contexts)} retrieved paper(s):\n"
            + "\n".join(lines)
            + f"\nThe most relevant work for '{question}' is "
            + f"{contexts[0].get('title') or contexts[0]['doc_id']}."
            if contexts else f"No relevant papers found for '{question}'."
        )


def answer_question(docs: "ray.data.Dataset", question: str, k: int = 1,
                    answerer=None, dim: int = DEFAULT_DIM) -> dict:
    """Full QA loop: retrieval (distributed top-k) → metadata fetch for the
    hits only → pluggable answerer. Returns {"answer", "contexts"}."""
    from ..stages.metadata import extract_doc_meta

    hits = semantic_top_docs(docs, question, k=k, dim=dim)
    if not len(hits):
        answerer = answerer or DeterministicAnswerer()
        return {"answer": answerer.answer(question, []), "contexts": []}
    hit_ids = set(hits["doc_id"].astype(str))
    ref = ray.put(hit_ids)

    def only_hits(batch):
        import pyarrow as _pa
        import pyarrow.compute as _pc

        ids = ray.get(ref)
        return batch.filter(_pc.is_in(
            batch["doc_id"], value_set=_pa.array(list(ids), type=_pa.string())))

    meta = extract_doc_meta(
        docs.map_batches(only_hits, batch_format="pyarrow", zero_copy_batch=True)
    ).to_pandas()
    order = {d: i for i, d in enumerate(hits["doc_id"].astype(str))}
    meta = meta.sort_values("doc_id", key=lambda s: s.map(lambda d: order.get(str(d), 99)))
    contexts = meta.to_dict("records")
    answerer = answerer or DeterministicAnswerer()
    return {"answer": answerer.answer(question, contexts), "contexts": contexts}
