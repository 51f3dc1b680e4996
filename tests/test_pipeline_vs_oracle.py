"""End-to-end: the distributed pipeline must match the sequential oracle.

Gate (BASELINE.json): triple P/R ≥ 0.95 vs the reference semantics; the
deterministic extractor is expected to match EXACTLY (nodes and edges)."""

import pandas as pd
import pytest
import ray.data

from research_knowledge_graph_ray.pipelines.construct import build_graph
from research_knowledge_graph_ray.pipelines.oracle import oracle_build_graph, triple_prf
from research_knowledge_graph_ray.sources.corpus import generate_documents


def _edge_key(e):
    return (e["src_id"], e["dst_id"], e["edge_type"])


@pytest.mark.parametrize("entity_linking,link", [(False, False), (True, False), (True, True)])
def test_graph_matches_oracle(entity_linking, link):
    table = generate_documents(80, seed=42)
    docs = ray.data.from_arrow(table)
    res = build_graph(docs, entity_linking=entity_linking, link=link)
    eng_nodes = res.nodes.to_pandas().to_dict("records")
    eng_edges = res.edges.to_pandas().to_dict("records")
    ora_nodes, ora_edges = oracle_build_graph(
        table, entity_linking=entity_linking, link=link
    )

    p, r, f = triple_prf(eng_edges, ora_edges)
    assert p >= 0.95 and r >= 0.95, (p, r)
    # deterministic backend: exact match expected
    assert {_edge_key(e) for e in eng_edges} == {_edge_key(e) for e in ora_edges}

    # node sets identical (id, type, label, n_docs)
    eng_n = {(n["node_id"], n["node_type"], n["label"], n["n_docs"]) for n in eng_nodes}
    ora_n = {(n["node_id"], n["node_type"], n["label"], n["n_docs"]) for n in ora_nodes}
    assert eng_n == ora_n

    # full edge rows: confidence, provenance doc, rationale, evidence
    eng_full = {
        _edge_key(e): (round(float(e["confidence"]), 4), e["doc_id"], e["rationale"], e["evidence_span"])
        for e in eng_edges
    }
    ora_full = {
        _edge_key(e): (round(float(e["confidence"]), 4), e["doc_id"], e["rationale"], e["evidence_span"])
        for e in ora_edges
    }
    assert eng_full == ora_full


def test_entity_linking_merges_aliases():
    """'3DGS' mentions must canonicalize into the same node as the full label."""
    table = generate_documents(120, seed=42)
    docs = ray.data.from_arrow(table)
    res = build_graph(docs, entity_linking=True, link=False)
    nodes = res.nodes.to_pandas()
    labels = set(nodes["label"])
    assert not any(l.upper() == "3DGS" for l in labels), "alias should be merged away"
    assert res.canonical_mapping, "mapping should be non-empty"


def test_no_linking_keeps_aliases_separate():
    table = generate_documents(120, seed=42)
    docs = ray.data.from_arrow(table)
    res = build_graph(docs, entity_linking=False, link=False)
    nodes = res.nodes.to_pandas()
    assert any(l.upper() == "3DGS" for l in set(nodes["label"]))


def test_cross_doc_edges_exist_and_directed():
    table = generate_documents(100, seed=42)
    docs = ray.data.from_arrow(table)
    res = build_graph(docs, entity_linking=True, link=True)
    edges = res.edges.to_pandas()
    cross = edges[edges["edge_type"].isin(["EXTENDS", "COMPARES_TO", "SIMILAR_TO"])]
    assert len(cross) > 0
    paper_ids = set(res.nodes.to_pandas().query("node_type=='paper'")["node_id"])
    assert set(cross["src_id"]).issubset(paper_ids)
    assert set(cross["dst_id"]).issubset(paper_ids)


def test_edge_dedup_unique_key():
    table = generate_documents(60, seed=42)
    res = build_graph(ray.data.from_arrow(table), entity_linking=True, link=True)
    edges = res.edges.to_pandas()
    assert not edges.duplicated(subset=["src_id", "dst_id", "edge_type"]).any()
    assert ((edges["confidence"] >= 0) & (edges["confidence"] <= 1)).all()
