"""Semantic (KNN) blocking wired into cross-doc linking: the distributed
pruned path (embedding top-k ∩ shared-dataset, then the judge) must equal a
sequential brute-force restatement of the same semantic
(reference: src/services/graph_service.py:70-165)."""

import numpy as np
import pandas as pd
import ray.data

from research_knowledge_graph_ray.functions.ids import paper_node_id
from research_knowledge_graph_ray.pipelines.construct import extract_validated
from research_knowledge_graph_ray.pipelines.oracle import oracle_build_graph  # noqa: F401
from research_knowledge_graph_ray.sources.corpus import generate_documents
from research_knowledge_graph_ray.stages.embed import DocEmbedder
from research_knowledge_graph_ray.stages.link import (
    BLOCKING_TYPES,
    link_cross_documents_semantic,
)

K = 5
N_DOCS = 60


def _brute_force_edges(table):
    """Sequential restatement: all-pairs cosine top-k + shared-dataset filter
    + the 5-type judge. Shares only the pure embedding kernel with the engine."""
    emb_batch = DocEmbedder()(table)
    doc_ids = list(emb_batch["doc_id"])
    vecs = np.asarray(emb_batch["embedding"], dtype=np.float64)
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0] = 1.0
    unit = vecs / norms[:, None]
    sims = unit @ unit.T

    knn_pairs = set()
    for i, did in enumerate(doc_ids):
        order = sorted(
            (j for j in range(len(doc_ids)) if j != i),
            key=lambda j: (-sims[i, j], doc_ids[j]),
        )[:K]
        for j in order:
            knn_pairs.add(tuple(sorted((did, doc_ids[j]))))

    # shared-entity counts from the pure extraction semantics
    from research_knowledge_graph_ray.functions.normalize import normalize_label
    from research_knowledge_graph_ray.functions.ids import node_id
    from research_knowledge_graph_ray.stages.extract import (
        compile_patterns,
        extract_doc_records,
    )

    mention_res, triple_res = compile_patterns(None)
    ent_docs: dict = {}
    ent_type: dict = {}
    for row in table.to_pylist():
        text = "\n".join(s["text"] for s in row["spans"])
        for rec in extract_doc_records(row["doc_id"], text, mention_res, triple_res):
            _, st, _, pred, ot, ol, *_ = rec
            if pred == "INTRODUCES" and ot in BLOCKING_TYPES:
                nid = node_id(ot, normalize_label(ol))
                ent_docs.setdefault(nid, set()).add(row["doc_id"])
                ent_type[nid] = ot
    counts: dict = {}
    for nid, ds in ent_docs.items():
        docs = sorted(ds)
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                c = counts.setdefault((docs[i], docs[j]),
                                      {"method": 0, "dataset": 0, "concept": 0})
                c[ent_type[nid]] += 1

    edges = set()
    for (da, db), c in counts.items():
        if (da, db) not in knn_pairs or c["dataset"] < 1:
            continue
        nm, nd, nc = c["method"], c["dataset"], c["concept"]
        if nm >= 3:
            et, src, dst = "IMPROVES_ON", db, da
        elif nm == 2:
            et, src, dst = "EXTENDS", db, da
        elif nm >= 1 and nd >= 1:
            et, src, dst = "COMPARES_TO", da, db
        elif nc >= 2:
            et, src, dst = "REFINES_CONCEPT", db, da
        elif nm + nd + nc >= 2:
            et, src, dst = "SIMILAR_TO", da, db
        else:
            continue
        edges.add((paper_node_id(src), paper_node_id(dst), et))
    return edges


def test_semantic_linking_matches_brute_force():
    table = generate_documents(N_DOCS, seed=5)
    docs = ray.data.from_arrow(table)
    validated = extract_validated(docs).materialize()
    out = link_cross_documents_semantic(
        validated, docs, k_neighbors=K, nprobe=None
    ).to_pandas()
    got = set(zip(out["src_id"], out["dst_id"], out["edge_type"]))
    want = _brute_force_edges(table)
    assert got == want
    assert len(want) > 0, "test corpus produced no semantic-linked pairs"
    # the semantic path must PRUNE vs plain shared-entity blocking
    from research_knowledge_graph_ray.stages.link import link_cross_documents

    plain = link_cross_documents(validated).to_pandas()
    assert len(out) < len(plain)
