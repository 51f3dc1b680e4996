"""QA loop: distributed retrieval top-k → metadata fetch → pluggable answerer
(reference: src/services/qa_service.py:10-30)."""

import numpy as np
import ray.data

from research_knowledge_graph_ray.pipelines.graphquery import (
    DeterministicAnswerer,
    answer_question,
    semantic_top_docs,
)
from research_knowledge_graph_ray.sources.corpus import generate_documents
from research_knowledge_graph_ray.stages.embed import DocEmbedder, embed_text


def test_semantic_top_docs_matches_brute_force():
    table = generate_documents(50, seed=9)
    question = "adaptive density control for novel view synthesis"
    got = semantic_top_docs(ray.data.from_arrow(table), question, k=5)

    emb = DocEmbedder()(table)
    q = embed_text(question).astype(np.float64)
    sims = np.asarray(emb["embedding"], dtype=np.float64) @ q
    ids = np.asarray(emb["doc_id"])
    order = sorted(range(len(ids)), key=lambda i: (-round(sims[i] * 1e6), ids[i]))[:5]
    assert list(got["doc_id"]) == [ids[i] for i in order]


def test_answer_question_contexts_and_answer():
    table = generate_documents(40, seed=3)
    res = answer_question(ray.data.from_arrow(table),
                          "gaussian splatting evaluation", k=2)
    assert len(res["contexts"]) == 2
    top = res["contexts"][0]
    assert top["title"] and top["year"] is not None
    assert top["title"] in res["answer"]
    assert str(len(res["contexts"])) in res["answer"]


def test_answerer_pluggable():
    class Custom(DeterministicAnswerer):
        def answer(self, question, contexts):
            return f"CUSTOM:{len(contexts)}"

    table = generate_documents(10, seed=1)
    res = answer_question(ray.data.from_arrow(table), "nerf", k=1, answerer=Custom())
    assert res["answer"] == "CUSTOM:1"


def test_rag_top_doc_matches_sequential_reembedding(sf_dir):
    """Direct pin for the rows-only registry entry: rag_top_doc's winner must
    equal a sequential numpy re-embedding + argmax over the same adapter
    output (the registry comment's stated gate)."""
    from research_knowledge_graph_ray.pipelines.kgflat import rag_top_doc
    from research_knowledge_graph_ray.sources.adapter import (
        read_flat_documents_as_spans,
    )

    question = "stream filter window join"
    got = rag_top_doc(sf_dir, question)
    assert len(got) == 1

    import pyarrow as pa

    docs = read_flat_documents_as_spans(sf_dir).to_pandas()
    emb = DocEmbedder()(pa.Table.from_pandas(docs, preserve_index=False))
    q = embed_text(question).astype(np.float64)
    sims = np.asarray(emb["embedding"], dtype=np.float64) @ q
    ids = np.asarray(emb["doc_id"])
    best = sorted(range(len(ids)),
                  key=lambda i: (-round(sims[i] * 1e6), ids[i]))[0]
    assert got["doc_id"].iloc[0] == ids[best]
    assert int(got["sim_e6"].iloc[0]) == round(sims[best] * 1e6)
