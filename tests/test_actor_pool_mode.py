"""The actor-pool extraction path must emit exactly the same graph as the
stateless-task path (the two execution modes of the flagship stage)."""

import ray.data

from research_knowledge_graph_ray.pipelines.construct import build_graph
from research_knowledge_graph_ray.sources.corpus import generate_documents


def test_actor_pool_extraction_equivalent():
    table = generate_documents(30, seed=42)
    a = build_graph(ray.data.from_arrow(table), entity_linking=True, link=True,
                    extract_actor_pool=True, extract_concurrency=2)
    b = build_graph(ray.data.from_arrow(table), entity_linking=True, link=True)
    key = lambda df: sorted(zip(df["src_id"], df["dst_id"], df["edge_type"]))
    assert key(a.edges.to_pandas()) == key(b.edges.to_pandas())
    # node tables identical INCLUDING the fused-meta description/properties —
    # both execution modes must carry the __PAPER_META__ records
    an = a.nodes.to_pandas().sort_values("node_id").reset_index(drop=True)
    bn = b.nodes.to_pandas().sort_values("node_id").reset_index(drop=True)
    assert (an.astype(str).values == bn.astype(str).values).all()
    papers = an[an["node_type"] == "paper"]
    assert (papers["description"].str.len() > 0).all()
