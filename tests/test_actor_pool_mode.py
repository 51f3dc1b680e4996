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
    assert sorted(a.nodes.to_pandas()["node_id"]) == sorted(b.nodes.to_pandas()["node_id"])
