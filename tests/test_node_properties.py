"""Node description/properties merge (M7/A2 full semantics) + paper metadata.

Engine nodes — including the min-doc description/properties merge and the
paper-node title/abstract/year/venue attrs — must match the sequential oracle
exactly (reference: src/agents/validation_agent.py:73-91 within-doc merge,
src/services/ingestion_service.py:105-129 cross-paper first-writer-wins,
:176-222 paper properties).
"""

import json

import pandas as pd
import ray.data

from research_knowledge_graph_ray.pipelines.construct import build_graph
from research_knowledge_graph_ray.pipelines.oracle import oracle_build_graph
from research_knowledge_graph_ray.sources.corpus import VENUES, generate_documents
from research_knowledge_graph_ray.stages.metadata import extract_doc_meta


def test_metadata_year_venue_parsed():
    table = generate_documents(30, seed=42)
    meta = extract_doc_meta(ray.data.from_arrow(table)).to_pandas()
    assert len(meta) == 30
    assert meta["year"].notna().all()
    assert meta["year"].between(2015, 2024).all()
    assert meta["venue"].isin(VENUES).all()
    assert (meta["title"].str.len() > 0).all()


def test_nodes_desc_props_match_oracle():
    table = generate_documents(80, seed=11)
    res = build_graph(ray.data.from_arrow(table), entity_linking=True, link=False)
    eng = res.nodes.to_pandas().sort_values("node_id").reset_index(drop=True)
    onodes, _ = oracle_build_graph(table, entity_linking=True, link=False)
    ora = pd.DataFrame(onodes).sort_values("node_id").reset_index(drop=True)[eng.columns]
    assert eng.shape == ora.shape
    for c in eng.columns:
        assert (eng[c].astype(str).values == ora[c].astype(str).values).all(), c
    # paper nodes carry title description + metadata properties JSON
    papers = eng[eng["node_type"] == "paper"]
    assert (papers["description"].str.len() > 0).all()
    props = papers["properties"].map(json.loads)
    assert all(set(p) == {"title", "abstract", "year", "venue", "authors"} for p in props)
    # entity nodes carry min-doc surface-form description/properties
    ents = eng[eng["node_type"] == "method"]
    assert ents["description"].str.startswith("method mentioned as").all()
    assert all("surface" in json.loads(p) for p in ents["properties"])
