"""Incremental update == full rebuild, byte-for-byte.

The strongest property this engine can claim against the reference's
"full reprocessing on update" non-scalability (reference/README.md:400-405):
appending documents through pipelines/incremental.py yields EXACTLY the
node/edge tables a from-scratch rebuild over the combined corpus produces
(content-hash ids + associative reduces + increment-only linking)."""

import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from research_knowledge_graph_ray.pipelines.construct import build_graph
from research_knowledge_graph_ray.pipelines.incremental import (
    merge_base_edges,
    merge_nodes,
    update_graph,
)
from research_knowledge_graph_ray.sources.corpus import generate_documents


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def corpus_split(ray_session):
    # generate_documents emits doc-000000.. in order, so slicing the Arrow
    # table gives an append-ordered old/new split (precondition 1)
    tab = generate_documents(90, seed=42)
    cut = 60
    old = ray.data.from_arrow(tab.slice(0, cut))
    new = ray.data.from_arrow(tab.slice(cut))
    full = ray.data.from_arrow(tab)
    return old, new, full


def test_incremental_equals_full_rebuild(corpus_split):
    old_docs, new_docs, full_docs = corpus_split

    old = build_graph(old_docs, entity_linking=False, link=True)
    res = update_graph(old.nodes, old.base_edges, old.cross_edges, new_docs)
    full = build_graph(full_docs, entity_linking=False, link=True)

    pd.testing.assert_frame_equal(
        _sorted(res.nodes.to_pandas()), _sorted(full.nodes.to_pandas()))
    pd.testing.assert_frame_equal(
        _sorted(res.edges.to_pandas()), _sorted(full.edges.to_pandas()))


def test_merge_nodes_property_precedence(corpus_split):
    # a node present in both halves keeps the OLD half's properties (the
    # min-doc winner under append ordering) and sums doc counts
    old_docs, new_docs, full_docs = corpus_split
    old = build_graph(old_docs, entity_linking=False, link=False)
    new = build_graph(new_docs, entity_linking=False, link=False)
    merged = merge_nodes(old.nodes, new.nodes).to_pandas().set_index("node_id")
    o = old.nodes.to_pandas().set_index("node_id")
    n = new.nodes.to_pandas().set_index("node_id")
    both = o.index.intersection(n.index)
    assert len(both) > 0
    for nid in list(both)[:50]:
        assert merged.loc[nid, "n_docs"] == o.loc[nid, "n_docs"] + n.loc[nid, "n_docs"]
        if o.loc[nid, "properties"] != "{}":
            assert merged.loc[nid, "properties"] == o.loc[nid, "properties"]


def test_merge_base_edges_is_exact_reduce(corpus_split):
    old_docs, new_docs, full_docs = corpus_split
    old = build_graph(old_docs, entity_linking=False, link=False)
    new = build_graph(new_docs, entity_linking=False, link=False)
    full = build_graph(full_docs, entity_linking=False, link=False)
    merged = merge_base_edges(old.base_edges, new.base_edges)
    pd.testing.assert_frame_equal(
        _sorted(merged.to_pandas()), _sorted(full.base_edges.to_pandas()))


def test_frozen_mapping_incremental_equals_full_linked(corpus_split):
    """With entity linking ON: appending via the OLD run's frozen canonical
    mapping equals a full linked rebuild whenever the increment introduces no
    new alias/LSH merges (checked first — if the mappings differ this corpus
    no longer exercises the property and the test must be re-seeded)."""
    old_docs, new_docs, full_docs = corpus_split

    old = build_graph(old_docs, entity_linking=True, link=True)
    full = build_graph(full_docs, entity_linking=True, link=True)
    assert old.canonical_mapping == full.canonical_mapping, (
        "corpus split introduces new merges; pick a split where the old half "
        "already contains every alias surface form")

    res = update_graph(old.nodes, old.base_edges, old.cross_edges, new_docs,
                       frozen_mapping=old.canonical_mapping)
    pd.testing.assert_frame_equal(
        _sorted(res.nodes.to_pandas()), _sorted(full.nodes.to_pandas()))
    pd.testing.assert_frame_equal(
        _sorted(res.edges.to_pandas()), _sorted(full.edges.to_pandas()))


def test_rebuild_without_equals_reduced_rebuild(ray_session, tmp_path):
    """Removing docs via the extraction checkpoint must be byte-identical to
    a full rebuild of the reduced corpus — extraction is per-doc
    deterministic and every downstream exchange is order-independent."""
    import pandas as pd
    import ray.data

    from research_knowledge_graph_ray.pipelines.construct import build_graph
    from research_knowledge_graph_ray.pipelines.incremental import rebuild_without
    from research_knowledge_graph_ray.sources.corpus import generate_documents

    full = generate_documents(60, seed=42)
    docs = ray.data.from_arrow(full)
    ck = str(tmp_path / "ck")
    res_full = build_graph(docs, entity_linking=False, link=True,
                           checkpoint_dir=ck, checkpoint_fingerprint="t60")

    all_ids = sorted(set(full["doc_id"].to_pylist()))
    gone = set(all_ids[::7])  # remove every 7th doc
    got = rebuild_without(ck, gone, entity_linking=False, link=True)

    kept_tbl = full.filter(
        pa.compute.invert(pa.compute.is_in(
            full["doc_id"], value_set=pa.array(sorted(gone)))))
    want = build_graph(ray.data.from_arrow(kept_tbl),
                       entity_linking=False, link=True)

    def canon(ds, keys):
        df = ds.to_pandas()
        return df.sort_values(keys).reset_index(drop=True)

    pd.testing.assert_frame_equal(
        canon(got.nodes, ["node_id"]), canon(want.nodes, ["node_id"]))
    pd.testing.assert_frame_equal(
        canon(got.edges, ["src_id", "dst_id", "edge_type", "doc_id"]),
        canon(want.edges, ["src_id", "dst_id", "edge_type", "doc_id"]))
    # and the removed docs truly left the graph
    gdf = got.edges.to_pandas()
    assert not set(gdf["doc_id"]) & gone
    assert len(res_full.edges.to_pandas()) > len(gdf)
