"""Driver-contract pin for ``__ray_entry__.entry()``.

Round-5 change (VERDICT r4 item 1): ``entry()`` now runs with
``entity_linking=True`` so the driver-facing flagship exercises the
north-star alias/LSH + union-find canonicalization stage. On the flat
testdata vocab the default alias table resolves to no-ops, so the emitted
edges must be identical to the content-hash (``entity_linking=False``) run —
this test pins that equivalence and the stable schema the driver smoke-checks.
"""

import os
import sys

import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _edges_sorted(ds) -> pa.Table:
    tbl = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    order = pa.compute.sort_indices(
        tbl, sort_keys=[(c, "ascending") for c in cols]
    )
    return tbl.take(order)


def test_entry_runs_and_linking_is_noop_on_flat_corpus(ray_session):
    import __ray_entry__ as entry_mod
    from research_knowledge_graph_ray.pipelines.construct import build_graph
    from research_knowledge_graph_ray.pipelines.kgflat import KG_FLAT_VOCAB
    from research_knowledge_graph_ray.sources.adapter import (
        read_flat_documents_as_spans,
    )

    linked = entry_mod.entry()
    linked_tbl = _edges_sorted(linked)
    assert linked_tbl.num_rows > 0

    docs = read_flat_documents_as_spans("/root/testdata/sf0.001")
    plain = build_graph(
        docs, vocab=KG_FLAT_VOCAB, aliases={}, entity_linking=False, link=True
    )
    plain_tbl = _edges_sorted(plain.edges)

    assert linked_tbl.column_names == plain_tbl.column_names
    assert linked_tbl.equals(plain_tbl)
