"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing here
calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# the package lives beside this file; make it importable regardless of the
# driver's working directory (Ray propagates sys.path to workers)
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001.

    Lifts the flat documents table into the interleaved-span input shape and
    runs the full knowledge-graph construction pipeline (extraction actor pool
    → validation → canonicalization → cross-doc linking), returning the edges
    Dataset.
    """
    from research_knowledge_graph_ray.pipelines.construct import build_graph
    from research_knowledge_graph_ray.pipelines.kgflat import KG_FLAT_VOCAB
    from research_knowledge_graph_ray.sources.adapter import read_flat_documents_as_spans

    docs = read_flat_documents_as_spans("/root/testdata/sf0.001")
    # entity_linking=True exercises the north-star alias/LSH + union-find
    # canonicalization stage in the driver-facing flagship (aliases=None →
    # default alias table). On the flat testdata vocab the aliases resolve to
    # no-ops, so the emitted edges are identical to the content-hash run —
    # pinned by tests/test_entry_contract.py.
    res = build_graph(docs, vocab=KG_FLAT_VOCAB, aliases=None, entity_linking=True, link=True)
    return res.edges


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline (SURVEY.md §2 + dedup/
    similarity/text-analysis additions)."""
    from research_knowledge_graph_ray.pipelines.registry import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-checkable equivalents (same column names/types); non-SQL-
    expressible operators are omitted → rows-only driver check."""
    from research_knowledge_graph_ray.pipelines.registry import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
