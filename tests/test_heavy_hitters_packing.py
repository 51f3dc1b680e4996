"""Unit tests for the heavy-hitters sketch path and the sequence packer
internals (the oracle test covers end-to-end equality; these pin the
algorithmic guarantees the SQL cannot see)."""

import numpy as np
import pandas as pd
import pytest

from research_knowledge_graph_ray.stages.textops import (
    _greedy_pack,
    _mg_merge,
    top_tokens,
    top_tokens_mg,
)


def test_mg_merge_no_compress_below_capacity():
    tok = np.array(["a", "b", "c"], dtype=object)
    cnt = np.array([5, 3, 1], dtype=np.int64)
    t, c = _mg_merge(tok, cnt, capacity=3)
    assert list(t) == ["a", "b", "c"] and list(c) == [5, 3, 1]


def test_mg_merge_undercount_bound():
    # classic MG guarantee: every surviving count is undercounted by at most
    # the subtracted threshold, and every item with true count > N/capacity
    # survives
    rng = np.random.default_rng(7)
    tokens = np.array([f"t{i}" for i in range(1000)], dtype=object)
    counts = rng.integers(1, 50, size=1000).astype(np.int64)
    counts[:5] += 10_000  # planted heavy hitters
    n_total = int(counts.sum())
    cap = 64
    t, c = _mg_merge(tokens, counts, cap)
    assert len(t) <= cap
    survived = dict(zip(t, c))
    for i in range(5):
        tok = f"t{i}"
        assert tok in survived
        assert counts[i] - survived[tok] <= n_total / cap


def test_greedy_pack_rules():
    # budget 10: [4,4,4] -> [0,0,1]; oversized doc occupies its own sequence
    assert list(_greedy_pack(np.array([4, 4, 4]), 10)) == [0, 0, 1]
    assert list(_greedy_pack(np.array([25, 3, 3]), 10)) == [0, 1, 1]
    # oversized doc later: current run closes first
    assert list(_greedy_pack(np.array([3, 25, 3]), 10)) == [0, 1, 2]
    # exact fit stays in the bin
    assert list(_greedy_pack(np.array([5, 5, 1]), 10)) == [0, 0, 1]
    assert list(_greedy_pack(np.array([], dtype=np.int64), 10)) == []


def test_pack_fill_never_exceeds_budget_unless_single_doc():
    rng = np.random.default_rng(3)
    tok = rng.integers(1, 40, size=500).astype(np.int64)
    budget = 64
    seq = _greedy_pack(tok, budget)
    fills = pd.Series(tok).groupby(seq).sum()
    sizes = pd.Series(tok).groupby(seq).size()
    over = fills[fills > budget]
    assert (sizes[over.index] == 1).all()  # only oversized singletons overflow
    # sequences are contiguous and start at 0
    assert seq[0] == 0 and (np.diff(seq) >= 0).all() and (np.diff(seq) <= 1).all()


def test_mg_path_equals_exact_path(sf_dir):
    exact = top_tokens(sf_dir, k=15)
    sk = top_tokens_mg(sf_dir, k=15, capacity=64)
    pd.testing.assert_frame_equal(
        exact.reset_index(drop=True), sk.reset_index(drop=True))


def test_scrub_pluggable_pattern(sf_dir):
    from research_knowledge_graph_ray.stages.textops import scrub_terms

    out = scrub_terms(sf_dir, pattern=r"\b(the|zz_never)\b").to_pandas()
    assert (out["n_redacted"] >= 0).all()
    base = scrub_terms(sf_dir).to_pandas()
    assert len(out) == len(base)
    assert (base["n_redacted"] > 0).any()  # corpus contains banned terms
