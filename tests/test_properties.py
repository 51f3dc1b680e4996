"""Property-based tests (hypothesis) for the invariant-critical pure functions."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from research_knowledge_graph_ray.functions.ids import node_id, pair_key
from research_knowledge_graph_ray.functions.normalize import (
    clamp_confidence,
    label_key,
    normalize_label,
    sanitize_string,
)
from research_knowledge_graph_ray.functions.text import chunk_text
from research_knowledge_graph_ray.stages.dedup import (
    _perm_params,
    minhash_signature,
    simhash64,
    word_shingles,
)

text_strategy = st.text(
    alphabet=string.ascii_letters + string.digits + " .\t\n\x00\x01-", max_size=300
)


@given(text_strategy)
@settings(max_examples=200)
def test_normalize_label_idempotent(s):
    once = normalize_label(s)
    assert normalize_label(once) == once


@given(text_strategy)
@settings(max_examples=200)
def test_sanitize_idempotent_and_clean(s):
    out = sanitize_string(s)
    assert sanitize_string(out) == out
    assert "\x00" not in out and "\x01" not in out
    # newlines/tabs survive
    if "\n" in s:
        assert "\n" in out or s.count("\n") == 0


@given(text_strategy, text_strategy)
@settings(max_examples=100)
def test_label_key_case_stability(a, b):
    if label_key(normalize_label(a)) == label_key(normalize_label(b)):
        assert node_id("method", normalize_label(a)) == node_id("method", normalize_label(b))


@given(st.floats(allow_nan=False, allow_infinity=False, width=32))
def test_clamp_bounds(x):
    assert 0.0 <= clamp_confidence(x) <= 1.0


@given(st.text(min_size=0, max_size=50), st.text(min_size=0, max_size=50))
def test_pair_key_symmetric(a, b):
    assert pair_key(a, b) == pair_key(b, a)


@given(st.text(alphabet=string.ascii_lowercase + " .\n", min_size=0, max_size=6000))
@settings(max_examples=50)
def test_chunker_covers_text(s):
    chunks = chunk_text(s, chunk_size=500, overlap=50)
    assert len(chunks) >= 1
    # every chunk is at most chunk_size and (stripped) appears in the source
    for c in chunks:
        assert len(c) <= 500
        assert c in s or c == s.strip() or c.strip() in s


@given(st.sets(st.integers(min_value=0, max_value=2**31 - 2), min_size=1, max_size=200))
@settings(max_examples=50)
def test_minhash_identical_sets_identical_sigs(sh):
    a, b = _perm_params(32)
    assert (minhash_signature(sh, a, b) == minhash_signature(set(sh), a, b)).all()


@given(st.text(alphabet=string.ascii_lowercase + " ", max_size=200))
@settings(max_examples=50)
def test_simhash_deterministic_64bit(s):
    h = simhash64(s)
    assert 0 <= h < (1 << 64)
    assert simhash64(s) == h


@given(st.text(alphabet=string.ascii_lowercase + " ", max_size=200))
@settings(max_examples=50)
def test_shingles_subset_of_reordered(s):
    words = s.split()
    assert word_shingles(" ".join(words)) == word_shingles("  ".join(words))


# --- exchange hash: equal keys must hash to equal buckets (incl. empty and
# short strings — regression for the masked-tail-byte fix in _col_hash) ------

import numpy as np
import pyarrow as pa

from research_knowledge_graph_ray.stages.shuffle import _bucket_ids


@given(st.lists(st.text(alphabet=string.ascii_lowercase, max_size=3),
                min_size=1, max_size=60))
@settings(max_examples=100)
def test_bucket_ids_stable_across_block_layout(keys):
    # the same key list split across two differently-chunked tables must land
    # every key in the same bucket
    t1 = pa.table({"k": pa.array(keys, type=pa.string())})
    half = len(keys) // 2
    t2a = pa.table({"k": pa.array(keys[:half], type=pa.string())})
    t2b = pa.table({"k": pa.array(keys[half:], type=pa.string())})
    b1 = _bucket_ids(t1, ["k"], 8)
    b2 = np.concatenate([
        _bucket_ids(t2a, ["k"], 8) if half else np.array([], np.int64),
        _bucket_ids(t2b, ["k"], 8),
    ])
    per_key = {}
    for k, b in zip(keys, np.concatenate([b1, b2])):
        per_key.setdefault(k, set()).add(int(b))
    assert all(len(v) == 1 for v in per_key.values()), per_key


# --- greedy sequence packing invariants -------------------------------------

from research_knowledge_graph_ray.stages.textops import _greedy_pack, _mg_merge


@given(st.lists(st.integers(min_value=1, max_value=100), max_size=200),
       st.integers(min_value=1, max_value=120))
@settings(max_examples=100)
def test_greedy_pack_invariants(toks, budget):
    arr = np.array(toks, np.int64)
    seq = _greedy_pack(arr, budget)
    assert len(seq) == len(arr)
    if len(arr) == 0:
        return
    # monotone contiguous sequence ids from 0
    assert seq[0] == 0
    assert ((np.diff(seq) == 0) | (np.diff(seq) == 1)).all()
    # a sequence overflows the budget only as an oversized singleton
    for s in np.unique(seq):
        m = seq == s
        if arr[m].sum() > budget:
            assert m.sum() == 1 and arr[m][0] > budget


@given(st.dictionaries(st.text(alphabet=string.ascii_lowercase, min_size=1,
                               max_size=4),
                       st.integers(min_value=1, max_value=10_000),
                       min_size=1, max_size=300),
       st.integers(min_value=1, max_value=64))
@settings(max_examples=100)
def test_mg_merge_guarantee(counts, cap):
    toks = np.array(list(counts.keys()), dtype=object)
    cnts = np.array(list(counts.values()), dtype=np.int64)
    n = int(cnts.sum())
    t, c = _mg_merge(toks, cnts, cap)
    assert len(t) <= max(cap, len(toks) if len(toks) <= cap else cap)
    kept = dict(zip(t, c))
    for tok, true in counts.items():
        # undercount bounded by N/cap; anything above the bound survives
        if true > n / cap:
            assert tok in kept
        if tok in kept:
            assert 0 < kept[tok] <= true
