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
