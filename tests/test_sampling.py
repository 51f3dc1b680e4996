"""Semantic invariants for the sampling/mixing operators beyond the SQL
oracle (tests/test_queries_vs_duckdb.py already pins exact values): subset
monotonicity, quota bounds, greedy-prefix equivalence, and invariance to
input partitioning (the property that makes them safe under Ray retries
and across cluster sizes)."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from research_knowledge_graph_ray.stages import sampling


@pytest.fixture(scope="module")
def docs(sf_dir):
    return pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source", "n_chars"]
    ).to_pandas()


def _hkey(doc_id: int) -> int:
    return int.from_bytes(hashlib.md5(str(int(doc_id)).encode()).digest()[:4], "big")


def test_hash_sample_deterministic_and_monotone(sf_dir):
    small = set(sampling.hash_sample(sf_dir, fraction=0.1).to_pandas()["doc_id"])
    big_a = sampling.hash_sample(sf_dir, fraction=0.3).to_pandas()
    big_b = sampling.hash_sample(sf_dir, fraction=0.3).to_pandas()
    # identical across runs (no RNG state)
    assert sorted(big_a["doc_id"]) == sorted(big_b["doc_id"])
    # smaller fraction is a strict subset of the larger (nested samples)
    assert small <= set(big_a["doc_id"])


def test_hash_sample_matches_bruteforce(sf_dir, docs):
    got = sorted(sampling.hash_sample(sf_dir, fraction=0.2).to_pandas()["doc_id"])
    thr = int(0.2 * (1 << 32))
    want = sorted(d for d in docs["doc_id"] if _hkey(d) < thr)
    assert got == want


def test_stratified_quota_and_selection(sf_dir, docs):
    per_lang = 7
    got = sampling.stratified_sample(sf_dir, per_lang=per_lang).to_pandas()
    counts = got.groupby("lang")["doc_id"].count()
    avail = docs.groupby("lang")["doc_id"].count()
    for lang, n in counts.items():
        assert n == min(per_lang, avail[lang])
    # the selected docs are exactly the per-lang smallest hkeys
    df = docs.copy()
    df["hkey"] = [_hkey(d) for d in df["doc_id"]]
    want = (
        df.sort_values(["lang", "hkey", "doc_id"])
        .groupby("lang", sort=False)
        .head(per_lang)
    )
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])
    # hkey column round-trips correctly
    m = dict(zip(got["doc_id"], got["hkey"]))
    for d, h in m.items():
        assert h == _hkey(d)


def test_corpus_mix_weights(sf_dir, docs):
    got = sampling.corpus_mix(sf_dir).to_pandas()
    q = 1 << 30
    for _, row in docs.iterrows():
        k = int(str(row["source"])[3:])
        expect = _hkey(row["doc_id"]) < (k % 4 + 1) * q
        assert (row["doc_id"] in set(got["doc_id"])) == expect


def test_char_budget_greedy_prefix(sf_dir, docs):
    budget = 25_000
    got = (
        sampling.sample_char_budget(sf_dir, budget=budget)
        .to_pandas()
        .sort_values("cum_chars")
        .reset_index(drop=True)
    )
    # brute-force greedy walk in hkey order
    df = docs.copy()
    df["hkey"] = [_hkey(d) for d in df["doc_id"]]
    df = df.sort_values(["hkey", "doc_id"]).reset_index(drop=True)
    df["cum"] = df["n_chars"].cumsum()
    want = df[df["cum"] <= budget]
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["cum_chars"]) == list(want["cum"])
    assert got["cum_chars"].max() <= budget
    # maximality: the next doc in hkey order would overflow the budget
    if len(want) < len(df):
        nxt = df.iloc[len(want)]
        assert got["cum_chars"].max() + nxt["n_chars"] > budget


def test_char_budget_zero_and_huge(sf_dir, docs):
    none = sampling.sample_char_budget(sf_dir, budget=0).to_pandas()
    assert len(none) == 0
    everything = sampling.sample_char_budget(sf_dir, budget=10**12).to_pandas()
    assert len(everything) == len(docs)
    assert everything["cum_chars"].max() == docs["n_chars"].sum()


def test_epoch_shuffle_permutation_and_seed(ray_session, sf_dir):
    """Positions form an exact 0..n-1 permutation; a different seed produces
    a different (reproducible) order."""
    from research_knowledge_graph_ray.stages.sampling import epoch_shuffle

    a = epoch_shuffle(sf_dir).to_pandas().sort_values("doc_id")
    assert sorted(a["pos"]) == list(range(len(a)))
    b = epoch_shuffle(sf_dir, seed=8).to_pandas().sort_values("doc_id")
    assert sorted(b["pos"]) == list(range(len(b)))
    assert not (a["pos"].to_numpy() == b["pos"].to_numpy()).all()
    a2 = epoch_shuffle(sf_dir).to_pandas().sort_values("doc_id")
    assert (a["pos"].to_numpy() == a2["pos"].to_numpy()).all()


def test_dsir_weights_separate_domains(ray_session, sf_dir):
    """Quality-passing (target-domain) docs must score higher on average than
    the rest — the defining property of the importance weight."""
    import pandas as pd

    from research_knowledge_graph_ray.stages.textops import (
        MAX_DUP_BP, MIN_WORDS, dsir_weights, repetition_stats)

    w = dsir_weights(sf_dir).to_pandas()
    r = repetition_stats(sf_dir).to_pandas()
    m = w.merge(r, on="doc_id")
    target = (m["n_words"] >= MIN_WORDS) & (m["dup_frac_bp"] <= MAX_DUP_BP)
    per_tok_t = (m.loc[target, "sum_llr_e9"] / m.loc[target, "n_tokens"]).mean()
    per_tok_s = (m.loc[~target, "sum_llr_e9"] / m.loc[~target, "n_tokens"]).mean()
    assert per_tok_t > per_tok_s


def test_shard_plan_balance(ray_session, sf_dir):
    """Serpentine longest-first dealing keeps per-shard token totals within a
    tight band (each shard's total differs from the mean by at most the
    largest single document)."""
    from research_knowledge_graph_ray.stages.sampling import shard_plan

    out = shard_plan(sf_dir, n_shards=8).to_pandas()
    assert len(out) == out["doc_id"].nunique()
    tot = out.groupby("shard_id")["n_tokens"].sum()
    assert set(tot.index) == set(range(8))
    assert tot.max() - tot.min() <= out["n_tokens"].max()
