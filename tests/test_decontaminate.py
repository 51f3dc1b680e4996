"""Benchmark decontamination: planted-contamination positive path + a
brute-force twin (the sf0.01 oracle slice happens to contain no natural
8-gram overlap, so the positive path is pinned here)."""

import re

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from research_knowledge_graph_ray.stages.textops import (
    _doc_ngrams,
    decontaminate,
)

EVAL_SENT = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "purple zeppelins hover above the ancient harbor"
)


def _brute_grams(text: str, n: int) -> set:
    w = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def _write_docs(tmp_path, rows) -> str:
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def test_doc_ngrams_vectorized_matches_brute():
    texts = [
        "A, B; c d e f g h i j k!",
        "short one",
        "",
        "...!!!",
        "word " * 30,
        EVAL_SENT,
    ]
    batch = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    doc_idx, grams = _doc_ngrams(batch, 8)
    got = {}
    for d, g in zip(doc_idx, grams.to_pylist()):
        got.setdefault(int(d), set()).add(g)
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _brute_grams(t, 8), f"doc {i}"


def test_planted_contamination(tmp_path):
    # doc 0 -> eval slice (0 % 97 == 0); doc 1 quotes it; doc 2 is clean
    contaminated = "In related work we note that " + EVAL_SENT + " as shown."
    clean = "completely different content with many words " * 5
    sf = _write_docs(tmp_path, [(0, EVAL_SENT), (1, contaminated), (2, clean)])
    out = (
        decontaminate(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # the eval doc itself is excluded from the output
    assert out["doc_id"].tolist() == [1, 2]
    exp_shared = len(_brute_grams(contaminated, 8) & _brute_grams(EVAL_SENT, 8))
    assert exp_shared > 0
    assert out.loc[0, "contaminated"] == 1
    assert out.loc[0, "n_shared"] == exp_shared
    assert out.loc[1, "contaminated"] == 0
    assert out.loc[1, "n_shared"] == 0


def test_decontaminate_matches_bruteforce(tmp_path):
    # randomized-ish corpus from a tiny vocabulary so overlaps are plentiful
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    rows = []
    for i in range(40):
        words = [vocab[(i * 7 + j * 3) % len(vocab)] for j in range(6 + i % 9)]
        rows.append((i, " ".join(words)))
    sf = _write_docs(tmp_path, rows)
    out = decontaminate(sf, n=4, eval_mod=10).to_pandas()

    eval_grams = set()
    for i, t in rows:
        if i % 10 == 0:
            eval_grams |= _brute_grams(t, 4)
    exp = {
        i: len(_brute_grams(t, 4) & eval_grams)
        for i, t in rows
        if i % 10 != 0
    }
    got = dict(zip(out["doc_id"], out["n_shared"]))
    assert got == exp
    assert (
        out.set_index("doc_id")["contaminated"]
        == pd.Series({k: int(v > 0) for k, v in exp.items()})
    ).all()


def test_no_eval_docs(tmp_path):
    sf = _write_docs(tmp_path, [(1, "a b c d e f g h i"), (2, "x " * 20)])
    out = decontaminate(sf).to_pandas()
    assert len(out) == 2
    assert (out["contaminated"] == 0).all()
