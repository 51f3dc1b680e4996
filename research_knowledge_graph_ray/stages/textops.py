"""Text-analysis operators over the documents table.

Large-scale training-data pipeline primitives: token counting, quality
scoring, language ID, document fingerprinting. All vectorized (pyarrow
compute / RE2 kernels); integer outputs so the DuckDB oracles compare exactly.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

STOPWORD_PATTERN = r"\b(the|a)\b"


def _read_docs(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def text_stats(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, n_chars, n_tokens) — whitespace token count.

    ``n_tokens = len(text) - len(text without spaces) + 1`` — the formula is
    the semantic (mirrored verbatim in the SQL oracle)."""

    def stats(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        n_chars = pc.utf8_length(text).cast(pa.int64())
        no_space = pc.utf8_length(pc.replace_substring(text, pattern=" ", replacement=""))
        n_tokens = pc.add(pc.subtract(n_chars, no_space.cast(pa.int64())), 1)
        return pa.table(
            {"doc_id": batch["doc_id"].cast(pa.int64()), "n_chars": n_chars,
             "n_tokens": n_tokens}
        )

    return _read_docs(sf_dir).map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


def text_quality(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, n_tokens, n_stopwords, stop_ratio_bp) — stopword-ratio quality
    score in basis points (integer math → exact oracle comparison)."""

    def quality(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        n_chars = pc.utf8_length(text).cast(pa.int64())
        no_space = pc.utf8_length(pc.replace_substring(text, pattern=" ", replacement=""))
        n_tokens = pc.add(pc.subtract(n_chars, no_space.cast(pa.int64())), 1)
        stops = pc.count_substring_regex(pc.utf8_lower(text), pattern=STOPWORD_PATTERN).cast(
            pa.int64()
        )
        ratio = pc.divide(pc.multiply(stops, 10000), pc.max_element_wise(n_tokens, 1))
        return pa.table(
            {"doc_id": batch["doc_id"].cast(pa.int64()), "n_tokens": n_tokens,
             "n_stopwords": stops, "stop_ratio_bp": ratio}
        )

    return _read_docs(sf_dir).map_batches(quality, batch_format="pyarrow", zero_copy_batch=True)


def doc_fingerprint(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, fp) — md5 content fingerprint per document."""

    def fp(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "fp": pa.array(
                    [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts],
                    type=pa.string(),
                ),
            }
        )

    return _read_docs(sf_dir).map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)


# BPE-ish pre-tokenizer pattern (GPT-2-style word/number/punct splitting,
# RE2-safe: no lookarounds) — the "token counting" second mode of the brief.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+"


def text_tokens_bpe(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, n_ws_tokens, n_bpe_tokens) — whitespace vs BPE-ish regex
    token counts, both as vectorized RE2 kernels (pyarrow.compute)."""

    def counts(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        n_chars = pc.utf8_length(text).cast(pa.int64())
        no_space = pc.utf8_length(pc.replace_substring(text, pattern=" ", replacement=""))
        n_ws = pc.add(pc.subtract(n_chars, no_space.cast(pa.int64())), 1)
        n_bpe = pc.count_substring_regex(text, pattern=BPE_PATTERN).cast(pa.int64())
        return pa.table(
            {"doc_id": batch["doc_id"].cast(pa.int64()),
             "n_ws_tokens": n_ws, "n_bpe_tokens": n_bpe}
        )

    return _read_docs(sf_dir).map_batches(counts, batch_format="pyarrow",
                                          zero_copy_batch=True)


ROLLING_WINDOW = 8


def rolling_fingerprint(sf_dir: str, window: int = ROLLING_WINDOW) -> "ray.data.Dataset":
    """(doc_id, min_fp) — winnowing-style rolling fingerprint: the minimum
    md5 over all ``window``-char substrings. Robust to local edits (an edit
    perturbs only ``window`` of the hashes), the per-doc reduce is a plain
    min — the rolling-hash fingerprint family of the brief, exactly
    restatable in SQL (md5 per substring + list_min).

    Scale note: md5-per-window is Python-loop work (~LENGTH hashes/doc) —
    the price of SQL-checkability; it is embarrassingly parallel and a
    production variant would swap in the table-driven vectorized CRC of
    stages/embed.py (no SQL twin) for ~50× the per-doc speed."""

    def fp(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        mins = []
        for t in texts:
            if len(t) < window:
                mins.append(hashlib.md5(t.encode("utf-8")).hexdigest())
                continue
            mins.append(min(
                hashlib.md5(t[i : i + window].encode("utf-8")).hexdigest()
                for i in range(len(t) - window + 1)
            ))
        return pa.table(
            {"doc_id": batch["doc_id"].cast(pa.int64()),
             "min_fp": pa.array(mins, type=pa.string())}
        )

    return _read_docs(sf_dir).map_batches(fp, batch_format="pyarrow",
                                          zero_copy_batch=True)


# Per-language stopword profiles for the n-gram/stopword language-ID heuristic.
LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is"},
    "fr": {"le", "la", "et", "de", "un", "une", "est"},
    "de": {"der", "die", "das", "und", "ist", "ein"},
    "es": {"el", "la", "y", "de", "un", "una", "es"},
    "zh": set(),  # no-latin-stopword fallback bucket
}


class LangId:
    """Actor-pool language-ID stage (heuristic stopword/charset scorer).

    Stateful setup (profile tables, compiled tokenizer) happens once per
    actor. The scoring argmax (first-wins tie order en>fr>de>es) is restated
    exactly in SQL (registry.LANG_ID_SQL) for the oracle gate.
    """

    def __init__(self):
        self.word = re.compile(r"[a-zA-Z]+")
        self.profiles = {k: v for k, v in LANG_PROFILES.items() if v}

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        texts = batch["text"].to_pylist()
        preds = []
        for t in texts:
            toks = set(w.lower() for w in self.word.findall(t))
            if not toks:
                preds.append("zh")
                continue
            best, best_score = "en", -1
            for lang, stops in self.profiles.items():
                score = len(toks & stops)
                if score > best_score:
                    best, best_score = lang, score
            preds.append(best)
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
             "pred_lang": preds}
        )


def lang_id(sf_dir: str) -> "ray.data.Dataset":
    import ray as _ray

    n_cpus = int(_ray.cluster_resources().get("CPU", 4))
    return _read_docs(sf_dir).map_batches(
        LangId, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=max(2, n_cpus // 2),
    )


def tfidf(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, term, tfidf_e9) — TF·IDF per (document, vocabulary term).

    tf is the in-document term count (the distributed mention-count
    aggregation in kgflat.doc_mentions); idf = ln(N/df) with N = corpus doc
    count and df the term's distinct-doc count. The df table is
    vocabulary-bound, so it is broadcast via ``ray.put`` and looked up inside
    ``map_batches`` — no join shuffle. e9 fixed-point output keeps the DuckDB
    oracle comparison exact (same double ops in the same order, half-away
    rounding on both sides)."""
    from ..pipelines.kgflat import doc_mentions, nodes_flat

    n_docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).count()
    df_tbl = nodes_flat(sf_dir).select_columns(["label", "n_docs"]).to_pandas()
    df_ref = ray.put(dict(zip(df_tbl["label"], df_tbl["n_docs"].astype(np.int64))))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        dfreq = ray.get(df_ref)
        idf = np.log(float(n_docs) / df["term"].map(dfreq).to_numpy(np.float64))
        val = df["n"].to_numpy(np.float64) * idf * 1e9
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(np.int64),
                "term": df["term"],
                "tfidf_e9": np.floor(val + 0.5).astype(np.int64),
            }
        )

    return doc_mentions(sf_dir).map_batches(score, batch_format="pandas")
