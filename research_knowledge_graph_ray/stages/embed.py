"""Deterministic hashing embedder + LSH banding.

The reference embeds papers with ``text-embedding-3-small`` (1536-d) once per
paper (reference: src/utils/llm.py:124-147, src/services/ingestion_service.py:224-237).
This build ships a deterministic char-n-gram hashing embedder behind the same
actor-pool interface (model-per-actor in ``__init__``); swapping in a real
model changes only the class internals, not the pipeline.

Also provides sign-random-projection LSH banding used by the entity-linking
stage: the *semantic* of near-duplicate labels is defined as "shares ≥1 LSH
band AND cosine ≥ τ", which is deterministic and independently computable by
the sequential test oracle.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

DEFAULT_DIM = 64

# CRC-32 (zlib polynomial) lookup table — lets the 3-gram hash run as three
# vectorized table lookups over numpy byte windows instead of one Python
# zlib.crc32 call per character (bit-identical to zlib.crc32 on the window)
_CRC_TAB = np.zeros(256, dtype=np.uint32)
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0xEDB88320 if _c & 1 else _c >> 1
    _CRC_TAB[_i] = _c
del _i, _c


def _crc3_vec(b0: np.ndarray, b1: np.ndarray, b2: np.ndarray) -> np.ndarray:
    crc = np.full(len(b0), 0xFFFFFFFF, dtype=np.uint32)
    for b in (b0, b1, b2):
        crc = (crc >> np.uint32(8)) ^ _CRC_TAB[(crc ^ b) & np.uint32(0xFF)]
    return crc ^ np.uint32(0xFFFFFFFF)


def embed_text(text: str, dim: int = DEFAULT_DIM) -> np.ndarray:
    """Deterministic char-3-gram hashing embedding, L2-normalized float32.

    ASCII text takes the vectorized path (byte windows == char windows);
    non-ASCII falls back to the per-window loop with identical semantics.
    Both produce exactly the same vector: the pre-normalization accumulator
    holds integer values, so summation order cannot change the result."""
    t = " " + text.lower() + " "
    raw = t.encode("utf-8")
    if len(raw) == len(t):  # pure ASCII — byte 3-grams are char 3-grams
        arr = np.frombuffer(raw, dtype=np.uint8)
        if len(arr) < 3:
            return np.zeros(dim, dtype=np.float32)
        h = _crc3_vec(arr[:-2].astype(np.uint32), arr[1:-1].astype(np.uint32),
                      arr[2:].astype(np.uint32))
        idx = (h >> np.uint32(1)) % np.uint32(dim)
        signs = np.where(h & np.uint32(1), 1.0, -1.0)
        vec = np.bincount(idx, weights=signs, minlength=dim).astype(np.float32)
    else:
        vec = np.zeros(dim, dtype=np.float32)
        for i in range(len(t) - 2):
            h = zlib.crc32(t[i : i + 3].encode("utf-8"))
            vec[(h >> 1) % dim] += 1.0 if (h & 1) else -1.0
    n = float(np.linalg.norm(vec))
    if n > 0:
        vec /= n
    return vec


def embed_texts(texts: list[str], dim: int = DEFAULT_DIM) -> np.ndarray:
    return np.stack([embed_text(t, dim) for t in texts]) if texts else np.zeros((0, dim), np.float32)


def lsh_planes(dim: int = DEFAULT_DIM, n_bits: int = 32, seed: int = 7) -> np.ndarray:
    """Seeded random hyperplanes for sign-LSH (shared engine/oracle)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).astype(np.float32)


def lsh_band_keys(
    vectors: np.ndarray,
    planes: np.ndarray,
    n_bands: int = 4,
) -> list[list[str]]:
    """Per vector: list of band-bucket keys ``"{band}:{bits-as-int}"``."""
    if len(vectors) == 0:
        return []
    bits = (vectors @ planes.T) >= 0  # (n, n_bits)
    n_bits = planes.shape[0]
    per_band = n_bits // n_bands
    keys: list[list[str]] = []
    weights = 1 << np.arange(per_band)
    for row in bits:
        ks = []
        for b in range(n_bands):
            chunk = row[b * per_band : (b + 1) * per_band]
            ks.append(f"{b}:{int((chunk * weights).sum())}")
        keys.append(ks)
    return keys


class DocEmbedder:
    """Actor-pool stage: span docs batch → ``(doc_id, embedding)`` rows.

    Embeds title + abstract + first ``body_chars`` of body text, mirroring the
    reference's embedding-text construction and truncation
    (reference: src/services/ingestion_service.py:224-237).
    """

    def __init__(self, dim: int = DEFAULT_DIM, body_chars: int = 2000):
        self.dim = dim
        self.body_chars = body_chars

    def __call__(self, batch: pa.Table) -> dict:
        from ..schemas import flatten_spans

        flat, offsets = flatten_spans(batch)
        kinds = flat.field("kind").to_pylist()
        texts = flat.field("text").to_pylist()
        out = []
        for i in range(batch.num_rows):
            title, abstract, body = [], [], []
            for j in range(offsets[i], offsets[i + 1]):
                if kinds[j] == "title":
                    title.append(texts[j])
                elif kinds[j] == "abstract":
                    abstract.append(texts[j])
                else:
                    body.append(texts[j])
            text = " ".join(title + abstract) + " " + ("\n".join(body))[: self.body_chars]
            out.append(embed_text(text, self.dim))
        return {
            "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
            "embedding": np.stack(out) if out else np.zeros((0, self.dim), np.float32),
        }


_DOC_EMBEDDER_CACHE: dict = {}


def embed_docs_tasks(docs, dim: int = DEFAULT_DIM, body_chars: int = 2000):
    """Stateless-task twin of :class:`DocEmbedder` (per-process cache) — the
    hashing embedder has no heavy state, so it runs on pre-started workers.
    A real model-backed embedder should use the actor-pool class instead."""

    def embed(batch):
        key = (dim, body_chars)
        if key not in _DOC_EMBEDDER_CACHE:
            _DOC_EMBEDDER_CACHE[key] = DocEmbedder(dim, body_chars)
        return _DOC_EMBEDDER_CACHE[key](batch)

    return docs.map_batches(embed, batch_format="pyarrow", zero_copy_batch=True)
