"""String sanitization and label normalization.

Semantics are byte-for-byte equivalent to the reference implementation
(reference: src/utils/text_sanitizer.py:6-32 for sanitize,
src/agents/validation_agent.py:96-119 for label normalization) because the
normalized label is the canonical entity key — any divergence changes the
entity set and breaks triple P/R. Implemented fresh, vectorized over batches.
"""

from __future__ import annotations

import re
from functools import lru_cache

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Control characters PostgreSQL rejects; the reference strips these while
# keeping \t \n \r (reference: src/utils/text_sanitizer.py:24-30).
_CTRL_RE = re.compile(r"[\x00-\x08\x0B-\x0C\x0E-\x1F]")
_CTRL_PATTERN = r"[\x00-\x08\x0B-\x0C\x0E-\x1F]"


def sanitize_string(text: str) -> str:
    """Strip null bytes and control chars (keep ``\\n \\r \\t``)."""
    if not isinstance(text, str):
        return text
    return _CTRL_RE.sub("", text)


def sanitize_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized :func:`sanitize_string` over an Arrow string array."""
    return pc.replace_substring_regex(arr, pattern=_CTRL_PATTERN, replacement="")


def sanitize_json_value(value):
    """Recursively sanitize strings inside dict/list JSON values
    (reference: src/utils/text_sanitizer.py:35-116)."""
    if isinstance(value, str):
        return sanitize_string(value)
    if isinstance(value, dict):
        return {k: sanitize_json_value(v) for k, v in value.items()}
    if isinstance(value, list):
        return [sanitize_json_value(v) for v in value]
    return value


@lru_cache(maxsize=65536)
def normalize_label(label: str) -> str:
    """Canonical display form of an entity label.

    sanitize → strip → collapse internal whitespace → Title-Case each word
    while preserving multi-char ALL-CAPS acronyms (``PSNR`` stays ``PSNR``,
    ``"  3d gaussian splatting "`` → ``"3d Gaussian Splatting"``).
    Reference semantics: src/agents/validation_agent.py:96-119.
    """
    label = sanitize_string(label)
    words = label.split()
    out = []
    for word in words:
        if word.isupper() and len(word) > 1:
            out.append(word)
        else:
            out.append(word.capitalize())
    return " ".join(out)


def normalize_labels_np(labels: np.ndarray) -> np.ndarray:
    """Vectorized label normalization: normalize each *unique* label once,
    then map back — hot batches repeat the same few entities heavily."""
    uniq, inv = np.unique(labels.astype(object), return_inverse=True)
    normed = np.array([normalize_label(u) for u in uniq], dtype=object)
    return normed[inv]


def label_key(normalized_label: str) -> str:
    """Case-insensitive dedup key for a normalized label
    (reference: src/agents/validation_agent.py:69)."""
    return normalized_label.lower()


def clamp_confidence(value, default: float = 0.5) -> float:
    """Clamp a confidence to [0, 1]; missing → ``default``
    (reference: src/agents/validation_agent.py:134-138)."""
    if value is None:
        return default
    try:
        return max(0.0, min(1.0, float(value)))
    except (TypeError, ValueError):
        return default
