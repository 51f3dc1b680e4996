"""Content-derived deterministic identifiers.

The reference assigns random UUIDs at node/edge construction
(reference: src/graph/models.py:11,32) and dedups via a DB lookup-or-create
(reference: src/services/ingestion_service.py:105-129). Random IDs are
non-reproducible across workers and force a coordination point; we derive IDs
from content so canonicalization becomes a pure, order-independent groupby.
"""

from __future__ import annotations

import hashlib

import numpy as np


_ID_HEX = 20  # 80 bits: collision-safe past 10^9 distinct keys, half the
# shuffle bytes of full sha1 hex — ids are the two hottest exchange columns


def node_id(node_type: str, normalized_label: str) -> str:
    """Deterministic node id: truncated sha1 over type + case-insensitive
    label key (80-bit hex — see ``_ID_HEX``)."""
    key = f"{node_type}\x00{normalized_label.lower()}"
    return hashlib.sha1(key.encode("utf-8")).hexdigest()[:_ID_HEX]


def paper_node_id(doc_id: str) -> str:
    """Node id for the document itself (node_type='paper', keyed by doc_id)."""
    return node_id("paper", f"doc:{doc_id}")


def node_ids_np(node_types: np.ndarray, normalized_labels: np.ndarray) -> np.ndarray:
    """Vectorized :func:`node_id`: hash unique (type, label) pairs once.

    Stays in object dtype throughout — numpy fixed-width unicode arrays treat
    ``\\x00`` as padding and would silently drop the key separator.
    """
    keys = np.array(
        [f"{t}\x00{str(l).lower()}" for t, l in zip(node_types, normalized_labels)],
        dtype=object,
    )
    uniq, inv = np.unique(keys, return_inverse=True)
    hashed = np.array(
        [hashlib.sha1(k.encode("utf-8")).hexdigest()[:_ID_HEX] for k in uniq],
        dtype=object,
    )
    return hashed[inv]


def pair_key(a: str, b: str) -> str:
    """Canonical unordered-pair key (reference ``seen_pairs`` sorted tuples:
    src/services/graph_service.py:262-266)."""
    return f"{a}\x00{b}" if a <= b else f"{b}\x00{a}"


def md5_hex(text: str) -> str:
    """md5 hex digest — used for DuckDB-checkable fingerprints (duckdb md5())."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def md5_np(values: np.ndarray) -> np.ndarray:
    """Vectorized md5 over an object array of strings."""
    return np.array([hashlib.md5(v.encode("utf-8")).hexdigest() for v in values], dtype=object)
