"""Unit tests ported from the reference's test module
(reference: tests/test_entity_extraction.py:36-85) plus sanitizer coverage."""

import pyarrow as pa

from research_knowledge_graph_ray.functions.ids import node_id, pair_key
from research_knowledge_graph_ray.functions.normalize import (
    clamp_confidence,
    label_key,
    normalize_label,
    sanitize_array,
    sanitize_string,
)


def test_normalize_label_title_case():
    assert normalize_label("  3d gaussian splatting  ") == "3d Gaussian Splatting"
    assert normalize_label("neural radiance fields") == "Neural Radiance Fields"


def test_normalize_label_preserves_acronyms():
    assert normalize_label("PSNR") == "PSNR"
    assert normalize_label("SSIM metric") == "SSIM Metric"
    assert normalize_label("3D Gaussian Splatting") == "3D Gaussian Splatting"


def test_normalize_label_collapses_whitespace():
    assert normalize_label("a   b\t c") == "A B C"


def test_sanitize_removes_ctrl_chars_keeps_whitespace():
    assert sanitize_string("a\x00b\x01c") == "abc"
    assert sanitize_string("a\nb\tc\r") == "a\nb\tc\r"


def test_sanitize_array_matches_scalar():
    vals = ["a\x00b", "x\x1fy", "keep\nme"]
    out = sanitize_array(pa.array(vals)).to_pylist()
    assert out == [sanitize_string(v) for v in vals]


def test_label_key_case_insensitive():
    assert label_key(normalize_label("3d gaussian splatting")) == label_key(
        normalize_label("3D GAUSSIAN SPLATTING")
    )


def test_clamp_confidence():
    assert clamp_confidence(None) == 0.5
    assert clamp_confidence(1.7) == 1.0
    assert clamp_confidence(-0.2) == 0.0
    assert clamp_confidence(0.42) == 0.42


def test_node_id_deterministic_and_case_insensitive():
    a = node_id("method", "3d Gaussian Splatting")
    b = node_id("method", "3D GAUSSIAN SPLATTING".lower().title())
    assert a == node_id("method", "3D Gaussian Splatting")
    assert len(a) == 20  # truncated sha1 (80-bit) — see functions/ids._ID_HEX
    assert a != node_id("concept", "3d Gaussian Splatting")
    assert b == a


def test_pair_key_unordered():
    assert pair_key("b", "a") == pair_key("a", "b")


def test_vectorized_embedding_matches_reference_loop():
    """The table-driven CRC path must be bit-identical to the per-window
    zlib.crc32 loop (ASCII fast path + non-ASCII fallback)."""
    import zlib

    import numpy as np

    from research_knowledge_graph_ray.stages.embed import DEFAULT_DIM, embed_text

    def embed_ref(text, dim=DEFAULT_DIM):
        t = " " + text.lower() + " "
        vec = np.zeros(dim, dtype=np.float32)
        for i in range(len(t) - 2):
            h = zlib.crc32(t[i : i + 3].encode("utf-8"))
            vec[(h >> 1) % dim] += 1.0 if (h & 1) else -1.0
        n = float(np.linalg.norm(vec))
        return vec / n if n > 0 else vec

    for t in ["", "a", "3D Gaussian Splatting", "x " * 500,
              "Ünïcøde — non-ascii ★", "NeRF improves on Plenoxels."]:
        assert np.array_equal(embed_text(t), embed_ref(t)), t
