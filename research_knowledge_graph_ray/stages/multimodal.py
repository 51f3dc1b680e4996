"""Multimodal span handling: media inventory, decode, feature extraction.

Media spans (figure/table/equation …) are opaque payloads referenced by
``media_ref`` with typed metadata; real pipelines would hold decoders
(PIL/ffmpeg) per actor. Those libraries are not in this container, so the
decode kernel is STUBBED: ``DecodeMedia`` raises ``NotImplementedError``
unless ``fake=True``, in which case it produces a deterministic fake payload
so the Ray-side plumbing — schema, batch sizing, actor signature, output
layout — is real and tested. Feature extraction then runs on the (fake)
payload bytes exactly as it would on real decoded media.

Batch-size guidance for real payloads: large binary columns need small
``batch_size`` (payload × batch_size × concurrency must fit worker heap) and
``batch_format="pyarrow"`` (binary columns must not round-trip through pandas
object dtype).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("kind", pa.string()),
        ("span_index", pa.int32()),
        ("caption", pa.string()),
    ]
)


def media_inventory(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Explode media spans into one row per media object (flat_map semantics
    via map_batches returning more rows than input)."""

    def explode(batch: pa.Table) -> pa.Table:
        from ..schemas import flatten_spans

        flat, offsets = flatten_spans(batch)
        kinds = flat.field("kind").to_pylist()
        texts = flat.field("text").to_pylist()
        refs = flat.field("media_ref").to_pylist()
        doc_ids = batch["doc_id"].to_pylist()
        rows = {k: [] for k in ("doc_id", "media_ref", "kind", "span_index", "caption")}
        for i, did in enumerate(doc_ids):
            for j in range(offsets[i], offsets[i + 1]):
                if refs[j]:
                    rows["doc_id"].append(did)
                    rows["media_ref"].append(refs[j])
                    rows["kind"].append(kinds[j])
                    rows["span_index"].append(j - offsets[i])
                    rows["caption"].append(texts[j])
        return pa.Table.from_arrays(
            [
                pa.array(rows["doc_id"], type=pa.string()),
                pa.array(rows["media_ref"], type=pa.string()),
                pa.array(rows["kind"], type=pa.string()),
                pa.array(rows["span_index"], type=pa.int32()),
                pa.array(rows["caption"], type=pa.string()),
            ],
            schema=MEDIA_SCHEMA,
        )

    return docs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


class DecodeMedia:
    """Actor-pool decode stage: (media_ref, kind) → binary payload + metadata.

    STUB: the real decoder (image/audio/video libraries) is unavailable in
    this container. ``fake=True`` yields a deterministic pseudo-payload
    (seeded by media_ref) with plausible metadata so downstream stages are
    exercised end-to-end; ``fake=False`` raises NotImplementedError.
    """

    def __init__(self, fake: bool = False, payload_bytes: int = 256):
        self.fake = fake
        self.payload_bytes = payload_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "media decode requires image/audio codecs not present in this "
                "environment; construct DecodeMedia(fake=True) for the "
                "deterministic test payload"
            )
        refs = batch["media_ref"].to_pylist()
        payloads, widths, heights = [], [], []
        for r in refs:
            seed = int.from_bytes(hashlib.md5(r.encode()).digest()[:4], "little")
            rng = np.random.default_rng(seed)
            payloads.append(rng.integers(0, 256, self.payload_bytes, dtype=np.uint8).tobytes())
            widths.append(int(64 + seed % 512))
            heights.append(int(64 + (seed >> 9) % 512))
        out = batch.append_column("payload", pa.array(payloads, type=pa.binary()))
        out = out.append_column("width", pa.array(widths, type=pa.int32()))
        return out.append_column("height", pa.array(heights, type=pa.int32()))


class MediaFeatures:
    """Actor-pool feature extraction over decoded payload bytes:
    byte-histogram embedding (the stand-in for a CNN/CLIP encoder)."""

    def __init__(self, dim: int = 32):
        self.dim = dim

    def __call__(self, batch: pa.Table) -> dict:
        payloads = batch["payload"].to_pylist()
        feats = np.zeros((len(payloads), self.dim), dtype=np.float32)
        for i, p in enumerate(payloads):
            arr = np.frombuffer(p, dtype=np.uint8)
            hist = np.bincount(arr % self.dim, minlength=self.dim).astype(np.float32)
            n = np.linalg.norm(hist)
            feats[i] = hist / n if n else hist
        out = {
            "media_ref": batch["media_ref"].to_numpy(zero_copy_only=False),
            "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
            "feature": feats,
        }
        if "frame_index" in batch.column_names:  # per-frame feature rows
            out["frame_index"] = batch["frame_index"].to_numpy(zero_copy_only=False)
        return out


class ResizeMedia:
    """Actor-pool resize stage: decoded payload → fixed-target payload.

    STUB on the pixel math (no imaging libraries in this container): the
    deterministic stand-in downsamples the payload bytes by striding to the
    target byte budget and rewrites width/height to the target box, keeping
    aspect ratio — the Ray-side contract (binary in/out, metadata update,
    small batches, actor state holding the target config) is the real one.
    """

    def __init__(self, target: int = 224, byte_budget: int = 128):
        self.target = target
        self.byte_budget = byte_budget

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        ws = batch["width"].to_pylist()
        hs = batch["height"].to_pylist()
        out_p, out_w, out_h = [], [], []
        for p, w, h in zip(payloads, ws, hs):
            arr = np.frombuffer(p, dtype=np.uint8)
            stride = max(1, len(arr) // self.byte_budget)
            out_p.append(arr[::stride][: self.byte_budget].tobytes())
            scale = self.target / max(w, h)
            out_w.append(int(round(w * min(scale, 1.0))))
            out_h.append(int(round(h * min(scale, 1.0))))
        out = batch.drop_columns(["payload", "width", "height"])
        out = out.append_column("payload", pa.array(out_p, type=pa.binary()))
        out = out.append_column("width", pa.array(out_w, type=pa.int32()))
        return out.append_column("height", pa.array(out_h, type=pa.int32()))


class FrameSampler:
    """Actor-pool frame-sampling stage: one media payload → N frame rows
    (flat_map semantics — output has more rows than input).

    STUB on the codec (no ffmpeg here): frames are deterministic equal-length
    slices of the payload; a real backend swaps the slicing for keyframe
    decode at the same interface. Frame rows carry (media_ref, frame_index,
    payload) so downstream feature extraction runs per frame unchanged.
    """

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        docs = batch["doc_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        rows = {"doc_id": [], "media_ref": [], "frame_index": [], "payload": []}
        for did, ref, p in zip(docs, refs, payloads):
            arr = np.frombuffer(p, dtype=np.uint8)
            step = max(1, len(arr) // self.n_frames)
            for f in range(self.n_frames):
                rows["doc_id"].append(did)
                rows["media_ref"].append(ref)
                rows["frame_index"].append(f)
                rows["payload"].append(arr[f * step : (f + 1) * step].tobytes())
        return pa.Table.from_arrays(
            [
                pa.array(rows["doc_id"], type=pa.string()),
                pa.array(rows["media_ref"], type=pa.string()),
                pa.array(rows["frame_index"], type=pa.int32()),
                pa.array(rows["payload"], type=pa.binary()),
            ],
            names=["doc_id", "media_ref", "frame_index", "payload"],
        )


def media_feature_pipeline(
    docs: "ray.data.Dataset", fake_decode: bool = True, batch_size: int = 32,
    concurrency: int = 2, resize: bool = False,
) -> "ray.data.Dataset":
    """inventory → decode (actor pool, small batches) [→ resize] → features."""
    inv = media_inventory(docs)
    decoded = inv.map_batches(
        DecodeMedia, fn_constructor_kwargs={"fake": fake_decode},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )
    if resize:
        decoded = decoded.map_batches(
            ResizeMedia, batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency,
        )
    return decoded.map_batches(
        MediaFeatures, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_sample_pipeline(
    docs: "ray.data.Dataset", n_frames: int = 4, fake_decode: bool = True,
    batch_size: int = 32, concurrency: int = 2,
) -> "ray.data.Dataset":
    """inventory → decode → frame-sample (1→N rows) → per-frame features."""
    inv = media_inventory(docs)
    decoded = inv.map_batches(
        DecodeMedia, fn_constructor_kwargs={"fake": fake_decode},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )
    frames = decoded.map_batches(
        FrameSampler, fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )
    return frames.map_batches(
        MediaFeatures, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )
