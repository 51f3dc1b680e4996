"""Deterministic synthetic interleaved-span corpus with known ground truth.

Generates the BASELINE.json input shape::

    doc_id: string
    spans:  list<struct<kind, text, media_ref, offset>>

Documents are templated research-paper-like texts over a closed entity
vocabulary (methods/concepts/datasets/metrics/authors/tasks mirroring the
reference's 7 node types), with deliberate:

- case/whitespace variants of labels (exercises normalization,
  reference: src/agents/validation_agent.py:96-119),
- alias mentions ("3DGS" for "3D Gaussian Splatting") — exercises the
  entity-linking + union-find canonicalization stage,
- one hot entity in ~30% of docs (exercises skew handling in blocking,
  reference hazard: src/services/graph_service.py:207-255),
- control characters in a few spans (exercises the sanitizer,
  reference: src/utils/text_sanitizer.py:24-30),
- interleaved media spans (figure/table) with media_ref payloads,
- overlapping entity sets across docs so cross-doc linking fires
  (reference blocking: src/services/graph_service.py:231-284).

Everything is seeded and reproducible; no external data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..schemas import DOCS_SCHEMA, SPAN_STRUCT

# ---------------------------------------------------------------------------
# Closed entity vocabulary (3DGS-ish domain, mirroring the reference corpus)
# ---------------------------------------------------------------------------

METHODS = [
    "3D Gaussian Splatting",
    "Instant NGP",
    "Mip Splatting",
    "NeRF",
    "Plenoxels",
    "Scaffold GS",
    "Zip NeRF",
    "Gaussian Avatars",
]
HOT_METHOD = "3D Gaussian Splatting"  # appears in ~30% of docs

CONCEPTS = [
    "Adaptive Density Control",
    "Neural Rendering",
    "Spherical Harmonics",
    "Volumetric Rendering",
    "Differentiable Rasterization",
    "Level Of Detail",
]

DATASETS = [
    "MipNeRF-360",
    "Tanks And Temples",
    "Deep Blending",
    "DTU",
    "Synthetic NeRF",
]

METRICS = ["PSNR", "SSIM", "LPIPS", "FPS"]

AUTHORS = [
    "Alice Zhang",
    "Bob Keller",
    "Carol Mendez",
    "David Okoro",
    "Elena Petrova",
    "Farid Hassan",
    "Grace Liu",
    "Hiro Tanaka",
    "Ines Moreau",
    "Jonas Weber",
]

TASKS = [
    "Novel View Synthesis",
    "Dynamic Scene Reconstruction",
    "Surface Reconstruction",
    "Relighting",
]

# Publication metadata ground truth (reference papers table fields:
# src/graph/models.py:57-67 — year/venue; parsed by stages/metadata.py)
VENUES = ["CVPR", "ICCV", "ECCV", "SIGGRAPH", "NeurIPS"]
YEAR_RANGE = (2015, 2025)

# alias surface form -> canonical vocabulary label (entity-linking ground truth)
ALIASES = {
    "3DGS": "3D Gaussian Splatting",
    "INGP": "Instant NGP",
    "ZipNeRF": "Zip NeRF",
}

VOCAB = {
    "method": METHODS + [a for a, c in ALIASES.items()],
    "concept": CONCEPTS,
    "dataset": DATASETS,
    "metric": METRICS,
    "author": AUTHORS,
    "task": TASKS,
}


def _mention(rng: np.random.Generator, label: str) -> str:
    """Render a label with injected case/whitespace noise (deterministic)."""
    r = rng.random()
    if r < 0.15:
        label = label.lower()
    elif r < 0.20:
        label = label.upper() if len(label) <= 6 else label
    if rng.random() < 0.10:
        parts = label.split(" ")
        if len(parts) > 1:
            label = "  ".join(parts)  # double internal spaces
    return label


def _method_mention(rng: np.random.Generator, label: str) -> str:
    """A method mention: sometimes via its alias surface form."""
    for alias, canon in ALIASES.items():
        if canon == label and rng.random() < 0.25:
            return alias
    return _mention(rng, label)


def generate_doc(
    i: int,
    seed: int = 42,
    media_prob: float = 0.5,
    ctrl_char_prob: float = 0.05,
) -> tuple[str, list[dict]]:
    """Generate document ``i`` (independent per-doc RNG stream → any subset of
    the corpus can be generated on any worker, order-free)."""
    rng = np.random.default_rng((seed << 20) + i)
    doc_id = f"doc-{i:06d}"
    if True:
        n_methods = int(rng.integers(1, 4))
        methods = list(rng.choice(METHODS, size=n_methods, replace=False))
        if HOT_METHOD not in methods and rng.random() < 0.30:
            methods.append(HOT_METHOD)
        primary = methods[0]
        datasets = list(rng.choice(DATASETS, size=int(rng.integers(1, 3)), replace=False))
        metrics = list(rng.choice(METRICS, size=int(rng.integers(1, 3)), replace=False))
        concepts = list(rng.choice(CONCEPTS, size=int(rng.integers(1, 3)), replace=False))
        authors = list(rng.choice(AUTHORS, size=int(rng.integers(2, 4)), replace=False))
        task = str(rng.choice(TASKS))

        sentences: list[str] = []
        sentences.append(f"We introduce {_mention(rng, concepts[0])} for {_mention(rng, task)}.")
        for m in methods[1:]:
            verb = rng.choice(["improves on", "is compared with"])
            sentences.append(f"{_method_mention(rng, primary)} {verb} {_method_mention(rng, m)}.")
        for d in datasets:
            verb = rng.choice(["uses", "is evaluated on"])
            sentences.append(f"{_method_mention(rng, primary)} {verb} {_mention(rng, d)}.")
        for mt in metrics:
            sentences.append(f"{_method_mention(rng, primary)} achieves strong {_mention(rng, mt)}.")
        for c in concepts[1:]:
            sentences.append(f"The approach builds on {_mention(rng, c)}.")
        rng.shuffle(sentences)

        if rng.random() < ctrl_char_prob:
            k = int(rng.integers(0, len(sentences)))
            sentences[k] = sentences[k].replace(" ", " \x00", 1)

        spans: list[dict] = []
        offset = 0

        def add_span(kind: str, text: str, media_ref: str = "") -> None:
            nonlocal offset
            spans.append(
                {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}
            )
            offset += max(len(text), 1)

        add_span("title", f"{_method_mention(rng, primary)}: A Study in {task}")
        add_span(
            "abstract",
            f"We present {_method_mention(rng, primary)}, evaluated on {_mention(rng, datasets[0])}.",
        )
        venue = str(rng.choice(VENUES))
        year = int(rng.integers(YEAR_RANGE[0], YEAR_RANGE[1]))
        add_span("text", f"Published at {venue} ({year}).")
        # interleave body sentences with media spans
        per_span = max(1, len(sentences) // 3)
        media_i = 0
        for s0 in range(0, len(sentences), per_span):
            add_span("text", " ".join(sentences[s0 : s0 + per_span]))
            if rng.random() < media_prob:
                kind = str(rng.choice(["figure", "table"]))
                add_span(
                    kind,
                    f"{kind.capitalize()} {media_i}: results of {_method_mention(rng, primary)}.",
                    media_ref=f"media://{doc_id}/{media_i}",
                )
                media_i += 1
        add_span("text", "Authored by " + ", ".join(authors) + ".")

    return doc_id, spans


def generate_documents_for_ids(ids, seed: int = 42) -> pa.Table:
    """Span-corpus table for an explicit id list (worker-side generation)."""
    doc_ids, all_spans = [], []
    for i in ids:
        doc_id, spans = generate_doc(int(i), seed=seed)
        doc_ids.append(doc_id)
        all_spans.append(spans)
    spans_arr = pa.array(all_spans, type=pa.list_(SPAN_STRUCT))
    return pa.Table.from_arrays(
        [pa.array(doc_ids, type=pa.string()), spans_arr], schema=DOCS_SCHEMA
    )


def generate_documents(n_docs: int, seed: int = 42, start: int = 0) -> pa.Table:
    """Build an interleaved-span corpus table of ``n_docs`` rows."""
    return generate_documents_for_ids(range(start, start + n_docs), seed=seed)


def write_corpus(path: str, n_docs: int, seed: int = 42) -> str:
    """Write a corpus to a parquet file; returns the path."""
    import pyarrow.parquet as pq

    table = generate_documents(n_docs, seed=seed)
    pq.write_table(table, path)
    return path


def write_corpus_parallel(out_dir: str, n_docs: int, seed: int = 42) -> str:
    """Generate the corpus in parallel with Ray Data and write partitioned
    parquet (one file set per block) — the benchmark-scale path."""
    import ray.data

    ds = ray.data.range(n_docs, override_num_blocks=max(8, n_docs // 2000))
    out = ds.map_batches(
        lambda b: generate_documents_for_ids(b["id"], seed=seed),
        batch_format="numpy",
    )
    out.write_parquet(out_dir)
    return out_dir
