"""Adapters: external flat document tables → the interleaved-span input shape.

The driver's testdata ``documents`` table is ``(doc_id:int64, text, lang,
source, n_chars)``; the engine's input contract is ``(doc_id:string,
spans:list<struct<kind,text,media_ref,offset>>)``. The adapter wraps each text
into a single text span, preserving content byte-for-byte so the span-sequence
invariant is trivially checkable against the source table.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..schemas import DOCS_SCHEMA, SPAN_STRUCT


def flat_batch_to_spans(batch: pa.Table) -> pa.Table:
    """(doc_id:any, text:string) batch → DOCS_SCHEMA batch (one span per doc)."""
    n = batch.num_rows
    doc_ids = batch["doc_id"].cast(pa.string())
    texts = batch["text"]
    offsets = pa.array(range(0, n + 1), type=pa.int32())
    spans = pa.ListArray.from_arrays(
        offsets,
        pa.StructArray.from_arrays(
            [
                pa.array(["text"] * n, type=pa.string()),
                texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts,
                pa.array([""] * n, type=pa.string()),
                pa.array([0] * n, type=pa.int32()),
            ],
            fields=list(SPAN_STRUCT),
        ),
    )
    return pa.Table.from_arrays(
        [doc_ids.combine_chunks() if isinstance(doc_ids, pa.ChunkedArray) else doc_ids, spans],
        schema=DOCS_SCHEMA,
    )


def read_flat_documents_as_spans(sf_dir: str) -> "ray.data.Dataset":
    """Read ``{sf_dir}/documents.parquet`` and lift it into span form.

    Column-pruned at the read (only doc_id + text leave storage).
    """
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(flat_batch_to_spans, batch_format="pyarrow", zero_copy_batch=True)


# Deterministic media synthesis over the flat corpus (SQL-restatable so the
# media KG is oracle-gatable): every even doc_id carries one media span whose
# caption is the first MEDIA_CAPTION_CHARS characters of the text, kind
# 'table' when doc_id % 6 == 0 else 'figure', media_ref 'fig:<doc_id>'.
MEDIA_CAPTION_CHARS = 96


def flat_batch_to_spans_with_media(batch: pa.Table) -> pa.Table:
    """(doc_id:int64, text) batch → DOCS_SCHEMA batch where even doc_ids get
    a second, media span (deterministic figure/table synthesis above)."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    kinds, span_texts, refs, offs, offsets = [], [], [], [], [0]
    for did, text in zip(doc_ids, texts):
        kinds.append("text")
        span_texts.append(text)
        refs.append("")
        offs.append(0)
        if did % 2 == 0:
            kinds.append("table" if did % 6 == 0 else "figure")
            span_texts.append(text[:MEDIA_CAPTION_CHARS])  # the caption
            refs.append(f"fig:{did}")
            offs.append(1)
        offsets.append(len(kinds))
    spans = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()),
        pa.StructArray.from_arrays(
            [
                pa.array(kinds, type=pa.string()),
                pa.array(span_texts, type=pa.string()),
                pa.array(refs, type=pa.string()),
                pa.array(offs, type=pa.int32()),
            ],
            fields=list(SPAN_STRUCT),
        ),
    )
    return pa.Table.from_arrays(
        [pa.array([str(d) for d in doc_ids], type=pa.string()), spans],
        schema=DOCS_SCHEMA,
    )


def read_flat_documents_with_media(sf_dir: str) -> "ray.data.Dataset":
    """Span-form corpus with the deterministic media synthesis applied."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        flat_batch_to_spans_with_media, batch_format="pyarrow", zero_copy_batch=True
    )
