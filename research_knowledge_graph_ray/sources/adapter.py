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
