"""File-based corpus loaders (reference S1-S3) as Ray Data readers.

- JSON paper dicts → span documents (reference: src/main.py:86-119)
- plain text files → span documents (reference: src/utils/pdf.py:39-60)
- PDF extraction is gated behind an import-try (no PDF library in this
  container; reference: src/utils/pdf.py:13-36) — the reader raises a clear
  NotImplementedError rather than silently skipping.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..functions.text import spans_from_text
from ..schemas import DOCS_SCHEMA, SPAN_STRUCT


def _docs_table(doc_ids: list[str], span_lists: list[list[dict]]) -> pa.Table:
    return pa.Table.from_arrays(
        [
            pa.array(doc_ids, type=pa.string()),
            pa.array(span_lists, type=pa.list_(SPAN_STRUCT)),
        ],
        schema=DOCS_SCHEMA,
    )


def read_json_corpus(path: str, chunk_size: int = 2000, overlap: int = 200) -> "ray.data.Dataset":
    """Directory/file of JSON paper dicts → span documents.

    Each record needs ``text`` (or title+abstract fallback, mirroring
    ``ingest_from_dict``, reference: src/agents/paper_ingestion_agent.py:59-101)
    and optionally ``title``/``abstract``; doc_id comes from ``arxiv_id``,
    ``doi`` or the row index."""
    ds = ray.data.read_json(path)

    def to_spans(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        doc_ids, span_lists = [], []
        for i, row in enumerate(rows):
            doc_id = str(row.get("arxiv_id") or row.get("doi") or row.get("id") or f"json-{i}")
            text = row.get("text") or " ".join(
                filter(None, [row.get("title"), row.get("abstract")])
            )
            spans, offset = [], 0
            for kind in ("title", "abstract"):
                v = row.get(kind)
                if v:
                    spans.append({"kind": kind, "text": v, "media_ref": "", "offset": offset})
                    offset += max(len(v), 1)
            for s in spans_from_text(doc_id, text or "", chunk_size, overlap):
                s["offset"] = offset
                offset += max(len(s["text"]), 1)
                spans.append(s)
            doc_ids.append(doc_id)
            span_lists.append(spans)
        return _docs_table(doc_ids, span_lists)

    return ds.map_batches(to_spans, batch_format="pyarrow")


def read_jsonl_corpus(path: str, chunk_size: int = 2000,
                      overlap: int = 200) -> "ray.data.Dataset":
    """Dolma/LLM-corpus-style JSONL (one object per line, optionally
    .gz-compressed) → span documents. The de-facto interchange format for
    web-scale training corpora: each record carries ``text`` plus an ``id``
    (fallback: ``doc_id``; both honored even when falsy, e.g. integer id 0)
    and optional ``source`` / ``metadata`` fields, which are ignored here —
    only identity and text enter the span stream. Records with NO id field
    are identified by their CONTENT (md5 of the text): deterministic and
    block-boundary-independent, with the stated consequence that id-less
    records with byte-identical text share a doc_id (content-addressed
    semantics — the dedup family treats them as the duplicates they are).
    ray.data.read_json handles line-delimited JSON and transparent gzip by
    extension; blocks stream straight into the chunker (same 2000/200
    sentence-snap semantics as every other loader)."""
    import hashlib

    ds = ray.data.read_json(path)

    def to_spans(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        doc_ids, span_lists = [], []
        for row in rows:
            text = row.get("text") or ""
            rid = row.get("id")
            if rid is None:
                rid = row.get("doc_id")
            doc_id = (str(rid) if rid is not None
                      else "jsonl-"
                      + hashlib.md5(text.encode()).hexdigest()[:16])
            doc_ids.append(doc_id)
            span_lists.append(
                spans_from_text(doc_id, text, chunk_size, overlap))
        return _docs_table(doc_ids, span_lists)

    return ds.map_batches(to_spans, batch_format="pyarrow")


def read_csv_corpus(path: str, text_col: str = "text",
                    id_col: str = "doc_id", chunk_size: int = 2000,
                    overlap: int = 200) -> "ray.data.Dataset":
    """CSV corpus → span documents: ``text_col`` holds the document text,
    ``id_col`` the identity (rows without one are content-addressed — md5
    of the text, the read_jsonl_corpus convention incl. its identical-text
    consequence). Completes the loader family (json / jsonl / text /
    pdf-gated / parquet / lance-gated) with the remaining ubiquitous
    tabular interchange format."""
    import hashlib

    ds = ray.data.read_csv(path)

    def to_spans(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        doc_ids, span_lists = [], []
        for row in rows:
            text = str(row.get(text_col) or "")
            doc_id = str(row.get(id_col)
                         if row.get(id_col) is not None
                         else "csv-"
                         + hashlib.md5(text.encode()).hexdigest()[:16])
            doc_ids.append(doc_id)
            span_lists.append(
                spans_from_text(doc_id, text, chunk_size, overlap))
        return _docs_table(doc_ids, span_lists)

    return ds.map_batches(to_spans, batch_format="pyarrow")


def read_text_corpus(paths, chunk_size: int = 2000, overlap: int = 200) -> "ray.data.Dataset":
    """Plain-text files → span documents (doc_id = file path)."""
    ds = ray.data.read_binary_files(paths, include_paths=True)

    def to_spans(batch: pa.Table) -> pa.Table:
        doc_ids, span_lists = [], []
        for row in batch.to_pylist():
            path, payload = row["path"], row["bytes"]
            if path.lower().endswith(".pdf"):
                text = extract_text_from_pdf(payload)
            else:
                text = payload.decode("utf-8", errors="replace")
            doc_ids.append(path)
            span_lists.append(spans_from_text(path, text, chunk_size, overlap))
        return _docs_table(doc_ids, span_lists)

    return ds.map_batches(to_spans, batch_format="pyarrow")


def extract_text_from_pdf(payload: bytes) -> str:
    """PDF → concatenated page text. Gated on an optional dependency."""
    try:
        import pypdf  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "PDF extraction requires a PDF library (pypdf) that is not "
            "installed in this environment"
        ) from e
    import io

    reader = pypdf.PdfReader(io.BytesIO(payload))
    return "\n".join(page.extract_text() or "" for page in reader.pages)


def read_lance_corpus(path: str) -> "ray.data.Dataset":
    """Interleaved-span corpus from a Lance dataset (the north rule's native
    input format, BASELINE.json input_hint).

    Gated on the optional ``lance`` package (absent in this container — the
    parquet tables under /root/testdata are the stand-in, same schema). When
    available this is a zero-copy columnar scan exactly like read_parquet:
    Lance fragments → Arrow blocks, column projection pushed to the source."""
    try:
        import lance  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "Lance input requires the 'lance' package, which is not installed "
            "in this environment; use the parquet stand-in tables "
            "(identical schema) via read_parquet"
        ) from e
    return ray.data.read_lance(path, columns=["doc_id", "spans"])


def write_lance_table(ds: "ray.data.Dataset", path: str) -> None:
    """Materialize a node/edge table as a Lance dataset (gated like
    :func:`read_lance_corpus`); parquet sinks are the stand-in here."""
    try:
        import lance  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "Lance output requires the 'lance' package, which is not "
            "installed in this environment; write_parquet is the stand-in"
        ) from e
    ds.write_lance(path)


def write_jsonl(ds: "ray.data.Dataset", out_dir: str) -> None:
    """Write a Dataset as partitioned JSON-Lines (the LLM-training-data
    interchange format): one ``.jsonl`` file per block under ``out_dir``,
    written by the workers in parallel — the same resumable many-files
    layout as the parquet sinks, never one giant file. Uses Ray Data's
    native JSON datasink (pandas ``to_json(lines=True)`` per block)."""
    ds.write_json(out_dir)


def read_jsonl(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Read a JSONL file/directory back as a Dataset. Column pruning happens
    post-parse (JSON is row-major — unlike parquet there is no column
    projection at the byte level; that asymmetry is WHY the pipeline's
    internal format is parquet and JSONL is only the interchange edge)."""
    ds = ray.data.read_json(path)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds
