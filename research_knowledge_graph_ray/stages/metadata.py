"""Document-metadata extraction stage (reference M1/M11 analogue).

The reference extracts rich paper metadata with an LLM call per paper
(reference: src/agents/paper_ingestion_agent.py:103-185) and builds a typed
paper node with ~15 properties (src/services/ingestion_service.py:176-222);
the papers side table stores title/abstract/year/venue
(reference: src/graph/models.py:57-67, sql/schema.sql:46-57). Here a
deterministic rule-based extractor reads the structured span layout:
title/abstract spans, the "Authored by …" byline, the
"Published at <venue> (<year>)." line, media counts — behind the same actor
interface an LLM metadata extractor would use.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray.data

from ..functions.normalize import sanitize_string

DOC_META_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("title", pa.string()),
        ("abstract", pa.string()),
        ("authors", pa.list_(pa.string())),
        ("year", pa.int32()),          # null when no publication line present
        ("venue", pa.string()),        # "" when no publication line present
        ("n_spans", pa.int32()),
        ("n_media", pa.int32()),
        ("n_chars", pa.int64()),
    ]
)

_BYLINE_RE = re.compile(r"Authored by ([^.]+)\.")
_PUBLINE_RE = re.compile(r"Published at ([^()]+?) \((\d{4})\)\.")


def doc_meta_from_spans(doc_id: str, kinds: list, texts: list, refs: list) -> dict:
    """Pure per-document metadata core (shared with the sequential oracle)."""
    title = abstract = ""
    venue = ""
    year = None
    authors: list[str] = []
    n_media = n_chars = 0
    for kind, text, ref in zip(kinds, texts, refs):
        n_chars += len(text)
        if ref:
            n_media += 1
        if kind == "title" and not title:
            title = sanitize_string(text)
        elif kind == "abstract" and not abstract:
            abstract = sanitize_string(text)
        else:
            m = _BYLINE_RE.search(text)
            if m and not authors:
                authors = [a.strip() for a in m.group(1).split(",") if a.strip()]
            p = _PUBLINE_RE.search(text)
            if p and year is None:
                venue = sanitize_string(p.group(1))
                year = int(p.group(2))
    return {
        "doc_id": doc_id, "title": title, "abstract": abstract,
        "authors": authors, "year": year, "venue": venue,
        "n_spans": len(kinds), "n_media": n_media, "n_chars": n_chars,
    }


class MetadataExtractor:
    """Actor-pool stage: span docs batch → DOC_META_SCHEMA rows."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..schemas import flatten_spans

        flat, offsets = flatten_spans(batch)
        kinds = flat.field("kind").to_pylist()
        texts = flat.field("text").to_pylist()
        refs = flat.field("media_ref").to_pylist()
        rows = []
        for i, doc_id in enumerate(batch["doc_id"].to_pylist()):
            lo, hi = offsets[i], offsets[i + 1]
            rows.append(
                doc_meta_from_spans(doc_id, kinds[lo:hi], texts[lo:hi], refs[lo:hi])
            )
        return pa.Table.from_arrays(
            [pa.array([r[f.name] for r in rows], type=f.type) for f in DOC_META_SCHEMA],
            schema=DOC_META_SCHEMA,
        )


_EXTRACTOR_CACHE: list = []


def extract_doc_meta(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Stateless-task metadata extraction (per-process extractor cache).

    The deterministic extractor's only state is compiled regexes; an actor
    pool would also risk starving the upstream read on small clusters when
    the pool reserves every CPU. A model-backed extractor should use
    ``map_batches(MetadataExtractor, concurrency=...)`` with a pool sized
    below the cluster CPU count."""

    def extract(batch: pa.Table) -> pa.Table:
        if not _EXTRACTOR_CACHE:
            _EXTRACTOR_CACHE.append(MetadataExtractor())
        return _EXTRACTOR_CACHE[0](batch)

    return docs.map_batches(extract, batch_format="pyarrow", zero_copy_batch=True)
