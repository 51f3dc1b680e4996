"""Document-metadata extraction stage (reference M1/M11 analogue).

The reference extracts rich paper metadata with an LLM call per paper
(reference: src/agents/paper_ingestion_agent.py:103-185) and builds a typed
paper node (src/services/ingestion_service.py:176-222). Here a deterministic
rule-based extractor reads the structured span layout: title/abstract spans,
the "Authored by …" byline, media counts — behind the same actor interface an
LLM metadata extractor would use.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray.data

DOC_META_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("title", pa.string()),
        ("abstract", pa.string()),
        ("authors", pa.list_(pa.string())),
        ("n_spans", pa.int32()),
        ("n_media", pa.int32()),
        ("n_chars", pa.int64()),
    ]
)


class MetadataExtractor:
    """Actor-pool stage: span docs batch → DOC_META_SCHEMA rows."""

    def __init__(self):
        self.byline = re.compile(r"Authored by ([^.]+)\.")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..schemas import flatten_spans

        flat, offsets = flatten_spans(batch)
        kinds = flat.field("kind").to_pylist()
        texts = flat.field("text").to_pylist()
        refs = flat.field("media_ref").to_pylist()
        out = {k: [] for k in ("doc_id", "title", "abstract", "authors",
                               "n_spans", "n_media", "n_chars")}
        for i, doc_id in enumerate(batch["doc_id"].to_pylist()):
            lo, hi = offsets[i], offsets[i + 1]
            title = abstract = ""
            authors: list[str] = []
            n_media = n_chars = 0
            for j in range(lo, hi):
                n_chars += len(texts[j])
                if refs[j]:
                    n_media += 1
                if kinds[j] == "title" and not title:
                    title = texts[j]
                elif kinds[j] == "abstract" and not abstract:
                    abstract = texts[j]
                else:
                    m = self.byline.search(texts[j])
                    if m:
                        authors = [a.strip() for a in m.group(1).split(",") if a.strip()]
            out["doc_id"].append(doc_id)
            out["title"].append(title)
            out["abstract"].append(abstract)
            out["authors"].append(authors)
            out["n_spans"].append(hi - lo)
            out["n_media"].append(n_media)
            out["n_chars"].append(n_chars)
        return pa.Table.from_arrays(
            [pa.array(out[f.name], type=f.type) for f in DOC_META_SCHEMA],
            schema=DOC_META_SCHEMA,
        )


_EXTRACTOR_CACHE: list = []


def extract_doc_meta(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Stateless-task metadata extraction (per-process extractor cache).

    The deterministic extractor's only state is one compiled regex; an actor
    pool would also risk starving the upstream read on small clusters when
    the pool reserves every CPU. A model-backed extractor should use
    ``map_batches(MetadataExtractor, concurrency=...)`` with a pool sized
    below the cluster CPU count."""

    def extract(batch: pa.Table) -> pa.Table:
        if not _EXTRACTOR_CACHE:
            _EXTRACTOR_CACHE.append(MetadataExtractor())
        return _EXTRACTOR_CACHE[0](batch)

    return docs.map_batches(extract, batch_format="pyarrow", zero_copy_batch=True)
