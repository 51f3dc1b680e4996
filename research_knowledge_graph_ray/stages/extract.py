"""Mention detection + (subj, pred, obj) triple extraction over span documents.

This is the engine's flagship stateful stage: the Ray-native analogue of the
reference's per-paper LLM extraction call
(reference: src/agents/entity_extraction_agent.py:24-182). Production would
hold an LLM client per actor; this build ships a *deterministic* rule-based
backend behind the same actor interface — the precedent is the reference's own
DEBUG mode which swaps the LLM for a canned deterministic result
(reference: src/agents/entity_extraction_agent.py:184-314, src/config.py:41).

Design:
- ``TripleExtractor`` is a callable class → Ray actor pool via
  ``ds.map_batches(TripleExtractor, concurrency=N, batch_size=B)``. Pattern
  compilation happens ONCE per actor in ``__init__``; ``__call__`` processes a
  zero-copy Arrow batch and emits RECORDS_SCHEMA rows (a single unified stream:
  doc→entity structural records + entity→entity relational triples).
- ``extract_doc_records`` is the pure per-document core, shared with the
  sequential test oracle so engine-vs-oracle differences isolate the
  *distributed orchestration*, not the extraction rules.

Structural-record semantics mirror the reference's ingestion step 6: each
extracted entity yields a doc→entity edge, AUTHORED_BY for authors and
INTRODUCES otherwise, confidence 1.0
(reference: src/services/ingestion_service.py:131-147). Per-document entity
dedup is case-insensitive first-wins on the normalized label
(reference: src/agents/validation_agent.py:56-94).
"""

from __future__ import annotations

import json
import os
import re
from typing import Iterable

import pyarrow as pa

from ..functions.normalize import normalize_label, label_key, sanitize_string
from ..schemas import RECORDS_SCHEMA
from ..sources.corpus import VOCAB

# ---------------------------------------------------------------------------
# Pattern construction
# ---------------------------------------------------------------------------


def _term_pattern(term: str) -> str:
    """Regex for one vocab term: whitespace-collapse tolerant, word-bounded."""
    return r"\b" + r"\s+".join(re.escape(w) for w in term.split()) + r"\b"


def _alternation(terms: Iterable[str]) -> str:
    """Alternation sorted longest-first so the longest term wins at a position."""
    ordered = sorted(terms, key=len, reverse=True)
    return "(?:" + "|".join(_term_pattern(t) for t in ordered) + ")"


def compile_patterns(vocab: dict[str, list[str]] | None = None):
    """Compile mention + triple patterns for a typed vocabulary.

    Returns ``(mention_res, triple_res)`` where ``mention_res`` maps
    entity_type → compiled alternation regex and ``triple_res`` is a list of
    ``(pred, confidence, compiled_regex)`` with named groups ``s`` and ``o``.
    """
    vocab = vocab or VOCAB
    mention_res = {
        etype: re.compile(_alternation(terms), re.IGNORECASE)
        for etype, terms in vocab.items()
        if terms
    }
    m = _alternation(vocab.get("method", []))
    d = _alternation(vocab.get("dataset", []))
    mt = _alternation(vocab.get("metric", []))
    flags = re.IGNORECASE
    triple_res = [
        ("IMPROVES_ON", 0.9, re.compile(rf"(?P<s>{m})\s+improves\s+on\s+(?P<o>{m})", flags)),
        ("COMPARES_WITH", 0.8, re.compile(rf"(?P<s>{m})\s+is\s+compared\s+with\s+(?P<o>{m})", flags)),
        ("USES_DATASET", 0.85, re.compile(rf"(?P<s>{m})\s+uses\s+(?P<o>{d})", flags)),
        ("EVALUATES_ON", 0.85, re.compile(rf"(?P<s>{m})\s+is\s+evaluated\s+on\s+(?P<o>{d})", flags)),
        ("EVALUATES_WITH", 0.85, re.compile(rf"(?P<s>{m})\s+achieves\s+strong\s+(?P<o>{mt})", flags)),
    ]
    triple_types = [("method", "method"), ("method", "method"), ("method", "dataset"),
                    ("method", "dataset"), ("method", "metric")]
    triples = [
        (pred, conf, rx, st, ot)
        for (pred, conf, rx), (st, ot) in zip(triple_res, triple_types)
    ]
    return mention_res, triples


# Deterministic order in which entity types are scanned (dedup is first-wins).
TYPE_ORDER = ("method", "dataset", "metric", "concept", "author", "task")


def extract_doc_records(
    doc_id: str,
    text: str,
    mention_res,
    triple_res,
) -> list[tuple]:
    """Per-document extraction core (pure; shared with the sequential oracle).

    Returns RECORDS_SCHEMA tuples:
    ``(doc_id, subj_type, subj_label, pred, obj_type, obj_label, confidence,
    rationale, evidence_span)``.
    """
    records: list[tuple] = []

    # 1. mention detection + per-doc case-insensitive first-wins dedup
    seen: set[tuple[str, str]] = set()
    for etype in TYPE_ORDER:
        rx = mention_res.get(etype)
        if rx is None:
            continue
        for match in rx.finditer(text):
            raw = match.group(0)
            k = (etype, label_key(normalize_label(raw)))
            if k in seen:
                continue
            seen.add(k)
            pred = "AUTHORED_BY" if etype == "author" else "INTRODUCES"
            # entity properties from the first (surviving) surface form — the
            # reference's per-entity description + properties, sanitized
            # before entering the record stream (validation_agent.py:79-86);
            # description derives from these at node finalize
            props = json.dumps({"etype": etype, "surface": sanitize_string(raw)})
            records.append(
                (doc_id, "paper", doc_id, pred, etype, raw, 1.0,
                 f"mention:{etype}", raw, props)
            )

    # 2. relational triples from surface patterns; endpoints are necessarily
    #    detected mentions (same alternations), satisfying the reference's
    #    "drop triples with unresolved endpoints" invariant
    #    (reference: src/services/ingestion_service.py:150-167).
    triple_seen: set[tuple] = set()
    for pred, conf, rx, stype, otype in triple_res:
        for match in rx.finditer(text):
            s_raw, o_raw = match.group("s"), match.group("o")
            k = (pred, stype, label_key(normalize_label(s_raw)),
                 otype, label_key(normalize_label(o_raw)))
            if k in triple_seen:
                continue
            triple_seen.add(k)
            records.append(
                (doc_id, stype, s_raw, pred, otype, o_raw, conf,
                 f"pattern:{pred}", match.group(0), "{}")
            )
    return records


def _doc_spans_from_batch(batch: pa.Table):
    """(doc_ids, kinds, texts, refs, offsets) — one flatten of the span list.

    Works directly on Arrow buffers (no pandas — nested lists must not
    round-trip through object dtype). Span order is the list order."""
    from ..schemas import flatten_spans

    doc_ids = batch["doc_id"].to_pylist()
    flat, offsets = flatten_spans(batch)
    return (doc_ids, flat.field("kind").to_pylist(), flat.field("text").to_pylist(),
            flat.field("media_ref").to_pylist(), offsets)


def _doc_texts_from_batch(batch: pa.Table) -> tuple[list[str], list[str]]:
    """Flatten the span list column into one concatenated text per doc."""
    doc_ids, _kinds, texts, _refs, offsets = _doc_spans_from_batch(batch)
    joined = [
        "\n".join(texts[offsets[i] : offsets[i + 1]]) for i in range(len(doc_ids))
    ]
    return doc_ids, joined


PAPER_META_PRED = "__PAPER_META__"


def meta_record(doc_id: str, kinds: list, texts: list, refs: list) -> tuple:
    """One RECORDS_SCHEMA row carrying the paper node's attrs (description =
    title, properties = abstract/year/venue/authors JSON) — fused into the
    extraction pass so document metadata costs no second corpus scan
    (reference paper-node properties: src/services/ingestion_service.py:176-222).
    Both endpoints are type 'paper', so entity-linking explodes exclude it;
    build_edges filters the pred; build_nodes consumes the attrs."""
    from .metadata import doc_meta_from_spans

    m = doc_meta_from_spans(doc_id, kinds, texts, refs)
    props = json.dumps(
        {"title": m["title"], "abstract": m["abstract"], "year": m["year"],
         "venue": m["venue"], "authors": list(m["authors"])}
    )
    return (doc_id, "paper", doc_id, PAPER_META_PRED, "paper", doc_id, 1.0,
            "paper-meta", "", props)


def records_to_table(records: list[tuple]) -> pa.Table:
    cols = list(zip(*records)) if records else [[] for _ in RECORDS_SCHEMA]
    arrays = [
        pa.array(list(col), type=field.type)
        for col, field in zip(cols, RECORDS_SCHEMA)
    ]
    return pa.Table.from_arrays(arrays, schema=RECORDS_SCHEMA)


# Compute-intensity emulation for scaling measurements ONLY (see BASELINE.md):
# the deterministic extractor costs ~0.1 ms/doc vs the >=100 ms/doc LLM
# extraction of the north star. GRAFT_EXTRACT_REPEAT=R re-runs the per-doc
# extraction R times (discarding extras — output identical) so the benchmark
# can measure scaling at a compute-representative per-doc cost. Default 1.
_EXTRACT_REPEAT = max(1, int(os.environ.get("GRAFT_EXTRACT_REPEAT", "1")))


def _extract_with_meta(batch: pa.Table, mention_res, triple_res,
                       with_meta: bool) -> pa.Table:
    """One flatten serves both extraction and (optionally) paper metadata."""
    doc_ids, kinds, texts, refs, offsets = _doc_spans_from_batch(batch)
    records: list[tuple] = []
    for i, doc_id in enumerate(doc_ids):
        lo, hi = offsets[i], offsets[i + 1]
        joined = "\n".join(texts[lo:hi])
        try:
            for _ in range(_EXTRACT_REPEAT - 1):
                extract_doc_records(doc_id, joined, mention_res, triple_res)
            records.extend(extract_doc_records(doc_id, joined, mention_res, triple_res))
        except Exception as exc:  # noqa: BLE001 — mirror reference tolerance
            records.append(
                (doc_id, "paper", doc_id, "EXTRACTION_FAILED", "status",
                 type(exc).__name__, 0.0, "extractor-error", str(exc)[:200],
                 "{}")
            )
        if with_meta:
            records.append(meta_record(doc_id, kinds[lo:hi], texts[lo:hi], refs[lo:hi]))
    return records_to_table(records)


def _extract_degrading(doc_ids, texts, mention_res, triple_res) -> list[tuple]:
    """Per-doc extraction with the reference's degrade-don't-die semantics:
    a document whose extraction raises yields a single status record
    (``pred='EXTRACTION_FAILED'``) instead of killing the batch/pipeline
    (reference: per-paper try/except continue at src/main.py:132-134, empty
    result on LLM failure at src/agents/entity_extraction_agent.py:179-182).
    Failure rows survive validation, so they are queryable provenance."""
    records: list[tuple] = []
    for doc_id, text in zip(doc_ids, texts):
        try:
            records.extend(extract_doc_records(doc_id, text, mention_res, triple_res))
        except Exception as exc:  # noqa: BLE001 — mirror reference tolerance
            records.append(
                (doc_id, "paper", doc_id, "EXTRACTION_FAILED", "status",
                 type(exc).__name__, 0.0, "extractor-error", str(exc)[:200],
                 "{}")
            )
    return records


class TripleExtractor:
    """Actor-pool extraction stage: span docs batch → RECORDS_SCHEMA batch.

    Use as ``docs.map_batches(TripleExtractor, batch_format="pyarrow",
    batch_size=..., concurrency=...)``. State (compiled patterns; in
    production: the LLM/prompt client, reference ST1 at src/utils/llm.py:15-51)
    is built once per actor here, not per batch.

    For the *deterministic* backend the state is only compiled regexes, so the
    pipeline defaults to the stateless-task form (:func:`extract_batch`) which
    runs on Ray's pre-started worker pool with a per-process pattern cache —
    no actor cold-start. The actor pool is for genuinely heavy state.
    """

    def __init__(self, vocab: dict[str, list[str]] | None = None,
                 with_meta: bool = False):
        self.mention_res, self.triple_res = compile_patterns(vocab)
        self.with_meta = with_meta

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _extract_with_meta(batch, self.mention_res, self.triple_res,
                                  self.with_meta)


_PATTERN_CACHE: dict = {}


def extract_batch(batch: pa.Table, vocab_key: str = "default",
                  vocab: dict[str, list[str]] | None = None,
                  with_meta: bool = False) -> pa.Table:
    """Stateless-task twin of :class:`TripleExtractor` (per-process pattern
    cache keyed by ``vocab_key``)."""
    if vocab_key not in _PATTERN_CACHE:
        _PATTERN_CACHE[vocab_key] = compile_patterns(vocab)
    mention_res, triple_res = _PATTERN_CACHE[vocab_key]
    return _extract_with_meta(batch, mention_res, triple_res, with_meta)
