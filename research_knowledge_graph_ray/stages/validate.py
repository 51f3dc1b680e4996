"""Validation + normalization of extraction records (vectorized map_batches).

Reference semantics reproduced exactly (they define the canonical entity key):
- sanitize strings (src/utils/text_sanitizer.py:6-32),
- label normalization with acronym preservation (src/agents/validation_agent.py:96-119),
- drop records with empty endpoints/predicate (src/agents/validation_agent.py:121-133),
- clamp confidence to [0,1], default 0.5 when missing (src/agents/validation_agent.py:134-138).

Adds derived columns: ``subj_norm, obj_norm, subj_id, obj_id`` where ids are
content hashes (see functions/ids.py) so downstream canonicalization is a pure
groupby rather than the reference's DB lookup-or-create
(src/services/ingestion_service.py:105-129).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.ids import node_ids_np
from ..functions.normalize import normalize_labels_np, sanitize_array

VALIDATED_EXTRA_FIELDS = [
    ("subj_norm", pa.string()),
    ("obj_norm", pa.string()),
    ("subj_id", pa.string()),
    ("obj_id", pa.string()),
]


def _as_obj_np(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    return np.asarray(col.to_pylist(), dtype=object)


def validate_records(batch: pa.Table) -> pa.Table:
    """RECORDS_SCHEMA batch → validated batch with norm labels + node ids."""
    if batch.num_rows == 0:
        empty = {f.name: pa.array([], type=f.type) for f in batch.schema}
        for name, typ in VALIDATED_EXTRA_FIELDS:
            empty[name] = pa.array([], type=typ)
        return pa.table(empty)

    # sanitize free-text columns (M10)
    batch = batch.set_column(
        batch.schema.get_field_index("rationale"), "rationale",
        sanitize_array(batch["rationale"]))
    batch = batch.set_column(
        batch.schema.get_field_index("evidence_span"), "evidence_span",
        sanitize_array(batch["evidence_span"]))

    subj_type = _as_obj_np(batch["subj_type"])
    subj_label = _as_obj_np(batch["subj_label"])
    obj_type = _as_obj_np(batch["obj_type"])
    obj_label = _as_obj_np(batch["obj_label"])
    pred = _as_obj_np(batch["pred"])

    is_paper = subj_type == "paper"
    obj_is_paper = obj_type == "paper"  # __PAPER_META__ records (extract.py)
    subj_norm = np.where(is_paper, subj_label, normalize_labels_np(subj_label))
    obj_norm = np.where(obj_is_paper, obj_label, normalize_labels_np(obj_label))

    # id keys: papers are keyed by "doc:{doc_id}" so a document can never
    # collide with an entity whose label equals a doc id
    doc_keys = np.array([f"doc:{v}" for v in subj_label], dtype=object)
    subj_key = np.where(is_paper, doc_keys, subj_norm)
    subj_id = node_ids_np(subj_type, subj_key)
    obj_doc_keys = np.array([f"doc:{v}" for v in obj_label], dtype=object)
    obj_key = np.where(obj_is_paper, obj_doc_keys, obj_norm)
    obj_id = node_ids_np(obj_type, obj_key)

    # drop rows with empty endpoints or predicate (M8)
    keep = np.array(
        [bool(str(p).strip()) and bool(str(s).strip()) and bool(str(o).strip())
         for p, s, o in zip(pred, subj_norm, obj_norm)],
        dtype=bool,
    )

    conf = pc.if_else(
        pc.is_null(batch["confidence"]),
        pa.scalar(0.5, type=pa.float32()),
        pc.min_element_wise(
            pc.max_element_wise(batch["confidence"], pa.scalar(0.0, type=pa.float32())),
            pa.scalar(1.0, type=pa.float32()),
        ),
    )
    batch = batch.set_column(batch.schema.get_field_index("confidence"), "confidence", conf)

    out = batch
    for name, arr in [
        ("subj_norm", subj_norm), ("obj_norm", obj_norm),
        ("subj_id", subj_id), ("obj_id", obj_id),
    ]:
        out = out.append_column(name, pa.array(list(arr), type=pa.string()))
    if not keep.all():
        out = out.filter(pa.array(keep))
    return out
