"""Cross-document relationship linking: blocking → candidate pairs → pair judge.

Ray-native restatement of the reference's pruned linking pass
(reference: src/services/graph_service.py:167-316): the driver-held inverted
index ``node_to_papers`` (:207-228) becomes a groupby on entity_id; the
``seen_pairs`` sorted-tuple dedup (:262-266) becomes pair-key aggregation; the
per-pair LLM judge (src/agents/relationship_linking_agent.py:48-159) becomes a
deterministic vectorized rule stage (same actor-pool slot an LLM judge would
occupy). Direction inversion for IMPROVES_ON/EXTENDS/REFINES_CONCEPT mirrors
src/agents/relationship_linking_agent.py:144-154.

Skew handling: a hot entity (one shared by a large fraction of docs) would
make its group O(n²) in pairs; groups are capped at ``max_docs_per_entity``
docs (deterministic: sorted doc_ids, first K) and the number of dropped docs
is carried on the emitted rows so truncation is observable, not silent
(SURVEY.md §7.5 hazard 2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Max, Min, Sum

from ..functions.ids import paper_node_id
from ..schemas import EDGES_SCHEMA

BLOCKING_TYPES = ("method", "dataset", "concept")  # reference: graph_service.py:237-241
DEFAULT_MAX_DOCS_PER_ENTITY = 128


def blocking_entities(validated: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distinct (entity_id, doc_id, entity_type, label) for blocking-eligible types."""

    def project(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "entity_id": batch["obj_id"].to_numpy(zero_copy_only=False),
                "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
                "entity_type": batch["obj_type"].to_numpy(zero_copy_only=False),
                "label": batch["obj_norm"].to_numpy(zero_copy_only=False),
                "pred": batch["pred"].to_numpy(zero_copy_only=False),
            }
        )
        df = df[(df["pred"] == "INTRODUCES") & df["entity_type"].isin(BLOCKING_TYPES)]
        return df.drop(columns=["pred"]).drop_duplicates(subset=["entity_id", "doc_id"])

    projected = validated.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    return projected.groupby(["entity_id", "doc_id"]).aggregate(
        Min("entity_type", alias_name="entity_type"), Min("label", alias_name="label")
    )


def candidate_pairs(
    blocking: "ray.data.Dataset",
    max_docs_per_entity: int = DEFAULT_MAX_DOCS_PER_ENTITY,
) -> "ray.data.Dataset":
    """Per-entity pair emission (doc_a < doc_b) with hot-entity capping,
    then pair-level aggregation of shared-entity counts per type."""

    def emit_pairs(group: pd.DataFrame) -> pd.DataFrame:
        docs = sorted(group["doc_id"].unique().tolist())
        dropped = max(0, len(docs) - max_docs_per_entity)
        docs = docs[:max_docs_per_entity]
        k = len(docs)
        if k < 2:
            return pd.DataFrame(
                columns=["doc_a", "doc_b", "is_method", "is_dataset", "is_concept",
                         "label", "n_dropped_docs"]
            ).astype({"is_method": "int64", "is_dataset": "int64",
                      "is_concept": "int64", "n_dropped_docs": "int64"})
        etype = group["entity_type"].iloc[0]
        label = group["label"].min()
        ia, ib = np.triu_indices(k, 1)
        docs_arr = np.array(docs, dtype=object)
        return pd.DataFrame(
            {
                "doc_a": docs_arr[ia],
                "doc_b": docs_arr[ib],
                "is_method": np.int64(1 if etype == "method" else 0),
                "is_dataset": np.int64(1 if etype == "dataset" else 0),
                "is_concept": np.int64(1 if etype == "concept" else 0),
                "label": label,
                "n_dropped_docs": np.int64(dropped),
            }
        )

    pair_rows = blocking.groupby("entity_id").map_groups(emit_pairs, batch_format="pandas")
    return pair_rows.groupby(["doc_a", "doc_b"]).aggregate(
        Sum("is_method", alias_name="n_shared_methods"),
        Sum("is_dataset", alias_name="n_shared_datasets"),
        Sum("is_concept", alias_name="n_shared_concepts"),
        Min("label", alias_name="evidence_label"),
        Max("n_dropped_docs", alias_name="n_dropped_docs"),
    )


def judge_pairs(pairs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Deterministic pair judge → cross-doc EDGES_SCHEMA rows.

    Rules (the deterministic stand-in for the per-pair LLM judge; the pipeline
    slot, inputs and outputs are identical to what an LLM actor pool needs):

    - ``n_shared_methods ≥ 2``                       → EXTENDS, 0.85 (b → a)
    - elif ``n_shared_methods ≥ 1 and n_shared_datasets ≥ 1`` → COMPARES_TO, 0.80 (a → b)
    - elif total shared ≥ 2                          → SIMILAR_TO, 0.75 (a → b)
    - else no edge.

    EXTENDS is direction-inverted per the reference rule
    (src/agents/relationship_linking_agent.py:144-154).
    """

    def judge(batch: pa.Table) -> pa.Table:
        nm = batch["n_shared_methods"].to_numpy(zero_copy_only=False).astype(np.int64)
        nd = batch["n_shared_datasets"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = batch["n_shared_concepts"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_a = np.asarray(batch["doc_a"].to_pylist(), dtype=object)
        doc_b = np.asarray(batch["doc_b"].to_pylist(), dtype=object)
        ev = np.asarray(batch["evidence_label"].to_pylist(), dtype=object)
        total = nm + nd + nc

        extends = nm >= 2
        compares = (~extends) & (nm >= 1) & (nd >= 1)
        similar = (~extends) & (~compares) & (total >= 2)
        keep = extends | compares | similar

        edge_type = np.where(extends, "EXTENDS", np.where(compares, "COMPARES_TO", "SIMILAR_TO"))
        conf = np.where(extends, 0.85, np.where(compares, 0.80, 0.75)).astype(np.float32)
        # direction: inverted types point doc_b -> doc_a
        src_doc = np.where(extends, doc_b, doc_a)
        dst_doc = np.where(extends, doc_a, doc_b)

        idx = np.nonzero(keep)[0]
        rationale = [
            f"shared: methods={nm[i]}, datasets={nd[i]}, concepts={nc[i]}" for i in idx
        ]
        return pa.Table.from_arrays(
            [
                pa.array([paper_node_id(src_doc[i]) for i in idx], type=pa.string()),
                pa.array([paper_node_id(dst_doc[i]) for i in idx], type=pa.string()),
                pa.array(list(edge_type[idx]), type=pa.string()),
                pa.array(list(conf[idx]), type=pa.float32()),
                pa.array(rationale, type=pa.string()),
                pa.array(list(ev[idx]), type=pa.string()),
                pa.array(list(doc_a[idx]), type=pa.string()),
            ],
            schema=EDGES_SCHEMA,
        )

    return pairs.map_batches(judge, batch_format="pyarrow")


def link_cross_documents(
    validated: "ray.data.Dataset",
    max_docs_per_entity: int = DEFAULT_MAX_DOCS_PER_ENTITY,
) -> "ray.data.Dataset":
    """Full linking pass: blocking → capped pairs → judge → cross-doc edges."""
    return judge_pairs(candidate_pairs(blocking_entities(validated), max_docs_per_entity))
