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
import pyarrow.compute as pc

import ray.data  # noqa: F401 — Dataset type in signatures

from ..functions.ids import paper_node_id
from ..schemas import EDGES_SCHEMA
from .shuffle import arrow_group_agg, hash_exchange_apply

BLOCKING_TYPES = ("method", "dataset", "concept")  # reference: graph_service.py:237-241
DEFAULT_MAX_DOCS_PER_ENTITY = 128


_EMPTY_PAIRS = {
    "doc_a": pd.Series(dtype=object), "doc_b": pd.Series(dtype=object),
    "is_method": pd.Series(dtype=np.int64), "is_dataset": pd.Series(dtype=np.int64),
    "is_concept": pd.Series(dtype=np.int64), "label": pd.Series(dtype=object),
    "n_dropped_docs": pd.Series(dtype=np.int64),
}


def candidate_pair_rows(
    validated: "ray.data.Dataset",
    max_docs_per_entity: int = DEFAULT_MAX_DOCS_PER_ENTITY,
) -> "ray.data.Dataset":
    """One bucketed shuffle on entity_id: batches pre-shrink to distinct
    (entity_id, doc_id), the per-bucket pass builds each entity's sorted,
    capped doc list and emits its (doc_a < doc_b) pairs."""

    def partial(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(t["pred"], "INTRODUCES"),
            pc.is_in(t["obj_type"], value_set=pa.array(list(BLOCKING_TYPES))),
        )
        t = t.filter(mask)
        t = pa.table(
            {"entity_id": t["obj_id"], "doc_id": t["doc_id"],
             "entity_type": t["obj_type"], "label": t["obj_norm"]}
        )
        return arrow_group_agg(
            t, ["entity_id", "doc_id"], [("entity_type", "min"), ("label", "min")]
        )

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = []
        for eid, g in df.groupby("entity_id"):
            docs = sorted(g["doc_id"].unique().tolist())
            dropped = max(0, len(docs) - max_docs_per_entity)
            docs = docs[:max_docs_per_entity]
            k = len(docs)
            if k < 2:
                continue
            etype = g["entity_type"].iloc[0]
            ia, ib = np.triu_indices(k, 1)
            docs_arr = np.array(docs, dtype=object)
            out.append(pd.DataFrame(
                {
                    "doc_a": docs_arr[ia],
                    "doc_b": docs_arr[ib],
                    "is_method": np.int64(1 if etype == "method" else 0),
                    "is_dataset": np.int64(1 if etype == "dataset" else 0),
                    "is_concept": np.int64(1 if etype == "concept" else 0),
                    "label": g["label"].min(),
                    "n_dropped_docs": np.int64(dropped),
                }
            ))
        if not out:
            return pa.Table.from_pandas(pd.DataFrame(_EMPTY_PAIRS), preserve_index=False)
        return pa.Table.from_pandas(pd.concat(out, ignore_index=True), preserve_index=False)

    return hash_exchange_apply(validated, ["entity_id"], partial, final)


def candidate_pairs(
    pair_rows: "ray.data.Dataset",
) -> "ray.data.Dataset":
    """Aggregate per-entity pair rows into per-pair shared-entity counts
    (the ``seen_pairs`` dedup as a bucketed shuffle on doc_a)."""

    def agg(t: pa.Table) -> pa.Table:
        if "is_method" in t.column_names:
            t = t.rename_columns([
                {"is_method": "n_shared_methods", "is_dataset": "n_shared_datasets",
                 "is_concept": "n_shared_concepts", "label": "evidence_label"}.get(c, c)
                for c in t.column_names
            ])
        return arrow_group_agg(
            t, ["doc_a", "doc_b"],
            [("n_shared_methods", "sum"), ("n_shared_datasets", "sum"),
             ("n_shared_concepts", "sum"), ("evidence_label", "min"),
             ("n_dropped_docs", "max")],
        )

    return hash_exchange_apply(pair_rows, ["doc_a"], agg, agg)


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
        # docs repeat across many pairs — hash each unique doc once per batch
        pid = {d: paper_node_id(d) for d in
               set(src_doc[idx]).union(dst_doc[idx])}
        return pa.Table.from_arrays(
            [
                pa.array([pid[src_doc[i]] for i in idx], type=pa.string()),
                pa.array([pid[dst_doc[i]] for i in idx], type=pa.string()),
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
    return judge_pairs(candidate_pairs(candidate_pair_rows(validated, max_docs_per_entity)))
