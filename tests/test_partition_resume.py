"""Partition-level resume: completed partitions are never re-extracted."""

import json
import os
import shutil
import zlib

import pytest
import ray.data

from research_knowledge_graph_ray.pipelines.construct import build_graph, extract_validated
from research_knowledge_graph_ray.sources.corpus import generate_documents
from research_knowledge_graph_ray.state.checkpoint import (
    load_manifest,
    partitioned_stage_checkpoint,
)

N_PARTS = 4


def _part_of(doc_id: str) -> int:
    return zlib.crc32(doc_id.encode()) % N_PARTS


def test_resume_skips_completed_partitions(tmp_path):
    table = generate_documents(40, seed=42)
    docs = ray.data.from_arrow(table)
    ck = str(tmp_path / "stage")

    # full run → 4 completed partitions + manifest
    out1 = partitioned_stage_checkpoint(
        docs, lambda d: extract_validated(d), ck, n_partitions=N_PARTS, fingerprint="f1"
    )
    total = out1.count()
    man = load_manifest(ck)
    assert man["complete"] and man["total_rows"] == total

    # simulate a crash that lost partitions 2 and 3 (and the top manifest)
    os.remove(os.path.join(ck, "_MANIFEST.json"))
    shutil.rmtree(os.path.join(ck, "part=2"))
    shutil.rmtree(os.path.join(ck, "part=3"))

    # resume with a stage that EXPLODES if it sees any doc from a completed
    # partition — proving partitions 0/1 are never re-extracted
    def poisoned_stage(d):
        n_parts = N_PARTS

        def check(batch):
            import zlib as _z

            for doc_id in batch["doc_id"].to_pylist():
                if _z.crc32(doc_id.encode()) % n_parts in (0, 1):
                    raise RuntimeError(f"re-extracted completed partition: {doc_id}")
            return batch

        return extract_validated(d.map_batches(check, batch_format="pyarrow"))

    out2 = partitioned_stage_checkpoint(
        docs, poisoned_stage, ck, n_partitions=N_PARTS, fingerprint="f1"
    )
    assert out2.count() == total
    assert load_manifest(ck)["complete"]


def test_fingerprint_change_invalidates_partitions(tmp_path):
    table = generate_documents(20, seed=42)
    docs = ray.data.from_arrow(table)
    ck = str(tmp_path / "s")
    partitioned_stage_checkpoint(
        docs, lambda d: extract_validated(d), ck, n_partitions=2, fingerprint="a"
    )
    # changed fingerprint → all partitions recompute (new fingerprint recorded)
    out = partitioned_stage_checkpoint(
        docs, lambda d: extract_validated(d), ck, n_partitions=2, fingerprint="b"
    )
    assert out.count() > 0
    with open(os.path.join(ck, "part=0", "_PART.json")) as f:
        man = json.load(f)
    assert man["fingerprint"] == "b"
    # per-partition METRICS ride the lineage record (north-rule contract)
    assert man["rows"] >= 0 and man["bytes"] > 0
    assert man["elapsed_s"] > 0 and man["completed_unix"] > 0


def test_build_graph_checkpointed_resume_equivalence(tmp_path):
    table = generate_documents(40, seed=42)
    plain = build_graph(ray.data.from_arrow(table), entity_linking=True, link=True)
    ck = build_graph(
        ray.data.from_arrow(table), entity_linking=True, link=True,
        checkpoint_dir=str(tmp_path / "g"), checkpoint_partitions=N_PARTS,
        checkpoint_fingerprint="docs-40-seed-42",
    )
    key = lambda df: sorted(zip(df["src_id"], df["dst_id"], df["edge_type"]))
    assert key(plain.edges.to_pandas()) == key(ck.edges.to_pandas())

    # second checkpointed run resumes (no partition work) and matches
    ck2 = build_graph(
        ray.data.from_arrow(table), entity_linking=True, link=True,
        checkpoint_dir=str(tmp_path / "g"), checkpoint_partitions=N_PARTS,
        checkpoint_fingerprint="docs-40-seed-42",
    )
    assert key(ck2.edges.to_pandas()) == key(plain.edges.to_pandas())
