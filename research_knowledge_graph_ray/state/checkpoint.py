"""Stage-boundary checkpointing with per-partition lineage manifests.

The reference's only resume story is idempotent DB upserts that still re-pay
every LLM call (reference: src/db/repository.py:36-43,158-168). Here a stage
boundary is materialized as partitioned parquet plus a ``_MANIFEST.json``
recording the input fingerprint, per-partition row counts and the stage name;
a rerun with the same fingerprint skips the stage entirely and streams the
parquet back. Writes are atomic: data lands in ``<dir>.tmp`` first and the
manifest is written only after success, so a killed run never leaves a
readable-but-incomplete checkpoint.

At cluster scale each partition directory is written by independent tasks
(``partition_cols=["part"]``), so a partially-complete checkpoint can be
resumed per-partition by filtering the input to missing partitions.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa

import ray.data

MANIFEST = "_MANIFEST.json"


def partition_column(batch: pa.Table, n_partitions: int, key: str = "doc_id") -> pa.Table:
    """Add a deterministic hash partition id column (provenance + layout)."""
    import zlib

    vals = batch[key].to_pylist()
    parts = pa.array(
        [zlib.crc32(str(v).encode("utf-8")) % n_partitions for v in vals], type=pa.int32()
    )
    return batch.append_column("part", parts)


def manifest_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, MANIFEST)


def load_manifest(ckpt_dir: str) -> dict | None:
    try:
        with open(manifest_path(ckpt_dir)) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def checkpoint_dataset(
    ds: "ray.data.Dataset",
    ckpt_dir: str,
    fingerprint: str = "",
    n_partitions: int = 16,
) -> "ray.data.Dataset":
    """Materialize ``ds`` at ``ckpt_dir`` (or reuse a valid prior checkpoint).

    Returns a Dataset streaming from the checkpoint files. ``fingerprint``
    identifies the input (e.g. source path + row count); a mismatch invalidates
    the checkpoint and recomputes.
    """
    man = load_manifest(ckpt_dir)
    if man is not None and man.get("fingerprint") == fingerprint and man.get("complete"):
        return ray.data.read_parquet(ckpt_dir, file_extensions=["parquet"])

    tmp = ckpt_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(ckpt_dir, ignore_errors=True)

    parted = ds.map_batches(
        lambda b: partition_column(b, n_partitions), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    parted.write_parquet(tmp, partition_cols=["part"])

    # per-partition lineage: rows per partition directory
    partitions: dict[str, int] = {}
    import pyarrow.parquet as pq

    for root, _dirs, files in os.walk(tmp):
        for fn in files:
            if fn.endswith(".parquet"):
                part = os.path.relpath(root, tmp)
                partitions[part] = partitions.get(part, 0) + pq.ParquetFile(
                    os.path.join(root, fn)
                ).metadata.num_rows

    os.replace(tmp, ckpt_dir)
    with open(manifest_path(ckpt_dir), "w") as f:
        json.dump(
            {
                "fingerprint": fingerprint,
                "complete": True,
                "n_partitions": n_partitions,
                "partitions": partitions,
                "total_rows": sum(partitions.values()),
            },
            f,
            indent=1,
        )
    return ray.data.read_parquet(ckpt_dir, file_extensions=["parquet"])


def completed_partitions(ckpt_dir: str) -> set[str]:
    man = load_manifest(ckpt_dir)
    return set((man or {}).get("partitions", {}))
