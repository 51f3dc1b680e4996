"""Sized parquet reads for the relational/testdata tables.

Ray Data's default read planning targets ``read_op_min_num_blocks`` (200)
output blocks regardless of input size, so a few-MB table shatters into
hundreds of KB-sized blocks and every downstream ``map_batches`` stage pays
per-task dispatch for each one — measured: a 4-stage lineage over the sf0.1
``orders`` table (150k rows) spent ~2s on ~500 tiny tasks, 6× the useful
compute. This helper picks ``override_num_blocks`` from the actual footprint:

    blocks = clamp(bytes / target_block_bytes,  # bytes-driven at scale
                   blocks_per_cpu × cluster CPUs)  # parallelism floor

At 100 TB the bytes term dominates and reads behave exactly like the default
planner (~64 MB blocks); on small inputs the block count tracks the cluster
size instead of the constant 200.
"""

from __future__ import annotations

import pyarrow.parquet as pq

import ray
import ray.data


def read_table(
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
    blocks_per_cpu: int = 2,
    target_block_bytes: int = 64 << 20,
    **kwargs,
) -> "ray.data.Dataset":
    """``read_parquet`` of ``{sf_dir}/{name}.parquet`` with a size-aware
    block count (footer-only metadata read; no data touched on the driver)."""
    path = f"{sf_dir}/{name}.parquet"
    meta = pq.read_metadata(path)
    nbytes = sum(
        meta.row_group(i).total_byte_size for i in range(meta.num_row_groups)
    )
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    nblocks = max(int(max(nbytes // target_block_bytes, blocks_per_cpu * cpus)), 1)
    nblocks = min(nblocks, max(meta.num_rows, 1))
    return ray.data.read_parquet(
        path, columns=columns, override_num_blocks=nblocks, **kwargs
    )
