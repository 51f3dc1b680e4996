"""Ray-level fault-tolerance evidence beyond checkpoint manifests: a
transient task failure inside a map_batches stage (and inside the custom
hash exchange) is retried by Ray and the pipeline completes with the same
answer a clean run produces."""

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data


def _poison_once(marker_dir):
    """Batch fn that raises on its FIRST execution anywhere in the cluster
    (cross-process marker file), succeeding on retry — simulates a transient
    worker crash mid-stage. Ray retries tasks on system failures (worker
    death), NOT on user exceptions — so the injection must kill the
    process, which is also the honest simulation."""

    def fn(batch: pa.Table) -> pd.DataFrame:
        marker = os.path.join(marker_dir, "died_once")
        try:
            fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            os._exit(1)  # abrupt worker death — the system-failure retry path
        except FileExistsError:
            pass
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame({"doc_id": ids, "twice": ids * 2})

    return fn


def test_map_stage_survives_transient_failure(ray_session, sf_dir):
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])
    with tempfile.TemporaryDirectory() as td:
        out = docs.map_batches(_poison_once(td), batch_format="pyarrow")
        got = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert os.path.exists(os.path.join(td, "died_once"))  # it DID fail
    clean = docs.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(clean)
    assert (got["twice"].to_numpy() ==
            clean["doc_id"].to_numpy(np.int64) * 2).all()


def test_exchange_survives_transient_reducer_failure(ray_session, sf_dir):
    """The custom hash exchange runs reducers as plain Ray tasks — a reducer
    that dies once must be retried with identical input (partials are
    immutable objects in the store), reproducing the clean-run answer."""
    from research_knowledge_graph_ray.stages.shuffle import bucketed_group_apply

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source"])

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("source", as_index=False)
                .agg(n=("doc_id", "nunique")))

    with tempfile.TemporaryDirectory() as td:
        marker = os.path.join(td, "died_once")

        def agg_poisoned(df: pd.DataFrame) -> pd.DataFrame:
            try:
                fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                os._exit(1)  # abrupt reducer death
            except FileExistsError:
                pass
            return agg(df)

        got = (bucketed_group_apply(docs, ["source"],
                                    lambda df: df[["source", "doc_id"]],
                                    agg_poisoned, n_buckets=8)
               .to_pandas().sort_values("source").reset_index(drop=True))
        assert os.path.exists(marker)
    want = (docs.to_pandas().groupby("source", as_index=False)
            .agg(n=("doc_id", "nunique"))
            .sort_values("source").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
