"""Checkpoint/resume semantics, distributed connected components, multimodal
plumbing."""

import json
import os

import numpy as np
import pandas as pd
import pytest
import ray.data

from research_knowledge_graph_ray.sources.corpus import generate_documents
from research_knowledge_graph_ray.state.checkpoint import (
    checkpoint_dataset,
    completed_partitions,
    load_manifest,
)


def test_checkpoint_write_and_reuse(tmp_path):
    ds = ray.data.from_items([{"doc_id": f"d{i}", "x": i} for i in range(100)])
    ck = str(tmp_path / "stage1")
    out1 = checkpoint_dataset(ds, ck, fingerprint="fp-1", n_partitions=4)
    assert out1.count() == 100
    man = load_manifest(ck)
    assert man["complete"] and man["total_rows"] == 100
    assert len(completed_partitions(ck)) == 4

    # a second run with the same fingerprint must NOT recompute: feed a
    # poisoned dataset — if it executed, it would raise
    def boom(_):
        raise RuntimeError("should not recompute")

    poisoned = ds.map_batches(boom)
    out2 = checkpoint_dataset(poisoned, ck, fingerprint="fp-1", n_partitions=4)
    assert out2.count() == 100  # streamed from the checkpoint

    # changed fingerprint → recompute (and the poisoned ds now raises)
    with pytest.raises(Exception):
        checkpoint_dataset(poisoned, ck, fingerprint="fp-2", n_partitions=4).count()


def test_checkpoint_partition_lineage(tmp_path):
    ds = ray.data.from_items([{"doc_id": f"d{i:03d}", "x": i} for i in range(60)])
    ck = str(tmp_path / "s")
    checkpoint_dataset(ds, ck, fingerprint="f", n_partitions=8)
    man = load_manifest(ck)
    assert sum(man["partitions"].values()) == 60
    assert man["n_partitions"] == 8


def test_incomplete_checkpoint_is_invisible(tmp_path):
    """A killed run (tmp dir present, no manifest) must not be readable."""
    ds = ray.data.from_items([{"doc_id": "a", "x": 1}])
    ck = str(tmp_path / "k")
    os.makedirs(ck + ".tmp", exist_ok=True)  # simulate crash mid-write
    out = checkpoint_dataset(ds, ck, fingerprint="f")
    assert out.count() == 1
    assert load_manifest(ck)["complete"]


def test_build_graph_with_checkpoint_matches(tmp_path):
    from research_knowledge_graph_ray.pipelines.construct import build_graph

    table = generate_documents(40, seed=42)
    docs = ray.data.from_arrow(table)
    plain = build_graph(docs, entity_linking=True, link=True)
    ck = build_graph(
        ray.data.from_arrow(table), entity_linking=True, link=True,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    key = lambda df: sorted(zip(df["src_id"], df["dst_id"], df["edge_type"]))
    assert key(plain.edges.to_pandas()) == key(ck.edges.to_pandas())


def test_distributed_connected_components_matches_driver():
    from research_knowledge_graph_ray.stages.canonicalize import (
        connected_components_distributed,
        connected_components_driver,
    )

    edges = [("b", "a"), ("c", "b"), ("e", "d"), ("x", "x"), ("f", "e"), ("g", "f")]
    expect = connected_components_driver(edges)
    ds = ray.data.from_pandas(pd.DataFrame({"a": [e[0] for e in edges],
                                            "b": [e[1] for e in edges]}))
    got = connected_components_distributed(ds, max_iters=8)
    assert got == expect
    assert expect["c"] == "a" and expect["g"] == "d"


def test_media_pipeline_plumbing():
    from research_knowledge_graph_ray.stages.multimodal import (
        DecodeMedia,
        media_feature_pipeline,
        media_inventory,
    )

    table = generate_documents(30, seed=42)
    docs = ray.data.from_arrow(table)
    inv = media_inventory(docs).to_pandas()
    assert len(inv) > 10
    assert inv["media_ref"].str.startswith("media://").all()
    assert set(inv["kind"]) <= {"figure", "table", "equation"}

    feats = media_feature_pipeline(ray.data.from_arrow(table), fake_decode=True).to_pandas()
    assert len(feats) == len(inv)
    f0 = np.asarray(feats["feature"].iloc[0])
    assert f0.shape == (32,) and abs(np.linalg.norm(f0) - 1.0) < 1e-5

    # real decode is stubbed: must raise loudly, not silently fake
    inv_batch = media_inventory(ray.data.from_arrow(table)).take_batch(
        4, batch_format="pyarrow"
    )
    import pyarrow as pa

    with pytest.raises(NotImplementedError):
        DecodeMedia(fake=False)(pa.table(inv_batch))


def test_resize_and_frame_sample_plumbing():
    """Resize keeps the decode contract (binary payload + updated metadata);
    frame sampling is 1→N flat-map with per-frame features downstream."""
    from research_knowledge_graph_ray.sources.corpus import generate_documents
    from research_knowledge_graph_ray.stages.multimodal import (
        frame_sample_pipeline,
        media_feature_pipeline,
        media_inventory,
    )

    docs = ray.data.from_arrow(generate_documents(30, seed=6))
    n_media = media_inventory(docs).count()
    assert n_media > 0

    resized = media_feature_pipeline(docs, fake_decode=True, resize=True).to_pandas()
    assert len(resized) == n_media
    assert all(len(f) == 32 for f in resized["feature"])

    frames = frame_sample_pipeline(docs, n_frames=4, fake_decode=True).to_pandas()
    assert len(frames) == n_media * 4
    per = frames.groupby("media_ref")["frame_index"].apply(sorted)
    assert all(list(v) == [0, 1, 2, 3] for v in per)
