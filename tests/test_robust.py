"""Poison-pill isolation: safe_map_batches quarantines failing rows without
killing the pipeline or dropping data."""

import json

import numpy as np
import pandas as pd
import ray.data

from research_knowledge_graph_ray.stages.robust import safe_map_batches


def test_safe_map_quarantines_poison_rows(ray_session):
    def parser(df: pd.DataFrame) -> pd.DataFrame:
        # a strict parser: value must be a decimal string
        vals = [int(v) for v in df["raw"]]
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "value": np.asarray(vals, dtype=np.int64)})

    rows = [{"doc_id": i, "raw": str(i * 10)} for i in range(50)]
    rows[7]["raw"] = "not-a-number"
    rows[23]["raw"] = "7.5x"
    ds = ray.data.from_items(rows)
    out = safe_map_batches(ds, parser, ["doc_id", "value"]).to_pandas()
    assert len(out) == 50  # conservation: no silent drops
    bad = out[out["_error"].notna()]
    good = out[out["_error"].isna()]
    assert len(bad) == 2
    assert all("ValueError" in e for e in bad["_error"])
    payloads = [json.loads(p) for p in bad["_payload"]]
    assert {p["doc_id"] for p in payloads} == {7, 23}
    assert {p["raw"] for p in payloads} == {"not-a-number", "7.5x"}
    # every clean row parsed correctly
    assert (good["value"].to_numpy(np.int64) ==
            good["doc_id"].to_numpy(np.int64) * 10).all()


def test_safe_map_clean_batches_pass_through(ray_session):
    def ident(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64)})

    ds = ray.data.from_items([{"doc_id": i} for i in range(40)])
    out = safe_map_batches(ds, ident, ["doc_id"], batch_size=20).to_pandas()
    assert len(out) == 40 and out["_error"].isna().all()
    assert sorted(out["doc_id"]) == list(range(40))
