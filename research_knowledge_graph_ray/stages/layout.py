"""Sorted table layout + zone-map pruned reads.

``write_sorted`` materializes a Dataset as range-partitioned parquet files
that are globally sorted on one column: file ``part-i`` holds a contiguous
value range entirely below ``part-i+1``'s, each file is sorted internally,
and a ``_ZONES.json`` manifest records every file's (min, max, rows). That
layout is what makes predicate reads cheap at 100 TB: ``read_pruned`` opens
ONLY the files whose zone intersects the predicate range — the storage-side
analogue of parquet row-group statistics, but at file granularity the
planner controls.

Dataflow: one streaming histogram pass picks balanced range boundaries
(histogram partials are O(blocks × n_hist), driver-side boundary selection
is domain-sized); one order-preserving exchange routes rows to their range
bucket (same exchange primitive as everything else — the bucket id IS the
range index, so no global sort ever happens); each reducer sorts its bucket
locally and writes one file. Skewed value distributions get balanced files
because boundaries come from the measured histogram, not fixed widths.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

import ray.data

_MANIFEST = "_ZONES.json"


def _boundaries(ds: "ray.data.Dataset", col: str, n_files: int,
                n_hist: int = 4096) -> np.ndarray:
    """Histogram-derived range boundaries splitting ``col`` into ~equal-row
    ranges (n_files-1 interior cut points)."""
    from ray.data.aggregate import Max, Min

    agg = ds.aggregate(Min(col), Max(col))
    lo, hi = float(agg[f"min({col})"]), float(agg[f"max({col})"])
    width = (hi - lo) or 1.0
    scale = n_hist / width

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        b = np.clip(((df[col].to_numpy(np.float64) - lo) * scale)
                    .astype(np.int64), 0, n_hist - 1)
        cnt = np.bincount(b, minlength=n_hist)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"b": nz, "cnt": cnt[nz]})

    h = (ds.map_batches(hist, batch_format="pandas").to_pandas()
         .groupby("b")["cnt"].sum())
    counts = np.zeros(n_hist, dtype=np.int64)
    counts[h.index.to_numpy(np.int64)] = h.to_numpy(np.int64)
    cum = np.cumsum(counts)
    total = int(cum[-1])
    targets = [total * k // n_files for k in range(1, n_files)]
    cuts = np.searchsorted(cum, targets, side="left")
    # bucket edge value for histogram bucket i ends at lo + (i+1)/scale
    return lo + (np.asarray(cuts, dtype=np.float64) + 1.0) / scale


def write_sorted(ds: "ray.data.Dataset", col: str, out_dir: str,
                 n_files: int = 16) -> dict:
    """Write ``ds`` as ``n_files`` range-partitioned, internally-sorted
    parquet files under ``out_dir`` plus a ``_ZONES.json`` manifest.
    Returns the manifest dict."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .shuffle import hash_exchange_apply

    os.makedirs(out_dir, exist_ok=True)
    bounds = _boundaries(ds, col, n_files)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__zone"] = np.searchsorted(
            bounds, df[col].to_numpy(np.float64), side="right").astype(np.int64)
        return df

    # the exchange key is the range index itself — an ORDER-PRESERVING
    # partition: all rows of zone k land in one reducer, zones are disjoint
    # and cover the domain in order
    def write_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"zone": pd.Series(dtype=np.int64),
                                 "vmin": pd.Series(dtype=np.float64),
                                 "vmax": pd.Series(dtype=np.float64),
                                 "rows": pd.Series(dtype=np.int64),
                                 "file": pd.Series(dtype="string")})
        outs = []
        for zone, g in df.groupby("__zone"):
            g = g.sort_values(col, kind="mergesort").drop(columns="__zone")
            fname = f"part-{int(zone):05d}.parquet"
            pq.write_table(pa.Table.from_pandas(g, preserve_index=False),
                           os.path.join(out_dir, fname))
            outs.append((int(zone), float(g[col].min()), float(g[col].max()),
                         len(g), fname))
        return pd.DataFrame(outs, columns=["zone", "vmin", "vmax", "rows",
                                           "file"])

    zones = hash_exchange_apply(
        ds.map_batches(tag, batch_format="pandas"),
        ["__zone"], lambda df: df, write_bucket,
        n_buckets=n_files, fmt="pandas",
    ).to_pandas().sort_values("zone")
    manifest = {
        "col": col,
        "zones": [
            {"zone": int(r["zone"]), "min": float(r["vmin"]),
             "max": float(r["vmax"]), "rows": int(r["rows"]),
             "file": str(r["file"])}
            for _, r in zones.iterrows()
        ],
    }
    tmp = os.path.join(out_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, _MANIFEST))
    return manifest


def read_pruned(out_dir: str, lo: float, hi: float) -> "ray.data.Dataset":
    """Predicate read over a :func:`write_sorted` layout: open ONLY the
    files whose zone intersects [lo, hi], then filter exactly inside them.
    Returns the filtered Dataset; the pruning ratio is visible via
    :func:`pruned_files`."""
    with open(os.path.join(out_dir, _MANIFEST)) as f:
        manifest = json.load(f)
    col = manifest["col"]
    files = [os.path.join(out_dir, z["file"]) for z in manifest["zones"]
             if z["max"] >= lo and z["min"] <= hi]
    if not files:
        return ray.data.from_items([])
    ds = ray.data.read_parquet(files)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(np.float64)
        return df[(v >= lo) & (v <= hi)]

    return ds.map_batches(keep, batch_format="pandas")


def pruned_files(out_dir: str, lo: float, hi: float) -> tuple[int, int]:
    """(files opened, files total) for a predicate — the zone-map win."""
    with open(os.path.join(out_dir, _MANIFEST)) as f:
        manifest = json.load(f)
    zones = manifest["zones"]
    hit = sum(1 for z in zones if z["max"] >= lo and z["min"] <= hi)
    return hit, len(zones)
