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


# ---------------------------------------------------------------------------
# 2-D Z-order (Morton) layout — multi-column pruning
# ---------------------------------------------------------------------------

_MANIFEST_2D = "_ZONES2D.json"


def _boundaries2(ds: "ray.data.Dataset", col_x: str, col_y: str,
                 n_q: int, n_hist: int = 4096) -> tuple[np.ndarray, np.ndarray]:
    """Equi-depth cut points for TWO columns from ONE fused min/max aggregate
    and ONE fused histogram pass (halves the fixed per-execution overhead of
    calling :func:`_boundaries` twice)."""
    from ray.data.aggregate import Max, Min

    agg = ds.aggregate(Min(col_x), Max(col_x), Min(col_y), Max(col_y))
    lims = {c: (float(agg[f"min({c})"]), float(agg[f"max({c})"]))
            for c in (col_x, col_y)}
    scales = {c: n_hist / ((hi - lo) or 1.0) for c, (lo, hi) in lims.items()}

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for ci, c in enumerate((col_x, col_y)):
            lo = lims[c][0]
            b = np.clip(((df[c].to_numpy(np.float64) - lo) * scales[c])
                        .astype(np.int64), 0, n_hist - 1)
            cnt = np.bincount(b, minlength=n_hist)
            nz = np.flatnonzero(cnt)
            outs.append(pd.DataFrame({"c": np.int64(ci), "b": nz,
                                      "cnt": cnt[nz]}))
        return pd.concat(outs, ignore_index=True)

    h = (ds.map_batches(hist, batch_format="pandas").to_pandas()
         .groupby(["c", "b"])["cnt"].sum())
    cuts = []
    for ci, c in enumerate((col_x, col_y)):
        counts = np.zeros(n_hist, dtype=np.int64)
        sub = h.loc[ci]
        counts[sub.index.to_numpy(np.int64)] = sub.to_numpy(np.int64)
        cum = np.cumsum(counts)
        total = int(cum[-1])
        targets = [total * k // n_q for k in range(1, n_q)]
        pos = np.searchsorted(cum, targets, side="left")
        cuts.append(lims[c][0]
                    + (np.asarray(pos, dtype=np.float64) + 1.0) / scales[c])
    return cuts[0], cuts[1]


def _spread_bits8(v: np.ndarray) -> np.ndarray:
    """Spread an 8-bit value's bits to even positions (Morton interleave)."""
    v = v.astype(np.uint32)
    v = (v | (v << 4)) & np.uint32(0x0F0F0F0F)
    v = (v | (v << 2)) & np.uint32(0x33333333)
    v = (v | (v << 1)) & np.uint32(0x55555555)
    return v


def morton16(qx: np.ndarray, qy: np.ndarray) -> np.ndarray:
    """16-bit Morton code from two 8-bit quantized coordinates."""
    return (_spread_bits8(qx) | (_spread_bits8(qy) << np.uint32(1))).astype(np.int64)


def write_zorder(ds: "ray.data.Dataset", col_x: str, col_y: str,
                 out_dir: str, n_files: int = 16, n_q: int = 256) -> dict:
    """Write ``ds`` as ``n_files`` Z-order-clustered parquet files: rows are
    quantized to equi-depth (col_x, col_y) cells, interleaved into a 16-bit
    Morton code, and range-partitioned on that code — so each file covers a
    compact RECTANGLE-ish region of the 2-D value space and a box predicate
    on EITHER or BOTH columns prunes files. ``_ZONES2D.json`` records every
    file's per-column (min, max) envelope.

    This is the multi-column companion to :func:`write_sorted`: a layout
    sorted on col_x alone cannot prune a col_y predicate at all; Z-order
    prunes both at a small cost to single-column locality. Dataflow: per-
    column equi-depth quantizers from the same streamed histogram pass as
    :func:`_boundaries`, one streamed 65536-bin Morton histogram to pick
    balanced file boundaries (partials are tiny: bincount arrays, not rows),
    then ONE order-preserving exchange routes each row to its file — no
    global sort ever runs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .shuffle import hash_exchange_apply

    os.makedirs(out_dir, exist_ok=True)
    cuts_x, cuts_y = _boundaries2(ds, col_x, col_y, n_q)

    def code(df: pd.DataFrame) -> np.ndarray:
        qx = np.searchsorted(cuts_x, df[col_x].to_numpy(np.float64),
                             side="right").astype(np.uint32)
        qy = np.searchsorted(cuts_y, df[col_y].to_numpy(np.float64),
                             side="right").astype(np.uint32)
        return morton16(qx, qy)

    # balanced z-range file boundaries from an exact 65536-bin histogram
    def zhist(df: pd.DataFrame) -> pd.DataFrame:
        cnt = np.bincount(code(df), minlength=n_q * n_q)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"z": nz, "cnt": cnt[nz]})

    h = (ds.map_batches(zhist, batch_format="pandas").to_pandas()
         .groupby("z")["cnt"].sum())
    counts = np.zeros(n_q * n_q, dtype=np.int64)
    counts[h.index.to_numpy(np.int64)] = h.to_numpy(np.int64)
    cum = np.cumsum(counts)
    total = int(cum[-1])
    targets = [total * k // n_files for k in range(1, n_files)]
    zcuts = np.searchsorted(cum, targets, side="left").astype(np.int64)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        z = code(df)
        df["__z"] = z
        df["__zone"] = np.searchsorted(zcuts, z, side="right").astype(np.int64)
        return df

    def write_bucket(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["zone", "xmin", "xmax", "ymin", "ymax", "rows", "file"]
        if df.empty:
            return pd.DataFrame(
                {"zone": pd.Series(dtype=np.int64),
                 "xmin": pd.Series(dtype=np.float64),
                 "xmax": pd.Series(dtype=np.float64),
                 "ymin": pd.Series(dtype=np.float64),
                 "ymax": pd.Series(dtype=np.float64),
                 "rows": pd.Series(dtype=np.int64),
                 "file": pd.Series(dtype="string")})
        outs = []
        for zone, g in df.groupby("__zone"):
            g = g.sort_values("__z", kind="mergesort").drop(
                columns=["__z", "__zone"])
            fname = f"zpart-{int(zone):05d}.parquet"
            pq.write_table(pa.Table.from_pandas(g, preserve_index=False),
                           os.path.join(out_dir, fname))
            outs.append((int(zone),
                         float(g[col_x].min()), float(g[col_x].max()),
                         float(g[col_y].min()), float(g[col_y].max()),
                         len(g), fname))
        return pd.DataFrame(outs, columns=cols)

    zones = hash_exchange_apply(
        ds.map_batches(tag, batch_format="pandas"),
        ["__zone"], lambda df: df, write_bucket,
        n_buckets=n_files, fmt="pandas",
    ).to_pandas().sort_values("zone")
    manifest = {
        "col_x": col_x, "col_y": col_y,
        "zones": [
            {"zone": int(r["zone"]),
             "xmin": float(r["xmin"]), "xmax": float(r["xmax"]),
             "ymin": float(r["ymin"]), "ymax": float(r["ymax"]),
             "rows": int(r["rows"]), "file": str(r["file"])}
            for _, r in zones.iterrows()
        ],
    }
    tmp = os.path.join(out_dir, _MANIFEST_2D + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, _MANIFEST_2D))
    return manifest


def _box_files(out_dir: str, x_lo: float, x_hi: float,
               y_lo: float, y_hi: float) -> tuple[list, str, str, int]:
    with open(os.path.join(out_dir, _MANIFEST_2D)) as f:
        m = json.load(f)
    files = [os.path.join(out_dir, z["file"]) for z in m["zones"]
             if z["xmax"] >= x_lo and z["xmin"] <= x_hi
             and z["ymax"] >= y_lo and z["ymin"] <= y_hi]
    return files, m["col_x"], m["col_y"], len(m["zones"])


def read_pruned_box(out_dir: str, x_lo: float, x_hi: float,
                    y_lo: float, y_hi: float) -> "ray.data.Dataset":
    """Box-predicate read over a :func:`write_zorder` layout: open ONLY the
    files whose 2-D envelope intersects the box, filter exactly inside."""
    files, col_x, col_y, _ = _box_files(out_dir, x_lo, x_hi, y_lo, y_hi)
    if not files:
        return ray.data.from_items([])
    ds = ray.data.read_parquet(files)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        x = df[col_x].to_numpy(np.float64)
        y = df[col_y].to_numpy(np.float64)
        return df[(x >= x_lo) & (x <= x_hi) & (y >= y_lo) & (y <= y_hi)]

    return ds.map_batches(keep, batch_format="pandas")


def pruned_box_files(out_dir: str, x_lo: float, x_hi: float,
                     y_lo: float, y_hi: float) -> tuple[int, int]:
    """(files opened, files total) for a box predicate — the Z-order win."""
    files, _, _, n = _box_files(out_dir, x_lo, x_hi, y_lo, y_hi)
    return len(files), n
