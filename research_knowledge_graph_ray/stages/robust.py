"""Poison-pill isolation for batch transforms.

A 100 TB run WILL contain malformed rows; a transform that throws on one row
must not kill the pipeline, and silently dropping rows is worse. This wraps
any vectorized batch function with the standard two-tier strategy:

    1. run the batch through the vectorized fn (the fast path — pays nothing
       when every row is clean);
    2. on failure, re-apply the fn row-by-row INSIDE that batch only,
       quarantining the rows that still fail with their payload and error.

Output is one stream with the fn's columns (null for quarantined rows) plus
``_error`` / ``_payload`` audit columns, so good rows flow onward and the
quarantine is a cheap ``filter`` away — no second pass, no driver state.
The slow path is per-failing-batch, so a corpus with a one-in-a-million
poison rate pays the per-row cost on one-in-a-million batches.
"""

from __future__ import annotations

import json
from typing import Callable

import numpy as np
import pandas as pd

import ray.data


def _quarantine_frame(row: pd.Series, err: Exception,
                      out_cols: list[str]) -> pd.DataFrame:
    payload = json.dumps({k: (v.item() if isinstance(v, np.generic) else v)
                          for k, v in row.items()}, default=str)
    d = {c: [None] for c in out_cols}
    d["_error"] = [f"{type(err).__name__}: {err}"]
    d["_payload"] = [payload]
    return pd.DataFrame(d)


def safe_map_batches(
    ds: "ray.data.Dataset",
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    out_cols: list[str],
    batch_size: int | None = None,
) -> "ray.data.Dataset":
    """Apply ``fn`` (a 1-output-row-per-input-row pandas transform declaring
    ``out_cols``) with per-row quarantine on failure.

    Clean rows emit ``fn``'s columns with ``_error = None``; poisoned rows
    emit nulls plus the error string and a JSON payload of the source row.
    ``fn`` must be deterministic and row-local (each output row derived from
    the same-position input row) for the fallback split to be semantically
    identical to the vectorized path."""

    def wrapped(batch: pd.DataFrame) -> pd.DataFrame:
        try:
            out = fn(batch)
            if len(out) != len(batch):
                raise ValueError(
                    f"fn returned {len(out)} rows for {len(batch)} inputs")
            out = out[out_cols].copy()
            out["_error"] = None
            out["_payload"] = None
            return out
        except Exception:
            pieces = []
            for i in range(len(batch)):
                row = batch.iloc[i : i + 1]
                try:
                    good = fn(row)[out_cols].copy()
                    if len(good) != 1:
                        raise ValueError("fn returned != 1 row for 1 input")
                    good["_error"] = None
                    good["_payload"] = None
                    pieces.append(good)
                except Exception as e:  # noqa: BLE001 — quarantine anything
                    pieces.append(_quarantine_frame(batch.iloc[i], e, out_cols))
            return pd.concat(pieces, ignore_index=True)

    return ds.map_batches(wrapped, batch_format="pandas", batch_size=batch_size)
