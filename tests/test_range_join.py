"""Range (interval) count join vs brute force, with absent keys, empty
windows and one-sided buckets."""

import numpy as np
import pandas as pd
import ray.data

from research_knowledge_graph_ray.stages.join import range_count_join


def test_range_count_join_bruteforce():
    rng = np.random.default_rng(11)
    base = pd.Timestamp("2024-03-01")
    build = pd.DataFrame(
        {
            "k": rng.integers(0, 20, 500),
            "ts": base + pd.to_timedelta(rng.integers(0, 10_000, 500), unit="m"),
        }
    )
    probe = pd.DataFrame(
        {
            "pid": np.arange(80),
            # keys 15..24: the top range is absent from the build side
            "k": rng.integers(0, 25, 80),
            "start": base + pd.to_timedelta(rng.integers(0, 9_000, 80), unit="m"),
        }
    )
    probe["end"] = probe["start"] + pd.Timedelta(hours=10)

    got = range_count_join(
        ray.data.from_pandas(probe),
        ray.data.from_pandas(build),
        "k", "k", ["pid"], "ts", "start", "end",
        out_count="n", n_buckets=8, probe_casts={"pid": "int64"},
    ).to_pandas()

    want = {}
    for r in probe.itertuples():
        n = int(
            (
                (build["k"] == r.k)
                & (build["ts"] >= r.start)
                & (build["ts"] < r.end)
            ).sum()
        )
        if n > 0:
            want[r.pid] = n
    assert dict(zip(got["pid"].astype(int), got["n"].astype(int))) == want
    assert want  # the generated case really has matches
    assert got["pid"].dtype == np.int64
