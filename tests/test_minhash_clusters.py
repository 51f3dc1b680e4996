"""Cluster-mode MinHash dedup on a planted-duplicate corpus."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from research_knowledge_graph_ray.stages.dedup import minhash_dedup_clusters


def test_minhash_clusters_planted():
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(200)]
    base = [" ".join(rng.choice(vocab, 60)) for _ in range(40)]
    rows = []
    for i, t in enumerate(base):
        rows.append({"doc_id": i, "text": t})
        if i < 8:
            rows.append({"doc_id": 1000 + i, "text": t})              # exact dup
            rows.append({"doc_id": 2000 + i, "text": t + " extra"})   # near dup
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out_ds = minhash_dedup_clusters(ds)
    assert isinstance(out_ds, ray.data.Dataset)  # scale path: no driver frame
    out = out_ds.to_pandas()
    # the fully distributed CC branch (cc_driver_limit=0) must agree exactly
    forced = minhash_dedup_clusters(ds, cc_driver_limit=0).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = forced.sort_values("doc_id").reset_index(drop=True)
    assert (a.values == b.values).all()
    by_doc = dict(zip(out["doc_id"], out["cluster_id"]))
    for i in range(8):
        assert by_doc.get(i) == i, f"survivor of cluster {i} wrong"
        assert by_doc.get(1000 + i) == i, f"exact dup {i} not clustered"
        assert by_doc.get(2000 + i) == i, f"near dup {i} not clustered"
    keep = out[out["keep"]]
    assert set(keep["doc_id"]) == set(keep["cluster_id"])
    # distinct base docs must NOT merge (precision)
    clusters = out.groupby("cluster_id")["doc_id"].apply(set)
    for cid, members in clusters.items():
        base_members = {m for m in members if m < 1000}
        assert len(base_members) <= 1, f"false merge: {members}"


def test_connected_components_ds_mega_cluster():
    """A planted 100k-member cluster (star-of-stars edge set, the shape the
    bucketed star emitter produces) resolves fully distributed — the edge set
    is a Dataset end-to-end, labels converge to the global min."""
    from research_knowledge_graph_ray.stages.canonicalize import connected_components_ds

    n = 100_000
    hubs = np.arange(0, n, 100)  # 1000 bucket hubs
    a = np.repeat(hubs, 100)[:n]
    b = np.arange(n)
    mask = a != b
    edges = pd.DataFrame({"a": a[mask].astype(np.int64), "b": b[mask].astype(np.int64)})
    # overlap the hubs through doc 0 so everything is ONE component — the
    # short-diameter overlap shape banded LSH produces (convergence is
    # O(component diameter); star edges keep diameters small)
    link = pd.DataFrame({"a": np.zeros(len(hubs) - 1, dtype=np.int64),
                         "b": hubs[1:].astype(np.int64)})
    # plus a disjoint small component that must NOT merge
    iso = pd.DataFrame({"a": [10**9], "b": [10**9 + 1]})
    ds = ray.data.from_pandas(pd.concat([edges, link, iso], ignore_index=True))
    labels = connected_components_ds(ds).to_pandas()
    big = labels[labels["node"] < 10**9]
    assert len(big) == n
    assert (big["label"] == 0).all(), "mega-cluster did not converge to min label"
    iso_lab = labels[labels["node"] >= 10**9]
    assert set(iso_lab["label"]) == {10**9}, "disjoint component merged or mislabeled"
