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
    out = minhash_dedup_clusters(ds)
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
