"""Dedup family vs brute-force oracles (planted near-dups), KNN exactness,
IVF recall."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from research_knowledge_graph_ray.stages import dedup, similarity


@pytest.fixture(scope="module")
def dup_corpus(tmp_path_factory):
    """Corpus with planted exact + near duplicates of testdata documents."""
    d = tmp_path_factory.mktemp("dups")
    base = pq.read_table("/root/testdata/sf0.001/documents.parquet").to_pandas()
    base = base[["doc_id", "text"]].head(100)
    rows = [base]
    # exact dups: docs 1000+i duplicate doc i (i < 10)
    exact = base.head(10).copy()
    exact["doc_id"] = exact["doc_id"] + 1000
    rows.append(exact)
    # near dups: docs 2000+i = doc i with one word appended
    near = base.head(10).copy()
    near["doc_id"] = near["doc_id"] + 2000
    near["text"] = near["text"] + " tail"
    rows.append(near)
    df = pd.concat(rows, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), str(d / "documents.parquet"))
    return str(d), df


def test_exact_dedup_finds_planted(dup_corpus):
    d, df = dup_corpus
    out = dedup.exact_dedup(d).to_pandas()
    dupes = out[out["n_dupes"] > 1]
    assert len(dupes) == 10
    assert set(dupes["keep_doc_id"]) == set(range(10))
    assert (dupes["n_dupes"] == 2).all()


def test_minhash_finds_near_dups_and_matches_jaccard(dup_corpus):
    d, df = dup_corpus
    pairs = dedup.minhash_candidate_pairs(d, est_threshold=0.5).to_pandas()
    found = set(zip(pairs["doc_a"], pairs["doc_b"]))
    # every planted pair (i, 1000+i) has jaccard 1.0; (i, 2000+i) near 1.0
    for i in range(10):
        assert (i, 1000 + i) in found, f"exact pair {i} missed"
        assert (i, 2000 + i) in found, f"near pair {i} missed"
    # estimated jaccard within 0.2 of brute force for the found pairs
    texts = dict(zip(df["doc_id"], df["text"]))
    for _, row in pairs.iterrows():
        true_j = dedup.jaccard(texts[row["doc_a"]], texts[row["doc_b"]])
        assert abs(row["est_jaccard_bp"] / 10000 - true_j) < 0.2


def test_simhash_finds_near_dups(dup_corpus):
    d, df = dup_corpus
    pairs = dedup.simhash_pairs(d, max_hamming=3).to_pandas()
    found = set(zip(pairs["doc_a"], pairs["doc_b"]))
    for i in range(10):
        assert (i, 1000 + i) in found  # identical text → hamming 0
    zero = pairs[pairs["hamming"] == 0]
    assert len(zero) >= 10


def test_knn_topk_matches_brute_force(sf_dir):
    out = similarity.knn_topk(sf_dir, query_vec_id=0, k=10).to_pandas()
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    q = vecs[ids == 0][0]
    q = q / np.linalg.norm(q)
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs @ q) / norms
    mask = ids != 0
    order = sorted(zip(-sims[mask], ids[mask]))[:10]
    expected = [int(i) for _, i in order]
    assert out["vec_id"].tolist() == expected


def test_knn_ivf_recall(sf_dir):
    exact = set(similarity.knn_topk(sf_dir, query_vec_id=0, k=10).to_pandas()["vec_id"])
    approx = set(
        similarity.knn_topk_ivf(sf_dir, query_vec_id=0, k=10, n_centroids=8, nprobe=4)
        .to_pandas()["vec_id"]
    )
    # nprobe=4 of 8 buckets → expect at least half of the true top-k
    assert len(exact & approx) >= 5


def test_knn_ivf_kmeans_centroids(sf_dir):
    """k-means coarse quantizer (the production IVF path): full-probe scan is
    exact; pruned probing still recovers most of the true top-k."""
    exact = set(similarity.knn_topk(sf_dir, query_vec_id=0, k=10).to_pandas()["vec_id"])
    full = set(
        similarity.knn_topk_ivf(sf_dir, query_vec_id=0, k=10, n_centroids=8,
                                nprobe=8, centroid_mode="kmeans")
        .to_pandas()["vec_id"]
    )
    assert full == exact  # probing every bucket is exhaustive regardless of centroids
    pruned = set(
        similarity.knn_topk_ivf(sf_dir, query_vec_id=0, k=10, n_centroids=8,
                                nprobe=4, centroid_mode="kmeans")
        .to_pandas()["vec_id"]
    )
    assert len(exact & pruned) >= 5


def test_embedding_near_dups_against_brute(sf_dir):
    out = dedup.embedding_near_dups(sf_dir, tau=0.30).to_pandas()
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy()
    sims = vecs @ vecs.T
    brute = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids)) for j in range(i + 1, len(ids))
        if sims[i, j] >= 0.30
    }
    found = set(zip(out["vec_a"], out["vec_b"]))
    # LSH banding may miss pairs (approximate); everything found must be real
    assert found.issubset(brute)
    if brute:
        assert len(found) / len(brute) >= 0.5  # recall sanity at this τ


def test_embedding_exact_pairs_is_bruteforce(sf_dir):
    out = dedup.embedding_exact_pairs(sf_dir, tau=0.35).to_pandas()
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy()
    sims = vecs @ vecs.T
    brute = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids)) for j in range(i + 1, len(ids))
        if int(np.floor(sims[i, j] * 1e6 + 0.5)) >= 350_000
    }
    assert set(zip(out["vec_a"], out["vec_b"])) == brute  # EXACT, not approx
    assert not out.duplicated(["vec_a", "vec_b"]).any()


def test_embedding_exact_pairs_blocked_matches_brute(sf_dir):
    """The distributed block-nested join (registered operator) must equal the
    broadcast brute kernel pair-for-pair, including sim_e6 values."""
    brute = dedup.embedding_exact_pairs(sf_dir, tau=0.35).to_pandas()
    blocked = dedup.embedding_exact_pairs_blocked(sf_dir, tau=0.35).to_pandas()
    key = lambda df: df.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    a, b = key(brute), key(blocked)
    assert len(a) == len(b) > 0
    assert (a["vec_a"].to_numpy() == b["vec_a"].to_numpy()).all()
    assert (a["vec_b"].to_numpy() == b["vec_b"].to_numpy()).all()
    assert (a["sim_e6"].to_numpy() == b["sim_e6"].to_numpy()).all()
    assert not b.duplicated(["vec_a", "vec_b"]).any()


def test_embedding_clusters_lsh_mode(sf_dir):
    """mode='lsh' (the sub-quadratic 100-TB path) rides sign-LSH edges: its
    components must REFINE the exact components (LSH only misses edges, never
    invents them) and recover a healthy share of the true non-singletons."""
    tau = 0.30
    exact = dedup.embedding_dedup_clusters(sf_dir, tau=tau).to_pandas()
    lsh = dedup.embedding_dedup_clusters(sf_dir, tau=tau, mode="lsh").to_pandas()
    assert set(lsh["vec_id"]) == set(exact["vec_id"])  # full coverage
    e_comp = dict(zip(exact["vec_id"], exact["component"]))
    # two vectors in one LSH component are in one exact component (refinement)
    for _, grp in lsh.groupby("component"):
        assert len({e_comp[v] for v in grp["vec_id"]}) == 1
    e_nonsingleton = (exact["vec_id"] != exact["component"]).sum()
    l_nonsingleton = (lsh["vec_id"] != lsh["component"]).sum()
    if e_nonsingleton:
        assert l_nonsingleton / e_nonsingleton >= 0.5  # recall pin at this τ


def test_embedding_clusters_consistent_with_pairs(sf_dir):
    tau = 0.4
    pairs = dedup.embedding_exact_pairs(sf_dir, tau).to_pandas()
    clus = dedup.embedding_dedup_clusters(sf_dir, tau).to_pandas()
    comp = dict(zip(clus["vec_id"], clus["component"]))
    emb_ids = set(
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
        .to_pandas()["vec_id"]
    )
    # total coverage incl. singletons
    assert set(clus["vec_id"]) == emb_ids
    # paired vectors share a component
    for a, b in zip(pairs["vec_a"], pairs["vec_b"]):
        assert comp[a] == comp[b]
    # component label is the member minimum; exactly one canonical each
    g = clus.groupby("component")
    assert (g["vec_id"].min() == g["vec_id"].min().index).all()
    assert (g["is_canonical"].sum() == 1).all()
    assert ((clus["vec_id"] == clus["component"]) == (clus["is_canonical"] == 1)).all()


def test_passage_dedup_planted(ray_session):
    """Planted shared 20-word window: doc 1 repeats doc 0's first passage;
    only the first global occurrence survives, docs are reassembled."""
    import ray.data

    from research_knowledge_graph_ray.stages.dedup import passage_dedup_ds

    w0 = " ".join(f"alpha{i}" for i in range(20))     # shared window
    tail0 = " ".join(f"beta{i}" for i in range(15))   # unique tails
    tail1 = " ".join(f"gamma{i}" for i in range(25))
    docs = ray.data.from_items([
        {"doc_id": 0, "text": f"{w0} {tail0}"},
        {"doc_id": 1, "text": f"{w0} {tail1}"},
        {"doc_id": 2, "text": ""},
    ])
    out = passage_dedup_ds(docs).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[0, "n_dropped"] == 0
    assert out.loc[0, "clean_text"] == f"{w0} {tail0}"
    # doc 1 loses the shared window but keeps both of its own passages' tail
    assert out.loc[1, "n_dropped"] == 1
    assert out.loc[1, "n_passages"] == 3
    assert out.loc[1, "clean_text"] == tail1
    assert out.loc[2, "n_passages"] == 0 and out.loc[2, "clean_text"] == ""


def test_substring_dedup_planted(ray_session):
    """Planted mid-document duplicated run: doc 1 embeds 12 consecutive words
    of doc 0 at an arbitrary offset. With w=10, every stride-1 window inside
    the run duplicates; doc 1 loses exactly the 12 covered tokens while doc 0
    (the global first occurrence) keeps everything."""
    import ray.data

    from research_knowledge_graph_ray.stages.dedup import substring_dedup_ds

    run = " ".join(f"alpha{i}" for i in range(12))    # shared 12-word run
    pre0 = " ".join(f"beta{i}" for i in range(5))
    post0 = " ".join(f"gamma{i}" for i in range(4))
    pre1 = " ".join(f"delta{i}" for i in range(7))
    post1 = " ".join(f"eps{i}" for i in range(6))
    docs = ray.data.from_items([
        {"doc_id": 0, "text": f"{pre0} {run} {post0}"},
        {"doc_id": 1, "text": f"{pre1} {run} {post1}"},
        {"doc_id": 2, "text": "short doc"},           # < w words: untouched
    ])
    out = substring_dedup_ds(docs, w=10).to_pandas().set_index(
        "doc_id").sort_index()
    assert out.loc[0, "n_dup_tokens"] == 0
    assert out.loc[0, "clean_text"] == f"{pre0} {run} {post0}"
    assert out.loc[1, "n_tokens"] == 25
    assert out.loc[1, "n_dup_tokens"] == 12
    assert out.loc[1, "clean_text"] == f"{pre1} {post1}"
    assert out.loc[2, "n_dup_tokens"] == 0
    assert out.loc[2, "clean_text"] == "short doc"
