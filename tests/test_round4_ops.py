"""Targeted invariants for the dominance / mining / monitoring operators
(the oracle gate in test_queries_vs_duckdb covers value parity; these pin
the algorithmic properties on adversarial inputs)."""

import numpy as np
import pandas as pd

from research_knowledge_graph_ray.stages.stats import _skyline_2d


def _brute_skyline(df: pd.DataFrame) -> set:
    pts = list(df[["p", "d"]].itertuples(index=False, name=None))
    out = set()
    for i, (p, d) in enumerate(pts):
        dominated = any(
            (p2 >= p and d2 >= d and (p2 > p or d2 > d))
            for j, (p2, d2) in enumerate(pts) if j != i
        )
        if not dominated:
            out.add((p, d))
    return out


def test_skyline_matches_bruteforce_with_ties():
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "p": rng.integers(0, 20, 300).astype(float),
        "d": rng.integers(0, 20, 300),
    })
    # plant exact duplicates on the frontier: both must survive
    df = pd.concat([df, pd.DataFrame({"p": [100.0, 100.0], "d": [50, 50]})],
                   ignore_index=True)
    got = set(map(tuple, _skyline_2d(df)[["p", "d"]].to_numpy()))
    assert got == _brute_skyline(df)
    # duplicates kept as rows, not collapsed
    sky = _skyline_2d(df)
    assert len(sky[(sky["p"] == 100.0) & (sky["d"] == 50)]) == 2


def test_skyline_block_union_is_lossless():
    # distributed contract: global skyline ⊆ union of block-local skylines
    rng = np.random.default_rng(11)
    df = pd.DataFrame({"p": rng.integers(0, 50, 500).astype(float),
                       "d": rng.integers(0, 50, 500)})
    blocks = np.array_split(df, 7)
    union = pd.concat([_skyline_2d(b) for b in blocks], ignore_index=True)
    got = set(map(tuple, _skyline_2d(union)[["p", "d"]].to_numpy()))
    assert got == _brute_skyline(df)


def test_assoc_rules_invariants(sf_dir):
    from research_knowledge_graph_ray.stages.graphalgs import assoc_rules

    df = assoc_rules(sf_dir).to_pandas()
    assert (df["support"] >= 2).all()
    # confidence ∈ (0, 1]; support never exceeds either item's degree
    assert (df["support"] <= df["n_ante"]).all()
    assert (df["support"] <= df["n_cons"]).all()
    assert (df["conf_e9"] > 0).all() and (df["conf_e9"] <= 10**9).all()
    # each unordered pair appears exactly twice (both rule directions)
    key = df.apply(lambda r: (min(r["ante"], r["cons"]),
                              max(r["ante"], r["cons"])), axis=1)
    assert (key.value_counts() == 2).all()


def test_late_events_bounds(sf_dir):
    from research_knowledge_graph_ray.pipelines.windows import late_events

    df = late_events(sf_dir).to_pandas()
    assert (df["n_late"] >= 0).all()
    assert (df["n_late"] < df["n_events"]).all()  # first event is never late


def test_watermark_drops_planted_late_rows(tmp_path):
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pqw

    from research_knowledge_graph_ray.pipelines.windows import (
        WATERMARK_DROPS_SQL, watermark_drops)

    d = str(tmp_path)
    rng = np.random.default_rng(3)
    n = 5000
    base = pd.Timestamp("2024-01-01").value // 1000  # µs
    ts = base + np.sort(rng.integers(0, 86_400_000_000, n))
    # plant heavy disorder: 5% of rows arrive with a 1–6 h-old timestamp
    late = rng.random(n) < 0.05
    ts = np.where(late, ts - rng.integers(3_600_000_000, 6 * 3_600_000_000, n), ts)
    pqw.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "event_type": pa.array(rng.choice(["a", "b", "c"], n)),
    }), f"{d}/events.parquet")

    got = watermark_drops(d)
    assert int(got["n_dropped"].sum()) > 0  # disorder actually exercised

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    exp = (con.execute(WATERMARK_DROPS_SQL).df()
           .sort_values("event_type").reset_index(drop=True)
           .astype({"n_dropped": np.int64, "n_total": np.int64}))
    pd.testing.assert_frame_equal(got, exp)


def test_morton16_locality_and_bounds():
    from research_knowledge_graph_ray.stages.layout import morton16

    qx = np.arange(256, dtype=np.uint32)
    qy = np.arange(256, dtype=np.uint32)
    z = morton16(qx, qy)
    assert z.min() >= 0 and z.max() < 65536
    # bit interleave is a bijection on the 256x256 grid
    gx, gy = np.meshgrid(qx, qy)
    zz = morton16(gx.ravel(), gy.ravel())
    assert len(np.unique(zz)) == 65536
    # locality: one step in either coordinate moves z by a bounded amount
    assert morton16(np.array([5]), np.array([7]))[0] != \
           morton16(np.array([7]), np.array([5]))[0]


def test_zorder_box_parity_and_pruning(ray_session, tmp_path, sf_dir):
    import ray.data

    from research_knowledge_graph_ray.stages.layout import (
        pruned_box_files, read_pruned_box, write_zorder)

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    d = str(tmp_path / "z")
    m = write_zorder(ds, "o_totalprice", "o_custkey", d, n_files=16)
    # layout is lossless
    assert sum(z["rows"] for z in m["zones"]) == ds.count()

    full = ds.to_pandas()
    box = (80_000.0, 200_000.0, 20.0, 70.0)
    want = full[(full["o_totalprice"] >= box[0]) & (full["o_totalprice"] <= box[1])
                & (full["o_custkey"] >= box[2]) & (full["o_custkey"] <= box[3])]
    got = read_pruned_box(d, *box).to_pandas()
    assert sorted(got["o_orderkey"]) == sorted(want["o_orderkey"])
    # the Z-order win: a small box must NOT open every file
    opened, total = pruned_box_files(d, *box)
    assert total == 16 and opened < total


def test_hybrid_search_rrf_invariants(sf_dir):
    from research_knowledge_graph_ray.pipelines.kgflat import (
        _RRF_K, hybrid_search, term_search)
    from research_knowledge_graph_ray.stages.similarity import knn_topk

    df = hybrid_search(sf_dir)
    assert list(df.columns) == ["doc_id", "rrf_e9", "lex_rank", "sem_rank"]
    assert (df["rrf_e9"] > 0).all()
    assert df["rrf_e9"].is_monotonic_decreasing
    # a doc present in both lists outranks rank-sum-equal single-list docs:
    # score decomposition is exactly 1e9//(60+r) per present list
    e9 = 10 ** 9
    for _, r in df.iterrows():
        want = (e9 // (_RRF_K + r["lex_rank"]) if r["lex_rank"] else 0) \
             + (e9 // (_RRF_K + r["sem_rank"]) if r["sem_rank"] else 0)
        assert int(r["rrf_e9"]) == want
    # semantic rank 1 must be the knn_topk winner
    top_sem = knn_topk(sf_dir, k=1).to_pandas()["vec_id"].iloc[0]
    sem1 = df[df["sem_rank"] == 1]
    if len(sem1):
        assert int(sem1["doc_id"].iloc[0]) == int(top_sem)


def test_linear_attribution_vectorized_vs_brute(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pqw

    from research_knowledge_graph_ray.pipelines.windows import (
        ATTRIB_WINDOW_US, linear_attribution)

    rng = np.random.default_rng(21)
    n = 4000
    base = pd.Timestamp("2024-03-01").value // 1000
    ts = base + rng.integers(0, 20 * 86_400_000_000, n)
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 60, n).astype(np.int64),  # heavy overlap
        "ts": ts,
        "event_type": rng.choice(["click", "purchase", "view"], n,
                                 p=[0.5, 0.3, 0.2]),
        "value": np.round(rng.uniform(0, 500, n), 2),
    })
    # adversarial ties: duplicate timestamps inside users
    df.loc[10:30, "ts"] = df.loc[10, "ts"]
    d = str(tmp_path)
    t = pa.table({**{c: df[c] for c in ["event_id", "user_id"]},
                  "ts": pa.array(df["ts"], type=pa.timestamp("us")),
                  "event_type": pa.array(df["event_type"]),
                  "value": pa.array(df["value"])})
    pqw.write_table(t, f"{d}/events.parquet")

    got = linear_attribution(d)

    # brute-force per-purchase reference
    credit: dict[int, int] = {}
    for uid, g in df.groupby("user_id"):
        clicks = (g[g["event_type"] == "click"][["event_id", "ts"]]
                  .sort_values(["ts", "event_id"]).reset_index(drop=True))
        for _, p in g[g["event_type"] == "purchase"].iterrows():
            w = clicks[(clicks["ts"] > p["ts"] - ATTRIB_WINDOW_US)
                       & (clicks["ts"] <= p["ts"])]
            if w.empty:
                continue
            cents = int(round(p["value"] * 100))
            share, rem = divmod(cents, len(w))
            for j, cid in enumerate(w["event_id"]):
                credit[int(cid)] = credit.get(int(cid), 0) \
                    + share + (rem if j == 0 else 0)
    want = (pd.DataFrame({"click_event_id": list(credit),
                          "attributed_cents": list(credit.values())})
            .sort_values("click_event_id").reset_index(drop=True))
    assert len(got) == len(want)
    assert (got["click_event_id"].to_numpy()
            == want["click_event_id"].to_numpy()).all()
    assert (got["attributed_cents"].to_numpy()
            == want["attributed_cents"].to_numpy()).all()
    # exact conservation: every attributable purchase total lands somewhere
    assert int(got["attributed_cents"].sum()) == sum(credit.values())


def test_embedding_kmeans_matches_integer_replay(ray_session, sf_dir):
    """The distributed integer k-means equals a single-machine numpy replay
    of the exact recurrence (md5-rank init → assign → Σ//n update), and the
    translation offset keeps every quantized coordinate nonnegative (the
    precondition that makes numpy floor-div == DuckDB trunc-div)."""
    import hashlib

    import pyarrow.parquet as pq

    from research_knowledge_graph_ray.stages import similarity as sim

    k, iters = 8, 2
    got = (sim.embedding_kmeans(sf_dir, k=k, iters=iters).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy().astype(np.int64)
    x = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    q = np.floor(x * sim._KM_SCALE).astype(np.int64) + sim._KM_OFFSET
    assert q.min() >= 0

    hk = np.array([int.from_bytes(
        hashlib.md5(str(int(i)).encode()).digest()[:4], "big") for i in ids],
        dtype=np.int64)
    order = np.lexsort((ids, hk))[:k]
    cents = q[order].copy()
    for _ in range(iters):
        assign, _ = sim._km_assign(q, cents)
        for c in range(k):
            members = q[assign == c]
            if len(members):
                cents[c] = members.sum(axis=0) // len(members)
    assign, d = sim._km_assign(q, cents)
    want = pd.DataFrame({"vec_id": ids, "cluster": assign.astype(np.int64),
                         "dist": d[np.arange(len(ids)), assign]})
    want = want.sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert got["cluster"].nunique() > 1  # non-degenerate at test scale


def test_hits_invariants(ray_session, sf_dir):
    """HITS scores: integers in [0, 1e6], max on each side exactly 1e6 after
    the floor-div rescale, hubs ⊆ suppliers / auths ⊆ offset parts, and a
    brute-force numpy replay of the integer recurrence agrees exactly."""
    import pyarrow.parquet as pq

    from research_knowledge_graph_ray.stages import graphalgs

    got = graphalgs.hits(sf_dir, iters=3)
    hubs = got[got["kind"] == "hub"]
    auths = got[got["kind"] == "auth"]
    assert hubs["score_e6"].max() == 1_000_000
    assert auths["score_e6"].max() == 1_000_000
    assert (got["score_e6"] >= 0).all()
    assert (hubs["node"] < graphalgs._PART_OFFSET).all()
    assert (auths["node"] >= graphalgs._PART_OFFSET).all()

    # brute replay of the all-integer recurrence on the driver
    li = pq.read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_suppkey", "l_partkey"]).to_pandas()
    e = pd.DataFrame({
        "src": li["l_suppkey"].astype(np.int64),
        "dst": li["l_partkey"].astype(np.int64) + graphalgs._PART_OFFSET,
    }).drop_duplicates()
    h = pd.Series(graphalgs._HITS_SCALE, index=sorted(e["src"].unique()),
                  dtype=np.int64)
    for _ in range(3):
        a = e["src"].map(h).groupby(e["dst"].to_numpy()).sum().astype(np.int64)
        a = (a * graphalgs._HITS_SCALE) // int(a.max())
        h = e["dst"].map(a).groupby(e["src"].to_numpy()).sum().astype(np.int64)
        h = (h * graphalgs._HITS_SCALE) // int(h.max())
    exp_h = h.sort_index()
    got_h = hubs.set_index("node")["score_e6"].sort_index()
    pd.testing.assert_series_equal(got_h, exp_h, check_names=False)
    exp_a = a.sort_index()
    got_a = auths.set_index("node")["score_e6"].sort_index()
    pd.testing.assert_series_equal(got_a, exp_a, check_names=False)


def test_bpe_merge_counts_conservation(ray_session, sf_dir):
    """Σn over the merge table equals Σ_words (len(word)−1) — every
    word-internal adjacent pair is counted exactly once, none straddle a
    boundary — and the most frequent pair is the argmax of a brute replay."""
    import collections

    import pyarrow.parquet as pq

    from research_knowledge_graph_ray.stages import textops

    got = textops.bpe_merge_counts(sf_dir)
    texts = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["text"])["text"].to_pylist()
    brute = collections.Counter()
    total = 0
    for t in texts:
        for w in t.split(" "):
            total += max(0, len(w) - 1)
            for a, b in zip(w, w[1:]):
                brute[(a, b)] += 1
    assert int(got["n"].sum()) == total
    top = got.sort_values(["n", "l", "r"], ascending=[False, True, True]).iloc[0]
    assert brute[(top["l"], top["r"])] == max(brute.values())
    want = pd.DataFrame(
        [(a, b, n) for (a, b), n in sorted(brute.items())],
        columns=["l", "r", "n"])
    want["n"] = want["n"].astype(np.int64)
    pd.testing.assert_frame_equal(got, want)


def test_graph_walks_are_valid_paths(ray_session, sf_dir):
    """Every consecutive (node, next) in a walk is a real undirected edge,
    every walk starts at its own supplier id, steps are dense 0..L, and the
    hash draw actually disperses walks (not all walks pick the same part)."""
    import pyarrow.parquet as pq

    from research_knowledge_graph_ray.stages import graphalgs

    got = graphalgs.graph_walks(sf_dir)
    li = pq.read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_suppkey", "l_partkey"]).to_pandas()
    e = set(zip(li["l_suppkey"].astype(int),
                (li["l_partkey"] + graphalgs._PART_OFFSET).astype(int)))
    und = e | {(b, a) for a, b in e}

    for wid, g in got.groupby("walk_id"):
        g = g.sort_values("step")
        assert g["step"].tolist() == list(range(len(g)))
        assert int(g["node"].iloc[0]) == int(wid)
        path = g["node"].astype(int).tolist()
        for a, b in zip(path, path[1:]):
            assert (a, b) in und, (wid, a, b)
    # dispersion: step-1 destinations are not all identical
    s1 = got[got["step"] == 1]["node"]
    assert s1.nunique() > 1


def test_top_tokens_cms_collisions_match_sql(ray_session, tmp_path):
    """On a vocabulary ≫ sketch width, collisions MUST overcount — and the
    DuckDB rebuild of the same md5-slot sketch agrees on every estimate."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pqw

    from research_knowledge_graph_ray.stages import textops

    rng = np.random.default_rng(5)
    vocab = [f"tok{i}" for i in range(3000)]
    texts = [" ".join(rng.choice(vocab, 40)) for _ in range(200)]
    # plant clear heavy hitters so the top-20 is stable
    texts += ["alpha beta " * 50, "alpha gamma " * 40]
    d = str(tmp_path)
    pqw.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
    }), f"{d}/documents.parquet")

    got = textops.top_tokens_cms(d)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
    exp = con.execute(textops.TOP_TOKENS_CMS_SQL).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype({"n": np.int64, "est": np.int64}),
        exp.astype({"n": np.int64, "est": np.int64}))
    assert (got["est"] >= got["n"]).all()
    # 3000 tokens into 1024 slots: at least one reported estimate collides
    assert (got["est"] > got["n"]).any()


def test_mmr_rerank_skips_planted_near_duplicate(ray_session, tmp_path):
    """A near-exact copy of the top hit must NOT take rank 2 under MMR
    (plain top-k would rank it second); the SQL greedy chain agrees."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pqw

    from research_knowledge_graph_ray.stages import similarity

    # geometry where diversification CAN fire: the top hit sits off the
    # query axis (rel 0.8), its near-copy pays ~full diversity penalty
    # (7·0.8 − 3·1.0 = 2.6), while an off-axis candidate at rel 0.75 with
    # sim ≈ 0.2 to the top hit scores 7·0.75 − 3·0.2 = 4.65 and takes rank 2
    rng = np.random.default_rng(13)
    dim = 16
    q = np.zeros(dim); q[0] = 1.0
    best = np.zeros(dim); best[0], best[1] = 0.8, 0.6
    dup = best + rng.normal(scale=0.001, size=dim)    # near-copy of the top hit
    candb = np.zeros(dim); candb[0], candb[1] = 0.75, -np.sqrt(1 - 0.75 ** 2)
    others = rng.normal(scale=0.1, size=(30, dim))    # low-relevance filler
    vecs = np.vstack([q, best, dup, candb, others]).astype(np.float32)
    d = str(tmp_path)
    pqw.write_table(pa.table({
        "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float32())),
        "label": pa.array(np.zeros(len(vecs), dtype=np.int32)),
    }), f"{d}/embeddings.parquet")

    got = similarity.mmr_rerank(d, query_vec_id=0, n_cand=20, k=4)
    plain = similarity.knn_topk(d, query_vec_id=0, k=4).to_pandas()
    assert sorted(plain["vec_id"].tolist()[:2]) == [1, 2]  # dup crowds top-k
    assert got["vec_id"].iloc[0] in (1, 2)
    assert int(got["vec_id"].iloc[1]) == 3  # MMR defers the near-copy

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{d}/embeddings.parquet')")
    exp = con.execute(
        similarity.mmr_rerank_sql(query_vec_id=0, n_cand=20, k=4)).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype("int64"), exp.astype("int64"))


def test_semdedup_matches_brute_replay(ray_session, sf_dir):
    """SemDeDup == numpy replay: kmeans labels (oracle-gated path), brute
    within-cluster τ-pair graph, per-cluster union-find, min-id canonical.
    Also pins the SemDeDup semantic: components never span clusters."""
    import pyarrow.parquet as pq

    from research_knowledge_graph_ray.stages import dedup
    from research_knowledge_graph_ray.stages import similarity as sim

    got = (dedup.semdedup(sf_dir).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))

    lab = (sim.embedding_kmeans(sf_dir).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy().astype(np.int64)
    x = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    u = x / np.linalg.norm(x, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, u = ids[order], u[order]
    assert (ids == lab["vec_id"].to_numpy()).all()

    comp = {}
    for cl in sorted(lab["cluster"].unique()):
        m = lab["cluster"].to_numpy() == cl
        cids, cu = ids[m], u[m]
        sim_e6 = np.floor(cu @ cu.T * 1e6 + 0.5).astype(np.int64)
        parent = {int(v): int(v) for v in cids}

        def find(v):
            while parent[v] != v:
                parent[v] = parent[parent[v]]
                v = parent[v]
            return v

        ii, jj = np.nonzero(np.triu(sim_e6 >= 400000, k=1))
        for i, j in zip(ii, jj):
            a, b = find(int(cids[i])), find(int(cids[j]))
            if a != b:
                parent[max(a, b)] = min(a, b)
        for v in cids:
            comp[int(v)] = find(int(v))

    want = pd.DataFrame({
        "vec_id": ids,
        "cluster": lab["cluster"].to_numpy(np.int64),
        "component": np.array([comp[int(v)] for v in ids], np.int64),
    })
    want["is_canonical"] = (want["vec_id"] == want["component"]).astype(np.int64)
    pd.testing.assert_frame_equal(got, want)
    # components never span clusters (the SemDeDup semantic)
    span = got.groupby("component")["cluster"].nunique()
    assert (span == 1).all()
    assert (got["is_canonical"] == 0).any()  # dedup actually fires


def test_bm25_length_normalization(ray_session, tmp_path):
    """With equal tf, BM25 must rank the SHORTER document higher (the b·dl
    length penalty) — and saturate: doubling tf must not double the
    contribution (the k1 saturation). SQL parity on the planted corpus."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pqw

    from research_knowledge_graph_ray.pipelines import kgflat

    filler = "alpha beta gamma delta"
    docs = [
        "hash join " + filler,                       # 0: short, tf=1 each
        "hash join " + " ".join([filler] * 20),      # 1: long, same tf
        "hash hash join " + filler,                  # 2: short, tf_hash=2
        filler,                                      # 3: no query terms
    ]
    d = str(tmp_path)
    pqw.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
        "text": pa.array(docs),
    }), f"{d}/documents.parquet")

    got = kgflat.bm25_search(d, terms=("hash", "join"), k=10)
    s = dict(zip(got["doc_id"], got["score"]))
    assert 3 not in s                      # zero-score docs excluded
    assert s[0] > s[1]                     # shorter doc wins at equal tf
    assert s[2] > s[0]                     # more tf still scores higher...
    assert s[2] < 2 * s[0]                 # ...but sub-linearly (saturation)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    exp = con.execute(kgflat.bm25_search_sql(terms=("hash", "join"), k=10)).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype("int64"), exp.astype("int64"))


def test_dedup_incremental_planted_branches(ray_session, tmp_path):
    """All three decisions fire: dropped-against-base, dropped-against-
    earlier-increment (min-id first), and kept; base rows never emitted."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pqw

    from research_knowledge_graph_ray.stages import dedup

    texts = {
        0: "already ingested doc",      # base
        1: "another base doc",          # base
        10: "already ingested doc",     # incr, dup of base -> 'base'
        11: "fresh increment doc",      # incr, first -> keep
        12: "fresh increment doc",      # incr, dup of 11 -> 'incr'
        13: "unique increment doc",     # incr, unique -> keep
    }
    d = str(tmp_path)
    pqw.write_table(pa.table({
        "doc_id": pa.array(list(texts), type=pa.int64()),
        "text": pa.array(list(texts.values())),
    }), f"{d}/documents.parquet")

    got = (dedup.dedup_incremental(d, split=10).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [10, 11, 12, 13]  # base never emitted
    assert got.set_index("doc_id")["reason"].to_dict() == {
        10: "base", 11: "", 12: "incr", 13: ""}
    assert got.set_index("doc_id")["keep"].to_dict() == {
        10: 0, 11: 1, 12: 0, 13: 1}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    exp = (con.execute(dedup.dedup_incremental_sql(split=10)).df()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype(str), exp[got.columns].astype(str))


def test_embedding_quantize_reconstruction_bound(ray_session, sf_dir):
    """Dequantized coordinates reconstruct within scale/254 + float eps, the
    codes stay in [-127, 127], and the knn ranking over dequantized vectors
    agrees with the float ranking on the clear winner (sanity that 4x
    compression preserves similarity structure)."""
    import pyarrow.parquet as pq

    from research_knowledge_graph_ray.stages import similarity as sim

    q = (sim.embedding_quantize(sf_dir).to_pandas()
         .sort_values(["vec_id", "i"]).reset_index(drop=True))
    assert q["q"].abs().max() <= 127

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy().astype(np.int64)
    x = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    order = np.argsort(ids)
    ids, x = ids[order], x[order]
    n, d = x.shape
    codes = q["q"].to_numpy(np.int64).reshape(n, d)
    scale = q["scale_e9"].to_numpy(np.int64).reshape(n, d)[:, 0] / 1e9
    recon = codes * scale[:, None] / 127
    err = np.abs(recon - x)
    bound = scale / 254 + 1e-9 + np.abs(x).max() * 1e-9
    assert (err <= bound[:, None] + 1e-12).all()


def test_neighbor_sample_structure(ray_session, sf_dir):
    """Fanout bounds hold per (root, hop-1) and (root, parent, hop-2), every
    sampled edge is a real undirected edge, hop-2 parents were sampled at
    hop 1, and different roots draw different hop-1 samples (independence)."""
    import pyarrow.parquet as pq

    from research_knowledge_graph_ray.stages import graphalgs

    got = graphalgs.neighbor_sample(sf_dir)
    li = pq.read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_suppkey", "l_partkey"]).to_pandas()
    e = set(zip(li["l_suppkey"].astype(int),
                (li["l_partkey"] + graphalgs._PART_OFFSET).astype(int)))
    und = e | {(b, a) for a, b in e}

    h1 = got[got["hop"] == 1]
    h2 = got[got["hop"] == 2]
    assert (h1.groupby("root").size() <= graphalgs._SAMPLE_FANOUT).all()
    assert (h2.groupby(["root", "parent"]).size()
            <= graphalgs._SAMPLE_FANOUT).all()
    for _, r in h1.iterrows():
        assert (int(r["parent"]), int(r["node"])) in und
        assert int(r["parent"]) == int(r["root"])
    for _, r in h2.iterrows():
        assert (int(r["parent"]), int(r["node"])) in und
    sampled1 = set(zip(h1["root"].astype(int), h1["node"].astype(int)))
    assert set(zip(h2["root"].astype(int), h2["parent"].astype(int))) <= sampled1
    # md5 keyed per root: hop-1 node sets are not all identical
    per_root = h1.groupby("root")["node"].apply(frozenset)
    assert per_root.nunique() > 1


def test_price_quantile_sketch_error_bound(ray_session, sf_dir):
    """Every sketch estimate sits within one bin width of the exact
    percentile, and estimates are monotone in p."""
    import duckdb

    from research_knowledge_graph_ray.stages import stats

    got = stats.price_quantile_sketch(sf_dir)
    w = int(got["bin_w_cents"].iloc[0])
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{sf_dir}/orders.parquet')")
    for p, est in zip(got["pct"], got["est_cents"]):
        exact = con.execute(
            f"SELECT CAST(ROUND(percentile_disc({int(p)/100}) WITHIN GROUP "
            f"(ORDER BY o_totalprice) * 100) AS BIGINT) FROM orders"
        ).fetchone()[0]
        assert abs(int(est) - int(exact)) <= w + 1
    assert got["est_cents"].is_monotonic_increasing


def test_dataset_split_exact_ratios_and_coverage(ray_session, sf_dir):
    """Every doc gets exactly one label; per-source counts are exactly
    floor(n·0.8)/floor(n·0.1)/rest; a doc's split never depends on other
    sources (re-running on one source's subset preserves its labels)."""
    import pyarrow.parquet as pq

    from research_knowledge_graph_ray.stages import sampling

    got = sampling.dataset_split(sf_dir).to_pandas()
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"]).to_pandas()
    assert len(got) == len(docs)
    assert got["doc_id"].is_unique
    for src, g in got.groupby("source"):
        n = len(g)
        c = g["split"].value_counts()
        assert c.get("train", 0) == n * 80 // 100
        assert c.get("val", 0) == n * 10 // 100
        assert c.get("test", 0) == n - n * 80 // 100 - n * 10 // 100


def test_bpe_merge_counts_newline_in_doc_matches_sql(ray_session, tmp_path):
    """A document containing '\\n' must count pairs across the newline
    exactly like SQL's space-only word split (regression: the kernel used
    to mask newline bytes the oracle kept)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pqw

    from research_knowledge_graph_ray.stages import textops

    d = str(tmp_path)
    pqw.write_table(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["ab\ncd ef", "gh ij"]),
    }), f"{d}/documents.parquet")
    got = textops.bpe_merge_counts(d)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    exp = con.execute(textops.BPE_MERGE_COUNTS_SQL).df()
    pd.testing.assert_frame_equal(got.astype(str), exp.astype(str))
    # the newline pair is REAL word-internal content on both sides
    assert ((got["l"] == "\n") | (got["r"] == "\n")).any()


def test_reciprocal_nn_is_mutual_subset(ray_session, sf_dir):
    """Every reciprocal pair appears in BOTH directions of knn_join, and
    every one-directional kNN edge is absent — mutuality is exact."""
    from research_knowledge_graph_ray.stages import similarity as sim

    knn = sim.knn_join(sf_dir).to_pandas()
    directed = set(zip(knn["vec_id"].astype(int), knn["nn_id"].astype(int)))
    got = sim.reciprocal_nn_pairs(sf_dir).to_pandas()
    assert (got["vec_a"] < got["vec_b"]).all()
    for a, b in zip(got["vec_a"].astype(int), got["vec_b"].astype(int)):
        assert (a, b) in directed and (b, a) in directed
    want = {(min(a, b), max(a, b)) for a, b in directed
            if (b, a) in directed}
    assert set(zip(got["vec_a"].astype(int), got["vec_b"].astype(int))) == want
    assert len(want) < len(directed)  # the filter actually drops edges


def test_embedding_moments_overflow_guard(ray_session, tmp_path):
    """The int64 Gram bound (n * max|q|^2 < 2^63) is enforced at runtime, not
    just documented: numpy would wrap silently where DuckDB promotes, so the
    op must refuse loudly instead of diverging from its oracle."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from research_knowledge_graph_ray.stages import stats

    t = pa.table({
        "vec_id": pa.array([0], pa.int64()),
        # |q| = floor(4000 * 1e6) = 4e9 -> n*|q|^2 = 1.6e19 >= 2^63
        "embedding": pa.array([[4000.0, 0.0]], pa.list_(pa.float32())),
        "label": pa.array([0], pa.int32()),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    with pytest.raises(OverflowError, match="bound exceeded"):
        stats.embedding_moments(str(tmp_path))


def test_knn_join_auto_dispatch(ray_session):
    """The adaptive kNN join picks brute under the broadcast cap and IVF past
    it, and BOTH plans return identical rows (the exact-config guarantee)."""
    import pandas as pd

    from research_knowledge_graph_ray.stages import similarity

    sf = "/root/testdata/sf0.001"
    assert similarity._knn_join_plan(sf, 256 << 20) == "brute"
    assert similarity._knn_join_plan(sf, 1 << 10) == "ivf"

    def canon(ds):
        return (ds.to_pandas()[["vec_id", "nn_id", "nn_rank", "sim_e6"]]
                .sort_values(["vec_id", "nn_rank"]).reset_index(drop=True))

    brute = canon(similarity.knn_join_auto(sf))
    ivf = canon(similarity.knn_join_auto(sf, broadcast_cap_bytes=1 << 10))
    pd.testing.assert_frame_equal(brute, ivf, check_dtype=False)


def test_repetition_filter_planted_boilerplate(ray_session, tmp_path):
    """Adversarial repetition shapes: a one-word spam doc and a repeated
    bigram loop must be dropped, a varied doc kept, a single-word doc gets
    zero bigram stats — and every row matches the SQL oracle exactly
    (including the double-space empty-token edge)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pqw

    from research_knowledge_graph_ray.stages import textops

    varied = " ".join(f"word{i}" for i in range(20))
    d = str(tmp_path)
    pqw.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "text": pa.array([
            "spam " * 49 + "spam",             # one repeated word
            varied,                             # all-distinct words
            "click here " * 24 + "click here",  # repeated bigram loop
            "lonely",                           # single word, no bigrams
            "a  b a  b",                        # double spaces -> empty tokens
        ]),
    }), f"{d}/documents.parquet")
    got = (textops.repetition_filter(d).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    exp = (con.execute(textops.REPETITION_FILTER_SQL).df()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_exact=True)
    assert got.loc[0, "top_word_bp"] == 10000 and got.loc[0, "keep"] == 0
    assert got.loc[1, "keep"] == 1 and got.loc[1, "dup_word_bp"] == 0
    assert got.loc[2, "top_bigram_bp"] > 4000 and got.loc[2, "keep"] == 0
    assert (got.loc[3, ["top_bigram_bp", "dup_bigram_bp"]] == 0).all()


def test_label_propagation_stays_within_components(ray_session, tmp_path):
    """Two disconnected bicliques: labels must never cross the component
    boundary, and the distributed Pregel loop must replay the chained-CTE
    SQL bit-for-bit (including at n_buckets=1 vs 8)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pqw

    from research_knowledge_graph_ray.stages import graphalgs

    rows_s, rows_p = [], []
    for s in (1, 2, 3):
        for p in (1, 2, 3):
            rows_s.append(s); rows_p.append(p)
    for s in (101, 102, 103):
        for p in (4, 5, 6):
            rows_s.append(s); rows_p.append(p)
    d = str(tmp_path)
    pqw.write_table(pa.table({
        "l_suppkey": pa.array(rows_s, type=pa.int64()),
        "l_partkey": pa.array(rows_p, type=pa.int64()),
    }), f"{d}/lineitem.parquet")

    got = (graphalgs.label_propagation(d).to_pandas()
           .sort_values("node").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{d}/lineitem.parquet')")
    exp = (con.execute(graphalgs.label_propagation_sql()).df()
           .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_exact=True)

    comp_a = set((1, 2, 3)) | {p + 10_000_000 for p in (1, 2, 3)}
    comp_b = set((101, 102, 103)) | {p + 10_000_000 for p in (4, 5, 6)}
    lab = dict(zip(got["node"], got["community"]))
    assert set(lab) == comp_a | comp_b
    assert {lab[n] for n in comp_a}.isdisjoint({lab[n] for n in comp_b})

    one_bucket = (graphalgs.label_propagation(d, n_buckets=1).to_pandas()
                  .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, one_bucket, check_dtype=False,
                                  check_exact=True)


def test_pq_adc_retrieves_planted_cluster(ray_session, tmp_path):
    """PQ invariants on a planted two-cluster embedding set: every vector
    gets exactly one code per subspace in [0, k); ADC search from a cluster-A
    query ranks every cluster-A vector above every cluster-B vector (the
    clusters are separated far beyond the quantization error)."""
    import pyarrow as pa
    import pyarrow.parquet as pqw

    from research_knowledge_graph_ray.stages import similarity

    rng = np.random.default_rng(3)
    d, na, nb = 16, 12, 12
    a = rng.normal(0.8, 0.02, (na, d))
    b = rng.normal(-0.8, 0.02, (nb, d))
    vecs = np.vstack([a, b]).astype(np.float32)
    dd = str(tmp_path)
    pqw.write_table(pa.table({
        "vec_id": pa.array(np.arange(na + nb), type=pa.int64()),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
    }), f"{dd}/embeddings.parquet")

    codes = (similarity.pq_codes(dd).to_pandas()
             .sort_values(["vec_id", "sub"]).reset_index(drop=True))
    assert len(codes) == 2 * (na + nb)
    assert set(codes["sub"]) == {0, 1}
    assert codes["code"].between(0, similarity._PQ_K - 1).all()
    assert (codes.groupby("vec_id").size() == 2).all()

    hits = similarity.pq_search(dd, query_vec_id=0, topk=na - 1)
    assert list(hits["rank"]) == list(range(1, na))
    assert set(hits["vec_id"]) == set(range(1, na))  # all cluster-A, no B


def test_random_projection_linear_and_parallelism_invariant(ray_session, tmp_path):
    """JL projection invariants: exact linearity (y(a+b) = y(a)+y(b) in the
    integer domain when coordinates are exact multiples of 1e-6 ties are
    avoided by integer inputs) and independence from block layout (1 block
    vs 4 blocks produce identical projections)."""
    import pyarrow as pa
    import pyarrow.parquet as pqw

    from research_knowledge_graph_ray.stages import similarity

    rng = np.random.default_rng(5)
    d = 12
    # k/64 is exact in binary AND k/64·10⁶ = k·15625 is an exact integer, so
    # floor() is lossless and linearity holds exactly
    a = rng.integers(-256, 256, d) / 64
    b = rng.integers(-256, 256, d) / 64
    vecs = np.vstack([a, b, a + b]).astype(np.float64)

    dd = str(tmp_path)
    pqw.write_table(pa.table({
        "vec_id": pa.array([0, 1, 2], type=pa.int64()),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float64())),
    }), f"{dd}/embeddings.parquet")

    got = (similarity.random_projection(dd).to_pandas()
           .pivot(index="vec_id", columns="j", values="y"))
    assert (got.loc[2] == got.loc[0] + got.loc[1]).all()

    # block-layout invariance: same rows through a 4-block dataset
    import ray.data as rd
    ds4 = rd.read_parquet(f"{dd}/embeddings.parquet", override_num_blocks=4)
    S = np.array([[similarity._rp_sign(i, j)
                   for j in range(1, similarity._RP_DIMS + 1)]
                  for i in range(1, d + 1)], dtype=np.int64)
    q = np.floor(vecs * similarity._KM_SCALE).astype(np.int64)
    want = q @ S
    assert (got.to_numpy() == want).all()


def test_ktruss_survivors_are_cohesive_subset(ray_session, sf_dir):
    """k-truss invariants on the real co-graph: survivors are a subset of
    the original edges, and every surviving edge has >= k-2 triangles
    WITHIN the survivor set (the truss self-consistency property at the
    fixed point; with bounded rounds the brute recheck below uses the same
    round count)."""
    from research_knowledge_graph_ray.pipelines.kgflat import cooccurrence
    from research_knowledge_graph_ray.stages import graphalgs

    co = cooccurrence(sf_dir).to_pandas()
    edges = set(zip(co["term_a"].astype(str), co["term_b"].astype(str)))
    got = graphalgs.ktruss(sf_dir).to_pandas()
    surv = set(zip(got["ta"], got["tb"]))
    assert surv <= edges and len(surv) > 0

    # brute support replay with the same bounded rounds
    cur = edges
    for _ in range(graphalgs._TRUSS_ROUNDS):
        adj = {}
        for a, b in cur:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        nxt = {(a, b) for a, b in cur
               if len(adj[a] & adj[b]) >= graphalgs._TRUSS_K - 2}
        cur = nxt
    assert surv == cur
