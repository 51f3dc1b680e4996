"""Unit semantics for the session's new operator batch: CUME_DIST over a
bounded domain, percentile_cont interpolation, byte-level char diversity,
clustering coefficient, and the drift monitor.

DuckDB value-hash parity is covered by tests/test_queries_vs_duckdb.py;
these tests pin semantics against independent brute-force twins (numpy /
pure Python) so a wrong-but-self-consistent SQL restatement can't hide a
bug.
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from research_knowledge_graph_ray.stages import graphalgs, stats, textops

SF = "/root/testdata/sf0.001"


def test_quantity_cume_dist_vs_brute_force():
    t = pq.read_table(f"{SF}/lineitem.parquet",
                      columns=["l_returnflag", "l_quantity"]).to_pandas()
    t["qty"] = np.rint(t["l_quantity"].to_numpy()).astype(np.int64)
    got = stats.quantity_cume_dist(SF)
    for _, r in got.iterrows():
        grp = t[t["l_returnflag"] == r["l_returnflag"]]
        cum = int((grp["qty"] <= r["qty"]).sum())
        n = int((grp["qty"] == r["qty"]).sum())
        assert r["n"] == n
        assert r["cume_e9"] == cum * 10**9 // len(grp)
    # complete domain: one row per observed (flag, qty)
    assert len(got) == t.groupby(["l_returnflag", "qty"]).ngroups
    # CDF ends at exactly 1.0 per flag
    assert (got.groupby("l_returnflag")["cume_e9"].max() == 10**9).all()


def test_price_quantiles_cont_vs_numpy_linear():
    t = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderstatus", "o_totalprice"]).to_pandas()
    t["cents"] = np.rint(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
    got = stats.price_quantiles_cont(SF).set_index("o_orderstatus")
    for st, grp in t.groupby("o_orderstatus"):
        v = grp["cents"].to_numpy(np.float64)
        for q, col in ((0.25, "p25_e4"), (0.5, "p50_e4"), (0.75, "p75_e4")):
            want = int(np.rint(np.quantile(v, q, method="linear") * 100))
            assert got.loc[st, col] == want, (st, col)


def test_char_diversity_vs_python_counter():
    from collections import Counter

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    got = textops.char_diversity(SF).to_pandas().set_index("doc_id")
    sample = t.head(25)
    for _, r in sample.iterrows():
        b = r["text"].encode()
        if not b:
            assert r["doc_id"] not in got.index
            continue
        c = Counter(b)
        row = got.loc[r["doc_id"]]
        assert row["n_bytes"] == len(b)
        assert row["n_distinct"] == len(c)
        assert row["sum_sq"] == sum(k * k for k in c.values())
        assert row["top_cnt"] == max(c.values())
    assert len(got) == int((t["text"].str.len() > 0).sum())


def test_clustering_coefficient_vs_brute_force():
    import itertools

    from research_knowledge_graph_ray.pipelines.kgflat import cooccurrence

    co = cooccurrence(SF).to_pandas()
    adj: dict[str, set] = {}
    for a, b in zip(co["term_a"], co["term_b"]):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    got = graphalgs.clustering_coefficient(SF).set_index("term")
    assert set(got.index) == {t for t, nb in adj.items() if len(nb) >= 2}
    for term, nb in adj.items():
        d = len(nb)
        if d < 2:
            continue
        tri = sum(1 for x, y in itertools.combinations(sorted(nb), 2)
                  if y in adj.get(x, ()))
        row = got.loc[term]
        assert row["d"] == d
        assert row["n_tri"] == tri
        assert row["coeff_e9"] == 2 * tri * 10**9 // (d * (d - 1))


def test_event_type_drift_vs_brute_force():
    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["ts", "event_type"]).to_pandas()
    us = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    mid = (int(us.min()) + int(us.max())) // 2
    got = stats.event_type_drift(SF).set_index("event_type")
    for ty, grp_idx in t.groupby("event_type").groups.items():
        g = us[t.index.get_indexer(grp_idx)]
        a, b = int((g <= mid).sum()), int((g > mid).sum())
        row = got.loc[ty]
        assert row["n_first"] == a and row["n_second"] == b
        assert row["ratio_e9"] == (b * 10**9 // a if a else -1)
    assert int(got["n_first"].sum() + got["n_second"].sum()) == len(t)


def test_exact_group_quantiles_cont_planted_interpolation():
    # 5 values: h = (n-1)q hits exact quarter fractions; brackets interpolate
    import ray.data

    df = pd.DataFrame({"g": ["x"] * 5, "v": [10, 20, 40, 80, 160]})
    ds = ray.data.from_pandas(df)
    out = stats.exact_group_quantiles_cont(ds, "v", "g", [0.25, 0.5, 0.75])
    assert out.loc[0, "p25"] == 20.0  # h=1.0 → exact order stat
    assert out.loc[0, "p50"] == 40.0
    assert out.loc[0, "p75"] == 80.0
    out = stats.exact_group_quantiles_cont(ds, "v", "g", [0.625])
    # h = 4*0.625 = 2.5 → 40 + 0.5*(80-40) = 60
    assert out.loc[0, "p62.5"] == 60.0


def test_value_outliers_mad_vs_brute_force():
    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_id", "value"]).to_pandas()
    cents = np.rint(t["value"].to_numpy() * 100).astype(np.int64)
    med = int(np.sort(cents)[int(np.ceil(0.5 * len(cents))) - 1])
    dev = np.abs(cents - med)
    mad = int(np.sort(dev)[int(np.ceil(0.5 * len(dev))) - 1])
    want = set(t["event_id"].to_numpy()[dev > 5 * mad])
    got = stats.value_outliers_mad(SF)
    assert set(got["event_id"]) == want
    assert (got["dev"] > 5 * mad).all()


def test_doc_logprob_bigram_vs_brute_force():
    import math
    import re
    from collections import Counter

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    docs = {
        r["doc_id"]: [w for w in re.split(r"[^a-z0-9]+", r["text"].lower()) if w]
        for _, r in t.iterrows()
    }
    bg = Counter(
        f"{w1} {w2}"
        for ws in docs.values()
        for w1, w2 in zip(ws, ws[1:])
    )
    left = Counter()
    for g, n in bg.items():
        left[g.split(" ")[0]] += n
    lp = {g: stats._round_e9(math.log(n / left[g.split(" ")[0]]))
          for g, n in bg.items()}
    got = textops.doc_logprob_bigram(SF).to_pandas().set_index("doc_id")
    n_checked = 0
    for doc_id, ws in docs.items():
        grams = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        if not grams:
            assert doc_id not in got.index
            continue
        row = got.loc[doc_id]
        assert row["n_bigrams"] == len(grams)
        assert row["sum_logp_e9"] == sum(lp[g] for g in grams)
        n_checked += 1
    assert n_checked == len(got)


def test_orders_running_total_monotone_and_exact():
    t = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderdate", "o_totalprice"]).to_pandas()
    ym = (t["o_orderdate"].dt.year * 100 + t["o_orderdate"].dt.month).astype(int)
    cents = np.rint(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
    from research_knowledge_graph_ray.pipelines import relational

    got = relational.orders_running_total(SF)
    assert got["ym"].is_monotonic_increasing
    assert (got["cum_cents"].diff().fillna(got["cum_cents"]) ==
            got["sum_cents"]).all()
    grand = int(cents.sum())
    assert int(got["cum_cents"].iloc[-1]) == grand
    one = got[got["ym"] == int(ym.iloc[0])]
    assert int(one["sum_cents"].iloc[0]) == int(cents[ym == ym.iloc[0]].sum())


def test_term_postings_vs_brute_force():
    import re

    from research_knowledge_graph_ray.pipelines import kgflat

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    pat = re.compile(kgflat.TERM_PATTERN)
    post: dict[str, set] = {}
    for _, r in t.iterrows():
        for term in set(pat.findall(r["text"].lower())):
            post.setdefault(term, set()).add(r["doc_id"])
    got = kgflat.term_postings(SF).to_pandas().set_index("term")
    assert set(got.index) == set(post)
    for term, docs in post.items():
        row = got.loc[term]
        assert row["n_docs"] == len(docs)
        assert row["postings"] == ",".join(map(str, sorted(docs)))


def test_table_checksum_detects_change(tmp_path):
    import pyarrow.parquet as pqw

    base = stats.table_checksum(SF)
    t = pq.read_table(f"{SF}/orders.parquet")
    d = tmp_path / "x"
    d.mkdir()
    df = t.to_pandas()
    df.loc[0, "o_totalprice"] += 0.01  # one cent in one row
    pqw.write_table(pq.read_table(f"{SF}/orders.parquet"), str(d / "orders.parquet"))
    same = stats.table_checksum(str(d))
    assert int(same["checksum"][0]) == int(base["checksum"][0])
    import pyarrow as pa

    pqw.write_table(pa.Table.from_pandas(df, preserve_index=False),
                    str(d / "orders.parquet"))
    changed = stats.table_checksum(str(d))
    assert int(changed["checksum"][0]) != int(base["checksum"][0])
    assert int(changed["n_rows"][0]) == int(base["n_rows"][0])


def test_knn_join_ivf_pruned_recall_and_invariants():
    from research_knowledge_graph_ray.stages import similarity

    exact = similarity.knn_join(SF, k=3).to_pandas()
    pruned = similarity.knn_join_ivf(SF, k=3, n_centroids=16, nprobe=4).to_pandas()
    # invariants: no self pairs, ranks 1..k, ranks strictly ordered by key
    assert (pruned["vec_id"] != pruned["nn_id"]).all()
    assert set(pruned["nn_rank"]) <= {1, 2, 3}
    # recall vs the exact join rises monotonically with nprobe and reaches
    # 1.0 at full probe (this synthetic corpus is unclustered, so absolute
    # recall at small nprobe is data-limited — the MONOTONE property is the
    # operator's contract)
    e_pairs = set(zip(exact["vec_id"], exact["nn_id"]))

    def recall(nprobe):
        p = similarity.knn_join_ivf(SF, k=3, n_centroids=16,
                                    nprobe=nprobe).to_pandas()
        pp = set(zip(p["vec_id"], p["nn_id"]))
        return len(e_pairs & pp) / len(e_pairs)

    r4 = len(e_pairs & set(zip(pruned["vec_id"], pruned["nn_id"]))) / len(e_pairs)
    r8, r16 = recall(8), recall(16)
    assert r4 >= 0.25, r4
    assert r4 <= r8 <= r16 == 1.0, (r4, r8, r16)
    # per-query ordering: sim_e6 non-increasing with rank
    for _, g in pruned.groupby("vec_id"):
        s = g.sort_values("nn_rank")["sim_e6"].to_numpy()
        assert (np.diff(s) <= 0).all()


def test_contrastive_pairs_semantics():
    import hashlib

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    got = textops.contrastive_pairs(SF).to_pandas()
    pos = got[got["label"] == 1].set_index("doc_id")
    neg = got[got["label"] == 0].set_index("doc_id")
    # every doc yields exactly one positive: (md5(left half), md5(right half))
    assert len(pos) == len(t)
    by_id = t.set_index("doc_id")["text"]
    for doc_id in t["doc_id"].head(20):
        s = by_id[doc_id]
        h = len(s) // 2
        assert pos.loc[doc_id, "fp_a"] == hashlib.md5(s[:h].encode()).hexdigest()
        assert pos.loc[doc_id, "fp_b"] == hashlib.md5(s[h:].encode()).hexdigest()
    # negatives: one per complete even/odd partner pair, anchored at the even id
    ids = set(t["doc_id"])
    want_neg = {d for d in ids if d % 2 == 0 and d + 1 in ids}
    assert set(neg.index) == want_neg
    for doc_id in list(want_neg)[:10]:
        sa, sb = by_id[doc_id], by_id[doc_id + 1]
        assert neg.loc[doc_id, "fp_a"] == hashlib.md5(
            sa[: len(sa) // 2].encode()).hexdigest()
        assert neg.loc[doc_id, "fp_b"] == hashlib.md5(
            sb[: len(sb) // 2].encode()).hexdigest()


def test_user_retention_vs_brute_force():
    from research_knowledge_graph_ray.pipelines import windows

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["user_id", "ts"]).to_pandas()
    day = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) \
        // 86_400_000_000
    df = pd.DataFrame({"u": t["user_id"], "d": day}).drop_duplicates()
    cohort = df.groupby("u")["d"].min()
    df["cohort_d"] = df["u"].map(cohort)
    want = df.groupby(["cohort_d", "d"]).size()
    got = windows.user_retention(SF).set_index(["cohort_d", "d"])["n_users"]
    assert got.to_dict() == want.to_dict()
    # diagonal completeness: every cohort is active on its own first day
    for c in cohort.unique():
        assert (c, c) in got.index


def test_signup_purchase_funnel_vs_brute_force():
    from research_knowledge_graph_ray.pipelines import windows

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["user_id", "event_type", "ts"]).to_pandas()
    t["us"] = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    got = windows.signup_purchase_funnel(SF).to_pandas().set_index("user_id")
    signups = t[t["event_type"] == "signup"].groupby("user_id")["us"].min()
    assert set(got.index) == set(signups.index)
    for uid, ta in signups.items():
        row = got.loc[uid]
        assert row["t_signup_us"] == ta
        after = t[(t["user_id"] == uid) & (t["event_type"] == "purchase")
                  & (t["us"] >= ta)]["us"]
        if len(after):
            assert row["converted"] == 1 and row["t_purchase_us"] == after.min()
        else:
            assert row["converted"] == 0 and row["t_purchase_us"] == -1
    # a purchase strictly BEFORE signup must not convert: verify at least the
    # rule is enforceable (all converted rows satisfy t_purchase >= t_signup)
    conv = got[got["converted"] == 1]
    assert (conv["t_purchase_us"] >= conv["t_signup_us"]).all()


def test_source_quality_report_vs_brute_force():
    import re

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["source", "lang", "text"]).to_pandas()
    stop = re.compile(r"\b(the|a)\b")
    t["tok"] = t["text"].str.len() - t["text"].str.replace(" ", "").str.len() + 1
    t["stp"] = t["text"].str.lower().map(lambda s: len(stop.findall(s)))
    got = textops.source_quality_report(SF).to_pandas().set_index("source")
    for src, g in t.groupby("source"):
        row = got.loc[src]
        assert row["n_docs"] == len(g)
        assert row["n_langs"] == g["lang"].nunique()
        assert row["sum_tokens"] == int(g["tok"].sum())
        assert row["sum_stopwords"] == int(g["stp"].sum())
        assert row["stop_bp"] == int(g["stp"].sum()) * 10000 // int(g["tok"].sum())
    assert len(got) == t["source"].nunique()


def test_key_skew_report_vs_brute_force():
    got = stats.key_skew_report(SF).set_index("col")
    for table, col, label in stats._SKEW_SPECS:
        v = pq.read_table(f"{SF}/{table}.parquet", columns=[col]).to_pandas()[col]
        cnt = v.value_counts()
        row = got.loc[label]
        assert row["n_rows"] == len(v)
        assert row["n_distinct"] == len(cnt)
        assert row["top_cnt"] == int(cnt.max())
        assert row["skew_e9"] == int(cnt.max()) * len(cnt) * 10**9 // len(v)


def test_order_price_rank_vs_brute_force():
    t = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderkey", "o_totalprice"]).to_pandas()
    cents = np.rint(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
    # brute min-rank: 1 + count of strictly smaller values
    sv = np.sort(cents)
    want = np.searchsorted(sv, cents, side="left") + 1
    got = (stats.order_price_rank(SF).to_pandas()
           .set_index("o_orderkey")["price_rank"])
    for k, w in zip(t["o_orderkey"], want):
        assert got[k] == w
    # rank set covers 1..n with tie-compression (min rank per group)
    assert got.min() == 1 and got.max() <= len(t)
