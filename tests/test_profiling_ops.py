"""Unit semantics for the sufficient-statistics profiling family
(stages/stats.py round-2 additions) and the weighted sampler.

DuckDB value-hash parity for each query is covered by
tests/test_queries_vs_duckdb.py; these tests pin the semantics the SQL
restatement alone would not catch (exactness of the integer sums, rounding
edge cases, tiebreaks, inclusion invariants).
"""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from research_knowledge_graph_ray.stages import sampling, stats

SF = "/root/testdata/sf0.001"


def test_round_e9_large_magnitude_half_way_regression():
    # |v*1e9| > 2^52: adding 0.5 before floor double-rounds (ties-to-even
    # pushes an exact integer up); the fixed version must not.
    v = 5341048.428488557  # v * 1e9 is exactly 5341048428488557.0
    assert stats._round_e9(v) == 5341048428488557
    assert stats._round_e9(-v) == -5341048428488557
    assert stats._round_e9(1.2345e-9) == 1
    assert stats._round_e9(0.5e-9) == 1  # half away from zero
    assert stats._round_e9(-0.5e-9) == -1


def test_linear_sufficient_stats_exact_vs_numpy():
    t = pq.read_table(f"{SF}/lineitem.parquet",
                      columns=["l_quantity", "l_extendedprice"])
    x = np.rint(t["l_quantity"].to_numpy()).astype(np.int64).astype(object)
    y = np.rint(t["l_extendedprice"].to_numpy() * 100).astype(np.int64).astype(object)
    ds = ray.data.read_parquet(f"{SF}/lineitem.parquet",
                               columns=["l_quantity", "l_extendedprice"])
    s = stats.linear_sufficient_stats(ds, "l_quantity", "l_extendedprice")
    assert s["n"] == len(x)
    assert s["sx"] == int(sum(x)) and s["sy"] == int(sum(y))
    assert s["sxx"] == int(sum(x * x)) and s["syy"] == int(sum(y * y))
    assert s["sxy"] == int(sum(x * y))


def test_regression_matches_numpy_fit():
    t = pq.read_table(f"{SF}/lineitem.parquet",
                      columns=["l_quantity", "l_extendedprice"])
    x = t["l_quantity"].to_numpy()
    y = t["l_extendedprice"].to_numpy() * 100
    out = stats.price_qty_regression(SF).iloc[0]
    corr = np.corrcoef(x, y)[0, 1]
    slope, intercept = np.polyfit(x, y, 1)
    assert out["corr_e9"] == pytest.approx(corr * 1e9, abs=50)
    assert out["slope_e9"] == pytest.approx(slope * 1e9, rel=1e-9)
    assert out["intercept_e9"] == pytest.approx(intercept * 1e9, rel=1e-9)


def test_value_outliers_matches_bruteforce():
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "value"])
    cents = np.rint(t["value"].to_numpy() * 100).astype(np.int64)
    mean, std = cents.mean(), cents.std()
    expect = set(np.asarray(t["event_id"])[np.abs(cents - mean) > 3 * std].tolist())
    got = set(stats.value_outliers(SF)["event_id"].tolist())
    assert got == expect and len(got) > 0


def test_user_top_event_tiebreak(tmp_path):
    # u1: tie a/b at 2 → lexicographically smallest wins; u2: clear winner.
    events = pa.table({
        "event_id": pa.array(range(7), type=pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 2, 2, 2], type=pa.int64()),
        "event_type": ["b", "a", "b", "a", "x", "x", "a"],
    })
    pq.write_table(events, str(tmp_path / "events.parquet"))
    got = (stats.user_top_event(str(tmp_path)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert got["top_event"].tolist() == ["a", "x"]
    assert got["cnt"].tolist() == [2, 2]


def test_order_price_histogram_bruteforce():
    t = pq.read_table(f"{SF}/orders.parquet", columns=["o_totalprice"])
    p = t["o_totalprice"].to_numpy()
    b = np.floor(p / 25000.0).astype(np.int64)
    got = stats.order_price_histogram(SF).to_pandas().set_index("bucket")
    assert int(got["n_orders"].sum()) == len(p)
    for bucket, grp in pd.DataFrame({"b": b, "c": np.rint(p * 100).astype(np.int64)}).groupby("b"):
        assert got.loc[bucket, "n_orders"] == len(grp)
        assert got.loc[bucket, "sum_cents"] == int(grp["c"].sum())


def test_sample_weighted_invariants():
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"])
    max_w = pa.compute.max(docs["n_chars"]).as_py()
    got = sampling.sample_weighted(SF).to_pandas()
    full = docs.to_pandas()
    # max-weight docs are always kept (hkey < 2^32 = keep threshold)
    heaviest = set(full[full["n_chars"] == max_w]["doc_id"])
    assert heaviest <= set(got["doc_id"])
    # overall keep rate ≈ E[w]/max_w (hash-uniformity; generous band)
    expect = full["n_chars"].mean() / max_w
    assert abs(len(got) / len(full) - expect) < 0.1
    # selection is by the documented integer rule — recompute and compare
    keys = sampling._hkeys(full["doc_id"].to_numpy())
    keep = keys * max_w < full["n_chars"].to_numpy().astype(np.int64) * sampling._HSPACE
    assert set(got["doc_id"]) == set(full[keep]["doc_id"])


def test_doc_terms_agg_sorted_distinct():
    from research_knowledge_graph_ray.pipelines import kgflat

    got = kgflat.doc_terms_agg(SF).to_pandas()
    assert len(got) > 0
    for terms in got["terms"].head(50):
        parts = terms.split(",")
        assert parts == sorted(set(parts))
    # agrees with the mention table's per-doc distinct term sets
    mentions = kgflat.doc_mentions(SF).to_pandas()
    want = mentions.groupby("doc_id")["term"].apply(
        lambda s: ",".join(sorted(set(s)))
    )
    merged = got.set_index("doc_id")["terms"]
    assert merged.sort_index().equals(want.sort_index())


def test_embedding_pca_matches_numpy():
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    x = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    cov = np.cov(x, rowvar=False, bias=True)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    got = stats.embedding_pca(SF, k=4)
    assert np.allclose(got["eigenvalue"].to_numpy(), evals[:4], rtol=1e-8)
    assert np.allclose(
        got["var_explained"].to_numpy(), evals[:4] / evals.sum(), rtol=1e-8
    )
    assert (np.diff(got["eigenvalue"].to_numpy()) <= 0).all()


def test_embedding_moments_exact_and_consistent_with_pca():
    """The integer Gram matrix is exactly the numpy replay, and the float
    covariance it implies agrees with embedding_pca's distributed covariance
    to quantization error (ties the oracle-gated query to the rows-only one)."""
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    x = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    q = np.floor(x * stats._MOMENT_SCALE).astype(np.int64)
    want = q.T @ q
    got = stats.embedding_moments(SF)
    d = x.shape[1]
    iu = np.triu_indices(d)
    assert (got["i"].to_numpy() == iu[0] + 1).all()
    assert (got["j"].to_numpy() == iu[1] + 1).all()
    assert (got["m"].to_numpy() == want[iu]).all()

    # reconstruct the full matrix and compare the implied top eigenvalue to
    # the float PCA's (quantization perturbs coordinates by < 1e-6)
    g = np.zeros((d, d))
    g[iu] = got["m"].to_numpy()
    g = g + g.T - np.diag(np.diag(g))
    n = x.shape[0]
    mean_q = q.mean(axis=0)
    cov_q = (g / n - np.outer(mean_q, mean_q)) / stats._MOMENT_SCALE**2
    ev_q = np.linalg.eigvalsh(cov_q)[-1]
    ev_f = stats.embedding_pca(SF, k=1)["eigenvalue"].iloc[0]
    assert abs(ev_q - ev_f) < 1e-4


def test_customer_year_setops_bruteforce():
    from research_knowledge_graph_ray.pipelines import relational

    t = pq.read_table(f"{SF}/orders.parquet", columns=["o_custkey", "o_orderdate"])
    df = t.to_pandas()
    yr = df["o_orderdate"].dt.year
    s95 = set(df["o_custkey"][yr == 1995])
    s96 = set(df["o_custkey"][yr == 1996])
    got = relational.customer_year_setops(SF).to_pandas()
    by_op = {op: set(g["o_custkey"]) for op, g in got.groupby("op")}
    assert by_op.get("both", set()) == (s95 & s96)
    assert by_op.get("y1995_only", set()) == (s95 - s96)
    assert by_op.get("y1996_only", set()) == (s96 - s95)


def test_table_profile_bruteforce():
    df = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    got = stats.table_profile(SF).set_index("col")
    for c in df.columns:
        assert got.loc[c, "n_rows"] == len(df)
        assert got.loc[c, "n_null"] == int(df[c].isna().sum())
        assert got.loc[c, "n_distinct"] == df[c].dropna().astype(str).nunique()


def test_lance_io_is_gated():
    from research_knowledge_graph_ray.sources.files import (
        read_lance_corpus, write_lance_table)

    with pytest.raises(NotImplementedError):
        read_lance_corpus("/tmp/nonexistent.lance")
    with pytest.raises(NotImplementedError):
        write_lance_table(None, "/tmp/nonexistent.lance")


def test_levenshtein_matches_duckdb():
    import duckdb

    from research_knowledge_graph_ray.stages.dedup import _levenshtein

    rng = np.random.default_rng(7)
    alpha = list("abcde ")
    cases = ["".join(rng.choice(alpha, rng.integers(0, 12))) for _ in range(60)]
    cases += ["", "a", "same", "same"]
    con = duckdb.connect()
    for i in range(0, len(cases) - 1, 2):
        a, b = cases[i], cases[i + 1]
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert _levenshtein(a, b) == want, (a, b)


def test_fuzzy_name_pairs_symmetric_and_bounded():
    from research_knowledge_graph_ray.stages.dedup import fuzzy_name_pairs

    got = fuzzy_name_pairs(SF).to_pandas()
    assert len(got) > 0
    assert (got["dist"] <= 3).all()
    assert (got["name_a"] < got["name_b"]).all()
    assert not got.duplicated(["name_a", "name_b"]).any()


def test_item_jaccard_bruteforce():
    from collections import defaultdict
    from itertools import combinations

    from research_knowledge_graph_ray.stages.graphalgs import item_jaccard

    t = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    df = t.to_pandas().drop_duplicates()
    orders = defaultdict(set)
    nbr = defaultdict(set)
    for o, p in zip(df["l_orderkey"], df["l_partkey"]):
        orders[o].add(p)
        nbr[p].add(o)
    co = defaultdict(int)
    for o, parts in orders.items():
        for a, b in combinations(sorted(parts), 2):
            co[(a, b)] += 1
    expect = {
        k: v for k, v in co.items() if v >= 2
    }
    got = item_jaccard(SF).to_pandas()
    assert {(a, b): c for a, b, c in zip(got["pa"], got["pb"], got["co"])} == expect
    for _, r in got.head(100).iterrows():
        union = len(nbr[r["pa"]] | nbr[r["pb"]])
        assert r["jaccard_e9"] == pytest.approx(r["co"] / union * 1e9, abs=1)


def test_doc_logprob_bruteforce():
    from collections import Counter

    from research_knowledge_graph_ray.stages import textops

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    toks = {d: [w for w in txt.split(" ") if w]
            for d, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())}
    cnt = Counter(w for ws in toks.values() for w in ws)
    total = float(sum(cnt.values()))
    lp = {w: stats._round_e9(math.log(n / total)) for w, n in cnt.items()}
    got = textops.doc_logprob(SF).to_pandas().set_index("doc_id")
    assert len(got) == len(toks)
    for d, ws in list(toks.items())[:100]:
        assert got.loc[d, "n_tokens"] == len(ws)
        assert got.loc[d, "sum_logp_e9"] == sum(lp[w] for w in ws)


def test_props_regex_extraction_equals_json():
    import json

    from research_knowledge_graph_ray.pipelines import relational

    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "props"])
    df = t.to_pandas()
    df["k"] = [json.loads(p)["k"] for p in df["props"]]
    want = df.groupby("event_type").agg(
        n=("k", "size"), sum_k=("k", "sum"), max_k=("k", "max"))
    got = relational.props_k_stats(SF).to_pandas().set_index("event_type")
    for et in want.index:
        for c in ("n", "sum_k", "max_k"):
            assert got.loc[et, c] == want.loc[et, c]


def test_nation_year_revenue_bruteforce():
    from research_knowledge_graph_ray.pipelines import windows

    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    od = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    cu = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    na = pq.read_table(f"{SF}/nation.parquet").to_pandas()
    li["rev"] = (np.rint(li["l_extendedprice"] * 100).astype(np.int64)
                 * (10000 - np.rint(li["l_discount"] * 10000).astype(np.int64)))
    m = (li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
         .merge(cu, left_on="o_custkey", right_on="c_custkey")
         .merge(na, left_on="c_nationkey", right_on="n_nationkey"))
    m["yr"] = m["o_orderdate"].dt.year
    want = m.groupby(["n_name", "yr"])["rev"].sum()
    got = windows.nation_year_revenue(SF).to_pandas().set_index(["n_name", "yr"])
    assert len(got) == len(want)
    for k, v in want.items():
        assert got.loc[k, "revenue"] == v


def test_events_hourly_dense_zero_fill():
    from research_knowledge_graph_ray.pipelines import windows

    ev = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "ts"]).to_pandas()
    h = ev["ts"].astype("int64") // 10**6 // 3600
    types = sorted(ev["event_type"].unique())
    got = windows.events_hourly_dense(SF).to_pandas()
    span = int(h.max() - h.min() + 1)
    assert len(got) == span * len(types)
    assert (got["n_events"] == 0).any()  # gaps exist and are zero-filled
    want = (pd.DataFrame({"event_type": ev["event_type"], "h": h})
            .groupby(["event_type", "h"]).size())
    gi = got.set_index(["event_type", "h"])["n_events"]
    for k, v in want.items():
        assert gi.loc[k] == v
    assert int(gi.sum()) == len(ev)


def test_order_quartiles_value_semantics():
    got = stats.order_quartiles(SF)
    t = pq.read_table(f"{SF}/orders.parquet", columns=["o_totalprice"]).to_pandas()
    v = np.sort(t["o_totalprice"].to_numpy())
    n = len(v)
    import math as _m
    p25, p50, p75 = (v[max(1, _m.ceil(q * n)) - 1] for q in (0.25, 0.5, 0.75))
    q = 1 + (t["o_totalprice"] > p25).astype(int) + (t["o_totalprice"] > p50) \
        + (t["o_totalprice"] > p75)
    want = pd.DataFrame({"q": q, "c": np.rint(t["o_totalprice"] * 100).astype(np.int64)}) \
        .groupby("q").agg(n=("c", "size"), s=("c", "sum"))
    assert got["quartile"].tolist() == want.index.tolist()
    assert got["n_orders"].tolist() == want["n"].tolist()
    assert got["sum_cents"].tolist() == want["s"].tolist()
