"""End-to-end training-corpus curation: the composed flagship of the
LLM-data operator families.

``curate_corpus`` chains the gates a production data-prep run applies before
pretraining — quality rules → language filter → exact dedup → MinHash
near-dup dedup → token counting → greedy sequence packing → partitioned
parquet — re-using the SAME primitives the individual registry operators are
oracle-checked against (textops quality/lang kernels, dedup fp groupby and
MinHash clusters, the greedy packer), so the composition inherits their
verified semantics.

Dataflow (100 TB shape):
- ONE streamed verdict pass over documents produces every row-local signal
  (quality flags, predicted language, content fingerprint, token count) —
  nothing re-reads the corpus per gate.
- ONE key-only exchange on the content fingerprint decides exact-dup
  survivors among gate survivors (doc_id + fp traffic only, no text).
- MinHash near-dup clustering runs its own banded exchanges
  (:func:`~..stages.dedup.minhash_dedup_clusters` — text never shipped,
  sketches only; fully distributed CC past the driver limit).
- ONE exchange on doc_id co-locates text with all verdicts; each reducer
  filters, greedy-packs its bucket (doc_id order — the documented
  partitioning assumption), writes its own parquet part (resumable layout:
  one file per bucket), and emits only |reasons|-bounded funnel counts.

The SQL-expressible funnel prefix (quality → lang → exact) is the
``curation_funnel`` registry query with an exact DuckDB oracle; the
near-dup and packing stages are pinned by their own operator tests.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..stages.textops import (MAX_DUP_BP, MIN_WORDS, PACK_BUDGET, _greedy_pack,
                              _word_stats, pred_langs)

KEEP_LANGS = ("en",)


def _verdicts(batch: pa.Table) -> pd.DataFrame:
    """Row-local curation signals in one pass: quality keep, predicted
    language, md5 content fingerprint, whitespace token count."""
    n_words, _nd, dup_bp = _word_stats(batch)
    texts = batch["text"].to_pylist()
    n_tok = pc.add(pc.count_substring(batch["text"], " "),
                   1).cast(pa.int64()).to_numpy()
    return pd.DataFrame({
        "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False)
        .astype(np.int64),
        "q_ok": ((n_words >= MIN_WORDS) & (dup_bp <= MAX_DUP_BP)),
        "pred_lang": pred_langs(texts),
        "fp": [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts],
        "n_tokens": n_tok,
    })


def _gated_verdicts(sf_dir: str, keep_langs: tuple) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_verdicts, batch_format="pyarrow", zero_copy_batch=True)


def _exact_survivors(v: "ray.data.Dataset",
                     keep_langs: tuple) -> "ray.data.Dataset":
    """(doc_id, exact_ok) for gate survivors — key-only fp exchange, survivor
    = min doc_id per fingerprint AMONG survivors (sequential-gate semantics:
    a quality-dropped twin does not shield its duplicate)."""
    from ..stages.shuffle import bucketed_group_apply

    langs = set(keep_langs)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["q_ok"] & df["pred_lang"].isin(langs)]
        return df[["fp", "doc_id"]]

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "exact_ok": pd.Series(dtype=bool)})
        m = df.groupby("fp")["doc_id"].transform("min")
        return pd.DataFrame({"doc_id": df["doc_id"].astype(np.int64),
                             "exact_ok": (df["doc_id"] == m).to_numpy()})

    return bucketed_group_apply(v, ["fp"], part, fin, n_buckets=16)


def curation_funnel(sf_dir: str,
                    keep_langs: tuple = KEEP_LANGS) -> pd.DataFrame:
    """(stage_id, stage, n_in, n_drop) — the sequential curation gates
    quality → language → exact-dedup with per-gate in/drop counts; each gate
    sees only the previous gate's survivors. Exactly restated in DuckDB
    (``CURATION_FUNNEL_SQL``); the near-dup gate is the non-SQL tail covered
    by the dedup operator tests."""
    v = _gated_verdicts(sf_dir, keep_langs)
    langs = set(keep_langs)

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        q = df["q_ok"].to_numpy()
        lang_ok = df["pred_lang"].isin(langs).to_numpy()
        return pd.DataFrame({
            "n_raw": [len(df)],
            "q_drop": [int((~q).sum())],
            "lang_in": [int(q.sum())],
            "lang_drop": [int((q & ~lang_ok).sum())],
        })

    agg = (v.map_batches(counts, batch_format="pandas").to_pandas().sum())
    e = _exact_survivors(v, keep_langs).to_pandas()
    n_exact_in = int(agg["lang_in"] - agg["lang_drop"])
    n_exact_drop = int((~e["exact_ok"]).sum()) if len(e) else 0
    out = pd.DataFrame({
        "stage_id": np.array([1, 2, 3], dtype=np.int64),
        "stage": ["quality", "lang", "exact"],
        "n_in": np.array([agg["n_raw"], agg["lang_in"], n_exact_in],
                         dtype=np.int64),
        "n_drop": np.array([agg["q_drop"], agg["lang_drop"], n_exact_drop],
                           dtype=np.int64),
    })
    return out


CURATION_FUNNEL_SQL = f"""
WITH w AS (SELECT doc_id, text,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws
           FROM documents),
s AS (SELECT doc_id, text, len(ws) AS n,
        (len(ws) - len(list_distinct(ws))) * 10000
            // GREATEST(len(ws), 1) AS bp
      FROM w),
q AS (SELECT doc_id, text,
             (n >= {MIN_WORDS} AND bp <= {MAX_DUP_BP}) AS q_ok FROM s),
t AS (SELECT doc_id, q_ok, text,
             list_distinct(regexp_extract_all(lower(text), '[a-z]+')) AS toks
      FROM q),
sc AS (SELECT doc_id, q_ok, text, len(toks) AS n,
         len(list_intersect(toks, ['the','and','of','to','a','in','is'])) AS en,
         len(list_intersect(toks, ['le','la','et','de','un','une','est'])) AS fr,
         len(list_intersect(toks, ['der','die','das','und','ist','ein'])) AS de,
         len(list_intersect(toks, ['el','la','y','de','un','una','es'])) AS es
       FROM t),
l AS (SELECT doc_id, q_ok, text,
        CASE WHEN n = 0 THEN 'zh'
             WHEN en >= fr AND en >= de AND en >= es THEN 'en'
             WHEN fr >= de AND fr >= es THEN 'fr'
             WHEN de >= es THEN 'de'
             ELSE 'es' END AS pred
      FROM sc),
g AS (SELECT doc_id, md5(text) AS fp FROM l WHERE q_ok AND pred = 'en'),
e AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY fp) AS m FROM g)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS stage_id, 'quality' AS stage,
         CAST(COUNT(*) AS BIGINT) AS n_in,
         CAST(SUM(CASE WHEN q_ok THEN 0 ELSE 1 END) AS BIGINT) AS n_drop
  FROM l
  UNION ALL
  SELECT 2, 'lang', CAST(SUM(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT),
         CAST(SUM(CASE WHEN q_ok AND pred <> 'en' THEN 1 ELSE 0 END)
              AS BIGINT)
  FROM l
  UNION ALL
  -- COALESCE: when every doc was dropped upstream, e is empty and SUM
  -- returns NULL where the engine's integer fold says 0
  SELECT 3, 'exact', CAST(COUNT(*) AS BIGINT),
         CAST(COALESCE(SUM(CASE WHEN doc_id > m THEN 1 ELSE 0 END), 0)
              AS BIGINT)
  FROM e
) ORDER BY stage_id
"""


def _neardup_survivor_verdicts(clusters: "ray.data.Dataset",
                               exact: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, keep) for near-dup cluster members with the canonical
    RE-ELECTED among gate survivors.

    Clusters are sketched over the full corpus (cheap — sketch exchanges
    only, no text), but a cluster whose sketch-canonical (min doc_id) was
    quality/lang/exact-dropped must still keep exactly one SURVIVING member —
    sequential-gate semantics, the same rule exact dedup applies. Two
    id-sized exchanges: (1) key doc_id — attach the gate-survivor flag to
    cluster membership rows; (2) key cluster_id — elect min surviving doc_id
    per cluster. Non-surviving members get keep=False (they are already gone
    by earlier gates, the flag is never read)."""
    from ..stages.shuffle import bucketed_group_apply

    c = clusters.map_batches(
        lambda df: pd.DataFrame(
            {"doc_id": df["doc_id"].astype(np.int64),
             "cluster_id": df["cluster_id"].astype(np.int64),
             "is_member": True}),
        batch_format="pandas")
    s = exact.map_batches(
        lambda df: pd.DataFrame(
            {"doc_id": df["doc_id"][df["exact_ok"]].astype(np.int64),
             "cluster_id": np.int64(-1),
             "is_member": False}),
        batch_format="pandas")

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"cluster_id": pd.Series(dtype=np.int64),
                              "doc_id": pd.Series(dtype=np.int64),
                              "surv": pd.Series(dtype=bool)})
        if df.empty or "is_member" not in df.columns:
            return empty
        sm = set(df.loc[~df["is_member"].fillna(True), "doc_id"])
        m = df[df["is_member"].fillna(False)]
        return pd.DataFrame({"cluster_id": m["cluster_id"].astype(np.int64),
                             "doc_id": m["doc_id"].astype(np.int64),
                             "surv": m["doc_id"].isin(sm).to_numpy()})

    members = bucketed_group_apply(c.union(s), ["doc_id"],
                                   lambda df: df, attach, n_buckets=16)

    def elect(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                              "keep": pd.Series(dtype=bool)})
        if df.empty:
            return empty
        win = (df[df["surv"]].groupby("cluster_id", as_index=False)["doc_id"]
               .min().rename(columns={"doc_id": "win"}))
        out = df.merge(win, on="cluster_id", how="left")
        keep = out["surv"] & (out["doc_id"] == out["win"])
        return pd.DataFrame({"doc_id": out["doc_id"].astype(np.int64),
                             "keep": keep.to_numpy(bool)})

    return bucketed_group_apply(members, ["cluster_id"],
                                lambda df: df, elect, n_buckets=16)


def curate_corpus(sf_dir: str, out_dir: str,
                  keep_langs: tuple = KEEP_LANGS,
                  budget: int = PACK_BUDGET,
                  n_parts: int = 8,
                  order_seed: int | None = None) -> dict:
    """Run the full curation pipeline and write the curated, sequence-packed
    corpus as ``n_parts`` parquet files under ``out_dir``. Returns the funnel
    report dict (raw → quality → lang → exact → near-dup → kept, plus packed
    sequence count and the part file list)."""
    import pyarrow.parquet as pq

    from ..stages.dedup import minhash_dedup_clusters
    from ..stages.shuffle import bucketed_group_apply

    os.makedirs(out_dir, exist_ok=True)
    langs = set(keep_langs)

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "lang", "source"])
    # the verdict table drops the text (~1% of corpus bytes: ids + flags +
    # fp + token count) — materialize it ONCE so its three consumers (gate
    # counts, exact-dedup exchange, final bucket exchange) don't each re-run
    # the corpus scan; at extreme scale the object store spills it to disk
    v = _gated_verdicts(sf_dir, keep_langs).materialize()
    # exact verdicts now feed two consumers (the final bucket exchange and
    # the near-dup canonical election) — pin the id-sized table once
    exact = _exact_survivors(v, keep_langs).materialize()
    # near-dup clusters are sketched over the full corpus (sketch exchanges
    # only), then each cluster's kept representative is RE-ELECTED among the
    # gate survivors so a dropped sketch-canonical never suppresses a cluster
    # that still has a surviving member (sequential-gate semantics)
    clusters = _neardup_survivor_verdicts(minhash_dedup_clusters(docs), exact)

    def tag(name):
        def add(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__t"] = name
            return df
        return add

    u = (docs.map_batches(tag("d"), batch_format="pandas")
         .union(v.map_batches(tag("v"), batch_format="pandas"))
         .union(exact.map_batches(tag("e"), batch_format="pandas"))
         .union(clusters.map_batches(tag("m"), batch_format="pandas")))

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["bucket", "n_exact_drop", "n_neardup_drop", "n_kept",
                "n_seqs", "file"]
        empty = pd.DataFrame({
            "bucket": pd.Series(dtype=np.int64),
            "n_exact_drop": pd.Series(dtype=np.int64),
            "n_neardup_drop": pd.Series(dtype=np.int64),
            "n_kept": pd.Series(dtype=np.int64),
            "n_seqs": pd.Series(dtype=np.int64),
            "file": pd.Series(dtype="string")})
        if df.empty or "__t" not in df.columns:
            return empty
        # a reducer may hold several __bucket groups (hash-mod collision) —
        # finish each group separately so every part file is pure
        outs = [_finish_bucket(g) for _b, g in df.groupby("__bucket")]
        outs = [o for o in outs if o is not None]
        return pd.concat(outs, ignore_index=True) if outs else empty

    def _finish_bucket(df: pd.DataFrame):
        d = df[df["__t"] == "d"]
        if d.empty:
            return None
        vv = df[df["__t"] == "v"].set_index("doc_id") if (df["__t"] == "v").any() else None
        if vv is None:
            return None
        doc_id = d["doc_id"].astype(np.int64).to_numpy()
        q_ok = vv["q_ok"].reindex(doc_id).fillna(False).to_numpy(bool)
        pl = vv["pred_lang"].reindex(doc_id)
        lang_ok = pl.isin(langs).to_numpy()
        n_tok = vv["n_tokens"].reindex(doc_id).fillna(0).to_numpy(np.int64)
        ee = df[df["__t"] == "e"]
        exact_ok = np.ones(len(d), dtype=bool)
        if len(ee):
            em = ee.set_index("doc_id")["exact_ok"].reindex(doc_id)
            # docs absent from the exact stage were dropped earlier; their
            # exact verdict is vacuously true
            exact_ok = em.fillna(True).to_numpy(bool)
        mm = df[df["__t"] == "m"]
        near_ok = np.ones(len(d), dtype=bool)
        if len(mm):
            km = mm.set_index("doc_id")["keep"].reindex(doc_id)
            near_ok = km.fillna(True).to_numpy(bool)

        gate3 = q_ok & lang_ok
        gate4 = gate3 & exact_ok
        keep = gate4 & near_ok
        bucket = int(df["__bucket"].iloc[0]) if "__bucket" in df.columns else \
            int(doc_id[0] % n_parts)

        kept = (d.assign(n_tokens=n_tok, pred_lang=pl.to_numpy())[keep]
                .sort_values("doc_id"))
        n_seqs = 0
        fname = ""
        if len(kept):
            seq = _greedy_pack(kept["n_tokens"].to_numpy(np.int64), budget)
            kept = kept.assign(seq_id=bucket * 10_000_000 + seq)
            n_seqs = int(seq.max()) + 1
            fname = f"curated-{bucket:05d}.parquet"
            pq.write_table(
                pa.Table.from_pandas(
                    kept[["doc_id", "text", "lang", "pred_lang", "source",
                          "n_tokens", "seq_id"]], preserve_index=False),
                os.path.join(out_dir, fname))
        return pd.DataFrame({
            "bucket": np.array([bucket], dtype=np.int64),
            "n_exact_drop": np.array([int((gate3 & ~exact_ok).sum())],
                                     dtype=np.int64),
            "n_neardup_drop": np.array([int((gate4 & ~near_ok).sum())],
                                       dtype=np.int64),
            "n_kept": np.array([int(keep.sum())], dtype=np.int64),
            "n_seqs": np.array([n_seqs], dtype=np.int64),
            "file": pd.Series([fname], dtype="string")})

    def bucket_tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = df["doc_id"].astype(np.int64) % n_parts
        return df

    parts = bucketed_group_apply(
        u.map_batches(bucket_tag, batch_format="pandas"),
        ["__bucket"], lambda df: df, fin, n_buckets=n_parts,
    ).to_pandas()

    # gate-prefix counts come from the already-materialized verdicts —
    # no second corpus read (curation_funnel recomputes from scratch; here
    # the identical semantic is a tiny partial-count aggregate over v)
    def counts(df: pd.DataFrame) -> pd.DataFrame:
        q = df["q_ok"].to_numpy()
        lang_ok = df["pred_lang"].isin(langs).to_numpy()
        return pd.DataFrame({
            "n_raw": [len(df)],
            "q_drop": [int((~q).sum())],
            "lang_drop": [int((q & ~lang_ok).sum())],
        })

    agg = v.map_batches(counts, batch_format="pandas").to_pandas().sum()
    report = {
        "n_raw": int(agg["n_raw"]),
        "n_quality_drop": int(agg["q_drop"]),
        "n_lang_drop": int(agg["lang_drop"]),
        "n_exact_drop": int(parts["n_exact_drop"].sum()) if len(parts) else 0,
        "n_neardup_drop": int(parts["n_neardup_drop"].sum()) if len(parts) else 0,
        "n_kept": int(parts["n_kept"].sum()) if len(parts) else 0,
        "n_sequences": int(parts["n_seqs"].sum()) if len(parts) else 0,
        "budget": budget,
        "files": sorted(f for f in parts.get("file", pd.Series(dtype="string"))
                        .tolist() if f),
    }

    if order_seed is not None and report["files"]:
        # compose the training-order plan over the curated output: the
        # deterministic epoch shuffle runs on the written parts (doc_id
        # only) and lands as its own parquet next to them
        from ..stages.sampling import epoch_shuffle_ds

        kept_ds = ray.data.read_parquet(
            [os.path.join(out_dir, f) for f in report["files"]],
            columns=["doc_id"])
        order = epoch_shuffle_ds(kept_ds, seed=order_seed).to_pandas()
        opath = os.path.join(out_dir, f"order-{order_seed}.parquet")
        pq.write_table(pa.Table.from_pandas(
            order.sort_values("pos"), preserve_index=False), opath)
        report["order_file"] = os.path.basename(opath)
    return report
