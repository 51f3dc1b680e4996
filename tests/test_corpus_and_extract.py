"""Corpus generation determinism, span invariants, and extraction units."""

import pyarrow as pa

from research_knowledge_graph_ray.schemas import DOCS_SCHEMA
from research_knowledge_graph_ray.sources.corpus import HOT_METHOD, generate_documents
from research_knowledge_graph_ray.stages.extract import (
    TripleExtractor,
    compile_patterns,
    extract_doc_records,
)


def test_corpus_deterministic():
    t1 = generate_documents(20, seed=42)
    t2 = generate_documents(20, seed=42)
    assert t1.equals(t2)
    t3 = generate_documents(20, seed=43)
    assert not t1.equals(t3)


def test_corpus_schema_and_span_invariants():
    t = generate_documents(30, seed=42)
    assert t.schema.equals(DOCS_SCHEMA)
    for row in t.to_pylist():
        offsets = [s["offset"] for s in row["spans"]]
        assert offsets == sorted(offsets)
        assert offsets[0] == 0
        kinds = {s["kind"] for s in row["spans"]}
        assert "title" in kinds and "abstract" in kinds
        for s in row["spans"]:
            if s["kind"] in ("figure", "table"):
                assert s["media_ref"].startswith(f"media://{row['doc_id']}/")
            else:
                assert s["media_ref"] == ""


def test_corpus_has_hot_entity_and_media():
    t = generate_documents(200, seed=42)
    hot = 0
    media = 0
    for row in t.to_pylist():
        text = "\n".join(s["text"] for s in row["spans"])
        if HOT_METHOD in text or "3DGS" in text:
            hot += 1
        media += sum(1 for s in row["spans"] if s["media_ref"])
    assert hot >= 40  # ~30%+ of 200 docs
    assert media > 50


def test_extract_doc_records_basic():
    mres, tres = compile_patterns()
    text = (
        "3D Gaussian Splatting improves on NeRF. "
        "3DGS uses DTU. Plenoxels achieves strong PSNR. "
        "Authored by Alice Zhang."
    )
    recs = extract_doc_records("d1", text, mres, tres)
    by_pred = {}
    for r in recs:
        by_pred.setdefault(r[3], []).append(r)
    # mentions: methods 3DGS-alias + 3D Gaussian Splatting + NeRF + Plenoxels,
    # dataset DTU, metric PSNR, author
    assert any(r[5] == "Alice Zhang" for r in by_pred["AUTHORED_BY"])
    assert ("d1", "method", "3D Gaussian Splatting", "IMPROVES_ON", "method", "NeRF") == tuple(
        by_pred["IMPROVES_ON"][0][:6]
    )
    assert by_pred["USES_DATASET"][0][1:6] == ("method", "3DGS", "USES_DATASET", "dataset", "DTU")
    assert by_pred["EVALUATES_WITH"][0][5] == "PSNR"
    # per-doc dedup: INTRODUCES mentions unique per normalized key
    intro_keys = [(r[4], r[5].lower()) for r in by_pred["INTRODUCES"]]
    assert len(intro_keys) == len(set(intro_keys))


def test_extract_dedup_case_variants():
    mres, tres = compile_patterns()
    text = "NeRF and nerf and NERF are here."
    recs = extract_doc_records("d1", text, mres, tres)
    mentions = [r for r in recs if r[3] == "INTRODUCES"]
    assert len(mentions) == 1
    assert mentions[0][5] == "NeRF"  # first-wins raw label


def test_extractor_batch_matches_per_doc():
    t = generate_documents(10, seed=42)
    ex = TripleExtractor()
    out = ex(t)
    mres, tres = compile_patterns()
    expected = []
    for row in t.to_pylist():
        text = "\n".join(s["text"] for s in row["spans"])
        expected.extend(extract_doc_records(row["doc_id"], text, mres, tres))
    got = [tuple(r.values()) for r in out.to_pylist()]
    assert len(got) == len(expected)
    assert set(r[:6] for r in got) == set(r[:6] for r in expected)


def test_spans_roundtrip_through_ray(tmp_path):
    """The span-sequence invariant (kind, text, media_ref, order) survives
    a Ray Data identity map_batches + parquet round-trip."""
    import ray.data

    t = generate_documents(25, seed=42)
    ds = ray.data.from_arrow(t).map_batches(
        lambda b: b, batch_format="pyarrow", zero_copy_batch=True
    )
    path = str(tmp_path / "docs")
    ds.write_parquet(path)
    back = ray.data.read_parquet(path).to_pandas().sort_values("doc_id").reset_index(drop=True)
    orig = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    for (_, a), (_, b) in zip(orig.iterrows(), back.iterrows()):
        assert a["doc_id"] == b["doc_id"]
        sa = [(s["kind"], s["text"], s["media_ref"]) for s in a["spans"]]
        sb = [(s["kind"], s["text"], s["media_ref"]) for s in b["spans"]]
        assert sa == sb


def test_extraction_degrades_per_doc_not_per_batch():
    """A poisoned document yields a status record; the rest of the batch
    extracts normally (reference degrade-don't-die semantics)."""
    from research_knowledge_graph_ray.stages.extract import (
        _extract_degrading,
        compile_patterns,
    )

    mres, tres = compile_patterns()
    ids = ["ok-1", "bad", "ok-2"]
    texts = ["NeRF uses DTU.", None, "Plenoxels achieves strong PSNR."]  # None → TypeError
    records = _extract_degrading(ids, texts, mres, tres)
    failed = [r for r in records if r[3] == "EXTRACTION_FAILED"]
    assert len(failed) == 1 and failed[0][0] == "bad"
    ok_docs = {r[0] for r in records if r[3] != "EXTRACTION_FAILED"}
    assert ok_docs == {"ok-1", "ok-2"}
