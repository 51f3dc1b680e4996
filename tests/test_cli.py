"""CLI smoke test (separate processes — the CLI owns its own Ray session)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*argv, timeout=240):
    return subprocess.run(
        [sys.executable, "-m", "research_knowledge_graph_ray", *argv],
        cwd=REPO, capture_output=True, text=True, timeout=timeout,
    )


def test_cli_ingest_query_visualize(tmp_path):
    out = str(tmp_path / "g")
    r = _run("ingest", "--synthetic", "40", "--out", out)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ingested:" in r.stdout

    r = _run("query", out, "top-entities", "--k", "3")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "node_id" in r.stdout

    html = str(tmp_path / "g.html")
    r = _run("visualize", out, "--html", html)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(html)


def test_cli_append_equals_full(tmp_path):
    """ingest --append over an increment matches a from-scratch rebuild."""
    import duckdb
    import pandas as pd

    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    r = _run("ingest", "--synthetic", "30", "--out", inc, "--no-entity-linking")
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run("ingest", "--synthetic", "15", "--synthetic-start", "30",
             "--append", "--out", inc, "--no-entity-linking")
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run("ingest", "--synthetic", "45", "--out", full, "--no-entity-linking")
    assert r.returncode == 0, r.stderr[-2000:]
    for t in ("nodes", "edges"):
        a = duckdb.sql(
            f"SELECT * FROM read_parquet('{inc}/{t}/*.parquet') ORDER BY ALL").fetchdf()
        b = duckdb.sql(
            f"SELECT * FROM read_parquet('{full}/{t}/*.parquet') ORDER BY ALL").fetchdf()
        pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                      b.reset_index(drop=True))


def test_cli_append_requires_state(tmp_path):
    r = _run("ingest", "--synthetic", "5", "--append",
             "--out", str(tmp_path / "nope"))
    assert r.returncode == 2
    assert "requires an existing graph" in r.stderr


def test_cli_reingest_clears_stale_sidecars(tmp_path):
    """A re-ingest with a different config must not leave the previous
    configuration's mapping.json / cross_edges for --append to consume."""
    out = str(tmp_path / "g2")
    r = _run("ingest", "--synthetic", "10", "--out", out)  # linking on
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "mapping.json"))
    assert os.path.isdir(os.path.join(out, "cross_edges"))
    r = _run("ingest", "--synthetic", "10", "--out", out,
             "--no-entity-linking", "--no-link")
    assert r.returncode == 0, r.stderr[-2000:]
    assert not os.path.exists(os.path.join(out, "mapping.json"))
    assert not os.path.isdir(os.path.join(out, "cross_edges"))
    assert os.path.isdir(os.path.join(out, "base_edges"))


def test_cli_run_query():
    r = _run("run", "list")
    assert r.returncode == 0
    assert "order_quartiles\tsql-checked" in r.stdout

    r = _run("run", "order_quartiles", "--sf-dir", "/root/testdata/sf0.001")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "quartile" in r.stdout and "rows: 4" in r.stdout

    r = _run("run", "no_such_query")
    assert r.returncode == 2


def test_init_ray_attaches_to_cluster_under_job_server(monkeypatch):
    # under `ray job submit` (RAY_JOB_ID set) the CLI must attach to the
    # running cluster (address="auto"), never spawn a local session
    import ray

    from research_knowledge_graph_ray import __main__ as cli

    calls = {}
    monkeypatch.setattr(ray, "is_initialized", lambda: False)
    monkeypatch.setattr(ray, "init", lambda **kw: calls.update(kw))
    monkeypatch.setenv("RAY_JOB_ID", "raysubmit_TEST")
    cli._init_ray()
    assert calls["address"] == "auto"
    assert "num_cpus" not in calls

    calls.clear()
    monkeypatch.delenv("RAY_JOB_ID")
    cli._init_ray()
    assert calls["address"] == "local"


def test_cli_remove_from_checkpoint(tmp_path):
    """ingest --remove re-finishes from the checkpoint: removed docs vanish
    from the graph; without a checkpoint the command refuses."""
    import glob

    import pandas as pd

    out, out2 = str(tmp_path / "g"), str(tmp_path / "g2")
    ck = str(tmp_path / "ck")
    r = _run("ingest", "--synthetic", "40", "--out", out, "--checkpoint", ck)
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run("ingest", "--remove", "doc-000001,doc-000005", "--out", out2,
             "--checkpoint", ck)
    assert r.returncode == 0, r.stderr[-2000:]
    e = pd.concat([pd.read_parquet(f) for f in
                   glob.glob(f"{out2}/edges/*.parquet")])
    assert "doc-000001" not in set(e["doc_id"])
    e0 = pd.concat([pd.read_parquet(f) for f in
                    glob.glob(f"{out}/edges/*.parquet")])
    assert len(e0) > len(e)

    r = _run("ingest", "--remove", "doc-000001", "--out", out2)
    assert r.returncode == 2
