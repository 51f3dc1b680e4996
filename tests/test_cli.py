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
