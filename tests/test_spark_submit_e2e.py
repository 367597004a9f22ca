"""Real ``spark-submit --py-files`` deployment e2e.

The north rule's launch surface is ``spark-submit --py-files`` — this
exercises it for real: the package is zipped by ``jobs/package.py``,
the job scripts are copied AWAY from the repo into a bare directory,
and ``spark-submit`` runs build + query with imports resolvable ONLY
from the zip (PYTHONPATH stripped, cwd outside the repo). Also pins
the Korean-argv mojibake guard: a non-UTF-8 launcher locale makes the
JVM lossily decode Korean argv to ``?`` before Python runs, and the
query job must fail loudly with the fix instead of returning ``[]``.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)

N_DOCS = 300
QUERY = "검색 데이터"


def _env(utf8: bool = True) -> dict:
    env = {
        k: v
        for k, v in os.environ.items()
        # imports must come from the zip, and the repo must not leak in
        if k not in ("PYTHONPATH", "LANG", "LC_ALL", "LC_CTYPE")
    }
    if utf8:
        env["LANG"] = "C.UTF-8"
    env.setdefault("SPARK_GRAFT_CPUS", "4")
    return env


def _submit(workdir: Path, script: str, *args: str, utf8: bool = True):
    return subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]", "--py-files", "pkg.zip",
         script, *args],
        cwd=workdir,
        env=_env(utf8),
        capture_output=True,
        text=True,
        timeout=420,
    )


@pytest.fixture(scope="module")
def deploy(tmp_path_factory):
    """zip + job scripts in a bare dir, index built via spark-submit."""
    d = tmp_path_factory.mktemp("submit_e2e")
    pack = subprocess.run(
        [sys.executable, str(REPO / "jobs" / "package.py"), "--out",
         str(d / "pkg.zip")],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert pack.returncode == 0, pack.stderr
    for script in ("build_index.py", "query.py"):
        shutil.copy(REPO / "jobs" / script, d / script)
    built = _submit(
        d, "build_index.py", "--synthesize", str(N_DOCS),
        "--output", str(d / "index"),
    )
    assert built.returncode == 0, built.stderr[-4000:]
    return d


def test_build_via_submit_writes_a_complete_index(deploy):
    manifest = json.loads((deploy / "index" / "manifest.json").read_text())
    stages = manifest["stages"]
    assert all(s["status"] == "complete" for s in stages.values())
    assert stages["stats"]["counters"]["n_docs"] > 0


def test_query_via_submit_matches_in_process_engine(deploy, spark):
    got = _submit(
        deploy, "query.py", "--index", str(deploy / "index"),
        "--query", QUERY, "-k", "5", "--facet-hosts", "3",
    )
    assert got.returncode == 0, got.stderr[-4000:]
    # stdout carries the hits array then the facet object
    payload = got.stdout[got.stdout.index("[") :]
    hits = json.loads(payload[: payload.index("]") + 1])
    assert hits, "submitted query returned no hits"
    facets = json.loads(payload[payload.index('{\n  "facet_hosts"') :])
    assert facets["facet_hosts"], "facet panel came back empty"
    assert all(b["doc_count"] >= 1 for b in facets["facet_hosts"])

    from mecab_ko_lucene_analyzer_spark.analysis.dictionary import AnalyzerOption
    from mecab_ko_lucene_analyzer_spark.engine import SearchEngine

    eng = SearchEngine(spark, str(deploy / "index"), AnalyzerOption())
    want = eng.search(QUERY, k=5)
    assert [(h["doc_id"], round(h["score"], 9)) for h in hits] == [
        (h["doc_id"], round(h["score"], 9)) for h in want
    ]


def test_mojibake_argv_fails_loudly_not_empty(deploy):
    """Without a UTF-8 launcher locale the JVM turns Korean argv into
    '?' — the job must exit nonzero with the locale hint, never print
    an empty result set."""
    got = _submit(
        deploy, "query.py", "--index", str(deploy / "index"),
        "--query", QUERY, "-k", "5", utf8=False,
    )
    assert got.returncode != 0
    err = got.stderr + got.stdout
    assert "non-UTF-8 locale" in err
    assert "[]" not in got.stdout
