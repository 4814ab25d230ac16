"""CLI surface via real subprocesses (the reference's HTTP e2e analog:
e2e/api/run_e2e.py submit → poll → assert artifact)."""

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from sparkbm25.fixtures import make_transcripts_pdf

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args: str) -> subprocess.CompletedProcess:
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", "sparkbm25.cli", *args],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )


@pytest.fixture(scope="module")
def src(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cli") / "tr.parquet")
    spark.createDataFrame(make_transcripts_pdf(15)).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    ).write.parquet(d)
    return d


def test_cli_lifecycle(src, tmp_path_factory):
    ix = str(tmp_path_factory.mktemp("cli_ix") / "job1")
    r = run_cli("build", "--source", src, "--index-dir", ix,
                "--doc-id-scheme", "conv_seq", "--num-shards", "2",
                "--lineage-groups", "1", "--cores", "4")
    assert r.returncode == 0, r.stderr[-800:]
    assert '"status": "COMPLETED"' in r.stdout

    r = run_cli("status", "--index-dir", ix)
    assert r.returncode == 0
    st = json.loads(r.stdout)
    assert st["status"] == "COMPLETED" and st["completed_groups"] == ["0"]

    r = run_cli("query", "--index-dir", ix, "--query", "w0000", "-k", "3",
                "--cores", "4")
    assert r.returncode == 0
    lines = [ln for ln in r.stdout.splitlines() if "\t" in ln]
    assert 1 <= len(lines) <= 3
    rank, doc_id, score = lines[0].split("\t")
    assert rank == "1" and float(score) > 0

    r = run_cli("jobs", "--index-root", os.path.dirname(ix))
    assert json.loads(r.stdout)[0]["status"] == "COMPLETED"


def test_cli_status_missing_is_404(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cli_missing") / "nope")
    r = run_cli("status", "--index-dir", d)
    assert r.returncode == 1
    assert json.loads(r.stdout) == {"error": "not found"}
