"""CLI smoke tests (subprocess — the spark-submit surface)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args: str):
    env = {**os.environ, "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")}
    return subprocess.run(
        [sys.executable, "-m", "parquet2_spark.cli", *args],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=300,
    )


@pytest.fixture(scope="module")
def snapshot(spark, tmp_path_factory):
    from parquet2_spark.operators.encode_job import EncodeConfig, encode
    from parquet2_spark.sources import webgen

    inp = str(tmp_path_factory.mktemp("cli_in") / "web")
    webgen.webpages_df(spark, 800, partitions=2).write.parquet(inp)
    snap = str(tmp_path_factory.mktemp("cli_snap"))
    encode(spark, spark.read.parquet(inp), snap, EncodeConfig(target_rows=400, page_rows=200))
    return inp, snap


def test_cli_meta_and_rowcount(snapshot):
    _, snap = snapshot
    r = _run("rowcount", snap)
    assert r.returncode == 0 and r.stdout.strip() == "800"
    r = _run("meta", snap)
    assert r.returncode == 0
    meta = json.loads(r.stdout)
    assert meta["rows"] == 800 and set(meta["per_column"]) == {
        "url", "warc_ts", "html", "text", "lang"
    }


def test_cli_validate(snapshot):
    inp, snap = snapshot
    r = _run("validate", inp, snap)
    assert r.returncode == 0, r.stdout + r.stderr
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["bit_identical"] is True


def test_cli_validate_digest(snapshot):
    inp, snap = snapshot
    r = _run("validate", inp, snap, "--digest")
    assert r.returncode == 0, r.stdout + r.stderr
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["bit_identical"] is True and rep["source"]["n"] == 800


def test_cli_unknown_command():
    r = _run("frobnicate", "/tmp/nope")
    assert r.returncode == 2
