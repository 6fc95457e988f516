"""CLI smoke tests (subprocess — the spark-submit surface)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

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


def test_cli_append_builds_table(snapshot, tmp_path_factory):
    inp, _ = snapshot
    tdir = str(tmp_path_factory.mktemp("cli_table") / "t")
    r1 = _run("append", inp, tdir, "--target-rows", "400", "--page-rows", "200")
    assert r1.returncode == 0, r1.stdout + r1.stderr
    rep1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert rep1 == {"snapshot_id": 1, "rows_appended": 800, "table_snapshots": 1}
    r2 = _run("append", inp, tdir, "--target-rows", "400", "--page-rows", "200")
    rep2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert rep2["snapshot_id"] == 2 and rep2["table_snapshots"] == 2
    r = _run("rowcount", tdir)
    assert r.returncode == 0 and r.stdout.strip() == "1600"


def test_cli_unknown_command():
    r = _run("frobnicate", "/tmp/nope")
    assert r.returncode == 2


def test_cli_decode_key_and_row_range(spark, tmp_path_factory):
    from parquet2_spark import cli
    from parquet2_spark.operators.encode_job import EncodeConfig, encode

    snap = str(tmp_path_factory.mktemp("cli_kr"))
    df = spark.range(500).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("s")
    )
    encode(spark, df.repartitionByRange(2, "k"), snap,
           EncodeConfig(target_rows=250, page_rows=64, sort_by="k", key="k",
                        host_from_key=False, shuffle=False))

    out1 = str(tmp_path_factory.mktemp("cli_out1")) + "/o"
    assert cli.main(["decode", snap, out1, "--key-range", "k:100:199"]) == 0
    got = spark.read.parquet(out1)
    assert sorted(r["k"] for r in got.collect()) == list(range(100, 200))

    out2 = str(tmp_path_factory.mktemp("cli_out2")) + "/o"
    assert cli.main(["decode", snap, out2, "--row-range", "10:25"]) == 0
    assert spark.read.parquet(out2).count() == 15


def test_cli_decode_key_in(spark, tmp_path_factory):
    from parquet2_spark import cli
    from parquet2_spark.operators.encode_job import EncodeConfig, encode

    snap = str(tmp_path_factory.mktemp("cli_kin"))
    df = spark.range(300).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("s")
    )
    encode(spark, df, snap,
           EncodeConfig(target_rows=100, page_rows=50, sort_by="k", key="k",
                        host_from_key=False, bloom_columns=("k",)))
    out = str(tmp_path_factory.mktemp("cli_kin_out")) + "/o"
    assert cli.main(["decode", snap, out, "--key-in", "k:5,55,155"]) == 0
    got = sorted(r["k"] for r in spark.read.parquet(out).collect())
    assert got == [5, 55, 155]


def test_cli_compact(spark, tmp_path_factory):
    import json as _json

    from parquet2_spark import cli
    from parquet2_spark.operators import table as table_mod
    from parquet2_spark.operators.encode_job import EncodeConfig

    tdir = str(tmp_path_factory.mktemp("cli_cmp"))
    cfg = EncodeConfig(target_rows=64, key="k", host_from_key=False)
    for lo in (0, 100):
        df = spark.range(lo, lo + 100).select(F.col("id").alias("k"))
        table_mod.append(spark, df, tdir, cfg)
    assert cli.main(["compact", tdir]) == 0
    man = table_mod.read_manifest(tdir)
    assert len(man["snapshots"]) == 1
    from parquet2_spark.operators import decode_job
    assert decode_job.decode(spark, tdir).count() == 200


def test_cli_vacuum(spark, tmp_path, monkeypatch):
    import os, time as _t

    from parquet2_spark import fsio
    from parquet2_spark.cli import main
    from parquet2_spark.operators import table
    from parquet2_spark.operators.table import append, read_manifest
    from parquet2_spark.operators.encode_job import EncodeConfig

    monkeypatch.setattr(table, "VACUUM_FLOOR_S", 1.0)
    tdir = str(tmp_path / "t")
    df = spark.range(50).selectExpr("id as k", "cast(id as string) as v")
    append(spark, df, tdir, EncodeConfig(target_rows=50, key="k", sort_by="k",
                                         host_from_key=False))
    fs, root = fsio.resolve(tdir, None)
    orphan = table._claim_staging_dir(fs, root, read_manifest(tdir), 2)
    # age the claim CONTENT (vacuum's live-append guard) and every mtime
    import json as _json
    claim_p = fsio.join(root, orphan, table.CLAIM)
    c = _json.loads(fsio.read_bytes(fs, claim_p))
    c["created_unix"] = _t.time() - 100
    fsio.write_json_atomic(fs, claim_p, c)
    past = _t.time() - 100
    for base, dirs, files in os.walk(fsio.join(root, orphan), topdown=False):
        for f in files:
            os.utime(os.path.join(base, f), (past, past))
        for d in dirs:
            os.utime(os.path.join(base, d), (past, past))
    rc = main(["vacuum", tdir, "--older-than", "50"])
    assert rc == 0
    assert not fsio.is_dir(fs, fsio.join(root, orphan))


def test_cli_decode_null_predicates(spark, tmp_path_factory):
    from parquet2_spark import cli
    from parquet2_spark.operators.encode_job import EncodeConfig, encode

    snap = str(tmp_path_factory.mktemp("cli_nn"))
    df = spark.range(400).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 40, F.col("id")).alias("y"),
    )
    encode(spark, df, snap, EncodeConfig(target_rows=200, page_rows=50,
                                         sort_by="k", key="k", host_from_key=False))
    out1 = str(tmp_path_factory.mktemp("cli_nn_o1")) + "/o"
    assert cli.main(["decode", snap, out1, "--not-null", "y"]) == 0
    got = spark.read.parquet(out1)
    assert got.count() == 40 and got.filter(F.col("y").isNull()).count() == 0
    out2 = str(tmp_path_factory.mktemp("cli_nn_o2")) + "/o"
    assert cli.main(["decode", snap, out2, "--is-null", "y"]) == 0
    assert spark.read.parquet(out2).count() == 360


def test_cli_quantiles(spark, tmp_path_factory):
    import json as _json

    from parquet2_spark import cli
    from parquet2_spark.operators.encode_job import EncodeConfig, encode
    import io, contextlib

    snap = str(tmp_path_factory.mktemp("cli_q"))
    df = spark.range(4000).select(F.col("id").alias("k"))
    encode(spark, df, snap, EncodeConfig(target_rows=1000, key="k", sort_by="k",
                                         host_from_key=False))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main(["quantiles", snap, "k", "--q", "0.5"])
    assert rc == 0
    rep = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert abs(rep["quantiles"]["0.5"] - 2000) < 4000 * 0.02


def test_cli_drift(spark, tmp_path_factory):
    import json as _json

    from parquet2_spark import cli
    from parquet2_spark.operators import table
    from parquet2_spark.operators.encode_job import EncodeConfig
    import io, contextlib

    tdir = str(tmp_path_factory.mktemp("cli_drift"))
    cfg = EncodeConfig(target_rows=1000, key="k", sort_by="k",
                       host_from_key=False)
    table.append(spark, spark.range(4000).select(F.col("id").alias("k")),
                 tdir, cfg)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main(["drift", tdir])
    assert rc == 0
    rep = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rep["layout_drift"] is not None and rep["layout_drift"] >= 1.0


def test_cli_layout(spark, tmp_path_factory):
    import json as _json

    from parquet2_spark import cli
    from parquet2_spark.operators import table
    from parquet2_spark.operators.encode_job import EncodeConfig
    import io, contextlib

    tdir = str(tmp_path_factory.mktemp("cli_layout"))
    cfg = EncodeConfig(target_rows=1000, key="k", sort_by="k",
                       host_from_key=False)
    table.append(spark, spark.range(4000).select(F.col("id").alias("k")),
                 tdir, cfg)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main(["layout", tdir])
    assert rc == 0
    assert _json.loads(buf.getvalue().strip().splitlines()[-1])["layout"] is None

    table.compact(spark, tdir, cfg, range_layout_on="k")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main(["layout", tdir])
    assert rc == 0
    rep = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rep["column"] == "k" and rep["n_parts"] == 4
    assert 0.9 <= rep["heaviest_over_mean"] <= rep["rebalance_limit"]
    assert rep["layout_drift"] is not None
