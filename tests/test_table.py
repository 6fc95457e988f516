"""Multi-snapshot table: append, union decode, time travel, crash healing."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from parquet2_spark import fsio
from parquet2_spark.operators import decode_job, validate
from parquet2_spark.operators.encode_job import EncodeConfig, encode
from parquet2_spark.operators import table
from parquet2_spark.operators.table import append, is_table, read_manifest
from parquet2_spark.sources import webgen

BATCH = 800


def _cfg():
    return EncodeConfig(target_rows=300, page_rows=150)


def _batch(spark, k: int):
    # disjoint id ranges per batch — webgen is pure in the ids
    return webgen.webpages_df(spark, BATCH, partitions=2).withColumn(
        "url", F.concat(F.lit(f"b{k}-"), F.col("url"))
    )


@pytest.fixture(scope="module")
def table3(spark, tmp_path_factory):
    """A table with three appended batches, plus the batches themselves."""
    tdir = str(tmp_path_factory.mktemp("table") / "web_table")
    batches = []
    for k in range(1, 4):
        df = _batch(spark, k).cache()
        df.count()
        batches.append(df)
        append(spark, df, tdir, _cfg())
    return tdir, batches


def test_append_manifest_and_rowcount(spark, table3):
    tdir, batches = table3
    assert is_table(tdir)
    man = read_manifest(tdir)
    assert man["current"] == 3 and len(man["snapshots"]) == 3
    lin = decode_job.lineage(tdir)
    assert lin["rows"] == 3 * BATCH
    assert decode_job.decode(spark, tdir).count() == 3 * BATCH


def test_table_decode_bit_identical_union(spark, table3):
    tdir, batches = table3
    src = batches[0].unionByName(batches[1]).unionByName(batches[2])
    rep = validate.digest_frames(src, decode_job.decode(spark, tdir))
    assert rep["bit_identical"], rep


def test_time_travel_as_of(spark, table3):
    tdir, batches = table3
    assert decode_job.decode(spark, tdir, as_of=1).count() == BATCH
    two = decode_job.decode(spark, tdir, as_of=2)
    assert two.count() == 2 * BATCH
    rep = validate.digest_frames(batches[0].unionByName(batches[1]), two)
    assert rep["bit_identical"], rep
    # snapshot ids beyond current behave like current
    assert decode_job.decode(spark, tdir, as_of=99).count() == 3 * BATCH


def test_append_schema_mismatch_rejected(spark, table3):
    # retyping an existing column is refused; ADDING a column is allowed
    # (additive schema evolution, covered by TestSchemaEvolution)
    tdir, batches = table3
    bad = batches[0].withColumn("warc_ts", F.lit(1))
    with pytest.raises(ValueError, match="additive"):
        append(spark, bad, tdir, _cfg())


def test_crashed_append_heals_without_duplicates(spark, tmp_path_factory):
    tdir = str(tmp_path_factory.mktemp("table_crash") / "t")
    b1 = _batch(spark, 1).cache()
    b1.count()
    append(spark, b1, tdir, _cfg())
    # simulate a crash: snapshot 2 fully encoded but manifest never updated
    b2 = _batch(spark, 2).cache()
    b2.count()
    encode(spark, b2, os.path.join(tdir, "snap-000002"), _cfg())
    assert read_manifest(tdir)["current"] == 1
    # retrying the append adopts the orphan snapshot (resume skips all
    # committed partitions) instead of duplicating rows
    lin = append(spark, b2, tdir, _cfg())
    assert lin["resumed_partitions_skipped"] > 0
    assert read_manifest(tdir)["current"] == 2
    decoded = decode_job.decode(spark, tdir)
    assert decoded.count() == 2 * BATCH
    rep = validate.digest_frames(b1.unionByName(b2), decoded)
    assert rep["bit_identical"], rep


def test_compact_rewrites_to_single_snapshot(spark, tmp_path_factory):
    from parquet2_spark.operators.table import compact

    tdir = str(tmp_path_factory.mktemp("table_cmp") / "t")
    b1, b2 = _batch(spark, 1).cache(), _batch(spark, 2).cache()
    b1.count(), b2.count()
    append(spark, b1, tdir, _cfg())
    append(spark, b2, tdir, _cfg())
    old_dirs = [s["dir"] for s in read_manifest(tdir)["snapshots"]]
    compact(spark, tdir, _cfg())
    man = read_manifest(tdir)
    assert len(man["snapshots"]) == 1 and man["current"] == 3
    assert man["snapshots"][0]["compacted_from"] == [1, 2]
    for d in old_dirs:
        assert not os.path.exists(os.path.join(tdir, d))
    decoded = decode_job.decode(spark, tdir)
    rep = validate.digest_frames(b1.unionByName(b2), decoded)
    assert rep["bit_identical"], rep


def test_table_stats_and_key_range_pruning(spark, table3):
    tdir, _ = table3
    st = decode_job.stats(spark, tdir).collect()
    assert {r["column"] for r in st} == {"url", "warc_ts", "html", "text", "lang"}
    # key-range decode over the table: only batch-2 urls
    out = decode_job.decode(spark, tdir, key_range=("url", "b2-", "b2-￿"))
    assert 0 < out.count() <= BATCH
    assert out.filter(~F.col("url").startswith("b2-")).count() == 0


class TestSchemaEvolution:
    """Additive schema evolution (Iceberg add-column): later snapshots may
    add columns; older snapshots read them as NULL. Drops/retypes refused."""

    @pytest.fixture(scope="class")
    def evolved(self, spark, tmp_path_factory):
        tdir = str(tmp_path_factory.mktemp("tbl_evo"))
        cfg = EncodeConfig(target_rows=64, key="url", host_from_key=False)
        b1 = spark.createDataFrame(
            [(f"u{i}", f"t{i}") for i in range(100)], "url string, text string"
        )
        table.append(spark, b1, tdir, cfg)
        b2 = spark.createDataFrame(
            [(f"v{i}", f"s{i}", "en") for i in range(50)],
            "url string, text string, lang string",
        )
        table.append(spark, b2, tdir, cfg)
        return tdir

    def test_old_rows_read_new_column_as_null(self, spark, evolved):
        out = decode_job.decode(spark, evolved)
        assert set(out.columns) == {"url", "text", "lang"}
        assert out.count() == 150
        assert out.filter(F.col("lang").isNull()).count() == 100
        assert out.filter(F.col("lang") == "en").count() == 50

    def test_projection_of_only_new_column(self, spark, evolved):
        out = decode_job.decode(spark, evolved, columns=["lang"])
        assert out.columns == ["lang"]
        assert out.count() == 150  # old partitions still produce null rows

    def test_time_travel_sees_old_schema(self, spark, evolved):
        out = decode_job.decode(spark, evolved, as_of=1)
        assert set(out.columns) == {"url", "text"}
        assert out.count() == 100

    def test_retype_refused(self, spark, evolved):
        bad = spark.createDataFrame(
            [(1, "x", "en")], "url bigint, text string, lang string"
        )
        with pytest.raises(ValueError, match="additive"):
            table.append(spark, bad, evolved)

    def test_drop_refused(self, spark, evolved):
        bad = spark.createDataFrame([("u", "en")], "url string, lang string")
        with pytest.raises(ValueError, match="additive"):
            table.append(spark, bad, evolved)


def test_compact_after_schema_evolution(spark, tmp_path_factory):
    """compact() of an evolved table re-encodes the merged schema (old
    rows carry the added column as nulls) into one fresh snapshot."""
    from parquet2_spark.operators.table import compact

    tdir = str(tmp_path_factory.mktemp("tbl_evo_c"))
    cfg = EncodeConfig(target_rows=64, key="url", host_from_key=False)
    b1 = spark.createDataFrame([(f"u{i}", f"t{i}") for i in range(80)],
                               "url string, text string")
    table.append(spark, b1, tdir, cfg)
    b2 = spark.createDataFrame([(f"v{i}", f"s{i}", i) for i in range(40)],
                               "url string, text string, rank bigint")
    table.append(spark, b2, tdir, cfg)

    compact(spark, tdir, cfg)
    man = read_manifest(tdir)
    assert len(man["snapshots"]) == 1
    out = decode_job.decode(spark, tdir)
    assert out.count() == 120
    assert out.filter(F.col("rank").isNull()).count() == 80
    assert out.filter(F.col("rank") >= 0).count() == 40


def test_incremental_read_since(spark, table3):
    """decode(since=k) reads only snapshots (k, current] — the CDC-style
    consumption window for periodically-retrained pipelines."""
    tdir, batches = table3
    inc = decode_job.decode(spark, tdir, since=1)
    assert inc.count() == 2 * BATCH
    rep = validate.digest_frames(batches[1].unionByName(batches[2]), inc)
    assert rep["bit_identical"], rep
    # window combinable with as_of: exactly snapshot 2
    only2 = decode_job.decode(spark, tdir, since=1, as_of=2)
    rep2 = validate.digest_frames(batches[1], only2)
    assert rep2["bit_identical"], rep2
    # nothing new: empty result with intact schema, not an error
    empty = decode_job.decode(spark, tdir, since=3)
    assert empty.count() == 0
    assert set(empty.columns) == {"url", "warc_ts", "html", "text", "lang"}
    # plain snapshot dirs reject since
    snap1 = read_manifest(tdir)["snapshots"][0]["dir"]
    with pytest.raises(ValueError):
        decode_job.decode(spark, os.path.join(tdir, snap1), since=1)


def test_concurrent_append_commits_under_next_id(spark, tmp_path_factory, monkeypatch):
    """If another writer commits our provisional snapshot id while we
    encode, the locked commit finalizes under the next free id — both
    snapshots land, neither interleaves files (see test_table_concurrency
    for the lock/adoption details)."""
    import time as _time

    tdir = str(tmp_path_factory.mktemp("tbl_race"))
    b1 = _batch(spark, 1).cache(); b1.count()
    append(spark, b1, tdir, _cfg())

    orig_encode = table.encode

    def racy_encode(*a, **k):
        lin = orig_encode(*a, **k)
        man = read_manifest(tdir)
        man["snapshots"].append(
            {"id": 2, "dir": "snap-000002-foreign", "rows": 1,
             "raw_bytes": 1, "enc_bytes": 1, "created_unix": _time.time()}
        )
        man["current"] = 2
        fs, root = fsio.resolve(tdir, None)
        fsio.mkdirs(fs, fsio.join(root, "snap-000002-foreign"))
        fsio.write_json_atomic(
            fs, fsio.join(root, "snap-000002-foreign", "_lineage.json"),
            {"schema": dict(b1.dtypes)},
        )  # a real committed snapshot always carries its lineage
        table._write_manifest(tdir, man)
        return lin

    monkeypatch.setattr(table, "encode", racy_encode)
    table.append(spark, _batch(spark, 2), tdir, _cfg())
    man = read_manifest(tdir)
    assert sorted(s["id"] for s in man["snapshots"]) == [1, 2, 3]
    assert man["snapshots"][1]["dir"] == "snap-000002-foreign"
