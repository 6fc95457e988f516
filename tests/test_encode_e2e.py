"""End-to-end: generate webpages → encode snapshot → decode → bit-identity,
plus checkpoint-resume (FIXTURES F5) and salting (F4) behavior."""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pytest

from parquet2_spark.operators import decode_job, validate
from parquet2_spark.operators.encode_job import (
    EncodeConfig,
    committed_parts,
    encode,
    plan_partitions,
)
from parquet2_spark.sources import webgen

N_ROWS = 3000


@pytest.fixture(scope="module")
def webpages(spark):
    df = webgen.webpages_df(spark, N_ROWS, partitions=4).cache()
    df.count()
    return df


def _cfg(**kw):
    base = dict(target_rows=500, page_rows=200)
    base.update(kw)
    return EncodeConfig(**base)


def test_encode_decode_bit_identical(spark, webpages, tmp_path_factory):
    snap = str(tmp_path_factory.mktemp("snap"))
    lin = encode(spark, webpages, snap, _cfg())
    assert lin["rows"] == N_ROWS
    assert lin["n_partitions_committed"] >= 1
    assert lin["enc_bytes"] < lin["raw_bytes"]
    # every column present with a sane codec mix
    assert set(lin["per_column"]) == {"url", "warc_ts", "html", "text", "lang"}
    assert "dict" in lin["per_column"]["lang"]["codecs"] or "constant" in lin["per_column"]["lang"]["codecs"]

    report = validate.validate(spark, webpages, snap)
    assert report["bit_identical"], report


def test_digest_validate_matches_and_detects_mutation(spark, webpages, tmp_path_factory):
    from pyspark.sql import functions as F

    snap = str(tmp_path_factory.mktemp("snap_dig"))
    encode(spark, webpages, snap, _cfg())
    decoded = decode_job.decode(spark, snap)
    rep = validate.digest_frames(webpages, decoded)
    assert rep["bit_identical"], rep
    assert rep["source"]["n"] == N_ROWS
    # a single flipped byte anywhere must change the digest
    mutated = decoded.withColumn(
        "text",
        F.when(F.col("url") == decoded.select("url").first()["url"],
               F.concat(F.col("text"), F.lit("x"))).otherwise(F.col("text")),
    )
    rep2 = validate.digest_frames(webpages, mutated)
    assert not rep2["bit_identical"]
    # dropping one row must change it too (count + sum both move)
    rep3 = validate.digest_frames(webpages, decoded.limit(N_ROWS - 1))
    assert not rep3["bit_identical"]


def test_bloom_point_lookup(spark, webpages, tmp_path_factory):
    from pyspark.sql import functions as F

    snap = str(tmp_path_factory.mktemp("snap_bloom"))
    encode(spark, webpages, snap, _cfg(bloom_columns=("url",)))
    target = webpages.orderBy("url").limit(1).first()

    hit = decode_job.decode(spark, snap, key_eq=("url", target["url"])).collect()
    assert len(hit) == 1 and hit[0]["url"] == target["url"]
    assert hit[0]["text"] == target["text"]
    # absent key: bloom may false-positive a partition, never a row
    miss = decode_job.decode(spark, snap, key_eq=("url", "https://no.such/key"))
    assert miss.count() == 0
    # the stored blooms actually prune: most partitions rule the key out
    chunks = decode_job.chunks_df(spark, snap).filter(F.col("column") == "url")
    n_parts = chunks.count()
    assert n_parts >= 4
    from parquet2_spark.plans import bloom as bloom_mod

    hv = int(spark.range(1).select(F.xxhash64(F.lit(target["url"]))).first()[0])
    probe = np.array([hv], dtype=np.int64).view(np.uint64)
    surviving = sum(
        1 for r in chunks.select("bloom").collect()
        if r["bloom"] is not None and bool(bloom_mod.might_contain(bytes(r["bloom"]), probe)[0])
    )
    assert 1 <= surviving < n_parts


def test_validate_size_vs_pyarrow_reference(spark, webpages, tmp_path_factory):
    snap = str(tmp_path_factory.mktemp("snap_sz"))
    encode(spark, webpages, snap, _cfg())
    ref = str(tmp_path_factory.mktemp("ref") / "ref.parquet")
    report = validate.validate(spark, webpages, snap, reference_parquet=ref)
    assert report["bit_identical"]
    assert report["beats_reference"], report


def test_resume_skips_committed_and_matches_clean_run(spark, webpages, tmp_path_factory):
    snap_a = str(tmp_path_factory.mktemp("snap_a"))  # clean single run
    snap_b = str(tmp_path_factory.mktemp("snap_b"))  # interrupted + resumed

    lin_a = encode(spark, webpages, snap_a, _cfg())

    # simulate an interrupted run: encode only a subset of partitions by
    # pre-committing... instead run fully, then delete some commits+files
    lin_b1 = encode(spark, webpages, snap_b, _cfg())
    committed = sorted(committed_parts(snap_b))
    kill = committed[len(committed) // 2 :]
    for pid in kill:
        os.remove(os.path.join(snap_b, "_commits", f"{pid}.json"))
        os.remove(os.path.join(snap_b, "chunks", f"part-{pid:06d}.parquet"))
    assert committed_parts(snap_b) != set(committed)

    lin_b2 = encode(spark, webpages, snap_b, _cfg())  # resume
    assert lin_b2["resumed_partitions_skipped"] == len(committed) - len(kill)
    assert sorted(committed_parts(snap_b)) == committed

    # snapshots identical: same chunk metadata, decoded data bit-identical
    ca = decode_job.chunks_df(spark, snap_a).drop("payload").orderBy("part_id", "column").toPandas()
    cb = decode_job.chunks_df(spark, snap_b).drop("payload").orderBy("part_id", "column").toPandas()
    assert ca.equals(cb)
    report = validate.validate(spark, webpages, snap_b)
    assert report["bit_identical"]


def test_salting_bounds_partition_skew(spark, tmp_path_factory):
    # 80% of rows on one host (FIXTURES F4 shape)
    from pyspark.sql import functions as F

    df = webgen.webpages_df(spark, 2000, partitions=4).withColumn(
        "url",
        F.when(
            F.rand(7) < 0.8,
            F.concat(F.lit("https://hot.example.com/x/"), F.col("url")),
        ).otherwise(F.col("url")),
    )
    cfg = _cfg(target_rows=250)
    planned, n_parts = plan_partitions(df, cfg)
    sizes = planned.groupBy("_part_id").count().toPandas()["count"]
    assert len(sizes) > 4  # the hot host was split across salt buckets
    assert sizes.max() <= 2.5 * max(250, sizes.median())


def test_decode_projection_reads_only_requested_columns(spark, webpages, tmp_path_factory):
    snap = str(tmp_path_factory.mktemp("snap_proj"))
    encode(spark, webpages, snap, _cfg())
    out = decode_job.decode(spark, snap, columns=["url", "lang"])
    assert set(out.columns) == {"url", "lang"}
    assert out.count() == N_ROWS
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert "en" in langs


def test_zone_map_key_range_prunes_partitions(spark, webpages, tmp_path_factory):
    snap = str(tmp_path_factory.mktemp("snap_zm"))
    encode(spark, webpages, snap, _cfg())
    full = decode_job.decode(spark, snap, columns=["url"])
    lo, hi = "https://host0000", "https://host00201"
    pruned = decode_job.decode(spark, snap, columns=["url"], key_range=("url", lo, hi))
    got = pruned.filter((F_col := __import__("pyspark.sql.functions", fromlist=["col"]).col)("url").between(lo, hi)).count()
    want = full.filter(F_col("url").between(lo, hi)).count()
    assert got == want and want > 0


def test_stats_query(spark, webpages, tmp_path_factory):
    snap = str(tmp_path_factory.mktemp("snap_st"))
    encode(spark, webpages, snap, _cfg())
    st = decode_job.stats(spark, snap).toPandas()
    assert set(st["column"]) == {"url", "warc_ts", "html", "text", "lang"}
    ts = st[st["column"] == "warc_ts"]
    assert int(ts["rows"].sum()) == N_ROWS
    assert int(ts["min_num"].min()) >= 1_704_067_200_000_000


def test_compound_sort_key(spark, tmp_path):
    """sort_by as a tuple: primary/secondary ordering inside each
    partition — the (host, timestamp) web layout — with bit-identical
    round-trip and a boundary-ordered primary column."""
    from parquet2_spark.operators import decode_job, validate

    df = spark.range(3000).selectExpr(
        "id as k",
        "cast(id % 7 as string) as lang",
        "cast(id as string) as body",
    )
    snap = str(tmp_path / "compound")
    encode(spark, df, snap,
           EncodeConfig(target_rows=1500, page_rows=250, sort_by=("lang", "k"),
                        key="k", host_from_key=False))
    rep = validate.digest_frames(df, decode_job.decode(spark, snap))
    assert rep["bit_identical"]
    orders = {r["column"]: r["bounds_order"]
              for r in decode_job.chunks_df(spark, snap).collect()}
    assert orders["lang"] == "asc"  # the primary sort column is ordered
