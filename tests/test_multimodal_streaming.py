"""Multimodal plumbing + streaming encode tests."""

from __future__ import annotations

import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from parquet2_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    return multimodal.fake_media_df(spark, 60).cache()


def test_fake_media_schema_and_determinism(spark, media):
    a = media.orderBy("media_id").collect()
    b = multimodal.fake_media_df(spark, 60).orderBy("media_id").collect()
    assert a == b
    assert set(media.columns) == {
        "media_id", "kind", "payload", "width", "height", "n_frames", "sample_rate"
    }


def test_feature_extraction_shape_and_norm(spark, media):
    out = multimodal.extract_features(media).select("media_id", "features").toPandas()
    assert out["features"].map(len).eq(multimodal.FEATURE_DIM).all()
    sums = out["features"].map(lambda v: abs(sum(v) - 1.0) < 1e-3)
    assert sums.all()


def test_resize_roundtrip_dims(spark, media):
    resized = multimodal.resize_images(media, 8, 8)
    payloads = resized.select("payload").toPandas()["payload"]
    for p in payloads:
        img = multimodal.decode_fake(bytes(p))
        assert img.shape == (8, 8)


def test_frame_sampling(spark, media):
    out = multimodal.sample_frames(media, every_n=10).select("n_frames", "sampled_frames").toPandas()
    for nf, frames in zip(out["n_frames"], out["sampled_frames"]):
        assert len(frames) == len(range(0, nf, 10))


def test_real_format_raises_not_implemented():
    with pytest.raises(NotImplementedError):
        multimodal.decode_fake(b"\x89PNG\r\n\x1a\n....")


def test_streaming_encode_availablenow(spark, tmp_path_factory):
    from parquet2_spark.operators.encode_job import EncodeConfig
    from parquet2_spark.streaming.encode_stream import decode_stream_snapshot, encode_stream

    snap = str(tmp_path_factory.mktemp("stream_snap"))
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt"))

    # stage a bounded file-source stream (availableNow drains it fully)
    src_dir = str(tmp_path_factory.mktemp("stream_src"))
    batch = (
        spark.range(1000)
        .withColumn("url", F.concat(F.lit("https://s.example.com/"), F.col("id")))
        .withColumn("warc_ts", F.timestamp_micros(F.col("id") * 1000 + 1700000000000000))
        .withColumn("text", F.concat(F.lit("streaming text payload "), F.col("id")))
        .withColumn("lang", F.when(F.col("id") % 2 == 0, "en").otherwise("de"))
        .select("url", "warc_ts", "text", "lang")
    )
    batch.repartition(2).write.mode("overwrite").parquet(src_dir)
    src = spark.readStream.schema(batch.schema).option("maxFilesPerTrigger", "1").parquet(src_dir)
    q = encode_stream(
        spark, src, snap, ckpt, EncodeConfig(target_rows=200, page_rows=100, key="url")
    )
    q.awaitTermination(120)
    batches = [d for d in os.listdir(snap) if d.startswith("batch=")]
    assert batches, "no micro-batch snapshots written"
    out = decode_stream_snapshot(spark, snap)
    n = out.count()
    assert n == 1000
    assert set(out.columns) == {"url", "warc_ts", "text", "lang"}
    # every decoded url is intact
    assert out.filter(~F.col("url").startswith("https://s.example.com/")).count() == 0


def test_streaming_stateful_dedup_across_batches(spark, tmp_path_factory):
    """applyInPandasWithState: first arrival of a text wins within AND
    across micro-batches; the state store survives a query restart."""
    from parquet2_spark.streaming.dedup_stream import stream_exact_dedup

    base = tmp_path_factory.mktemp("sdedup")
    inbox, outbox, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")
    os.makedirs(inbox)

    schema = "doc_id long, text string"

    def run():
        src = spark.readStream.schema(schema).parquet(inbox)
        q = stream_exact_dedup(src, outbox, ckpt)
        q.awaitTermination(120)

    import pyarrow as pa
    import pyarrow.parquet as pq

    def drop(name, rows):
        # single flat file: the file stream source does not recurse into
        # the subdirectories df.write.parquet would create
        tbl = pa.table({"doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                        "text": pa.array([r[1] for r in rows])})
        tmp = str(base / f"{name}.tmp")
        pq.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(inbox, f"{name}.parquet"))

    # batch 1: in-batch duplicate (10 and 11 share text); 12 unique
    drop("b1", [(10, "alpha"), (11, "alpha"), (12, "beta")])
    run()
    got1 = {r.doc_id for r in spark.read.parquet(outbox).collect()}
    assert got1 == {10, 12}

    # batch 2 (fresh query run, same checkpoint): cross-batch duplicate
    # ("alpha" again, "beta" again) must be suppressed by recovered state
    drop("b2", [(20, "alpha"), (21, "gamma"), (22, "beta")])
    run()
    got2 = {r.doc_id for r in spark.read.parquet(outbox).collect()}
    assert got2 == {10, 12, 21}, got2


def test_streaming_windowed_stats_watermark(spark, tmp_path_factory):
    """Tumbling windows finalize once the watermark passes: batch 1 fills
    two windows, batch 2's later events advance the watermark so the
    early windows emit; a too-late event for a finalized window is
    dropped."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet2_spark.streaming.window_stats import start_windowed_stats

    base = tmp_path_factory.mktemp("swin")
    inbox, outbox, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")
    os.makedirs(inbox)
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def drop(name, rows):
        tbl = pa.table({
            "ts": pa.array([t0 + dt.timedelta(seconds=s) for s, _ in rows],
                           type=pa.timestamp("us")),
            "value": pa.array([float(v) for _, v in rows], type=pa.float64()),
        })
        tmp = str(base / f"{name}.tmp")
        pq.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(inbox, f"{name}.parquet"))

    def run():
        src = spark.readStream.schema("ts timestamp, value double").parquet(inbox)
        q = start_windowed_stats(src, outbox, ckpt,
                                 window="1 minute", watermark="1 minute")
        q.awaitTermination(120)

    # windows [0,60) and [60,120); watermark after this batch = 70s-60s = 10s
    drop("b1", [(5, 1.0), (30, 2.0), (70, 10.0)])
    run()
    # advance the watermark to 340s: both early windows finalize and emit
    drop("b2", [(400, 5.0)])
    run()
    # now 10s is WAY behind the watermark — must be dropped, not merged
    drop("b3", [(10, 99.0), (430, 7.0)])
    run()
    got = {
        (r.win_start.second + r.win_start.minute * 60, r.n_rows, r.sum_value)
        for r in spark.read.parquet(outbox).collect()
    }
    assert got == {(0, 2, 3.0), (60, 1, 10.0)}, got


def test_streaming_encode_nested_columns(spark, tmp_path_factory):
    """Nested (array/struct) columns flow through the streaming encode
    path bit-identical — the same blob layer serves batch and stream."""
    from parquet2_spark.operators.encode_job import EncodeConfig
    from parquet2_spark.streaming.encode_stream import decode_stream_snapshot, encode_stream

    snap = str(tmp_path_factory.mktemp("stream_snap_n"))
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt_n"))
    src_dir = str(tmp_path_factory.mktemp("stream_src_n"))
    batch = (
        spark.range(400)
        .withColumn("url", F.concat(F.lit("https://n.example/"), F.col("id")))
        .withColumn("tokens", F.array(F.concat(F.lit("t"), F.col("id")), F.lit("x")))
        .withColumn(
            "meta",
            F.struct(
                (F.col("id") % 7).alias("bucket"),
                F.concat(F.lit("T"), F.col("id") % 3).alias("title"),
            ),
        )
        .select("url", "tokens", "meta")
    )
    batch.repartition(2).write.mode("overwrite").parquet(src_dir)
    src = spark.readStream.schema(batch.schema).parquet(src_dir)
    q = encode_stream(
        spark, src, snap, ckpt, EncodeConfig(target_rows=100, page_rows=64, key="url")
    )
    q.awaitTermination(120)
    out = decode_stream_snapshot(spark, snap)
    got = sorted(repr(tuple(r)) for r in out.collect())
    want = sorted(repr(tuple(r)) for r in batch.collect())
    assert got == want
