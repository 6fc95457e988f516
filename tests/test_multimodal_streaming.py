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
