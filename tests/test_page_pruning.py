"""Page-level zone-map pruning inside decode (select_pages analog)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet2_spark.operators import decode_job
from parquet2_spark.operators.encode_job import EncodeConfig, encode
from parquet2_spark.sources import webgen


def test_page_pruning_correct_and_skips_pages(spark, tmp_path_factory):
    snap = str(tmp_path_factory.mktemp("snap_pp"))
    df = webgen.webpages_df(spark, 2000, partitions=4).cache()
    df.count()
    # few partitions, many pages → page pruning visible within chunks
    encode(spark, df, snap, EncodeConfig(target_rows=1000, page_rows=100))

    lo, hi = "https://host001", "https://host004"
    pruned = decode_job.decode(spark, snap, columns=["url", "lang"], key_range=("url", lo, hi))
    got = pruned.filter(F.col("url").between(lo, hi)).count()
    want = df.filter(F.col("url").between(lo, hi)).count()
    assert want > 0 and got == want
    # the pruned decode returns fewer rows than a full decode
    assert pruned.count() < df.count()

    # empty range → zero rows, typed schema preserved
    nothing = decode_job.decode(spark, snap, columns=["url"], key_range=("url", "zzz", "zzz~"))
    assert nothing.count() == 0
    assert dict(nothing.dtypes)["url"] == "string"


def test_page_pruning_numeric_key(spark, tmp_path_factory):
    snap = str(tmp_path_factory.mktemp("snap_ppn"))
    df = webgen.webpages_df(spark, 2000, partitions=4)
    encode(spark, df, snap, EncodeConfig(target_rows=1000, page_rows=100, sort_by="warc_ts"))
    lin = decode_job.lineage(snap)
    lo = 1_704_067_200_000_000
    hi = lo + 500 * 1_000_000
    out = decode_job.decode(spark, snap, columns=["url", "warc_ts"], key_range=("warc_ts", lo, hi))
    got = out.filter(
        F.col("warc_ts").between(
            F.timestamp_micros(F.lit(lo)), F.timestamp_micros(F.lit(hi))
        )
    ).count()
    want = 501  # ids 0..500 inclusive fall in the first 500 seconds (+jitter<2s)
    assert abs(got - 501) <= 2
