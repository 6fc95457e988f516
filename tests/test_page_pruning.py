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
    # the pruned decode returns fewer rows than a full decode, and the
    # decode metrics prove pages were PHYSICALLY skipped, not row-filtered
    assert pruned.count() < df.count()
    m = pruned.p2s_decode_metrics
    assert m["pages_skipped"].value > 0

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


class TestBoundaryOrder:
    """bounds_order hint + binary-search page selection (ColumnIndex
    boundary_order analog, reference/src/write/indexes/serialize.rs:12-58)."""

    def test_binary_search_matches_linear_scan(self):
        import numpy as np

        rng = np.random.default_rng(7)
        for _ in range(300):
            n = int(rng.integers(1, 20))
            # random non-overlapping-ish sorted page bounds
            starts = np.sort(rng.integers(0, 1000, n))
            widths = rng.integers(0, 50, n)
            mins = starts.tolist()
            maxs = (starts + widths).tolist()
            # force max monotonicity for the 'asc' claim
            maxs = np.maximum.accumulate(maxs).tolist()
            for _ in range(8):
                lo = int(rng.integers(-50, 1100))
                hi = lo + int(rng.integers(0, 300))
                lo_b = None if rng.random() < 0.15 else lo
                hi_b = None if rng.random() < 0.15 else hi
                fast = decode_job._page_keep_for_range(mins, maxs, lo_b, hi_b, "asc")
                slow = decode_job._page_keep_for_range(mins, maxs, lo_b, hi_b, None)
                assert fast == slow, (mins, maxs, lo_b, hi_b)
                # desc: mirrored arrays must select the mirrored set
                dfast = decode_job._page_keep_for_range(
                    mins[::-1], maxs[::-1], lo_b, hi_b, "desc"
                )
                assert dfast == {len(mins) - 1 - i for i in slow}

    def test_missing_stats_forfeit_order(self):
        keep = decode_job._page_keep_for_range([1, None, 5], [2, None, 9], 3, 4, "asc")
        assert keep == {1}  # no-stat page kept, linear rules apply

    def test_engine_records_order_and_prunes(self, spark, tmp_path):
        from parquet2_spark.sources import webgen

        snap = str(tmp_path / "snap_bo")
        df = webgen.webpages_df(spark, 2000, partitions=2)
        encode(spark, df, snap, EncodeConfig(target_rows=1000, page_rows=100, sort_by="url"))
        chunks = decode_job.chunks_df(spark, snap)
        orders = {r["column"]: r["bounds_order"] for r in chunks.collect()}
        assert orders["url"] == "asc"  # the sort key is boundary-ordered
        lo, hi = "https://host001", "https://host004"
        got = decode_job.decode(
            spark, snap, columns=["url"], key_range=("url", lo, hi)
        ).filter(F.col("url").between(lo, hi)).count()
        want = df.filter(F.col("url").between(lo, hi)).count()
        assert want > 0 and got == want


class TestEqualityZoneMapPruning:
    """key_eq/key_in prune via zone maps even without a stored bloom:
    equality is the range [v, v]; an IN-list has a [min, max] envelope."""

    def test_bloomless_key_eq(self, spark, tmp_path):
        df = webgen.webpages_df(spark, 2000, partitions=4)
        snap = str(tmp_path / "eqsnap")
        encode(spark, df, snap, EncodeConfig(target_rows=500, page_rows=100,
                                             sort_by="warc_ts"))  # no bloom_columns
        probe = df.select("url").collect()[123]["url"]
        got = decode_job.decode(spark, snap, key_eq=("url", probe)).collect()
        assert len(got) == 1 and got[0]["url"] == probe
        # a probe outside every zone map → typed empty
        miss = decode_job.decode(spark, snap, columns=["url"], key_eq=("url", "zzz~"))
        assert miss.count() == 0 and dict(miss.dtypes)["url"] == "string"

    def test_key_eq_nan_rows_survive(self, spark, tmp_path):
        import math

        rows = [(i, float(i)) for i in range(50)] + [(50 + i, float("nan")) for i in range(5)]
        df = spark.createDataFrame(rows, "k long, score double")
        snap = str(tmp_path / "nansnap")
        encode(spark, df, snap, EncodeConfig(target_rows=20, page_rows=10,
                                             sort_by="k", key="k", host_from_key=False))
        got = decode_job.decode(spark, snap, key_eq=("score", float("nan"))).collect()
        # Spark equality holds NaN == NaN; the [v,v] range prune must not fire
        assert sorted(r["k"] for r in got) == list(range(50, 55))

    def test_key_in_envelope_prunes_but_stays_exact(self, spark, tmp_path):
        df = spark.range(4000).selectExpr("id as k", "cast(id as string) as v")
        snap = str(tmp_path / "insnap")
        encode(spark, df, snap, EncodeConfig(target_rows=500, page_rows=100,
                                             sort_by="k", key="k", host_from_key=False))
        # clustered fetch: all probes inside one narrow range
        got = decode_job.decode(spark, snap, key_in=("k", [1001, 1007, 1042])).collect()
        assert sorted(r["k"] for r in got) == [1001, 1007, 1042]
