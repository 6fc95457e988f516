"""Float zone maps + persisted ndv (reference PrimitiveStatistics<f32/f64>,
src/statistics/primitive.rs:11-17; distinct_count src/statistics/mod.rs:20-26)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet2_spark.operators import decode_job
from parquet2_spark.operators.encode_job import EncodeConfig, encode


@pytest.fixture(scope="module")
def float_snap(spark, tmp_path_factory):
    df = spark.range(4000).select(
        F.col("id").alias("k"),
        (F.col("id").cast("double") / 7.0).alias("score"),
        (F.col("id") % 100).cast("float").alias("score32"),
    )
    d = str(tmp_path_factory.mktemp("snap_fl"))
    # range-partitioned input + shuffle=False → disjoint per-partition
    # zone maps (a salted shuffle would spread every range everywhere)
    encode(spark, df.repartitionByRange(4, "k"), d,
           EncodeConfig(target_rows=1000, page_rows=250, sort_by="k", key="k",
                        host_from_key=False, shuffle=False))
    return d


def test_float_zone_maps_stored(spark, float_snap):
    st = {r["column"]: r for r in decode_job.stats(spark, float_snap).collect()}
    assert st["score"]["min_dbl"] == 0.0
    assert st["score"]["max_dbl"] == pytest.approx(3999 / 7.0)
    assert st["score"]["min_num"] is None
    assert st["score32"]["max_dbl"] == 99.0  # float32 exact in float64
    assert st["k"]["min_num"] == 0 and st["k"]["max_num"] == 3999
    assert st["k"]["ndv_hint"] > 0  # persisted distinct-count hint


def test_float_key_range_prunes_and_exact(spark, float_snap):
    chunks = decode_job.chunks_df(spark, float_snap)
    total_parts = chunks.select("part_id").distinct().count()
    # range entirely inside the first quarter of sorted values
    lo, hi = 10.0, 140.0
    keyed = decode_job.prune_by_range(
        chunks.filter(F.col("column") == "score"), "score", lo, hi
    )
    kept_parts = keyed.select("part_id").distinct().count()
    assert 0 < kept_parts < total_parts  # chunks actually skipped

    out = decode_job.decode(spark, float_snap, key_range=("score", lo, hi))
    ks = sorted(r["k"] for r in out.collect())
    want = [i for i in range(4000) if lo <= i / 7.0 <= hi]
    assert ks == want  # exact (residual filter), not a page superset


def test_float32_key_range_exact(spark, float_snap):
    out = decode_job.decode(spark, float_snap, key_range=("score32", 5.0, 6.0))
    got = {(r["k"], r["score32"]) for r in out.collect()}
    assert got == {(i, float(i % 100)) for i in range(4000) if 5 <= i % 100 <= 6}


def test_int_bounds_on_float_column_and_vice_versa(spark, float_snap):
    # int bounds against the double zone map (coercion) — still exact
    out = decode_job.decode(spark, float_snap, key_range=("score", 0, 10))
    assert out.count() == len([i for i in range(4000) if i / 7.0 <= 10])
    # float bounds against the int column
    out2 = decode_job.decode(spark, float_snap, key_range=("k", 0.5, 9.5))
    assert sorted(r["k"] for r in out2.collect()) == list(range(1, 10))


class TestDecimalZoneMaps:
    @pytest.fixture(scope="class")
    def dec_snap(self, spark, tmp_path_factory):
        import decimal as d

        rows = [(i, d.Decimal(i * 25) / d.Decimal(100)) for i in range(4000)]
        df = spark.createDataFrame(rows, "k long, price decimal(12,2)")
        out = str(tmp_path_factory.mktemp("snap_dec"))
        encode(spark, df.repartitionByRange(4, "k"), out,
               EncodeConfig(target_rows=1000, page_rows=250, sort_by="k", key="k",
                            host_from_key=False, shuffle=False))
        return out

    def test_decimal_stats_conservative(self, spark, dec_snap):
        st = {r["column"]: r for r in decode_job.stats(spark, dec_snap).collect()}
        assert st["price"]["min_dbl"] is not None
        assert st["price"]["min_dbl"] <= 0.0
        assert st["price"]["max_dbl"] >= float(3999 * 25) / 100

    def test_decimal_key_range_prunes_and_exact(self, spark, dec_snap):
        import decimal as d

        chunks = decode_job.chunks_df(spark, dec_snap)
        total = chunks.select("part_id").distinct().count()
        lo, hi = d.Decimal("10.25"), d.Decimal("99.75")
        keyed = decode_job.prune_by_range(
            chunks.filter(F.col("column") == "price"), "price", lo, hi
        )
        assert 0 < keyed.select("part_id").distinct().count() < total

        out = decode_job.decode(spark, dec_snap, key_range=("price", lo, hi))
        ks = sorted(r["k"] for r in out.collect())
        want = [i for i in range(4000) if d.Decimal("10.25") <= d.Decimal(i * 25) / 100 <= d.Decimal("99.75")]
        assert ks == want


def test_multi_predicate_key_ranges(spark, float_snap):
    """AND-combined zone-map predicates: partitions pruned per predicate
    (semijoin intersection), pages per column, residuals exact."""
    out = decode_job.decode(
        spark, float_snap,
        key_ranges=[("k", 500, 1500), ("score", 100.0, 150.0)],
    )
    got = sorted(r["k"] for r in out.collect())
    want = [i for i in range(4000) if 500 <= i <= 1500 and 100.0 <= i / 7.0 <= 150.0]
    assert got == want

    # disjoint predicates -> empty, typed
    empty = decode_job.decode(
        spark, float_snap, key_ranges=[("k", 0, 100), ("k", 3000, 3100)]
    )
    assert empty.count() == 0
    assert "score" in empty.columns


def test_key_range_naive_datetime_non_utc_session(spark, tmp_path_factory):
    """Naive-datetime bounds are UTC instants (the zone maps' unit): the
    residual filter must not reinterpret them in the session timezone."""
    import datetime as dt

    df = spark.range(1000).select(
        F.col("id").alias("k"),
        F.timestamp_micros(F.col("id") * 60_000_000 + 1_700_000_000_000_000).alias("ts"),
    )
    snap = str(tmp_path_factory.mktemp("snap_tz"))
    encode(spark, df.repartitionByRange(4, "k"), snap,
           EncodeConfig(target_rows=250, page_rows=100, sort_by="k", key="k",
                        host_from_key=False, shuffle=False))
    lo = dt.datetime.utcfromtimestamp(1_700_000_000 + 100 * 60)
    hi = dt.datetime.utcfromtimestamp(1_700_000_000 + 200 * 60)
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        out = decode_job.decode(spark, snap, key_range=("ts", lo, hi))
        ks = sorted(r["k"] for r in out.collect())
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    assert ks == list(range(100, 201))
