"""Table-level NDV via per-chunk HLL sketches (VERDICT r2 item 7;
reference parity: exact per-chunk distinct_count, statistics/mod.rs:20-26,
made mergeable across 10^12-doc tables)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from parquet2_spark.operators import decode_job
from parquet2_spark.operators.encode_job import EncodeConfig, encode
from parquet2_spark.plans import hll


class TestHLLUnit:
    def _hashes(self, n, seed=0):
        return hll._mix64(np.arange(seed * 10_000_000, seed * 10_000_000 + n, dtype=np.uint64))

    @pytest.mark.parametrize("n", [10, 1000, 50_000, 1_000_000])
    def test_estimate_within_2pct(self, n):
        est = hll.estimate(hll.sketch_from_hashes(self._hashes(n)))
        assert abs(est - n) / n < 0.02

    def test_merge_is_union(self):
        a = hll.sketch_from_hashes(self._hashes(60_000, seed=0))
        b = hll.sketch_from_hashes(self._hashes(60_000, seed=0))  # same set
        c = hll.sketch_from_hashes(self._hashes(60_000, seed=3))  # disjoint
        same = hll.estimate(hll.merge([a, b]))
        union = hll.estimate(hll.merge([a, c]))
        assert abs(same - 60_000) / 60_000 < 0.02
        assert abs(union - 120_000) / 120_000 < 0.02

    def test_merge_skips_none(self):
        a = hll.sketch_from_hashes(self._hashes(1000))
        assert hll.merge([None, a, None]) == a
        assert hll.merge([None, None]) is None

    def test_empty_sketch_estimates_zero(self):
        assert hll.estimate(hll.sketch_from_hashes(np.zeros(0, dtype=np.uint64))) == 0


class TestHLLThroughEngine:
    @pytest.fixture(scope="class")
    def snap(self, spark, tmp_path_factory):
        df = spark.range(30_000).select(
            F.col("id").alias("k"),
            F.concat(
                F.lit("https://host"), (F.col("id") % 997).cast("string"),
                F.lit("/p"), F.col("id").cast("string"),
            ).alias("url"),
            (F.col("id") % 7).cast("string").alias("lang"),
            F.when(F.col("id") % 11 == 0, None)
            .otherwise((F.col("id") % 500).cast("double")).alias("score"),
        )
        d = str(tmp_path_factory.mktemp("snap_hll"))
        encode(spark, df, d,
               EncodeConfig(target_rows=8000, page_rows=2000, sort_by="url", key="url"))
        return d

    def test_stats_ndv_within_2pct(self, spark, snap):
        rows = {r["column"]: r for r in decode_job.stats(spark, snap).collect()}
        for col, exact in (("k", 30_000), ("url", 30_000), ("lang", 7), ("score", 500)):
            est = rows[col]["ndv_est"]
            assert est is not None
            assert abs(est - exact) / exact < 0.02, (col, est, exact)

    def test_sketch_can_be_disabled(self, spark, tmp_path):
        df = spark.range(100).select(F.col("id").alias("k"), F.col("id").cast("string").alias("u"))
        d = str(tmp_path / "nosketch")
        encode(spark, df, d,
               EncodeConfig(target_rows=100, key="k", sort_by="k", host_from_key=False,
                            ndv_sketch=False))
        chunks = decode_job.chunks_df(spark, d)
        assert chunks.filter(F.col("ndv_hll").isNotNull()).count() == 0
        rows = decode_job.stats(spark, d).collect()
        assert all(r["ndv_est"] is None for r in rows)

    def test_bloom_hash_column_reused(self, spark, tmp_path):
        # bloom + ndv on the same column: one JVM hash column feeds both
        df = spark.range(5000).select(F.col("id").alias("k"), F.col("id").cast("string").alias("u"))
        d = str(tmp_path / "bloomhll")
        encode(spark, df, d,
               EncodeConfig(target_rows=2000, key="k", sort_by="k", host_from_key=False,
                            bloom_columns=("k",)))
        rows = {r["column"]: r for r in decode_job.stats(spark, d).collect()}
        assert abs(rows["k"]["ndv_est"] - 5000) / 5000 < 0.02
        # and the bloom still probes correctly
        got = decode_job.decode(spark, d, key_eq=("k", 1234)).collect()
        assert [r["k"] for r in got] == [1234]

    def test_map_column_sketch_via_to_json(self, spark, tmp_path):
        df = spark.range(2000).select(
            F.col("id").alias("k"),
            F.create_map(F.lit("a"), F.col("id") % 100).alias("m"),
        )
        d = str(tmp_path / "maphll")
        encode(spark, df, d,
               EncodeConfig(target_rows=1000, key="k", sort_by="k", host_from_key=False))
        rows = {r["column"]: r for r in decode_job.stats(spark, d).collect()}
        assert abs(rows["m"]["ndv_est"] - 100) <= 2


class TestMixedCoverage:
    def test_partial_sketch_coverage_reports_no_estimate(self, spark, tmp_path):
        """A table mixing a pre-sketch (ndv_sketch=False) snapshot with a
        sketched one must report NO estimate — a merge that silently
        covers half the column is an undercount, not a hint."""
        from parquet2_spark.operators import table

        tdir = str(tmp_path / "t")
        df1 = spark.range(500).select(
            F.col("id").alias("k"), F.col("id").cast("string").alias("u"))
        df2 = spark.range(500, 1000).select(
            F.col("id").alias("k"), F.col("id").cast("string").alias("u"))
        table.append(spark, df1, tdir,
                     EncodeConfig(target_rows=300, key="k", sort_by="k",
                                  host_from_key=False, ndv_sketch=False))
        table.append(spark, df2, tdir,
                     EncodeConfig(target_rows=300, key="k", sort_by="k",
                                  host_from_key=False))
        rows = decode_job.stats(spark, tdir).collect()
        assert all(r["ndv_est"] is None for r in rows)

    def test_full_coverage_across_appends_merges(self, spark, tmp_path):
        """Sketches from separate appends merge to the union NDV."""
        from parquet2_spark.operators import table

        tdir = str(tmp_path / "t2")
        cfg = lambda: EncodeConfig(target_rows=300, key="k", sort_by="k",
                                   host_from_key=False)
        # overlapping k ranges: union NDV = 750, sum of parts = 1000
        df1 = spark.range(500).select(
            F.col("id").alias("k"), F.col("id").cast("string").alias("u"))
        df2 = spark.range(250, 750).select(
            F.col("id").alias("k"), F.col("id").cast("string").alias("u"))
        table.append(spark, df1, tdir, cfg())
        table.append(spark, df2, tdir, cfg())
        rows = {r["column"]: r for r in decode_job.stats(spark, tdir).collect()}
        assert abs(rows["k"]["ndv_est"] - 750) / 750 < 0.02

    def test_two_stage_merge_path_agrees(self, spark, tmp_path, monkeypatch):
        """The big-table shape (per-batch premerge then grouped final)
        returns the same estimates as the small-table single-stage path —
        forced via the partition-count gate, since no unit test writes
        2000+ real partitions."""
        snap = str(tmp_path / "s2s")
        df = spark.range(2000).select(
            F.col("id").alias("k"), (F.col("id") % 37).cast("string").alias("u"))
        encode(spark, df, snap, EncodeConfig(target_rows=500, key="k", sort_by="k",
                                             host_from_key=False))
        small = {r["column"]: r["ndv_est"]
                 for r in decode_job.stats(spark, snap).collect()}
        monkeypatch.setattr(decode_job, "_committed_partition_count",
                            lambda *a, **k: None)  # force two-stage
        big = {r["column"]: r["ndv_est"]
               for r in decode_job.stats(spark, snap).collect()}
        assert small == big and big["u"] is not None


class TestSparseFormat:
    def test_low_cardinality_sketch_is_tiny(self):
        h = hll._mix64(np.arange(7, dtype=np.uint64))
        b = hll.sketch_from_hashes(h)
        assert len(b) == 1 + 4 * 7  # tag + one word per set register
        assert hll.estimate(b) == 7

    def test_high_cardinality_sketch_is_dense(self):
        h = hll._mix64(np.arange(100_000, dtype=np.uint64))
        b = hll.sketch_from_hashes(h)
        assert b[0] == 0 and len(b) == 1 + hll.M

    def test_merge_mixed_sparse_dense_legacy(self):
        big = hll._mix64(np.arange(80_000, dtype=np.uint64))
        small = hll._mix64(np.arange(80_000, 80_050, dtype=np.uint64))
        dense = hll.sketch_from_hashes(big)
        sparse = hll.sketch_from_hashes(small)
        legacy = hll._unpack(sparse).tobytes()  # untagged 64 KB format
        assert len(legacy) == hll.M
        est = hll.estimate(hll.merge([dense, sparse, legacy]))
        assert abs(est - 80_050) / 80_050 < 0.02

    def test_pack_unpack_roundtrip_near_threshold(self):
        rng = np.random.default_rng(3)
        for nnz in (0, 1, hll.M // 4 - 1, hll.M // 4, hll.M // 4 + 1, hll.M // 2):
            regs = np.zeros(hll.M, dtype=np.uint8)
            idx = rng.choice(hll.M, size=nnz, replace=False)
            regs[idx] = rng.integers(1, 50, size=nnz, endpoint=False, dtype=np.uint8)
            np.testing.assert_array_equal(hll._unpack(hll._pack(regs)), regs)
