"""Page-index null counts: IS [NOT] NULL chunk/page skip (the PageIndex
null_count analog, reference/src/indexes/index.rs:74-135)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet2_spark.operators import decode_job
from parquet2_spark.operators.encode_job import EncodeConfig, encode


@pytest.fixture(scope="module")
def snap(spark, tmp_path_factory):
    """4 partitions x 5 pages; `y` non-null only for k < 100 (clusters in
    each partition's first page after the k-sort), `s` never null."""
    d = str(tmp_path_factory.mktemp("snap_nulls"))
    df = spark.range(2000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 100, F.col("id") * 2).alias("y"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
    )
    encode(spark, df, d, EncodeConfig(target_rows=500, page_rows=100, sort_by="k",
                                      key="k", host_from_key=False))
    return d


def _run(out):
    rows = out.collect()
    m = out.p2s_decode_metrics
    return rows, m["pages_read"].value, m["pages_skipped"].value


class TestNullPageSkip:
    def test_not_null_skips_all_null_pages(self, spark, snap):
        out = decode_job.decode(spark, snap, columns=["k", "y"], not_null="y")
        rows, read, skipped = _run(out)
        assert len(rows) == 100 and all(r["y"] is not None for r in rows)
        assert sorted(r["k"] for r in rows) == list(range(100))
        # non-null rows cluster in each partition's first page — at most
        # one page read per partition, everything else physically skipped
        assert read <= 4 and skipped > read

    def test_is_null_exact(self, spark, snap):
        out = decode_job.decode(spark, snap, columns=["k", "y"], is_null="y")
        rows, read, skipped = _run(out)
        assert len(rows) == 1900 and all(r["y"] is None for r in rows)

    def test_is_null_on_null_free_column_prunes_everything(self, spark, snap):
        out = decode_job.decode(spark, snap, columns=["k"], is_null="s")
        rows, read, skipped = _run(out)
        assert rows == [] and read == 0

    def test_not_null_on_null_free_column_reads_all(self, spark, snap):
        out = decode_job.decode(spark, snap, columns=["k"], not_null="s")
        rows, read, skipped = _run(out)
        assert len(rows) == 2000 and skipped == 0

    def test_combines_with_key_range(self, spark, snap):
        out = decode_job.decode(
            spark, snap, columns=["k", "y"], not_null="y", key_range=("k", 0, 49)
        )
        rows, read, skipped = _run(out)
        assert sorted(r["k"] for r in rows) == list(range(50))

    def test_unknown_column_raises(self, spark, snap):
        with pytest.raises(KeyError):
            decode_job.decode(spark, snap, columns=["k"], not_null="nope")

    def test_legacy_snapshot_without_page_nulls(self, spark, snap, tmp_path):
        """Chunk files written before the null index existed decode
        correctly (chunk-level null_count prune + residual only)."""
        import os
        import shutil

        import pyarrow.parquet as pq

        legacy = str(tmp_path / "legacy")
        shutil.copytree(snap, legacy)
        cdir = os.path.join(legacy, "chunks")
        for f in os.listdir(cdir):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(cdir, f))
            t = t.drop_columns(["page_nulls"])
            pq.write_table(t, os.path.join(cdir, f), compression="none")
        out = decode_job.decode(spark, legacy, columns=["k", "y"], not_null="y")
        rows, read, skipped = _run(out)
        assert len(rows) == 100 and all(r["y"] is not None for r in rows)
