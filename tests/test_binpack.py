"""Bin-pack compaction: keep well-sized partitions verbatim, re-encode
only the tail (operators/binpack.py — Iceberg rewrite_data_files
binpack shape over our chunk-file layout).

Pins: (1) routing — plain compact() defaults to binpack, binpack=False
forces the full shuffle re-encode, range_layout_on bypasses it; (2)
correctness — decode before == after, keepers carry their stats so
point lookups still prune; (3) the Iceberg size window — undersized AND
oversized partitions are re-encoded, in-window ones kept; (4) schema
evolution — narrow (pre-evolution) snapshots never donate keepers; (5)
resume — re-running against the same staged snapshot dir copies nothing
twice and converges to the same file set.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from parquet2_spark.operators import decode_job, table
from parquet2_spark.operators.binpack import binpack_compact
from parquet2_spark.operators.encode_job import EncodeConfig


def _corpus(spark, n, voff=0):
    return spark.range(n).select(
        F.format_string(
            "https://www.h%02d.example.com/p/%06d",
            (F.col("id") % 8).cast("int"), F.col("id") + voff,
        ).alias("url"),
        (F.col("id") + voff).alias("v"),
    )


def _cfg(**kw):
    base = dict(target_rows=1000, page_rows=250, sort_by="url", key="v",
                host_from_key=False)
    base.update(kw)
    return EncodeConfig(**base)


class TestBinpackCompaction:
    def test_keeps_well_sized_reencodes_tail(self, spark, tmp_path):
        td = str(tmp_path / "t")
        table.append(spark, _corpus(spark, 4000), td, _cfg())
        table.append(spark, _corpus(spark, 300, voff=4000), td, _cfg())
        table.append(spark, _corpus(spark, 250, voff=4300), td, _cfg())
        before = sorted(decode_job.decode(spark, td).collect())

        lin = table.compact(spark, td, _cfg())
        assert lin["compaction_path"] == "binpack"
        assert lin["binpack_kept"] == 4  # the 4 target-size partitions
        assert lin["rows"] == 4550
        assert sorted(decode_job.decode(spark, td).collect()) == before

        # keeper stats rode along verbatim: a point lookup still prunes
        # to one partition's pages
        hit = decode_job.decode(spark, td, key_eq=("v", 1234)).collect()
        assert len(hit) == 1 and hit[0]["v"] == 1234

    def test_binpack_false_forces_full_reencode(self, spark, tmp_path):
        td = str(tmp_path / "t")
        table.append(spark, _corpus(spark, 2000), td, _cfg())
        table.append(spark, _corpus(spark, 500, voff=2000), td, _cfg())
        lin = table.compact(spark, td, _cfg(), binpack=False)
        assert lin["compaction_path"] == "shuffle"
        assert decode_job.decode(spark, td).count() == 2500

    def test_oversized_partitions_reencoded(self, spark, tmp_path):
        """Compacting with a SMALLER target re-splits old large
        partitions (above 1.8x the new target) instead of keeping them."""
        td = str(tmp_path / "t")
        table.append(spark, _corpus(spark, 3000), td, _cfg(target_rows=1000))
        lin = table.compact(spark, td, _cfg(target_rows=300))
        assert lin["compaction_path"] == "binpack"
        assert lin["binpack_kept"] == 0  # 1000-row parts > 1.8 * 300
        assert decode_job.decode(spark, td).count() == 3000
        # and the rewrite actually resized: no partition above the window
        man = table.read_manifest(td)
        sdir = os.path.join(td, man["snapshots"][0]["dir"])
        meta = (
            decode_job.chunks_df(spark, sdir)
            .filter(F.col("column") == "url")
            .agg(F.max("n_rows").alias("mx"))
            .collect()[0]
        )
        assert meta["mx"] <= 300 * 1.8

    def test_narrow_snapshot_never_donates_keepers(self, spark, tmp_path):
        td = str(tmp_path / "t")
        table.append(spark, _corpus(spark, 2000), td, _cfg())
        wide = _corpus(spark, 2000, voff=2000).withColumn("lang", F.lit("en"))
        table.append(spark, wide, td, _cfg())
        lin = table.compact(spark, td, _cfg())
        assert lin["compaction_path"] == "binpack"
        assert 1 <= lin["binpack_kept"] <= 2  # wide snapshot only
        post = decode_job.decode(spark, td)
        assert set(post.columns) == {"url", "v", "lang"}
        rows = post.collect()
        assert len(rows) == 4000
        assert sum(1 for r in rows if r["lang"] is None) == 2000

    def test_idempotent_compact_is_pure_copy(self, spark, tmp_path):
        """Second compaction of an already-compacted table keeps every
        partition — zero re-encode work."""
        td = str(tmp_path / "t")
        table.append(spark, _corpus(spark, 3000), td, _cfg())
        table.compact(spark, td, _cfg())
        lin2 = table.compact(spark, td, _cfg())
        assert lin2["compaction_path"] == "binpack"
        assert lin2["binpack_kept"] == 3
        assert lin2["n_partitions_planned"] == 3  # k=0 tail + 3 keepers
        assert decode_job.decode(spark, td).count() == 3000

    def test_retry_converges_without_duplicates(self, spark, tmp_path):
        """A retry against the same staged snapshot (crash before the
        manifest swap) skips every committed keeper and re-finalizes to
        the identical file set."""
        td = str(tmp_path / "t")
        table.append(spark, _corpus(spark, 2000), td, _cfg())
        table.append(spark, _corpus(spark, 400, voff=2000), td, _cfg())
        snap = str(tmp_path / "staged-snap")
        cfg = _cfg()
        lin1 = binpack_compact(spark, td, cfg, snap)
        files1 = sorted(os.listdir(os.path.join(snap, "chunks")))
        lin2 = binpack_compact(spark, td, cfg, snap)  # simulated retry
        files2 = sorted(os.listdir(os.path.join(snap, "chunks")))
        assert files1 == files2
        assert lin1["binpack_kept"] == lin2["binpack_kept"] == 2
        assert lin1["rows"] == lin2["rows"] == 2400
        got = sorted(
            r["v"] for r in decode_job.decode(spark, snap).select("v").collect()
        )
        assert got == list(range(2400))
