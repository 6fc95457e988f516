"""Sticky layout bounds.

Re-deriving range-layout split points from the table's grids at every
maintenance pass drifts them by slivers as data arrives, which makes
previously-laid partitions straddle the new boundaries and re-read under
the fused compaction plan. The sticky design: each layout rewrite
persists the split points it USED (``_layout.json`` next to the
snapshot, O(1) metadata); the next rewrite REUSES them while the table's
size keeps partitions near ``target_rows``; appended deltas SNAP their
split points to a subset of the stored boundaries so delta partitions
cover whole stored buckets. These tests pin reuse, alignment, the
growth-triggered refresh, and carry-over through binpack compaction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet2_spark.operators import decode_job, table, validate
from parquet2_spark.operators.encode_job import EncodeConfig

HOSTS = ["alpha", "beta", "delta", "epsilon", "gamma", "kappa", "theta", "zeta"]


def _corpus(spark, n, voff=0):
    hs = F.array(*[F.lit(h) for h in HOSTS])
    return spark.range(n).select(
        F.concat(F.lit("https://www."),
                 F.element_at(hs, (F.col("id") % 8 + 1).cast("int")),
                 F.lit(".example.com/p/"),
                 F.format_string("%06d", F.col("id") + voff)).alias("url"),
        (F.col("id") + voff).alias("v"))


def _cfg(**kw):
    base = dict(target_rows=1000, page_rows=250, sort_by="url", key="v",
                host_from_key=False)
    base.update(kw)
    return EncodeConfig(**base)


def test_bounds_json_roundtrip():
    j = table._bounds_to_json
    f = table._bounds_from_json
    assert f(j([b"ab", b"zz\xff"])) == [b"ab", b"zz\xff"]
    big = 2**60 + 3  # exact past 2^53 — JSON ints are arbitrary precision
    assert f(j([1, big])) == [1, big]
    assert f(j([1.5, -2.25])) == [1.5, -2.25]
    assert f(j([])) == []


class TestStickyBounds:
    def test_reuse_and_aligned_append(self, spark, tmp_path):
        td = str(tmp_path / "t")
        cfg = _cfg()
        for i in range(3):
            table.append(spark, _corpus(spark, 2000, voff=2000 * i), td,
                         cfg, range_layout_on="url")
        lin1 = table.compact(spark, td, cfg, range_layout_on="url")
        assert lin1["layout_bounds_reused"] is False
        doc1 = table._stored_layout(td, cfg, "url")
        assert doc1 is not None and doc1["n_parts"] == 6
        stored = table._bounds_from_json(doc1["bounds"])

        # a 2000-row delta snaps to every 3rd stored boundary (needed=2,
        # k=ceil(6/2)=3) — a strict subset, never splitting a bucket
        aligned = table._aligned_append_bounds(td, cfg, "url", 2000)
        assert aligned == stored[2::3] and len(aligned) == 1
        assert set(aligned) <= set(stored)

        # grow within the reuse window (6000+1000 → needed 7 ≤ ceil-less
        # int(6*1.25)=7) and re-compact: split points must NOT drift
        table.append(spark, _corpus(spark, 1000, voff=6000), td, cfg,
                     range_layout_on="url")
        lin2 = table.compact(spark, td, cfg, range_layout_on="url")
        assert lin2["layout_bounds_reused"] is True
        doc2 = table._stored_layout(td, cfg, "url")
        assert table._bounds_from_json(doc2["bounds"]) == stored

        rep = validate.digest_frames(
            _corpus(spark, 7000), decode_job.decode(spark, td))
        assert rep["bit_identical"], rep

    def test_refresh_on_growth(self, spark, tmp_path):
        td = str(tmp_path / "t")
        cfg = _cfg()
        table.append(spark, _corpus(spark, 6000), td, cfg,
                     range_layout_on="url")
        lin1 = table.compact(spark, td, cfg, range_layout_on="url")
        assert lin1["layout_bounds_reused"] is False
        # triple the table: needed=18 blows the [0.6, 1.25]x window of
        # the stored 6 — bounds re-derive fresh and re-equalize
        table.append(spark, _corpus(spark, 12000, voff=6000), td, cfg,
                     range_layout_on="url")
        lin2 = table.compact(spark, td, cfg, range_layout_on="url")
        assert lin2["layout_bounds_reused"] is False
        doc = table._stored_layout(td, cfg, "url")
        assert doc["n_parts"] == 18

    def test_delta_outgrowing_stored_layout_uses_fresh_bounds(
            self, spark, tmp_path):
        td = str(tmp_path / "t")
        cfg = _cfg()
        table.append(spark, _corpus(spark, 6000), td, cfg,
                     range_layout_on="url")
        table.compact(spark, td, cfg, range_layout_on="url")
        # needed(7000)=7 > stored 6: alignment cannot split buckets
        assert table._aligned_append_bounds(td, cfg, "url", 7000) is None
        # needed == stored: all stored boundaries, verbatim
        doc = table._stored_layout(td, cfg, "url")
        assert (table._aligned_append_bounds(td, cfg, "url", 6000)
                == table._bounds_from_json(doc["bounds"]))

    def test_binpack_carries_sidecar_forward(self, spark, tmp_path):
        td = str(tmp_path / "t")
        cfg = _cfg()
        table.append(spark, _corpus(spark, 6000), td, cfg,
                     range_layout_on="url")
        table.compact(spark, td, cfg, range_layout_on="url")
        stored = table._bounds_from_json(
            table._stored_layout(td, cfg, "url")["bounds"])
        # plain binpack compaction copies every in-window partition
        # verbatim — the physical layout survives, so must the sidecar
        lin = table.compact(spark, td, cfg)
        assert lin["compaction_path"] == "binpack"
        doc = table._newest_layout_doc(td, cfg)
        assert doc is not None and doc["column"] == "url"
        assert table._bounds_from_json(doc["bounds"]) == stored
        # and the next re-layout reuses them
        lin2 = table.compact(spark, td, cfg, range_layout_on="url")
        assert lin2["layout_bounds_reused"] is True

    def test_incremental_relayout_keeps_untouched_buckets(self, spark, tmp_path):
        """The payoff of sticky bounds: re-compacting after a LOCALIZED
        delta copies every bucket the delta didn't touch VERBATIM (no
        decode) and merges only where delta rows landed."""
        import json
        import os

        td = str(tmp_path / "t")
        cfg = _cfg()
        table.append(spark, _corpus(spark, 6000), td, cfg,
                     range_layout_on="url")
        table.compact(spark, td, cfg, range_layout_on="url")  # 6 buckets

        # a delta entirely ABOVE the last boundary (hosts sort after
        # zeta): only the last bucket receives rows
        delta = spark.range(500).select(
            F.concat(F.lit("https://www.zzz.example.com/p/"),
                     F.format_string("%06d", F.col("id"))).alias("url"),
            (F.col("id") + 10_000_000).alias("v"))
        table.append(spark, delta, td, cfg, range_layout_on="url")

        lin = table.compact(spark, td, cfg, range_layout_on="url")
        assert lin["compaction_path"] == "local_merge"
        assert lin["layout_bounds_reused"] is True
        assert lin["layout_kept"] == 5, lin
        # the commit markers prove which buckets were copied vs merged
        man = table.read_manifest(td)
        snap = os.path.join(td, man["snapshots"][0]["dir"])
        copied = sorted(
            int(json.load(open(os.path.join(snap, "_commits", f)))["part_id"])
            for f in os.listdir(os.path.join(snap, "_commits"))
            if "layout_copied_from" in json.load(
                open(os.path.join(snap, "_commits", f)))
        )
        assert copied == [0, 1, 2, 3, 4]
        src = _corpus(spark, 6000).unionByName(delta)
        rep = validate.digest_frames(src, decode_job.decode(spark, td))
        assert rep["bit_identical"], rep
        # disjoint spans still hold across copied + merged buckets
        ch = decode_job.chunks_df(spark, td).filter(F.col("column") == "url")
        spans = sorted((r["min_bin"], r["max_bin"]) for r in ch.collect())
        assert len(spans) == 6
        for (_, ahi), (blo, _) in zip(spans, spans[1:]):
            assert ahi < blo

    def test_full_span_delta_merges_everything(self, spark, tmp_path):
        """A delta spread over the whole key range leaves no bucket
        untouched: layout_kept == 0 and every bucket merges — result
        still exact."""
        td = str(tmp_path / "t")
        cfg = _cfg()
        table.append(spark, _corpus(spark, 6000), td, cfg,
                     range_layout_on="url")
        table.compact(spark, td, cfg, range_layout_on="url")
        table.append(spark, _corpus(spark, 900, voff=6000), td, cfg,
                     range_layout_on="url")
        lin = table.compact(spark, td, cfg, range_layout_on="url")
        assert lin["layout_bounds_reused"] is True
        assert lin["compaction_path"] == "local_merge"
        assert lin["layout_kept"] == 0
        rep = validate.digest_frames(
            _corpus(spark, 6900), decode_job.decode(spark, td))
        assert rep["bit_identical"], rep

    def test_hot_bucket_forces_refresh_inside_size_window(
            self, spark, tmp_path):
        """The size window alone would reuse (needed 20 ≤ 1.25×16), but
        the whole +25% growth landed in ONE bucket — the grid audit
        sees the 2500-row bucket (4× the 625 mean) over
        LAYOUT_REBALANCE_LIMIT and re-derives fresh bounds."""
        td = str(tmp_path / "t")
        cfg = _cfg(target_rows=500)
        table.append(spark, _corpus(spark, 8000), td, cfg,
                     range_layout_on="v")
        table.compact(spark, td, cfg, range_layout_on="v")
        assert table._stored_layout(td, cfg, "v")["n_parts"] == 16
        table.append(spark, _corpus(spark, 2000, voff=8000), td, cfg,
                     range_layout_on="v")
        lin = table.compact(spark, td, cfg, range_layout_on="v")
        assert lin["layout_bounds_reused"] is False
        assert table._stored_layout(td, cfg, "v")["n_parts"] == 20

    def test_low_skew_delta_reuses_inside_size_window(self, spark, tmp_path):
        """Same growth, spread over several buckets: audit passes,
        bounds stay sticky."""
        td = str(tmp_path / "t")
        cfg = _cfg(target_rows=500)
        table.append(spark, _corpus(spark, 8000), td, cfg,
                     range_layout_on="v")
        table.compact(spark, td, cfg, range_layout_on="v")
        table.append(spark, _corpus(spark, 2000), td, cfg,
                     range_layout_on="v")  # keys 0..1999: four buckets
        lin = table.compact(spark, td, cfg, range_layout_on="v")
        assert lin["layout_bounds_reused"] is True

    def test_newer_layout_on_other_column_supersedes(self, spark, tmp_path):
        td = str(tmp_path / "t")
        cfg = _cfg()
        table.append(spark, _corpus(spark, 6000), td, cfg,
                     range_layout_on="url")
        table.compact(spark, td, cfg, range_layout_on="url")
        table.compact(spark, td, cfg, range_layout_on="v")
        # the operative layout is now on v — url bounds are stale
        assert table._stored_layout(td, cfg, "url") is None
        assert table._stored_layout(td, cfg, "v") is not None
