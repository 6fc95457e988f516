"""Exchange-free ("local merge") range-layout compaction.

Standard compaction routes every ROW through a cluster-wide exchange:
decode job → JVM rows → hash/range shuffle on the bucket → encode UDF.
At 100 TB the exchange IS the job — the payload crosses the network
once and the JVM↔Arrow boundary twice. But when the inputs are already
range-laid-out (``append(range_layout_on=…)`` deltas, or a previous
range compaction being re-compacted with fresh appends), each input
partition overlaps only a handful of output buckets, and compaction is
really a per-bucket merge of a few sorted runs.

This module plans ``bucket ← overlapping input chunk files`` from CHUNK
ZONE MAPS ONLY (stats columns of the chunks parquet — no payload bytes
are read during planning), then runs ONE Arrow task per output bucket
that reads just its overlapping chunk files directly from the store,
merges + sorts them, and hands the merged run to the standard encode
path (``EncodeConfig.prearranged``: the encode job sees rows already
bucket-contiguous and sorted, so it neither exchanges nor re-sorts).
The only shuffle in the whole plan moves METADATA rows (bucket ids +
part ids); the payload never crosses an exchange, never materializes as
JVM rows, and is read at most once per overlapping bucket.

Reference parity: the reference has no table maintenance at all (one
file per writer, reference/src/write/mod.rs) — this is beyond-reference
surface shaped by Iceberg's rewrite_data_files, restricted to
metadata-only planning (no sampling scan, no driver-side file list).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import blob, fsio

# fall back to the shuffle path when the average input file overlaps
# more than this many output buckets: the local plan decodes a file once
# per overlapping bucket, so at high fan-out (un-laid-out inputs whose
# every partition spans the whole key space) the exchange is cheaper
FANOUT_LIMIT = 3.0


def plan(
    spark: SparkSession,
    snaps: list[tuple[int, str]],
    primary: str,
    bounds: list,
    filesystem=None,
) -> DataFrame | None:
    """One row per (bucket, snapshot dir, part_id) overlap, computed from
    chunk zone maps. Returns None when the bounds' type has no exact
    stats column to plan from (decimal keys → shuffle path)."""
    b0 = bounds[0] if bounds else 0
    if isinstance(b0, (bytes, bytearray)):
        sc_min, sc_max = F.col("min_bin"), F.col("max_bin")
        lits = [F.lit(bytes(b)) for b in bounds]
    elif isinstance(b0, (int, np.integer)) and not isinstance(b0, bool):
        sc_min, sc_max = F.col("min_num"), F.col("max_num")
        lits = [F.lit(int(b)) for b in bounds]
    elif isinstance(b0, float):
        sc_min, sc_max = F.col("min_dbl"), F.col("max_dbl")
        lits = [F.lit(float(b)) for b in bounds]
    else:
        return None

    def span(stat):
        # bucket-of-value, EXACTLY the _range_layout expression: the
        # count of split points strictly below the value. NULL stats
        # (all-null chunk, or the primary column absent from an older
        # snapshot) route to bucket 0 — nulls-first layout.
        e = F.lit(0)
        for lt in lits:
            e = e + (stat > lt).cast("int")
        return F.coalesce(e, F.lit(0))

    frames = []
    for _sid, sdir in snaps:
        meta = (
            spark.read.parquet(fsio.join(sdir, "chunks"))
            .select("part_id", "column", "min_bin", "max_bin", "min_num",
                    "max_num", "min_dbl", "max_dbl", "null_count")
        )
        parts = meta.select("part_id").distinct()
        prim = meta.filter(F.col("column") == primary)
        j = (
            parts.join(prim, "part_id", "left")
            .withColumn("b_lo", span(sc_min))
            .withColumn("b_hi", span(sc_max))
        )
        spanned = j.select(
            F.explode(F.sequence(F.col("b_lo"), F.col("b_hi"))).alias("bucket"),
            F.lit(sdir).alias("snap"),
            "part_id",
        )
        # a chunk whose values sit above bucket 0 but which CONTAINS
        # nulls also feeds bucket 0 (zone maps cover non-null values
        # only; null rows are bucket-0 rows)
        null_extra = j.filter(
            (F.coalesce(F.col("null_count"), F.lit(1)) > 0) & (F.col("b_lo") > 0)
        ).select(F.lit(0).alias("bucket"), F.lit(sdir).alias("snap"), "part_id")
        frames.append(spanned.unionByName(null_extra))
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.distinct()


def fanout(plan_df: DataFrame) -> float:
    """Average output buckets per input file — ONE tiny aggregate over
    metadata rows (two scalars to the driver, never a file list)."""
    row = plan_df.agg(
        F.count(F.lit(1)).alias("pairs"),
        F.countDistinct("snap", "part_id").alias("files"),
    ).collect()[0]
    return float(row["pairs"]) / max(1, int(row["files"]))


def source(
    spark: SparkSession,
    plan_df: DataFrame,
    primary: str,
    bounds: list,
    sort_cols: list[str],
    n_parts: int,
    schema_map: dict[str, str],
    columns: list[str],
    filesystem=None,
) -> DataFrame:
    """The merged-run DataFrame: one applyInArrow group per bucket reads
    its overlapping chunk files, filters to the bucket's key range,
    merges + sorts, and emits rows with ``_p2s_bucket`` attached — ready
    for the prearranged encode path."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..schema import spark_type_to_pa

    ddl = ", ".join(f"`{c}` {schema_map[c]}" for c in columns)
    stype = spark.createDataFrame([], ddl).schema
    # Spark's Arrow exchange carries TimestampType as tz-aware UTC
    # regardless of session tz (rendering only) — same rule as decode
    expected_pa = {f.name: spark_type_to_pa(f.dataType, ts_tz="UTC") for f in stype.fields}
    out_schema = ddl + ", `_p2s_bucket` long"
    byte_key = isinstance(bounds[0], (bytes, bytearray)) if bounds else False

    def _cmp_space(arr: "pa.ChunkedArray"):
        # decoded values → the bounds' comparison space: binary for byte
        # prefixes (utf-8 byte order == string order; a prefix cut
        # mid-codepoint is not valid utf-8, so never compare as str),
        # int64 zone units for temporal keys, pass-through otherwise
        if byte_key:
            return arr.cast(pa.binary())
        t = arr.type
        if pa.types.is_timestamp(t):
            return arr.cast(pa.int64())
        if pa.types.is_date32(t):
            return arr.cast(pa.int32()).cast(pa.int64())
        return arr

    def merge_group(tbl: pa.Table) -> pa.Table:
        b = int(tbl.column("bucket")[0].as_py())
        lo = bounds[b - 1] if b > 0 else None
        hi = bounds[b] if b < len(bounds) else None
        runs = []
        for snap, pid in zip(
            tbl.column("snap").to_pylist(), tbl.column("part_id").to_pylist()
        ):
            fs, root = fsio.resolve(snap, filesystem)
            path = fsio.join(root, "chunks", f"part-{int(pid):06d}.parquet")
            ct = pq.read_table(
                path, columns=["column", "payload"], filesystem=fs
            )
            names = ct.column("column").to_pylist()
            payloads = ct.column("payload").to_pylist()
            arrays = {
                name: blob.decode_chunk(p, combine=False)
                for name, p in zip(names, payloads)
            }
            n = len(next(iter(arrays.values()))) if arrays else 0
            cols = []
            for c in columns:
                a = arrays.get(c)
                if a is None:
                    # additive schema evolution: older partition reads
                    # a later-added column as all-null
                    a = pa.nulls(n, expected_pa[c])
                elif not a.type.equals(expected_pa[c]):
                    a = a.cast(expected_pa[c])
                cols.append(a)
            t = pa.table(dict(zip(columns, cols)))
            if lo is not None or hi is not None:
                v = _cmp_space(t.column(primary))
                mask = None
                if lo is not None:
                    mask = pc.greater(v, lo)
                if hi is not None:
                    m2 = pc.less_equal(v, hi)
                    mask = m2 if mask is None else pc.and_kleene(mask, m2)
                # nulls belong to bucket 0 exactly (coalesce(bucket, 0))
                mask = pc.fill_null(mask, b == 0)
                if pc.all(mask).as_py() is not True:
                    t = t.filter(mask)
            if t.num_rows:
                runs.append(t)
        if not runs:
            empty = {c: pa.array([], type=expected_pa[c]) for c in columns}
            empty["_p2s_bucket"] = pa.array([], type=pa.int64())
            return pa.table(empty)
        merged = pa.concat_tables(runs, promote_options="none")
        keys = [c for c in sort_cols if c in merged.schema.names]
        if keys:
            idx = pc.sort_indices(
                merged,
                sort_keys=[(c, "ascending") for c in keys],
                null_placement="at_end",
            )
            merged = merged.take(idx)
        return merged.append_column(
            "_p2s_bucket",
            pa.array(np.full(merged.num_rows, b, dtype=np.int64)),
        )

    return plan_df.groupBy("bucket").applyInArrow(merge_group, out_schema)
