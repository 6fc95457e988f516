"""Stats queries as first-class operators: per-bucket chunk statistics
computed with the engine's own stats kernel (partial per batch → reduced),
and bloom-filter membership over a key column.

Parity: the reference's `parquet-tools meta`/column-index surface
(SURVEY §2.C/§2.E) exposed as DataFrame queries.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import stats as stats_mod
from ..plans import bloom


def bucket_stats(df: DataFrame, bucket_expr, value_col: str, out_type: str) -> DataFrame:
    """min/max/null-count/rows of ``value_col`` per bucket, computed with
    the engine's per-batch stats kernel as mapInArrow PARTIALS, then a
    map-side-combinable Catalyst aggregation as the final reduce (≙ page
    stats → chunk stats, reference src/write/statistics.rs).

    Scale shape: no bucket is ever materialized as one in-memory frame —
    each Arrow batch contributes one tiny partial row per bucket it
    touches, and the final min/max/sum reduce is an ordinary shuffle of
    those partial rows (a hot bucket costs rows ∝ #batches, not ∝ data)."""
    src = df.select(bucket_expr.cast("long").alias("bucket"), F.col(value_col).alias("v"))

    partial_ddl = (
        f"bucket long, n_rows long, null_count long, min_v {out_type}, max_v {out_type}"
    )
    from ..schema import spark_type_to_pa

    fields = src.sparkSession.createDataFrame([], partial_ddl).schema.fields
    pa_schema = pa.schema(
        [(f.name, spark_type_to_pa(f.dataType, ts_tz="UTC")) for f in fields]
    )
    val_t = pa_schema.field("min_v").type

    def partials(batches):
        for rb in batches:
            if rb.num_rows == 0:
                continue
            import pyarrow.compute as pc

            # nulls sort to the end (pc.sort_indices default) and form
            # their own bucket group — a float64 round-trip of a nullable
            # int column would NaN-poison the run detection AND crash
            # int() on the null rows
            order = pc.sort_indices(rb.column(0))
            bcol = rb.column(0).take(order)
            vals = rb.column(1).take(order)
            nn = len(bcol) - bcol.null_count
            buckets = (
                bcol.slice(0, nn).to_numpy(zero_copy_only=False).astype(np.int64)
                if nn
                else np.zeros(0, dtype=np.int64)
            )
            # bucket run boundaries inside the sorted non-null region
            cuts = np.flatnonzero(buckets[1:] != buckets[:-1]) + 1
            starts = np.concatenate(([0], cuts)) if nn else np.zeros(0, dtype=np.int64)
            stops = np.concatenate((cuts, [nn])) if nn else np.zeros(0, dtype=np.int64)
            out = {"bucket": [], "n_rows": [], "null_count": [], "min_v": [], "max_v": []}
            spans = list(zip(starts, stops))
            if bcol.null_count:
                spans.append((nn, len(bcol)))
            for s, e in spans:
                st = stats_mod.compute(vals.slice(s, e - s), full=False)
                mn, mx = st.min, st.max
                if isinstance(mn, bytes):
                    mn = mn.decode("utf-8", "replace")
                if isinstance(mx, bytes):
                    mx = mx.decode("utf-8", "replace")
                out["bucket"].append(int(buckets[s]) if s < nn else None)
                out["n_rows"].append(st.n)
                out["null_count"].append(st.null_count)
                out["min_v"].append(mn)
                out["max_v"].append(mx)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out["bucket"], type=pa.int64()),
                    pa.array(out["n_rows"], type=pa.int64()),
                    pa.array(out["null_count"], type=pa.int64()),
                    pa.array(out["min_v"], type=val_t),
                    pa.array(out["max_v"], type=val_t),
                ],
                names=["bucket", "n_rows", "null_count", "min_v", "max_v"],
            )

    return (
        src.mapInArrow(partials, partial_ddl)
        .groupBy("bucket")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("null_count").alias("null_count"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )


def bloom_build(df: DataFrame, key_col: str, n_blocks: int, fanin: int = 16) -> bytes:
    """One bitset for the whole frame: per-partition partial bitsets
    (vectorized build over Spark-computed xxhash64), OR-merged in a tree —
    an executor-side reduce level first (≤ ``fanin`` partials reach the
    driver), so a wide job with big bitsets (ndv≈1e9 → ~1 GB partials)
    never funnels every partial through the driver."""
    hashed = df.select(F.xxhash64(F.col(key_col)).cast("long").alias("h"))

    def partial(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        hs = [rb.column(0).to_numpy(zero_copy_only=False) for rb in batches]
        h = np.concatenate(hs).astype(np.int64).view(np.uint64) if hs else np.zeros(0, np.uint64)
        bs = bloom.build(h, n_blocks=n_blocks)
        yield pa.RecordBatch.from_arrays([pa.array([bs], type=pa.binary())], names=["bitset"])

    def or_merge(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        acc = np.zeros(n_blocks * 8, dtype=np.uint32)
        for rb in batches:
            for bs in rb.column(0):
                acc |= np.frombuffer(bs.as_py(), dtype=np.uint32)
        yield pa.RecordBatch.from_arrays(
            [pa.array([acc.tobytes()], type=pa.binary())], names=["bitset"]
        )

    partials = hashed.mapInArrow(partial, "bitset binary")
    n_parts = df.rdd.getNumPartitions()
    if n_parts > fanin:
        partials = partials.repartition(fanin).mapInArrow(or_merge, "bitset binary")
    parts = partials.collect()
    merged = np.zeros(n_blocks * 8, dtype=np.uint32)
    for row in parts:
        merged |= np.frombuffer(row["bitset"], dtype=np.uint32)
    return merged.tobytes()


def bloom_probe(spark: SparkSession, probes: DataFrame, key_col: str, bitset: bytes) -> DataFrame:
    """(key, might_contain) per probe row; broadcast bitset, vectorized."""
    sc = spark.sparkContext
    bc = sc.broadcast(bitset)
    hashed = probes.select(F.col(key_col), F.xxhash64(F.col(key_col)).cast("long").alias("_h"))

    @F.pandas_udf("boolean")
    def check(h: pd.Series) -> pd.Series:
        hs = h.to_numpy(dtype=np.int64).view(np.uint64)
        return pd.Series(bloom.might_contain(bc.value, hs))

    return hashed.select(key_col, check(F.col("_h")).alias("might_contain"))
