"""Validation queries: decoded-vs-source bit-identity and size-vs-reference.

North-star contract: byte-identical extracted ``text`` per ``url`` after
encode→decode (every column bit-identical), at total compressed size ≤ the
pyarrow/parquet reference output on the same table. The reference crate
validates itself against pyarrow-written files the same way (SURVEY §5.3).
"""

from __future__ import annotations

import os
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import decode_job


def compare_frames(source: DataFrame, decoded: DataFrame, key: str = "url") -> dict:
    """Full outer join on ``key``; counts rows where any column differs
    bit-for-bit (null-safe equality)."""
    cols = [c for c in source.columns if c != key]
    s = source.select([F.col(key).alias("_k")] + [F.col(c).alias(f"s_{c}") for c in cols])
    d = decoded.select([F.col(key).alias("_k")] + [F.col(c).alias(f"d_{c}") for c in cols])
    j = s.join(d, "_k", "full_outer")
    mismatch = None
    for c in cols:
        ne = ~F.col(f"s_{c}").eqNullSafe(F.col(f"d_{c}"))
        mismatch = ne if mismatch is None else (mismatch | ne)
    agg = j.agg(
        F.count("*").alias("joined"),
        F.sum(F.when(mismatch, 1).otherwise(0)).alias("mismatched"),
    ).collect()[0]
    src_n = source.count()
    dec_n = decoded.count()
    return {
        "source_rows": src_n,
        "decoded_rows": dec_n,
        "joined_rows": agg["joined"],
        "mismatched_rows": int(agg["mismatched"] or 0),
        "bit_identical": bool(
            src_n == dec_n == agg["joined"] and int(agg["mismatched"] or 0) == 0
        ),
    }


def digest_frames(source: DataFrame, decoded: DataFrame) -> dict:
    """Join-free bit-identity check — the 100 TB path.

    One scan per side, no shuffle of row data: each row folds to a 64-bit
    xxhash64 over all columns (sorted by name), and the multiset of row
    hashes is summarized by (count, bit_xor, overflow-safe decimal sum).
    Equal digests ⇒ equal row multisets up to hash collision (~2^-64 per
    colliding pair); with unique keys that is per-key bit-identity. The
    full-outer-join compare_frames stays as the forensic tool that can
    *name* the mismatching rows."""

    def _contains_map(dt) -> bool:
        from pyspark.sql import types as T

        if isinstance(dt, T.MapType):
            return True
        if isinstance(dt, T.ArrayType):
            return _contains_map(dt.elementType)
        if isinstance(dt, T.StructType):
            return any(_contains_map(f.dataType) for f in dt.fields)
        return False

    def digest(df: DataFrame) -> dict:
        # xxhash64 rejects MapType anywhere in a column's type — fold such
        # columns through to_json first (entry order is preserved by the
        # decode path, so source and decoded serialize identically)
        exprs = [
            F.to_json(F.col(c)) if _contains_map(df.schema[c].dataType) else F.col(c)
            for c in sorted(df.columns)
        ]
        h = F.xxhash64(*exprs)
        row = (
            df.select(h.alias("_h"))
            .agg(
                F.count("*").alias("n"),
                F.expr("bit_xor(_h)").alias("hxor"),
                F.sum(F.col("_h").cast("decimal(38,0)")).alias("hsum"),
            )
            .collect()[0]
        )
        return {
            "n": int(row["n"]),
            "hxor": int(row["hxor"]) if row["hxor"] is not None else 0,
            "hsum": int(row["hsum"]) if row["hsum"] is not None else 0,
        }

    # the two digests are independent single-scan jobs — run them
    # CONCURRENTLY from driver threads (guide §2.6): the source scan's
    # tail backfills with the decode's tasks, so the wall is
    # max(side walls), not their sum (r6; measured ~25% off
    # validate_web at sf0.1)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_a = pool.submit(digest, source)
        b = digest(decoded)
        a = f_a.result()
    return {
        "source": a,
        "decoded": b,
        "bit_identical": a == b,
    }


def pyarrow_reference_size(source: DataFrame, path: str) -> int:
    """Write the same table with pyarrow's parquet writer (dictionary on,
    snappy — the reference oracle config) and return its data size."""
    import pyarrow.parquet as pq

    tbl = source.toArrow() if hasattr(source, "toArrow") else None
    if tbl is None:
        import pyarrow as pa

        tbl = pa.Table.from_pandas(source.toPandas())
    pq.write_table(tbl, path, compression="snappy", use_dictionary=True)
    return os.path.getsize(path)


def validate(
    spark: SparkSession,
    source: DataFrame,
    snapshot_dir: str,
    key: str = "url",
    reference_parquet: str | None = None,
) -> dict:
    decoded = decode_job.decode(spark, snapshot_dir)
    report = compare_frames(source, decoded, key)
    lin = decode_job.lineage(snapshot_dir)
    report["enc_bytes"] = lin["enc_bytes"]
    report["raw_bytes"] = lin["raw_bytes"]
    if reference_parquet:
        ref = pyarrow_reference_size(source, reference_parquet)
        report["reference_parquet_bytes"] = ref
        report["size_ratio_vs_reference"] = lin["enc_bytes"] / ref if ref else None
        report["beats_reference"] = lin["enc_bytes"] <= ref
    return report
