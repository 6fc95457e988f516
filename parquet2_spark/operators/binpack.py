"""Bin-pack compaction: rewrite only the partitions that need it.

Plain ``compact()`` decodes EVERY row of EVERY snapshot and re-encodes
the lot — correct, but at 100 TB it pays full decode + full encode for
data that is already perfectly laid out: a table built from large
appends consists mostly of partitions the encode job already sized at
``cfg.target_rows`` with full codec selection. Re-encoding those
reproduces the same bytes at ~100 MB/s/core; copying them moves at
disk/network speed.

This module implements Iceberg's ``rewrite_data_files`` *binpack*
strategy for our chunk-file layout:

- **keepers** — partitions whose row count lies in
  ``[min_frac, max_frac] × target_rows`` (and whose snapshot carries the
  table's full column set) are carried over VERBATIM: each task reads
  the partition's self-contained chunk parquet, patches its embedded
  ``part_id`` to the new numbering, and writes it into the new snapshot.
  Payload bytes are never decoded; zone maps, page indexes, blooms,
  NDV sketches and quantile grids ride along unchanged, so reads of the
  compacted table prune exactly as before.
- **the tail** — undersized partitions (the small appends compaction
  exists to absorb), oversized ones (a later, smaller ``target_rows``),
  and every partition of a narrow-schema snapshot (pre-evolution; its
  chunk files lack the new columns) are decoded and re-encoded through
  the normal encode job, which merges them into fresh target-size
  partitions 0..k-1. Keepers are then numbered k..k+m-1.

Everything is planned from the chunks parquet's METADATA columns —
per-partition row counts, snapshot ids — entirely Spark-side: the
driver never materializes a partition list (the keeper→new-id mapping
is a per-snapshot window over metadata rows with O(#snapshots) offsets
collected, and the small-partition selection reaches decode() as a
pushed-down per-snapshot predicate on the chunk scan — keeper payload
bytes are never read). Both halves are resumable: the encode job skips
committed partitions via its ``_commits`` markers, and the copy task
skips keeper ids whose marker exists, so a crashed compaction retried
under the same ``compact:`` staging key finishes exactly once.

Reference parity: the reference has no table maintenance (one file per
writer, reference/src/write/mod.rs); shape follows Iceberg's binpack
file-rewrite thresholds (rewrite below 75% / above 180% of target).
"""

from __future__ import annotations

import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import fsio
from .encode_job import CHUNK_SCHEMA, EncodeConfig, commit_metrics_action, encode

# Iceberg rewrite_data_files defaults: files between MIN_FRAC and
# MAX_FRAC of the target size are left untouched
MIN_FRAC = 0.75
MAX_FRAC = 1.8

# slim metric-row columns (CHUNK_SCHEMA order, minus wall_s which the
# copy task appends)
_METRIC_COLS = [
    "part_id", "column", "type_code", "n_rows", "null_count", "n_pages",
    "codecs", "outers", "raw_bytes", "enc_bytes", "min_bin", "max_bin",
    "min_num", "max_num", "min_dbl", "max_dbl", "ndv", "page_rows",
]
_METRIC_TYPES = {
    "part_id": pa.int64(), "column": pa.string(), "type_code": pa.int32(),
    "n_rows": pa.int64(), "null_count": pa.int64(), "n_pages": pa.int32(),
    "codecs": pa.string(), "outers": pa.string(), "raw_bytes": pa.int64(),
    "enc_bytes": pa.int64(), "min_bin": pa.binary(), "max_bin": pa.binary(),
    "min_num": pa.int64(), "max_num": pa.int64(), "min_dbl": pa.float64(),
    "max_dbl": pa.float64(), "ndv": pa.int64(), "page_rows": pa.string(),
}


def metric_batch_schema() -> pa.Schema:
    """Arrow schema of the slim metric rows a verbatim-copy task emits
    (CHUNK_SCHEMA column order)."""
    return pa.schema(
        [pa.field(c, _METRIC_TYPES[c]) for c in _METRIC_COLS]
        + [pa.field("wall_s", pa.float64())]
    )


def copy_chunk_file(
    fs,
    chunks_dir: str,
    commits_dir: str,
    tmp_dir: str,
    src_fs,
    src_path: str,
    npid: int,
    marker_extra: dict,
    out_schema: pa.Schema,
) -> pa.RecordBatch | None:
    """Carry one partition's chunk parquet into the new snapshot as a
    BYTE-VERBATIM copy and record the commit marker. Part identity
    lives in the FILENAME — every reader derives ``part_id`` from it
    (``decode_job.chunks_df``), so the embedded column's old value is
    dead weight and the file needs NO rewrite: locally the copy streams
    at IO speed with no parquet parse; on an object store the
    ``fsio.copy_file_atomic`` hook becomes a server-side copy moving
    zero bytes through the worker. Metric rows come from a
    column-projected read of the slim stat columns (payload chunks are
    never fetched), with ``part_id`` patched to ``npid`` in the METRIC
    stream only. Returns the metric record batch, or None when the
    marker already exists (resume). Shared by binpack compaction and
    the incremental re-layout keeper path (merge_compact)."""
    tw0 = time.time()
    marker_path = fsio.join(commits_dir, f"{npid}.json")
    if fsio.exists(fs, marker_path):
        return None  # resume: this keeper already carried over
    with src_fs.open_input_file(src_path) as f:
        pf = pq.ParquetFile(f)
        present = [c for c in _METRIC_COLS if c in pf.schema_arrow.names]
        mt = pf.read(columns=present)
    n = mt.num_rows
    final = fsio.join(chunks_dir, f"part-{npid:06d}.parquet")
    fsio.copy_file_atomic(src_fs, src_path, fs, final, tmp_dir=tmp_dir)
    wall = time.time() - tw0
    rows_n = 0
    arrs = []
    for c in _METRIC_COLS:
        if c == "part_id":
            arr = pa.array([npid] * n, pa.int64())
        elif c in mt.schema.names:
            arr = mt.column(c).combine_chunks().cast(_METRIC_TYPES[c])
        else:  # chunk file from before this stat column existed
            arr = pa.nulls(n, _METRIC_TYPES[c])
        if c == "n_rows":
            rows_n = int(pc.max(arr).as_py() or 0)
        arrs.append(arr)
    arrs.append(pa.array([wall] * n, pa.float64()))
    fsio.write_json_atomic(
        fs,
        marker_path,
        {
            "part_id": int(npid),
            "file": f"part-{npid:06d}.parquet",
            "rows": rows_n,
            "wall_s": wall,
            **marker_extra,
        },
    )
    return pa.record_batch(arrs, schema=out_schema)


def binpack_compact(
    spark: SparkSession,
    table_dir: str,
    cfg: EncodeConfig,
    snap_dir: str,
    min_frac: float = MIN_FRAC,
    max_frac: float = MAX_FRAC,
) -> dict:
    """Compact ``table_dir`` into ``snap_dir`` keeping well-sized
    partitions verbatim. Returns the finalized lineage dict (same
    contract as ``encode_job.encode``), with ``binpack_kept`` /
    ``binpack_reencoded_rows`` telemetry added by the caller."""
    from . import decode_job
    from . import table as table_mod

    t0 = time.time()
    lo_rows = max(1, int(cfg.target_rows * min_frac))
    hi_rows = max(lo_rows, int(cfg.target_rows * max_frac))

    # snapshots eligible to donate keepers: their column set must equal
    # the table's union schema — a narrow (pre-evolution) snapshot's
    # chunk files lack the later columns, and a verbatim copy would
    # plant a partition with missing column chunks in the new snapshot.
    # O(#snapshots) driver work, metadata JSON only.
    union_cols = decode_job.lineage(table_dir, filesystem=cfg.filesystem)["columns"]
    eligible_sids = []
    for sid, sdir in table_mod.snapshot_dirs(table_dir, filesystem=cfg.filesystem):
        lin_s = decode_job.lineage(sdir, filesystem=cfg.filesystem)
        if set(lin_s["columns"]) == set(union_cols):
            eligible_sids.append(sid)

    designated = union_cols[0]
    meta = (
        decode_job.chunks_df(spark, table_dir, filesystem=cfg.filesystem)
        .filter(F.col("column") == designated)
        .select("part_id", "n_rows")
    )
    sid_col = F.shiftrightunsigned(F.col("part_id"), table_mod.SNAP_SHIFT)
    in_window = (F.col("n_rows") >= lo_rows) & (F.col("n_rows") <= hi_rows)
    keep_cond = in_window & sid_col.isin([int(s) for s in eligible_sids])
    keepers = meta.filter(keep_cond).withColumn("sid", sid_col)

    # one metadata aggregation for the whole census: per-snapshot
    # partition totals + in-window counts (eligibility applied driver-
    # side — sid is the group key). O(#snapshots) rows through the
    # driver, never O(#partitions), and a single Spark job.
    census = (
        meta.withColumn("sid", sid_col)
        .groupBy("sid")
        .agg(
            F.count("*").alias("total"),
            F.sum(in_window.cast("long")).alias("in_window"),
        )
        .collect()
    )
    elig_set = {int(s) for s in eligible_sids}
    sid_counts = {
        int(r["sid"]): int(r["in_window"])
        for r in census
        if int(r["sid"]) in elig_set and int(r["in_window"])
    }
    m_keep = sum(sid_counts.values())

    # ---- tail: decode ONLY the non-keeper partitions, re-encode ----
    n_tail = sum(int(r["total"]) for r in census) - m_keep
    k = 0
    if n_tail:
        # the tail selection reaches decode as a PER-SNAPSHOT predicate
        # over raw chunk columns, applied before the union inside
        # chunks_df — it pushes down into each snapshot's parquet scan,
        # and with one partition per chunk file (min==max row-group
        # stats on n_rows) the keepers' payload bytes are never read.
        # A semijoin frame here measured 90 s on a 2M-row table where
        # this form pays only the surviving tail's IO.
        def tail_filter(sid):
            if sid not in elig_set:
                return None  # narrow snapshot: every partition re-encodes
            return (F.col("n_rows") < lo_rows) | (F.col("n_rows") > hi_rows)

        sub = decode_job.decode(
            spark, table_dir, filesystem=cfg.filesystem, _chunk_filter=tail_filter
        )
        lin_small = encode(spark, sub, snap_dir, cfg, resume=True)
        # keeper ids start AFTER the tail's PLANNED id space — the plan
        # count, not the committed count: a crash-retry's chunks dir
        # already holds copied keeper files, and counting those would
        # shift the keeper numbering between attempts (duplicating
        # keepers under new ids). plan_partitions is deterministic for
        # the same input, so the planned count is stable across retries.
        k = int(lin_small["n_partitions_planned"])
    if not m_keep:
        lin = decode_job.lineage(snap_dir, filesystem=cfg.filesystem)
        lin["binpack_kept"] = 0
        return lin

    # ---- keepers: new ids k..k+m-1, assigned per-snapshot so the
    # window sorts within one snapshot's metadata rows (parallel across
    # snapshots), with driver-computed offsets gluing them contiguous —
    # deterministic across retries (same snapshot set ⇒ same mapping)
    offsets, base = {}, k
    for sid in sorted(sid_counts):
        offsets[sid] = base
        base += sid_counts[sid]
    off_expr = F.create_map(
        *[x for sid, off in offsets.items() for x in (F.lit(sid), F.lit(off))]
    )
    rn = F.row_number().over(Window.partitionBy("sid").orderBy("part_id"))
    plan = keepers.select(
        "part_id",
        (F.element_at(off_expr, F.col("sid")) + rn - 1).alias("new_pid"),
    )

    snap_dirs = {
        int(sid): sdir
        for sid, sdir in table_mod.snapshot_dirs(table_dir, filesystem=cfg.filesystem)
    }
    shift = table_mod.SNAP_SHIFT
    filesystem = cfg.filesystem
    dest = snap_dir

    def copy_tasks(batches):
        fs, root = fsio.resolve(dest, filesystem)
        chunks_dir = fsio.join(root, "chunks")
        commits_dir = fsio.join(root, "_commits")
        tmp_dir = fsio.join(root, "_tmp")
        for d in (chunks_dir, commits_dir, tmp_dir):
            fsio.mkdirs(fs, d)
        out_schema = metric_batch_schema()
        for rb in batches:
            gpids = rb.column(rb.schema.get_field_index("part_id")).to_pylist()
            npids = rb.column(rb.schema.get_field_index("new_pid")).to_pylist()
            for gpid, npid in zip(gpids, npids):
                sid, lpid = gpid >> shift, gpid & ((1 << shift) - 1)
                src_fs, src_root = fsio.resolve(snap_dirs[sid], filesystem)
                src = fsio.join(src_root, "chunks", f"part-{lpid:06d}.parquet")
                out = copy_chunk_file(
                    fs, chunks_dir, commits_dir, tmp_dir, src_fs, src,
                    int(npid), {"binpack_copied_from": int(gpid)}, out_schema,
                )
                if out is not None:
                    yield out

    metrics_df = plan.repartition("new_pid").mapInArrow(copy_tasks, CHUNK_SCHEMA)
    # dtypes-only frame for lineage schema (never executed)
    full = decode_job.decode(spark, table_dir, filesystem=cfg.filesystem)
    lin = commit_metrics_action(
        spark, metrics_df, snap_dir, cfg, union_cols, full,
        k + m_keep, t0, n_resumed=1,
    )
    lin["binpack_kept"] = m_keep
    return lin
