"""Multi-snapshot table layout: incremental (append-only) ingestion.

Iceberg-flavored on purpose (the north-star input is an Iceberg-managed
crawl): a *table* is a directory of immutable snapshot dirs plus one
manifest. Each append writes a brand-new snapshot with the existing
checkpoint-resumable encode job, then commits it with one atomic manifest
replace — readers never see a half-written snapshot, and a crash between
"snapshot encoded" and "manifest committed" is healed by the next append,
which resumes into the same uncommitted snapshot id (per-partition commit
markers make that idempotent).

    <table_dir>/
      snap-000001/     # a normal snapshot (chunks/ + _commits/ + _lineage.json)
      snap-000002/
      _table.json      # {"format": 1, "current": 2, "snapshots": [...]}

Time travel falls out of immutability: reading "as of snapshot k" is just
ignoring manifest entries with id > k.

Reference parity note: parquet2 writes immutable files with a metadata
sidecar (src/write/file.rs:61-75) and leaves table management to the
caller; this module is that caller for the 10^12-doc incremental-crawl
case.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession

from .. import fsio
from .encode_job import EncodeConfig, encode

MANIFEST = "_table.json"
# snapshot id namespaces the part_id when snapshots are read together:
# part ids stay unique across snapshots without rewriting any file
SNAP_SHIFT = 44  # part_id < 2^44 (~1.8e13 partitions), snap id < 2^19


def is_table(path: str, filesystem=None) -> bool:
    fs, root = fsio.resolve(path, filesystem)
    return fsio.exists(fs, fsio.join(root, MANIFEST))


def read_manifest(table_dir: str, filesystem=None) -> dict | None:
    fs, root = fsio.resolve(table_dir, filesystem)
    p = fsio.join(root, MANIFEST)
    if not fsio.exists(fs, p):
        return None
    return fsio.read_json(fs, p)


def snapshot_dirs(
    table_dir: str, as_of: int | None = None, filesystem=None, since: int | None = None
) -> list[tuple[int, str]]:
    """(snapshot id, absolute dir) for every committed snapshot in
    ``(since, as_of]`` — the incremental-consumption window: a training
    pipeline that processed up to snapshot k reads ``since=k`` next run
    and touches only new data."""
    man = read_manifest(table_dir, filesystem)
    if man is None:
        raise FileNotFoundError(f"{table_dir} has no {MANIFEST}")
    out = []
    for s in man["snapshots"]:
        if as_of is not None and s["id"] > as_of:
            continue
        if since is not None and s["id"] <= since:
            continue
        out.append((s["id"], os.path.join(table_dir, s["dir"])))
    return sorted(out)


def _staging_dir_for(fs, root: str, man: dict, next_id: int) -> str:
    """Snapshot staging-dir name for ``next_id``.

    A crashed append left an orphan (encoded but never committed) dir for
    this id — adopt it so the retry resumes instead of re-encoding
    (committed partitions are skipped by the encode job's markers). No
    orphan → a fresh uuid-suffixed name, so two LIVE writers racing on
    the same id can never write into each other's files; only the first
    manifest commit wins.
    """
    import uuid as _uuid

    committed = {s["dir"] for s in man["snapshots"]}
    prefix = f"snap-{next_id:06d}"
    orphans = sorted(
        d
        for d in fsio.listdir(fs, root)
        if d.startswith(prefix) and d not in committed and fsio.is_dir(fs, fsio.join(root, d))
    )
    if orphans:
        return orphans[0]
    return f"{prefix}-{_uuid.uuid4().hex[:8]}"


def append(
    spark: SparkSession,
    df: DataFrame,
    table_dir: str,
    cfg: EncodeConfig | None = None,
    resume: bool = True,
) -> dict:
    """Encode ``df`` as the table's next snapshot and commit it.

    Crash-safe at every point: the snapshot encodes with per-partition
    atomic commits (resumable), and becomes visible only via the final
    atomic manifest replace. Retrying a crashed append with the same
    batch resumes the interrupted snapshot instead of duplicating it.
    """
    cfg = cfg or EncodeConfig()
    fs, root = fsio.resolve(table_dir, cfg.filesystem)
    fsio.mkdirs(fs, root)
    man = read_manifest(table_dir, cfg.filesystem) or {"format": 1, "current": 0, "snapshots": []}
    if man["snapshots"]:
        last = snapshot_dirs(table_dir, filesystem=cfg.filesystem)[-1][1]
        _, lastroot = fsio.resolve(last, cfg.filesystem)
        prev_schema = fsio.read_json(fs, fsio.join(lastroot, "_lineage.json"))["schema"]
        new_schema = dict(df.dtypes)
        # additive schema evolution (Iceberg add-column): every existing
        # column must keep its type; brand-new columns are allowed and
        # read as NULL in older snapshots. Drops/renames/retypes are not.
        changed = {c: (t, new_schema.get(c)) for c, t in prev_schema.items()
                   if new_schema.get(c) != t}
        if changed:
            raise ValueError(
                f"append would drop/retype table columns {changed}; only "
                f"adding new columns is supported (additive evolution)"
            )
    next_id = (max((s["id"] for s in man["snapshots"]), default=0)) + 1
    snap_name = _staging_dir_for(fs, root, man, next_id)
    snap_dir = os.path.join(table_dir, snap_name)

    lin = encode(spark, df, snap_dir, cfg, resume=resume)

    # optimistic concurrency (Iceberg-style single-pointer commit): two
    # live writers encode into DIFFERENT uuid-suffixed staging dirs, so
    # neither can touch the other's files; the first manifest replace
    # wins, the loser is refused here (its orphan dir is garbage, and a
    # retried append with a NEW id adopts or ignores it safely).
    latest = read_manifest(table_dir, cfg.filesystem)
    latest_ids = {s["id"] for s in (latest or man)["snapshots"]}
    if next_id in latest_ids:
        raise RuntimeError(
            f"concurrent append detected: snapshot id {next_id} was committed "
            f"by another writer while this append encoded — retry the append"
        )
    man = latest or man
    man["snapshots"].append(
        {
            "id": next_id,
            "dir": snap_name,
            "rows": lin["rows"],
            "raw_bytes": lin["raw_bytes"],
            "enc_bytes": lin["enc_bytes"],
            "created_unix": time.time(),
        }
    )
    man["current"] = next_id
    _write_manifest(table_dir, man, cfg.filesystem)
    return lin


def _write_manifest(table_dir: str, man: dict, filesystem=None) -> None:
    """Atomic on local/HDFS (rename); on rename-free object stores a
    manifest PUT is atomic per object — same single-pointer commit model
    Iceberg uses (readers follow only the manifest)."""
    fs, root = fsio.resolve(table_dir, filesystem)
    fsio.write_json_atomic(fs, fsio.join(root, MANIFEST), man, indent=1)


def compact(
    spark: SparkSession,
    table_dir: str,
    cfg: EncodeConfig | None = None,
    keep_old: bool = False,
) -> dict:
    """Rewrite every committed snapshot into one fresh snapshot (the
    Iceberg `rewrite_data_files` maintenance op): many small appends →
    one well-partitioned snapshot, re-running codec selection over the
    merged data. Readers switch atomically at the manifest replace; old
    snapshot dirs are removed afterwards (or kept with ``keep_old`` for
    external time-travel archival)."""
    from . import decode_job

    if cfg is None:
        # derive a schema-appropriate default: key/sort on the table's
        # first column, no host bucketing (the url-specific default would
        # fail on tables without a url column)
        lin0 = decode_job.lineage(table_dir)
        first = lin0["columns"][0]
        cfg = EncodeConfig(key=first, sort_by=first, host_from_key=False)
    man = read_manifest(table_dir, cfg.filesystem)
    if man is None or not man["snapshots"]:
        raise FileNotFoundError(f"{table_dir}: nothing to compact")
    old = snapshot_dirs(table_dir, filesystem=cfg.filesystem)
    next_id = max(s["id"] for s in man["snapshots"]) + 1
    fs, root = fsio.resolve(table_dir, cfg.filesystem)
    snap_name = _staging_dir_for(fs, root, man, next_id)
    snap_dir = os.path.join(table_dir, snap_name)

    df = decode_job.decode(spark, table_dir, filesystem=cfg.filesystem)
    lin = encode(spark, df, snap_dir, cfg, resume=True)

    new_man = {
        "format": man["format"],
        "current": next_id,
        "snapshots": [
            {
                "id": next_id,
                "dir": snap_name,
                "rows": lin["rows"],
                "raw_bytes": lin["raw_bytes"],
                "enc_bytes": lin["enc_bytes"],
                "created_unix": time.time(),
                "compacted_from": [s["id"] for s in man["snapshots"]],
            }
        ],
    }
    _write_manifest(table_dir, new_man, cfg.filesystem)
    if not keep_old:
        for _, sdir in old:
            sfs, sroot = fsio.resolve(sdir, cfg.filesystem)
            fsio.delete_dir(sfs, sroot)
    return lin
