"""Manifest commit atomicity (round-2 ADVICE medium #2 + VERDICT item 10):
the read-modify-write of _table.json runs under an exclusive-create lock,
different-id commits can't drop each other's entries, compact() refuses to
discard snapshots appended during the re-encode, and object-store adapters
with a conditional-put hook (``create_if_absent``) refuse the losing writer
BEFORE the manifest is replaced."""

from __future__ import annotations

import json
import threading
import time

import pytest
from pyarrow import fs as pafs
from pyspark.sql import functions as F

from parquet2_spark import fsio
from parquet2_spark.operators import table
from parquet2_spark.operators.encode_job import EncodeConfig
from parquet2_spark.operators.table import CommitConflict, append, compact, read_manifest


def _cfg():
    return EncodeConfig(target_rows=64, page_rows=32, sort_by="k", key="k",
                        host_from_key=False)


def _batch(spark, tag: int, n: int = 50):
    return spark.range(n).select(
        (F.col("id") + tag * 1000).alias("k"),
        F.concat(F.lit(f"t{tag}-"), F.col("id").cast("string")).alias("v"),
    )


def _age_tree(path: str, age_s: float) -> None:
    """Backdate every file AND directory under ``path`` (and ``path``
    itself) by ``age_s`` — simulates a staging dir whose writer crashed
    that long ago. _adoptable/vacuum judge liveness by the newest mtime
    over the WHOLE tree, so fixtures must age subdirs too."""
    import os

    past = time.time() - age_s
    for base, dirs, files in os.walk(path, topdown=False):
        for f in files:
            os.utime(os.path.join(base, f), (past, past))
        for d in dirs:
            os.utime(os.path.join(base, d), (past, past))
    os.utime(path, (past, past))


class TestExclusiveCreate:
    def test_local_o_excl(self, tmp_path):
        fs = pafs.LocalFileSystem()
        p = str(tmp_path / "tok")
        assert fsio.try_create_exclusive(fs, p, b"a") is True
        assert fsio.try_create_exclusive(fs, p, b"b") is False
        assert fsio.read_bytes(fs, p) == b"a"  # loser never wrote

    def test_subtree_resolves_to_o_excl(self, tmp_path):
        fs = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
        assert fsio.try_create_exclusive(fs, "tok", b"x") is True
        assert fsio.try_create_exclusive(fs, "tok", b"y") is False

    def test_duck_typed_cas_hook_wins(self, tmp_path):
        calls = []

        class FakeCAS(pafs.SubTreeFileSystem):
            """Object-store adapter with conditional PUT (If-None-Match)."""

            def __init__(self, root):
                super().__init__(root, pafs.LocalFileSystem())

            def create_if_absent(self, path, payload):
                calls.append(path)
                if fsio.exists(self, path):
                    return False
                with self.open_output_stream(path) as f:
                    f.write(payload)
                return True

        fs = FakeCAS(str(tmp_path))
        assert fsio.try_create_exclusive(fs, "lock", b"1") is True
        assert fsio.try_create_exclusive(fs, "lock", b"2") is False
        assert calls == ["lock", "lock"]  # the hook, not the O_EXCL path


class TestManifestLock:
    def test_serializes_read_modify_write(self, tmp_path):
        fs = pafs.LocalFileSystem()
        root = str(tmp_path)
        fsio.mkdirs(fs, root)
        man_path = fsio.join(root, table.MANIFEST)
        fsio.write_json_atomic(fs, man_path, {"format": 1, "current": 0, "snapshots": []})

        errs = []

        def committer(wid: int):
            try:
                for i in range(10):
                    lock = table._acquire_manifest_lock(fs, root)
                    try:
                        man = fsio.read_json(fs, man_path)
                        man["snapshots"].append({"id": len(man["snapshots"]) + 1,
                                                 "dir": f"w{wid}-{i}"})
                        time.sleep(0.001)  # widen the race window
                        fsio.write_json_atomic(fs, man_path, man)
                    finally:
                        table._release_manifest_lock(fs, lock)
            except Exception as e:  # pragma: no cover
                errs.append(e)

        threads = [threading.Thread(target=committer, args=(w,)) for w in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        man = fsio.read_json(fs, man_path)
        # no lost updates: all 40 commits present, ids dense
        assert len(man["snapshots"]) == 40
        assert sorted(s["id"] for s in man["snapshots"]) == list(range(1, 41))

    def test_stale_lock_stolen(self, tmp_path):
        fs = pafs.LocalFileSystem()
        root = str(tmp_path)
        fsio.mkdirs(fs, fsio.join(root, table.LOCK_DIR))
        lock_path = fsio.join(root, table.LOCK_DIR, "manifest.lock")
        stale = {"token": "dead", "created_unix": time.time() - table.LOCK_STALE_S - 1}
        fsio.write_json_atomic(fs, lock_path, stale)
        got = table._acquire_manifest_lock(fs, root, wait_s=5)
        assert json.loads(fsio.read_bytes(fs, got["path"]))["token"] != "dead"
        table._release_manifest_lock(fs, got)
        assert not fsio.exists(fs, lock_path)

    def test_torn_lock_times_out_not_spins(self, tmp_path):
        """An unparseable (torn) lock must hit the deadline, not busy-spin
        forever skipping deadline and sleep."""
        import pathlib

        fs = pafs.LocalFileSystem()
        root = str(tmp_path)
        fsio.mkdirs(fs, fsio.join(root, table.LOCK_DIR))
        lock_path = fsio.join(root, table.LOCK_DIR, "manifest.lock")
        pathlib.Path(lock_path).write_bytes(b"")  # torn write
        t0 = time.time()
        with pytest.raises(TimeoutError):
            table._acquire_manifest_lock(fs, root, wait_s=0.3)
        assert time.time() - t0 < 5  # bounded, and it did wait (no hot spin)

    def test_release_refuses_foreign_lock(self, tmp_path):
        """A holder whose critical section outlived the staleness window
        must not delete the lock a stealer now owns."""
        fs = pafs.LocalFileSystem()
        root = str(tmp_path)
        got = table._acquire_manifest_lock(fs, root, wait_s=5)
        # a stealer replaced the lock while we were inside the CS
        fsio.delete_file(fs, got["path"])
        fsio.write_json_atomic(
            fs, got["path"], {"token": "thief", "created_unix": time.time()}
        )
        table._release_manifest_lock(fs, got)
        assert json.loads(fsio.read_bytes(fs, got["path"]))["token"] == "thief"
        fsio.delete_file(fs, got["path"])

    def test_live_lock_times_out(self, tmp_path):
        fs = pafs.LocalFileSystem()
        root = str(tmp_path)
        fsio.mkdirs(fs, fsio.join(root, table.LOCK_DIR))
        lock_path = fsio.join(root, table.LOCK_DIR, "manifest.lock")
        fsio.write_json_atomic(fs, lock_path, {"token": "live", "created_unix": time.time()})
        with pytest.raises(TimeoutError):
            table._acquire_manifest_lock(fs, root, wait_s=0.3)


class TestAppendCommit:
    def test_interleaved_appends_keep_both(self, spark, tmp_path, monkeypatch):
        """Writer B reads the manifest before writer A commits a DIFFERENT
        id; B's locked commit must merge, not drop, A's entry (the lost
        update compact-then-write had), and B's id must stay monotone with
        commit order (never fill the gap below A's id — since= consumers
        assume id order == commit order)."""
        tdir = str(tmp_path / "tbl")
        append(spark, _batch(spark, 1), tdir, _cfg())

        orig_encode = table.encode
        fired = []

        def racy_encode(*a, **k):
            lin = orig_encode(*a, **k)
            if not fired:  # writer A lands an id-3 commit while B encodes id 2
                fired.append(1)
                man = read_manifest(tdir)
                man["snapshots"].append(
                    {"id": 3, "dir": "snap-000003-foreign", "rows": 1,
                     "raw_bytes": 1, "enc_bytes": 1, "created_unix": time.time()}
                )
                man["current"] = 3
                fs, root = fsio.resolve(tdir, None)
                fsio.mkdirs(fs, fsio.join(root, "snap-000003-foreign"))
                fsio.write_json_atomic(
                    fs, fsio.join(root, "snap-000003-foreign", "_lineage.json"),
                    {"schema": {"k": "bigint", "v": "string"}},
                )  # a real committed snapshot always carries its lineage
                table._write_manifest(tdir, man)
            return lin

        monkeypatch.setattr(table, "encode", racy_encode)
        append(spark, _batch(spark, 2), tdir, _cfg())
        ids = sorted(s["id"] for s in read_manifest(tdir)["snapshots"])
        assert ids == [1, 3, 4]  # nobody dropped; B committed ABOVE A's id
        assert read_manifest(tdir)["current"] == 4

    def test_compact_refuses_when_table_changed(self, spark, tmp_path, monkeypatch):
        """Default (binpack) path: an append landing during the rewrite
        is detected at the locked manifest compare."""
        from parquet2_spark.operators import binpack as binpack_mod

        tdir = str(tmp_path / "tbl2")
        append(spark, _batch(spark, 1), tdir, _cfg())
        append(spark, _batch(spark, 2), tdir, _cfg())

        orig = binpack_mod.binpack_compact
        fired = []

        def racy_binpack(*a, **k):
            lin = orig(*a, **k)
            if not fired:  # a concurrent append lands during the rewrite
                fired.append(1)
                append(spark, _batch(spark, 9), tdir, _cfg())
            return lin

        monkeypatch.setattr(binpack_mod, "binpack_compact", racy_binpack)
        with pytest.raises(CommitConflict, match="changed during compaction"):
            compact(spark, tdir, _cfg())
        # the concurrently-appended snapshot survived
        ids = sorted(s["id"] for s in read_manifest(tdir)["snapshots"])
        assert ids == [1, 2, 3]

    def test_compact_refuses_when_table_changed_full_reencode(
        self, spark, tmp_path, monkeypatch
    ):
        """Same race through the binpack=False shuffle re-encode path."""
        tdir = str(tmp_path / "tbl2b")
        append(spark, _batch(spark, 1), tdir, _cfg())
        append(spark, _batch(spark, 2), tdir, _cfg())

        orig_encode = table.encode
        fired = []

        def racy_encode(*a, **k):
            lin = orig_encode(*a, **k)
            if not fired:  # a concurrent append lands during the re-encode
                fired.append(1)
                append(spark, _batch(spark, 9), tdir, _cfg())
            return lin

        monkeypatch.setattr(table, "encode", racy_encode)
        with pytest.raises(CommitConflict, match="changed during compaction"):
            compact(spark, tdir, _cfg(), binpack=False)
        ids = sorted(s["id"] for s in read_manifest(tdir)["snapshots"])
        assert ids == [1, 2, 3]

    def test_same_id_race_bumps_not_drops(self, spark, tmp_path, monkeypatch):
        """A foreign writer commits OUR provisional id while we encode:
        the locked commit re-reads the manifest and takes the next id
        above it — no lost update, no conflict error, no retry needed."""
        tdir = str(tmp_path / "tbl3")
        append(spark, _batch(spark, 1), tdir, _cfg())

        orig_encode = table.encode

        def racy_encode(*a, **k):
            lin = orig_encode(*a, **k)
            man = read_manifest(tdir)
            man["snapshots"].append(
                {"id": 2, "dir": "snap-000002-foreign", "rows": 1,
                 "raw_bytes": 1, "enc_bytes": 1, "created_unix": time.time()}
            )
            man["current"] = 2
            fs, root = fsio.resolve(tdir, None)
            fsio.mkdirs(fs, fsio.join(root, "snap-000002-foreign"))
            fsio.write_json_atomic(
                fs, fsio.join(root, "snap-000002-foreign", "_lineage.json"),
                {"schema": {"k": "bigint", "v": "string"}},
            )
            table._write_manifest(tdir, man)
            return lin

        monkeypatch.setattr(table, "encode", racy_encode)
        append(spark, _batch(spark, 2), tdir, _cfg())
        man = read_manifest(tdir)
        assert sorted(s["id"] for s in man["snapshots"]) == [1, 2, 3]
        assert man["snapshots"][1]["dir"] == "snap-000002-foreign"  # kept
        assert man["snapshots"][2]["dir"].startswith("snap-000002-")  # ours, bumped id

    def test_live_staging_dir_not_adopted(self, spark, tmp_path):
        """A claimed staging dir with fresh commit activity belongs to a
        LIVE writer — a second append must never resume into it."""
        tdir = str(tmp_path / "tbl4")
        append(spark, _batch(spark, 1), tdir, _cfg())
        fs, root = fsio.resolve(tdir, None)
        man = read_manifest(tdir)
        # simulate writer A mid-encode: claimed dir with a fresh marker
        a_dir = table._claim_staging_dir(fs, root, man, 2)
        fsio.mkdirs(fs, fsio.join(root, a_dir, "_commits"))
        fsio.write_json_atomic(fs, fsio.join(root, a_dir, "_commits", "0.json"), {"x": 1})
        assert not table._adoptable(fs, root, a_dir)
        b_dir = table._staging_dir_for(fs, root, man, 2)
        assert b_dir != a_dir  # B got a fresh dir, not A's
        # an UNCLAIMED orphan (manual encode / legacy) is still adoptable
        fsio.mkdirs(fs, fsio.join(root, "snap-000002"))
        assert table._adoptable(fs, root, "snap-000002")


class TestBatchKeyAdoption:
    def test_claimed_dir_never_adopted_without_key(self, tmp_path):
        """Quietness alone is NOT sufficient: a live writer's first commit
        marker can lag its claim by more than any fixed window, so a
        claimed dir without a matching batch key is never adopted."""
        fs = pafs.LocalFileSystem()
        root = str(tmp_path)
        man = {"format": 1, "current": 0, "snapshots": []}
        a_dir = table._claim_staging_dir(fs, root, man, 2, batch_key="batch-A")
        # silence the claim far past the quiet window
        claim_p = fsio.join(root, a_dir, table.CLAIM)
        c = json.loads(fsio.read_bytes(fs, claim_p))
        c["created_unix"] = time.time() - table.ADOPT_QUIET_S * 10
        fsio.write_json_atomic(fs, claim_p, c)
        _age_tree(fsio.join(root, a_dir), table.ADOPT_QUIET_S * 10)
        assert not table._adoptable(fs, root, a_dir)               # no key
        assert not table._adoptable(fs, root, a_dir, "batch-B")    # wrong key
        assert table._adoptable(fs, root, a_dir, "batch-A")        # retry of A
        # a FRESH claim is not adoptable even with the right key
        b_dir = table._claim_staging_dir(fs, root, man, 3, batch_key="batch-C")
        assert not table._adoptable(fs, root, b_dir, "batch-C")

    def test_keyed_retry_resumes_crashed_append(self, spark, tmp_path, monkeypatch):
        """append(batch_key=K) crashed mid-encode; the retry with the same
        key adopts the staging dir and skips committed partitions."""
        tdir = str(tmp_path / "tblk")
        append(spark, _batch(spark, 1), tdir, _cfg())
        # crash: claim + encode happen, manifest commit never does
        fs, root = fsio.resolve(tdir, None)
        man = read_manifest(tdir)
        snap = table._claim_staging_dir(fs, root, man, 2, batch_key="K1")
        b2 = _batch(spark, 2).cache(); b2.count()
        table.encode(spark, b2, fsio.join(root, snap), _cfg())
        # age the claim past the quiet window (a real retry comes later)
        claim_p = fsio.join(root, snap, table.CLAIM)
        c = json.loads(fsio.read_bytes(fs, claim_p))
        c["created_unix"] = time.time() - table.ADOPT_QUIET_S - 5
        fsio.write_json_atomic(fs, claim_p, c)
        _age_tree(fsio.join(root, snap), table.ADOPT_QUIET_S + 5)
        lin = append(spark, b2, tdir, _cfg(), batch_key="K1")
        assert lin["resumed_partitions_skipped"] > 0
        man = read_manifest(tdir)
        assert [s["dir"] for s in man["snapshots"]][-1] == snap

    def test_unkeyed_retry_encodes_fresh(self, spark, tmp_path):
        """Without a batch key the crashed claimed dir stays orphaned and
        the retry gets a fresh dir (correct, if slower)."""
        tdir = str(tmp_path / "tblu")
        append(spark, _batch(spark, 1), tdir, _cfg())
        fs, root = fsio.resolve(tdir, None)
        man = read_manifest(tdir)
        snap = table._claim_staging_dir(fs, root, man, 2)
        b2 = _batch(spark, 2).cache(); b2.count()
        table.encode(spark, b2, fsio.join(root, snap), _cfg())
        lin = append(spark, b2, tdir, _cfg())
        assert lin["resumed_partitions_skipped"] == 0
        man = read_manifest(tdir)
        assert [s["dir"] for s in man["snapshots"]][-1] != snap
        # both snapshots' data decode correctly (the orphan is invisible)
        from parquet2_spark.operators import decode_job
        assert decode_job.decode(spark, tdir).count() == 100  # 2 batches x 50


class TestReviewR3bFixes:
    """Second-pass review findings on the lock/adoption fixes."""

    def test_torn_lock_self_heals_by_mtime(self, tmp_path):
        """A torn (empty) lock ages by FILE mtime, so later acquires steal
        it instead of leaving the table bricked forever."""
        import os, pathlib

        fs = pafs.LocalFileSystem()
        root = str(tmp_path)
        fsio.mkdirs(fs, fsio.join(root, table.LOCK_DIR))
        lock_path = fsio.join(root, table.LOCK_DIR, "manifest.lock")
        pathlib.Path(lock_path).write_bytes(b"")
        past = time.time() - table.LOCK_STALE_S - 5
        os.utime(lock_path, (past, past))
        got = table._acquire_manifest_lock(fs, root, wait_s=5)
        assert json.loads(fsio.read_bytes(fs, got["path"]))["token"] == got["token"]
        table._release_manifest_lock(fs, got)

    def test_steal_refuses_recreated_lock(self, tmp_path):
        """Compare-then-delete: if the lock content changed since we
        judged it stale, the steal must be a no-op."""
        fs = pafs.LocalFileSystem()
        root = str(tmp_path)
        fsio.mkdirs(fs, fsio.join(root, table.LOCK_DIR))
        lock_path = fsio.join(root, table.LOCK_DIR, "manifest.lock")
        stale_raw = json.dumps({"token": "dead", "created_unix": 0}).encode()
        fresh_raw = json.dumps({"token": "fresh", "created_unix": time.time()}).encode()
        fsio.write_json_atomic(fs, lock_path, json.loads(fresh_raw))
        table._steal_lock(fs, lock_path, stale_raw)  # judged the OLD content
        assert json.loads(fsio.read_bytes(fs, lock_path))["token"] == "fresh"

    def test_batch_key_exactly_once_across_commit_crash(self, spark, tmp_path):
        """A retry AFTER the manifest commit must not duplicate the batch:
        the committed snapshot entry records batch_key and the retry
        short-circuits to its lineage."""
        tdir = str(tmp_path / "tblx")
        b1 = _batch(spark, 1).cache(); b1.count()
        lin1 = append(spark, b1, tdir, _cfg(), batch_key="B1")
        lin2 = append(spark, b1, tdir, _cfg(), batch_key="B1")  # retry
        assert lin2.get("already_committed") is True
        assert lin2["rows"] == lin1["rows"]
        man = read_manifest(tdir)
        assert len(man["snapshots"]) == 1
        assert man["snapshots"][0]["batch_key"] == "B1"
        # a DIFFERENT key appends normally
        append(spark, _batch(spark, 2), tdir, _cfg(), batch_key="B2")
        assert len(read_manifest(tdir)["snapshots"]) == 2

    def test_compact_retry_resumes_same_input_set(self, spark, tmp_path, monkeypatch):
        """A crashed compaction over the same snapshot set adopts its
        staging dir on retry (deterministic compact key)."""
        tdir = str(tmp_path / "tblc")
        append(spark, _batch(spark, 1), tdir, _cfg())
        append(spark, _batch(spark, 2), tdir, _cfg())
        man = read_manifest(tdir)
        fs, root = fsio.resolve(tdir, None)
        key = "compact:" + ",".join(str(s["id"]) for s in man["snapshots"])
        # simulate the crashed attempt: claim + full encode, no commit
        snap = table._claim_staging_dir(fs, root, man, 3, key)
        from parquet2_spark.operators import decode_job
        table.encode(spark, decode_job.decode(spark, tdir), fsio.join(root, snap),
                     EncodeConfig(target_rows=64, page_rows=32, sort_by="k", key="k",
                                  host_from_key=False))
        claim_p = fsio.join(root, snap, table.CLAIM)
        c = json.loads(fsio.read_bytes(fs, claim_p))
        c["created_unix"] = time.time() - table.ADOPT_QUIET_S - 5
        fsio.write_json_atomic(fs, claim_p, c)
        _age_tree(fsio.join(root, snap), table.ADOPT_QUIET_S + 5)
        lin = compact(spark, tdir, EncodeConfig(target_rows=64, page_rows=32,
                                                sort_by="k", key="k",
                                                host_from_key=False))
        assert lin["resumed_partitions_skipped"] > 0
        assert read_manifest(tdir)["snapshots"][0]["dir"] == snap

    def test_vacuum_collects_aged_orphans_only(self, spark, tmp_path, monkeypatch):
        import os

        monkeypatch.setattr(table, "VACUUM_FLOOR_S", 1.0)

        tdir = str(tmp_path / "tblv")
        append(spark, _batch(spark, 1), tdir, _cfg())
        fs, root = fsio.resolve(tdir, None)
        man = read_manifest(tdir)
        orphan = table._claim_staging_dir(fs, root, man, 2)
        committed_dir = man["snapshots"][0]["dir"]
        # age the orphan: both the claim's created_unix (vacuum's
        # live-append guard) and every file mtime (the quietness check)
        claim_p = fsio.join(root, orphan, table.CLAIM)
        c = json.loads(fsio.read_bytes(fs, claim_p))
        c["created_unix"] = time.time() - 10
        fsio.write_json_atomic(fs, claim_p, c)
        _age_tree(fsio.join(root, orphan), 10)
        deleted = table.vacuum(tdir, older_than_s=5)
        assert deleted == [orphan]
        assert not fsio.exists(fs, fsio.join(root, orphan, table.CLAIM))
        assert fsio.is_dir(fs, fsio.join(root, committed_dir))  # untouched
        # a FRESH orphan is protected
        fresh = table._claim_staging_dir(fs, root, read_manifest(tdir), 3)
        assert table.vacuum(tdir, older_than_s=5) == []
        assert fsio.is_dir(fs, fsio.join(root, fresh))


class TestReviewR3cFixes:
    """Third-pass review: vacuum×archive, compaction×batch_key, probes."""

    def test_vacuum_spares_keep_old_archives(self, spark, tmp_path, monkeypatch):
        import os

        monkeypatch.setattr(table, "VACUUM_FLOOR_S", 1.0)
        tdir = str(tmp_path / "tbla")
        append(spark, _batch(spark, 1), tdir, _cfg())
        append(spark, _batch(spark, 2), tdir, _cfg())
        old_dirs = [s["dir"] for s in read_manifest(tdir)["snapshots"]]
        compact(spark, tdir, _cfg(), keep_old=True)
        fs, root = fsio.resolve(tdir, None)
        # age everything well past the threshold
        past = time.time() - 100
        for d in old_dirs:
            for base, _, files in __import__("os").walk(fsio.join(root, d)):
                for f in files:
                    os.utime(os.path.join(base, f), (past, past))
        assert table.vacuum(tdir, older_than_s=5) == []
        for d in old_dirs:
            assert fsio.is_dir(fs, fsio.join(root, d))  # archive intact

    def test_vacuum_protects_empty_and_fresh_dirs(self, spark, tmp_path, monkeypatch):
        monkeypatch.setattr(table, "VACUUM_FLOOR_S", 1.0)
        tdir = str(tmp_path / "tble")
        append(spark, _batch(spark, 1), tdir, _cfg())
        fs, root = fsio.resolve(tdir, None)
        # an empty dir has no mtime evidence → protected, never deleted
        fsio.mkdirs(fs, fsio.join(root, "snap-000099-empty"))
        assert table.vacuum(tdir, older_than_s=5) == []
        assert fsio.is_dir(fs, fsio.join(root, "snap-000099-empty"))

    def test_batch_key_survives_compaction(self, spark, tmp_path):
        tdir = str(tmp_path / "tblbk")
        b1 = _batch(spark, 1).cache(); b1.count()
        append(spark, b1, tdir, _cfg(), batch_key="B1")
        append(spark, _batch(spark, 2), tdir, _cfg(), batch_key="B2")
        compact(spark, tdir, _cfg())
        man = read_manifest(tdir)
        assert man["snapshots"][0]["compacted_batch_keys"] == ["B1", "B2"]
        # the keyed retry after compaction still short-circuits
        lin = append(spark, b1, tdir, _cfg(), batch_key="B1")
        assert lin.get("already_committed") is True
        assert len(read_manifest(tdir)["snapshots"]) == 1  # no duplicate

    def test_key_in_epoch_int_probes_on_temporal_columns(self, spark, tmp_path):
        """Epoch-int probes (the CLI's unit) against timestamp and date
        columns: micros/days, never seconds, never a type crash."""
        from parquet2_spark.operators import decode_job

        df = spark.range(200).select(
            F.col("id").alias("k"),
            F.timestamp_micros(F.lit(1_700_000_000_000_000) + F.col("id") * 1_000_000).alias("ts"),
            F.date_from_unix_date((F.lit(19800) + F.col("id")).cast("int")).alias("day"),
        )
        d = str(tmp_path / "epochin")
        table.encode(spark, df, d,
                     EncodeConfig(target_rows=100, key="k", sort_by="k",
                                  host_from_key=False, bloom_columns=("ts",)))
        got = decode_job.decode(
            spark, d, key_in=("ts", [1_700_000_000_000_000 + 7_000_000])
        ).collect()
        assert [r["k"] for r in got] == [7]
        got2 = decode_job.decode(spark, d, key_in=("day", [19805, 19807])).collect()
        assert sorted(r["k"] for r in got2) == [5, 7]


class TestAdviceR4Fixes:
    """Round-3 ADVICE items: commit-lock schema re-validation, whole-dir
    adoption liveness, claim-aware vacuum, key_eq epoch-int probes."""

    def test_schema_race_detected_at_commit(self, spark, tmp_path, monkeypatch):
        """Two racing appends both add column y with different types; the
        loser's commit-lock re-validation raises CommitConflict instead of
        silently committing a last-wins merged schema."""
        tdir = str(tmp_path / "tblrace")
        append(spark, _batch(spark, 1), tdir, _cfg())
        df_str = _batch(spark, 2).withColumn("y", F.lit("s"))
        df_int = _batch(spark, 3).withColumn("y", F.lit(1).cast("long"))
        real_encode = table.encode
        state = {"raced": False}

        def racing_encode(spark_, df_, snap_dir, cfg, resume=True):
            lin = real_encode(spark_, df_, snap_dir, cfg, resume=resume)
            if not state["raced"]:
                state["raced"] = True
                # competing writer commits y:bigint while we encoded y:string
                append(spark_, df_int, tdir, _cfg())
            return lin

        monkeypatch.setattr(table, "encode", racing_encode)
        with pytest.raises(CommitConflict):
            append(spark, df_str, tdir, _cfg())
        # the winner's commit survives; the table has exactly 2 snapshots
        man = read_manifest(tdir)
        assert len(man["snapshots"]) == 2

    def test_adoption_sees_chunk_writes_as_liveness(self, spark, tmp_path):
        """A live writer whose first commit marker lags >ADOPT_QUIET_S is
        still landing part files under chunks/ — those writes must block
        adoption even when claim + _commits look quiet."""
        import pathlib

        fs = pafs.LocalFileSystem()
        root = str(tmp_path)
        man = {"format": 1, "current": 0, "snapshots": []}
        a_dir = table._claim_staging_dir(fs, root, man, 2, batch_key="bk")
        claim_p = fsio.join(root, a_dir, table.CLAIM)
        c = json.loads(fsio.read_bytes(fs, claim_p))
        c["created_unix"] = time.time() - table.ADOPT_QUIET_S * 10
        fsio.write_json_atomic(fs, claim_p, c)
        _age_tree(fsio.join(root, a_dir), table.ADOPT_QUIET_S * 10)
        assert table._adoptable(fs, root, a_dir, "bk")  # fully quiet
        # a FRESH part file under chunks/ (no commit marker yet) = live
        chunks = pathlib.Path(root, a_dir, "chunks")
        chunks.mkdir(exist_ok=True)
        (chunks / "part-000000.parquet.inprogress").write_bytes(b"x")
        assert not table._adoptable(fs, root, a_dir, "bk")

    def test_vacuum_spares_live_claim_despite_quiet_files(self, tmp_path, monkeypatch):
        """File-quiet but recently-claimed dir (append stalled mid-encode,
        e.g. queued cluster) is NOT collected until the claim itself ages
        past older_than_s."""
        monkeypatch.setattr(table, "VACUUM_FLOOR_S", 1.0)
        fs = pafs.LocalFileSystem()
        tdir = str(tmp_path / "tblvl")
        root = tdir
        fsio.mkdirs(fs, root)
        table._write_manifest(tdir, {"format": 1, "current": 0, "snapshots": []})
        man = {"format": 1, "current": 0, "snapshots": []}
        orphan = table._claim_staging_dir(fs, root, man, 1, batch_key="bk")
        # files quiet for 100s, claim content says created 2s ago
        _age_tree(fsio.join(root, orphan), 100)
        claim_p = fsio.join(root, orphan, table.CLAIM)
        c = json.loads(fsio.read_bytes(fs, claim_p))
        c["created_unix"] = time.time() - 2
        fsio.write_json_atomic(fs, claim_p, c)
        import os
        past = time.time() - 100
        os.utime(claim_p, (past, past))  # mtime quiet; CONTENT decides
        assert table.vacuum(tdir, older_than_s=5) == []
        assert fsio.is_dir(fs, fsio.join(root, orphan))
        # once the claim itself ages out, the dir is collectable
        c["created_unix"] = time.time() - 100
        fsio.write_json_atomic(fs, claim_p, c)
        os.utime(claim_p, (past, past))
        assert table.vacuum(tdir, older_than_s=5) == [orphan]

    def test_key_eq_epoch_int_probes_on_temporal_columns(self, spark, tmp_path):
        """key_eq with a bare epoch int against timestamp (MICROS) and
        date (DAYS) columns matches key_in's convention — the _typed_lit
        seconds-cast fallback must never be reached (it silently returned
        empty because the bloom hash probed the wrong instant)."""
        from parquet2_spark.operators import decode_job

        df = spark.range(200).select(
            F.col("id").alias("k"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000) + F.col("id") * 1_000_000
            ).alias("ts"),
            F.date_from_unix_date((F.lit(19800) + F.col("id")).cast("int")).alias("day"),
        )
        d = str(tmp_path / "epocheq")
        table.encode(spark, df, d,
                     EncodeConfig(target_rows=100, key="k", sort_by="k",
                                  host_from_key=False, bloom_columns=("ts",)))
        got = decode_job.decode(
            spark, d, key_eq=("ts", 1_700_000_000_000_000 + 7_000_000)
        ).collect()
        assert [r["k"] for r in got] == [7]
        got2 = decode_job.decode(spark, d, key_eq=("day", 19805)).collect()
        assert [r["k"] for r in got2] == [5]
