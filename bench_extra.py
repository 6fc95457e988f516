#!/usr/bin/env python
"""Extra profiling benchmarks (guide §1.4 noop-sink isolation) — NOT part
of the frozen driver bench. Decomposes the encode job into phases so
optimization work targets the real cost:

  plan      plan_partitions alone (host sample + count jobs)
  noop_sort scan + exchange + Tungsten sort, noop sink (no Python)
  noop_conv + Arrow conversion + IPC to Python workers (pass-through UDF)
  full      the whole encode job (UDF kernels + chunk writes + metrics)

plus decode/stats phase timings on the produced snapshot. Usage:
  python bench_extra.py [encode|decode|rt] ...
Prints one JSON line per phase. Env: SPARK_GRAFT_SF_DIR / _CPUS as bench.py.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "268435456")

import bench as B  # reuse the frozen harness' session/input helpers


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def encode_phases(spark, rows=None):
    from parquet2_spark.operators.encode_job import EncodeConfig, plan_partitions
    from pyspark.sql import functions as F

    rows = rows or B.WEB_ROWS
    web_path = B.ensure_web_input(spark, rows)
    B._warm_workers(spark)
    df = spark.read.parquet(web_path)
    cfg = EncodeConfig(
        target_rows=max(1024, rows // (B.CPUS * 4)),
        page_rows=4096,
        host_sample_fraction=0.1,
    )
    out = {}

    sc = spark.sparkContext
    sc.setJobDescription("profile: plan_partitions")
    t0 = time.time()
    planned, n_parts = plan_partitions(df, cfg)
    out["plan_s"] = round(time.time() - t0, 3)

    sc.setJobDescription("profile: noop exchange+sort")
    sort_cols = [cfg.sort_by] if isinstance(cfg.sort_by, str) else list(cfg.sort_by)
    jvm_sort = [F.col(c).asc_nulls_last() for c in sort_cols if c in planned.columns]
    arranged = planned.repartition("_part_id").sortWithinPartitions(
        F.col("_part_id").asc(), *jvm_sort
    )
    t0 = time.time()
    noop(arranged)
    out["noop_sort_s"] = round(time.time() - t0, 3)

    sc.setJobDescription("profile: noop + Arrow conversion")

    def passthrough(batches):
        n = 0
        for rb in batches:
            n += rb.num_rows
        import pyarrow as pa

        yield pa.record_batch({"n": pa.array([n], type=pa.int64())})

    t0 = time.time()
    noop(arranged.mapInArrow(passthrough, "n long"))
    out["noop_conv_s"] = round(time.time() - t0, 3)

    sc.setJobDescription("profile: full encode")
    snap = "/tmp/p2s_prof/snap_enc"
    shutil.rmtree(snap, ignore_errors=True)
    from parquet2_spark.operators.encode_job import encode

    t0 = time.time()
    lin = encode(spark, df, snap, cfg, resume=False)
    out["full_s"] = round(time.time() - t0, 3)
    out["enc_bytes"] = lin["enc_bytes"]

    import glob

    cpus = [json.load(open(f))["cpu_s"] for f in glob.glob(f"{snap}/_commits/*.json")]
    out["udf_core_s"] = round(sum(cpus), 2)
    sc.setJobDescription(None)
    return out


def decode_phases(spark):
    from parquet2_spark.operators import decode_job

    snap = "/tmp/p2s_prof/snap_enc"
    out = {}
    spark.sparkContext.setJobDescription("profile: decode noop")
    t0 = time.time()
    noop(decode_job.decode(spark, snap))
    out["decode_noop_s"] = round(time.time() - t0, 3)
    t0 = time.time()
    decode_job.decode(spark, snap).count()
    out["decode_count_s"] = round(time.time() - t0, 3)
    t0 = time.time()
    decode_job.stats(spark, snap).collect()
    out["stats_s"] = round(time.time() - t0, 3)
    spark.sparkContext.setJobDescription(None)
    return out


def rt_phases(spark):
    """Roundtrip operator timing with the noop sink (guide §1.4)."""
    import __spark_entry__ as E

    qs = E.queries()
    out = {}
    for name in ("rt_auto_lineitem", "rt_auto_events", "rt_decimal"):
        best = None
        for _ in range(2):
            t0 = time.time()
            noop(qs[name](spark, B.SF_DIR))
            w = time.time() - t0
            best = w if best is None else min(best, w)
        out[name] = round(best, 3)
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    os.makedirs("/tmp/p2s_prof", exist_ok=True)
    spark = B.session(B.CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    res = {}
    if which in ("encode", "all"):
        res["encode"] = encode_phases(spark)
    if which in ("decode", "all"):
        res["decode"] = decode_phases(spark)
    if which in ("rt", "all"):
        res["rt"] = rt_phases(spark)
    spark.stop()
    print("PROFILE:" + json.dumps(res))


if __name__ == "__main__":
    main()
