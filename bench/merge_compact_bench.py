"""Local-merge vs shuffle compaction on range-local inputs.

Builds one table of range-laid-out appends (the delta shape
append(range_layout_on=) produces), snapshots a byte-copy, and times
compact(range_layout_on="url") under both plans. Prints one JSON line
with both walls and the byte-equality of the outputs.

Usage: python bench/merge_compact_bench.py [rows] (default 2_000_000)
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
         .appName("p2s-merge-compact-bench")
         .config("spark.sql.shuffle.partitions", "64")
         .config("spark.driver.memory", "48g")
         .config("spark.driver.extraJavaOptions", "-XX:MaxDirectMemorySize=8g")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
         .config("spark.io.compression.codec", "lz4")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from parquet2_spark.operators import table  # noqa: E402
from parquet2_spark.operators.encode_job import EncodeConfig  # noqa: E402
from parquet2_spark.sources import webgen  # noqa: E402

rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
base = "/tmp/p2s_merge_bench"
shutil.rmtree(base, ignore_errors=True)
os.makedirs(base)
tdir = os.path.join(base, "tbl")

cfg = EncodeConfig(target_rows=131_072, page_rows=8_192, host_sample_fraction=0.1)

# The scenario the local plan targets: a range-laid-out table plus
# range-laid-out deltas (the steady state of append(range_layout_on=)).
# Build it faithfully: first batch (no grids yet) → one layout compaction
# → two laid-out deltas. The un-timed compaction also warms the whole
# encode path, so the timed runs below start JIT-hot.
third = rows // 3
df = webgen.webpages_range_df(spark, 0, third, partitions=64)
p = os.path.join(base, "in_0")
df.write.mode("overwrite").parquet(p)
table.append(spark, spark.read.parquet(p), tdir, cfg)
table.compact(spark, tdir, cfg, range_layout_on="url")
for i, (lo, hi) in enumerate([(third, 2 * third), (2 * third, rows)], start=1):
    df = webgen.webpages_range_df(spark, lo, hi, partitions=64)
    p = os.path.join(base, f"in_{i}")
    df.write.mode("overwrite").parquet(p)
    table.append(spark, spark.read.parquet(p), tdir, cfg,
                 range_layout_on="url")

# Alternate paths on fresh copies of the pristine table, min-of-2 per
# path: host noise only ever ADDS wall, and alternation cancels any
# residual warm-up bias between the two paths.
walls = {"local_merge": [], "shuffle": []}
lins = {}
for rep in range(2):
    for mode, flag in (("shuffle", False), ("local_merge", True)):
        tcopy = os.path.join(base, f"run_{mode}_{rep}")
        shutil.copytree(tdir, tcopy)
        t0 = time.time()
        lin = table.compact(spark, tcopy, cfg, range_layout_on="url",
                            local_merge=flag)
        walls[mode].append(time.time() - t0)
        assert lin["compaction_path"] == mode, (mode, lin["compaction_path"])
        lins[mode] = lin
        shutil.rmtree(tcopy, ignore_errors=True)

from parquet2_spark.operators import decode_job, merge_compact  # noqa: E402

lin = decode_job.lineage(tdir)
n_parts = max(1, -(-int(lin["rows"]) // cfg.target_rows))
bounds = decode_job.range_bounds(spark, tdir, "url", n_parts)
fan = merge_compact.fanout(merge_compact.plan(
    spark, table.snapshot_dirs(tdir), "url", bounds))

wall_local = min(walls["local_merge"])
wall_shuffle = min(walls["shuffle"])
print(json.dumps({
    "rows": lins["local_merge"]["rows"],
    "plan_fanout": round(fan, 2),
    "wall_local_s": round(wall_local, 2),
    "wall_shuffle_s": round(wall_shuffle, 2),
    "speedup": round(wall_shuffle / wall_local, 3),
    "walls_local": [round(w, 2) for w in walls["local_merge"]],
    "walls_shuffle": [round(w, 2) for w in walls["shuffle"]],
    "enc_bytes_local": lins["local_merge"]["enc_bytes"],
    "enc_bytes_shuffle": lins["shuffle"]["enc_bytes"],
    "bytes_equal": (lins["local_merge"]["enc_bytes"]
                    == lins["shuffle"]["enc_bytes"]),
}))
