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
third = rows // 3
for i, (lo, hi) in enumerate([(0, third), (third, 2 * third), (2 * third, rows)]):
    df = webgen.webpages_range_df(spark, lo, hi, partitions=64)
    p = os.path.join(base, f"in_{i}")
    df.write.mode("overwrite").parquet(p)
    table.append(spark, spark.read.parquet(p), tdir, cfg,
                 range_layout_on="url" if i else None)

tdir2 = os.path.join(base, "tbl_shuffle")
shutil.copytree(tdir, tdir2)

t0 = time.time()
lin_l = table.compact(spark, tdir, cfg, range_layout_on="url")
wall_local = time.time() - t0
t0 = time.time()
lin_s = table.compact(spark, tdir2, cfg, range_layout_on="url",
                      local_merge=False)
wall_shuffle = time.time() - t0

print(json.dumps({
    "rows": lin_l["rows"],
    "path_auto": lin_l["compaction_path"],
    "wall_local_s": round(wall_local, 2),
    "wall_shuffle_s": round(wall_shuffle, 2),
    "speedup": round(wall_shuffle / wall_local, 3),
    "enc_bytes_local": lin_l["enc_bytes"],
    "enc_bytes_shuffle": lin_s["enc_bytes"],
    "bytes_equal": lin_l["enc_bytes"] == lin_s["enc_bytes"],
}))
