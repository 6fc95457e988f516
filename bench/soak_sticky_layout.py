"""Sticky-layout lifecycle soak: 4M-row base laid out by url, then three
maintenance cycles of (localized crawl delta -> incremental re-layout
compact). Asserts the sticky machinery end-to-end at scale: bounds
reused every cycle, most buckets carried verbatim (layout_kept), compact
wall ∝ delta (not table), disjoint spans maintained, digest
bit-identical against the union of all inputs."""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[32]")
         .appName("p2s-soak-sticky")
         .config("spark.sql.shuffle.partitions", "128")
         .config("spark.driver.memory", "48g")
         .config("spark.driver.extraJavaOptions", "-XX:MaxDirectMemorySize=8g")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
         .config("spark.io.compression.codec", "lz4")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from parquet2_spark.operators import decode_job, table, validate
from parquet2_spark.operators.encode_job import EncodeConfig
from parquet2_spark.sources import webgen

t_all = time.time()
base = "/tmp/p2s_soak_sticky"
shutil.rmtree(base, ignore_errors=True)
os.makedirs(base)
tdir = os.path.join(base, "tbl")
cfg = EncodeConfig(target_rows=131_072, page_rows=8_192, sort_by="url",
                   key="url", host_from_key=False)

def persist(df, tag):
    p = os.path.join(base, f"in_{tag}")
    df.write.mode("overwrite").parquet(p)
    return spark.read.parquet(p)

walls, srcs = {}, []
df0 = persist(webgen.webpages_range_df(spark, 0, 4_000_000, partitions=64), "base")
srcs.append(df0)
table.append(spark, df0, tdir, cfg, range_layout_on="url")
t0 = time.time()
lin = table.compact(spark, tdir, cfg, range_layout_on="url")
walls["layout_compact_full"] = round(time.time() - t0, 1)
doc = table._stored_layout(tdir, cfg, "url")
bounds = table._bounds_from_json(doc["bounds"])
n_buckets = doc["n_parts"]
print(json.dumps({"cycle": 0, "path": lin["compaction_path"],
                  "buckets": n_buckets,
                  "wall_s": walls["layout_compact_full"]}), flush=True)

# three crawl cycles: each delta is a NEW id range filtered to a narrow
# url span (a recrawl of a few hosts) — the localized shape incremental
# re-layout exists for
for cyc in range(1, 4):
    lo_id = 4_000_000 + (cyc - 1) * 4_000_000
    delta_all = webgen.webpages_range_df(spark, lo_id, lo_id + 4_000_000,
                                         partitions=64)
    lo_b = bounds[(3 * cyc) % (len(bounds) - 1)]
    hi_b = bounds[(3 * cyc) % (len(bounds) - 1) + 1]
    delta = persist(
        delta_all.filter(
            (F.col("url").cast("binary") > F.lit(bytes(lo_b)))
            & (F.col("url").cast("binary") <= F.lit(bytes(hi_b)))
        ),
        f"d{cyc}",
    )
    srcs.append(delta)
    nd = delta.count()
    t0 = time.time()
    table.append(spark, delta, tdir, cfg, range_layout_on="url")
    wa = round(time.time() - t0, 1)
    t0 = time.time()
    lin = table.compact(spark, tdir, cfg, range_layout_on="url")
    wc = round(time.time() - t0, 1)
    walls[f"cycle{cyc}_append"] = wa
    walls[f"cycle{cyc}_compact"] = wc
    print(json.dumps({"cycle": cyc, "delta_rows": nd, "path":
                      lin["compaction_path"],
                      "reused": lin.get("layout_bounds_reused"),
                      "kept": lin.get("layout_kept"),
                      "append_s": wa, "compact_s": wc}), flush=True)
    assert lin["compaction_path"] == "local_merge", lin["compaction_path"]
    assert lin["layout_bounds_reused"] is True
    assert lin["layout_kept"] >= n_buckets - 3, lin["layout_kept"]

# invariants: disjoint url spans across every partition, digest exact
ch = decode_job.chunks_df(spark, tdir).filter(F.col("column") == "url") \
    .select("min_bin", "max_bin").collect()
spans = sorted((r["min_bin"], r["max_bin"]) for r in ch)
for (_, ahi), (blo, _) in zip(spans, spans[1:]):
    assert ahi <= blo, "overlapping spans"
src = srcs[0]
for d in srcs[1:]:
    src = src.unionByName(d)
t0 = time.time()
rep = validate.digest_frames(src, decode_job.decode(spark, tdir))
walls["digest"] = round(time.time() - t0, 1)
assert rep["bit_identical"], rep
print(json.dumps({"rows": int(table.read_manifest(tdir)["snapshots"][0]["rows"]),
                  "bit_identical": rep["bit_identical"], "walls": walls,
                  "total_wall_s": round(time.time() - t_all, 1)}), flush=True)
