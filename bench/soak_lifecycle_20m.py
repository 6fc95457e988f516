"""20M-row lifecycle soak (2x the r4/r5 record) chaining the full
maintenance surface: batch-keyed append of a 19.5M-row base -> sticky
range-layout compact -> two LOCALIZED crawl deltas appended with
aligned layout (a recrawl of a few hosts — the shape incremental
re-layout exists for) -> incremental read -> incremental re-layout
compact (>=90% keepers asserted) -> vacuum -> keyed retry -> join-free
digest vs the union of all inputs. Asserts bit-identity, ratio <= 0.33,
and that the incremental compact wall tracks delta bytes, not table
bytes."""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[32]")
         .appName("p2s-soak20m")
         .config("spark.sql.shuffle.partitions", "128")
         .config("spark.driver.memory", "48g")
         .config("spark.driver.extraJavaOptions", "-XX:MaxDirectMemorySize=8g")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
         .config("spark.io.compression.codec", "lz4")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from parquet2_spark import fsio
from parquet2_spark.operators import decode_job, table, validate
from parquet2_spark.operators.encode_job import EncodeConfig
from parquet2_spark.sources import webgen

t_all = time.time()
base = "/tmp/p2s_soak20m"
# deterministic inputs are reusable across runs; only the TABLE must be fresh
os.makedirs(base, exist_ok=True)
tdir = os.path.join(base, "tbl")
shutil.rmtree(tdir, ignore_errors=True)
walls = {}
cfg = EncodeConfig(target_rows=131_072, page_rows=8_192, host_sample_fraction=0.1)

# base: 19.5M rows of one crawl universe
p_a = os.path.join(base, "in_A")
if not os.path.exists(os.path.join(p_a, "_SUCCESS")):
    t0 = time.time()
    webgen.webpages_range_df(spark, 0, 19_500_000, partitions=96).write.mode(
        "overwrite"
    ).parquet(p_a)
    walls["gen_A"] = round(time.time() - t0, 1)

t0 = time.time()
lin = table.append(spark, spark.read.parquet(p_a), tdir, cfg, batch_key="soak-A")
walls["append_A"] = round(time.time() - t0, 1)
print("A rows", lin["rows"], "ratio", round(lin["enc_bytes"] / lin["raw_bytes"], 4), flush=True)

# initial range layout on url — fresh bounds, persists the sticky sidecar
t0 = time.time()
lin = table.compact(spark, tdir, cfg, range_layout_on="url")
walls["layout_full"] = round(time.time() - t0, 1)
print("layout", {k: lin.get(k) for k in ("compaction_path", "layout_bounds_reused", "layout_kept")}, flush=True)
assert lin.get("layout_bounds_reused") is False
mid_base = table.read_manifest(tdir)["current"]
bounds = table._bounds_from_json(table._newest_layout_doc(tdir, cfg)["bounds"])
n_buckets = len(bounds) + 1
print("buckets", n_buckets, flush=True)

# crashed staging dir (claimed, never committed), backdated for vacuum
fs, root = fsio.resolve(tdir, None)
orphan = table._claim_staging_dir(fs, root, table.read_manifest(tdir), 99, batch_key="crashed")
fsio.write_json_atomic(fs, fsio.join(root, orphan, "junk.json"), {"x": 1})
claim_p = fsio.join(root, orphan, table.CLAIM)
c = json.loads(fsio.read_bytes(fs, claim_p)); c["created_unix"] = time.time() - 200_000
fsio.write_json_atomic(fs, claim_p, c)
past = time.time() - 200_000
for b, ds, fls in os.walk(fsio.join(root, orphan), topdown=False):
    for f in fls:
        os.utime(os.path.join(b, f), (past, past))
    for d in ds:
        os.utime(os.path.join(b, d), (past, past))
os.utime(fsio.join(root, orphan), (past, past))

# two LOCALIZED deltas: new id ranges filtered to a ~4-stored-bucket
# url span each (a few hosts recrawled), appended with aligned layout
delta_rows = {}
for i, (lo_id, tag) in enumerate([(19_500_000, "B"), (23_500_000, "C")]):
    span0 = (11 + 47 * i) % (len(bounds) - 5)
    lo_b, hi_b = bounds[span0], bounds[span0 + 4]
    p = os.path.join(base, f"in_{tag}")
    shutil.rmtree(p, ignore_errors=True)  # span may change between runs
    t0 = time.time()
    (webgen.webpages_range_df(spark, lo_id, lo_id + 4_000_000, partitions=64)
        .filter((F.col("url").cast("binary") > F.lit(bytes(lo_b)))
                & (F.col("url").cast("binary") <= F.lit(bytes(hi_b))))
        .write.mode("overwrite").parquet(p))
    walls[f"gen_{tag}"] = round(time.time() - t0, 1)
    df = spark.read.parquet(p)
    delta_rows[tag] = df.count()
    t0 = time.time()
    lin = table.append(spark, df, tdir, cfg, batch_key=f"soak-{tag}",
                       range_layout_on="url")
    walls[f"append_{tag}"] = round(time.time() - t0, 1)
    print(tag, "rows", delta_rows[tag], flush=True)

# incremental read BEFORE compaction folds the snapshots: exactly the deltas
t0 = time.time()
inc = decode_job.decode(spark, tdir, since=mid_base).count()
walls["incremental_read"] = round(time.time() - t0, 1)
assert inc == delta_rows["B"] + delta_rows["C"], (inc, delta_rows)

# incremental re-layout compact: sticky bounds must REUSE, >=90% keepers
t0 = time.time()
lin = table.compact(spark, tdir, cfg, range_layout_on="url")
walls["layout_incremental"] = round(time.time() - t0, 1)
kept, n_parts = int(lin.get("layout_kept") or 0), int(lin["n_partitions_planned"])
print("incremental", {"reused": lin.get("layout_bounds_reused"), "kept": kept,
                      "planned": n_parts, "path": lin.get("compaction_path")}, flush=True)
assert lin.get("compaction_path") == "local_merge", lin.get("compaction_path")
assert lin.get("layout_bounds_reused") is True
assert kept >= 0.9 * n_parts, (kept, n_parts)

# vacuum reclaims the backdated crashed dir, spares everything live
deleted = table.vacuum(tdir, older_than_s=86_400)
assert orphan in deleted, (orphan, deleted)

# keyed retry must short-circuit (exactly-once through compaction)
lin_retry = table.append(spark, spark.read.parquet(os.path.join(base, "in_B")),
                         tdir, cfg, batch_key="soak-B")
assert lin_retry.get("already_committed") is True, "keyed retry duplicated!"

# join-free digest vs the union of all three inputs
t0 = time.time()
src = spark.read.parquet(p_a, os.path.join(base, "in_B"), os.path.join(base, "in_C"))
rep = validate.digest_frames(src, decode_job.decode(spark, tdir))
walls["digest"] = round(time.time() - t0, 1)

lin_tbl = decode_job.lineage(tdir)
ratio = lin_tbl["enc_bytes"] / lin_tbl["raw_bytes"]
out = {
    "rows": lin_tbl["rows"],
    "incremental_rows": inc,
    "ratio": round(ratio, 4),
    "bit_identical": rep["bit_identical"],
    "layout_kept": kept,
    "layout_planned": n_parts,
    "walls": walls,
    "total_wall_s": round(time.time() - t_all, 1),
}
print(json.dumps(out), flush=True)
assert rep["bit_identical"], "digest mismatch"
assert ratio <= 0.33, ratio
spark.stop()
