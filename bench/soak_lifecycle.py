"""10M-row table lifecycle soak: append x3 (one keyed retry) -> crashed
staging dir -> incremental read -> compact -> vacuum -> digest validation."""
import os, sys, time, json, shutil
sys.path.insert(0, "/root/repo")
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[32]")
         .appName("p2s-soak10m")
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
base = "/tmp/p2s_soak10m"
shutil.rmtree(base, ignore_errors=True)
os.makedirs(base)
tdir = os.path.join(base, "tbl")

def gen(lo, hi, path):
    # disjoint id ranges of ONE crawl universe (same seed): the shape of
    # periodic crawl deltas — see webgen.webpages_range_df
    df = webgen.webpages_range_df(spark, lo, hi, partitions=64)
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)

cfg = EncodeConfig(target_rows=131_072, page_rows=8_192, host_sample_fraction=0.1)
walls = {}
batches = [(0, 4_000_000, "A"), (4_000_000, 7_000_000, "B"), (7_000_000, 10_000_000, "C")]
paths = {}
for lo, hi, tag in batches:
    p = os.path.join(base, f"in_{tag}")
    t0 = time.time()
    df = gen(lo, hi, p)
    paths[tag] = p
    walls[f"gen_{tag}"] = round(time.time() - t0, 1)

for lo, hi, tag in batches:
    df = spark.read.parquet(paths[tag])
    t0 = time.time()
    lin = table.append(spark, df, tdir, cfg, batch_key=f"soak-{tag}")
    walls[f"append_{tag}"] = round(time.time() - t0, 1)
    print(tag, "rows", lin["rows"], "ratio", round(lin["enc_bytes"]/lin["raw_bytes"], 4), flush=True)

# keyed retry of B must short-circuit (exactly-once)
lin_retry = table.append(spark, spark.read.parquet(paths["B"]), tdir, cfg, batch_key="soak-B")
assert lin_retry.get("already_committed") is True, "keyed retry duplicated!"

# crashed staging dir (claimed, never committed) for vacuum to reclaim
fs, root = fsio.resolve(tdir, None)
orphan = table._claim_staging_dir(fs, root, table.read_manifest(tdir), 99, batch_key="crashed")
claim_p = fsio.join(root, orphan, table.CLAIM)
c = json.loads(fsio.read_bytes(fs, claim_p)); c["created_unix"] = time.time() - 200_000
fsio.write_json_atomic(fs, claim_p, c)
past = time.time() - 200_000
for b, ds, fls in os.walk(fsio.join(root, orphan), topdown=False):
    for f in fls: os.utime(os.path.join(b, f), (past, past))
    for d in ds: os.utime(os.path.join(b, d), (past, past))
os.utime(fsio.join(root, orphan), (past, past))

# incremental read: snapshots after the first = B + C rows
t0 = time.time()
inc = decode_job.decode(spark, tdir, since=1).count()
walls["incremental_read"] = round(time.time() - t0, 1)
assert inc == 6_000_000, inc

# compact all three snapshots into one
t0 = time.time()
lin_c = table.compact(spark, tdir, EncodeConfig(target_rows=131_072, page_rows=8_192,
                                                host_sample_fraction=0.1))
walls["compact"] = round(time.time() - t0, 1)
man = table.read_manifest(tdir)
assert len(man["snapshots"]) == 1
assert sorted(man["snapshots"][0]["compacted_batch_keys"]) == ["soak-A", "soak-B", "soak-C"]

# vacuum reclaims the crashed dir (and the pre-compact leftovers are gone)
deleted = table.vacuum(tdir, older_than_s=86_400)
assert orphan in deleted, (orphan, deleted)

# keyed retry AFTER compaction still short-circuits
lin_retry2 = table.append(spark, spark.read.parquet(paths["B"]), tdir, cfg, batch_key="soak-B")
assert lin_retry2.get("already_committed") is True

# digest validation: decoded table == union of the three source batches
t0 = time.time()
src = spark.read.parquet(paths["A"]).unionByName(
    spark.read.parquet(paths["B"])).unionByName(spark.read.parquet(paths["C"]))
dec = decode_job.decode(spark, tdir)
rep = validate.digest_frames(src, dec)
walls["digest"] = round(time.time() - t0, 1)
assert rep["bit_identical"], rep

ratio = lin_c["enc_bytes"] / lin_c["raw_bytes"]
print(json.dumps({"rows": lin_c["rows"], "raw_gb": round(lin_c["raw_bytes"]/1e9, 2),
                  "enc_gb": round(lin_c["enc_bytes"]/1e9, 2), "ratio": round(ratio, 4),
                  "bit_identical": rep["bit_identical"], "vacuumed": deleted,
                  "walls": walls, "total_wall_s": round(time.time()-t_all, 1)}))
