"""Similarity search over embedding columns.

- brute-force cosine top-k: the exact baseline. Broadcast the (small)
  query set, JVM-side dot products via zip_with/aggregate, per-query
  top-k with a window — one shuffle of (queries × rows) scored pairs
  pre-pruned by nothing (exact), but never a rows×rows join.
- IVF-style bucketed ANN: deterministic coarse quantizer (seeded
  projections); candidates only from the query's nearest buckets, exact
  cosine re-ranking on candidates. At 100 TB the bucket column is what
  you'd partition/cluster the table by, so a probe touches few files.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _norm_col(vec_col: str):
    return F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x * x))


def brute_force_topk(
    data: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. ``queries``: (query_id, embedding)."""
    d = data.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v"),
        _norm_col(vec_col).alias("_nv"),
    )
    q = queries.select(
        F.col(qid_col).alias("query_id"),
        F.col(vec_col).alias("_q"),
        _norm_col(vec_col).alias("_nq"),
    )
    dot = F.aggregate(F.zip_with("_v", "_q", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    scored = d.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        (dot / (F.col("_nv") * F.col("_nq"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .select("query_id", "vec_id", "cosine", F.col("_rank").alias("rank"))
    )


def _coarse_centroids(dim: int, n_buckets: int, seed: int = 777) -> np.ndarray:
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_buckets, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def train_centroids(
    data: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_buckets: int = 16,
    iters: int = 5,
    sample_cap: int = 4096,
    seed: int = 777,
) -> np.ndarray:
    """Deterministic spherical k-means on a bounded sample — the coarse
    quantizer real IVF indexes train (random projections ignore the data
    distribution, so clustered embeddings all land in few buckets and
    partial-probe recall sags).

    The sample is the ``sample_cap`` rows with the smallest
    xxhash64(id) — a seeded pseudo-random draw that is deterministic
    regardless of partitioning and runs as TakeOrdered (top-n per
    partition + merge), one pass, no full sort, no count."""
    rows = (
        data.select(F.col(vec_col).alias("_v"))
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(sample_cap)
        .collect()
    )
    X = np.stack([np.asarray(r["_v"], dtype=np.float64) for r in rows])
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = X[rng.choice(len(X), size=min(n_buckets, len(X)), replace=False)].copy()
    if len(cents) < n_buckets:  # degenerate tiny input: pad with random
        cents = np.vstack([cents, _coarse_centroids(X.shape[1], n_buckets - len(cents), seed)])
    for _ in range(iters):
        assign = (X @ cents.T).argmax(axis=1)
        for j in range(n_buckets):
            members = X[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
        cents = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    return cents


def train_centroids_distributed(
    data: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_buckets: int = 16,
    iters: int = 5,
    seed: int = 777,
) -> np.ndarray:
    """Distributed Lloyd's k-means for the IVF coarse quantizer — no
    driver-side sample cap: every vector participates, at any scale.

    Each iteration is one pass: ``mapInPandas`` reduces a whole input
    partition to at most ``n_buckets`` partial rows (assignment counts +
    per-cluster vector sums — O(k·dim) per partition, never the vectors
    themselves), ``applyInPandas`` keyed by cluster folds partials to the
    new centroid, and only k tiny centroids return to the driver to seed
    the next round's broadcast closure. Deterministic for a fixed input
    layout: seeded init (smallest xxhash64(id) rows), fixed iteration
    count, and partials summed in partition-id order so float addition
    order never depends on shuffle arrival."""
    import pandas as _pd

    # seeded deterministic init: the k rows with smallest xxhash64(id)
    # (a pseudo-random draw independent of partitioning), padded with
    # unit random projections when the input has fewer rows than buckets
    rows = (
        data.select(F.col(vec_col).alias("_v"))
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(n_buckets)
        .collect()
    )
    X0 = np.stack([np.asarray(r["_v"], dtype=np.float64) for r in rows])
    X0 = X0 / np.maximum(np.linalg.norm(X0, axis=1, keepdims=True), 1e-12)
    cents = X0
    if len(cents) < n_buckets:
        cents = np.vstack(
            [cents, _coarse_centroids(X0.shape[1], n_buckets - len(cents), seed)]
        )
    src = data.select(F.col(vec_col).alias("_v"))

    for _ in range(iters):
        C = cents  # broadcast into this round's closures

        def partials(pdfs, C=C):
            from pyspark import TaskContext

            acc_cnt = np.zeros(len(C), dtype=np.int64)
            acc_sum = np.zeros_like(C)
            for pdf in pdfs:
                if not len(pdf):
                    continue
                mat = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
                mat = mat / np.maximum(
                    np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
                )
                a = (mat @ C.T).argmax(axis=1)
                np.add.at(acc_cnt, a, 1)
                np.add.at(acc_sum, a, mat)
            pid = TaskContext.get().partitionId()
            nz = np.flatnonzero(acc_cnt)
            yield _pd.DataFrame(
                {
                    "pid": np.full(len(nz), pid, dtype=np.int32),
                    "cluster": nz.astype(np.int32),
                    "cnt": acc_cnt[nz],
                    "vsum": [acc_sum[j].tolist() for j in nz],
                }
            )

        def reduce_cluster(pdf):
            pdf = pdf.sort_values("pid")  # deterministic fp addition order
            vs = np.sum(np.stack(pdf["vsum"].to_numpy()), axis=0)
            return _pd.DataFrame(
                {
                    "cluster": [int(pdf["cluster"].iloc[0])],
                    "cnt": [int(pdf["cnt"].sum())],
                    "vsum": [vs.tolist()],
                }
            )

        pt = src.mapInPandas(
            partials, "pid int, cluster int, cnt long, vsum array<double>"
        )
        got = (
            pt.groupBy("cluster")
            .applyInPandas(reduce_cluster, "cluster int, cnt long, vsum array<double>")
            .collect()
        )
        new = cents.copy()  # empty clusters keep their previous centroid
        for r in got:
            if r["cnt"]:
                v = np.asarray(r["vsum"], dtype=np.float64) / r["cnt"]
                nrm = np.linalg.norm(v)
                if nrm > 1e-12:
                    new[r["cluster"]] = v / nrm
        cents = new
    return cents


def ivf_topk(
    data: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_buckets: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "query_id",
    train_iters: int = 5,
) -> DataFrame:
    """IVF-bucketed approximate top-k: assign every vector to its nearest
    centroid (distributed full-pass k-means by default — no driver-side
    sample cap; ``train_iters=0`` falls back to seeded random
    projections); a query scans only its ``n_probe`` nearest buckets.
    Returns the same schema as brute_force_topk."""
    dim = data.select(F.size(vec_col).alias("d")).first()["d"]
    if train_iters > 0:
        cents = train_centroids_distributed(
            data, vec_col=vec_col, id_col=id_col, n_buckets=n_buckets, iters=train_iters
        )
    else:
        cents = _coarse_centroids(dim, n_buckets)

    @F.pandas_udf("int")
    def assign(s: pd.Series) -> pd.Series:
        mat = np.stack(s.to_numpy())
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pd.Series((mat @ cents.T).argmax(axis=1).astype(np.int32))

    @F.pandas_udf("array<int>")
    def probes(s: pd.Series) -> pd.Series:
        mat = np.stack(s.to_numpy())
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(mat @ cents.T), axis=1)[:, :n_probe]
        return pd.Series([row.astype(np.int32).tolist() for row in order])

    d = data.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v"),
        _norm_col(vec_col).alias("_nv"),
        assign(F.col(vec_col)).alias("_bucket"),
    )
    q = queries.select(
        F.col(qid_col).alias("query_id"),
        F.col(vec_col).alias("_q"),
        _norm_col(vec_col).alias("_nq"),
        F.explode(probes(F.col(vec_col))).alias("_bucket"),
    )
    dot = F.aggregate(F.zip_with("_v", "_q", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    scored = d.join(F.broadcast(q), "_bucket").select(
        "query_id", "vec_id", (dot / (F.col("_nv") * F.col("_nq"))).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .select("query_id", "vec_id", "cosine", F.col("_rank").alias("rank"))
    )
