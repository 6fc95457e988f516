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
    centroid (k-means-trained on a seeded sample by default;
    ``train_iters=0`` falls back to seeded random projections); a query
    scans only its ``n_probe`` nearest buckets. Returns the same schema
    as brute_force_topk."""
    dim = data.select(F.size(vec_col).alias("d")).first()["d"]
    if train_iters > 0:
        cents = train_centroids(
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
