"""Scale hardening for the dedup/similarity hot paths: hot-bucket
salt-split, signature/vector-free join shuffles, multi-table LSH recall,
and k-means-trained IVF centroids."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from parquet2_spark.operators import dedup, similarity


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestLshSkew:
    def test_mega_bucket_bounded_and_planted_found(self, spark):
        # 600 identical boilerplate docs (a degenerate bucket in every
        # band) + 3 planted near-dup pairs of distinct text
        rng = np.random.default_rng(99)
        words = [f"w{i}" for i in range(500)]
        boiler = " ".join(words[:60])
        texts = [boiler] * 600
        planted = []
        for p in range(3):
            base = " ".join(rng.choice(words, size=80).tolist())
            near = base.replace("w1", "w499") if "w1" in base else base + " extra"
            planted.append((len(texts), len(texts) + 1))
            texts += [base, near]
        df = _docs(spark, texts)
        out = dedup.minhash_lsh_pairs(df, bucket_cap=64).persist()
        pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
        for a, b in planted:
            assert (a, b) in pairs
        # the mega bucket is salt-split: candidate volume is far below the
        # all-pairs quadratic (C(600,2) = 179,700 within-boiler pairs)
        boiler_pairs = sum(1 for a, b in pairs if a < 600 and b < 600)
        assert 0 < boiler_pairs < 60_000
        # est_jaccard for identical docs is exactly 1.0
        ones = out.filter((F.col("id_a") < 600) & (F.col("id_b") < 600))
        assert ones.filter(F.col("est_jaccard") < 1.0).count() == 0

    def test_no_cap_unchanged_semantics(self, spark):
        texts = [f"unique document number {i} with words {i*7} {i*13}" for i in range(50)]
        texts[10] = texts[40]  # one exact dup pair
        df = _docs(spark, texts)
        pairs = {(r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_pairs(df).collect()}
        assert (10, 40) in pairs


class TestEmbeddingNearDupTables:
    @pytest.fixture(scope="class")
    def vecs(self, spark):
        rng = np.random.default_rng(4242)
        rows = []
        planted = []
        vid = 0
        for _ in range(40):  # 40 near-dup pairs at cosine ~0.97
            base = rng.standard_normal(32)
            base /= np.linalg.norm(base)
            noise = rng.standard_normal(32) * 0.04
            near = base + noise
            rows.append((vid, base.tolist()))
            rows.append((vid + 1, near.tolist()))
            planted.append((vid, vid + 1))
            vid += 2
        for _ in range(400):  # background
            v = rng.standard_normal(32)
            rows.append((vid, v.tolist()))
            vid += 1
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        return df, planted

    def test_multi_table_beats_single(self, spark, vecs):
        df, planted = vecs
        want = set(planted)

        def recall(n_tables):
            got = {
                (r["id_a"], r["id_b"])
                for r in dedup.embedding_near_dup(
                    df, threshold=0.9, n_planes=12, n_tables=n_tables
                ).collect()
            }
            return len(got & want) / len(want)

        r1, r8 = recall(1), recall(8)
        assert r8 > r1  # more tables, more recall
        assert r8 >= 0.95  # the multi-table config actually catches them

    def test_bucket_cap_still_finds_exact_dups(self, spark):
        rng = np.random.default_rng(7)
        v = rng.standard_normal(16)
        rows = [(i, v.tolist()) for i in range(300)]  # one mega cluster
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = dedup.embedding_near_dup(df, threshold=0.99, bucket_cap=50)
        n = out.count()
        assert 0 < n < 300 * 299 / 2  # capped, not all-pairs


class TestTrainedIvf:
    @pytest.fixture(scope="class")
    def clustered(self, spark):
        rng = np.random.default_rng(31337)
        centers = rng.standard_normal((8, 24)) * 4
        rows = []
        vid = 0
        for c in range(8):
            for _ in range(120):
                v = centers[c] + rng.standard_normal(24) * 0.3
                rows.append((vid, v.tolist()))
                vid += 1
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_trained_beats_random_at_partial_probe(self, spark, clustered):
        q = clustered.filter(F.col("vec_id") % 120 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        exact = {
            (r["query_id"], r["vec_id"])
            for r in similarity.brute_force_topk(clustered, q, k=5).collect()
        }

        def recall(train_iters):
            got = {
                (r["query_id"], r["vec_id"])
                for r in similarity.ivf_topk(
                    clustered, q, k=5, n_buckets=8, n_probe=1, train_iters=train_iters
                ).collect()
            }
            return len(got & exact) / len(exact)

        assert recall(5) > recall(0)
        assert recall(5) >= 0.9  # trained centroids align with the clusters

    def test_full_probe_equals_brute_force(self, spark, clustered):
        q = clustered.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
        bf = similarity.brute_force_topk(clustered, q, k=5)
        ivf = similarity.ivf_topk(clustered, q, k=5, n_buckets=8, n_probe=8)
        got = {(r["query_id"], r["vec_id"], r["rank"]) for r in ivf.collect()}
        want = {(r["query_id"], r["vec_id"], r["rank"]) for r in bf.collect()}
        assert got == want

    def test_train_centroids_deterministic(self, spark, clustered):
        c1 = similarity.train_centroids(clustered, n_buckets=8, iters=3)
        c2 = similarity.train_centroids(clustered, n_buckets=8, iters=3)
        assert np.array_equal(c1, c2)

    def test_distributed_train_deterministic(self, spark, clustered):
        c1 = similarity.train_centroids_distributed(clustered, n_buckets=8, iters=3)
        c2 = similarity.train_centroids_distributed(clustered, n_buckets=8, iters=3)
        assert np.array_equal(c1, c2)

    def test_distributed_train_beyond_old_sample_cap(self, spark):
        """10x the old 4096-row driver sample cap (40960 vectors): the
        distributed trainer sees EVERY vector (no cap to hit), and
        partial-probe recall on a cleanly clustered set stays >= the
        0.9 bar the capped trainer met at small scale."""
        rng = np.random.default_rng(90210)
        centers = rng.standard_normal((8, 24)) * 4
        rows = []
        vid = 0
        for c in range(8):
            for _ in range(5120):  # 8 x 5120 = 40960 vectors
                v = centers[c] + rng.standard_normal(24) * 0.3
                rows.append((vid, v.tolist()))
                vid += 1
        big = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).repartition(16).cache()
        big.count()
        q = big.filter(F.col("vec_id") % 5120 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        exact = {
            (r["query_id"], r["vec_id"])
            for r in similarity.brute_force_topk(big, q, k=5).collect()
        }
        got = {
            (r["query_id"], r["vec_id"])
            for r in similarity.ivf_topk(
                big, q, k=5, n_buckets=8, n_probe=1, train_iters=5
            ).collect()
        }
        assert len(got & exact) / len(exact) >= 0.9
        big.unpersist()


class TestSimhashNearDup:
    def test_finds_near_dups_and_bounds_hamming(self, spark):
        texts = []
        planted = []
        rng = np.random.default_rng(2024)
        words = [f"word{i}" for i in range(400)]
        for p in range(30):
            base_words = rng.choice(words, size=120).tolist()
            near_words = list(base_words)
            near_words[5] = "CHANGED"  # one token differs → tiny hamming
            planted.append((len(texts), len(texts) + 1))
            texts += [" ".join(base_words), " ".join(near_words)]
        for i in range(200):  # unrelated background
            texts.append(" ".join(rng.choice(words, size=60).tolist()))
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        out = dedup.simhash_near_dup(df, max_hamming=6)
        got = {(r["id_a"], r["id_b"]): r["hamming"] for r in out.collect()}
        found = sum((a, b) in got for a, b in planted)
        assert found >= 0.8 * len(planted)  # banded recall on tiny-distance pairs
        assert all(h <= 6 for h in got.values())

    def test_identical_docs_hamming_zero(self, spark):
        df = spark.createDataFrame(
            [(0, "same text here"), (1, "same text here"), (2, "totally different words")],
            "doc_id long, text string",
        )
        out = {(r["id_a"], r["id_b"]): r["hamming"]
               for r in dedup.simhash_near_dup(df, max_hamming=0).collect()}
        assert out == {(0, 1): 0}
