"""Split-block bloom filter unit tests (reference src/bloom_filter parity)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from parquet2_spark.plans import bloom

RNG = np.random.default_rng(11)


def test_no_false_negatives():
    keys = RNG.integers(0, 1 << 63, size=5000).astype(np.uint64)
    bits = bloom.build(keys, fpp=0.01)
    assert bloom.might_contain(bits, keys).all()


def test_false_positive_rate_reasonable():
    keys = RNG.integers(0, 1 << 62, size=10000).astype(np.uint64)
    other = RNG.integers(1 << 62, 1 << 63, size=10000).astype(np.uint64)
    bits = bloom.build(keys, fpp=0.01)
    fp = bloom.might_contain(bits, other).mean()
    assert fp < 0.05, fp


def test_definitely_absent_is_definite():
    keys = np.array([1, 2, 3], dtype=np.uint64)
    bits = bloom.build(keys, n_blocks=4)
    probe = np.arange(1000, dtype=np.uint64)
    got = bloom.might_contain(bits, probe)
    assert got[1] and got[2] and got[3]


def test_sizing_monotone():
    assert bloom.optimal_num_blocks(100) <= bloom.optimal_num_blocks(100_000)
    assert bloom.optimal_num_blocks(0) == 1


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1), min_size=1, max_size=400),
        st.integers(min_value=1, max_value=64),
    )
    @settings(max_examples=200, deadline=None)
    def test_property_never_false_negative(keys, n_blocks):
        h = np.array(keys, dtype=np.uint64)
        bits = bloom.build(h, n_blocks=n_blocks)
        assert bloom.might_contain(bits, h).all()

except ImportError:  # pragma: no cover
    pass


def test_bloom_build_tree_merge_matches_flat(spark):
    from parquet2_spark.operators.stats_query import bloom_build, bloom_probe

    df = spark.range(5000).select(F.concat(F.lit("k"), F.col("id")).alias("key")).repartition(20)
    flat = bloom_build(df, "key", n_blocks=64, fanin=1000)   # driver merge only
    tree = bloom_build(df, "key", n_blocks=64, fanin=4)      # executor OR level
    assert flat == tree
    probes = spark.createDataFrame([("k17",), ("absent-key",)], "key string")
    got = {r["key"]: r["might_contain"] for r in bloom_probe(spark, probes, "key", tree).collect()}
    assert got["k17"] is True
