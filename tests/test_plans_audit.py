"""Physical-plan audit (PLANS.md): the scale-critical plan properties are
asserted, not just claimed — pushdown at the scan, broadcast of small
sides, no payload columns in projected ReadSchema."""

from __future__ import annotations

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F

from parquet2_spark.operators import decode_job, dedup
from parquet2_spark.operators.encode_job import EncodeConfig, encode, plan_partitions
from parquet2_spark.sources import webgen


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def snap(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("plan_snap"))
    encode(spark, webgen.webpages_df(spark, 4000, partitions=4), d,
           EncodeConfig(target_rows=1000, page_rows=200))
    return d


def test_encode_planner_broadcasts_hot_hosts(spark):
    # hot-host salting must never shuffle the data: when hot hosts exist
    # the (eagerly collected) hot table joins as a BROADCAST literal;
    # when none exist (this 4-host input, r6) the join vanishes from the
    # plan entirely — either way no shuffle-side join is acceptable
    df = webgen.webpages_df(spark, 4000, partitions=4)
    planned, _ = plan_partitions(df, EncodeConfig(target_rows=1000))
    plan = _explain(planned)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    if "Join" in plan:
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # a SKEWED input (one hot host) must still produce the broadcast join
    hot_df = webgen.webpages_df(spark, 4000, partitions=4).withColumn(
        "url", F.concat(F.lit("https://hot.example.com/"), F.col("url"))
    )
    planned2, _ = plan_partitions(hot_df, EncodeConfig(target_rows=1000))
    plan2 = _explain(planned2)
    assert "BroadcastHashJoin" in plan2 or "BroadcastNestedLoopJoin" in plan2


def test_decode_projection_pushes_column_filter(spark, snap):
    plan = _explain(decode_job.decode(spark, snap, columns=["url"]))
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(column,url\)", plan)
    # stats/bloom columns pruned from the projected scan's ReadSchema
    rs = re.search(r"ReadSchema: [^\n]*", plan).group(0)
    assert "bloom" not in rs and "min_bin" not in rs


def test_key_range_pushes_zone_map_filters_to_scan(spark, snap):
    plan = _explain(
        decode_job.decode(spark, snap, key_range=("url", "https://host001", "https://host004"))
    )
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    assert "max_bin" in pushed and "min_bin" in pushed  # zone maps AT the scan
    assert "BroadcastHashJoin" in plan  # surviving part_ids broadcast


def test_lsh_census_broadcast_and_smj_candidates(spark):
    docs = spark.createDataFrame(
        [(i, f"text number {i} with words {i * 3}") for i in range(300)],
        "doc_id long, text string",
    )
    plan = _explain(dedup.minhash_lsh_pairs(docs))
    assert "BroadcastHashJoin" in plan  # hot-bucket census
    assert "SortMergeJoin" in plan  # big-big candidate self-join
