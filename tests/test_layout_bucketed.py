"""Bucketed co-located join: the zero-exchange plan contract.

The whole point of write_bucketed (sources/io.py) is that two tables
bucketed identically on the join key JOIN WITHOUT ANY EXCHANGE — the
shuffle was paid once at write time.  These tests pin that plan shape
(with broadcast disabled so the bucketed SortMergeJoin is the chosen
strategy) and that the bucketed round-trip is value-lossless.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdfs_stream_processing_spark.plans.inspect import count_shuffles, physical_plan


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    from tests.conftest import SF_DIR

    from hdfs_stream_processing_spark.sources.io import load_table, write_bucketed

    base = tmp_path_factory.mktemp("bkt")
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_extendedprice")
    od = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority")
    write_bucketed(
        li, "t_bkt_li", ["l_orderkey"], num_buckets=4,
        sort_cols=["l_orderkey"], path=str(base / "li"),
    )
    write_bucketed(
        od, "t_bkt_od", ["o_orderkey"], num_buckets=4,
        sort_cols=["o_orderkey"], path=str(base / "od"),
    )
    yield spark.table("t_bkt_li"), spark.table("t_bkt_od"), li, od
    spark.sql("DROP TABLE IF EXISTS t_bkt_li")
    spark.sql("DROP TABLE IF EXISTS t_bkt_od")


def test_bucketed_join_has_zero_exchanges(spark, bucketed_pair):
    bli, bod, _, _ = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bli.join(bod, bli["l_orderkey"] == bod["o_orderkey"])
        plan = physical_plan(joined)
        assert count_shuffles(joined) == 0, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, bucketed_pair):
    bli, bod, li, od = bucketed_pair
    a = (
        bli.join(bod, bli["l_orderkey"] == bod["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    b = (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_bucketed_groupby_on_bucket_key_has_zero_exchanges(spark, bucketed_pair):
    # aggregation on the bucket key also rides the on-disk distribution
    bli, _, _, _ = bucketed_pair
    agg = bli.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    assert count_shuffles(agg) == 0, physical_plan(agg)
