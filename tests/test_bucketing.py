"""Bucketed co-location: write-once shuffle, shuffle-free joins after.

Pins the physical properties bucketing exists for — if a Spark upgrade
or refactor silently loses them, the 100 TB join story regresses.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rigatoni_spark.operators import bucketing
from rigatoni_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucketdb")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{loc}'")
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    bucketing.write_bucketed(
        orders, "bucketdb.orders_b", "o_orderkey", N_BUCKETS,
        sort_col="o_orderkey",
    )
    bucketing.write_bucketed(
        lineitem, "bucketdb.lineitem_b", "l_orderkey", N_BUCKETS,
        sort_col="l_orderkey",
    )
    yield "bucketdb.orders_b", "bucketdb.lineitem_b"
    spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


class TestBucketedJoin:
    def test_join_has_no_exchange(self, spark, bucketed_tables):
        orders_b, lineitem_b = bucketed_tables
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            # forbid broadcast so the test exercises the co-location path
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            j = bucketing.cobucketed_join(
                spark, lineitem_b, orders_b, "l_orderkey", "o_orderkey"
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan
            assert "SortMergeJoin" in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_join_result_matches_unbucketed(self, spark, bucketed_tables):
        orders_b, lineitem_b = bucketed_tables
        j = bucketing.cobucketed_join(
            spark, lineitem_b, orders_b, "l_orderkey", "o_orderkey"
        )
        n = j.count()
        orders = load_table(spark, SF_DIR, "orders")
        lineitem = load_table(spark, SF_DIR, "lineitem")
        expected = lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).count()
        assert n == expected

    def test_bucketed_agg_skips_exchange(self, spark, bucketed_tables):
        _, lineitem_b = bucketed_tables
        agg = (
            spark.table(lineitem_b)
            .groupBy("l_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
