"""Bucketed storage → shuffle-free co-located joins (io/bucketing.py)."""

from __future__ import annotations

import pytest

from raise_featurestore_spark.io.bucketing import (
    colocated_join,
    exchange_count,
    write_bucketed,
)


@pytest.fixture()
def bucketed_pair(spark):
    # tables land in the session warehouse dir (spark-warehouse/, gitignored)
    users = spark.range(0, 10_000).selectExpr("id AS uid", "id * 2.0 AS spend")
    orders = spark.range(0, 30_000).selectExpr(
        "id % 10000 AS uid", "CAST(id AS DOUBLE) AS amount"
    )
    write_bucketed(users, "b_users", ["uid"], buckets=8)
    write_bucketed(orders, "b_orders", ["uid"], buckets=8)
    yield "b_users", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_users")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_colocated_join_has_no_shuffle(spark, bucketed_pair):
    left, right = bucketed_pair
    # disable broadcast so the only shuffle-free path is bucket co-location
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, left, right, on=["uid"])
        assert joined.count() == 30_000
        assert exchange_count(joined) == 0  # neither side shuffles
        # the same join over un-bucketed frames DOES shuffle — the guard
        # proves the assertion above is meaningful
        plain = spark.table(left).unpersist().selectExpr("uid", "spend").join(
            spark.range(0, 30_000).selectExpr("id % 10000 AS uid"), on=["uid"]
        )
        assert exchange_count(plain) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_write_requires_keys(spark):
    with pytest.raises(ValueError):
        write_bucketed(spark.range(3), "b_bad", [])


def test_exchange_count_excludes_broadcast(spark):
    """exchange_count is a SHUFFLE counter: a broadcast-joined plan has a
    BroadcastExchange node (which contains the substring "Exchange ") but
    zero shuffles and must report 0."""
    from pyspark.sql import functions as F

    from raise_featurestore_spark.io.bucketing import exchange_count

    big = spark.range(1000).withColumnRenamed("id", "k")
    small = spark.createDataFrame([(i, f"v{i}") for i in range(5)], ["k", "v"])
    joined = big.join(F.broadcast(small), "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan  # precondition: broadcast happened
    assert exchange_count(joined) == 0
