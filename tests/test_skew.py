"""Skew helpers: salted join and two-stage distinct must equal their
unsalted forms exactly."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from raise_featurestore_spark.functions.skew import salted_count_distinct, salted_join

from tests.conftest import SF_DIR


def test_salted_join_matches_plain_join(spark):
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet")).select(
        "c_custkey", "c_mktsegment"
    ).withColumnRenamed("c_custkey", "o_custkey")

    plain = orders.join(cust, "o_custkey").agg(
        F.count(F.lit(1)), F.round(F.sum("o_totalprice"), 2)
    ).collect()[0]
    salted = salted_join(orders, cust, "o_custkey", salt=8).agg(
        F.count(F.lit(1)), F.round(F.sum("o_totalprice"), 2)
    ).collect()[0]
    assert tuple(plain) == tuple(salted)


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (9, "x")], "k long, v string")
    small = spark.createDataFrame([(1, "A"), (2, "B")], "k long, w string")
    out = {(r["k"], r["w"]) for r in salted_join(big, small, "k", how="left").collect()}
    assert out == {(1, "A"), (2, "B"), (9, None)}
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, "k", how="full")


def test_salt_expression_nonnegative_on_int_min_value(spark):
    """Regression: the salt must be pmod(hash, salt), not abs(hash) % salt.
    abs(Int.MinValue) overflows to Int.MinValue, so the old expression gave a
    NEGATIVE salt for non-power-of-two salts — the big-side row then matched
    no replicated small-side salt (0..salt-1) and was silently dropped."""
    row = spark.range(1).select(F.pmod(F.lit(-2147483648), F.lit(7)).alias("p")).collect()[0]
    assert 0 <= row["p"] < 7
    # the old abs-based expression is broken either way: ANSI mode (Spark 4
    # default) throws on abs(Int.MinValue); legacy mode silently returns a
    # negative salt that drops the row
    try:
        old = spark.range(1).select((F.abs(F.lit(-2147483648)) % 7).alias("o")).collect()[0]["o"]
        assert old < 0
    except Exception:
        pass  # ANSI overflow error — equally fatal for a join key


def test_salted_join_non_power_of_two_salt(spark):
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet")).select(
        "o_orderkey", "o_custkey"
    )
    cust = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet")).select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = orders.join(cust, "o_custkey").count()
    assert salted_join(orders, cust, "o_custkey", salt=7).count() == plain


def test_salted_count_distinct_exact(spark):
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    plain = {
        r["event_type"]: r["d"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    salted = {
        r["event_type"]: r["distinct_user_id"]
        for r in salted_count_distinct(events, "event_type", "user_id", salt=8).collect()
    }
    assert salted == plain


def test_salted_join_tolerates_map_columns_and_guards_salt_name(spark):
    """Regression: the salt hash covered ALL columns, so a MapType column
    (unhashable in Spark) crashed the join; maps are excluded now."""
    from raise_featurestore_spark.functions.skew import salted_join

    big = spark.createDataFrame(
        [(1, {"a": "x"}), (1, {"b": "y"}), (2, {"c": "z"})],
        "k int, props map<string,string>",
    )
    small = spark.createDataFrame([(1, "one"), (2, "two")], "k int, name string")
    out = salted_join(big, small, on="k")
    assert out.count() == 3
    clash = big.withColumnRenamed("props", "p").withColumn("__sj_salt", F.lit(0))
    with pytest.raises(ValueError, match="reserved"):
        salted_join(clash, small, on="k")
