"""Key-skew advisor (analytics/skew_report.py): heavy-hitter ranking,
NULL-as-hot-key handling, hot_factor semantics, empty input."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from raise_featurestore_spark.analytics.skew_report import skew_report


@pytest.fixture()
def hot_df(spark):
    # key column: 900 rows of 'hot', 50 of NULL, 50 spread over 10 cold keys
    rows = (
        [("hot", i) for i in range(900)]
        + [(None, i) for i in range(50)]
        + [(f"cold{i % 10}", i) for i in range(50)]
    )
    return spark.createDataFrame(rows, ["k", "x"])


def test_ranks_heavy_hitters_with_null_key(hot_df):
    out = {r.rank: r for r in skew_report(hot_df, ["k"], top_k=3).collect()}
    assert out[1].value == "hot" and out[1].cnt == 900
    assert out[2].value is None and out[2].cnt == 50  # real NULL, no sentinel
    assert out[1].frac == pytest.approx(0.9)
    # 12 distinct keys (hot, null, cold0..9); mean group = 1000/12 rows,
    # so the hot key is 900 * 12 / 1000 = 10.8x the mean
    assert out[1].hot_factor == pytest.approx(10.8)


def test_multi_column_single_query(hot_df):
    df = hot_df.withColumn("even", (F.col("x") % 2 == 0).cast("string"))
    out = skew_report(df, ["k", "even"], top_k=2).collect()
    by_col = {}
    for r in out:
        by_col.setdefault(r.column_name, []).append(r)
    assert set(by_col) == {"k", "even"}
    # a balanced boolean column has hot_factor ~= 1 (no skew)
    assert all(abs(r.hot_factor - 1.0) < 0.2 for r in by_col["even"])


def test_deterministic_under_repartition(hot_df):
    a = sorted(map(tuple, skew_report(hot_df, ["k"], top_k=5).collect()))
    b = sorted(
        map(tuple, skew_report(hot_df.repartition(13), ["k"], top_k=5).collect())
    )
    assert a == b


def test_empty_input_yields_zero_rows(spark):
    df = spark.createDataFrame([], "k string, x long")
    assert skew_report(df, ["k"]).count() == 0


def test_unknown_column_raises(hot_df):
    with pytest.raises(ValueError, match="nope"):
        skew_report(hot_df, ["nope"])
    with pytest.raises(ValueError):
        skew_report(hot_df, [])


# ---------------------------------------------------- join cardinality


def test_join_cardinality_exact_vs_actual_join(spark):
    from raise_featurestore_spark.functions.join_estimate import (
        equi_join_cardinality,
    )

    left = spark.createDataFrame(
        [("hot",)] * 100 + [("a",)] * 3 + [("b",)] * 2 + [("only_left",)],
        ["k"],
    )
    right = spark.createDataFrame(
        [("hot",)] * 50 + [("a",)] * 4 + [("only_right",)] * 7, ["k"]
    )
    est = equi_join_cardinality(left, right, on="k").collect()[0]
    actual = left.join(right, "k").count()
    assert est.est_rows == actual == 100 * 50 + 3 * 4
    assert est.top_key_rows == 5000
    assert est.matched_keys == 2
    assert est.n_left == 106 and est.n_right == 61
    assert est.top_key_frac == pytest.approx(5000 / 5012, rel=1e-4)


def test_join_cardinality_disjoint_keys(spark):
    from raise_featurestore_spark.functions.join_estimate import (
        equi_join_cardinality,
    )

    left = spark.createDataFrame([("x",)], ["k"])
    right = spark.createDataFrame([("y",)], ["k"])
    est = equi_join_cardinality(left, right, on="k").collect()[0]
    assert est.est_rows == 0 and est.top_key_frac == 0.0
    assert est.amplification == 0.0


def test_null_does_not_collide_with_literal_null_string(spark):
    # a column holding BOTH real NULLs and the string '__null__' must
    # report them as separate keys (in-band sentinels conflate them)
    df = spark.createDataFrame(
        [("__null__",)] * 7 + [(None,)] * 3, "k string"
    )
    out = skew_report(df, ["k"], top_k=5).collect()
    assert len(out) == 2
    assert (out[0].value, out[0].cnt) == ("__null__", 7)
    assert out[1].value is None and out[1].cnt == 3


def test_rejects_float_key_columns(spark):
    df = spark.createDataFrame([(1.5, "a")], ["f", "s"])
    with pytest.raises(ValueError, match="string/integer/boolean"):
        skew_report(df, ["f"])


def test_join_cardinality_hot_key_beyond_int64(spark):
    # lc * rc > 2^63 must not wrap (Spark) nor raise (DuckDB twin):
    # histogram counts are synthetic here — build the histograms directly
    # through the double path by checking the math holds at 2^62-ish scale
    from raise_featurestore_spark.functions.join_estimate import (
        equi_join_cardinality,
    )

    # 3e5 x 3e5 rows via one hot key on both sides would need 9e10-row
    # fixtures; instead assert the formula path stays finite and positive
    # for counts whose product exceeds int64 by mocking counts via groupBy
    # of pre-aggregated weights is not supported — so this test pins the
    # REPRESENTATION: doubles, not longs
    left = spark.createDataFrame([("hot",)] * 1000, ["k"])
    right = spark.createDataFrame([("hot",)] * 1000, ["k"])
    row = equi_join_cardinality(left, right, on="k").collect()[0]
    assert isinstance(row.est_rows, float) and row.est_rows == 1_000_000.0
