"""Point-in-time join (functions/asof.py): semantics vs DuckDB ASOF."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from raise_featurestore_spark.functions.asof import asof_join


def _ts(s: int):
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture()
def frames(spark):
    spine = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(25), "b"), (2, _ts(5), "c"), (3, _ts(9), "d")],
        ["k", "ts", "label"],
    )
    feats = spark.createDataFrame(
        [(1, _ts(10), 1.0), (1, _ts(20), 2.0), (2, _ts(50), 3.0)],
        ["k", "ts", "v"],
    )
    return spine, feats


def test_backward_inclusive_ties(frames):
    spine, feats = frames
    out = {
        (r.k, r.ts.second, r.label): r.v
        for r in asof_join(spine, feats, on="k").collect()
    }
    # k=1 @10 matches the ts==10 row (inclusive); @25 the latest prior (20)
    assert out == {
        (1, 10, "a"): 1.0,
        (1, 25, "b"): 2.0,
        (2, 5, "c"): None,  # only future features exist
        (3, 9, "d"): None,  # entity has no features
    }


def test_forward(frames):
    spine, feats = frames
    out = {
        (r.k, r.ts.second): r.v
        for r in asof_join(spine, feats, on="k", direction="forward").collect()
    }
    assert out == {(1, 10): 1.0, (1, 25): None, (2, 5): 3.0, (3, 9): None}


def test_tolerance_nulls_stale_matches(frames):
    spine, feats = frames
    out = {
        (r.k, r.ts.second): (r.v, r.m)
        for r in asof_join(
            spine, feats, on="k", tolerance_seconds=4, matched_ts_col="m"
        ).collect()
    }
    assert out[(1, 10)] == (1.0, _ts(10))  # gap 0 ≤ 4
    assert out[(1, 25)] == (None, None)  # gap 5 > 4 → nulled
    assert out[(2, 5)] == (None, None)


def test_matches_duckdb_asof(spark, ddb, frames):
    import duckdb

    spine, feats = frames
    got = {
        (r.k, r.label): (r.v, r.m)
        for r in asof_join(spine, feats, on="k", matched_ts_col="m").collect()
    }
    con = duckdb.connect()
    con.register("spine", spine.toPandas())
    con.register("feats", feats.toPandas())
    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.sql(
            "SELECT s.k, s.label, f.v, f.ts FROM spine s "
            "ASOF LEFT JOIN feats f ON s.k = f.k AND s.ts >= f.ts"
        ).fetchall()
    }
    assert got == want


def test_value_column_collision_raises(frames):
    spine, feats = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(spine.withColumnRenamed("label", "v"), feats, on="k")


def test_single_shuffle_plan(frames):
    """The whole as-of is ONE Exchange on the entity key (plus the window
    sort) — the union must not add its own shuffle."""
    spine, feats = frames
    plan = asof_join(spine, feats, on="k")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_null_feature_value_does_not_fall_through(spark):
    """A genuinely NULL feature value must stay NULL on the matched row —
    per-column filling would blend it with an OLDER row's value (and sneak
    stale data past the tolerance gate). Matches DuckDB ASOF semantics."""
    import duckdb

    spine = spark.createDataFrame(
        [(1, dt.datetime(2026, 1, 1, 0, 0, 10))], ["uid", "ts"]
    )
    feat = spark.createDataFrame(
        [
            (1, dt.datetime(2026, 1, 1, 0, 0, 5), 1.0, 9.0),
            (1, dt.datetime(2026, 1, 1, 0, 0, 10), None, 2.0),
        ],
        "uid long, ts timestamp, a double, b double",
    )
    row = asof_join(spine, feat, on="uid", value_cols=["a", "b"]).collect()[0]
    assert row.a is None and row.b == 2.0  # no blend with the ts=5 row
    # tolerance: the NULL-carrying row IS the match; a 2s window must not
    # resurrect the 5s-old a=1.0
    row2 = asof_join(
        spine, feat, on="uid", value_cols=["a", "b"], tolerance_seconds=2
    ).collect()[0]
    assert row2.a is None and row2.b == 2.0
    # cross-engine: DuckDB ASOF returns the same shape
    con = duckdb.connect()
    con.register("s", spine.toPandas())
    con.register("f", feat.toPandas())
    want = con.sql(
        "SELECT s.uid, s.ts, f.a, f.b FROM s ASOF LEFT JOIN f "
        "ON s.uid = f.uid AND s.ts >= f.ts"
    ).fetchall()[0]
    assert want[2] is None or (want[2] != want[2])  # NULL/NaN, never 1.0


def test_salted_equals_unsalted_on_hot_key(spark):
    """salt=N must be result-identical on a 90%-one-key fixture (the shape
    salting exists for: one entity dominating the spine). VERDICT.md r4
    item 6."""
    import random

    rng = random.Random(7)
    # 90% of 2000 spine rows on entity 1; features: 50 ts per entity
    spine_rows = [
        (1 if i < 1800 else rng.randint(2, 20), _ts(rng.randint(0, 10_000)), float(i))
        for i in range(2000)
    ]
    feat_rows = [
        (e, _ts(t * 200), float(e * 1000 + t))
        for e in range(1, 21)
        for t in range(50)
    ]
    spine = spark.createDataFrame(spine_rows, "uid long, ts timestamp, sv double")
    feats = spark.createDataFrame(feat_rows, "uid long, ts timestamp, fv double")

    plain = asof_join(spine, feats, on="uid", matched_ts_col="mts")
    salted = asof_join(spine, feats, on="uid", matched_ts_col="mts", salt=8)
    key = ["uid", "ts", "sv", "fv", "mts"]
    a = sorted(map(tuple, plain.select(key).collect()))
    b = sorted(map(tuple, salted.select(key).collect()))
    assert a == b
    assert len(a) == 2000


def test_salt_reserved_column_raises(frames):
    spine, feat = frames
    with pytest.raises(ValueError, match="__salt"):
        asof_join(
            spine.withColumn("__salt", F.lit(1)), feat, on="k", salt=4
        )
