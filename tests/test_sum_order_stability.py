"""Partition-perturbation determinism: the round-4 driver flake class.

A double aggregate's partial-merge order depends on partitioning; in the
driver's environment a different partitioning flipped the last rounded
decimal of `agg_global_stats` (variance ~1e9 on a 1e-4 absolute grid) and a
thresholded metric in `filter_quality_rules` (VERDICT.md r4 items 1-2).
The fix — 5-significant-digit snapping (`functions/stable.sig_round`) for
unbounded-magnitude metrics, coarse-grid thresholds in the quality rules —
must make the driver's canonical value hash IDENTICAL under any
partitioning. This test perturbs both `spark.sql.shuffle.partitions` and
the input partition count and asserts hash equality, which decimal-only
rounding cannot guarantee (that is exactly what r4 proved).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from conftest import SF_DIR

PERTURB = [(1, 1), (7, 3), (32, 32)]


def _hash(df) -> tuple:
    from driver_sim import canon

    return canon(df.toPandas())


def _run_perturbed(spark, build):
    """Canonical hashes of `build(spark)` under each (shuffle, input) split."""
    out = []
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for shuffle_parts, input_parts in PERTURB:
            spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_parts))
            out.append(_hash(build(spark, input_parts)))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    return out


@pytest.fixture(scope="module")
def orders_path():
    return os.path.join(SF_DIR, "orders.parquet")


def test_global_stats_hash_stable_across_partitionings(spark, orders_path):
    from raise_featurestore_spark.analytics.aggregation import compile_aggregation
    from raise_featurestore_spark.analytics.analysis import Aggregation

    spec = Aggregation(
        features=["o_totalprice"],
        metrics=["count", "distinct_count", "null_rate", "null_count", "stddev",
                 "variance", "median", "p50", "p75", "p90", "p95", "p99"],
    )

    def build(s, nparts):
        df = s.read.parquet(orders_path).repartition(nparts)
        return compile_aggregation(df, spec)

    hashes = _run_perturbed(spark, build)
    assert hashes[0] == hashes[1] == hashes[2], hashes


def test_grouped_sums_hash_stable_across_partitionings(spark):
    from raise_featurestore_spark.analytics.aggregation import compile_aggregation
    from raise_featurestore_spark.analytics.analysis import Aggregation
    from raise_featurestore_spark.tables import load_table

    spec = Aggregation(
        features=["l_extendedprice", "l_quantity"],
        metrics=["count", "sum", "avg", "min", "max", "stddev"],
        group_by="l_returnflag",
    )

    def build(s, nparts):
        df = load_table(s, SF_DIR, "lineitem").repartition(nparts)
        return compile_aggregation(df, spec)

    hashes = _run_perturbed(spark, build)
    assert hashes[0] == hashes[1] == hashes[2], hashes


def test_quality_filter_report_hash_stable_across_partitionings(spark):
    from raise_featurestore_spark.dataprep.filters import quality_filter_report
    from raise_featurestore_spark.tables import load_table

    def build(s, nparts):
        df = load_table(s, SF_DIR, "documents").repartition(nparts)
        return quality_filter_report(df)

    hashes = _run_perturbed(spark, build)
    assert hashes[0] == hashes[1] == hashes[2], hashes


def test_sig_round_properties(spark):
    """sig_round: 5-sig-digit grid, NULL-safe, pins −0.0 to +0.0, and is
    self-consistent at decade boundaries."""
    from pyspark.sql import functions as F

    from raise_featurestore_spark.functions.stable import sig_round

    rows = spark.createDataFrame(
        [(1234567890.123,), (-0.000123456789,), (0.0,), (-0.0,), (None,),
         (9.99996e8,), (1.000004e9,)],
        "x double",
    ).select(sig_round(F.col("x")).alias("y")).collect()
    ys = [r.y for r in rows]
    assert ys[0] == pytest.approx(1.23460e9, rel=1e-9)
    assert ys[1] == pytest.approx(-0.00012346, rel=1e-9)
    assert ys[2] == 0.0 and str(ys[2]) == "0.0"
    assert ys[3] == 0.0 and str(ys[3]) == "0.0"  # −0.0 canonicalized
    assert ys[4] is None
    # decade straddle: the two sides' grids differ only past the 15th
    # digit (division by the inexact 1e-5 scale), so both render as the
    # same string under the driver's %.6g hash — the actual contract
    assert f"{ys[5]:.6g}" == f"{ys[6]:.6g}" == "1e+09"


def test_sig_round_sql_twin_matches(spark, ddb):
    """Spark sig_round and the DuckDB SQL twin produce identical doubles."""
    import duckdb
    from pyspark.sql import functions as F

    from raise_featurestore_spark.functions.stable import sig_round, sig_round_sql

    vals = [1234567890.123, -987.654321, 0.000123456789, 1.0, -0.0, 9.999999e4]
    got = [
        r.y
        for r in spark.createDataFrame([(v,) for v in vals], "x double")
        .select(sig_round(F.col("x")).alias("y"))
        .collect()
    ]
    con = duckdb.connect()
    want = [
        con.sql(f"SELECT {sig_round_sql(repr(v))} AS y").fetchone()[0] for v in vals
    ]
    assert got == want


def test_grid_snap_sql_twin_matches_including_repr_ties(spark):
    """grid_snap and its DuckDB twin agree bit-exactly — INCLUDING values
    whose shortest decimal repr ends '...5' at the grid position, where
    Spark ROUND (HALF_UP on the repr) and DuckDB ROUND (binary) genuinely
    disagree. This is the filter_quality_rules r4 flake class."""
    import duckdb
    from pyspark.sql import functions as F

    from raise_featurestore_spark.functions.stable import grid_snap, grid_snap_sql

    vals = [0.125, 0.135, 0.295, 0.305, 8148.945, -0.125, 2.675, 0.0, -0.0,
            1.0e9 + 0.00005, None]
    got = [
        r.y
        for r in spark.createDataFrame([(v,) for v in vals], "x double")
        .select(grid_snap(F.col("x"), 2).alias("y"))
        .collect()
    ]
    con = duckdb.connect()
    want = [
        con.sql(
            f"SELECT {grid_snap_sql('CAST(' + repr(v) + ' AS DOUBLE)', 2)} AS y"
        ).fetchone()[0]
        if v is not None
        else None
        for v in vals
    ]
    assert got == want
    # and at least one of these values is an actual engine-ROUND tie:
    # Spark round(0.125, 2) = 0.13 (repr HALF_UP), DuckDB = 0.12 or 0.13
    # depending on version — grid_snap must not care either way.


def test_exact_moments_match_builtin_semantics(spark):
    """Aggregation(exact_moments=True) agrees with the plain double
    aggregates to float tolerance (the decimal path changes determinism,
    not semantics) on real data."""
    from raise_featurestore_spark.analytics.aggregation import compile_aggregation
    from raise_featurestore_spark.analytics.analysis import Aggregation
    from raise_featurestore_spark.tables import load_table

    df = load_table(spark, SF_DIR, "lineitem")
    kw = dict(features=["l_extendedprice"], metrics=["sum", "avg", "stddev", "variance"])
    exact = compile_aggregation(df, Aggregation(**kw, exact_moments=True)).collect()[0]
    plain = compile_aggregation(df, Aggregation(**kw, exact_moments=False)).collect()[0]
    for name in exact.asDict():
        assert exact[name] == pytest.approx(plain[name], rel=1e-3), name


def test_exact_moments_small_magnitude_grid(spark, ddb):
    """r5 ADVICE finding + the r7 guard: the default 1e-4 grid snaps
    sub-5e-5 rows to 0, so small-magnitude domains (rates, probabilities)
    used to silently sum to 0.0 on BOTH engines. Since r7 the underflow
    sentinel POISONS such a group to NaN (loud) instead of emitting the
    confidently wrong zero; moment_grid_decimals raises the grid so the
    data stays lossless. Pins the (guarded) hazard and the cure."""
    import math

    from raise_featurestore_spark.analytics.aggregation import (
        aggregation_to_sql,
        compile_aggregation,
    )
    from raise_featurestore_spark.analytics.analysis import Aggregation

    rows = [(1e-5,)] * 100
    sdf = spark.createDataFrame(rows, "x double")
    # the guarded hazard: every row underflows the default grid -> NaN,
    # never a silent 0.0 (tests/test_stable_fuzz.py pins the 1M-row form)
    coarse = Aggregation(features=["x"], metrics=["sum"])
    assert math.isnan(compile_aggregation(sdf, coarse).collect()[0].sum_x)
    # the cure: an 8-decimal grid holds 1e-5 exactly
    fine = Aggregation(features=["x"], metrics=["sum", "avg"], moment_grid_decimals=8)
    got = compile_aggregation(sdf, fine).collect()[0]
    assert got.sum_x == pytest.approx(1e-3, rel=1e-9)
    assert got.avg_x == pytest.approx(1e-5, rel=1e-9)

    con = ddb(SF_DIR)
    con.execute("CREATE OR REPLACE TABLE __tg(x DOUBLE)")
    con.executemany("INSERT INTO __tg VALUES (?)", rows)
    want = con.sql(aggregation_to_sql(fine, "__tg")).fetchone()
    assert want[0] == got.sum_x and want[1] == got.avg_x

    # and the knob is validated
    with pytest.raises(Exception, match="moment_grid_decimals"):
        Aggregation(features=["x"], metrics=["sum"], moment_grid_decimals=15)


def test_exact_moments_nan_poison_and_n1(spark, ddb):
    """NaN rows poison exact-moment aggregates to NaN on BOTH engines;
    a 1-row group gets NULL stddev/variance on both."""
    import math

    from raise_featurestore_spark.analytics.aggregation import (
        aggregation_to_sql,
        compile_aggregation,
    )
    from raise_featurestore_spark.analytics.analysis import Aggregation

    rows = [("a", 1.0), ("a", float("nan")), ("a", 2.0), ("b", 5.0)]
    sdf = spark.createDataFrame(rows, "g string, x double")
    spec = Aggregation(features=["x"], metrics=["sum", "avg", "stddev", "variance"],
                       group_by="g")
    got = {r.g: r for r in compile_aggregation(sdf, spec).collect()}
    assert math.isnan(got["a"].sum_x) and math.isnan(got["a"].stddev_x)
    assert got["b"].sum_x == 5.0
    assert got["b"].stddev_x is None and got["b"].variance_x is None

    con = ddb(SF_DIR)
    con.execute("CREATE OR REPLACE TABLE __t(g VARCHAR, x DOUBLE)")
    con.executemany("INSERT INTO __t VALUES (?, ?)", rows)
    want = {
        r[0]: r
        for r in con.sql(aggregation_to_sql(spec, "__t")).fetchall()
    }
    assert math.isnan(want["a"][1]) and math.isnan(want["a"][3])
    assert want["b"][1] == 5.0 and want["b"][3] is None and want["b"][4] is None


def test_exact_moments_all_bad_group_and_domain_guard(spark, ddb):
    """r5 review findings: (a) an all-NaN group must poison to NaN, not
    silently un-poison to NULL (NULL + NaN = NULL); (b) |x| >= 1e13 rows
    must poison loudly instead of ANSI cast errors / dropped rows; (c) an
    all-NULL group stays NULL."""
    import math

    from raise_featurestore_spark.analytics.aggregation import (
        aggregation_to_sql,
        compile_aggregation,
    )
    from raise_featurestore_spark.analytics.analysis import Aggregation

    rows = [
        ("allnan", float("nan")), ("allnan", float("nan")),
        ("big", 1.0e15), ("big", 2.0),
        ("allnull", None), ("allnull", None),
        ("ok", 1.0), ("ok", 3.0),
    ]
    sdf = spark.createDataFrame(rows, "g string, x double")
    spec = Aggregation(features=["x"], metrics=["sum", "avg", "stddev"], group_by="g")
    got = {r.g: r for r in compile_aggregation(sdf, spec).collect()}
    assert math.isnan(got["allnan"].sum_x) and math.isnan(got["allnan"].avg_x)
    assert math.isnan(got["big"].sum_x) and math.isnan(got["big"].stddev_x)
    assert got["allnull"].sum_x is None and got["allnull"].avg_x is None
    assert got["ok"].sum_x == 4.0

    con = ddb(SF_DIR)
    con.execute("CREATE OR REPLACE TABLE __t2(g VARCHAR, x DOUBLE)")
    con.executemany("INSERT INTO __t2 VALUES (?, ?)", rows)
    want = {r[0]: r for r in con.sql(aggregation_to_sql(spec, "__t2")).fetchall()}
    assert math.isnan(want["allnan"][1]) and math.isnan(want["big"][1])
    assert want["allnull"][1] is None
    assert want["ok"][1] == 4.0


def test_rolling_stddev_constant_window_no_crash(spark, ddb):
    """r5 review finding: cancellation can push exact-decimal rolling
    variance to ~-1e-24 on a constant window; DuckDB SQRT(negative) is a
    hard error. Both engines must emit 0.0."""
    from raise_featurestore_spark.analytics.aggregation import (
        aggregation_to_sql,
        compile_aggregation,
    )
    from raise_featurestore_spark.analytics.analysis import Aggregation
    from pyspark.sql import functions as F

    rows = [(f"2026-01-{d:02d} 00:00:00", 0.0001) for d in range(1, 20) for _ in range(35)]
    sdf = spark.createDataFrame(rows, "ts string, x double").withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    spec = Aggregation(
        features=["x"], metrics=["stddev", "variance"], rolling=True,
        periods=7, time_column="ts",
    )
    got = compile_aggregation(sdf, spec).collect()
    assert all(r.rolling_stddev_x == 0.0 for r in got)

    con = ddb(SF_DIR)
    con.execute("CREATE OR REPLACE TABLE __t3(ts TIMESTAMP, x DOUBLE)")
    con.executemany(
        "INSERT INTO __t3 VALUES (?, ?)", [(t, x) for t, x in rows]
    )
    want = con.sql(aggregation_to_sql(spec, "__t3")).fetchall()
    assert all(r[1] == 0.0 for r in want)
