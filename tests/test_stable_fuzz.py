"""Cross-engine fuzz of the stable emission kernels: for batches of
adversarial doubles, the Spark form and the DuckDB SQL twin must produce
IDENTICAL values (these kernels are what every emitted aggregate flows
through — a divergence here is a driver-gate flake by construction)."""

from __future__ import annotations

import math
import random
import struct

import duckdb
import pytest


def _adversarial_doubles(n: int, seed: int) -> list[float]:
    rng = random.Random(seed)
    vals: list[float] = []
    for _ in range(n):
        kind = rng.random()
        if kind < 0.3:
            # decimal-quantized price-like values (ROUND-tie factory)
            vals.append(round(rng.uniform(-1e6, 1e6), rng.randint(0, 4)))
        elif kind < 0.5:
            # exact .5 ties at several grids
            base = rng.randint(-10**8, 10**8)
            vals.append(base / 10.0 + 0.05)
        elif kind < 0.7:
            # near powers of ten (log10 floor boundaries)
            vals.append(10.0 ** rng.randint(-6, 10) * (1 + rng.uniform(-1e-13, 1e-13)))
        elif kind < 0.9:
            # random bit patterns constrained to finite, sane exponents
            m = rng.uniform(-1, 1)
            e = rng.randint(-20, 20)
            vals.append(math.ldexp(m, e))
        else:
            vals.append(rng.choice([0.0, -0.0, 1e-300, -1e-300]))
    return vals


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_snap_kernels_cross_engine_identical(spark, seed):
    from pyspark.sql import functions as F

    from raise_featurestore_spark.functions.stable import (
        grid_snap,
        grid_snap_sql,
        sig_round,
        sig_round_sql,
        stable_round,
        stable_round_sql,
    )

    vals = _adversarial_doubles(400, seed)
    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    got = sdf.select(
        grid_snap(F.col("x"), 2).alias("g2"),
        grid_snap(F.col("x"), 4).alias("g4"),
        sig_round(F.col("x")).alias("s5"),
        stable_round(F.col("x")).alias("st"),
    ).collect()

    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = con.sql(
        f"SELECT {grid_snap_sql('x', 2)} AS g2, {grid_snap_sql('x', 4)} AS g4, "
        f"{sig_round_sql('x')} AS s5, {stable_round_sql('x')} AS st FROM t"
    ).fetchall()

    # row order is insertion order on both sides
    for v, g, w in zip(vals, got, want):
        for col in range(4):
            a, b = g[col], w[col]
            assert (a == b) or (a is None and b is None) or (
                isinstance(a, float) and isinstance(b, float)
                and math.isnan(a) and math.isnan(b)
            ), (v, col, struct.pack('<d', a).hex(), struct.pack('<d', b).hex())


def test_dec_sum_partition_and_engine_invariant(spark):
    from pyspark.sql import functions as F

    from raise_featurestore_spark.functions.stable import dec_sum, dec_sum_sql

    vals = _adversarial_doubles(2000, 77)
    vals = [v for v in vals if abs(v) < 1e12]
    sums = []
    for parts in (1, 7, 32):
        sdf = spark.createDataFrame([(v,) for v in vals], "x double").repartition(parts)
        sums.append(sdf.agg(dec_sum(F.col("x")).alias("s")).collect()[0].s)
    assert sums[0] == sums[1] == sums[2]

    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = con.sql(f"SELECT {dec_sum_sql('x')} AS s FROM t").fetchone()[0]
    assert sums[0] == want


def test_exact_moments_underflow_poisons_not_zero(spark):
    """r6 VERDICT "what's wrong" #1, pinned: 1M rows of 1e-5 on the default
    1e-4 grid must NOT emit a confidently wrong 0.0 — the in-plan underflow
    sentinel poisons the moment to NaN, identically on BOTH engines."""
    from pyspark.sql import functions as F

    from raise_featurestore_spark.analytics.aggregation import (
        aggregation_to_sql,
        compile_aggregation,
    )
    from raise_featurestore_spark.analytics.analysis import Aggregation

    df = spark.range(1_000_000).select(F.lit(1e-5).alias("x"))
    spec = Aggregation(features=["x"], metrics=["sum", "avg", "stddev"])
    row = compile_aggregation(df, spec).collect()[0]
    assert math.isnan(row.sum_x)
    assert math.isnan(row.avg_x)
    assert math.isnan(row.stddev_x)

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT CAST(1e-5 AS DOUBLE) AS x FROM range(1000000)")
    got = con.sql(aggregation_to_sql(spec, "t")).fetchone()
    assert all(math.isnan(v) for v in got)

    # raising the grid to cover the magnitude restores the exact answer
    spec8 = Aggregation(features=["x"], metrics=["sum"], moment_grid_decimals=8)
    row8 = compile_aggregation(df, spec8).collect()[0]
    assert abs(row8.sum_x - 10.0) < 1e-9
    got8 = con.sql(aggregation_to_sql(spec8, "t")).fetchone()[0]
    assert got8 == row8.sum_x

    # a MINORITY of sub-grid rows keeps the aggregate (their total
    # contribution is bounded by half-steps; poisoning here would be noise)
    df2 = spark.range(1000).select(
        F.when(F.col("id") < 10, F.lit(1e-5)).otherwise(F.lit(2.5)).alias("x")
    )
    row2 = compile_aggregation(df2, Aggregation(features=["x"], metrics=["sum"])).collect()[0]
    assert abs(row2.sum_x - 990 * 2.5) < 0.01


def test_dec_sum_underflow_guard(spark):
    """The standalone dec_sum/dec_var kernels carry the same sentinel."""
    from pyspark.sql import functions as F

    from raise_featurestore_spark.functions.stable import (
        dec_sum,
        dec_sum_sql,
        dec_var,
    )

    tiny = spark.range(100).select(F.lit(2e-5).alias("x"))
    assert math.isnan(tiny.agg(dec_sum(F.col("x")).alias("s")).collect()[0].s)
    assert math.isnan(tiny.agg(dec_var(F.col("x")).alias("v")).collect()[0].v)

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT CAST(2e-5 AS DOUBLE) AS x FROM range(100)")
    assert math.isnan(con.sql(f"SELECT {dec_sum_sql('x')} AS s FROM t").fetchone()[0])

    # zeros are NOT underflow (a column of exact 0.0 sums to 0.0)
    zeros = spark.range(100).select(F.lit(0.0).alias("x"))
    assert zeros.agg(dec_sum(F.col("x")).alias("s")).collect()[0].s == 0.0


def test_rolling_exact_moments_underflow_poisons(spark):
    """The rolling recombination applies the majority test over WINDOW
    totals of the per-bucket underflow partials."""
    import datetime

    from raise_featurestore_spark.analytics.aggregation import compile_aggregation
    from raise_featurestore_spark.analytics.analysis import Aggregation

    rows = [
        (datetime.datetime(2024, 1, 1 + d, 12, 0, 0), 1e-5)
        for d in range(3)
        for _ in range(10)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, x double")
    spec = Aggregation(
        features=["x"], metrics=["sum"], rolling=True, periods=2, time_column="ts"
    )
    out = compile_aggregation(df, spec).collect()
    assert all(math.isnan(r.rolling_sum_x) for r in out)


def test_round_to_contract_not_silently_widened(spark):
    """r6 ADVICE item 2: an explicit round_to=2 with the DEFAULT grid must
    emit 2 decimals; only a RAISED grid widens the emission."""
    from pyspark.sql import functions as F

    from raise_featurestore_spark.analytics.aggregation import (
        aggregation_to_sql,
        compile_aggregation,
    )
    from raise_featurestore_spark.analytics.analysis import Aggregation

    df = spark.createDataFrame([(1.2345,), (1.2345,)], "x double")
    spec = Aggregation(features=["x"], metrics=["avg"])
    got = compile_aggregation(df, spec, round_to=2).collect()[0].avg_x
    assert got == 1.23

    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(1.2345,), (1.2345,)])
    assert con.sql(aggregation_to_sql(spec, "t", round_to=2)).fetchone()[0] == got

    # raised grid still widens (the probabilities-at-g=8 protection)
    spec8 = Aggregation(features=["x"], metrics=["avg"], moment_grid_decimals=8)
    got8 = compile_aggregation(df, spec8, round_to=2).collect()[0].avg_x
    assert got8 == 1.2345


@pytest.mark.parametrize("seed", [21, 22])
def test_poly_cos_cross_engine_identical_and_accurate(spark, seed):
    """poly_cos is the METRIC-DEFINING cosine (engine cos() may differ by
    1 ulp between JVM Math.cos and libm): Spark and DuckDB must agree
    BIT-FOR-BIT on adversarial inputs, and the polynomial must track true
    cos to ~1e-9 over the drift-relevant projection range."""
    from pyspark.sql import functions as F

    from raise_featurestore_spark.functions.stable import poly_cos, poly_cos_sql

    rng = random.Random(seed)
    vals = [rng.uniform(-40.0, 40.0) for _ in range(400)] + [
        0.0, -0.0, math.pi, -math.pi, math.pi / 2, 2 * math.pi,
        6.283185307179586 / 2,  # exactly at the range-reduction boundary
        1e-12, -1e-12, 37.5, -41.123456789,
    ]
    sdf = spark.createDataFrame(list(enumerate(vals)), "i long, t double")
    got_spark = [
        r.z for r in sdf.select("i", poly_cos(F.col("t")).alias("z"))
        .orderBy("i").collect()
    ]
    con = duckdb.connect()
    # CAST('…' AS DOUBLE): a bare decimal literal is DECIMAL in DuckDB —
    # the input column must carry the same doubles Spark holds (real
    # queries read typed parquet columns; only VALUES needs this)
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, CAST('{v!r}' AS DOUBLE))" for i, v in enumerate(vals))
        + ") AS v(i, t)"
    )
    got_duck = [r[0] for r in con.sql(
        f"SELECT {poly_cos_sql('t')} FROM t ORDER BY i").fetchall()]
    for v, s in zip(vals, got_spark):
        assert abs(s - math.cos(v)) < 1e-9, (v, s, math.cos(v))
    # bit-identity: compare raw IEEE bits, not approximate equality
    sb = [struct.pack("<d", x) for x in got_spark]
    db = [struct.pack("<d", x) for x in got_duck]
    assert sb == db


def test_exp10_lookup_bit_identical_to_string_parse(spark):
    """The engine's '1e<k>' string-parse scales must be bit-identical to
    Python's own correctly-rounded parse over the full exponent table —
    exhaustively, not sampled (this is what licenses the oracle twins to
    parse the same strings on DuckDB)."""
    from pyspark.sql import functions as F

    from raise_featurestore_spark.functions.stable import _EXP10, _EXP10_LO, _exp10

    import struct

    ks = list(range(_EXP10_LO, _EXP10_LO + len(_EXP10)))
    df = spark.createDataFrame([(float(k),) for k in ks], "k double")
    got = [
        r.v
        for r in df.select(_exp10(F.col("k")).alias("v"), "k")
        .orderBy("k")
        .collect()
    ]
    # THE claim: the JVM engine parse equals Python's correctly-rounded
    # parse, bit-for-bit (struct-packed so −0.0/NaN/subnormal encodings
    # count, not just == equality). The table spans subnormal scales
    # (1e-320..1e-309) where a double-rounding bug would show first.
    assert [struct.pack("<d", v) for v in got] == [
        struct.pack("<d", x) for x in _EXP10
    ]
