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
