"""Z-order clustering (io/zorder.py): Morton-code correctness vs a pure
Python reference, measured pruning quality on BOTH interleaved columns,
and the degenerate cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from raise_featurestore_spark.io.zorder import (
    file_stats_candidates,
    z_value,
    z_value_sql,
    zorder_write,
)


def _py_morton(vals: list[int], bits: int) -> int:
    z = 0
    for j in range(bits):
        for i, v in enumerate(vals):
            z |= ((v >> j) & 1) << (j * len(vals) + i)
    return z


def test_z_value_matches_python_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 255, 65535) for y in (0, 3, 1000, 65535)]
    got = (
        spark.createDataFrame(rows, ["x", "y"])
        .select("x", "y", z_value([F.col("x"), F.col("y")], 16).alias("z"))
        .collect()
    )
    for r in got:
        assert r.z == _py_morton([r.x, r.y], 16), (r.x, r.y)


def test_z_value_sql_twin_matches(spark):
    import duckdb

    rows = [(x, y, z) for x in (0, 7, 4095) for y in (1, 64) for z in (0, 9)]
    got = (
        spark.createDataFrame(rows, ["a", "b", "c"])
        .select(z_value([F.col("a"), F.col("b"), F.col("c")], 8).alias("z"))
        .collect()
    )
    con = duckdb.connect()
    sql = z_value_sql(["a", "b", "c"], 8)
    want = [
        con.sql(f"SELECT {sql} AS z FROM (SELECT {x} AS a, {y} AS b, {zz} AS c)")
        .fetchone()[0]
        for x, y, zz in rows
    ]
    assert [r.z for r in got] == want


def test_bit_budget_guard():
    with pytest.raises(ValueError):
        z_value([F.col("a")], 16)  # needs >= 2 cols
    with pytest.raises(ValueError):
        z_value_sql(["a", "b", "c", "d"], 16)  # 64 bits > 63


def test_zorder_prunes_both_columns(spark, tmp_path):
    """The measured claim: vs an x-sorted layout, z-ordering keeps most of
    the x-pruning AND adds y-pruning, where x-sorting prunes y not at all."""
    n = 200_000
    df = spark.range(n).select(
        (F.col("id") % 1000).alias("x"),
        F.floor(F.col("id") / 1000).alias("y"),
        F.rand(7).alias("payload"),
    )
    xsorted = str(tmp_path / "xsorted")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(xsorted)
    zpath = str(tmp_path / "zordered")
    zorder_write(df, zpath, ["x", "y"], n_files=16)

    # same rows either way
    assert spark.read.parquet(zpath).count() == n

    zx, ztot = file_stats_candidates(zpath, "x", 500)
    zy, _ = file_stats_candidates(zpath, "y", 100)
    sx, stot = file_stats_candidates(xsorted, "x", 500)
    sy, _ = file_stats_candidates(xsorted, "y", 100)
    # repartitionByRange SAMPLES its boundaries: a rare unlucky sample
    # yields a duplicate bound -> an empty partition -> one fewer file
    # (observed once in a full-suite run where prior tests shifted the
    # RDD-id-derived sampling seed). The pruning CLAIM is fractional, so
    # assert it against the actual file totals instead of a hard 16.
    assert 14 <= ztot <= 16 and 14 <= stot <= 16, (ztot, stot)
    # x-sorted: perfect on x, useless on y (every file spans all y)
    assert sx <= 2 and sy == stot
    # z-ordered: must prune meaningfully on BOTH dimensions. Bound from
    # slab geometry, not vibes: F files tile the 2-D bucket grid in
    # ~sqrt(F) x sqrt(F) hyper-rectangles, and an equality predicate's
    # row/column of the grid intersects O(sqrt(F)) of them; sampled range
    # boundaries add up to ~2x boundary straddle. A 12-seed probe of the
    # range sampler measured zx in [6, 9], zy in [4, 5] at F=16 — the
    # previous ztot // 2 (= 8) bound flaked on the zx = 9 seeds while the
    # claim (both dims prune; x-sorted leaves sy == stot == 16) held on
    # every seed.
    import math

    bound = 2 * math.isqrt(ztot - 1) + 4  # = 10 at F = 15..16
    assert zx <= bound and zy <= bound, (zx, zy, ztot)
    assert zx + zy < min(ztot, stot), (zx, zy)  # jointly FAR from no-pruning


def test_constant_column_degenerates_gracefully(spark, tmp_path):
    df = spark.range(1000).select(
        F.lit(42).alias("x"), (F.col("id") % 100).alias("y")
    )
    path = str(tmp_path / "const")
    zorder_write(df, path, ["x", "y"], n_files=4)
    got = spark.read.parquet(path)
    assert got.count() == 1000
    # constant x collapses to bucket 0; y still clusters
    cy, tot = file_stats_candidates(path, "y", 50)
    assert cy <= max(1, tot // 2)
