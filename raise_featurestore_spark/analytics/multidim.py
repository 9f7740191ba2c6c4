"""Multidimensional aggregation: CUBE / ROLLUP / PIVOT report shapes.

The OLAP report family (SURVEY §2.4 covers one-key group_by; dashboards
want subtotal lattices and cross-tabs). All three compile to a SINGLE
grouped aggregate:

- ``cube_report`` / ``rollup_report``: Spark's native CUBE/ROLLUP —
  physically one aggregate over an Expand (each input row contributes to
  each grouping set), map-side combinable, one shuffle. NULL group
  values are COALESCEd to ``(null)`` BEFORE the lattice and subtotal
  slots to ``(all)`` AFTER it, so a legitimate NULL key and a subtotal
  row can't be confused (and the cross-engine hash is on strings, not
  engine-rendered NULLs).
- ``pivot_report``: cross-tab via conditional aggregation (FILTER), not
  the DataFrame ``pivot`` API — identical output, but the pivoted value
  set is an explicit, driver-validated list (a runaway-cardinality pivot
  column cannot silently explode the schema), and the same SQL runs on
  any engine.

Sums flow through exact decimals; doubles snap on emission.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raise_featurestore_spark.functions.stable import (
    dec_sum,
    dec_sum_sql,
    grid_snap,
    grid_snap_sql,
)

TOTAL = "(all)"


def _safe_aliases(pivot_values: list[str]) -> list[str]:
    """Column-safe aliases; DISTINCT pivot values must stay distinct after
    sanitization ('A-B' and 'A_B' both map to 'a_b' — silently emitting
    duplicate column names would break every downstream selection)."""
    out = ["".join(ch if ch.isalnum() else "_" for ch in v.lower()) for v in pivot_values]
    dupes = {a for a in out if out.count(a) > 1}
    if dupes:
        raise ValueError(
            f"pivot values collide after column sanitization: {sorted(dupes)}"
        )
    return out


def _key(c: str):
    return F.coalesce(F.col(c).cast("string"), F.lit("(null)"))


def cube_report(
    df: DataFrame, dims: list[str], value_col: str, round_to: int = 2
) -> DataFrame:
    """All 2^d subtotal combinations in one Expand aggregate."""
    d = F.col(value_col).cast("double")
    out = (
        df.cube(*[_key(c).alias(c) for c in dims])
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            grid_snap(dec_sum(d), round_to).alias("total"),
        )
        .select(
            *[F.coalesce(F.col(c), F.lit(TOTAL)).alias(c) for c in dims],
            "n_rows",
            "total",
        )
    )
    return out


def cube_report_sql(
    table: str, dims: list[str], value_col: str, round_to: int = 2
) -> str:
    d = f"CAST({value_col} AS DOUBLE)"
    keys = ", ".join(
        f"COALESCE(CAST({c} AS VARCHAR), '(null)') AS {c}" for c in dims
    )
    outer = ", ".join(f"COALESCE({c}, '{TOTAL}') AS {c}" for c in dims)
    names = ", ".join(dims)
    return (
        f"SELECT {outer}, n_rows, total FROM ("
        f"SELECT {names}, COUNT(*) AS n_rows, "
        f"{grid_snap_sql(dec_sum_sql(d), round_to)} AS total "
        f"FROM (SELECT {keys}, {value_col} FROM {table}) __k "
        f"GROUP BY CUBE ({names})) __c"
    )


def rollup_report(
    df: DataFrame, dims: list[str], value_col: str, round_to: int = 2
) -> DataFrame:
    """Hierarchical subtotals (d+1 grouping sets), e.g. year→month→day."""
    d = F.col(value_col).cast("double")
    return (
        df.rollup(*[_key(c).alias(c) for c in dims])
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            grid_snap(dec_sum(d), round_to).alias("total"),
        )
        .select(
            *[F.coalesce(F.col(c), F.lit(TOTAL)).alias(c) for c in dims],
            "n_rows",
            "total",
        )
    )


def rollup_report_sql(
    table: str, dims: list[str], value_col: str, round_to: int = 2
) -> str:
    d = f"CAST({value_col} AS DOUBLE)"
    keys = ", ".join(
        f"COALESCE(CAST({c} AS VARCHAR), '(null)') AS {c}" for c in dims
    )
    outer = ", ".join(f"COALESCE({c}, '{TOTAL}') AS {c}" for c in dims)
    names = ", ".join(dims)
    return (
        f"SELECT {outer}, n_rows, total FROM ("
        f"SELECT {names}, COUNT(*) AS n_rows, "
        f"{grid_snap_sql(dec_sum_sql(d), round_to)} AS total "
        f"FROM (SELECT {keys}, {value_col} FROM {table}) __k "
        f"GROUP BY ROLLUP ({names})) __r"
    )


def pivot_report(
    df: DataFrame,
    row_key: str,
    pivot_col: str,
    pivot_values: list[str],
    value_col: str,
    round_to: int = 2,
) -> DataFrame:
    """Cross-tab: one output column per (explicit) pivot value, one
    grouped aggregate — conditional sums, no second shuffle. The value
    list is driver-declared: pivoting an unbounded-cardinality column
    must be an explicit decision, not an accident."""
    if not pivot_values:
        raise ValueError("pivot_values must be a non-empty explicit list")
    d = F.col(value_col).cast("double")
    aggs = []
    for v, safe in zip(pivot_values, _safe_aliases(pivot_values)):
        masked = F.when(F.col(pivot_col) == v, d)
        aggs.append(
            grid_snap(
                F.coalesce(dec_sum(masked), F.lit(0.0)), round_to
            ).alias(f"total_{safe}")
        )
        aggs.append(
            F.coalesce(
                F.sum((F.col(pivot_col) == v).cast("long")), F.lit(0).cast("long")
            ).alias(f"n_{safe}")
        )
    return df.groupBy(row_key).agg(*aggs)


def pivot_report_sql(
    table: str,
    row_key: str,
    pivot_col: str,
    pivot_values: list[str],
    value_col: str,
    round_to: int = 2,
) -> str:
    if not pivot_values:
        raise ValueError("pivot_values must be a non-empty explicit list")
    d = f"CAST({value_col} AS DOUBLE)"
    cols = []
    for v, safe in zip(pivot_values, _safe_aliases(pivot_values)):
        masked = f"(CASE WHEN {pivot_col} = '{v}' THEN {d} END)"
        total = grid_snap_sql(f"COALESCE({dec_sum_sql(masked)}, 0.0)", round_to)
        cols.append(f"{total} AS total_{safe}")
        cols.append(
            f"CAST(COALESCE(SUM(CASE WHEN {pivot_col} = '{v}' THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_{safe}"
        )
    return f"SELECT {row_key}, {', '.join(cols)} FROM {table} GROUP BY {row_key}"
