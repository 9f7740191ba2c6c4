"""Winsorized statistics / percentile outlier clipping.

Feature pipelines clip heavy-tailed features to percentile bounds before
training (winsorization) and need to know how much mass the clip moved.
The reference's analytics tier stops at raw moments/percentiles
(raise_/analytics/analysis.py metric whitelist); this adds the robust
variant as an engine addition.

Plan shape: pass 1 computes per-group [p_lo, p_hi] bounds with ONE fused
``percentile(col, array(lo, hi))`` aggregate (never two separate
percentile buffers — see `analytics/aggregation.py` on why that is
catastrophic); pass 2 equi-joins the bounds back on the group key (a
broadcast for the global case — 1 row) and folds the clamped column into
(n, clipped counts, winsorized mean/stddev) in one aggregate. Two scans of
the source; the bounds frame is group-cardinality-sized.

``approx=True`` swaps the exact percentile for the mergeable GK sketch —
bounded memory per group, the 100 TB default (same posture as
``agg_global_stats_approx``); exact stays the oracle anchor.

Cross-engine posture: bounds snap to the 5-significant-digit grid on BOTH
engines before any comparison or clamp (`functions/stable`), so linear-
interpolation last-ulp differences between Spark's percentile and DuckDB's
QUANTILE_CONT can neither flip a clip count nor shift a clamped value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raise_featurestore_spark.functions.stable import (
    sig_round,
    sig_round_sql,
    stable_round,
    stable_round_sql,
)

DEFAULT_P_LO = 0.01
DEFAULT_P_HI = 0.99


def winsorized_stats(
    df: DataFrame,
    feature: str,
    group_by: str | None = None,
    p_lo: float = DEFAULT_P_LO,
    p_hi: float = DEFAULT_P_HI,
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group winsorized stats of ``feature``.

    Columns: [group_by,] n, lo, hi, n_clipped_lo, n_clipped_hi,
    win_mean, win_stddev.
    """
    xv = F.col("__x")
    fracs = F.array(F.lit(p_lo), F.lit(p_hi))
    pct = (
        F.approx_percentile(xv, fracs, F.lit(accuracy))
        if approx
        else F.percentile(xv, fracs)
    )
    bounds_aggs = [
        sig_round(F.element_at(pct, 1)).alias("lo"),
        sig_round(F.element_at(pct, 2)).alias("hi"),
    ]
    src = df.select(
        *([group_by] if group_by else []), F.col(feature).cast("double").alias("__x")
    )
    if group_by:
        bounds = src.groupBy(group_by).agg(*bounds_aggs)
        joined = src.join(bounds.withColumnRenamed(group_by, "__gb"),
                          F.col(group_by).eqNullSafe(F.col("__gb"))).drop("__gb")
    else:
        bounds = src.agg(*bounds_aggs)
        joined = src.crossJoin(F.broadcast(bounds))
    clamped = F.least(F.greatest(F.col("__x"), F.col("lo")), F.col("hi"))
    aggs = [
        F.count("__x").alias("n"),
        F.first("lo").alias("lo"),
        F.first("hi").alias("hi"),
        F.sum((F.col("__x") < F.col("lo")).cast("long")).alias("n_clipped_lo"),
        F.sum((F.col("__x") > F.col("hi")).cast("long")).alias("n_clipped_hi"),
        stable_round(F.avg(clamped)).alias("win_mean"),
        stable_round(F.stddev_samp(clamped)).alias("win_stddev"),
    ]
    return joined.groupBy(group_by).agg(*aggs) if group_by else joined.agg(*aggs)


def winsorized_stats_sql(
    table: str,
    feature: str,
    group_by: str | None = None,
    p_lo: float = DEFAULT_P_LO,
    p_hi: float = DEFAULT_P_HI,
) -> str:
    x = f"CAST({feature} AS DOUBLE)"
    lo = sig_round_sql(f"QUANTILE_CONT(__x, {p_lo})")
    hi = sig_round_sql(f"QUANTILE_CONT(__x, {p_hi})")
    gb_sel = f"{group_by}, " if group_by else ""
    gb_grp = f" GROUP BY {group_by}" if group_by else ""
    join = (
        f"JOIN bounds b ON s.{group_by} IS NOT DISTINCT FROM b.{group_by}"
        if group_by
        else "CROSS JOIN bounds b"
    )
    clamped = "LEAST(GREATEST(s.__x, b.lo), b.hi)"
    out_gb = f"b.{group_by}, " if group_by else ""
    grp = f" GROUP BY b.{group_by}" if group_by else ""
    return (
        f"WITH src AS (SELECT {gb_sel}{x} AS __x FROM {table}), "
        f"bounds AS (SELECT {gb_sel}{lo} AS lo, {hi} AS hi FROM src{gb_grp}) "
        f"SELECT {out_gb}COUNT(s.__x) AS n, ANY_VALUE(b.lo) AS lo, "
        f"ANY_VALUE(b.hi) AS hi, "
        f"SUM(CASE WHEN s.__x < b.lo THEN 1 ELSE 0 END) AS n_clipped_lo, "
        f"SUM(CASE WHEN s.__x > b.hi THEN 1 ELSE 0 END) AS n_clipped_hi, "
        f"{stable_round_sql(f'AVG({clamped})')} AS win_mean, "
        f"{stable_round_sql(f'STDDEV_SAMP({clamped})')} AS win_stddev "
        f"FROM src s {join}{grp}"
    )
