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
    dec_sum,
    dec_sum_sql,
    dec_var,
    dec_var_sql,
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
    from raise_featurestore_spark.functions.stable import (
        dec_poison,
        dec_scaled,
        poisoned,
        underflow_poison,
    )

    clamped = F.least(F.greatest(F.col("__x"), F.col("lo")), F.col("hi"))
    # exact-decimal moments, NOT F.avg/F.stddev_samp: plain float
    # aggregation is sum-order-dependent on BOTH engines (DuckDB's
    # parallel morsels reorder run-to-run), so a mean near a stable_round
    # snap boundary is a per-run coin flip — the emission rules require
    # order-independent accumulation for emitted values. ONE set of
    # decimal partials, mean/stddev derived over the grouped result
    # (inlining dec_sum + dec_var re-evaluates the per-row decimal chain
    # ~6× — the r6 profiler finding).
    dec = dec_scaled(clamped)
    aggs = [
        F.count("__x").alias("n"),
        F.first("lo").alias("lo"),
        F.first("hi").alias("hi"),
        F.sum((F.col("__x") < F.col("lo")).cast("long")).cast("long").alias("n_clipped_lo"),
        F.sum((F.col("__x") > F.col("hi")).cast("long")).cast("long").alias("n_clipped_hi"),
        (F.sum(dec).cast("double") / F.lit(1e4)).alias("__s1"),
        (F.sum(dec * dec).cast("double") / F.lit(1e8)).alias("__s2"),
        # + the r7 underflow sentinel — the SQL twin's dec_sum_sql/
        # dec_var_sql carry it, so these partials must poison identically
        (dec_poison(clamped) + underflow_poison(clamped)).alias("__pp"),
    ]
    grouped = joined.groupBy(group_by).agg(*aggs) if group_by else joined.agg(*aggs)
    nn = F.col("n").cast("double")
    s1, s2, pois = F.col("__s1"), F.col("__s2"), F.col("__pp")
    var = F.greatest((s2 - s1 * s1 / nn) / (nn - F.lit(1.0)), F.lit(0.0))
    out_cols = ([F.col(group_by)] if group_by else []) + [
        F.col("n"),
        F.col("lo"),
        F.col("hi"),
        F.col("n_clipped_lo"),
        F.col("n_clipped_hi"),
        stable_round(poisoned(s1 / nn, pois)).alias("win_mean"),
        stable_round(
            F.sqrt(poisoned(F.when(F.col("n") > 1, var), pois))
        ).alias("win_stddev"),
    ]
    return grouped.select(*out_cols)


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
        # CAST AS BIGINT: DuckDB's integer SUM widens to HUGEINT -> pandas
        # float64, splitting dtype vs Spark's long and canon-hashing
        # differently under repr-style float rendering (r5 driver-gate red;
        # scripts/dtype_sweep.py pins parity).
        f"CAST(SUM(CASE WHEN s.__x < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo, "
        f"CAST(SUM(CASE WHEN s.__x > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi, "
        f"{stable_round_sql(f'{dec_sum_sql(clamped)} / CAST(COUNT(s.__x) AS DOUBLE)')} AS win_mean, "
        f"{stable_round_sql(f'SQRT({dec_var_sql(clamped)})')} AS win_stddev "
        f"FROM src s {join}{grp}"
    )


def flag_outliers(
    df: DataFrame,
    feature: str,
    id_col: str,
    group_by: str | None = None,
    method: str = "iqr",
    k: float = 1.5,
) -> DataFrame:
    """Per-row outlier flags — the materialized form winsorization's
    aggregate report summarizes. ``iqr``: outside [Q1 − k·IQR, Q3 + k·IQR]
    (Tukey fences, k=1.5 default); ``zscore``: |x − mean| > k·stddev
    (pass k≈3). Same two-pass shape as :func:`winsorized_stats`: one
    fused bounds aggregate per group, joined back (broadcast when global),
    then a pure map-side comparison. Bounds snap to the 5-sig grid on
    both engines so interpolation ulps cannot flip a flag.

    zscore bounds use the exact-decimal moments (order-independent); a
    NaN/Inf-poisoned group flags every row NULL rather than guessing.
    """
    from raise_featurestore_spark.functions.stable import (
        dec_poison,
        dec_scaled,
        poisoned,
        underflow_poison,
    )

    if method not in ("iqr", "zscore"):
        raise ValueError(f"method must be iqr|zscore, got {method!r}")
    d = F.col(feature).cast("double")
    keys = [F.col(group_by)] if group_by else []
    if method == "iqr":
        q = F.percentile(d, F.array(F.lit(0.25), F.lit(0.75)))
        bounds = df.groupBy(*keys).agg(
            sig_round(
                F.element_at(q, 1)
                - F.lit(float(k)) * (F.element_at(q, 2) - F.element_at(q, 1))
            ).alias("__lo"),
            sig_round(
                F.element_at(q, 2)
                + F.lit(float(k)) * (F.element_at(q, 2) - F.element_at(q, 1))
            ).alias("__hi"),
        )
    else:
        n = F.count(d).cast("double")
        dec = dec_scaled(d)
        s1 = F.sum(dec).cast("double") / F.lit(1e4)
        s2 = F.sum(dec * dec).cast("double") / F.lit(1e8)
        pois = dec_poison(d) + underflow_poison(d)
        mean = poisoned(s1 / n, pois)
        std = poisoned(
            F.sqrt(F.greatest((s2 - s1 * s1 / n) / (n - F.lit(1.0)), F.lit(0.0))),
            pois,
        )
        bounds = df.groupBy(*keys).agg(
            sig_round(mean - F.lit(float(k)) * std).alias("__lo"),
            sig_round(mean + F.lit(float(k)) * std).alias("__hi"),
        )
    if group_by:
        # eqNullSafe: a plain equi-join would silently DROP rows whose
        # group key is NULL from a per-row flagging API (winsorized_stats
        # made the same call; r5 review finding)
        bounds = bounds.withColumnRenamed(group_by, "__gb_bounds")
        joined = df.join(
            bounds, F.col(group_by).eqNullSafe(F.col("__gb_bounds")), "inner"
        ).drop("__gb_bounds")
    else:
        joined = df.join(F.broadcast(bounds))
    snapped = sig_round(d)
    flag = F.when(
        F.isnan(F.col("__lo")) | F.isnan(F.col("__hi")), F.lit(None).cast("boolean")
    ).otherwise((snapped < F.col("__lo")) | (snapped > F.col("__hi")))
    out = keys + [F.col(id_col), d.alias("value"), flag.alias("is_outlier")]
    return joined.where(d.isNotNull()).select(*out)


def flag_outliers_sql(
    table: str,
    feature: str,
    id_col: str,
    group_by: str | None = None,
    method: str = "iqr",
    k: float = 1.5,
) -> str:
    """DuckDB twin of :func:`flag_outliers`."""
    from raise_featurestore_spark.functions.stable import (
        dec_poison_sql,
        dec_scaled_sql,
        poisoned_sql,
    )

    if method not in ("iqr", "zscore"):
        raise ValueError(f"method must be iqr|zscore, got {method!r}")
    d = f"CAST({feature} AS DOUBLE)"
    if method == "iqr":
        q1, q3 = f"QUANTILE_CONT({d}, 0.25)", f"QUANTILE_CONT({d}, 0.75)"
        lo = sig_round_sql(f"{q1} - {float(k)} * ({q3} - {q1})")
        hi = sig_round_sql(f"{q3} + {float(k)} * ({q3} - {q1})")
    else:
        from raise_featurestore_spark.functions.stable import underflow_poison_sql

        dec = dec_scaled_sql(d)
        n = f"CAST(COUNT({d}) AS DOUBLE)"
        s1 = f"(CAST(SUM({dec}) AS DOUBLE) / CAST('1e4' AS DOUBLE))"
        s2 = f"(CAST(SUM(({dec}) * ({dec})) AS DOUBLE) / CAST('1e8' AS DOUBLE))"
        pois = f"({dec_poison_sql(d)} + {underflow_poison_sql(d)})"
        mean = poisoned_sql(f"{s1} / {n}", pois)
        std = poisoned_sql(
            f"SQRT(GREATEST(({s2} - {s1} * {s1} / {n}) / ({n} - 1.0), 0.0))", pois
        )
        lo = sig_round_sql(f"({mean}) - {float(k)} * ({std})")
        hi = sig_round_sql(f"({mean}) + {float(k)} * ({std})")
    grp = f" GROUP BY {group_by}" if group_by else ""
    bsel = f"{group_by} AS __gb_bounds, " if group_by else ""
    keysel = f"__t.{group_by}, " if group_by else ""
    on = (
        f"ON __t.{group_by} IS NOT DISTINCT FROM __b.__gb_bounds"
        if group_by
        else "ON TRUE"
    )
    snapped = sig_round_sql(d)
    return (
        f"WITH __b AS (SELECT {bsel}{lo} AS __lo, {hi} AS __hi FROM {table}{grp}) "
        f"SELECT {keysel}{id_col}, {d} AS value, "
        f"CASE WHEN ISNAN(__lo) OR ISNAN(__hi) THEN NULL "
        f"ELSE ({snapped}) < __lo OR ({snapped}) > __hi END AS is_outlier "
        f"FROM {table} __t JOIN __b {on} WHERE {d} IS NOT NULL"
    )
