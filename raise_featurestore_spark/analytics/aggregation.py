"""Aggregation compiler: Aggregation spec → Spark DataFrame plan + ANSI SQL.

Implements the SQL semantics the reference declares for its (mocked)
aggregation service (reference: raise_/analytics/analysis.py:30-92,
raise_/PRD.md:954-993): metric whitelist, single-feature ``group_by``,
trailing time ``window`` ("7d" → WHERE ts >= anchor - 7d), and ``rolling``
aggregates over per-day buckets with an N-period ROWS frame.

Design notes (scale posture):

- The whole plan is declarative DataFrame ops → Catalyst does partial+final
  hash aggregation, predicate pushdown of ``filter`` into the parquet scan,
  and column pruning down to the referenced features.
- The time-window anchor (max of the time column) is computed as a 1-row
  aggregate cross-joined (broadcast) into the scan rather than collected to
  the driver, so the plan stays lazy and cluster-side.
- Rolling aggregation is two-stage: a distributed groupBy compresses raw rows
  to (group, day) buckets first; the ordered window then runs over that tiny
  bucketed relation (≤ groups × days rows), so the unpartitioned ORDER BY is
  never a bottleneck. Rolling avg/stddev/variance recombine exactly from
  per-bucket (n, Σx, Σx²) partials rather than averaging averages.
- Double-typed metrics are rounded to ``round_to`` decimals so results are
  bit-stable across engines/partitionings (parallel double summation is
  order-dependent); counts and min/max stay exact. Unbounded-magnitude
  metrics (sum/avg/stddev/variance/median/percentiles) additionally snap to
  5 significant digits first (``functions/stable.sig_round``, mirrored in
  the SQL twin): a decimal grid at price-squared magnitudes demands more
  agreeing digits than float sum order guarantees, which is exactly the
  round-4 driver hash flake (VERDICT.md r4 item 1).

Both ``compile_aggregation`` (Spark) and ``aggregation_to_sql`` (ANSI SQL for
the DuckDB oracle) derive from the same spec, so the differential test cannot
drift from the implementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from raise_featurestore_spark.analytics.analysis import Aggregation, parse_duration_seconds
from raise_featurestore_spark.functions.stable import (
    dec_poison,
    dec_poison_sql,
    dec_scaled,
    dec_scaled_sql,
    grid_snap,
    grid_snap_sql,
    poisoned,
    poisoned_sql,
    stable_round,
    stable_round_sql,
)

DEFAULT_ROUND = 4

# metrics whose result is a (rounded) double
_DOUBLE_METRICS = {
    "sum",
    "avg",
    "mean",
    "stddev",
    "variance",
    "median",
    "null_rate",
}
_PERCENTILE = {"p50": 0.5, "p75": 0.75, "p90": 0.9, "p95": 0.95, "p99": 0.99}
# Unbounded-magnitude doubles: decimal rounding alone demands more agreeing
# significant digits than parallel float sum order guarantees (variance of a
# price column ~1e9 on a 1e-4 grid ⇒ 13 digits), so these snap to 5
# significant digits FIRST (functions/stable.py — the round-4 driver-flake
# fix) and decimal-round after. null_rate is bounded [0,1]: its decimal grid
# already is a relative grid, so it stays exact-decimal only.
_SIG_METRICS = {"sum", "avg", "mean", "stddev", "variance", "median"} | set(_PERCENTILE)
_ROLLING_METRICS = {"count", "sum", "avg", "mean", "min", "max", "stddev", "variance"}


def metric_alias(metric: str, feature: str) -> str:
    safe = "".join(ch if ch.isalnum() else "_" for ch in feature)
    return f"{metric}_{safe}"


# Exact-moment accumulation (Aggregation.exact_moments): the residual flake
# class after significant-digit OUTPUT snapping is the INPUT noise — a
# parallel double sum lands within an ulp of a snap-grid boundary and the
# two engines (or two partitionings) fall on opposite sides. Killing the
# noise at the source: every row is snapped to the 1e-4 grid with the IEEE
# floor form (grid_snap — lossless for ≤4-decimal data like prices), cast
# to DECIMAL(18,4), and summed EXACTLY (integer arithmetic — associative,
# so partition count / merge order / engine version cannot change it).
# x² as DECIMAL(18,4)·DECIMAL(18,4) → (37,8) is exact in BOTH engines (no
# precision-loss rescale: 37 ≤ 38 Spark, 36 ≤ 38 DuckDB). Only the final
# variance/avg formula runs in double — written as the IDENTICAL op
# sequence on both engines, so IEEE determinism gives bit-equal results.
# Rows the grid cannot hold (NaN, ±Inf, |x| ≥ stable.dec_domain_limit)
# poison the group to NaN — loud, instead of Spark-4 ANSI cast errors or
# silently dropped rows; the poison application survives all-bad groups
# (stable.poisoned). The row/poison terms are single-sourced in
# functions/stable.py — this module only aliases them locally.
# r8: the exact terms are dec_scaled — value·10^g as long-backed
# DECIMAL(18,0) (the int64 grid fast path, same grid/capacity, measured
# ~2× on the fused stats aggregate; see stable.dec_scaled for the
# two-step conversion contract both engines share). The /10^g and
# /10^(2g) rescales below are the contract's second step.
_exact_dec = dec_scaled
_exact_poison = dec_poison
_exact_dec_sql = dec_scaled_sql
_exact_poison_sql = dec_poison_sql


def _round_final(col: Column, metric: str, round_to: int | None) -> Column:
    """The emission rounding, applied in a PROJECTION over the (tiny)
    grouped result rather than inside the aggregate expressions: the
    stable_round tree references its child 5×, and wrapping every
    aggregate inflated whole-stage-codegen compile by seconds on wide
    metric lists (measured +4 s cold on the 12-metric global-stats plan);
    over attribute references it is O(groups) work and tiny codegen."""
    if round_to is None or (metric not in _DOUBLE_METRICS and metric not in _PERCENTILE):
        return col
    if metric in _SIG_METRICS:
        return stable_round(col, decimals=round_to)
    # grid_snap, not F.round: engine ROUND diverges on repr-ties even over
    # identical doubles (Spark HALF_UP on shortest repr vs DuckDB binary)
    return grid_snap(col, round_to)


def _metric_column(
    metric: str,
    feature: str,
    round_to: int | None,
    exact: bool = False,
    defer_round: bool = False,
    grid: int = 4,
) -> Column:
    c = F.col(feature)
    d = c.cast("double")
    if exact and metric in ("sum", "avg", "mean", "stddev", "variance"):
        from raise_featurestore_spark.functions.stable import underflow_poison

        dec = _exact_dec(d, grid)
        s1 = F.sum(dec).cast("double") / F.lit(float(10**grid))
        nn = F.count(d).cast("double")
        # dec-domain poison + the small-magnitude underflow sentinel: a
        # group whose rows MOSTLY snap to 0 on the 1e-g grid would emit a
        # confidently wrong moment on BOTH engines (oracle-invisible) —
        # poison it loud instead; callers raise moment_grid_decimals
        poison = _exact_poison(d, grid) + underflow_poison(d, grid)
        if metric == "sum":
            core = s1
        elif metric in ("avg", "mean"):
            core = s1 / nn
        else:
            s2 = F.sum(dec * dec).cast("double") / F.lit(float(10 ** (2 * grid)))
            var = (s2 - s1 * s1 / nn) / (nn - F.lit(1.0))
            if metric == "stddev":
                # greatest clamps cancellation-negative variance; the n>1
                # guard sits OUTSIDE it (GREATEST ignores NULL on both
                # engines, so guarding inside would turn NULL into 0.0)
                var = F.sqrt(F.greatest(var, F.lit(0.0)))
            core = F.when(F.count(d) > 1, var)  # VAR_SAMP(n<2) is NULL
        out = poisoned(core, poison)
        if round_to is not None and not defer_round:
            out = stable_round(out, decimals=round_to)
        return out.alias(metric_alias(metric, feature))
    if metric == "count":
        out = F.count(c)
    elif metric == "null_count":
        out = F.sum(c.isNull().cast("long")).cast("long")
    elif metric == "distinct_count":
        out = F.countDistinct(c)
    elif metric == "approx_distinct_count":
        # HLL++ sketch: mergeable map-side, constant memory — unlike exact
        # countDistinct's Expand+reshuffle. The 100 TB default.
        out = F.approx_count_distinct(c)
    elif metric == "min":
        out = F.min(c)
    elif metric == "max":
        out = F.max(c)
    elif metric == "sum":
        out = F.sum(d)
    elif metric in ("avg", "mean"):
        out = F.avg(d)
    elif metric == "stddev":
        out = F.stddev_samp(d)
    elif metric == "variance":
        out = F.var_samp(d)
    elif metric == "median":
        out = F.percentile(d, F.lit(0.5))
    elif metric == "null_rate":
        out = F.avg(c.isNull().cast("double"))
    elif metric in _PERCENTILE:
        out = F.percentile(d, F.lit(_PERCENTILE[metric]))
    else:
        raise ValueError(f"unsupported metric {metric!r}")
    if not defer_round:
        out = _round_final(out, metric, round_to)
    return out.alias(metric_alias(metric, feature))


def _metric_sql(
    metric: str, feature: str, round_to: int | None, exact: bool = False,
    grid: int = 4,
) -> str:
    x = feature
    d = f"CAST({x} AS DOUBLE)"
    if exact and metric in ("sum", "avg", "mean", "stddev", "variance"):
        from raise_featurestore_spark.functions.stable import underflow_poison_sql

        dec = _exact_dec_sql(d, grid)
        s1 = f"(CAST(SUM({dec}) AS DOUBLE) / CAST('1e{grid}' AS DOUBLE))"
        nn = f"CAST(COUNT({d}) AS DOUBLE)"
        poison = f"({_exact_poison_sql(d, grid)}) + ({underflow_poison_sql(d, grid)})"
        if metric == "sum":
            core = s1
        elif metric in ("avg", "mean"):
            core = f"{s1} / {nn}"
        else:
            s2 = f"(CAST(SUM(({dec}) * ({dec})) AS DOUBLE) / CAST('1e{2 * grid}' AS DOUBLE))"
            var = f"({s2} - {s1} * {s1} / {nn}) / ({nn} - 1.0)"
            if metric == "stddev":
                var = f"SQRT(GREATEST({var}, 0.0))"
            core = f"CASE WHEN COUNT({d}) > 1 THEN {var} END"
        e = poisoned_sql(core, poison)
        if round_to is not None:
            e = stable_round_sql(e, decimals=round_to)
        return f"{e} AS {metric_alias(metric, feature)}"
    if metric == "count":
        e = f"COUNT({x})"
    elif metric == "null_count":
        e = f"CAST(COALESCE(SUM(CASE WHEN {x} IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)"
    elif metric == "distinct_count":
        e = f"COUNT(DISTINCT {x})"
    elif metric == "approx_distinct_count":
        # engines use different HLL parameterizations — not hash-comparable
        e = f"approx_count_distinct({x})"
    elif metric == "min":
        e = f"MIN({x})"
    elif metric == "max":
        e = f"MAX({x})"
    elif metric == "sum":
        e = f"SUM({d})"
    elif metric in ("avg", "mean"):
        e = f"AVG({d})"
    elif metric == "stddev":
        e = f"STDDEV_SAMP({d})"
    elif metric == "variance":
        e = f"VAR_SAMP({d})"
    elif metric == "median":
        e = f"QUANTILE_CONT({d}, 0.5)"
    elif metric == "null_rate":
        e = f"AVG(CASE WHEN {x} IS NULL THEN 1.0 ELSE 0.0 END)"
    elif metric in _PERCENTILE:
        e = f"QUANTILE_CONT({d}, {_PERCENTILE[metric]})"
    else:
        raise ValueError(f"unsupported metric {metric!r}")
    if round_to is not None and (metric in _DOUBLE_METRICS or metric in _PERCENTILE):
        if metric in _SIG_METRICS:
            e = stable_round_sql(e, decimals=round_to)
        else:
            e = grid_snap_sql(e, round_to)
    return f"{e} AS {metric_alias(metric, feature)}"


def _null_count_fixup(metric: str, feature: str, col: Column) -> Column:
    # SUM over an all-null group yields NULL; the semantic null_count of an
    # empty/all-present group is 0.
    if metric == "null_count":
        return F.coalesce(col, F.lit(0).cast("long")).alias(metric_alias(metric, feature))
    return col


_DEFAULT_GRID = Aggregation.__dataclass_fields__["moment_grid_decimals"].default


def _effective_round(round_to: int | None, spec: Aggregation) -> int | None:
    """Emission follows the input grid ONLY when the user raised it: a
    spec with moment_grid_decimals=8 (probabilities) must not have the
    emission round re-snap the result to the coarse 1e-4 grid and zero it
    out, so round_to widens to g. But a caller who explicitly passed
    round_to=2 with the DEFAULT grid gets exactly 2 decimals — the old
    unconditional max() silently overrode that rounding contract (r6
    ADVICE item 2)."""
    if round_to is None or spec.moment_grid_decimals <= _DEFAULT_GRID:
        return round_to
    return max(round_to, spec.moment_grid_decimals)


def compile_aggregation(
    df: DataFrame, spec: Aggregation, round_to: int | None = DEFAULT_ROUND
) -> DataFrame:
    """Compile an Aggregation spec against ``df`` into a DataFrame plan."""
    round_to = _effective_round(round_to, spec)
    if spec.filter:
        df = df.where(F.expr(spec.filter))

    if spec.window:
        if not spec.time_column:
            raise ValueError("Aggregation.window requires time_column")
        secs = parse_duration_seconds(spec.window)
        anchor = df.agg(F.max(F.col(spec.time_column)).alias("__anchor__"))
        df = df.join(F.broadcast(anchor)).where(
            F.col(spec.time_column) >= F.col("__anchor__") - F.expr(f"INTERVAL {secs} SECOND")
        ).drop("__anchor__")

    if spec.rolling:
        return _compile_rolling(df, spec, round_to)

    # Percentile-family metrics (median, p50..p99) share ONE
    # percentile(col, array(...)) aggregate per feature: N separate exact
    # percentile aggregates each buffer the column independently (and
    # interact catastrophically with distinct-aggregate Expand), measured
    # ~60× slower than the fused array form at sf0.1.
    pct_metrics = {
        m: (_PERCENTILE[m] if m in _PERCENTILE else 0.5)
        for m in spec.metrics
        if m in _PERCENTILE or m == "median"
    }
    # distinct aggregates compile to an Expand; combined with percentile
    # buffers that interaction measured ~40× slower, so distinct metrics get
    # their own pass joined back on the (tiny) grouped result.
    split_distinct = bool(pct_metrics) and "distinct_count" in spec.metrics

    aggs: list[Column] = []
    distinct_aggs: list[Column] = []
    for feature in spec.features:
        safe = "".join(ch if ch.isalnum() else "_" for ch in feature)
        for metric in spec.metrics:
            if metric in pct_metrics:
                continue
            col = _metric_column(
                metric, feature, round_to, exact=spec.exact_moments,
                defer_round=True, grid=spec.moment_grid_decimals,
            )
            col = _null_count_fixup(metric, feature, col)
            if split_distinct and metric == "distinct_count":
                distinct_aggs.append(col)
            else:
                aggs.append(col)
        if pct_metrics:
            fracs = F.array(*[F.lit(p) for p in pct_metrics.values()])
            d = F.col(feature).cast("double")
            # approx path: bounded-memory mergeable sketch instead of
            # buffering every group value — the right default at 100 TB
            # (spec.approx_percentiles); exact stays default for oracles.
            pcts = (
                F.approx_percentile(d, fracs, F.lit(spec.percentile_accuracy))
                if spec.approx_percentiles
                else F.percentile(d, fracs)
            )
            aggs.append(pcts.alias(f"__pcts_{safe}"))

    if pct_metrics and not spec.approx_percentiles and not spec.group_by:
        # global EXACT percentiles buffer every value in the partial
        # aggregate; an under-split scan would build that buffer on one
        # core. With a group_by the groups already spread the partial work.
        from raise_featurestore_spark.tables import fan_out_if_undersplit

        df = fan_out_if_undersplit(df)
    grouped = df.groupBy(spec.group_by).agg(*aggs) if spec.group_by else df.agg(*aggs)
    if distinct_aggs:
        dg = df.groupBy(spec.group_by).agg(*distinct_aggs) if spec.group_by else df.agg(*distinct_aggs)
        if spec.group_by:
            # eqNullSafe: a plain equi-join would drop the NULL group that
            # both groupBy results contain (only the split path rejoins,
            # so percentiles+distinct_count would lose rows other metric
            # combinations keep)
            dg = dg.withColumnRenamed(spec.group_by, "__gb_dist")
            grouped = grouped.join(
                dg, F.col(spec.group_by).eqNullSafe(F.col("__gb_dist")), "inner"
            ).drop("__gb_dist")
        else:
            grouped = grouped.crossJoin(dg)
    # Emission rounding lives HERE, over the grouped result's attribute
    # references — never inside the aggregate expressions (_round_final).
    out: list[Column] = [F.col(spec.group_by)] if spec.group_by else []
    for feature in spec.features:
        safe = "".join(ch if ch.isalnum() else "_" for ch in feature)
        for metric in spec.metrics:
            if metric in pct_metrics:
                idx = list(pct_metrics).index(metric) + 1  # element_at is 1-based
                col = F.element_at(F.col(f"__pcts_{safe}"), idx)
                if round_to is not None:
                    col = stable_round(col, decimals=round_to)
            else:
                col = _round_final(
                    F.col(metric_alias(metric, feature)), metric, round_to
                )
            out.append(col.alias(metric_alias(metric, feature)))
    return grouped.select(*out)


def aggregation_to_sql(
    spec: Aggregation, table: str, round_to: int | None = DEFAULT_ROUND
) -> str:
    """Equivalent ANSI SQL (DuckDB-compatible) for the same spec."""
    round_to = _effective_round(round_to, spec)  # mirror compile_aggregation
    where = []
    if spec.filter:
        where.append(f"({spec.filter})")
    if spec.window:
        secs = parse_duration_seconds(spec.window)
        # anchor MAX under the same filter the compiled plan applies —
        # an unfiltered anchor would pick a different 7-day slice whenever
        # the filter excludes the newest rows
        anchor_where = f" WHERE ({spec.filter})" if spec.filter else ""
        where.append(
            f"{spec.time_column} >= "
            f"(SELECT MAX({spec.time_column}) FROM {table}{anchor_where})"
            f" - INTERVAL {secs} SECOND"
        )
    where_sql = (" WHERE " + " AND ".join(where)) if where else ""

    if spec.rolling:
        return _rolling_sql(spec, table, where_sql, round_to)

    cols = [
        _metric_sql(m, ft, round_to, exact=spec.exact_moments,
                    grid=spec.moment_grid_decimals)
        for ft in spec.features
        for m in spec.metrics
    ]
    if spec.group_by:
        return (
            f"SELECT {spec.group_by}, {', '.join(cols)} FROM {table}{where_sql} "
            f"GROUP BY {spec.group_by}"
        )
    return f"SELECT {', '.join(cols)} FROM {table}{where_sql}"


def _rolling_partials(feature: str, exact: bool, grid: int = 4) -> list[Column]:
    c = F.col(feature)
    d = c.cast("double")
    s = "".join(ch if ch.isalnum() else "_" for ch in feature)
    if exact:
        from raise_featurestore_spark.functions.stable import underflow_count

        # the same flake-killer as the flat path (_exact_dec): per-bucket
        # moment partials in exact decimals, so both the bucket aggregate
        # AND the window recombination are order-independent integer math;
        # a per-bucket NaN/Inf poison flag rides along (decimal can't hold
        # non-finites — they are nulled before the cast and re-applied),
        # plus the underflow COUNT partial (mergeable across buckets; the
        # majority test runs over the window totals, not per bucket).
        dec = _exact_dec(d, grid)
        return [
            F.count(c).alias(f"__n_{s}"),
            F.sum(dec).alias(f"__s_{s}"),
            F.sum(dec * dec).alias(f"__ss_{s}"),
            F.min(c).alias(f"__mn_{s}"),
            F.max(c).alias(f"__mx_{s}"),
            _exact_poison(d, grid).alias(f"__p_{s}"),
            underflow_count(d, grid).alias(f"__uf_{s}"),
        ]
    return [
        F.count(c).alias(f"__n_{s}"),
        F.sum(d).alias(f"__s_{s}"),
        F.sum(d * d).alias(f"__ss_{s}"),
        F.min(c).alias(f"__mn_{s}"),
        F.max(c).alias(f"__mx_{s}"),
        F.lit(0.0).alias(f"__p_{s}"),
        F.lit(0).cast("long").alias(f"__uf_{s}"),
    ]


def _compile_rolling(df: DataFrame, spec: Aggregation, round_to: int | None) -> DataFrame:
    if not spec.time_column:
        raise ValueError("rolling aggregation requires time_column")
    bad = set(spec.metrics) - _ROLLING_METRICS
    if bad:
        raise ValueError(f"metrics {sorted(bad)} not supported in rolling mode")

    # string (not DATE) so the value representation is identical across
    # engines/clients: pandas renders Spark DATE as datetime.date but DuckDB
    # DATE as Timestamp, which breaks value-hash comparison.
    period = F.date_format(F.date_trunc("day", F.col(spec.time_column)), "yyyy-MM-dd").alias(
        "period_start"
    )
    keys = [F.col(spec.group_by)] if spec.group_by else []
    bucketed = df.groupBy(*keys, period).agg(
        *[
            p
            for ft in spec.features
            for p in _rolling_partials(ft, spec.exact_moments, spec.moment_grid_decimals)
        ]
    )

    # ungrouped: constant partition key — the input here is already the
    # daily-bucketed aggregate (≤ one row per day), so single-partition is
    # the intended, bounded plan, not an accident.
    w = (
        Window.partitionBy(spec.group_by).orderBy("period_start")
        if spec.group_by
        else Window.partitionBy(F.lit(0)).orderBy("period_start")
    ).rowsBetween(-(spec.periods - 1), 0)

    out_cols: list[Column] = ([F.col(spec.group_by)] if spec.group_by else []) + [
        F.col("period_start")
    ]
    for ft in spec.features:
        s = "".join(ch if ch.isalnum() else "_" for ch in ft)
        n = F.sum(F.col(f"__n_{s}")).over(w)
        # exact mode: the window sums run over SCALED-INTEGER decimal
        # partials (exact integer math across the bucket aggregate AND
        # the window recombination); the cast-to-double rounds once and
        # the /10^g rescale is the dec_scaled conversion contract's
        # second step, mirrored in the SQL twin.
        tot = F.sum(F.col(f"__s_{s}")).over(w).cast("double")
        ss = F.sum(F.col(f"__ss_{s}")).over(w).cast("double")
        if spec.exact_moments:
            g = spec.moment_grid_decimals
            tot = tot / F.lit(float(10**g))
            ss = ss / F.lit(float(10 ** (2 * g)))
        uf = F.sum(F.col(f"__uf_{s}")).over(w)
        pois = F.max(F.col(f"__p_{s}")).over(w) + F.when(
            uf * 2 > n, F.lit(float("nan"))
        ).otherwise(F.lit(0.0))
        for metric in spec.metrics:
            alias = f"rolling_{metric_alias(metric, ft)}"
            if metric == "count":
                col = n.cast("long")
            elif metric == "sum":
                col = poisoned(tot, pois)
            elif metric in ("avg", "mean"):
                col = poisoned(tot / n, pois)
            elif metric == "min":
                col = F.min(F.col(f"__mn_{s}")).over(w)
            elif metric == "max":
                col = F.max(F.col(f"__mx_{s}")).over(w)
            elif metric == "variance":
                col = poisoned(F.when(n > 1, (ss - tot * tot / n) / (n - 1)), pois)
            elif metric == "stddev":
                # GREATEST clamps cancellation-negative variance (a constant
                # window is ~-1e-24 even with exact partials); DuckDB's
                # SQRT(negative) is a hard error, Spark's a NaN
                col = poisoned(
                    F.when(
                        n > 1,
                        F.sqrt(F.greatest((ss - tot * tot / n) / (n - 1), F.lit(0.0))),
                    ),
                    pois,
                )
            else:  # pragma: no cover
                raise ValueError(metric)
            if round_to is not None and metric not in ("count", "min", "max"):
                col = stable_round(col, decimals=round_to)
            out_cols.append(col.alias(alias))
    return bucketed.select(*out_cols)


def _rolling_sql(spec: Aggregation, table: str, where_sql: str, round_to: int | None) -> str:
    keys = f"{spec.group_by}, " if spec.group_by else ""
    partials = []
    for ft in spec.features:
        s = "".join(ch if ch.isalnum() else "_" for ch in ft)
        d = f"CAST({ft} AS DOUBLE)"
        if spec.exact_moments:
            from raise_featurestore_spark.functions.stable import underflow_count_sql

            dec = _exact_dec_sql(d, spec.moment_grid_decimals)
            partials += [
                f"COUNT({ft}) AS __n_{s}",
                f"SUM({dec}) AS __s_{s}",
                f"SUM(({dec}) * ({dec})) AS __ss_{s}",
                f"MIN({ft}) AS __mn_{s}",
                f"MAX({ft}) AS __mx_{s}",
                f"{_exact_poison_sql(d, spec.moment_grid_decimals)} AS __p_{s}",
                f"{underflow_count_sql(d, spec.moment_grid_decimals)} AS __uf_{s}",
            ]
        else:
            partials += [
                f"COUNT({ft}) AS __n_{s}",
                f"SUM({d}) AS __s_{s}",
                f"SUM({d} * {d}) AS __ss_{s}",
                f"MIN({ft}) AS __mn_{s}",
                f"MAX({ft}) AS __mx_{s}",
                f"0.0 AS __p_{s}",
                f"CAST(0 AS BIGINT) AS __uf_{s}",
            ]
    inner = (
        f"SELECT {keys}STRFTIME(DATE_TRUNC('day', {spec.time_column}), '%Y-%m-%d') AS period_start, "
        f"{', '.join(partials)} FROM {table}{where_sql} "
        f"GROUP BY 1{', 2' if spec.group_by else ''}"
    )
    part = f"PARTITION BY {spec.group_by} " if spec.group_by else ""
    frame = f"OVER ({part}ORDER BY period_start ROWS BETWEEN {spec.periods - 1} PRECEDING AND CURRENT ROW)"
    outs = []
    for ft in spec.features:
        s = "".join(ch if ch.isalnum() else "_" for ch in ft)
        n = f"SUM(__n_{s}) {frame}"
        tot = f"CAST(SUM(__s_{s}) {frame} AS DOUBLE)"
        ss = f"CAST(SUM(__ss_{s}) {frame} AS DOUBLE)"
        if spec.exact_moments:
            g = spec.moment_grid_decimals
            tot = f"({tot} / CAST('1e{g}' AS DOUBLE))"
            ss = f"({ss} / CAST('1e{2 * g}' AS DOUBLE))"
        pois = (
            f"(MAX(__p_{s}) {frame} + CASE WHEN SUM(__uf_{s}) {frame} * 2 > {n} "
            f"THEN CAST('NaN' AS DOUBLE) ELSE 0.0 END)"
        )
        for metric in spec.metrics:
            alias = f"rolling_{metric_alias(metric, ft)}"
            if metric == "count":
                e = f"CAST({n} AS BIGINT)"
            elif metric == "sum":
                e = poisoned_sql(tot, pois)
            elif metric in ("avg", "mean"):
                e = poisoned_sql(f"({tot}) / ({n})", pois)
            elif metric == "min":
                e = f"MIN(__mn_{s}) {frame}"
            elif metric == "max":
                e = f"MAX(__mx_{s}) {frame}"
            elif metric == "variance":
                e = poisoned_sql(
                    f"CASE WHEN {n} > 1 THEN (({ss}) - ({tot}) * ({tot}) / ({n})) / (({n}) - 1) END",
                    pois,
                )
            elif metric == "stddev":
                e = poisoned_sql(
                    f"CASE WHEN {n} > 1 THEN SQRT(GREATEST((({ss}) - ({tot}) * ({tot}) / ({n})) / (({n}) - 1), 0.0)) END",
                    pois,
                )
            else:  # pragma: no cover
                raise ValueError(metric)
            if round_to is not None and metric not in ("count", "min", "max"):
                e = stable_round_sql(e, decimals=round_to)
            outs.append(f"{e} AS {alias}")
    return f"SELECT {keys}period_start, {', '.join(outs)} FROM ({inner}) __b"
