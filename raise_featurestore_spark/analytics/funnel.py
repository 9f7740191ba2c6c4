"""Product analytics: ordered funnels and cohort retention.

Engine additions (the reference's analytics tier has no event-sequence
operators); both are the bread-and-butter queries of an events table and
both compile to a bounded number of grouped aggregates — never a per-user
Python loop, never an unbounded self-join.

- ``funnel_report``: how many users completed step 1, step 1→2 IN ORDER,
  step 1→2→3, … Strict ordering ("B after the user's first A") is the
  part a naive join gets wrong; it is computed as a per-user LEFT FOLD of
  conditional-min timestamps: t₁ = min ts of step 1; tₖ = min ts of step
  k AFTER tₖ₋₁ — one entity-keyed left join + conditional-min aggregate
  per level (k−1 joins/shuffles total; k is a funnel's handful of steps,
  and each join is keyed on the entity, so AQE handles skew).
- ``cohort_retention``: users bucketed by first-activity period (their
  cohort); for each offset k, how many were active k periods later. Two
  grouped passes (first-activity, then distinct user-period activity)
  joined on user — the join key is the entity, so AQE handles skew; the
  output is |cohorts| × |offsets|, tiny at any scale.

Cross-engine: timestamps never leave the plan (only counts and period
STRINGS are emitted); the k-level fold uses min/conditional-min only —
order statistics, partition-order-free by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_report(
    df: DataFrame,
    steps: list[str],
    entity_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
    within: str | None = None,
) -> DataFrame:
    """One row per funnel step: (step_index, step, n_entities) where
    n_entities completed steps 1..k IN ORDER (strictly increasing
    timestamps across steps).

    ``within`` (PRD duration grammar, e.g. "7d" — the most common real
    funnel spec) bounds each CONVERSION: step k counts only if it occurs
    within that duration AFTER the user's step k−1 time. The
    conditional-min fold extends naturally — the window predicate
    ``tₖ₋₁ < ts ≤ tₖ₋₁ + within`` rides inside the same conditional min,
    so the plan shape (k−1 entity-keyed joins) is unchanged. Note the
    fold is greedy on tₖ₋₁ (each tₖ is the EARLIEST qualifying time);
    a user who could only convert from a later step-(k−1) occurrence is
    not counted — the standard first-touch funnel semantics."""
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    secs = None
    if within is not None:
        from raise_featurestore_spark.analytics.analysis import (
            parse_duration_seconds,
        )

        secs = parse_duration_seconds(within)
    ts = F.col(time_col)
    # t₀ = first occurrence of step 1; tₖ = first step-k occurrence
    # strictly after tₖ₋₁ — one entity-keyed LEFT join + conditional-min
    # aggregate per level (k−1 joins total, k small; the left join keeps
    # users with no step-k events, whose tₖ stays NULL, and a NULL tₖ₋₁
    # nulls the whole suffix through the `>` comparison).
    grouped = df.groupBy(entity_col).agg(
        F.min(F.when(F.col(type_col) == steps[0], ts)).alias("__t_0")
    )
    for k in range(1, len(steps)):
        evk = df.where(F.col(type_col) == steps[k]).select(
            F.col(entity_col).alias("__e"), ts.alias("__ts")
        )
        carry = [entity_col] + [f"__t_{i}" for i in range(k)]
        qual = F.col("__ts") > F.col(f"__t_{k-1}")
        if secs is not None:
            # timestamp + interval is exact integer-microsecond arithmetic
            # on both engines, so the boundary `<=` cannot diverge
            qual = qual & (
                F.col("__ts")
                <= F.col(f"__t_{k-1}") + F.expr(f"INTERVAL {secs} SECOND")
            )
        grouped = (
            grouped.join(evk, F.col(entity_col) == F.col("__e"), "left")
            .groupBy(*carry)
            .agg(F.min(F.when(qual, F.col("__ts"))).alias(f"__t_{k}"))
        )
    counts = grouped.agg(
        *[
            # coalesce: an empty input must report 0, not NULL — the SQL
            # twin already guards this (r5 review finding)
            F.coalesce(
                F.sum(F.col(f"__t_{k}").isNotNull().cast("long")),
                F.lit(0).cast("long"),
            ).alias(f"__n_{k}")
            for k in range(len(steps))
        ]
    )
    rows = [
        F.struct(
            F.lit(k + 1).alias("step_index"),
            F.lit(s).alias("step"),
            F.col(f"__n_{k}").alias("n_entities"),
        )
        for k, s in enumerate(steps)
    ]
    return counts.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.step_index", "r.step", "r.n_entities"
    )


def funnel_report_sql(
    table: str,
    steps: list[str],
    entity_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
    within: str | None = None,
) -> str:
    """DuckDB twin of :func:`funnel_report` (the same conditional-min
    fold, expressed as chained CTEs)."""
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    secs = None
    if within is not None:
        from raise_featurestore_spark.analytics.analysis import (
            parse_duration_seconds,
        )

        secs = parse_duration_seconds(within)
    ctes = [
        f"__f0 AS (SELECT {entity_col} AS e, "
        f"MIN(CASE WHEN {type_col} = '{steps[0]}' THEN {time_col} END) AS t_0 "
        f"FROM {table} GROUP BY {entity_col})"
    ]
    for k in range(1, len(steps)):
        prev_cols = ", ".join(f"p.t_{i}" for i in range(k))
        qual = f"s.{time_col} > p.t_{k-1}"
        if secs is not None:
            qual += (
                f" AND s.{time_col} <= p.t_{k-1} + INTERVAL {secs} SECOND"
            )
        ctes.append(
            f"__f{k} AS (SELECT p.e, {prev_cols}, "
            f"MIN(CASE WHEN {qual} THEN s.{time_col} END) AS t_{k} "
            f"FROM __f{k-1} p LEFT JOIN {table} s "
            f"ON s.{entity_col} = p.e AND s.{type_col} = '{steps[k]}' "
            f"GROUP BY p.e, {prev_cols})"
        )
    unions = " UNION ALL ".join(
        f"SELECT {k + 1} AS step_index, '{s}' AS step, "
        f"CAST(COALESCE(SUM(CASE WHEN t_{k} IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) "
        f"AS n_entities FROM __f{len(steps) - 1}"
        for k, s in enumerate(steps)
    )
    return f"WITH {', '.join(ctes)} {unions}"


def cohort_retention(
    df: DataFrame,
    entity_col: str = "user_id",
    time_col: str = "ts",
    period: str = "month",
    max_offset: int = 6,
) -> DataFrame:
    """(cohort, offset, n_active): users whose FIRST activity fell in
    ``cohort``, counted if active ``offset`` periods later. offset 0 is
    the cohort size."""
    trunc = F.date_trunc(period, F.col(time_col))
    firsts = df.groupBy(entity_col).agg(F.min(trunc).alias("__first"))
    active = df.select(
        F.col(entity_col), trunc.alias("__p")
    ).distinct()
    if period == "month":
        offset = (
            (F.year("__p") - F.year("__first")) * 12
            + (F.month("__p") - F.month("__first"))
        )
    elif period == "week":
        offset = F.expr("CAST(date_diff(DAY, __first, __p) AS INT)") / 7
        offset = offset.cast("int")
    elif period == "day":
        offset = F.expr("CAST(date_diff(DAY, __first, __p) AS INT)")
    else:
        raise ValueError(f"unsupported period {period!r}")
    return (
        active.join(firsts, entity_col)
        .withColumn("__off", offset)
        .where(F.col("__off") <= max_offset)
        .groupBy(
            F.date_format("__first", "yyyy-MM").alias("cohort")
            if period == "month"
            else F.date_format("__first", "yyyy-MM-dd").alias("cohort"),
            F.col("__off").alias("offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def cohort_retention_sql(
    table: str,
    entity_col: str = "user_id",
    time_col: str = "ts",
    period: str = "month",
    max_offset: int = 6,
) -> str:
    """DuckDB twin of :func:`cohort_retention`."""
    trunc = f"DATE_TRUNC('{period}', {time_col})"
    if period == "month":
        off = (
            "(YEAR(__p) - YEAR(__first)) * 12 + (MONTH(__p) - MONTH(__first))"
        )
        cohort = "STRFTIME(__first, '%Y-%m')"
    elif period == "week":
        off = "CAST(DATE_DIFF('day', __first, __p) / 7 AS INT)"
        cohort = "STRFTIME(__first, '%Y-%m-%d')"
    elif period == "day":
        off = "CAST(DATE_DIFF('day', __first, __p) AS INT)"
        cohort = "STRFTIME(__first, '%Y-%m-%d')"
    else:
        raise ValueError(f"unsupported period {period!r}")
    return (
        f"WITH __first AS (SELECT {entity_col} AS e, MIN({trunc}) AS __first "
        f"FROM {table} GROUP BY {entity_col}), "
        f"__act AS (SELECT DISTINCT {entity_col} AS e, {trunc} AS __p FROM {table}) "
        f"SELECT {cohort} AS cohort, CAST({off} AS INT) AS offset, "
        f"COUNT(*) AS n_active "
        f"FROM __act JOIN __first USING (e) WHERE {off} <= {max_offset} "
        f"GROUP BY 1, 2"
    )
