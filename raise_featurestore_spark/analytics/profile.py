"""Whole-table column profiler: one fused scan computing type-appropriate
statistics for every column.

The reference declares per-feature quality checks and per-analysis metrics
(raise_/analytics/analysis.py:366-414, observability.py:109-501) but no
"profile the whole table" operator; real feature stores (and Deequ-style
data validation) lead with one. Semantics:

- every column:        count, null_count, approx/exact distinct
- numeric columns:     mean, stddev, min, max
- string columns:      avg_length, max_length
- timestamp columns:   min/max as epoch micros

Scale design: ALL metrics for ALL columns compile into a single
``df.agg(...)`` — one scan, one partial+final hash aggregate, no per-column
jobs (a naive profiler issues N queries for N columns). Exact distinct
counts are the oracle-checkable default at test scale; pass
``approx_distinct=True`` to switch to HLL++ for the 100 TB posture (one
pass still — sketches merge).

Output is long-form ``(col_name, metric, value)`` with value as DOUBLE so the
frame is engine-portable and hash-stable (timestamps surface as epoch
micros, string metrics as lengths).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from raise_featurestore_spark.functions.stable import (
    dec_sum,
    dec_sum_sql,
    dec_var,
    dec_var_sql,
    grid_snap,
    grid_snap_sql,
    stable_round,
    stable_round_sql,
)

DEFAULT_ROUND = 4

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double", "decimal"}


def _metrics_for(col: str, dtype: str, approx_distinct: bool, round_to: int) -> list[tuple[str, Column]]:
    """Directly-aggregated metrics. Numeric mean/stddev are NOT here — they
    derive from the shared decimal partials (:func:`_moment_partials`) in a
    post-aggregate projection: inlining dec_sum + dec_var per metric
    re-evaluates the decimal when-chains ~6× per column, which blew the
    whole-stage-codegen method budget into interpreted mode and cost 5×
    wall-clock on the events profile (r6 bench finding)."""
    c = F.col(col)
    base_type = dtype.split("(")[0]
    distinct = (
        F.approx_count_distinct(c) if approx_distinct else F.count_distinct(c)
    )
    out: list[tuple[str, Column]] = [
        ("count", F.count(c).cast("double")),
        ("null_count", F.count(F.when(c.isNull(), 1)).cast("double")),
        ("distinct_count", distinct.cast("double")),
    ]
    if base_type in _NUMERIC:
        d = c.cast("double")
        out += [
            ("min", F.min(d)),
            ("max", F.max(d)),
        ]
    elif base_type == "string":
        out += [
            ("avg_length", grid_snap(F.avg(F.length(c)), round_to) + F.lit(0.0)),
            ("max_length", F.max(F.length(c)).cast("double")),
        ]
    elif base_type in ("timestamp", "timestamp_ntz"):
        # epoch micros via a type-agnostic diff (unix_micros rejects NTZ)
        ep = F.expr(f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', CAST({col} AS TIMESTAMP_NTZ))")
        out += [
            ("min_epoch_us", F.min(ep).cast("double")),
            ("max_epoch_us", F.max(ep).cast("double")),
        ]
    return out


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    approx_distinct: bool = False,
    round_to: int = DEFAULT_ROUND,
) -> DataFrame:
    """(col_name, metric, value) — one row per computed statistic, one scan
    for the whole table."""
    from raise_featurestore_spark.functions.stable import (
        dec_poison,
        dec_scaled,
        poisoned,
        underflow_poison,
    )

    dtypes = dict(df.dtypes)
    cols = columns or [c for c in df.columns if dtypes[c].split("(")[0] in
                       _NUMERIC | {"string", "timestamp", "timestamp_ntz", "boolean"}]
    aggs: list[Column] = []
    # exact COUNT(DISTINCT) over N columns compiles to an Expand that
    # multiplies every input row N+1 times — running the per-row decimal
    # moment chains on the EXPANDED rows multiplied their cost by the
    # column count (r6 bench finding). Distinct counts get their own
    # aggregate pass; the two 1-row frames cross-join for free.
    distinct_aggs: list[Column] = []
    stack_items: list[str] = []
    derived: list[Column] = []
    for i, col in enumerate(cols):
        for j, (metric, expr) in enumerate(
            _metrics_for(col, dtypes[col], approx_distinct, round_to)
        ):
            alias = f"__p_{i}_{j}"
            target = (
                distinct_aggs
                if metric == "distinct_count" and not approx_distinct
                else aggs
            )
            target.append(expr.alias(alias))
            stack_items.append(f"'{col}', '{metric}', {alias}")
        if dtypes[col].split("(")[0] in _NUMERIC:
            # ONE set of exact-decimal moment partials per column; mean and
            # stddev derive from them over the 1-row aggregate (identical
            # op sequence to dec_sum / sqrt(dec_var), shared children)
            d = F.col(col).cast("double")
            dec = dec_scaled(d)
            aggs += [
                F.count(d).cast("double").alias(f"__n_{i}"),
                (F.sum(dec).cast("double") / F.lit(1e4)).alias(f"__s1_{i}"),
                (F.sum(dec * dec).cast("double") / F.lit(1e8)).alias(f"__s2_{i}"),
                # + the r7 underflow sentinel — the SQL twin's
                # dec_sum_sql/dec_var_sql carry it, so the Spark partials
                # must poison the same groups
                (dec_poison(d) + underflow_poison(d)).alias(f"__pp_{i}"),
            ]
            nn, s1, s2 = F.col(f"__n_{i}"), F.col(f"__s1_{i}"), F.col(f"__s2_{i}")
            pois = F.col(f"__pp_{i}")
            mean = stable_round(
                poisoned(s1 / nn, pois), decimals=round_to
            ) + F.lit(0.0)
            var = F.greatest((s2 - s1 * s1 / nn) / (nn - F.lit(1.0)), F.lit(0.0))
            std = stable_round(
                F.sqrt(poisoned(F.when(nn > 1, var), pois)), decimals=round_to
            ) + F.lit(0.0)
            derived += [mean.alias(f"__mean_{i}"), std.alias(f"__std_{i}")]
            stack_items.append(f"'{col}', 'mean', __mean_{i}")
            stack_items.append(f"'{col}', 'stddev', __std_{i}")
    one_row = df.agg(*aggs)
    if distinct_aggs:
        one_row = one_row.crossJoin(F.broadcast(df.agg(*distinct_aggs)))
    if derived:
        one_row = one_row.select(F.col("*"), *derived)
    return one_row.selectExpr(
        f"stack({len(stack_items)}, {', '.join(stack_items)}) AS (col_name, metric, value)"
    )


def profile_sql(
    table: str,
    columns: list[tuple[str, str]],
    round_to: int = DEFAULT_ROUND,
) -> str:
    """DuckDB twin of :func:`profile` (exact-distinct mode). ``columns`` is
    (name, spark_dtype) pairs — generated from the same schema the Spark
    side profiles, so both engines emit identical (col_name, metric) rows."""
    selects: list[str] = []
    for col, dtype in columns:
        base_type = dtype.split("(")[0]
        rows = [
            ("count", f"CAST(COUNT({col}) AS DOUBLE)"),
            ("null_count", f"CAST(COUNT(*) - COUNT({col}) AS DOUBLE)"),
            ("distinct_count", f"CAST(COUNT(DISTINCT {col}) AS DOUBLE)"),
        ]
        if base_type in _NUMERIC:
            d = f"CAST({col} AS DOUBLE)"
            rows += [
                ("mean", stable_round_sql(
                    f"{dec_sum_sql(d)} / CAST(COUNT({d}) AS DOUBLE)",
                    decimals=round_to) + " + 0.0"),
                ("stddev", stable_round_sql(
                    f"SQRT({dec_var_sql(d)})", decimals=round_to) + " + 0.0"),
                ("min", f"MIN({d})"),
                ("max", f"MAX({d})"),
            ]
        elif base_type == "string":
            rows += [
                ("avg_length", grid_snap_sql(f"AVG(LENGTH({col}))", round_to) + " + 0.0"),
                ("max_length", f"CAST(MAX(LENGTH({col})) AS DOUBLE)"),
            ]
        elif base_type in ("timestamp", "timestamp_ntz"):
            ep = f"date_diff('microsecond', TIMESTAMP '1970-01-01 00:00:00', {col})"
            rows += [
                ("min_epoch_us", f"CAST(MIN({ep}) AS DOUBLE)"),
                ("max_epoch_us", f"CAST(MAX({ep}) AS DOUBLE)"),
            ]
        for metric, expr in rows:
            selects.append(f"SELECT '{col}' AS col_name, '{metric}' AS metric, {expr} AS value FROM {table}")
    return " UNION ALL ".join(selects)


# --------------------------------------------- label / class balance


def label_balance_report(
    df: DataFrame,
    label_col: str,
    group_by: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Class-balance QA per group: (group?, n, n_classes, majority_share,
    entropy, gini) — the first thing to check before training on a
    labeled/stratified corpus (a 0.98-majority split trains a constant
    predictor; near-zero entropy in one source flags a scrape bug).

    Scale shape: ONE grouped count per (group, label) — map-side
    combinable, output bounded by the label vocabulary — then a window +
    aggregate over that bounded relation. Shannon entropy in nats,
    Gini impurity 1−Σp²; probabilities are exact-count divisions so both
    engines feed ln() identical doubles (the ≤1-ulp libm/JVM ln
    difference and the ≤classes-term sum-order noise sit ~1e-16, ten
    orders under the 1e-6 emission grid). NULL labels form their own
    class (a real category in corpus QA — unlabeled rows): GROUP BY
    collects NULLs into one group on both engines, so the raw label is
    the group key — no string sentinel, so a genuine label value
    '<null>' stays a distinct class (r8 ADVICE low)."""
    from pyspark.sql.window import Window

    from raise_featurestore_spark.functions.stable import grid_snap

    keys = [F.col(group_by)] if group_by else []
    counts = df.groupBy(
        *keys, F.col(label_col).cast("string").alias("__lab")
    ).agg(F.count(F.lit(1)).alias("__c"))
    w = Window.partitionBy(*keys) if group_by else Window.partitionBy(F.lit(0))
    p = F.col("__c").cast("double") / F.sum("__c").over(w).cast("double")
    enriched = counts.select(*keys, "__c", p.alias("__p"))
    out = enriched.groupBy(*keys).agg(
        F.sum("__c").alias("n"),
        F.count(F.lit(1)).alias("n_classes"),
        (
            F.max("__c").cast("double") / F.sum("__c").cast("double")
        ).alias("majority_share"),
        grid_snap(-F.sum(F.col("__p") * F.log("__p")), round_to).alias("entropy"),
        grid_snap(
            F.lit(1.0) - F.sum(F.col("__p") * F.col("__p")), round_to
        ).alias("gini"),
    )
    return out


def label_balance_report_sql(
    table: str,
    label_col: str,
    group_by: str | None = None,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`label_balance_report`."""
    from raise_featurestore_spark.functions.stable import grid_snap_sql

    keys = f"{group_by}, " if group_by else ""
    part = f"PARTITION BY {group_by}" if group_by else ""
    ent = grid_snap_sql("-SUM(__p * LN(__p))", round_to)
    gini = grid_snap_sql("1.0 - SUM(__p * __p)", round_to)
    return (
        f"WITH __c AS (SELECT {keys}"
        f"CAST({label_col} AS VARCHAR) AS __lab, "
        f"COUNT(*) AS __c FROM {table} GROUP BY {'1, 2' if group_by else '1'}), "
        f"__p AS (SELECT *, CAST(__c AS DOUBLE) / "
        f"CAST(SUM(__c) OVER ({part}) AS DOUBLE) AS __p FROM __c) "
        f"SELECT {keys}CAST(SUM(__c) AS BIGINT) AS n, "
        f"COUNT(*) AS n_classes, "
        f"CAST(MAX(__c) AS DOUBLE) / CAST(SUM(__c) AS DOUBLE) AS majority_share, "
        f"{ent} AS entropy, {gini} AS gini FROM __p "
        f"GROUP BY {'1' if group_by else '()'}"
    )
