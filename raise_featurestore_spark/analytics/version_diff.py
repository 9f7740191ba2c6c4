"""VersionDiff compiler: compare two versions of a feature — statistics
deltas + distribution drift over shared bins.

(reference: raise_/analytics/analysis.py:199-246 VersionDiff spec; drift
metric outputs raise_/PRD.md:671-676; mocked result shape
raise_/analytics/client.py:167-176. Schema changes are metadata-plane —
``version_diff_report`` pulls dtype/derivation changes from the catalog;
the numeric comparison below is the Spark plan.)

Plan: the two version columns are computed over the SAME scan (feature
versions live in one table — a version is either a physical column or a
derived expression), then stacked side-by-side via one explode into
(side, value) rows. From there the comparison IS a drift computation —
``compile_drift`` is reused verbatim with side predicates — plus one fused
conditional aggregate for per-side count/mean/stddev. Two scans total of
one table regardless of bins or metrics.

Cross-engine determinism: means are emitted as round(sum,4)/count (bit-
identical division of identical doubles, no second rounding boundary);
change_pct derives from those exact means.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from raise_featurestore_spark.analytics.analysis import Drift, VersionDiff
from raise_featurestore_spark.analytics.drift import compile_drift, drift_to_sql

DEFAULT_ROUND = 4


def _stacked(df: DataFrame, col_from: Column, col_to: Column) -> DataFrame:
    pair = F.array(
        F.struct(F.lit(0).alias("__side"), col_from.cast("double").alias("__v")),
        F.struct(F.lit(1).alias("__side"), col_to.cast("double").alias("__v")),
    )
    return (
        df.select(F.explode(pair).alias("__s"))
        .select(F.col("__s.__side").alias("__side"), F.col("__s.__v").alias("__v"))
    )


def compile_version_diff(
    df: DataFrame,
    spec: VersionDiff,
    col_from: Column,
    col_to: Column,
    round_to: int | None = DEFAULT_ROUND,
) -> DataFrame:
    """``col_from``/``col_to`` are the resolved version expressions (use
    ``FeatureGroup.read`` / the expression compiler to resolve ``name@vN``)."""
    out_cols: list[DataFrame] = []

    parts = []
    if "statistics" in spec.compare or "samples" in spec.compare:
        # exact-decimal moments + stable emission, not ROUND(float SUM):
        # the float sum is parallel-order-dependent and engine ROUND
        # diverges on repr-ties — the round-4 flake class (emission rules)
        from raise_featurestore_spark.functions.stable import (
            dec_poison,
            dec_scaled,
            poisoned,
            stable_round,
            underflow_poison,
        )

        a, b = col_from.cast("double"), col_to.cast("double")
        # ONE set of decimal partials per side, stats derived over the
        # 1-row aggregate — inlining dec_sum/dec_var per emitted column
        # re-evaluates the per-row decimal chains ~5× (the r6 profiler
        # finding; same cure). The poison folds in the r7 underflow
        # sentinel, matching the dec_sum_sql/dec_var_sql the oracle uses.
        deca, decb = dec_scaled(a), dec_scaled(b)
        g1, g2 = F.lit(1e4), F.lit(1e8)  # dec_scaled conversion contract
        partials = df.agg(
            F.count(a).cast("double").alias("__na"),
            (F.sum(deca).cast("double") / g1).alias("__s1a"),
            (F.sum(deca * deca).cast("double") / g2).alias("__s2a"),
            (dec_poison(a) + underflow_poison(a)).alias("__pa"),
            F.count(b).cast("double").alias("__nb"),
            (F.sum(decb).cast("double") / g1).alias("__s1b"),
            (F.sum(decb * decb).cast("double") / g2).alias("__s2b"),
            (dec_poison(b) + underflow_poison(b)).alias("__pb"),
        )

        def _derived(n, s1, s2, p):
            mean = poisoned(s1 / n, p)
            var = F.greatest((s2 - s1 * s1 / n) / (n - F.lit(1.0)), F.lit(0.0))
            std = F.sqrt(poisoned(F.when(n > 1, var), p))
            return mean, std

        mean_a, std_a = _derived(
            F.col("__na"), F.col("__s1a"), F.col("__s2a"), F.col("__pa")
        )
        mean_b, std_b = _derived(
            F.col("__nb"), F.col("__s1b"), F.col("__s2b"), F.col("__pb")
        )
        stats = partials.select(
            F.col("__na").cast("long").alias("count_from"),
            F.col("__nb").cast("long").alias("count_to"),
            stable_round(mean_a).alias("mean_from"),
            stable_round(mean_b).alias("mean_to"),
            (
                stable_round((mean_b - mean_a) / mean_a * 100.0, decimals=round_to)
                + F.lit(0.0)
            ).alias(
                "mean_change_pct"  # + 0.0: −0.0 canonicalization, mirrors SQL
            ),
            stable_round(std_a, decimals=round_to).alias("stddev_from"),
            stable_round(std_b, decimals=round_to).alias("stddev_to"),
        )
        parts.append(stats)

    if "distribution" in spec.compare:
        drift_spec = Drift(
            feature="__v",
            metrics=["psi", "kl_divergence", "js_divergence"],
            bins=spec.bins,
            baseline_filter="__side = 0",
            current_filter="__side = 1",
        )
        parts.append(compile_drift(_stacked(df, col_from, col_to), drift_spec, round_to))

    if not parts:
        raise ValueError(f"nothing to compare in {spec.compare!r}")
    out = parts[0]
    for p in parts[1:]:
        out = out.crossJoin(F.broadcast(p))
    return out


def version_diff_to_sql(
    spec: VersionDiff,
    table: str,
    expr_from: str,
    expr_to: str,
    round_to: int | None = DEFAULT_ROUND,
) -> str:
    """DuckDB oracle for the same comparison; ``expr_from``/``expr_to`` are
    the SQL forms of the resolved version expressions."""
    from raise_featurestore_spark.functions.stable import (
        dec_sum_sql,
        dec_var_sql,
        stable_round_sql,
    )

    a, b = f"CAST({expr_from} AS DOUBLE)", f"CAST({expr_to} AS DOUBLE)"
    mean_a = f"({dec_sum_sql(a)} / CAST(COUNT({a}) AS DOUBLE))"
    mean_b = f"({dec_sum_sql(b)} / CAST(COUNT({b}) AS DOUBLE))"
    parts = []
    if "statistics" in spec.compare or "samples" in spec.compare:
        pct = stable_round_sql(
            f"({mean_b} - {mean_a}) / {mean_a} * 100.0", decimals=round_to
        )
        parts.append(
            f"(SELECT COUNT({a}) AS count_from, COUNT({b}) AS count_to, "
            f"{stable_round_sql(mean_a)} AS mean_from, "
            f"{stable_round_sql(mean_b)} AS mean_to, "
            f"{pct} + 0.0 AS mean_change_pct, "
            f"{stable_round_sql(f'SQRT({dec_var_sql(a)})', decimals=round_to)} AS stddev_from, "
            f"{stable_round_sql(f'SQRT({dec_var_sql(b)})', decimals=round_to)} AS stddev_to "
            f"FROM {table}) __st"
        )
    if "distribution" in spec.compare:
        drift_spec = Drift(
            feature="__v",
            metrics=["psi", "kl_divergence", "js_divergence"],
            bins=spec.bins,
            baseline_filter="__side = 0",
            current_filter="__side = 1",
        )
        stacked = (
            f"(SELECT 0 AS __side, {a} AS __v FROM {table} "
            f"UNION ALL SELECT 1, {b} FROM {table}) __stk"
        )
        parts.append(f"({drift_to_sql(drift_spec, stacked, round_to)}) __dr")
    return "SELECT * FROM " + " CROSS JOIN ".join(parts)


def version_diff_report(group, spark, spec: VersionDiff) -> dict:
    """Full report incl. metadata-plane schema changes: dtype / derivation /
    nullability across versions (reference: analysis.py:199-246 'schema')."""
    f_from = group.get_feature(f"{spec.feature}@{spec.from_version}")
    f_to = group.get_feature(f"{spec.feature}@{spec.to_version}")
    report: dict = {
        "feature": spec.feature,
        "from_version": spec.from_version,
        "to_version": spec.to_version,
        "schema_changes": {},
    }
    if "schema" in spec.compare:
        changes = {}
        if str(f_from.dtype) != str(f_to.dtype):
            changes["dtype"] = {"from": str(f_from.dtype), "to": str(f_to.dtype)}
        if f_from.derived_from != f_to.derived_from:
            changes["derived_from"] = {"from": f_from.derived_from, "to": f_to.derived_from}
        if f_from.nullable != f_to.nullable:
            changes["nullable"] = {"from": f_from.nullable, "to": f_to.nullable}
        report["schema_changes"] = changes
    numeric_compare = [c for c in spec.compare if c != "schema"]
    if numeric_compare:
        name_from = f"{spec.feature}@{spec.from_version}"
        name_to = f"{spec.feature}@{spec.to_version}"
        # dedupe: diffing a version against itself reads one column
        df = group.read(spark, list(dict.fromkeys([name_from, name_to])))
        row = compile_version_diff(
            df, spec, F.col(f"`{name_from}`"), F.col(f"`{name_to}`")
        ).first()
        report["metrics"] = row.asDict()
    return report
