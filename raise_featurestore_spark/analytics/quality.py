"""DataQuality compiler: long-form (check, target, value) quality report.

(reference: raise_/analytics/analysis.py:366-414 — checks completeness /
validity / uniqueness / freshness / consistency / outliers; per-check
semantics raise_/transforms/observability.py:109-501, which the reference
mocks with hardcoded values, e.g. :177-181.)

Check semantics (all deterministic, hence oracle-safe):
- completeness : 1 − null_rate per feature
- validity     : fraction of non-null values that are finite (NaN guard;
                 non-numeric features are trivially 1.0)
- uniqueness   : distinct(key_columns) / count(*)
- freshness    : max(time_column) as epoch seconds (an absolute watermark,
                 not an age — ages depend on now() and would be
                 nondeterministic across engines)
- consistency  : fraction of rows satisfying each named rule predicate
- outliers     : fraction of non-null values beyond mean ± k·stddev

Scale design: at most three scans regardless of feature count —
(1) moments + freshness watermark, (2) the main conditional-count scan with
the broadcast moments joined in, (3) a distinct-aggregate scan only when
uniqueness is requested (distinct compiles to Expand and is kept away from
the other aggregates; see the measured pathology note in aggregation.py).
The long-form pivot is a ``stack`` over the final 1-row frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from raise_featurestore_spark.functions.stable import grid_snap, grid_snap_sql

from raise_featurestore_spark.analytics.analysis import DataQuality

DEFAULT_ROUND = 4


def _safe(name: str) -> str:
    return "".join(ch if ch.isalnum() else "_" for ch in name)


def _is_numeric(df: DataFrame, feature: str) -> bool:
    return dict(df.dtypes)[feature] in ("double", "float", "bigint", "int", "smallint", "tinyint")


def compile_data_quality(
    df: DataFrame, spec: DataQuality, round_to: int | None = DEFAULT_ROUND
) -> DataFrame:
    needs_moments = "outliers" in spec.checks
    needs_fresh = "freshness" in spec.checks and spec.time_column

    base = df
    if needs_moments or needs_fresh:
        pre_aggs: list[Column] = []
        if needs_moments:
            for ft in spec.features:
                x = F.col(ft).cast("double")
                pre_aggs += [F.avg(x).alias(f"__m_{_safe(ft)}"), F.stddev_samp(x).alias(f"__s_{_safe(ft)}")]
        if needs_fresh:
            pre_aggs.append(
                F.max(F.col(spec.time_column).cast("timestamp").cast("double")).alias("__fresh")
            )
        moments = df.agg(*pre_aggs)
        base = df.crossJoin(F.broadcast(moments))

    aggs: list[Column] = [F.count(F.lit(1)).alias("__total")]
    for ft in spec.features:
        c = F.col(ft)
        s = _safe(ft)
        if "completeness" in spec.checks or "validity" in spec.checks:
            aggs.append(F.sum(c.isNull().cast("long")).alias(f"__null_{s}"))
        if "validity" in spec.checks and _is_numeric(df, ft):
            aggs.append(F.sum(F.isnan(c.cast("double")).cast("long")).alias(f"__nan_{s}"))
        if "outliers" in spec.checks:
            x = c.cast("double")
            lo = F.col(f"__m_{s}") - spec.outlier_stddevs * F.col(f"__s_{s}")
            hi = F.col(f"__m_{s}") + spec.outlier_stddevs * F.col(f"__s_{s}")
            aggs.append(F.sum(((x < lo) | (x > hi)).cast("long")).alias(f"__out_{s}"))
            aggs.append(F.count(x).alias(f"__nn_{s}"))
    if "consistency" in spec.checks and spec.consistency_rules:
        for rname, rule in spec.consistency_rules.items():
            aggs.append(F.sum(F.expr(rule).cast("long")).alias(f"__rule_{_safe(rname)}"))
    if needs_fresh:
        aggs.append(F.first("__fresh").alias("__fresh_v"))

    one = base.agg(*aggs)

    if "uniqueness" in spec.checks:
        keys = spec.key_columns or spec.features
        uniq = df.agg(F.countDistinct(*[F.col(k) for k in keys]).alias("__uniq"))
        one = one.crossJoin(F.broadcast(uniq))

    total = F.col("__total").cast("double")
    # /0 guard: on an EMPTY (or fully-filtered) input the ratio checks are
    # NULL — matching DuckDB, whose x/0 and empty AVG are NULL, where
    # Spark's ANSI mode would raise DIVIDE_BY_ZERO instead. Validity and
    # outliers keep their vacuous 1.0 / 0.0 (already guarded on count>0).
    items: list[tuple[str, str, Column]] = []
    for ft in spec.features:
        s = _safe(ft)
        if "completeness" in spec.checks:
            items.append(
                (
                    "completeness",
                    ft,
                    F.when(total > 0, 1.0 - F.col(f"__null_{s}") / total),
                )
            )
        if "validity" in spec.checks:
            nn = total - F.col(f"__null_{s}")
            bad = F.col(f"__nan_{s}") if _is_numeric(df, ft) else F.lit(0)
            items.append(
                ("validity", ft, F.when(nn > 0, 1.0 - bad / nn).otherwise(F.lit(1.0)))
            )
        if "outliers" in spec.checks:
            nn = F.col(f"__nn_{s}").cast("double")
            items.append(
                ("outliers", ft, F.when(nn > 0, F.col(f"__out_{s}") / nn).otherwise(F.lit(0.0)))
            )
    if "uniqueness" in spec.checks:
        keys = spec.key_columns or spec.features
        items.append(
            ("uniqueness", ",".join(keys), F.when(total > 0, F.col("__uniq") / total))
        )
    if "consistency" in spec.checks and spec.consistency_rules:
        for rname in spec.consistency_rules:
            items.append(
                (
                    "consistency",
                    rname,
                    F.when(total > 0, F.col(f"__rule_{_safe(rname)}") / total),
                )
            )
    if needs_fresh:
        items.append(("freshness", spec.time_column, F.col("__fresh_v")))

    cols = []
    for check, target, val in items:
        # grid_snap, not engine ROUND: these are count ratios, the
        # exact repr-tie class (emission rules)
        v = grid_snap(val, round_to) if round_to is not None else val
        cols.append(F.struct(F.lit(check).alias("check"), F.lit(target).alias("target"), v.cast("double").alias("value")))
    return one.select(F.explode(F.array(*cols)).alias("__r")).select(
        F.col("__r.check").alias("check"),
        F.col("__r.target").alias("target"),
        F.col("__r.value").alias("value"),
    )


def data_quality_to_sql(
    spec: DataQuality, table: str, round_to: int | None = DEFAULT_ROUND,
    numeric_features: set[str] | None = None,
) -> str:
    """DuckDB SQL mirror. ``numeric_features`` marks which features get the
    NaN validity guard (Spark decides from the DataFrame schema)."""
    numeric_features = numeric_features if numeric_features is not None else set(spec.features)
    sels: list[str] = []
    for ft in spec.features:
        if "completeness" in spec.checks:
            sels.append(
                f"SELECT 'completeness' AS \"check\", '{ft}' AS target, "
                f"{grid_snap_sql(f'1.0 - AVG(CASE WHEN {ft} IS NULL THEN 1.0 ELSE 0.0 END)', round_to)} "
                f"AS value FROM {table}"
            )
        if "validity" in spec.checks:
            if ft in numeric_features:
                v = (
                    f"CASE WHEN COUNT({ft}) > 0 THEN 1.0 - "
                    f"SUM(CASE WHEN ISNAN(CAST({ft} AS DOUBLE)) THEN 1.0 ELSE 0.0 END) / COUNT({ft}) "
                    f"ELSE 1.0 END"
                )
            else:
                v = "1.0"
            sels.append(
                f"SELECT 'validity', '{ft}', {grid_snap_sql(v, round_to)} FROM {table}"
            )
        if "outliers" in spec.checks:
            k = spec.outlier_stddevs
            x = f"CAST({ft} AS DOUBLE)"
            sels.append(
                f"SELECT 'outliers', '{ft}', " + grid_snap_sql(
                    f"CASE WHEN COUNT({x}) > 0 THEN "
                    f"SUM(CASE WHEN {x} < __m - {k} * __s OR {x} > __m + {k} * __s THEN 1.0 ELSE 0.0 END)"
                    f" / COUNT({x}) ELSE 0.0 END", round_to) + " "
                f"FROM {table} CROSS JOIN (SELECT AVG({x}) AS __m, STDDEV_SAMP({x}) AS __s "
                f"FROM {table}) __mo"
            )
    if "uniqueness" in spec.checks:
        keys = spec.key_columns or spec.features
        kexpr = f"({', '.join(keys)})" if len(keys) > 1 else keys[0]
        sels.append(
            f"SELECT 'uniqueness', '{','.join(keys)}', "
            f"{grid_snap_sql(f'CAST(COUNT(DISTINCT {kexpr}) AS DOUBLE) / COUNT(*)', round_to)} FROM {table}"
        )
    if "consistency" in spec.checks and spec.consistency_rules:
        for rname, rule in spec.consistency_rules.items():
            sels.append(
                f"SELECT 'consistency', '{rname}', "
                f"{grid_snap_sql(f'SUM(CASE WHEN {rule} THEN 1.0 ELSE 0.0 END) / COUNT(*)', round_to)} "
                f"FROM {table}"
            )
    if "freshness" in spec.checks and spec.time_column:
        sels.append(
            f"SELECT 'freshness', '{spec.time_column}', "
            f"{grid_snap_sql(f'EPOCH(MAX(CAST({spec.time_column} AS TIMESTAMP)))', round_to)} FROM {table}"
        )
    return " UNION ALL ".join(sels)


# --------------------------------------------- referential integrity


def referential_integrity(
    edges: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Foreign-key orphan audit across table edges — the join-shaped data
    quality check every multi-table training pipeline needs before a fact
    table feeds feature joins (an orphan row silently drops from every
    inner join downstream).

    ``edges``: (edge_name, child_df, child_key, parent_df, parent_key).
    Emits one row per edge: (edge, n_child, n_orphans, orphan_rate).

    Scale shape: per edge, ONE left-anti join (NOT EXISTS semantics — no
    row multiplication on duplicate parent keys, unlike a naive left
    join) + a count; Catalyst/AQE picks broadcast vs shuffled anti by
    parent size at runtime. NULL child keys count as orphans (they too
    vanish from downstream inner joins — that is the property being
    audited). orphan_rate = exact-long division, bit-identical on any
    engine.
    """
    parts = []
    for name, child, ck, parent, pk in edges:
        tot = child.agg(F.count(F.lit(1)).alias("n_child"))
        orph = child.join(
            parent.select(F.col(pk).alias("__pk")).where(F.col(pk).isNotNull()),
            child[ck] == F.col("__pk"),
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("n_orphans"))
        # two 1-row aggregates cross-joined: the whole report stays ONE
        # lazy plan (no per-edge driver actions)
        parts.append(
            tot.crossJoin(orph).select(
                F.lit(name).alias("edge"), "n_child", "n_orphans"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "edge",
        "n_child",
        "n_orphans",
        (F.col("n_orphans").cast("double") / F.col("n_child").cast("double")).alias(
            "orphan_rate"
        ),
    )


def referential_integrity_sql(
    edges: list[tuple[str, str, str, str, str]],
) -> str:
    """DuckDB twin: NOT EXISTS per edge (NULL child keys orphan, matching
    the anti-join's null semantics), UNION ALL'd."""
    sels = []
    for name, child, ck, parent, pk in edges:
        orphan = (
            f"SUM(CASE WHEN {ck} IS NULL OR NOT EXISTS "
            f"(SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck}) "
            f"THEN 1 ELSE 0 END)"
        )
        sels.append(
            f"SELECT '{name}' AS edge, COUNT(*) AS n_child, "
            f"CAST({orphan} AS BIGINT) AS n_orphans, "
            f"CAST({orphan} AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS orphan_rate "
            f"FROM {child} c"
        )
    return " UNION ALL ".join(sels)
