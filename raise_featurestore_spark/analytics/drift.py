"""Drift compiler: baseline-vs-current distribution divergence metrics.

(reference: raise_/analytics/analysis.py:417-470, metric list :445-451 —
psi / kl_divergence / js_divergence / wasserstein / ks_statistic + threshold;
also powers VersionDiff's drift output, analysis.py:199-246.)

Scale design — one scan, three tiny follow-ups:
1. Shared bucket bounds: min/max over rows matching EITHER filter (single
   aggregate over one scan; both sides must share bins or the divergences
   are meaningless).
2. Bucketing scan: each row → (bucket, in_baseline, in_current) and a hash
   ``groupBy(bucket)`` with two conditional counts → ≤ bins rows.
3. Probability vectors + divergence formulas as window/aggregate arithmetic
   over the ≤ bins-row relation. Zero buckets get ε = 1e-6 smoothing (the
   standard PSI practice) so log terms stay finite — identically on both
   engines.

Wasserstein-1 uses the histogram approximation Σ|cdfP − cdfQ|·width; the
KS statistic is max|cdfP − cdfQ| over bucket edges. Both are exact in the
bins → ∞ limit and deterministic at any bins, hence oracle-safe.

``drift_to_sql`` emits the identical plan in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from raise_featurestore_spark.analytics.analysis import Drift
from raise_featurestore_spark.functions.stable import grid_snap, grid_snap_sql
from raise_featurestore_spark.analytics.distribution import _bucket_col, _bucket_sql

DEFAULT_ROUND = 4
EPS = 1e-6


def compile_drift(df: DataFrame, spec: Drift, round_to: int | None = DEFAULT_ROUND) -> DataFrame:
    if not spec.baseline_filter or not spec.current_filter:
        raise ValueError("Drift requires baseline_filter and current_filter")
    x = F.col(spec.feature).cast("double")
    is_b = F.expr(spec.baseline_filter)
    is_c = F.expr(spec.current_filter)
    scoped = df.where(is_b | is_c).where(x.isNotNull())

    bounds = scoped.agg(F.min(x).alias("__mn"), F.max(x).alias("__mx"))
    bucketed = (
        scoped.crossJoin(F.broadcast(bounds))
        .withColumn("bucket", _bucket_col(x, F.col("__mn"), F.col("__mx"), spec.bins))
        .groupBy("bucket")
        .agg(
            F.sum(is_b.cast("long")).alias("nb"),
            F.sum(is_c.cast("long")).alias("nc"),
        )
    )
    # constant partition key: these windows run over the bucketed aggregate
    # (≤ spec.bins rows), so single-partition is the intended, bounded plan.
    tot = Window.partitionBy(F.lit(0))
    probs = bucketed.select(
        F.col("bucket"),
        F.greatest(F.col("nb") / F.sum("nb").over(tot), F.lit(EPS)).alias("p"),
        F.greatest(F.col("nc") / F.sum("nc").over(tot), F.lit(EPS)).alias("q"),
    )
    w = Window.partitionBy(F.lit(0)).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = probs.select(
        "p",
        "q",
        F.sum("p").over(w).alias("cp"),
        F.sum("q").over(w).alias("cq"),
    )
    p, q, cp, cq = F.col("p"), F.col("q"), F.col("cp"), F.col("cq")
    m = (p + q) / 2.0
    aggs = {
        "psi": F.sum((p - q) * F.log(p / q)),
        "kl_divergence": F.sum(p * F.log(p / q)),
        "js_divergence": F.sum(p / 2 * F.log(p / m) + q / 2 * F.log(q / m)),
        "wasserstein": F.sum(F.abs(cp - cq)),  # scaled by width below
        "ks_statistic": F.max(F.abs(cp - cq)),
    }
    out_aggs = [aggs[name].alias(f"__{name}") for name in spec.metrics]
    one = cum.agg(*out_aggs).crossJoin(F.broadcast(bounds))
    width = (F.col("__mx") - F.col("__mn")) / F.lit(float(spec.bins))
    cols = []
    for name in spec.metrics:
        c = F.col(f"__{name}")
        if name == "wasserstein":
            c = c * width
        if round_to is not None:
            c = grid_snap(c, round_to)
        cols.append(c.alias(name))
    if spec.threshold is not None and "psi" in spec.metrics:
        cols.append((F.col("__psi") > F.lit(spec.threshold)).alias("exceeds_threshold"))
    return one.select(*cols)


def drift_to_sql(spec: Drift, table: str, round_to: int | None = DEFAULT_ROUND) -> str:
    x = f"CAST({spec.feature} AS DOUBLE)"
    scope = (
        f"(({spec.baseline_filter}) OR ({spec.current_filter})) AND {spec.feature} IS NOT NULL"
    )
    bucket = _bucket_sql("__x", "__mn", "__mx", spec.bins)
    exprs = {
        "psi": "SUM((p - q) * LN(p / q))",
        "kl_divergence": "SUM(p * LN(p / q))",
        "js_divergence": "SUM(p / 2 * LN(p / ((p + q) / 2.0)) + q / 2 * LN(q / ((p + q) / 2.0)))",
        "wasserstein": "SUM(ABS(cp - cq))",
        "ks_statistic": "MAX(ABS(cp - cq))",
    }
    sel = []
    for name in spec.metrics:
        e = exprs[name]
        if name == "wasserstein":
            e = f"{e} * (MAX(__mx) - MAX(__mn)) / {float(spec.bins)}"
        if round_to is not None:
            e = grid_snap_sql(e, round_to)
        sel.append(f"{e} AS {name}")
    if spec.threshold is not None and "psi" in spec.metrics:
        sel.append(f"SUM((p - q) * LN(p / q)) > {spec.threshold} AS exceeds_threshold")
    return (
        f"WITH __s AS (SELECT {x} AS __x, ({spec.baseline_filter}) AS is_b, "
        f"({spec.current_filter}) AS is_c FROM {table} WHERE {scope}), "
        f"__bd AS (SELECT MIN(__x) AS __mn, MAX(__x) AS __mx FROM __s), "
        f"__bk AS (SELECT {bucket} AS bucket, "
        f"SUM(CASE WHEN is_b THEN 1 ELSE 0 END) AS nb, "
        f"SUM(CASE WHEN is_c THEN 1 ELSE 0 END) AS nc "
        f"FROM __s CROSS JOIN __bd GROUP BY 1), "
        f"__p AS (SELECT bucket, GREATEST(CAST(nb AS DOUBLE) / SUM(nb) OVER (), {EPS}) AS p, "
        f"GREATEST(CAST(nc AS DOUBLE) / SUM(nc) OVER (), {EPS}) AS q FROM __bk), "
        f"__c AS (SELECT p, q, SUM(p) OVER (ORDER BY bucket) AS cp, "
        f"SUM(q) OVER (ORDER BY bucket) AS cq FROM __p) "
        f"SELECT {', '.join(sel)} FROM __c CROSS JOIN __bd"
    )
