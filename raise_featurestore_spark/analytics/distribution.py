"""Distribution compiler: histogram / percentiles / cdf / moments.

(reference: raise_/analytics/analysis.py:96-147; WIDTH_BUCKET SQL semantics
raise_/PRD.md:997-1004)

Scale design:
- Histogram is the classic two-pass plan: a 1-row (or per-segment) min/max
  aggregate broadcast-joined back into the scan, then
  ``bucket = least(floor((x-min)/width)+1, bins)`` and a hash groupBy on
  (segment, bucket) — two scans, no sort, no collect; the grouped relation
  is ≤ segments × bins rows.
- cdf is a running sum over that tiny bucketed relation (window over ≤ bins
  rows — never over raw data).
- skewness/kurtosis use the two-pass central-moment form
  ``avg(pow(x - mean, k))`` rather than raw-moment algebra: with values
  ~1e5, E[x⁴] ≈ 1e20 and the raw-moment subtraction cancels catastrophically
  (and differently per engine); central moments keep both engines on the
  same well-conditioned formula.

``distribution_to_sql`` emits the same plan in ANSI SQL for the DuckDB
oracle (DuckDB 1.0 lacks width_bucket, so both sides spell out the floor
arithmetic — which also pins down identical edge semantics: x = max falls
in the last bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from raise_featurestore_spark.analytics.analysis import Distribution
from raise_featurestore_spark.functions.stable import grid_snap, grid_snap_sql

DEFAULT_ROUND = 4


def _bucket_col(x: Column, mn: Column, mx: Column, bins: int) -> Column:
    width = (mx - mn) / F.lit(float(bins))
    raw = F.floor((x - mn) / width) + 1
    return (
        F.when(mx == mn, F.lit(1))
        .when(raw > bins, F.lit(bins))  # x == max lands in the last bucket
        .when(raw < 1, F.lit(1))
        .otherwise(raw)
        .cast("int")
    )


def _bucket_sql(x: str, mn: str, mx: str, bins: int) -> str:
    width = f"(({mx}) - ({mn})) / {float(bins)}"
    raw = f"FLOOR((({x}) - ({mn})) / ({width})) + 1"
    return (
        f"CAST(CASE WHEN ({mx}) = ({mn}) THEN 1 "
        f"WHEN ({raw}) > {bins} THEN {bins} "
        f"WHEN ({raw}) < 1 THEN 1 ELSE ({raw}) END AS INT)"
    )


def compile_distribution(
    df: DataFrame, spec: Distribution, round_to: int | None = DEFAULT_ROUND, seed: int = 42
) -> DataFrame:
    if spec.filter:
        df = df.where(F.expr(spec.filter))
    if spec.sample_size:
        # deterministic under any partitioning (see dataprep.sampling)
        from raise_featurestore_spark.dataprep.sampling import sample_order_key

        cols = [spec.feature] + ([spec.segment_by] if spec.segment_by else [])
        df = df.orderBy(sample_order_key(cols, seed), *cols).limit(spec.sample_size)
    x = F.col(spec.feature).cast("double")
    seg = [spec.segment_by] if spec.segment_by else []

    if "histogram" in spec.metrics or "cdf" in spec.metrics or "density" in spec.metrics:
        return _histogram(df, spec, x, seg, round_to)
    if "percentiles" in spec.metrics or "quantiles" in spec.metrics:
        return _percentiles(df, spec, x, seg, round_to)
    return _moments(df, spec, x, seg, round_to)


def _histogram(df, spec, x, seg, round_to):
    bounds = df.groupBy(*seg).agg(
        F.min(x).alias("__mn"), F.max(x).alias("__mx")
    )
    joined = df.join(F.broadcast(bounds), on=seg) if seg else df.crossJoin(F.broadcast(bounds))
    bucketed = (
        joined.withColumn("bucket", _bucket_col(x, F.col("__mn"), F.col("__mx"), spec.bins))
        .groupBy(*seg, "bucket", "__mn", "__mx")
        .agg(F.count(F.lit(1)).alias("bucket_count"))
    )
    width = (F.col("__mx") - F.col("__mn")) / F.lit(float(spec.bins))
    out = bucketed.select(
        *seg,
        F.col("bucket"),
        grid_snap(F.col("__mn") + (F.col("bucket") - 1) * width, round_to).alias("bucket_lo"),
        grid_snap(F.col("__mn") + F.col("bucket") * width, round_to).alias("bucket_hi"),
        F.col("bucket_count"),
    )
    if "cdf" in spec.metrics or "density" in spec.metrics:
        # unsegmented: constant partition key — the window runs over the
        # bucketed aggregate (≤ spec.bins rows), so single-partition is the
        # intended, bounded plan.
        w = (
            Window.partitionBy(*seg).orderBy("bucket")
            if seg
            else Window.partitionBy(F.lit(0)).orderBy("bucket")
        )
        total = Window.partitionBy(*seg) if seg else Window.partitionBy(F.lit(0))
        out = out.withColumn(
            "cdf",
            # grid_snap, not engine ROUND: the cdf is an int/int ratio,
            # the class that lands on exact repr-ties (emission rules)
            grid_snap(
                F.sum("bucket_count").over(w) / F.sum("bucket_count").over(total), round_to
            ),
        )
    return out


def _percentiles(df, spec, x, seg, round_to):
    fracs = list(spec.percentiles)
    arr = F.array(*[F.lit(p) for p in fracs])
    # exact by default (oracle-checkable); approx = mergeable GK sketch,
    # bounded memory per segment — the 100 TB posture
    agg = (
        F.approx_percentile(x, arr, F.lit(spec.percentile_accuracy))
        if spec.approx_percentiles
        else F.percentile(x, arr)
    ).alias("__p")
    grouped = df.groupBy(*seg).agg(agg) if seg else df.agg(agg)
    cols = list(seg) + [
        grid_snap(F.element_at(F.col("__p"), i + 1), round_to).alias(_p_alias(p))
        for i, p in enumerate(fracs)
    ]
    return grouped.select(*cols)


def _moments(df, spec, x, seg, round_to):
    """skewness (g1) and kurtosis (excess g2) via two-pass central moments."""
    mean_df = df.groupBy(*seg).agg(F.avg(x).alias("__mean"), F.count(x).alias("__n"))
    joined = df.join(F.broadcast(mean_df), on=seg) if seg else df.crossJoin(F.broadcast(mean_df))
    d = x - F.col("__mean")
    moments = joined.groupBy(*seg).agg(
        F.first("__n").alias("n"),
        F.avg(d * d).alias("__m2"),
        F.avg(d * d * d).alias("__m3"),
        F.avg(d * d * d * d).alias("__m4"),
    )
    out_cols: list[Column] = [F.col(c) for c in seg] + [F.col("n")]
    if "skewness" in spec.metrics:
        out_cols.append(
            (grid_snap(F.col("__m3") / F.pow(F.col("__m2"), 1.5), round_to) + F.lit(0.0)).alias("skewness")
        )
    if "kurtosis" in spec.metrics:
        out_cols.append(
            (
                grid_snap(F.col("__m4") / (F.col("__m2") * F.col("__m2")) - 3.0, round_to)
                + F.lit(0.0)
            ).alias("kurtosis")
        )
    return moments.select(*out_cols)


def _p_alias(p: float) -> str:
    return "p" + str(p).replace("0.", "").ljust(2, "0") if p < 1 else "p100"


def distribution_to_sql(spec: Distribution, table: str, round_to: int | None = DEFAULT_ROUND) -> str:
    if round_to is None:  # ROUND(x, None) is invalid SQL — fail clearly here
        raise ValueError("distribution_to_sql requires an integer round_to")
    where = f" WHERE {spec.filter}" if spec.filter else ""
    x = f"CAST({spec.feature} AS DOUBLE)"
    xt = f"CAST(t.{spec.feature} AS DOUBLE)"
    seg = spec.segment_by
    seg_sel = f"{seg}, " if seg else ""

    if "histogram" in spec.metrics or "cdf" in spec.metrics or "density" in spec.metrics:
        grp = f" GROUP BY {seg}" if seg else ""
        join = f"JOIN __b ON t.{seg} = __b.{seg}" if seg else "CROSS JOIN __b"
        seg_t = f"t.{seg} AS {seg}, " if seg else ""
        seg_grp = f"t.{seg}, " if seg else ""
        bucket = _bucket_sql(xt, "__mn", "__mx", spec.bins)
        width = f"((__mx - __mn) / {float(spec.bins)})"
        part = f"PARTITION BY {seg} " if seg else ""
        cdf_col = (
            ", " + grid_snap_sql(
                f"SUM(bucket_count) OVER ({part}ORDER BY bucket) * 1.0 / "
                f"SUM(bucket_count) OVER ({part.strip() or 'PARTITION BY 1'})", round_to
            ) + " AS cdf"
            if "cdf" in spec.metrics or "density" in spec.metrics
            else ""
        )
        return (
            f"WITH __b AS (SELECT {seg_sel}MIN({x}) AS __mn, MAX({x}) AS __mx "
            f"FROM {table}{where}{grp}), "
            # pre-filter in a derived table: rewriting the filter string to
            # qualify columns corrupted literals containing the feature name
            f"__bk AS (SELECT {seg_t}{bucket} AS bucket, __mn, __mx, COUNT(*) AS bucket_count "
            f"FROM (SELECT * FROM {table}{where}) t {join} "
            f"GROUP BY {seg_grp}bucket, __mn, __mx) "
            f"SELECT {seg_sel}bucket, "
            f"{grid_snap_sql(f'__mn + (bucket - 1) * {width}', round_to)} AS bucket_lo, "
            f"{grid_snap_sql(f'__mn + bucket * {width}', round_to)} AS bucket_hi, "
            f"bucket_count{cdf_col} FROM __bk"
        )

    if "percentiles" in spec.metrics or "quantiles" in spec.metrics:
        cols = ", ".join(
            f"{grid_snap_sql(f'QUANTILE_CONT({x}, {p})', round_to)} AS {_p_alias(p)}"
            for p in spec.percentiles
        )
        grp = f" GROUP BY {seg}" if seg else ""
        return f"SELECT {seg_sel}{cols} FROM {table}{where}{grp}"

    # moments (two-pass central)
    grp = f" GROUP BY {seg}" if seg else ""
    join = f"JOIN __m ON t.{seg} = __m.{seg}" if seg else "CROSS JOIN __m"
    seg_t = f"t.{seg} AS {seg}, " if seg else ""
    seg_grp = f" GROUP BY t.{seg}" if seg else ""
    d = f"({xt} - __mean)"
    outs = [f"FIRST(__n) AS n", f"AVG({d}*{d}) AS __m2"]
    sel = ["n"]
    if "skewness" in spec.metrics:
        outs.append(f"AVG({d}*{d}*{d}) AS __m3")
        sel.append(f"{grid_snap_sql('__m3 / POWER(__m2, 1.5)', round_to)} + 0.0 AS skewness")
    if "kurtosis" in spec.metrics:
        outs.append(f"AVG({d}*{d}*{d}*{d}) AS __m4")
        sel.append(f"{grid_snap_sql('__m4 / (__m2 * __m2) - 3.0', round_to)} + 0.0 AS kurtosis")
    return (
        f"WITH __m AS (SELECT {seg_sel}AVG({x}) AS __mean, COUNT({x}) AS __n "
        f"FROM {table}{where}{grp}), "
        f"__mo AS (SELECT {seg_t}{', '.join(outs)} "
        f"FROM (SELECT * FROM {table}{where}) t {join}{seg_grp}) "
        f"SELECT {seg_sel}{', '.join(sel)} FROM __mo"
    )
