"""StatTest compiler: two-sample / k-sample tests from distributed moments.

(reference: raise_/analytics/analysis.py:250-306 — tests ttest / welch /
mannwhitney / chi2 / ks / anova, control vs treatment via ``segment_by``;
output fields raise_/PRD.md:1030-1037 and raise_/analytics/result.py:76-92.)

Scale design — every test reduces the data to a TINY relation with one
aggregate scan, then finishes with closed-form arithmetic:

- **ttest / welch**: one conditional-aggregate pass (n, mean, var per arm
  via ``agg(fn(when(seg=ctl, x)))``) → 1-row frame; t, df, Cohen's d are
  Column arithmetic on that row. No shuffle beyond the aggregate.
- **anova**: ``groupBy(segment)`` moments (k rows) → one more tiny agg for
  the F statistic (raw-moment SSB is fine: group means are O(values), not
  O(values²) like raw 4th moments would be).
- **chi2**: contingency ``groupBy(feature, segment).count()`` + broadcast
  joins of the (tiny) margin totals; uses the identity
  χ² = N·(Σ o²/(rowtot·coltot) − 1), which also handles absent (o=0) cells.
- **mannwhitney / ks**: need global value ordering — computed with rank /
  cumulative windows. Exact ranks are a deliberate single-sort cost;
  at 100 TB callers pre-sample (the reference caps these tests the same
  way). The windows run AFTER a groupBy(value) compression, so ties
  collapse first.
- **p-values** use the pure-Python special-function library
  (functions/special.py) via a scalar UDF on the FINAL 1-row frame —
  never in the per-row hot path. ``include_p=False`` yields the
  SQL-expressible subset for the DuckDB oracle; the registered rows-only
  variants expose p_value.

No continuity correction on the Mann-Whitney normal approximation
(documented; both engines — there is only one engine for p — agree).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from raise_featurestore_spark.functions.stable import grid_snap, grid_snap_sql
from pyspark.sql.types import DoubleType

from raise_featurestore_spark.analytics.analysis import StatTest

DEFAULT_ROUND = 4


def _quote(v) -> str:
    return "'" + str(v).replace("'", "''") + "'" if isinstance(v, str) else str(v)


def compile_stattest(
    df: DataFrame,
    spec: StatTest,
    round_to: int | None = DEFAULT_ROUND,
    include_p: bool = True,
) -> DataFrame:
    if spec.filter:
        df = df.where(F.expr(spec.filter))
    fn = {
        "ttest": _ttest,
        "welch": _ttest,
        "anova": _anova,
        "chi2": _chi2,
        "mannwhitney": _mannwhitney,
        "ks": _ks,
    }[spec.test]
    out = fn(df, spec, round_to)
    if include_p:
        out = _add_p(out, spec.test, round_to)
    return out


def stattest_to_sql(spec: StatTest, table: str, round_to: int | None = DEFAULT_ROUND) -> str:
    """DuckDB SQL for the statistic columns (everything except p_value).

    Unlike the Spark side, the SQL twins interpolate ``round_to`` into
    ``ROUND()`` — ``None`` (unrounded) would render invalid SQL, so it is
    rejected here rather than failing later in the oracle engine."""
    if round_to is None:
        raise ValueError("stattest_to_sql requires an integer round_to")
    fn = {
        "ttest": _ttest_sql,
        "welch": _ttest_sql,
        "anova": _anova_sql,
        "chi2": _chi2_sql,
        "mannwhitney": _mannwhitney_sql,
        "ks": _ks_sql,
    }[spec.test]
    return fn(spec, table, round_to)


def _rnd(c: Column, round_to: int | None) -> Column:
    # + 0.0 canonicalizes IEEE −0.0 after rounding (statistics are ±
    # continuous; mirrors the `ROUND(...) + 0.0` in every SQL twin)
    return grid_snap(c, round_to) + F.lit(0.0) if round_to is not None else c


# ---------------------------------------------------------------- t tests


def _two_arm_requirements(spec: StatTest) -> None:
    if spec.control is None or spec.treatment is None:
        raise ValueError(f"{spec.test} requires explicit control and treatment values")


def _ttest(df: DataFrame, spec: StatTest, round_to: int | None) -> DataFrame:
    _two_arm_requirements(spec)
    x = F.col(spec.feature).cast("double")
    seg = F.col(spec.segment_by)
    xc = F.when(seg == F.lit(spec.control), x)
    xt = F.when(seg == F.lit(spec.treatment), x)
    m = df.agg(
        F.count(xc).alias("n1"),
        F.avg(xc).alias("m1"),
        F.var_samp(xc).alias("v1"),
        F.count(xt).alias("n2"),
        F.avg(xt).alias("m2"),
        F.var_samp(xt).alias("v2"),
    )
    n1, m1, v1 = F.col("n1"), F.col("m1"), F.col("v1")
    n2, m2, v2 = F.col("n2"), F.col("m2"), F.col("v2")
    if spec.test == "ttest":
        sp2 = ((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2)
        se = F.sqrt(sp2 * (1.0 / n1 + 1.0 / n2))
        t = (m1 - m2) / se
        dof = (n1 + n2 - 2).cast("double")
        d = (m1 - m2) / F.sqrt(sp2)
    else:  # welch
        se2 = v1 / n1 + v2 / n2
        se = F.sqrt(se2)
        t = (m1 - m2) / se
        dof = (se2 * se2) / (
            (v1 / n1) * (v1 / n1) / (n1 - 1) + (v2 / n2) * (v2 / n2) / (n2 - 1)
        )
        d = (m1 - m2) / F.sqrt((v1 + v2) / 2.0)
    cols = [
        F.lit(spec.test).alias("test"),
        n1.alias("n_control"),
        n2.alias("n_treatment"),
        _rnd(m1, round_to).alias("mean_control"),
        _rnd(m2, round_to).alias("mean_treatment"),
        _rnd(t, round_to).alias("statistic"),
        _rnd(dof, round_to).alias("df"),
        _rnd(d, round_to).alias("effect_size"),
    ]
    if spec.confidence_interval:
        # CI of the mean difference: diff ± t_crit(level, df) · se.
        # t_crit comes from a scalar UDF over this FINAL 1-row frame —
        # driver-side math, never in the row path.
        from raise_featurestore_spark.functions import special as S

        level = float(spec.confidence_level)
        diff = m1 - m2

        @F.udf(DoubleType())
        def t_crit(dof_v):
            if dof_v is None:
                return None
            return S.t_ppf(0.5 + level / 2.0, float(dof_v))

        half = t_crit(dof) * se
        cols += [
            F.lit(level).alias("confidence_level"),
            _rnd(diff - half, round_to).alias("ci_lo"),
            _rnd(diff + half, round_to).alias("ci_hi"),
        ]
    return m.select(*cols)


def _ttest_sql(spec: StatTest, table: str, round_to: int | None) -> str:
    where = f" WHERE {spec.filter}" if spec.filter else ""
    x = f"CAST({spec.feature} AS DOUBLE)"
    c, t = _quote(spec.control), _quote(spec.treatment)
    xc = f"CASE WHEN {spec.segment_by} = {c} THEN {x} END"
    xt = f"CASE WHEN {spec.segment_by} = {t} THEN {x} END"
    inner = (
        f"SELECT COUNT({xc}) AS n1, AVG({xc}) AS m1, VAR_SAMP({xc}) AS v1, "
        f"COUNT({xt}) AS n2, AVG({xt}) AS m2, VAR_SAMP({xt}) AS v2 FROM {table}{where}"
    )
    if spec.test == "ttest":
        sp2 = "(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2))"
        tstat = f"(m1 - m2) / SQRT({sp2} * (1.0 / n1 + 1.0 / n2))"
        dof = "CAST(n1 + n2 - 2 AS DOUBLE)"
        eff = f"(m1 - m2) / SQRT({sp2})"
    else:
        se2 = "(v1 / n1 + v2 / n2)"
        tstat = f"(m1 - m2) / SQRT({se2})"
        dof = (
            f"({se2} * {se2}) / ((v1 / n1) * (v1 / n1) / (n1 - 1)"
            f" + (v2 / n2) * (v2 / n2) / (n2 - 1))"
        )
        eff = "(m1 - m2) / SQRT((v1 + v2) / 2.0)"
    return (
        f"SELECT '{spec.test}' AS test, n1 AS n_control, n2 AS n_treatment, "
        f"{grid_snap_sql('m1', round_to)} + 0.0 AS mean_control, {grid_snap_sql('m2', round_to)} + 0.0 AS mean_treatment, "
        f"{grid_snap_sql(tstat, round_to)} + 0.0 AS statistic, {grid_snap_sql(dof, round_to)} + 0.0 AS df, "
        f"{grid_snap_sql(eff, round_to)} + 0.0 AS effect_size FROM ({inner}) __m"
    )


# ---------------------------------------------------------------- anova


def _anova(df: DataFrame, spec: StatTest, round_to: int | None) -> DataFrame:
    x = F.col(spec.feature).cast("double")
    g = df.groupBy(spec.segment_by).agg(
        F.count(x).alias("__n"), F.avg(x).alias("__m"), F.var_samp(x).alias("__v")
    )
    n, m, v = F.col("__n"), F.col("__m"), F.col("__v")
    s = g.agg(
        F.sum(n).alias("N"),
        F.count(F.lit(1)).alias("k"),
        F.sum(n * m).alias("S1"),
        F.sum(n * m * m).alias("S2"),
        F.sum((n - 1) * v).alias("ssw"),
    )
    N, k, S1, S2, ssw = F.col("N"), F.col("k"), F.col("S1"), F.col("S2"), F.col("ssw")
    ssb = S2 - S1 * S1 / N
    fstat = (ssb / (k - 1)) / (ssw / (N - k))
    return s.select(
        F.lit("anova").alias("test"),
        N.alias("n_total"),
        k.alias("k_groups"),
        _rnd(fstat, round_to).alias("statistic"),
        (k - 1).cast("double").alias("df1"),
        (N - k).cast("double").alias("df2"),
        _rnd(ssb / (ssb + ssw), round_to).alias("effect_size"),
    )


def _anova_sql(spec: StatTest, table: str, round_to: int | None) -> str:
    where = f" WHERE {spec.filter}" if spec.filter else ""
    x = f"CAST({spec.feature} AS DOUBLE)"
    g = (
        f"SELECT COUNT({x}) AS __n, AVG({x}) AS __m, VAR_SAMP({x}) AS __v "
        f"FROM {table}{where} GROUP BY {spec.segment_by}"
    )
    s = (
        # CAST: DuckDB SUM(int) is HUGEINT; Spark's is bigint — align output types
        "SELECT CAST(SUM(__n) AS BIGINT) AS N, COUNT(*) AS k, SUM(__n * __m) AS S1, "
        "SUM(__n * __m * __m) AS S2, SUM((__n - 1) * __v) AS ssw FROM ({}) __g"
    ).format(g)
    ssb = "(S2 - S1 * S1 / N)"
    fstat = f"({ssb} / (k - 1)) / (ssw / (N - k))"
    return (
        f"SELECT 'anova' AS test, N AS n_total, k AS k_groups, "
        f"{grid_snap_sql(fstat, round_to)} + 0.0 AS statistic, "
        f"CAST(k - 1 AS DOUBLE) AS df1, CAST(N - k AS DOUBLE) AS df2, "
        f"{grid_snap_sql(f'{ssb} / ({ssb} + ssw)', round_to)} + 0.0 AS effect_size FROM ({s}) __s"
    )


# ---------------------------------------------------------------- chi2


def _chi2(df: DataFrame, spec: StatTest, round_to: int | None) -> DataFrame:
    ct = df.groupBy(spec.feature, spec.segment_by).agg(F.count(F.lit(1)).alias("o"))
    rt = df.groupBy(spec.feature).agg(F.count(F.lit(1)).alias("rt"))
    cl = df.groupBy(spec.segment_by).agg(F.count(F.lit(1)).alias("ct"))
    joined = ct.join(F.broadcast(rt), spec.feature).join(F.broadcast(cl), spec.segment_by)
    s = joined.agg(
        F.sum("o").alias("N"),
        F.sum(F.col("o") * F.col("o") / (F.col("rt") * F.col("ct"))).alias("q"),
        F.countDistinct(spec.feature).alias("r"),
        F.countDistinct(spec.segment_by).alias("c"),
    )
    N, q, r, c = F.col("N"), F.col("q"), F.col("r"), F.col("c")
    chi2 = N * (q - 1)
    dof = ((r - 1) * (c - 1)).cast("double")
    v = F.sqrt(chi2 / (N * F.least(r - 1, c - 1)))
    return s.select(
        F.lit("chi2").alias("test"),
        N.alias("n_total"),
        r.alias("r_levels"),
        c.alias("c_levels"),
        _rnd(chi2, round_to).alias("statistic"),
        dof.alias("df"),
        _rnd(v, round_to).alias("effect_size"),
    )


def _chi2_sql(spec: StatTest, table: str, round_to: int | None) -> str:
    where = f" WHERE {spec.filter}" if spec.filter else ""
    f_, s_ = spec.feature, spec.segment_by
    return (
        f"WITH __ct AS (SELECT {f_}, {s_}, COUNT(*) AS o FROM {table}{where} GROUP BY {f_}, {s_}), "
        f"__rt AS (SELECT {f_}, COUNT(*) AS rt FROM {table}{where} GROUP BY {f_}), "
        f"__cl AS (SELECT {s_}, COUNT(*) AS ct FROM {table}{where} GROUP BY {s_}), "
        f"__s AS (SELECT CAST(SUM(o) AS BIGINT) AS N, SUM(CAST(o AS DOUBLE) * o / (rt * ct)) AS q, "
        f"COUNT(DISTINCT __ct.{f_}) AS r, COUNT(DISTINCT __ct.{s_}) AS c "
        f"FROM __ct JOIN __rt USING ({f_}) JOIN __cl USING ({s_})) "
        f"SELECT 'chi2' AS test, N AS n_total, r AS r_levels, c AS c_levels, "
        f"{grid_snap_sql('N * (q - 1)', round_to)} + 0.0 AS statistic, "
        f"CAST((r - 1) * (c - 1) AS DOUBLE) AS df, "
        f"{grid_snap_sql('SQRT(N * (q - 1) / (N * LEAST(r - 1, c - 1)))', round_to)} + 0.0 AS effect_size "
        f"FROM __s"
    )


# ---------------------------------------------------------------- mann-whitney


def _two_arm_frame(df: DataFrame, spec: StatTest) -> DataFrame:
    _two_arm_requirements(spec)
    return df.where(
        F.col(spec.segment_by).isin([spec.control, spec.treatment])
    ).select(
        F.col(spec.feature).cast("double").alias("__x"),
        (F.col(spec.segment_by) == F.lit(spec.control)).alias("__is_c"),
    ).na.drop(subset=["__x"])


def _mannwhitney(df: DataFrame, spec: StatTest, round_to: int | None) -> DataFrame:
    from raise_featurestore_spark.functions.prefix import range_prefix_sums

    base = _two_arm_frame(df, spec)
    # collapse ties first (one row per distinct value), then a distributed
    # range-partitioned prefix sum — no unpartitioned cumulative window, so
    # this stays parallel even when the feature is continuous (distinct ≈ n)
    byval = base.groupBy("__x").agg(
        F.sum(F.col("__is_c").cast("long")).alias("tc"),
        F.count(F.lit(1)).alias("t"),
    )
    ranked = range_prefix_sums(byval, "__x", {"__cum": "t"}).withColumn(
        "__avg_rank", F.col("__cum") - (F.col("t") - 1) / 2.0
    )
    s = ranked.agg(
        F.sum(F.col("tc") * F.col("__avg_rank")).alias("R1"),
        F.sum("tc").alias("n1"),
        F.sum(F.col("t") - F.col("tc")).alias("n2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie3"),
    )
    R1, n1, n2, tie3 = F.col("R1"), F.col("n1"), F.col("n2"), F.col("tie3")
    n = n1 + n2
    u1 = R1 - n1 * (n1 + 1) / 2.0
    mu = n1 * n2 / 2.0
    sigma = F.sqrt(n1 * n2 / 12.0 * ((n + 1) - tie3 / (n * (n - 1))))
    z = (u1 - mu) / sigma
    return s.select(
        F.lit("mannwhitney").alias("test"),
        n1.alias("n_control"),
        n2.alias("n_treatment"),
        _rnd(u1, round_to).alias("statistic"),
        _rnd(z, round_to).alias("z"),
        _rnd(2.0 * u1 / (n1 * n2) - 1.0, round_to).alias("effect_size"),
    )


def _mannwhitney_sql(spec: StatTest, table: str, round_to: int | None) -> str:
    where = [f"{spec.segment_by} IN ({_quote(spec.control)}, {_quote(spec.treatment)})",
             f"{spec.feature} IS NOT NULL"]
    if spec.filter:
        where.append(f"({spec.filter})")
    base = (
        f"SELECT CAST({spec.feature} AS DOUBLE) AS __x, "
        f"{spec.segment_by} = {_quote(spec.control)} AS __is_c "
        f"FROM {table} WHERE {' AND '.join(where)}"
    )
    return (
        f"WITH __b AS ({base}), "
        "__v AS (SELECT __x, SUM(CASE WHEN __is_c THEN 1 ELSE 0 END) AS tc, COUNT(*) AS t "
        "FROM __b GROUP BY __x), "
        "__r AS (SELECT tc, t, SUM(t) OVER (ORDER BY __x) - (t - 1) / 2.0 AS __avg_rank FROM __v), "
        "__s AS (SELECT SUM(tc * __avg_rank) AS R1, CAST(SUM(tc) AS BIGINT) AS n1, "
        "CAST(SUM(t - tc) AS BIGINT) AS n2, "
        "SUM(CAST(t AS DOUBLE) * t * t - t) AS tie3 FROM __r) "
        "SELECT 'mannwhitney' AS test, n1 AS n_control, n2 AS n_treatment, "
        f"{grid_snap_sql('R1 - n1 * (n1 + 1) / 2.0', round_to)} + 0.0 AS statistic, "
        f"{grid_snap_sql('(R1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0) / SQRT(n1 * n2 / 12.0 * ((n1 + n2 + 1) - tie3 / ((n1 + n2) * (n1 + n2 - 1))))', round_to)} + 0.0 AS z, "
        f"{grid_snap_sql('2.0 * (R1 - n1 * (n1 + 1) / 2.0) / (n1 * n2) - 1.0', round_to)} + 0.0 AS effect_size "
        "FROM __s"
    )


# ---------------------------------------------------------------- ks


def _ks(df: DataFrame, spec: StatTest, round_to: int | None) -> DataFrame:
    from raise_featurestore_spark.functions.prefix import range_prefix_sums

    base = _two_arm_frame(df, spec)
    byval = base.groupBy("__x").agg(
        F.sum(F.col("__is_c").cast("long")).alias("c1"),
        F.sum((~F.col("__is_c")).cast("long")).alias("c2"),
    )
    # distributed ECDFs: range-partitioned prefix sums over distinct values
    # (no unpartitioned window); arm totals via a 1-row broadcast cross join
    # instead of SUM() OVER () on every row
    cum = range_prefix_sums(byval, "__x", {"cum1": "c1", "cum2": "c2"})
    tot = byval.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    s = (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.max(F.abs(F.col("cum1") / F.col("n1") - F.col("cum2") / F.col("n2"))).alias("D"),
            F.first("n1").alias("n1"),
            F.first("n2").alias("n2"),
        )
    )
    return s.select(
        F.lit("ks").alias("test"),
        F.col("n1").alias("n_control"),
        F.col("n2").alias("n_treatment"),
        _rnd(F.col("D"), round_to).alias("statistic"),
    )


def _ks_sql(spec: StatTest, table: str, round_to: int | None) -> str:
    where = [f"{spec.segment_by} IN ({_quote(spec.control)}, {_quote(spec.treatment)})",
             f"{spec.feature} IS NOT NULL"]
    if spec.filter:
        where.append(f"({spec.filter})")
    base = (
        f"SELECT CAST({spec.feature} AS DOUBLE) AS __x, "
        f"{spec.segment_by} = {_quote(spec.control)} AS __is_c "
        f"FROM {table} WHERE {' AND '.join(where)}"
    )
    return (
        f"WITH __b AS ({base}), "
        "__v AS (SELECT __x, SUM(CASE WHEN __is_c THEN 1 ELSE 0 END) AS c1, "
        "SUM(CASE WHEN __is_c THEN 0 ELSE 1 END) AS c2 FROM __b GROUP BY __x), "
        "__c AS (SELECT SUM(c1) OVER (ORDER BY __x) AS cum1, SUM(c2) OVER (ORDER BY __x) AS cum2, "
        "SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2 FROM __v) "
        "SELECT 'ks' AS test, CAST(MAX(n1) AS BIGINT) AS n_control, "
        "CAST(MAX(n2) AS BIGINT) AS n_treatment, "
        f"{grid_snap_sql('MAX(ABS(CAST(cum1 AS DOUBLE) / n1 - CAST(cum2 AS DOUBLE) / n2))', round_to)} "
        "AS statistic FROM __c"
    )


# ---------------------------------------------------------------- p-values


def _add_p(out: DataFrame, test: str, round_to: int | None) -> DataFrame:
    """Attach p_value via a scalar UDF over the FINAL 1-row frame."""
    from raise_featurestore_spark.functions import special as S

    if test in ("ttest", "welch"):

        @F.udf(DoubleType())
        def p(stat, dof):
            if stat is None or dof is None:
                return None
            return S.t_sf_two_sided(float(stat), float(dof))

        col = p(F.col("statistic"), F.col("df"))
    elif test == "anova":

        @F.udf(DoubleType())
        def p(stat, d1, d2):
            if stat is None:
                return None
            return S.f_sf(float(stat), float(d1), float(d2))

        col = p(F.col("statistic"), F.col("df1"), F.col("df2"))
    elif test == "chi2":

        @F.udf(DoubleType())
        def p(stat, dof):
            if stat is None:
                return None
            return S.chi2_sf(float(stat), float(dof))

        col = p(F.col("statistic"), F.col("df"))
    elif test == "mannwhitney":

        @F.udf(DoubleType())
        def p(z):
            if z is None:
                return None
            return 2.0 * S.norm_sf(abs(float(z)))

        col = p(F.col("z"))
    elif test == "ks":

        @F.udf(DoubleType())
        def p(d, n1, n2):
            if d is None:
                return None
            ne = float(n1) * float(n2) / (float(n1) + float(n2))
            return S.ks_sf(float(d), ne)

        col = p(F.col("statistic"), F.col("n_control"), F.col("n_treatment"))
    else:  # pragma: no cover
        raise ValueError(test)
    if round_to is not None:
        col = grid_snap(col, max(round_to, 6))
    return out.withColumn("p_value", col)
