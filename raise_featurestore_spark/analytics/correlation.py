"""Correlation compiler: N×N matrix in long form (feature_a, feature_b, corr).

(reference: raise_/analytics/analysis.py:152-195; numpy/scipy semantics
raise_/PRD.md:1016-1028)

Scale design:
- **pearson** is a single aggregate pass: all N(N-1)/2 pairwise ``corr(x,y)``
  expressions in one ``agg`` → one scan, partial+final hash aggregation, no
  shuffle of raw rows beyond the 1-row result. The long-form pivot runs on
  that 1-row frame (driver-cheap ``stack``).
- **spearman** = pearson over average ranks. Ranks are computed per feature
  from the distinct-value frame with a distributed range-partitioned prefix
  sum (``functions/prefix.py``) and joined back — exact, and no
  single-partition global-sort window even on continuous features.
  ``sample_size`` (reference analysis.py:176) remains available to bound
  cost further. Tie handling is the standard average-rank
  ``rank + (ties-1)/2``.
- **kendall** (tau-b) has no distributed closed form; THIS module runs it
  on a bounded sample via ``applyInPandas`` (Knight O(n log n) kernel) —
  the sample is the TakeOrdered prefix of a salted content hash, a uniform
  pseudo-random draw, so the estimate carries the U-statistic error bound
  below. For the EXACT full-data tau (no cap), use
  ``analytics/kendall_full.kendall_tau_full`` — a distributed 3-term
  inversion decomposition, bit-equal to this kernel.

Sampled-kendall error bound (vs the full-data population tau): tau-b over
a uniform random sample of size m is a two-sample U-statistic with kernel
bounded in [−1, 1], so Hoeffding's inequality for U-statistics gives
``P(|τ̂ − τ| ≥ t) ≤ 2·exp(−⌊m/2⌋·t²/2)`` and a distribution-free standard
error ``SE(τ̂) ≤ 2/√m`` — ±0.009 at the 50k cap, ±0.028 at m = 5 000.
(Heavy ties only shrink the effective variance.) tests/test_stats.py pins
a 4/√m band against a 200k-row population with known tau.

``correlation_to_sql`` emits the same pearson/spearman plan for DuckDB.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raise_featurestore_spark.analytics.analysis import Correlation
from raise_featurestore_spark.functions.stable import grid_snap, grid_snap_sql

DEFAULT_ROUND = 4
# one-time (per process) call-site notice that the spearman DEFAULT is the
# grid-snapped approximation since r10 (ADVICE r10: the semantics change
# was silent for existing spec callers)
_SPEARMAN_DEFAULT_NOTICED = False
# guard for the single-task kendall kernel; Knight's O(n log n) keeps even
# this cap at ~0.3 s (the old O(n²) kernel required 5k)
KENDALL_MAX_SAMPLE = 50_000


def _pair_alias(i: int, j: int) -> str:
    return f"__c_{i}_{j}"


def _prepare(df: DataFrame, spec: Correlation, seed: int) -> DataFrame:
    if spec.filter:
        df = df.where(F.expr(spec.filter))
    df = df.select(*spec.features).na.drop(subset=spec.features)
    if spec.sample_size:
        # count-bounded deterministic sample: order by a salted content
        # hash → TakeOrdered heap (no full sort), SAME rows on any
        # partitioning / cluster topology — unlike rand(seed), whose values
        # depend on partition layout.
        from raise_featurestore_spark.dataprep import hashing as H

        key = H.h32(
            F.concat_ws("|", F.lit(str(seed)), *[F.col(f).cast("string") for f in spec.features])
        )
        df = df.orderBy(key, *spec.features).limit(spec.sample_size)
    return df


def _rank_cols(df: DataFrame, features: list[str]) -> DataFrame:
    """Replace each feature with its average rank (spearman prep).

    Scale-safe: melt all features to long form (one scan), group to distinct
    (feature, value) with tie counts, then ONE grouped range-partitioned
    rank pass attaches every feature's per-row average rank — no
    ``rank() OVER (ORDER BY x)`` single-partition sort, and one range
    shuffle total instead of one per feature.

    Shape (r9): melt → ``grouped_range_avg_ranks`` (ONE range shuffle of
    the k·n melted rows, ranks attached in-row — no value-level join
    back) → ONE pivot aggregate keyed by a row id assigned at a single
    projection node BEFORE the melt (so every exploded row of one input
    row carries the same id). The previous per-feature join-back was k
    sequential data-scale shuffles — 26 s for the k=10 PRD matrix at
    sf0.1 vs ~8 s for this shape; the intermediate byval+equi-join
    variant still paid a 10 s row-scale join."""
    from raise_featurestore_spark.functions.prefix import grouped_range_avg_ranks

    n = len(features)
    df = df.withColumn("__rid", F.monotonically_increasing_id())
    stack_expr = ", ".join(f"'{ft}', CAST({ft} AS DOUBLE)" for ft in features)
    melted = df.selectExpr("__rid", f"stack({n}, {stack_expr}) AS (__ft, __val)")
    ranked = grouped_range_avg_ranks(melted, ["__ft"], "__val")
    # EXPLICIT repartition by row id before the pivot, for two reasons:
    # (1) partial aggregation buys nothing here — a row's k melted rows
    # are scattered across the (__ft, __val) range partitions, so the
    # "partial" pivot emits ≈ one k-wide row per input row; (2) AQE
    # coalesces the groupBy's own exchange to ONE partition (the pivot
    # shuffle is ~50 MB < the 64 MB advisory) and then runs the
    # CPU-heavy pivot + downstream corr partials in a single task
    # (measured: a 17 s straggler). A user repartition is never
    # coalesced, and the agg's clustering requirement is satisfied by
    # it, so the pivot runs wide with no extra exchange.
    nparts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    pivoted = (
        ranked.repartition(nparts, "__rid")
        .groupBy("__rid")
        .agg(
            *[
                F.max(F.when(F.col("__ft") == ft, F.col("__rk"))).alias(ft)
                for ft in features
            ]
        )
    )
    return pivoted.select(*features)


def _feature_bounds(df: DataFrame, feats: list[str]) -> DataFrame:
    """1-row min/max per feature — the engine's two-pass bounds pattern
    (histograms/drift/outliers), here as the ANSI degenerate-pair guard."""
    return df.agg(
        *[F.min(F.col(f).cast("double")).alias(f"__mn_{i}") for i, f in enumerate(feats)],
        *[F.max(F.col(f).cast("double")).alias(f"__mx_{i}") for i, f in enumerate(feats)],
    )


def _null_constant_features(
    df: DataFrame, feats: list[str], bounds: DataFrame
) -> DataFrame:
    """NULL out features that are CONSTANT on the (listwise-cleaned)
    frame before the corr aggregate. Spark 4 runs ANSI mode by default
    and ``Corr.evaluateExpression`` divides by the variance — a constant
    feature (one distinct value after a slice filter; also n = 1) is a
    hard DIVIDE_BY_ZERO job failure instead of the NULL every other
    engine (and this engine's own DuckDB twins) produce. Feeding the
    aggregate an all-NULL column makes its pair count n = 0, which Corr
    short-circuits to NULL with no division — so degeneracy degrades to
    the oracle's NULL while HEALTHY features stream the exact same
    doubles through the exact same F.corr (the hash-parity-preserving
    property a regr_sxy/sxx/syy reimplementation measurably lacks: ulp
    drift in the separate co-moment buffers). min == max detects zero
    variance exactly on NaN-dropped input (IEEE: -0.0 == 0.0, matching
    variance 0). Constancy is invariant under ranking, so the exact
    spearman path computes bounds on the RAW features and applies the
    guard to the ranked frame. Cost: one extra column-pruned min/max
    scan + a 1-row broadcast (the allowlisted bounds-BNLJ shape)."""
    guarded = df.crossJoin(F.broadcast(bounds))
    return guarded.select(
        *[
            F.when(
                F.col(f"__mn_{i}").isNull()
                | (F.col(f"__mn_{i}") == F.col(f"__mx_{i}")),
                F.lit(None).cast("double"),
            )
            .otherwise(F.col(f).cast("double"))
            .alias(f)
            for i, f in enumerate(feats)
        ]
    )


def compile_correlation(
    df: DataFrame, spec: Correlation, round_to: int | None = DEFAULT_ROUND, seed: int = 42
) -> DataFrame:
    """Compile a :class:`Correlation` spec to its matrix DataFrame.

    NOT always lazy (r10 ADVICE): the default spearman route
    (``method='spearman'``, ``exact=False``) is the grid-snapped
    approximation, whose plan embeds driver-collected rank maps —
    building it runs two data-scale Spark jobs at COMPILE time (cell
    counts + rank-map collect, :func:`spearman_matrix_approx`). Plan-only
    / dry-run callers that must not touch data should pass
    ``exact=True`` or inspect the spec without compiling. The routing
    change from exact row-rank spearman to the grid default (r10) is
    announced once per process via logging so existing spec callers can
    discover it at call sites.
    """
    df = _prepare(df, spec, seed)
    feats = spec.features

    if spec.method == "kendall":
        if spec.exact:
            # full-population tau-b matrix, no sample cap: the distributed
            # 3-term inversion decomposition, every pair over ONE range
            # exchange (analytics/kendall_full.py). Diagonal rows appended
            # to match this compiler's (feature_a, feature_b, corr) shape.
            from raise_featurestore_spark.analytics.kendall_full import (
                kendall_tau_matrix,
            )

            m = kendall_tau_matrix(df, feats, round_to=round_to).select(
                "feature_a", "feature_b", "corr"
            )
            diag = df.sparkSession.createDataFrame(
                [(f, f, 1.0) for f in feats],
                "feature_a string, feature_b string, corr double",
            )
            return diag.unionByName(m)
        return _kendall(df, feats, round_to)

    if spec.method == "spearman":
        if not spec.exact:
            # default = the grid-snapped matrix (the 100 TB path): rank
            # maps are GRID-bounded and broadcast, zero row-scale shuffles
            # — same posture as the approx twins being the aggregation
            # default (HLL/GK) with exactness an opt-in. exact=True keeps
            # the row-level average-rank kernel (near-ties half a grid
            # step apart stay distinct ranks). Routing mirrors kendall's
            # exact flag above. Brings the PRD 10-feature matrix target
            # (< 10 s, raise_/PRD.md:2754) inside warm at sf0.1.
            global _SPEARMAN_DEFAULT_NOTICED
            if not _SPEARMAN_DEFAULT_NOTICED:
                _SPEARMAN_DEFAULT_NOTICED = True
                import logging

                logging.getLogger(__name__).info(
                    "Correlation(method='spearman') defaults to the "
                    "grid-snapped approximation since r10 (near-ties "
                    "within half a sig-grid step become exact ties; "
                    "plan compilation is eager). Pass exact=True for "
                    "the previous exact row-rank semantics."
                )
            return spearman_matrix_approx(df, feats, round_to=round_to)
        bounds = _feature_bounds(df, feats)
        df = _rank_cols(df, feats)
        df = _null_constant_features(df, feats, bounds)
    else:
        df = _null_constant_features(df, feats, _feature_bounds(df, feats))

    pairs = list(combinations(range(len(feats)), 2))
    aggs = [
        F.corr(F.col(feats[i]).cast("double"), F.col(feats[j]).cast("double")).alias(
            _pair_alias(i, j)
        )
        for i, j in pairs
    ]
    one_row = df.agg(*aggs)

    # long-form pivot over the 1-row aggregate (diagonal = 1.0 by definition)
    stack_items = [f"'{ft}', '{ft}', CAST(1.0 AS DOUBLE)" for ft in feats] + [
        f"'{feats[i]}', '{feats[j]}', {_pair_alias(i, j)}" for i, j in pairs
    ]
    n = len(stack_items)
    out = one_row.selectExpr(
        f"stack({n}, {', '.join(stack_items)}) AS (feature_a, feature_b, corr)"
    )
    if round_to is not None:
        # + 0.0 canonicalizes IEEE −0.0 after rounding (a correlation in
        # (−5e-5, 0) would otherwise hash as "-0" on one engine only)
        out = out.withColumn("corr", grid_snap(F.col("corr"), round_to) + F.lit(0.0))
    return out


def kendall_to_sql(
    spec: Correlation, table: str, round_to: int | None = DEFAULT_ROUND, seed: int = 42
) -> str:
    """DuckDB oracle for SAMPLED kendall tau-b.

    Kendall has no distributed closed form, but the sampled variant is
    fully deterministic (the sample is the TakeOrdered prefix of a salted
    content hash — same rows on any engine), and at sample_size ≤ a few
    thousand the oracle can afford the direct O(n²) definition: C − D =
    Σ sign((xᵢ−xⱼ)(yᵢ−yⱼ)) over i<j, tie terms counted pairwise, τ_b =
    (C−D)/√((n0−n1)(n0−n2)). All terms are exact integers < 2⁵³, so the
    final division is bit-identical to the Knight O(n log n) kernel's.
    Caveat shared with every sampled oracle: hash-key strings must render
    identically cross-engine (plain-decimal doubles only)."""
    if spec.method != "kendall" or len(spec.features) != 2 or not spec.sample_size:
        raise ValueError("kendall oracle needs method='kendall', 2 features, sample_size")
    from raise_featurestore_spark.dataprep import hashing as H

    f1, f2 = spec.features
    where = f"({spec.filter}) AND " if spec.filter else ""
    key = H.h32_sql(
        f"'{seed}' || '|' || CAST({f1} AS VARCHAR) || '|' || CAST({f2} AS VARCHAR)"
    )
    tau = (
        "CAST(s AS DOUBLE) / SQRT(CAST((n0 - n1) * (n0 - n2) AS DOUBLE))"
    )
    if round_to is not None:
        tau = f"{grid_snap_sql(tau, round_to)} + 0.0"
    return (
        f"WITH __s AS (SELECT {f1}, {f2} FROM {table} "
        f"WHERE {where}{f1} IS NOT NULL AND {f2} IS NOT NULL "
        f"ORDER BY {key}, {f1}, {f2} LIMIT {spec.sample_size}), "
        f"__i AS (SELECT ROW_NUMBER() OVER () AS rn, "
        f"CAST({f1} AS DOUBLE) AS x, CAST({f2} AS DOUBLE) AS y FROM __s), "
        f"__p AS (SELECT SUM(SIGN((a.x - b.x) * (a.y - b.y))) AS s, "
        f"SUM(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS n1, "
        f"SUM(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS n2, "
        f"COUNT(*) AS n0 FROM __i a JOIN __i b ON a.rn < b.rn) "
        f"SELECT '{f1}' AS feature_a, '{f1}' AS feature_b, 1.0 AS corr FROM (SELECT 1) __d "
        f"UNION ALL SELECT '{f2}', '{f2}', 1.0 FROM (SELECT 1) __d "
        f"UNION ALL SELECT '{f1}', '{f2}', {tau} FROM __p"
    )


def kendall_exact_to_sql(
    spec: Correlation, table: str, round_to: int | None = DEFAULT_ROUND
) -> str:
    """DuckDB oracle for the EXACT kendall matrix (spec.exact=True): the
    per-pair O(n²) definitions under the listwise filter, plus the
    diagonal — mirroring compile_correlation's exact branch."""
    if spec.method != "kendall" or not spec.exact:
        raise ValueError("kendall_exact_to_sql needs method='kendall', exact=True")
    from raise_featurestore_spark.analytics.kendall_full import (
        kendall_tau_matrix_sql,
    )

    diag = " UNION ALL ".join(
        f"SELECT '{f}' AS feature_a, '{f}' AS feature_b, CAST(1.0 AS DOUBLE) AS corr "
        f"FROM (SELECT 1) __d"
        for f in spec.features
    )
    m = kendall_tau_matrix_sql(table, spec.features, where=spec.filter,
                               round_to=round_to)
    return f"{diag} UNION ALL SELECT feature_a, feature_b, corr FROM ({m})"


def correlation_to_sql(
    spec: Correlation, table: str, round_to: int | None = DEFAULT_ROUND,
    seed: int = 42,
) -> str:
    """DuckDB SQL for pearson/spearman (sampled kendall: kendall_to_sql;
    exact kendall: kendall_exact_to_sql)."""
    if spec.method == "kendall":
        raise ValueError(
            "use kendall_to_sql (sampled) or kendall_exact_to_sql (exact)"
        )
    feats = spec.features
    where = f" WHERE {spec.filter}" if spec.filter else ""
    notnull = " AND ".join(f"{ft} IS NOT NULL" for ft in feats)
    where = f"{where} AND {notnull}" if where else f" WHERE {notnull}"

    base = f"SELECT {', '.join(feats)} FROM {table}{where}"
    if spec.sample_size:
        # mirror _prepare's deterministic sample (same salted-hash order
        # kendall_to_sql uses) — without it the oracle correlates the FULL
        # table against Spark's sampled rows
        from raise_featurestore_spark.dataprep import hashing as H

        key = H.h32_sql(
            f"'{seed}' || '|' || "
            + " || '|' || ".join(f"CAST({ft} AS VARCHAR)" for ft in feats)
        )
        base += f" ORDER BY {key}, {', '.join(feats)} LIMIT {spec.sample_size}"

    if spec.method == "spearman" and not spec.exact:
        # grid-snapped default — same routing as compile_correlation
        return spearman_matrix_approx_sql(
            f"({base}) __b", feats, round_to=round_to
        )
    if spec.method == "spearman":
        ranked = ", ".join(
            f"RANK() OVER (ORDER BY {ft}) + (COUNT(*) OVER (PARTITION BY {ft}) - 1) / 2.0 AS {ft}"
            for ft in feats
        )
        src = f"(SELECT {ranked} FROM ({base}) __s) __r"
    else:
        src = f"({base}) __r"

    pairs = list(combinations(range(len(feats)), 2))
    # ONE aggregate pass computes every pair, then per-pair single-column
    # selects unpivot the 1-row result. The previous per-pair
    # `SELECT corr(..) FROM src` UNION ALL chain made DuckDB re-evaluate
    # the (ranked) source subquery once per pair — 161 s for the
    # 10-feature spearman matrix at sf0.1, an unfair baseline number;
    # this shape is 45× fewer scans and matches the Spark plan's
    # one-aggregate structure. Values are unchanged (same corr calls over
    # the same rows; the unpivot is column selection).
    aggs = ", ".join(
        f"CORR(CAST({feats[i]} AS DOUBLE), CAST({feats[j]} AS DOUBLE)) AS {_pair_alias(i, j)}"
        for i, j in pairs
    )
    sels = [
        f"SELECT '{ft}' AS feature_a, '{ft}' AS feature_b, 1.0 AS corr FROM (SELECT 1) __d"
        for ft in feats
    ] + [
        f"SELECT '{feats[i]}', '{feats[j]}', "
        f"{grid_snap_sql(_pair_alias(i, j), round_to)} + 0.0 FROM __cm"
        for i, j in pairs
    ]
    return f"WITH __cm AS MATERIALIZED (SELECT {aggs} FROM {src}) " + " UNION ALL ".join(sels)


def _tau_b(x, y) -> float:
    """Kendall tau-b in O(n log n) (Knight's algorithm): sort by (x, y),
    count discordant pairs as y-inversions with a Fenwick tree over
    rank-compressed y, correct for x/y/joint ties. Replaces the earlier
    O(n²) sign-matrix kernel — at the 5k sample cap that was ~0.9 s and
    ~200 MB of intermediates per feature pair; this is ~10 ms and lets the
    cap rise without a quadratic cliff.
    """
    import numpy as np

    n = len(x)
    if n < 2:
        return float("nan")
    order = np.lexsort((y, x))
    xs, ys = x[order], y[order]

    def _tie_term(sorted_vals) -> float:
        _, counts = np.unique(sorted_vals, return_counts=True)
        return float(np.sum(counts * (counts - 1) // 2))

    n0 = n * (n - 1) / 2.0
    n1 = _tie_term(xs)  # x ties (xs already sorted)
    n2 = _tie_term(np.sort(ys))  # y ties
    # joint ties: runs where (x, y) both equal
    joint = np.flatnonzero(np.diff(xs) != 0) + 1
    n3 = 0.0
    for seg in np.split(ys, joint):
        if len(seg) > 1:
            n3 += _tie_term(seg)  # seg is sorted within equal-x runs (lexsort)

    # discordant pairs = inversions of ys across DIFFERENT x values; since
    # ties within an x-run are sorted ascending they contribute 0 inversions
    ranks = np.searchsorted(np.unique(ys), ys) + 1
    tree = np.zeros(len(np.unique(ys)) + 1, dtype=np.int64)

    def bit_add(i: int) -> None:
        while i < len(tree):
            tree[i] += 1
            i += i & (-i)

    def bit_sum(i: int) -> int:  # count of inserted ranks <= i
        s = 0
        while i > 0:
            s += tree[i]
            i -= i & (-i)
        return s

    dis = 0
    seen = 0
    for r in ranks:
        dis += seen - bit_sum(r)  # previously inserted with strictly larger y
        bit_add(r)
        seen += 1
    # subtract inversions *within* equal-x runs: zero by construction
    # (lexsort orders y ascending inside each run), so no correction needed

    num = n0 - n1 - n2 + n3 - 2.0 * dis
    denom = np.sqrt((n0 - n1) * (n0 - n2))
    return float(num / denom) if denom > 0 else float("nan")


def _kendall(df: DataFrame, feats: list[str], round_to: int | None) -> DataFrame:
    """Kendall tau-b on a bounded sample via applyInPandas (Knight kernel).

    Estimate quality: with a uniform random sample of size m (the salted-
    hash prefix `_prepare` takes), |τ̂ − τ_population| has SE ≤ 2/√m and
    Hoeffding tail 2·exp(−⌊m/2⌋t²/2) — see the module docstring."""
    import pandas as pd

    df = df.limit(KENDALL_MAX_SAMPLE)
    schema = "feature_a string, feature_b string, corr double"

    def tau_matrix(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for a in feats:
            rows.append((a, a, 1.0))
        for i, j in combinations(range(len(feats)), 2):
            x = pdf[feats[i]].to_numpy(dtype=float)
            y = pdf[feats[j]].to_numpy(dtype=float)
            tau = _tau_b(x, y)
            # + 0.0 canonicalizes −0.0, mirroring the SQL twin
            # same FLOOR(x*s + 0.5)/s form as grid_snap/grid_snap_sql —
            # Python round() is banker's rounding and would diverge from
            # the oracle twin on exact ties
            if round_to is not None and not (tau != tau):  # skip NaN
                s10 = float(10**round_to)
                import math

                r = math.floor(tau * s10 + 0.5) / s10 + 0.0
            else:
                r = tau
            rows.append((feats[i], feats[j], r))
        return pd.DataFrame(rows, columns=["feature_a", "feature_b", "corr"])

    return (
        df.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(lambda pdf: tau_matrix(pdf.drop(columns="__g")), schema)
    )


def _grid_rank_tables(
    snapped: DataFrame, features: list[str], with_raw_bounds: bool = False
) -> tuple[
    dict[str, tuple[np.ndarray, np.ndarray]], dict[str, tuple[float, float]]
]:
    """Collect the per-feature snapped-value → average-rank maps.

    The value→rank tables are GRID-bounded (≤ cells rows — ~12k total
    for 10 lineitem features), so collecting them to the driver is a
    bounded-metadata collect (the literal-centroid k-means pattern,
    dataprep/clustering.py). EAGER: runs one partial-count job at
    plan-build time (documented on the callers).

    Shape (r11): melt all k features to long form (a NARROW map-side
    ``stack``) straight into a (feature, cell) hash aggregate — the
    PARTIAL aggregate is grid-bounded per partition, so the shuffle
    moves partitions × grid-cells rows regardless of corpus size — then
    the average ranks are a driver-side cumsum over the ≤12k collected
    cells. The previous shape pushed the counted cells through a
    range-partitioned prefix-sum window (an extra cell-scale range
    exchange + window stage) and computed ranks distributedly — 5.5 s
    cold / 2.0 s warm at sf0.1 vs 2.8 s cold / 1.8 s warm for this
    all-JVM pass (a mapInPandas np.unique variant measured in between:
    Python-worker spin-up dominated its cold time).

    ``with_raw_bounds`` (r11-opt, the dual-matrix caller): the input
    frame additionally carries ``__raw_{i}`` columns (the un-snapped
    doubles, same index order as ``features``); the SAME cell aggregate
    also folds per-cell min/max of the raw value, so the pearson
    constant-guard bounds come out of this collect as plan-time
    literals — the separate ``_feature_bounds`` pass over the cached
    base and its 1-row broadcast crossJoin disappear from the main
    action. ``bounds[ft] = (raw_min, raw_max)``; IEEE min/max is exact,
    so the literal bounds equal the old aggregate's bit-for-bit.

    Always returns ``(tables, bounds)``; ``bounds`` is empty unless
    ``with_raw_bounds`` (r11 ADVICE: a flag-dependent return shape is
    easy to misuse from a new call site).

    NaN precondition (r11 ADVICE): the driver-side min/max fold and the
    callers' ``mn == mx`` constant guard use Python float semantics, in
    which ``NaN == NaN`` is False — sound ONLY because every caller
    listwise-drops NULL/NaN rows (``na.drop``) before building the
    snapped frame, so no ``__raw_*`` value is ever NaN. A new caller
    feeding NaN-bearing raws would classify an all-NaN feature as
    healthy instead of constant-NULL; keep the na.drop upstream.
    """
    k = len(features)
    # group key is the INT feature index, not the feature-name string
    # (r12-opt): the stack emits the key once per input row × k, so a
    # string key pays per-row string hashing/equality in the grid
    # aggregate's partial map for no information — the driver maps the
    # index back to the name after the collect. Counts/min/max are
    # key-agnostic: bit-identical tables.
    if with_raw_bounds:
        stack_expr = ", ".join(
            f"{i}, {ft}, __raw_{i}" for i, ft in enumerate(features)
        )
        cells = (
            snapped.selectExpr(
                f"stack({k}, {stack_expr}) AS (__fi, __val, __rawv)"
            )
            .groupBy("__fi", "__val")
            .agg(
                F.count(F.lit(1)).alias("__t"),
                F.min("__rawv").alias("__mn"),
                F.max("__rawv").alias("__mx"),
            )
            .collect()
        )
    else:
        stack_expr = ", ".join(f"{i}, {ft}" for i, ft in enumerate(features))
        cells = (
            snapped.selectExpr(f"stack({k}, {stack_expr}) AS (__fi, __val)")
            .groupBy("__fi", "__val")
            .agg(F.count(F.lit(1)).alias("__t"))
            .collect()
        )
    maps: dict[str, list[tuple[float, int]]] = {}
    bounds: dict[str, tuple[float, float]] = {}
    for r in cells:
        ft = features[r["__fi"]]
        maps.setdefault(ft, []).append((r["__val"], r["__t"]))
        if with_raw_bounds:
            mn, mx = bounds.get(ft, (r["__mn"], r["__mx"]))
            bounds[ft] = (min(mn, r["__mn"]), max(mx, r["__mx"]))
    tables: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for ft, v in maps.items():
        v.sort()
        vals = np.ascontiguousarray(np.array([x[0] for x in v], dtype=np.float64))
        t = np.array([x[1] for x in v], dtype=np.float64)
        # inclusive cumsum − (ties−1)/2 = the standard average rank (same
        # formula the range-prefix-sum shape computed distributedly)
        rk = np.cumsum(t) - (t - 1.0) / 2.0
        tables[ft] = (vals, np.ascontiguousarray(rk))
    return tables, bounds


def _grid_rank_lookup(tables: dict, ft: str):
    """Vectorized snapped-value → rank attachment for one feature: ONE
    Arrow pass of np.searchsorted lookups riding the task closure —
    measured 2× the k chained broadcast-hash-join variant (9-15 s vs
    19-28 s at sf0.1, whose per-join stage overheads dominated)."""
    from pyspark.sql.functions import pandas_udf

    # empty-input degrade: when the na-dropped relation had zero rows
    # at map-build time there is no entry for ft — emit NULL ranks so
    # the plan still builds and the (0-row) aggregate yields the same
    # diagonal-1.0 + NULL-pair frame the exact path produces on empty
    # input, instead of a plan-build KeyError.
    keys, vals = tables.get(
        ft, (np.empty(0, dtype=np.float64), np.empty(0, dtype=np.float64))
    )

    @pandas_udf("double")
    def look(s: pd.Series) -> pd.Series:
        x = s.to_numpy(dtype=np.float64)
        if keys.size == 0:
            return pd.Series(np.full(len(x), np.nan))
        # every input value exists in the map by construction (the
        # map was built from this same snapped relation) — verify,
        # so a stale/foreign map fails loudly instead of silently
        # attaching a neighbour's rank.
        idx = np.minimum(np.searchsorted(keys, x), keys.size - 1)
        if not np.array_equal(keys[idx], x):
            raise RuntimeError(
                f"spearman grid rank map miss for feature {ft!r}: input "
                "contains snapped values absent from the collected map"
            )
        return pd.Series(vals[idx])

    return look


def _rawmoment_corr_cells(
    frame: DataFrame, names: list[str], cells: list[tuple[int, int, str]]
) -> DataFrame:
    """One-row frame of pairwise pearson cells over PRE-CENTERED columns,
    via raw-moment sums instead of one ``F.corr`` per cell.

    ``F.corr`` is a DeclarativeAggregate maintaining six Welford-style
    running means per cell — at 45+45 cells that is ~900 update ops per
    row and the aggregate dominated the wide-matrix queries (measured
    7.4–8.4 s warm for the 90-cell aggregate at sf0.1 vs 4.0–4.6 s for
    this shape, noop sink). This computes |cols| sums + |cols| sum-squares
    + |cells| cross-sums + one count in ONE codegen hash aggregate (~2
    multiply-adds per term) and finalizes each cell as
    ``(n·Sxy − Sx·Sy)/√((n·Sxx − Sx²)(n·Syy − Sy²))`` on the 1-row result.

    Numerical contract: callers MUST center each column (midpoint of the
    feature's bounds / rank range) — pearson is shift-invariant, and
    centering bounds the cancellation in ``n·Sxx − Sx²`` to the benign
    regime (measured max |Δ| vs F.corr: 5e-12 across all 90 lineitem
    cells, three orders below the round-4 emission grid's 5e-5 boundary
    sensitivity; the grid_snapped outputs are value-identical at every
    tested SF). Degenerate parity with Corr: all-NULL column → NULL
    sums → NULL cell; n ∈ {0, 1} → NULL via the explicit guard below;
    a CONSTANT live column divides by zero → ANSI error, exactly like
    Corr.evaluateExpression (the callers' constant-NULL guard prevents
    both, see _null_constant_features).
    """
    # SQL-string construction, NOT Column arithmetic: the ~220 aggregate
    # terms + ~90 finalization cells cost one py4j round-trip PER OPERATOR
    # when built from Column objects — measured +2.3 s of driver-side plan
    # construction per compile (the whole win of the faster aggregate,
    # spent before the job started). Strings parse JVM-side. r12-opt: ONE
    # selectExpr ships the whole aggregate in a single py4j hop (an
    # aggregate-only projection resolves to a global Aggregate, exactly
    # like .agg()) — the previous per-term F.expr construction was ~130
    # round-trips of per-call plan-build latency (VERDICT r11 item 6).
    used = sorted({i for i, _, _ in cells} | {j for _, j, _ in cells})
    raw = frame.selectExpr(
        "CAST(COUNT(1) AS DOUBLE) AS __n",
        *[f"SUM({names[i]}) AS __rs_{i}" for i in used],
        *[f"SUM({names[i]} * {names[i]}) AS __rq_{i}" for i in used],
        *[f"SUM({names[i]} * {names[j]}) AS __rx_{i}_{j}" for i, j, _ in cells],
    )

    def cell_sql(i: int, j: int) -> str:
        num = f"(__n * __rx_{i}_{j} - __rs_{i} * __rs_{j})"
        dx = f"(__n * __rq_{i} - __rs_{i} * __rs_{i})"
        dy = f"(__n * __rq_{j} - __rs_{j} * __rs_{j})"
        return f"CASE WHEN __n >= 2 THEN {num} / SQRT({dx} * {dy}) END"

    return raw.selectExpr(
        *[f"{cell_sql(i, j)} AS {alias}" for i, j, alias in cells]
    )


def correlation_matrix_dual(
    df: DataFrame,
    features: list[str],
    sig_digits: int = 3,
    round_to: int | None = DEFAULT_ROUND,
) -> DataFrame:
    """Pearson AND grid-snapped-spearman matrices from ONE shared scan —
    the fused form of the PRD wide-matrix query (raise_/PRD.md:2754,
    10-feature matrix < 10 s; matrix semantics analysis.py:152-195).

    Values are BIT-IDENTICAL to running ``compile_correlation`` twice
    (pearson + spearman-grid) and unioning: the pearson cells stream the
    same guarded doubles through the same ``F.corr``, and the spearman
    cells the same searchsorted grid ranks — only the PLAN is fused:

    - the listwise-cleaned 10-column double projection is computed once
      and ``persist()``-ed (populated by the eager rank-map job, so the
      main action never re-reads parquet);
    - the pearson constant-guard columns and the spearman rank-lookup
      columns are emitted by ONE map-side projection of that cache;
    - all 2·C(k,2) correlation cells run in ONE aggregate pass (a single
      partial+final hash aggregate instead of two), unpivoted by one
      ``stack`` into the long (method, feature_a, feature_b, corr) form.

    Separate-leg shape (the rejected alternative, kept by
    ``compile_correlation`` for single-method specs): 4 data-scale scans
    and 2 aggregate barriers — measured 6.8 s warm / 13.4 s cold at
    sf0.1 vs 5.4 s / 9.3 s for this fusion (isolated session, one
    warm-up query). EAGER like ``spearman_matrix_approx``: building the
    plan runs the rank-map job.
    """
    from raise_featurestore_spark.functions.stable import sig_round

    k = len(features)
    base = df.na.drop(subset=features).select(
        *[F.col(ft).cast("double").alias(ft) for ft in features],
        # snapped columns INSIDE the per-query cache (r12-opt): sig_round
        # is a per-value string-parse scale (functions/stable._exp10) and
        # was computed twice per row — once feeding the eager rank-map
        # aggregate, once feeding the action's rank lookups. Caching the
        # snapped value alongside the raw (2k doubles/row) computes it
        # once; both consumers read the identical cached bits.
        *[
            sig_round(F.col(ft).cast("double"), sig_digits).alias(f"__sn_{i}")
            for i, ft in enumerate(features)
        ],
    )
    # per-query cache: ≤ 2k doubles/row; both the eager rank-map job and
    # the main aggregate read it, so parquet is scanned exactly once.
    base = base.persist()
    snapped_cols = [F.col(f"__sn_{i}") for i in range(k)]
    # ONE eager collect builds BOTH the rank maps and the pearson bounds
    # (r11-opt): the raw doubles ride the same stack → grid-bounded cell
    # aggregate as extra min/max buffers, so the old `_feature_bounds`
    # pass over the cached base — a second full pass at action time,
    # plus a 1-row broadcast crossJoin in the plan — disappears. IEEE
    # min/max is exact, so the literal bounds (and the (mn+mx)/2
    # midpoints below) are bit-identical to the aggregate they replace.
    tables, bounds = _grid_rank_tables(
        base.select(
            *[c.alias(ft) for c, ft in zip(snapped_cols, features)],
            *[F.col(ft).alias(f"__raw_{i}") for i, ft in enumerate(features)],
        ),
        features,
        with_raw_bounds=True,
    )

    # pearson ANSI constant-feature guard (see _null_constant_features):
    # a CONSTANT feature (min == max on the listwise-cleaned frame, or an
    # empty frame) becomes an all-NULL column → its cells short-circuit
    # to NULL with no division. Healthy columns are CENTERED by the
    # bounds midpoint (plan-time literal; pearson is shift-invariant) —
    # the numerical precondition of the raw-moment aggregate below; rank
    # columns are centered by their rank-table midpoint the same way.
    def _p_col(i: int, ft: str):
        mnmx = bounds.get(ft)
        if mnmx is None or mnmx[0] == mnmx[1]:
            return F.lit(None).cast("double").alias(f"__p_{i}")
        return (F.col(ft) - F.lit((mnmx[0] + mnmx[1]) / 2.0)).alias(f"__p_{i}")

    mid_s = []
    for ft in features:
        rk = tables.get(ft, (np.empty(0), np.empty(0)))[1]
        mid_s.append(float((rk[0] + rk[-1]) / 2.0) if rk.size else 0.0)
    wide = base.select(
        *[_p_col(i, ft) for i, ft in enumerate(features)],
        *[
            (_grid_rank_lookup(tables, ft)(snapped_cols[i]) - F.lit(mid_s[i])).alias(
                f"__s_{i}"
            )
            for i, ft in enumerate(features)
        ],
    )
    pairs = list(combinations(range(k), 2))
    # spearman degenerate guard (shared with spearman_matrix_approx):
    # ≤ 1 grid cell ⇒ constant snapped feature ⇒ literal-NULL pairs.
    degen = {
        i
        for i, ft in enumerate(features)
        if tables.get(ft, (np.empty(0),))[0].size <= 1
    }
    live = [(i, j) for i, j in pairs if i not in degen and j not in degen]
    # ONE codegen sum aggregate for all 2·C(k,2) cells instead of one
    # Welford Corr per cell — see _rawmoment_corr_cells for the measured
    # 2× and the value-identity argument.
    names = [f"__p_{i}" for i in range(k)] + [f"__s_{i}" for i in range(k)]
    one_row = _rawmoment_corr_cells(
        wide,
        names,
        [(i, j, f"__pc_{i}_{j}") for i, j in pairs]
        + [(k + i, k + j, f"__sc_{i}_{j}") for i, j in live],
    )
    live_set = set(live)
    stack_items = (
        [f"'pearson', '{ft}', '{ft}', CAST(1.0 AS DOUBLE)" for ft in features]
        + [
            f"'pearson', '{features[i]}', '{features[j]}', __pc_{i}_{j}"
            for i, j in pairs
        ]
        + [f"'spearman', '{ft}', '{ft}', CAST(1.0 AS DOUBLE)" for ft in features]
        + [
            f"'spearman', '{features[i]}', '{features[j]}', "
            + (f"__sc_{i}_{j}" if (i, j) in live_set else "CAST(NULL AS DOUBLE)")
            for i, j in pairs
        ]
    )
    res = one_row.selectExpr(
        f"stack({len(stack_items)}, {', '.join(stack_items)}) "
        "AS (method, feature_a, feature_b, corr)"
    )
    if round_to is not None:
        res = res.withColumn("corr", grid_snap(F.col("corr"), round_to) + F.lit(0.0))
    return res


def spearman_matrix_approx(
    df: DataFrame,
    features: list[str],
    sig_digits: int = 3,
    round_to: int | None = DEFAULT_ROUND,
) -> DataFrame:
    """Spearman matrix on the significant-digit grid — the 100 TB path.

    Exact spearman must attach a per-row rank, which costs a row-scale
    range shuffle + a row-scale pivot (see :func:`_rank_cols`). Snapping
    every feature to the ``sig_digits`` grid first
    (``functions/stable.sig_round`` — the engine's deterministic emission
    grid) bounds each feature's distinct-value relation by the GRID, not
    the data (~900 mantissa cells per decade), so the value→rank maps
    BROADCAST and rank attachment is a map-side lookup: the whole matrix
    is one scan for the cell counts + one scan with k broadcast joins +
    one wide aggregate. Zero row-scale shuffles at any corpus size.

    This is an APPROXIMATION of spearman only in that near-ties within
    half a grid step become exact ties (rank correlation is invariant to
    the snap's monotonicity otherwise); the operator itself is fully
    deterministic, so the DuckDB oracle computes the SAME snapped
    definition and the gate hash-matches values — no error band needed.
    Same listwise NULL/NaN drop as the exact path.
    """
    from raise_featurestore_spark.functions.stable import sig_round

    k = len(features)
    snapped = df.na.drop(subset=features).select(
        *[sig_round(F.col(ft).cast("double"), sig_digits).alias(ft) for ft in features]
    )
    # per-query cache (k doubles/row, LRU-evictable): the eager rank-map
    # job materializes it, the rank-attach aggregate re-reads it — one
    # source scan total instead of two.
    snapped = snapped.persist()
    tables, _ = _grid_rank_tables(snapped, features)
    # ranks centered by their table midpoint (plan-time literals) — the
    # numerical precondition of the raw-moment cell aggregate; spearman
    # is invariant to the shift.
    mids = []
    for ft in features:
        rk = tables.get(ft, (np.empty(0), np.empty(0)))[1]
        mids.append(float((rk[0] + rk[-1]) / 2.0) if rk.size else 0.0)
    ranked = snapped.select(
        *[
            (_grid_rank_lookup(tables, ft)(F.col(ft)) - F.lit(mids[i])).alias(ft)
            for i, ft in enumerate(features)
        ]
    )
    pairs = list(combinations(range(k), 2))
    # ANSI degenerate guard, FREE on this path: a feature whose collected
    # rank map has ≤ 1 cell is constant on the snapped frame (zero rank
    # variance), and a zero-variance cell would DIVIDE_BY_ZERO under ANSI
    # (exactly as Spark 4's Corr does) — its pairs become literal NULLs
    # (the DuckDB twin's CORR answer) and never enter the aggregate.
    # Healthy pairs stream through the one-pass raw-moment aggregate
    # (see _rawmoment_corr_cells for the measured 2× vs per-cell F.corr
    # and the value-identity argument).
    degen = {ft for ft in features if tables.get(ft, (np.empty(0),))[0].size <= 1}
    live = [(i, j) for i, j in pairs if features[i] not in degen and features[j] not in degen]
    if live:
        one_row = _rawmoment_corr_cells(
            ranked, features, [(i, j, _pair_alias(i, j)) for i, j in live]
        )
    else:
        one_row = ranked.agg(F.lit(1).alias("__dummy"))
    live_set = set(live)
    stack_items = [f"'{ft}', '{ft}', CAST(1.0 AS DOUBLE)" for ft in features] + [
        f"'{features[i]}', '{features[j]}', "
        + (_pair_alias(i, j) if (i, j) in live_set else "CAST(NULL AS DOUBLE)")
        for i, j in pairs
    ]
    res = one_row.selectExpr(
        f"stack({len(stack_items)}, {', '.join(stack_items)}) "
        "AS (feature_a, feature_b, corr)"
    )
    if round_to is not None:
        res = res.withColumn("corr", grid_snap(F.col("corr"), round_to) + F.lit(0.0))
    return res


def spearman_matrix_approx_sql(
    table: str,
    features: list[str],
    sig_digits: int = 3,
    round_to: int | None = DEFAULT_ROUND,
) -> str:
    """DuckDB twin: the identical snapped-spearman definition (snap via
    the shared sig grid, average ranks over the snapped values, corr)."""
    from raise_featurestore_spark.functions.stable import sig_round_sql

    notnull = " AND ".join(
        f"{ft} IS NOT NULL AND NOT ISNAN(CAST({ft} AS DOUBLE))" for ft in features
    )
    snap = ", ".join(
        f"{sig_round_sql(f'CAST({ft} AS DOUBLE)', sig_digits)} AS {ft}"
        for ft in features
    )
    ranked = ", ".join(
        f"RANK() OVER (ORDER BY {ft}) + (COUNT(*) OVER (PARTITION BY {ft}) - 1) / 2.0 AS {ft}"
        for ft in features
    )
    src = (
        f"(SELECT {ranked} FROM (SELECT {snap} FROM {table} WHERE {notnull}) __s) __r"
    )
    pairs = list(combinations(range(len(features)), 2))
    # one aggregate pass for every pair (see correlation_to_sql's note:
    # the per-pair FROM-src chain re-evaluated the rank subquery 45×)
    aggs = ", ".join(
        f"corr({features[i]}, {features[j]}) AS {_pair_alias(i, j)}"
        for i, j in pairs
    )
    sels = [
        f"SELECT '{ft}' AS feature_a, '{ft}' AS feature_b, 1.0 AS corr FROM (SELECT 1) __d"
        for ft in features
    ]
    for i, j in pairs:
        c = _pair_alias(i, j)
        if round_to is not None:
            c = f"{grid_snap_sql(c, round_to)} + 0.0"
        sels.append(f"SELECT '{features[i]}', '{features[j]}', {c} FROM __cm")
    return f"WITH __cm AS MATERIALIZED (SELECT {aggs} FROM {src}) " + " UNION ALL ".join(sels)
