"""Feature engineering for training pipelines: time-decay (EWMA) features,
leave-one-out target encoding, quantile discretization, weighted sampling.

(engine addition beyond the reference surface — the reference's analytics
plane stops at aggregate REPORTS; a feature store feeding model training
also has to MATERIALIZE per-row features. These four are the classical
ones every tabular pipeline reaches for, each expressed as a pure
DataFrame plan.)

Scale design, per operator:

- ``decay_features`` is one entity-partitioned running window (two
  cumulative sums completed in a single WindowExec pass — no per-row
  Python, no self-join). The anchor timestamp is a broadcast 1-row
  aggregate. Entity count is assumed large (the partition key spreads);
  a single hot entity is bounded by its own event count and cannot be
  salted anyway — decay is sequential per entity by definition.
- ``target_encode_loo`` is one grouped aggregate over categories joined
  back to the rows. The join side is per-CATEGORY (bounded ≪ rows), so
  AQE broadcasts it; rows never shuffle.
- ``discretize_quantile`` computes cutpoints in ONE percentile aggregate
  (array form), broadcasts the 1-row result, and assigns bins with a
  map-side fold over the cutpoint array. ``approx=True`` swaps in the
  mergeable GK sketch — the 100 TB default (exact buffers every value).
- ``weighted_sample`` is the A-ES exponential-keys trick under the
  repo's deterministic md5 hash: key = ln(u)/w, u = hash-uniform in
  (0,1); top-k by key lowers to TakeOrderedAndProject (a bounded heap
  per partition + driver merge — no global sort, no RNG seed drift).

Cross-engine determinism: sums that feed emitted values use exact
decimal accumulation (``functions/stable.dec_sum``); every emitted
double is stable-rounded. ``exp``/``ln`` differ by ≤1 ulp between libm
implementations — orders of magnitude inside the emission grid.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from raise_featurestore_spark.dataprep import hashing as H
from raise_featurestore_spark.functions.stable import (
    dec_sum,
    dec_sum_sql,
    stable_round,
    stable_round_sql,
)

# ------------------------------------------------------------------ decay


def decay_features(
    df: DataFrame,
    value_col: str = "value",
    time_col: str = "ts",
    entity_col: str = "user_id",
    id_col: str = "event_id",
    half_life_days: float = 7.0,
    round_to: int = 4,
) -> DataFrame:
    """Per-entity exponentially-decayed running features at every event:

        decay_sum_i = Σ_{j ≤ i} x_j · 2^(−Δdays_ij / half_life)
        decay_avg_i = decay_sum_i / Σ_{j ≤ i} 2^(−Δdays_ij / half_life)

    The classical "recent behavior" feature (decayed spend, decayed click
    rate). A naive evaluation is O(n²) per entity; factoring the decay
    through a fixed anchor makes it two RUNNING sums in one window pass:

        u_j   = exp(−λ · age_j)        (age vs the global max timestamp)
        sum_i = cumsum(u_j · x_j) / u_i

    ``u_j ≤ 1`` for every row (ages are non-negative), so the cumsum
    never overflows; u underflows to 0 only when an entity's history
    spans > ~10⁵ half-lives — documented domain bound.

    Window order is (time, id) — totally ordered, so the sequential
    cumsum order is identical on every engine and partitioning.
    """
    lam = math.log(2.0) / float(half_life_days)
    anchor = df.agg(F.max(time_col).alias("__anchor"))
    # MICROSECOND, not SECOND: micros is the storage grain, so the diff is
    # an exact integer on both engines; at coarser units Spark truncates
    # the ELAPSED time while DuckDB counts BOUNDARY crossings — they
    # disagree on any timestamp with sub-unit components.
    age_days = (
        F.expr(f"timestampdiff(MICROSECOND, {time_col}, __anchor)").cast("double")
        / 86400.0e6
    )
    u = F.exp(F.lit(-lam) * age_days)
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(entity_col)
        .orderBy(time_col, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    x = F.col(value_col).cast("double")
    return (
        df.join(F.broadcast(anchor))
        .withColumn("__u", u)
        .select(
            entity_col,
            id_col,
            stable_round(
                F.sum(F.col("__u") * x).over(w) / F.col("__u"), decimals=round_to
            ).alias("decay_sum"),
            stable_round(
                # denominator counts only rows whose VALUE was observed —
                # summing u for NULL-value rows would deflate the average
                F.sum(F.col("__u") * x).over(w)
                / F.sum(F.when(x.isNotNull(), F.col("__u"))).over(w),
                decimals=round_to,
            ).alias("decay_avg"),
        )
    )


def decay_features_sql(
    table: str,
    value_col: str = "value",
    time_col: str = "ts",
    entity_col: str = "user_id",
    id_col: str = "event_id",
    half_life_days: float = 7.0,
    round_to: int = 4,
) -> str:
    """DuckDB twin of :func:`decay_features` (same factored form)."""
    lam = math.log(2.0) / float(half_life_days)
    age = (
        f"CAST(date_diff('microsecond', {time_col}, "
        f"(SELECT MAX({time_col}) FROM {table})) AS DOUBLE) / 86400.0e6"
    )
    u = f"EXP({-lam!r} * ({age}))"
    win = (
        f"OVER (PARTITION BY {entity_col} ORDER BY {time_col}, {id_col} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    dsum = f"SUM(__u * CAST({value_col} AS DOUBLE)) {win} / __u"
    davg = (
        f"SUM(__u * CAST({value_col} AS DOUBLE)) {win} "
        f"/ SUM(CASE WHEN {value_col} IS NOT NULL THEN __u END) {win}"
    )
    return (
        f"SELECT {entity_col}, {id_col}, "
        f"{stable_round_sql(dsum, decimals=round_to)} AS decay_sum, "
        f"{stable_round_sql(davg, decimals=round_to)} AS decay_avg "
        f"FROM (SELECT *, {u} AS __u FROM {table}) __d"
    )


# -------------------------------------------------- target encoding (LOO)


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    id_col: str,
    prior_weight: float = 10.0,
    round_to: int = 4,
) -> DataFrame:
    """Leave-one-out target encoding with additive smoothing:

        enc_i = (sum_c − y_i + m · prior) / (n_c − 1 + m)

    The standard high-cardinality categorical encoder; leave-one-out plus
    the smoothing prior (m = ``prior_weight``) is what keeps it from
    leaking the row's own label into its feature. A category seen once
    encodes exactly to the global prior.

    Plan: one grouped aggregate per category (+ one global 1-row prior),
    joined back to the rows — AQE broadcasts the per-category side. The
    category sums and the prior use exact decimal accumulation
    (`dec_sum`), so the emitted encodings are partition-order-free.
    """
    if prior_weight <= 0:
        raise ValueError("prior_weight must be > 0 (n_c=1 divides by it)")
    y = F.col(target_col).cast("double")
    stats = df.groupBy(cat_col).agg(
        dec_sum(y).alias("__sum_c"), F.count(target_col).alias("__n_c")
    )
    prior = df.agg(
        (dec_sum(y) / F.count(target_col)).alias("__prior")
    )
    m = F.lit(float(prior_weight))
    enc = (F.col("__sum_c") - y + m * F.col("__prior")) / (
        F.col("__n_c") - F.lit(1.0) + m
    )
    return (
        df.join(stats, cat_col)
        .join(F.broadcast(prior))
        .select(
            id_col,
            F.col(cat_col).alias("category"),
            stable_round(enc, decimals=round_to).alias("target_enc"),
        )
    )


def target_encode_loo_sql(
    table: str,
    cat_col: str,
    target_col: str,
    id_col: str,
    prior_weight: float = 10.0,
    round_to: int = 4,
) -> str:
    """DuckDB twin of :func:`target_encode_loo`."""
    y = f"CAST({target_col} AS DOUBLE)"
    m = repr(float(prior_weight))
    enc = f"(__sum_c - {y} + {m} * __prior) / (__n_c - 1.0 + {m})"
    return (
        f"WITH __s AS (SELECT {cat_col}, {dec_sum_sql(y)} AS __sum_c, "
        f"COUNT({target_col}) AS __n_c FROM {table} GROUP BY {cat_col}), "
        f"__p AS (SELECT {dec_sum_sql(y)} / COUNT({target_col}) AS __prior "
        f"FROM {table}) "
        f"SELECT {id_col}, __t.{cat_col} AS category, "
        f"{stable_round_sql(enc, decimals=round_to)} AS target_enc "
        f"FROM {table} __t JOIN __s USING ({cat_col}) CROSS JOIN __p"
    )


# ---------------------------------------------------- quantile discretize


def discretize_quantile(
    df: DataFrame,
    col: str,
    id_col: str,
    n_bins: int = 10,
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Equal-frequency binning: assign each row the 1-based quantile bin
    of ``col`` (bin b spans the (b−1)/n..b/n quantile range; ties at a
    cutpoint go UP, matching ``x >= cut``).

    Cutpoints come from ONE fused percentile-array aggregate (exact for
    oracle checkability; ``approx=True`` uses the mergeable GK sketch —
    the 100 TB posture, since exact buffers every value in one partial).
    The 1-row cutpoint array broadcasts; assignment is a map-side fold —
    n_bins is small, so the linear scan beats a binary search's branch
    misprediction anyway.
    """
    fracs = F.array(*[F.lit(i / n_bins) for i in range(1, n_bins)])
    d = F.col(col).cast("double")
    pcts = (
        F.approx_percentile(d, fracs, F.lit(accuracy))
        if approx
        else F.percentile(d, fracs)
    )
    cuts = df.agg(pcts.alias("__cuts"))
    bin_col = F.aggregate(
        F.col("__cuts"),
        F.lit(1),
        lambda acc, c: acc + F.when(d >= c, 1).otherwise(0),
    )
    return (
        df.join(F.broadcast(cuts))
        .where(d.isNotNull())
        .select(id_col, F.col(col).alias("value"), bin_col.alias("bin"))
    )


def discretize_quantile_sql(
    table: str, col: str, id_col: str, n_bins: int = 10
) -> str:
    """DuckDB twin of :func:`discretize_quantile` (exact cutpoints)."""
    d = f"CAST({col} AS DOUBLE)"
    fracs = ", ".join(repr(i / n_bins) for i in range(1, n_bins))
    return (
        f"WITH __c AS (SELECT QUANTILE_CONT({d}, [{fracs}]) AS __cuts FROM {table}) "
        f"SELECT {id_col}, {col} AS value, "
        f"1 + CAST(list_sum(list_transform(__cuts, "
        f"c -> CASE WHEN {d} >= c THEN 1 ELSE 0 END)) AS INT) AS bin "
        f"FROM {table} CROSS JOIN __c WHERE {d} IS NOT NULL"
    )


# ------------------------------------------------------- weighted sample


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    k: int = 100,
    seed: int = 97,
    round_to: int = 4,
) -> DataFrame:
    """Weighted sampling without replacement (A-ES / exponential keys):
    rank rows by ``ln(u)/w`` descending with hash-uniform u — the top-k
    under that key is a weighted sample without replacement (Efraimidis &
    Spirakis 2006, u^(1/w) form taken in log space).

    u derives from the repo's cross-engine md5 primitive, NOT an RNG:
    membership is a pure function of (id, seed), so retries, AQE
    re-splits, and engine choice cannot change the sample. Rows with
    non-positive or null weight are excluded (zero-weight rows must
    never be sampled; ln(u)/0 would poison the ordering).

    ``orderBy(key desc).limit(k)`` lowers to TakeOrderedAndProject — a
    size-k heap per partition merged on the driver, no global sort.
    """
    w = F.col(weight_col).cast("double")
    u = (H.h32(F.concat(F.lit(f"ws{seed}|"), F.col(id_col).cast("string"))) + 1.0) / (
        2.0**32 + 1.0
    )
    key = F.log(u) / w
    # NaN compares greater than 0 on BOTH engines and its key sorts first,
    # so `w > 0` alone lets a NaN-weight row occupy a sample slot every
    # time; +Inf yields key -0.0 (always sampled) — exclude both.
    finite_pos = (w > 0) & ~F.isnan(w) & (w < F.lit(float("inf")))
    return (
        df.where(finite_pos)
        .select(
            id_col,
            stable_round(w, decimals=round_to).alias("weight"),
            key.alias("__key"),
        )
        .orderBy(F.col("__key").desc(), id_col)
        .limit(k)
        .select(id_col, "weight")
    )


def weighted_sample_sql(
    table: str,
    weight_col: str,
    id_col: str,
    k: int = 100,
    seed: int = 97,
    round_to: int = 4,
) -> str:
    """DuckDB twin of :func:`weighted_sample`."""
    w = f"CAST({weight_col} AS DOUBLE)"
    hashed = H.h32_sql(f"'ws{seed}|' || CAST({id_col} AS VARCHAR)")
    u = f"({hashed} + 1.0) / {2.0**32 + 1.0!r}"
    return (
        f"SELECT {id_col}, {stable_round_sql(w, decimals=round_to)} AS weight "
        f"FROM {table} WHERE {w} > 0 AND NOT ISNAN({w}) AND NOT ISINF({w}) "
        f"ORDER BY LN({u}) / {w} DESC, {id_col} LIMIT {k}"
    )


# ------------------------------------------------------- standardization


def standardize(
    df: DataFrame,
    cols: list[str],
    id_col: str,
    method: str = "zscore",
    round_to: int = 4,
) -> DataFrame:
    """Per-column standardization for model inputs:

    - ``zscore``: (x − mean) / stddev
    - ``robust``: (x − median) / IQR   (Q3 − Q1; outlier-insensitive)

    The fit statistics are ONE fused aggregate (exact decimal moments for
    mean/std — partition-order-free; one percentile-array per column for
    the robust pair), broadcast as a 1-row frame; the transform is pure
    map-side arithmetic. At 100 TB this is the fit/transform split of a
    sklearn scaler with the fit cost of a single scan.

    A zero-spread column (stddev or IQR = 0) emits NULL rather than ±Inf
    — the caller must drop or impute constant features explicitly.
    """
    if method not in ("zscore", "robust"):
        raise ValueError(f"method must be zscore|robust, got {method!r}")
    from raise_featurestore_spark.functions.stable import (
        dec_poison,
        dec_scaled,
        poisoned,
        underflow_poison,
    )

    aggs = []
    derived = []
    for c in cols:
        d = F.col(c).cast("double")
        if method == "zscore":
            # NaN/Inf/out-of-domain rows poison the fit to NaN (loud) —
            # without this, n counts a NaN row the decimal term nulled and
            # every z-score silently shifts (r5 review finding). ONE set
            # of decimal partials per column; center/spread derive over
            # the 1-row fit frame (inlining re-evaluates the per-row
            # decimal chain ~5× — the r6 profiler finding)
            dec = dec_scaled(d)
            aggs += [
                F.count(d).cast("double").alias(f"__n_{c}"),
                (F.sum(dec).cast("double") / F.lit(1e4)).alias(f"__s1_{c}"),
                (F.sum(dec * dec).cast("double") / F.lit(1e8)).alias(f"__s2_{c}"),
                # dec-domain poison + the r7 underflow sentinel (a fit
                # over mostly-sub-grid data must scream, not center at 0)
                (dec_poison(d) + underflow_poison(d)).alias(f"__pp_{c}"),
            ]
            n, s1 = F.col(f"__n_{c}"), F.col(f"__s1_{c}")
            s2, pois = F.col(f"__s2_{c}"), F.col(f"__pp_{c}")
            derived.append(poisoned(s1 / n, pois).alias(f"__c_{c}"))
            derived.append(
                poisoned(
                    F.sqrt(
                        F.greatest((s2 - s1 * s1 / n) / (n - F.lit(1.0)), F.lit(0.0))
                    ),
                    pois,
                ).alias(f"__s_{c}")
            )
        else:
            pcts = F.percentile(d, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
            aggs.append(pcts.alias(f"__q_{c}"))
    fit = df.agg(*aggs)
    if derived:
        fit = fit.select(*derived)
    out = [F.col(id_col)]
    for c in cols:
        d = F.col(c).cast("double")
        if method == "zscore":
            center, spread = F.col(f"__c_{c}"), F.col(f"__s_{c}")
        else:
            q = F.col(f"__q_{c}")
            center = F.element_at(q, 2)
            spread = F.element_at(q, 3) - F.element_at(q, 1)
        scaled = F.when(spread > 0, (d - center) / spread)
        out.append(stable_round(scaled, decimals=round_to).alias(f"{c}_scaled"))
    return df.join(F.broadcast(fit)).select(*out)


def standardize_sql(
    table: str,
    cols: list[str],
    id_col: str,
    method: str = "zscore",
    round_to: int = 4,
) -> str:
    """DuckDB twin of :func:`standardize`."""
    if method not in ("zscore", "robust"):
        raise ValueError(f"method must be zscore|robust, got {method!r}")
    from raise_featurestore_spark.functions.stable import (
        dec_poison_sql,
        dec_scaled_sql,
        poisoned_sql,
        underflow_poison_sql,
    )

    fit_cols, sel = [], [id_col]
    for c in cols:
        d = f"CAST({c} AS DOUBLE)"
        dec = dec_scaled_sql(d)
        if method == "zscore":
            n = f"CAST(COUNT({d}) AS DOUBLE)"
            s1 = f"(CAST(SUM({dec}) AS DOUBLE) / CAST('1e4' AS DOUBLE))"
            s2 = f"(CAST(SUM(({dec}) * ({dec})) AS DOUBLE) / CAST('1e8' AS DOUBLE))"
            pois = f"({dec_poison_sql(d)} + {underflow_poison_sql(d)})"
            fit_cols.append(f"{poisoned_sql(f'{s1} / {n}', pois)} AS __c_{c}")
            fit_cols.append(
                poisoned_sql(
                    f"SQRT(GREATEST(({s2} - {s1} * {s1} / {n}) / ({n} - 1.0), 0.0))",
                    pois,
                )
                + f" AS __s_{c}"
            )
            center, spread = f"__c_{c}", f"__s_{c}"
        else:
            fit_cols.append(f"QUANTILE_CONT({d}, [0.25, 0.5, 0.75]) AS __q_{c}")
            center, spread = f"__q_{c}[2]", f"(__q_{c}[3] - __q_{c}[1])"
        scaled = f"CASE WHEN {spread} > 0 THEN ({d} - {center}) / {spread} END"
        sel.append(f"{stable_round_sql(scaled, decimals=round_to)} AS {c}_scaled")
    return (
        f"WITH __fit AS (SELECT {', '.join(fit_cols)} FROM {table}) "
        f"SELECT {', '.join(sel)} FROM {table} CROSS JOIN __fit"
    )


# ----------------------------------------------------- sequence features


def sequence_features(
    df: DataFrame,
    entity_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    item_col: str = "event_type",
    n: int = 5,
) -> DataFrame:
    """Per-event "user history" feature: the previous ``n`` item values of
    the same entity, oldest→newest, as one delimited string — the input a
    sequence model (transformer recsys, next-event prediction) trains on.

    One entity-partitioned window with a BOUNDED frame (rows −n..−1):
    state per row is O(n), so a hot entity costs O(events·n), never
    O(events²). The string form (not array) keeps the cross-engine hash
    canonical — engines render arrays differently.
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(entity_col)
        .orderBy(time_col, id_col)
        .rowsBetween(-n, -1)
    )
    hist = F.array_join(
        F.collect_list(F.col(item_col).cast("string")).over(w), "|"
    )
    return df.select(
        entity_col, id_col, hist.alias("history"), F.size(
            F.collect_list(F.col(item_col).cast("string")).over(w)
        ).alias("history_len"),
    )


def sequence_features_sql(
    table: str,
    entity_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    item_col: str = "event_type",
    n: int = 5,
) -> str:
    """DuckDB twin of :func:`sequence_features`.

    NOTE window-list semantics: DuckDB ``list(x) OVER``, like Spark's
    ``collect_list``, appends in frame order — both engines emit
    oldest→newest for a trailing rows frame.
    """
    win = (
        f"OVER (PARTITION BY {entity_col} ORDER BY {time_col}, {id_col} "
        f"ROWS BETWEEN {n} PRECEDING AND 1 PRECEDING)"
    )
    lst = f"list(CAST({item_col} AS VARCHAR)) {win}"
    return (
        f"SELECT {entity_col}, {id_col}, "
        f"COALESCE(array_to_string({lst}, '|'), '') AS history, "
        f"COALESCE(len({lst}), 0) AS history_len FROM {table}"
    )
