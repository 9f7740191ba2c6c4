"""Temperature-based source mixing (alpha-sampling) for training corpora.

The standard recipe for balancing a multi-source / multilingual pre-training
mix: sample source ``s`` with probability proportional to ``n_s^alpha``
(alpha < 1 upsamples small sources relative to their natural share; alpha=1
is proportional, alpha=0 uniform across sources). Given a target corpus
size, each source gets an acceptance rate

    r_s = min(1, (n_s^alpha / sum_t n_t^alpha) * target_rows / n_s)

and rows are kept by DETERMINISTIC hash-thresholding (the shared h32
primitive, same as dataprep/sampling.py) — membership is reproducible
across runs, engines, retries, and cluster sizes, unlike seeded-RNG
``sample``.

Scale design: one grouped count (map-side combined), the per-source rate
table is tiny and broadcast back, and the keep-filter is pure map-side —
the corpus itself shuffles zero times. The 1-row normalizing constant uses
the audited crossJoin(broadcast(<1-row aggregate>)) pattern.

The reference has no mixing surface; engine addition per the task brief
(same family as dedup/packing/decontamination).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raise_featurestore_spark.dataprep import hashing as H
from raise_featurestore_spark.dataprep.sampling import BUCKETS, _bucket
from raise_featurestore_spark.functions.stable import grid_snap, grid_snap_sql


@dataclass
class MixSpec:
    alpha: float = 0.5
    target_rows: int = 1000
    id_col: str = "doc_id"
    source_col: str = "source"
    salt: str = "mix"


def source_rates(df: DataFrame, spec: MixSpec) -> DataFrame:
    """(source, n_docs, rate, keep_threshold) — the per-source acceptance
    table. ``keep_threshold`` is an integer bucket cutoff so the keep
    filter compares ints, and the rate is rounded before the cutoff is
    taken so both engines floor the same 6-decimal value."""
    s, a = spec.source_col, spec.alpha
    counts = df.groupBy(s).agg(F.count(F.lit(1)).alias("n_docs"))
    counts = counts.withColumn("__q", F.pow(F.col("n_docs").cast("double"), F.lit(a)))
    total = counts.agg(F.sum("__q").alias("__tq"))
    rate = F.least(
        F.lit(1.0),
        grid_snap(F.col("__q") / F.col("__tq") * F.lit(float(spec.target_rows)) / F.col("n_docs"), 6),
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("rate", rate)
        .withColumn("keep_threshold", F.floor(F.col("rate") * F.lit(BUCKETS)).cast("int"))
        .select(s, "n_docs", "rate", "keep_threshold")
    )


def temperature_mix(df: DataFrame, spec: MixSpec | None = None,
                    rates: DataFrame | None = None) -> DataFrame:
    """Rows of ``df`` kept by the alpha-sampling acceptance rates —
    deterministic per (id, salt), map-side after one small broadcast.
    Pass a precomputed ``rates`` frame (from :func:`source_rates`) to
    avoid re-running the grouped count when the caller already has one."""
    spec = spec or MixSpec()
    if rates is None:
        rates = source_rates(df, spec)
    rates = rates.select(spec.source_col, "keep_threshold")
    return (
        df.join(F.broadcast(rates), spec.source_col)
        .where(_bucket(F.col(spec.id_col), spec.salt) < F.col("keep_threshold"))
        .drop("keep_threshold")
    )


def mix_report(df: DataFrame, spec: MixSpec | None = None) -> DataFrame:
    """(source, n_docs, rate, n_kept) — the mixture designer's summary:
    natural size, acceptance rate, and the deterministic kept count. The
    rate table is computed ONCE and shared with the keep-filter (the
    grouped count is the only corpus-wide job here)."""
    spec = spec or MixSpec()
    s = spec.source_col
    rates = source_rates(df, spec)
    kept = (
        temperature_mix(df, spec, rates=rates)
        .groupBy(s)
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rates.join(kept, s, "left")
        .select(
            s,
            "n_docs",
            "rate",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


def mix_report_sql(table: str, spec: MixSpec | None = None) -> str:
    """DuckDB twin of :func:`mix_report` (same literals, same h32)."""
    spec = spec or MixSpec()
    s, idc, a = spec.source_col, spec.id_col, spec.alpha
    salted = f"'{spec.salt}' || CAST({idc} AS VARCHAR)"
    bucket = f"{H.h32_sql(salted)} % {BUCKETS}"
    return (
        f"WITH __c AS (SELECT {s}, COUNT(*) AS n_docs, "
        f"POWER(CAST(COUNT(*) AS DOUBLE), {a}) AS q FROM {table} GROUP BY {s}), "
        f"__r AS (SELECT {s}, n_docs, "
        f"LEAST(1.0, {grid_snap_sql(f'q / (SELECT SUM(q) FROM __c) * {float(spec.target_rows)} / n_docs', 6)}) "
        f"AS rate FROM __c), "
        f"__t AS (SELECT {s}, n_docs, rate, "
        f"CAST(FLOOR(rate * {BUCKETS}) AS INT) AS keep_threshold FROM __r), "
        f"__k AS (SELECT d.{s}, COUNT(*) AS n_kept FROM {table} d "
        f"JOIN __t ON d.{s} = __t.{s} WHERE {bucket} < __t.keep_threshold GROUP BY d.{s}) "
        f"SELECT __t.{s}, n_docs, rate, COALESCE(__k.n_kept, 0) AS n_kept "
        f"FROM __t LEFT JOIN __k ON __t.{s} = __k.{s}"
    )


def mixture_recipe(
    df: DataFrame,
    weights: dict[str, float],
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Explicit data-recipe solver: given target mixture ``weights`` (per
    source, any positive scale — normalized here) and a total token
    ``budget``, emit per-source sampling rates and expected token yield.

    This is the planning step a recipe designer runs before committing a
    mix (DoReMi/Pile-style fixed-weight recipes, vs. the alpha-sampling of
    :func:`temperature_mix`): ``rate_s = min(1, budget·w_s / tokens_s)``,
    and ``exhausted`` marks sources whose natural size cannot supply their
    target share (rate capped at 1) — the signal to re-weight or add data.

    Scale design: ONE grouped aggregate over the corpus (token counting is
    a map-side size(split) fold — no explode); everything after operates
    on the per-source table. Weights are normalized driver-side into
    literals, so both engines see identical doubles; the rate snaps to the
    5-significant-digit grid (`functions/stable`). ``expected_tokens`` is
    emitted as a snapped double, not a floored integer — an integer floor
    of a float product would cliff at exact-integer boundaries.

    Columns: (source, n_docs, tokens, target_frac, rate, expected_tokens,
    exhausted).
    """
    from raise_featurestore_spark.dataprep.text import ws_tokens
    from raise_featurestore_spark.functions.stable import sig_round

    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("mixture weights must sum to a positive value")
    fracs = {s: w / total_w for s, w in weights.items()}

    counts = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(ws_tokens(F.col(text_col)))).cast("long").alias("tokens"),
    )
    frac = F.lit(0.0)
    for s, fr in sorted(fracs.items()):
        frac = F.when(F.col(source_col) == s, F.lit(fr)).otherwise(frac)
    rate = sig_round(
        F.least(
            F.lit(1.0),
            F.lit(float(budget_tokens)) * F.col("target_frac") / F.col("tokens"),
        )
    )
    return (
        counts.withColumn("target_frac", frac)
        .withColumn("rate", rate)
        .withColumn("expected_tokens", sig_round(F.col("rate") * F.col("tokens")))
        .withColumn("exhausted", F.col("rate") >= F.lit(1.0))
        .select(
            source_col, "n_docs", "tokens", "target_frac", "rate",
            "expected_tokens", "exhausted",
        )
    )


def mixture_recipe_sql(
    table: str,
    weights: dict[str, float],
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`mixture_recipe` (same normalized literals)."""
    from raise_featurestore_spark.dataprep.text import ws_tokens_sql
    from raise_featurestore_spark.functions.stable import sig_round_sql

    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("mixture weights must sum to a positive value")
    fracs = {s: w / total_w for s, w in weights.items()}
    case = "CASE " + " ".join(
        f"WHEN {source_col} = '{s}' THEN {fr!r}" for s, fr in sorted(fracs.items())
    ) + " ELSE 0.0 END"
    toks = f"len({ws_tokens_sql(text_col)})"
    rate = sig_round_sql(
        f"LEAST(1.0, {float(budget_tokens)} * target_frac / tokens)"
    )
    return (
        f"WITH __c AS (SELECT {source_col}, COUNT(*) AS n_docs, "
        f"CAST(SUM({toks}) AS BIGINT) AS tokens, {case} AS target_frac "
        f"FROM {table} GROUP BY {source_col}), "
        f"__r AS (SELECT *, {rate} AS rate FROM __c) "
        f"SELECT {source_col}, n_docs, tokens, target_frac, rate, "
        f"{sig_round_sql('rate * tokens')} AS expected_tokens, "
        f"rate >= 1.0 AS exhausted FROM __r"
    )
