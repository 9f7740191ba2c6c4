"""Deterministic dataset splitting and stratified sampling for training
pipelines.

(engine addition beyond the reference surface — SURVEY §2.2 lists only
random ``RecordLookup.sample``; a 100 TB training pipeline needs splits
that are (a) reproducible across runs, engines, and cluster sizes, and
(b) pure map-side. Both come from hash-thresholding the shared
cross-engine ``h32`` primitive (dataprep/hashing.py) instead of RNG:

    bucket(id) = h32(salt || id) mod 10_000

- ``hash_split`` assigns each row to a named split by cumulative-fraction
  ranges over the bucket — zero shuffle, stable membership even when the
  table grows (a row's split never changes because other rows appeared).
- ``stratified_sample`` keeps a per-stratum fraction by the same
  thresholding, so sampling is deterministic per row id — no seed drift
  between retries/executors, and joining a sample back to its source is
  exact.

Spark's built-in ``sample``/``sampleBy`` are seeded-RNG per partition:
resampling under AQE re-partitioning or task retries can change membership.
Hash-thresholding cannot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from raise_featurestore_spark.dataprep import hashing as H

BUCKETS = 10_000


def _bucket(id_col: Column, salt: str) -> Column:
    return H.h32(F.concat(F.lit(salt), id_col.cast("string"))) % F.lit(BUCKETS)


def sample_order_key(cols: list[str], seed: int = 42) -> Column:
    """Deterministic sampling key: h32 over the salted, '|'-joined column
    values. ``orderBy(key).limit(n)`` is a TakeOrdered heap selecting the
    SAME n rows under any partitioning — unlike ``rand(seed)``, whose values
    depend on partition layout. Column values must render identically as
    strings on every engine that shares the sample (ints/strings do;
    avoid doubles/timestamps in the key) and be NON-NULL: Spark's
    concat_ws skips nulls while SQL ``||`` propagates them."""
    return H.h32(
        F.concat_ws("|", F.lit(str(seed)), *[F.col(c).cast("string") for c in cols])
    )


def sample_order_key_sql(cols: list[str], seed: int = 42) -> str:
    """DuckDB twin of :func:`sample_order_key` (same literals)."""
    joined = " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
    return H.h32_sql(f"'{seed}' || '|' || {joined}")


def hash_split(
    df: DataFrame, id_col: str, splits: dict[str, float], salt: str = "split"
) -> DataFrame:
    """Append a ``split`` column assigning each row to a named split.

    ``splits`` maps name → fraction (must sum to ≤ 1; remainder rows get
    the last split). Assignment is ``h32(salt||id) mod 10k`` against
    cumulative ranges — map-side only, reproducible everywhere.
    """
    total = sum(splits.values())
    if not 0 < total <= 1.0 + 1e-9:
        raise ValueError(f"split fractions must sum to (0, 1], got {total}")
    b = _bucket(F.col(id_col), salt)
    expr: Column | None = None
    cum = 0.0
    names = list(splits)
    for name in names:
        cum += splits[name]
        cond = b < F.lit(int(round(cum * BUCKETS)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    out = expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", out)


def hash_split_sql(
    table: str, id_col: str, splits: dict[str, float], salt: str = "split"
) -> str:
    """DuckDB twin of :func:`hash_split` (same literals, same buckets)."""
    bucket = (
        f"{H.h32_sql(repr(salt) + ' || CAST(' + id_col + ' AS VARCHAR)')} % {BUCKETS}"
    )
    cases = []
    cum = 0.0
    names = list(splits)
    for name in names:
        cum += splits[name]
        cases.append(f"WHEN __b < {int(round(cum * BUCKETS))} THEN '{name}'")
    case = f"CASE {' '.join(cases)} ELSE '{names[-1]}' END"
    return (
        f"SELECT * EXCLUDE (__b), {case} AS split "
        f"FROM (SELECT *, {bucket} AS __b FROM {table}) __t"
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its hash bucket
    falls under its stratum's fraction threshold. Map-side filter — the
    scan's predicate, no shuffle, no RNG."""
    b = _bucket(F.col(id_col), salt)
    thresh = F.lit(int(round(default_fraction * BUCKETS)))
    for value, frac in fractions.items():
        thresh = F.when(
            F.col(strata_col) == value, F.lit(int(round(frac * BUCKETS)))
        ).otherwise(thresh)
    return df.where(b < thresh)


def stratified_sample_sql(
    table: str,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> str:
    bucket = (
        f"{H.h32_sql(repr(salt) + ' || CAST(' + id_col + ' AS VARCHAR)')} % {BUCKETS}"
    )
    whens = " ".join(
        f"WHEN {strata_col} = '{v}' THEN {int(round(f * BUCKETS))}"
        for v, f in fractions.items()
    )
    thresh = f"CASE {whens} ELSE {int(round(default_fraction * BUCKETS))} END"
    return f"SELECT * FROM {table} WHERE {bucket} < {thresh}"


def exact_k_per_stratum(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    k: int,
    salt: str = "exactk",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, deterministically:
    the k smallest md5(salt‖id) values within each stratum — the balanced
    per-class sample ("100 docs per source") that fraction-based
    ``stratified_sample`` can't express.

    Scale design: the naive plan is ``ROW_NUMBER() OVER (PARTITION BY
    stratum ORDER BY h)`` — one task per stratum, a straggler whenever one
    stratum dominates the corpus. Here the per-stratum rank comes from the
    grouped distributed prefix sum (functions/prefix.py): (stratum, h)
    range-shuffle, per-partition local counts, broadcast offset join — a
    hot stratum spans many partitions. The order key is the full 128-bit
    md5 hex string, so rank ties are impossible and the selection is
    bit-reproducible on any engine (hex compares identically everywhere).

    Output: the selected rows' (id, stratum) plus their ``rank`` in
    [1, k].
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from raise_featurestore_spark.functions.prefix import grouped_range_prefix_sums

    keyed = df.select(
        F.col(id_col),
        F.col(strata_col),
        F.md5(
            F.concat(F.lit(salt + "|"), F.col(id_col).cast("string")).cast("binary")
        ).alias("__h"),
        F.lit(1).cast("long").alias("__one"),
    )
    ranked = grouped_range_prefix_sums(
        keyed, [strata_col], "__h", {"rank": "__one"}, num_partitions
    )
    return ranked.where(F.col("rank") <= k).select(
        id_col, strata_col, F.col("rank").cast("long").alias("rank")
    )


def exact_k_per_stratum_sql(
    table: str, id_col: str, strata_col: str, k: int, salt: str = "exactk"
) -> str:
    """DuckDB twin of :func:`exact_k_per_stratum` (window form)."""
    h = f"md5('{salt}|' || CAST({id_col} AS VARCHAR))"
    return (
        f"SELECT {id_col}, {strata_col}, rank FROM ("
        f"SELECT {id_col}, {strata_col}, "
        f"CAST(ROW_NUMBER() OVER (PARTITION BY {strata_col} ORDER BY {h}) AS BIGINT) "
        f"AS rank FROM {table}) __r WHERE rank <= {k}"
    )
