"""Skew-mitigation helpers: salted joins and two-stage aggregation.

(SURVEY §4 / the 100 TB posture: "skewed keys → salting or AQE skew-join".
AQE's skew-join splitting — on in session.py — handles most cases by
splitting oversized partitions at runtime, but it only applies to
sort-merge/shuffled-hash joins with splittable partitions and does nothing
for hot-key *aggregations* of non-algebraic functions or for storage-
partitioned inputs. These helpers are the explicit fallback.)

``salted_join``: replicate the small side SALT ways, scatter the big side's
hot keys across salts → the hot key's rows spread over SALT tasks instead
of one straggler. Correct for any equi-join where the salted (small) side
fits a SALT-fold replication (size × SALT must stay shuffle-reasonable).

``salted_count_distinct``: two-stage exact distinct for hot groups —
stage 1 dedupes (group, value) under a salt, stage 2 merges per group.
(Plain algebraic aggs — sum/count/min/max — do NOT need salting: Spark's
partial aggregation already combines map-side before the shuffle.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Equi-join with the big side scattered over ``salt`` sub-keys and the
    small side replicated ``salt`` times. Result is identical to
    ``big.join(small, on, how)`` for inner/left joins."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (replication breaks right/full)")
    keys = [on] if isinstance(on, str) else list(on)

    # big side: deterministic pseudo-random salt from the row's HASHABLE
    # columns — spreads a hot key's rows across `salt` partitions.
    # MapType columns are excluded, including maps NESTED inside
    # structs/arrays (Spark's hash() rejects any map anywhere in the type,
    # hence substring not prefix match); if no column is hashable the
    # per-partition row id still scatters rows (salt values never affect
    # the RESULT, only the distribution).
    # pmod, not abs(hash) % salt: hash can return Int.MinValue, whose abs
    # overflows negative and would silently drop rows for non-power-of-two salts
    hashable = [c for c, t in big.dtypes if "map" not in t]
    scatter = (
        F.hash(*[F.col(c) for c in hashable])
        if hashable
        else F.monotonically_increasing_id()
    )
    salt_col = "__sj_salt"
    if salt_col in big.columns or salt_col in small.columns:
        raise ValueError(f"column name {salt_col!r} is reserved by salted_join")
    big_s = big.withColumn(salt_col, F.pmod(scatter, F.lit(salt)))
    small_s = small.withColumn(
        salt_col, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_s.join(small_s, keys + [salt_col], how)
    return out.drop(salt_col)


def salted_count_distinct(
    df: DataFrame, group: str, value: str, salt: int = DEFAULT_SALT
) -> DataFrame:
    """Exact ``countDistinct(value)`` per ``group`` that survives a hot
    group: stage 1 dedupes (group, salt-bucket-of-value, value) with the
    dedup work spread across ``salt`` reducers per group, stage 2 sums the
    per-bucket distinct counts (buckets partition the value space, so the
    sum is exact)."""
    bucketed = df.select(
        F.col(group), F.col(value), F.pmod(F.hash(F.col(value)), F.lit(salt)).alias("__b")
    )
    stage1 = bucketed.groupBy(group, "__b").agg(
        F.countDistinct(value).alias("__d")
    )
    return stage1.groupBy(group).agg(F.sum("__d").cast("long").alias(f"distinct_{value}"))
