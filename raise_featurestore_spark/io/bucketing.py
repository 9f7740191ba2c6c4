"""Bucketed (clustered) feature-group storage for shuffle-free entity joins.

(SURVEY §4 / §7 hard-problem 7: at 100 TB, every cross-group derived
feature is an entity-key equi-join; if both groups are bucketed on the
entity key with the same bucket count, Catalyst plans a SortMergeJoin with
NO Exchange on either side — the join runs entirely map-side.)

Spark's bucketing rides the session catalog (``bucketBy`` requires
``saveAsTable``), which is exactly the warehouse posture a production
deployment has. ``write_bucketed`` + ``read_table`` keep the API shape of
io.writer for the clustered case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 64


def write_bucketed(
    df: DataFrame,
    table: str,
    key_columns: list[str],
    buckets: int = DEFAULT_BUCKETS,
    mode: str = "overwrite",
    sort: bool = True,
) -> None:
    """Persist as a bucketed catalog table clustered on ``key_columns``.

    ``sort=True`` additionally sorts within buckets, which lets the
    sort-merge join skip its sort as well (plan shows neither Exchange nor
    Sort on that side)."""
    if not key_columns:
        raise ValueError("bucketed write requires key_columns")
    writer = df.write.format("parquet").mode(mode).bucketBy(buckets, *key_columns)
    if sort:
        writer = writer.sortBy(*key_columns)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on ``on`` with equal bucket counts.

    The bucket metadata makes this shuffle-free; callers should verify with
    ``assert_no_shuffle`` in tests (and a plan audit in production) since a
    mismatched bucket count silently degrades to a shuffled join."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def exchange_count(df: DataFrame) -> int:
    """Number of SHUFFLE Exchange operators in the executed plan.

    ``BroadcastExchange`` also contains the substring "Exchange " but is
    not a shuffle — a colocated join must still be allowed to broadcast a
    small side, so broadcast exchanges are excluded from the count."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"(?<!Broadcast)Exchange ", plan))
