"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship aggregation on sf0.001;
``queries()[name](spark, sf_dir)`` is one Spark implementation per operator
from SURVEY.md §2; ``oracle_sql()[name]`` is the equivalent DuckDB SQL over
the pre-registered parquet views.

Where possible, the Spark plan and the oracle SQL are generated from the
SAME spec object (see raise_featurestore_spark.analytics.*_to_sql), so the
differential test cannot drift from the implementation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from raise_featurestore_spark.queries import QUERIES, ORACLES, flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
