"""raise_featurestore_spark — a PySpark-native analytics/feature-store engine.

A ground-up re-implementation of the query and data-processing capabilities
declared by the reference feature-store prototype (see SURVEY.md): typed
feature groups, an analytics suite (aggregation, distribution, correlation,
stat tests, drift, data quality), a derived-feature expression language,
declarative ETL transforms with incremental checkpoints, live (materialized)
tables, multimodal blob columns — plus the large-scale training-data
operators a 100 TB pipeline needs (dedup, similarity search, text analysis).

Everything is expressed Spark-first: DataFrame/SQL plans that Catalyst can
optimize (predicate pushdown, column pruning, broadcast joins, AQE), with
Pandas UDFs only where built-in operators genuinely can't express the
semantics.
"""

__version__ = "0.1.0"

from raise_featurestore_spark.session import get_spark  # noqa: F401
