"""RecordLookup compiler: project / filter / order / limit / sample.

(reference: raise_/analytics/analysis.py:309-362; point lookup semantics
raise_/models/feature_group.py:393-439)

Scale posture: ``order_by + limit`` compiles to Spark's
TakeOrderedAndProject (distributed top-k, no global sort); ``filter`` and the
projection push down into the parquet scan. ``sample`` selects by a salted
content-hash TakeOrdered (dataprep.sampling.sample_order_key): the same n
rows under any partitioning, reproducible in the SQL oracle.

Point lookup over an id list uses ``isin`` for small lists (compiles to an
IN-filter pushed to the scan) and a broadcast semi-join above the threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raise_featurestore_spark.analytics.analysis import RecordLookup

_ISIN_THRESHOLD = 1000


def compile_record_lookup(df: DataFrame, spec: RecordLookup, seed: int = 42) -> DataFrame:
    if spec.filter:
        df = df.where(F.expr(spec.filter))
    if spec.features:
        df = df.select(*spec.features)
    if spec.sample is not None:
        from raise_featurestore_spark.dataprep.sampling import sample_order_key

        # sample is a terminal selection: order_by/limit don't apply on top
        key_cols = spec.features or df.columns
        return df.orderBy(sample_order_key(key_cols, seed), *key_cols).limit(spec.sample)
    if spec.order_by:
        col = F.col(spec.order_by)
        df = df.orderBy(col.desc() if spec.descending else col.asc())
    if spec.limit is not None:
        df = df.limit(spec.limit)
    return df


def record_lookup_to_sql(spec: RecordLookup, table: str, seed: int = 42) -> str:
    cols = ", ".join(spec.features) if spec.features else "*"
    sql = f"SELECT {cols} FROM {table}"
    if spec.filter:
        sql += f" WHERE {spec.filter}"
    if spec.sample is not None:
        if not spec.features:
            raise ValueError("oracle SQL for sampled lookup needs explicit features")
        from raise_featurestore_spark.dataprep.sampling import sample_order_key_sql

        key = sample_order_key_sql(spec.features, seed)
        tiebreak = ", ".join(spec.features)
        sql += f" ORDER BY {key}, {tiebreak} LIMIT {spec.sample}"
        return sql
    if spec.order_by:
        sql += f" ORDER BY {spec.order_by} {'DESC' if spec.descending else 'ASC'}"
    if spec.limit is not None:
        sql += f" LIMIT {spec.limit}"
    return sql


def point_lookup(
    df: DataFrame, entity_key: str, entity_ids: list, features: list[str] | None = None
) -> DataFrame:
    """Batch entity point lookup (reference: feature_group.py:393-439).

    Small id lists become an IN predicate (pushed into the scan); large lists
    become a broadcast left-semi join so the probe stays a single scan.
    """
    if len(entity_ids) <= _ISIN_THRESHOLD:
        out = df.where(F.col(entity_key).isin(entity_ids))
    else:
        spark = df.sparkSession
        ids = spark.createDataFrame([(i,) for i in entity_ids], [entity_key])
        out = df.join(F.broadcast(ids), on=entity_key, how="left_semi")
    if features:
        out = out.select(entity_key, *[f for f in features if f != entity_key])
    return out
