"""Registry of oracle-checked queries: name → (Spark callable, DuckDB SQL).

Each entry exercises one operator from SURVEY.md §2. Spark plan and oracle
SQL are generated from the same spec object wherever the operator has a
spec→SQL generator, so the two sides cannot drift.

Grow this registry with ``register(name, fn, sql)`` from each operator
module; ``__spark_entry__`` re-exports it to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from raise_featurestore_spark.analytics.aggregation import (
    aggregation_to_sql,
    compile_aggregation,
)
from raise_featurestore_spark.analytics.analysis import Aggregation, RecordLookup
from raise_featurestore_spark.analytics.record_lookup import (
    compile_record_lookup,
    point_lookup,
    record_lookup_to_sql,
)
from raise_featurestore_spark.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, sql: str | None = None) -> None:
    QUERIES[name] = fn
    if sql is not None:
        ORACLES[name] = sql


def register_agg(name: str, table: str, spec: Aggregation) -> None:
    register(
        name,
        lambda spark, sf_dir, t=table, s=spec: compile_aggregation(load_table(spark, sf_dir, t), s),
        aggregation_to_sql(spec, table),
    )


# --------------------------------------------------------------------------
# §2.4 Aggregation
# --------------------------------------------------------------------------

_FLAGSHIP = Aggregation(
    features=["l_extendedprice", "l_quantity"],
    metrics=["count", "sum", "avg", "min", "max"],
    group_by="l_returnflag",
    filter="l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'",
)
register_agg("agg_pricing_summary", "lineitem", _FLAGSHIP)

register_agg(
    "agg_global_stats",
    "orders",
    Aggregation(
        features=["o_totalprice"],
        metrics=[
            "count",
            "distinct_count",
            "null_rate",
            "null_count",
            "stddev",
            "variance",
            "median",
            "p50",
            "p75",
            "p90",
            "p95",
            "p99",
        ],
    ),
)

register_agg(
    "agg_window_7d",
    "events",
    Aggregation(
        features=["value"],
        metrics=["count", "sum", "avg"],
        group_by="event_type",
        window="7d",
        time_column="ts",
    ),
)

register_agg(
    "agg_rolling_daily",
    "events",
    Aggregation(
        features=["value"],
        metrics=["count", "sum", "avg", "stddev"],
        rolling=True,
        periods=7,
        time_column="ts",
    ),
)

register_agg(
    "agg_rolling_by_type",
    "events",
    Aggregation(
        features=["value"],
        metrics=["sum", "max"],
        group_by="event_type",
        rolling=True,
        periods=3,
        time_column="ts",
        filter="value > 10",
    ),
)

# --------------------------------------------------------------------------
# §2.2 / §2.7 RecordLookup: project/filter/order/limit (top-k) + point lookup
# --------------------------------------------------------------------------

_TOPK = RecordLookup(
    features=["o_orderkey", "o_custkey", "o_totalprice"],
    filter="o_orderstatus = 'F'",
    order_by="o_totalprice",
    descending=True,
    limit=100,
)
register(
    "lookup_topk_orders",
    lambda spark, sf_dir: compile_record_lookup(load_table(spark, sf_dir, "orders"), _TOPK),
    record_lookup_to_sql(_TOPK, "orders"),
)

_PROJ = RecordLookup(
    features=["event_id", "user_id", "event_type", "value"],
    filter="event_type = 'purchase' AND value > 100",
    order_by="event_id",
    limit=1000,
)
register(
    "lookup_filter_project",
    lambda spark, sf_dir: compile_record_lookup(load_table(spark, sf_dir, "events"), _PROJ),
    record_lookup_to_sql(_PROJ, "events"),
)

_POINT_IDS = [1, 7, 42, 99, 123456789]
register(
    "point_lookup_customer",
    lambda spark, sf_dir: point_lookup(
        load_table(spark, sf_dir, "customer"),
        "c_custkey",
        _POINT_IDS,
        ["c_name", "c_acctbal", "c_mktsegment"],
    ),
    "SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer "
    f"WHERE c_custkey IN ({', '.join(str(i) for i in _POINT_IDS)})",
)


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return compile_aggregation(load_table(spark, sf_dir, "lineitem"), _FLAGSHIP)
