"""Time-series baselines: seasonal-naive forecast with rolling backtest.

Engine addition. Before anyone fits a model, a feature store should
answer "how predictable is this series, and what error does the trivial
forecaster make?" — the baseline every real model must beat. Two pieces:

- ``daily_series``: per-key daily aggregate of a value column (exact
  decimal sums, so the series itself is partition-order-free).
- ``backtest_seasonal_naive``: forecast ŷ(t) = y(t − season) and score
  |y − ŷ| over the evaluation window. The season shift is an EQUI-JOIN
  on the shifted date key — robust to gaps in the series (a LAG(k) row
  window would silently mis-shift across missing days) and free of any
  unpartitioned window. Emits per-key (n_eval, mae, naive_mae_ratio)
  where the ratio compares against the constant-mean forecaster; < 1 means the
  seasonal structure is real.

Scale: everything is keyed grouped aggregates and one equi-join on
(key, date) — the series table is |keys|·|days|, tiny relative to the
event table at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raise_featurestore_spark.functions.stable import (
    dec_sum,
    dec_sum_sql,
    stable_round,
    stable_round_sql,
)


def daily_series(
    df: DataFrame,
    key_col: str = "event_type",
    time_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(key, day DATE, y): one exact-decimal daily sum per key."""
    return (
        df.groupBy(
            F.col(key_col).alias("key"),
            F.to_date(F.date_trunc("day", F.col(time_col))).alias("day"),
        )
        .agg(dec_sum(F.col(value_col).cast("double")).alias("y"))
    )


def _series_sql(
    table: str, key_col: str, time_col: str, value_col: str
) -> str:
    return (
        f"SELECT {key_col} AS key, CAST(DATE_TRUNC('day', {time_col}) AS DATE) AS day, "
        f"{dec_sum_sql(f'CAST({value_col} AS DOUBLE)')} AS y "
        f"FROM {table} GROUP BY 1, 2"
    )


def backtest_seasonal_naive(
    df: DataFrame,
    key_col: str = "event_type",
    time_col: str = "ts",
    value_col: str = "value",
    season_days: int = 7,
    round_to: int = 4,
) -> DataFrame:
    """Per-key backtest of ŷ(t) = y(t − season_days):

    (key, n_eval, mae, naive_mae_ratio). The denominator of the ratio is
    the mean-forecaster MAE (|y − mean(y)| over the same evaluated days),
    so ratio < 1 ⇔ the seasonal structure beats a constant."""
    s = daily_series(df, key_col, time_col, value_col)
    cur = s.select("key", "day", "y")
    prev = s.select(
        F.col("key").alias("__k"),
        F.date_add(F.col("day"), season_days).alias("__d"),
        F.col("y").alias("__y_prev"),
    )
    joined = cur.join(
        prev, (F.col("key") == F.col("__k")) & (F.col("day") == F.col("__d"))
    ).where(
        # only EVALUABLE rows: a day whose value (or whose seasonal
        # predecessor) is NULL must not inflate the denominator while its
        # NULL error term drops out of the numerator (r5 review finding)
        F.col("y").isNotNull() & F.col("__y_prev").isNotNull()
    )
    mean_y = dec_sum(F.col("y")) / F.count("y")
    agg = joined.groupBy("key").agg(
        F.count("y").alias("n_eval"),
        (dec_sum(F.abs(F.col("y") - F.col("__y_prev"))) / F.count("y")).alias("__mae"),
        mean_y.alias("__mean"),
    )
    # mean-forecaster MAE needs a second pass over the evaluated rows with
    # the per-key mean joined back (the mean depends on the full group)
    base = (
        joined.join(agg.select("key", "__mean"), "key")
        .groupBy("key")
        .agg(
            (dec_sum(F.abs(F.col("y") - F.col("__mean"))) / F.count("y")).alias(
                "__mae0"
            )
        )
    )
    return (
        agg.join(base, "key")
        .select(
            "key",
            "n_eval",
            stable_round(F.col("__mae"), decimals=round_to).alias("mae"),
            stable_round(
                F.when(F.col("__mae0") > 0, F.col("__mae") / F.col("__mae0")),
                decimals=round_to,
            ).alias("naive_mae_ratio"),
        )
    )


def backtest_seasonal_naive_sql(
    table: str,
    key_col: str = "event_type",
    time_col: str = "ts",
    value_col: str = "value",
    season_days: int = 7,
    round_to: int = 4,
) -> str:
    """DuckDB twin of :func:`backtest_seasonal_naive`."""
    series = _series_sql(table, key_col, time_col, value_col)
    mae = f"{dec_sum_sql('ABS(y - __y_prev)')} / CAST(COUNT(y) AS DOUBLE)"
    mean_y = f"{dec_sum_sql('y')} / CAST(COUNT(y) AS DOUBLE)"
    mae0 = f"{dec_sum_sql('ABS(j.y - a.__mean)')} / CAST(COUNT(j.y) AS DOUBLE)"
    return (
        f"WITH __s AS ({series}), "
        f"__j AS (SELECT c.key, c.day, c.y, p.y AS __y_prev "
        f"FROM __s c JOIN __s p ON c.key = p.key "
        f"AND c.day = p.day + INTERVAL {season_days} DAY "
        f"WHERE c.y IS NOT NULL AND p.y IS NOT NULL), "
        f"__a AS (SELECT key, COUNT(y) AS n_eval, {mae} AS __mae, "
        f"{mean_y} AS __mean FROM __j GROUP BY key), "
        f"__b AS (SELECT j.key, {mae0} AS __mae0 "
        f"FROM __j j JOIN __a a ON j.key = a.key GROUP BY j.key) "
        f"SELECT a.key, a.n_eval, "
        f"{stable_round_sql('a.__mae', decimals=round_to)} AS mae, "
        f"{stable_round_sql('CASE WHEN b.__mae0 > 0 THEN a.__mae / b.__mae0 END', decimals=round_to)} "
        f"AS naive_mae_ratio FROM __a a JOIN __b b ON a.key = b.key"
    )
