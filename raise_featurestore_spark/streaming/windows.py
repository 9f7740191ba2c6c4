"""Event-time windowed aggregation: tumbling / sliding / session.

(reference: the Aggregation ``window``+``rolling`` semantics
(raise_/PRD.md:971-993) and WATERMARK checkpointing
(raise_/transforms/checkpoint.py:21, PRD.md:1516) imply time bucketing;
SURVEY §2.11 calls out tumbling/sliding/session via ``F.window`` /
``F.session_window`` as the places our engine legitimately exceeds the
reference's declared surface.)

The same spec compiles two ways:

- **batch**: over a static DataFrame — used by the DuckDB differential
  oracle (time_bucket / shifted-bucket-union / gaps-and-islands SQL).
- **streaming**: identical plan over ``readStream`` plus
  ``withWatermark(ts, late)`` so state for closed windows is evicted —
  unbounded state is the classic 100 TB streaming failure mode.

Scale notes: tumbling/sliding aggs are hash aggregations keyed by
(window, keys) — partial aggregation happens map-side before the shuffle.
Session windows shuffle by key then merge overlapping [ts, ts+gap)
intervals per key; a key with millions of events is the skew case, which is
why the session compiler requires at least one key column.

Window starts are emitted as formatted strings: cross-engine timestamp
rendering differs (driver gotcha), strings hash identically.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from raise_featurestore_spark.analytics.analysis import parse_duration_seconds
from raise_featurestore_spark.functions.stable import (
    dec_sum,
    dec_sum_sql,
    stable_round,
    stable_round_sql,
)

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def _dec_sum_tpl(c: str) -> str:
    return stable_round_sql(dec_sum_sql(f"CAST({c} AS DOUBLE)"))


def _dec_avg_tpl(c: str) -> str:
    return stable_round_sql(
        f"{dec_sum_sql(f'CAST({c} AS DOUBLE)')} / CAST(COUNT({c}) AS DOUBLE)"
    )


# (spark agg builder, duckdb SQL template) per supported metric.
# sum/avg accumulate in exact decimals (dec_sum — order-independent,
# engine-independent) and emit through stable_round: the previous
# ROUND(float SUM, 4) stacked parallel-sum-order noise onto engine-ROUND
# repr-tie divergence — the round-4 flake class (emission rules).
_METRICS = {
    "count": (lambda c: F.count(F.lit(1)), "COUNT(*)"),
    "sum": (lambda c: stable_round(dec_sum(F.col(c).cast("double"))),
            "{dec_sum}"),
    "avg": (lambda c: stable_round(
                dec_sum(F.col(c).cast("double")) / F.count(c).cast("double")),
            "{dec_avg}"),
    "min": (lambda c: F.min(c), "MIN({c})"),
    "max": (lambda c: F.max(c), "MAX({c})"),
}


def _duration_sql(duration: str) -> str:
    return f"INTERVAL {parse_duration_seconds(duration)} SECOND"


@dataclass
class TumblingWindowSpec:
    """Fixed, non-overlapping event-time buckets."""

    time_column: str
    size: str  # duration grammar s/m/h/d/w
    feature: str
    metrics: list[str] = field(default_factory=lambda: ["count"])
    keys: list[str] = field(default_factory=list)

    def __post_init__(self) -> None:
        parse_duration_seconds(self.size)
        _validate_metrics(self.metrics)


@dataclass
class SlidingWindowSpec:
    """Overlapping windows: ``size`` long, advancing every ``slide``.

    ``size`` must be a multiple of ``slide`` (same restriction Spark's
    ``F.window`` implementation optimizes for: each row lands in exactly
    size/slide windows).
    """

    time_column: str
    size: str
    slide: str
    feature: str
    metrics: list[str] = field(default_factory=lambda: ["count"])
    keys: list[str] = field(default_factory=list)

    def __post_init__(self) -> None:
        size_s = parse_duration_seconds(self.size)
        slide_s = parse_duration_seconds(self.slide)
        if size_s % slide_s != 0:
            raise ValueError("size must be a multiple of slide")
        self.windows_per_row = size_s // slide_s
        _validate_metrics(self.metrics)


@dataclass
class SessionWindowSpec:
    """Gap-based sessions per key: a new session starts when the gap since
    the previous event is ≥ ``gap``."""

    time_column: str
    gap: str
    feature: str
    metrics: list[str] = field(default_factory=lambda: ["count"])
    keys: list[str] = field(default_factory=list)

    def __post_init__(self) -> None:
        parse_duration_seconds(self.gap)
        if not self.keys:
            # keyless sessions funnel every event into one merge task —
            # the degenerate skew case; refuse rather than quietly ship it
            raise ValueError("session windows require at least one key column")
        _validate_metrics(self.metrics)


WindowSpec = TumblingWindowSpec | SlidingWindowSpec | SessionWindowSpec


def _validate_metrics(metrics: list[str]) -> None:
    unknown = set(metrics) - set(_METRICS)
    if unknown:
        raise ValueError(f"unknown window metrics {sorted(unknown)}")


def _agg_cols(spec: WindowSpec) -> list[Column]:
    return [
        _METRICS[m][0](spec.feature).alias(f"{m}_{spec.feature}") for m in spec.metrics
    ]


def compile_window_agg(df: DataFrame, spec: WindowSpec, *, watermark: str | None = None
                       ) -> DataFrame:
    """Spec → DataFrame plan. Works identically on batch and streaming
    inputs; pass ``watermark`` (e.g. "1h") on streams so closed-window
    state is evicted (allowed lateness = the watermark delay)."""
    ts = spec.time_column
    if watermark is not None:
        secs = parse_duration_seconds(watermark)
        df = df.withWatermark(ts, f"{secs} seconds")

    if isinstance(spec, TumblingWindowSpec):
        win = F.window(ts, f"{parse_duration_seconds(spec.size)} seconds")
    elif isinstance(spec, SlidingWindowSpec):
        win = F.window(
            ts,
            f"{parse_duration_seconds(spec.size)} seconds",
            f"{parse_duration_seconds(spec.slide)} seconds",
        )
    else:
        win = F.session_window(ts, f"{parse_duration_seconds(spec.gap)} seconds")

    out = df.groupBy(win.alias("w"), *spec.keys).agg(*_agg_cols(spec))
    return out.select(
        F.date_format("w.start", _TS_FMT_SPARK).alias("window_start"),
        *spec.keys,
        *[f"{m}_{spec.feature}" for m in spec.metrics],
    )


def window_agg_to_sql(spec: WindowSpec, table: str) -> str:
    """Same spec → DuckDB SQL for the differential oracle."""
    ts, keys = spec.time_column, spec.keys
    metric_sql = ", ".join(
        _METRICS[m][1].format(
            c=spec.feature,
            dec_sum=_dec_sum_tpl(spec.feature),
            dec_avg=_dec_avg_tpl(spec.feature),
        )
        + f" AS {m}_{spec.feature}"
        for m in spec.metrics
    )
    key_sql = ("".join(f"{k}, " for k in keys))

    # epoch origin: DuckDB time_bucket's default origin is 2000-01-03,
    # while Spark F.window aligns buckets to the epoch — identical results
    # only for widths dividing 86400 s; "5h" or "1w" would shift every
    # window_start without the explicit origin
    _EPOCH = "TIMESTAMP '1970-01-01 00:00:00'"

    if isinstance(spec, TumblingWindowSpec):
        bucket = f"time_bucket({_duration_sql(spec.size)}, {ts}, {_EPOCH})"
        return (
            f"SELECT strftime({bucket}, '{_TS_FMT_DUCK}') AS window_start, "
            f"{key_sql}{metric_sql} FROM {table} GROUP BY {bucket}"
            + ("".join(f", {k}" for k in keys))
        )

    if isinstance(spec, SlidingWindowSpec):
        # row → its size/slide overlapping windows: shifted-bucket UNION
        slide = _duration_sql(spec.slide)
        shifted = " UNION ALL ".join(
            f"SELECT time_bucket({slide}, {ts}, {_EPOCH}) - {k} * {slide} AS ws, * "
            f"FROM {table}"
            for k in range(spec.windows_per_row)
        )
        return (
            f"SELECT strftime(ws, '{_TS_FMT_DUCK}') AS window_start, "
            f"{key_sql}{metric_sql} FROM ({shifted}) GROUP BY ws"
            + ("".join(f", {k}" for k in keys))
        )

    # session: gaps-and-islands — new session when gap since previous ≥ gap
    # (matches Spark session_window's [ts, ts+gap) merge-on-overlap rule)
    gap = _duration_sql(spec.gap)
    part = ", ".join(keys)
    return (
        "WITH marked AS ("
        f"SELECT *, CASE WHEN {ts} - LAG({ts}) OVER "
        f"(PARTITION BY {part} ORDER BY {ts}) >= {gap} "
        f"OR LAG({ts}) OVER (PARTITION BY {part} ORDER BY {ts}) IS NULL "
        f"THEN 1 ELSE 0 END AS new_sess FROM {table}), "
        "sess AS (SELECT *, SUM(new_sess) OVER "
        f"(PARTITION BY {part} ORDER BY {ts} ROWS UNBOUNDED PRECEDING) AS sess_id "
        "FROM marked) "
        f"SELECT strftime(MIN({ts}), '{_TS_FMT_DUCK}') AS window_start, "
        f"{key_sql}{metric_sql} FROM sess GROUP BY sess_id"
        + ("".join(f", {k}" for k in keys))
    )
