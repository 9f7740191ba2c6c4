"""Custom stateful streaming operators via ``applyInPandasWithState``.

(SURVEY §2.11: the reference's WATERMARK checkpoint + LiveTable CDC surface
implies streaming state; built-in windows cover tumbling/sliding/session.
These operators cover what built-ins CAN'T express: per-key state that
evolves row-by-row with custom math and TTL eviction.)

Two operators:

- ``decayed_mean``: per-key exponentially-decayed running mean — the
  classic "user's recent average" serving feature. Not expressible with
  windowed aggregation (the decay depends on inter-event gaps, not fixed
  frames).
- ``stateful_dedup``: emit-first-occurrence per key with a state TTL — at
  100 TB the TTL bounds state size where a global ``dropDuplicates`` on a
  stream would grow without bound.

Both run identically under batch (``applyInPandas``-style grouping via the
same inner function) and streaming (``applyInPandasWithState`` with
GroupStateTimeout), so unit tests cover the math and a streaming test
covers the state plumbing.

Scale notes: state is partitioned by key across executors (hash shuffle on
the grouping key); each micro-batch touches only keys present in the batch.
TTL/timeout eviction keeps the state store bounded — the failure mode to
design against is unbounded key cardinality with no eviction.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from raise_featurestore_spark.analytics.analysis import parse_duration_seconds


def _decay_series(
    times: pd.Series, values: pd.Series, half_life_s: float,
    prev_mean: float | None, prev_ts: float | None
) -> tuple[pd.Series, float, float]:
    """Sequentially fold (ts, value) into a decayed mean. Returns the
    per-row means plus final (mean, ts) state. Pure pandas/python — shared
    verbatim by the batch and streaming paths."""
    out = []
    mean, last = prev_mean, prev_ts
    lam = math.log(2.0) / half_life_s
    for ts, v in zip(times, values):
        t = ts.timestamp()
        if mean is None:
            mean = float(v)
        else:
            # explicit None check: a legitimate prev_ts of exactly 0.0
            # (epoch) must not be treated as missing (`last or t` would)
            gap = (t - last) if last is not None else 0.0
            w = math.exp(-lam * max(gap, 0.0))
            mean = w * mean + (1.0 - w) * float(v)
        last = t
        out.append(mean)
    return pd.Series(out), mean, last


def decayed_mean_batch(
    df: DataFrame, key: str, time_column: str, value_column: str, half_life: str
) -> DataFrame:
    """Batch form: groupBy(key).applyInPandas, rows folded in time order."""
    hl = float(parse_duration_seconds(half_life))

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_column)
        means, _, _ = _decay_series(pdf[time_column], pdf[value_column], hl, None, None)
        pdf = pdf.assign(decayed_mean=means.round(6).to_numpy())
        return pdf[[key, time_column, value_column, "decayed_mean"]]

    schema = (
        f"{key} {dict(df.dtypes)[key]}, {time_column} timestamp, "
        f"{value_column} double, decayed_mean double"
    )
    return df.groupBy(key).applyInPandas(fold, schema=schema)


def decayed_mean_stream(
    df: DataFrame, key: str, time_column: str, value_column: str, half_life: str,
    state_ttl: str = "1d",
) -> DataFrame:
    """Streaming form: the SAME fold with per-key state carried across
    micro-batches; processing-time timeout evicts idle keys after
    ``state_ttl``."""
    hl = float(parse_duration_seconds(half_life))
    ttl_ms = parse_duration_seconds(state_ttl) * 1000
    key_type = dict(df.dtypes)[key]

    def update(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # TTL eviction: drop idle key state, emit nothing
            state.remove()
            return
        prev_mean, prev_ts = state.get if state.exists else (None, None)
        # The runtime hands a key's micro-batch as an ITERATOR of Arrow
        # chunks in no guaranteed order; folding each chunk independently
        # would process a large key's rows out of global time order and
        # corrupt both the emitted means and the persisted state. Concat
        # and sort ONCE — bounded by one key's rows in one micro-batch.
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(time_column)
        if batch.empty:
            return
        means, prev_mean, prev_ts = _decay_series(
            batch[time_column], batch[value_column], hl, prev_mean, prev_ts
        )
        if prev_mean is not None:
            state.update((float(prev_mean), float(prev_ts)))
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                key: batch[key].to_numpy(),
                time_column: batch[time_column].to_numpy(),
                value_column: batch[value_column].to_numpy(),
                "decayed_mean": means.round(6).to_numpy(),
            }
        )

    out_schema = (
        f"{key} {key_type}, {time_column} timestamp, "
        f"{value_column} double, decayed_mean double"
    )
    return df.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="mean double, ts double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def stateful_dedup_stream(
    df: DataFrame, keys: list[str], state_ttl: str = "1d"
) -> DataFrame:
    """First occurrence per key across micro-batches; state evicts after
    ``state_ttl`` so the store stays bounded (a re-arrival after eviction
    re-emits — the standard TTL-dedup contract)."""
    ttl_ms = parse_duration_seconds(state_ttl) * 1000
    dtypes = dict(df.dtypes)
    out_schema = ", ".join(f"{c} {dtypes[c]}" for c in df.columns)

    def update(
        key_tuple: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # TTL eviction: a later re-arrival re-emits
            state.remove()
            return
        seen = state.exists
        emitted = False
        for pdf in pdfs:
            if not seen and not emitted and len(pdf):
                yield pdf.iloc[:1]
                emitted = True
        if seen or emitted:
            state.update((True,))
            state.setTimeoutDuration(ttl_ms)

    return df.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
