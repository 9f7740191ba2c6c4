"""Custom stateful streaming operators: decayed mean (batch + streaming
parity, cross-micro-batch state) and TTL dedup."""

from __future__ import annotations

import math
import time
from datetime import datetime, timedelta

import pytest

from raise_featurestore_spark.streaming.stateful import (
    decayed_mean_batch,
    decayed_mean_stream,
    stateful_dedup_stream,
)

BASE = datetime(2024, 1, 1, 12, 0, 0)
SCHEMA = "user string, ts timestamp, v double"


def _rows():
    return [
        ("u1", BASE, 10.0),
        ("u1", BASE + timedelta(seconds=60), 20.0),  # one half-life later
        ("u1", BASE + timedelta(seconds=120), 40.0),
        ("u2", BASE, 5.0),
    ]


def _expected_u1():
    # half_life=60s → w=0.5 per 60s step
    m1 = 10.0
    m2 = 0.5 * m1 + 0.5 * 20.0  # 15.0
    m3 = 0.5 * m2 + 0.5 * 40.0  # 27.5
    return [m1, m2, m3]


def test_decayed_mean_batch(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    out = decayed_mean_batch(df, "user", "ts", "v", "1m")
    got = {
        (r["user"], r["ts"]): r["decayed_mean"]
        for r in out.collect()
    }
    exp = _expected_u1()
    assert got[("u1", BASE)] == pytest.approx(exp[0])
    assert got[("u1", BASE + timedelta(seconds=60))] == pytest.approx(exp[1])
    assert got[("u1", BASE + timedelta(seconds=120))] == pytest.approx(exp[2])
    assert got[("u2", BASE)] == pytest.approx(5.0)


def test_decayed_mean_stream_carries_state(spark, tmp_path):
    """Feed the same rows across TWO micro-batches: the second batch must
    continue from the first batch's state, matching the batch result."""
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")

    df1 = spark.createDataFrame(_rows()[:2], SCHEMA)
    df1.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(src)
    agg = decayed_mean_stream(stream, "user", "ts", "v", "1m", state_ttl="1h")
    q = (
        agg.writeStream.format("memory").queryName("decay_test")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        # generous per-phase deadlines: under full-suite CPU contention a
        # micro-batch can take minutes to schedule on local mode
        deadline = time.time() + 240
        while time.time() < deadline:
            if spark.sql("SELECT COUNT(*) FROM decay_test").collect()[0][0] >= 2:
                break
            time.sleep(0.5)

        # second micro-batch: remaining rows arrive later
        spark.createDataFrame(_rows()[2:], SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        deadline = time.time() + 240
        while time.time() < deadline:
            if spark.sql("SELECT COUNT(*) FROM decay_test").collect()[0][0] >= 4:
                break
            time.sleep(0.5)

        got = {
            (r["user"], r["ts"]): r["decayed_mean"]
            for r in spark.sql("SELECT * FROM decay_test").collect()
        }
        exp = _expected_u1()
        # the third u1 row was processed in micro-batch 2 but continues
        # micro-batch 1's state
        assert got[("u1", BASE + timedelta(seconds=120))] == pytest.approx(exp[2])
        assert got[("u2", BASE)] == pytest.approx(5.0)
    finally:
        q.stop()


@pytest.mark.slow
def test_stateful_dedup_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0)], "k string, v double"
    ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema("k string, v double").parquet(src)
    out = stateful_dedup_stream(stream, ["k"], state_ttl="1h")
    q = (
        out.writeStream.format("memory").queryName("dedup_test")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(90)
    rows = spark.sql("SELECT k, COUNT(*) AS n FROM dedup_test GROUP BY k").collect()
    counts = {r["k"]: r["n"] for r in rows}
    assert counts == {"a": 1, "b": 1}


@pytest.mark.slow
def test_stream_folds_multi_chunk_groups_in_time_order(spark, tmp_path):
    """Regression: a key whose micro-batch spans multiple Arrow chunks must
    be folded in GLOBAL time order — per-chunk sorting produced wrong means
    and wrong persisted state. Force tiny Arrow chunks and compare the
    streaming fold against the batch fold on identical data."""
    from pyspark.sql import functions as F

    from raise_featurestore_spark.streaming.stateful import (
        decayed_mean_batch,
        decayed_mean_stream,
    )

    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(conf)
    spark.conf.set(conf, "7")
    try:
        rows = [
            # one key, 40 events, timestamps deliberately NOT in input order
            (1, datetime(2026, 1, 1) + timedelta(seconds=((i * 17) % 40) * 30), float(i))
            for i in range(40)
        ]
        src = str(tmp_path / "in")
        df = spark.createDataFrame(rows, "uid long, ts timestamp, v double")
        df.coalesce(1).write.mode("overwrite").parquet(src)

        stream = spark.readStream.schema("uid long, ts timestamp, v double").parquet(src)
        out_rows = []
        q = (
            decayed_mean_stream(stream, "uid", "ts", "v", half_life="5m")
            .writeStream.format("memory")
            .queryName("chunk_fold")
            .option("checkpointLocation", str(tmp_path / "chk"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.uid, r.ts): r.decayed_mean
            for r in spark.sql("SELECT * FROM chunk_fold").collect()
        }
        want = {
            (r.uid, r.ts): r.decayed_mean
            for r in decayed_mean_batch(df, "uid", "ts", "v", half_life="5m").collect()
        }
        assert got == want
    finally:
        spark.conf.set(conf, old)
