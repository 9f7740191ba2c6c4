"""Funnel ordering semantics + cohort retention math."""

from __future__ import annotations

import pytest


def _events(spark, rows):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        rows, "user_id int, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def test_funnel_requires_strict_order(spark):
    from raise_featurestore_spark.analytics.funnel import funnel_report

    rows = [
        # u1: A -> B -> C in order: completes all three
        (1, "2026-01-01 00:00:00", "A"), (1, "2026-01-02 00:00:00", "B"),
        (1, "2026-01-03 00:00:00", "C"),
        # u2: B before A, no B after -> stops at step 1
        (2, "2026-01-01 00:00:00", "B"), (2, "2026-01-02 00:00:00", "A"),
        # u3: A -> C -> B: C precedes B, so funnel stops after B (step 2)
        (3, "2026-01-01 00:00:00", "A"), (3, "2026-01-02 00:00:00", "C"),
        (3, "2026-01-03 00:00:00", "B"),
        # u4: never does A -> counted nowhere
        (4, "2026-01-01 00:00:00", "C"),
    ]
    out = {r.step: r.n_entities for r in funnel_report(
        _events(spark, rows), ["A", "B", "C"]
    ).collect()}
    assert out == {"A": 3, "B": 2, "C": 1}


def test_funnel_same_timestamp_not_counted(spark):
    """Strictly-after semantics: simultaneous A and B does not advance."""
    from raise_featurestore_spark.analytics.funnel import funnel_report

    rows = [(1, "2026-01-01 00:00:00", "A"), (1, "2026-01-01 00:00:00", "B")]
    out = {r.step: r.n_entities for r in funnel_report(
        _events(spark, rows), ["A", "B"]
    ).collect()}
    assert out == {"A": 1, "B": 0}


def test_funnel_within_window(spark):
    """within='1d' per-step conversion windows: a step landing exactly ON
    the boundary counts (<=); one microsecond past does not; and the fold
    is greedy — the window anchors on the EARLIEST qualifying prior step."""
    from raise_featurestore_spark.analytics.funnel import funnel_report

    rows = [
        # u1: B exactly 24h after A — boundary inclusive, converts
        (1, "2026-01-01 00:00:00", "A"), (1, "2026-01-02 00:00:00", "B"),
        # u2: B 24h + 1s after A — outside the window
        (2, "2026-01-01 00:00:00", "A"), (2, "2026-01-02 00:00:01", "B"),
        # u3: first A->B conversion inside window, then C too late from
        # that B (anchors on u3's EARLIEST B, not the later one)
        (3, "2026-01-01 00:00:00", "A"), (3, "2026-01-01 12:00:00", "B"),
        (3, "2026-01-05 00:00:00", "B"), (3, "2026-01-05 06:00:00", "C"),
    ]
    out = {r.step: r.n_entities for r in funnel_report(
        _events(spark, rows), ["A", "B", "C"], within="1d"
    ).collect()}
    assert out == {"A": 3, "B": 2, "C": 0}
    # unwindowed control: u2's B and u3's C all count
    out2 = {r.step: r.n_entities for r in funnel_report(
        _events(spark, rows), ["A", "B", "C"]
    ).collect()}
    assert out2 == {"A": 3, "B": 3, "C": 1}


def test_cohort_retention_offsets(spark):
    from raise_featurestore_spark.analytics.funnel import cohort_retention

    rows = [
        (1, "2026-01-05 00:00:00", "x"),  # cohort 2026-01
        (1, "2026-02-10 00:00:00", "x"),  # active at offset 1
        (1, "2026-02-11 00:00:00", "x"),  # same period: not double-counted
        (2, "2026-01-20 00:00:00", "x"),  # cohort 2026-01, never returns
        (3, "2026-02-01 00:00:00", "x"),  # cohort 2026-02
    ]
    out = {(r.cohort, r.offset): r.n_active for r in cohort_retention(
        _events(spark, rows), period="month", max_offset=3
    ).collect()}
    assert out == {
        ("2026-01", 0): 2,
        ("2026-01", 1): 1,
        ("2026-02", 0): 1,
    }


def test_forecast_backtest_seasonal_naive(spark):
    """A perfectly 2-period-seasonal series has MAE 0 and beats the mean
    forecaster; a gap in the series must not mis-shift the forecast."""
    from pyspark.sql import functions as F

    from raise_featurestore_spark.analytics.forecast import backtest_seasonal_naive

    rows = []
    # key 'a': alternating 10, 20 daily; perfect season at 2 days
    for d in range(1, 11):
        rows.append(("a", f"2026-01-{d:02d} 00:00:00", 10.0 if d % 2 else 20.0))
    # key 'b': same pattern but day 5 is MISSING — a row-lag would
    # mis-align; the date-join must simply skip the gap rows
    for d in range(1, 11):
        if d != 5:
            rows.append(("b", f"2026-01-{d:02d} 00:00:00", 10.0 if d % 2 else 20.0))
    df = spark.createDataFrame(
        rows, "event_type string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = {r.key: r for r in backtest_seasonal_naive(df, season_days=2).collect()}
    assert out["a"].mae == 0.0 and out["a"].naive_mae_ratio == 0.0
    assert out["a"].n_eval == 8
    assert out["b"].mae == 0.0  # gap skipped, alignment preserved
    assert out["b"].n_eval == 6  # day 5 and day 7 evaluations drop


def test_forecast_backtest_skips_unevaluable_rows(spark):
    """A NULL daily value (or NULL seasonal predecessor) must not inflate
    the MAE denominator while dropping from the numerator."""
    from pyspark.sql import functions as F

    from raise_featurestore_spark.analytics.forecast import backtest_seasonal_naive

    rows = [
        ("a", "2026-01-01 00:00:00", 10.0),
        ("a", "2026-01-02 00:00:00", None),   # day-2 value NULL
        ("a", "2026-01-03 00:00:00", 20.0),   # evaluable vs day 1: |20-10|
        ("a", "2026-01-04 00:00:00", 99.0),   # prev (day 2) is NULL: skip
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = backtest_seasonal_naive(df, season_days=2).collect()
    assert len(out) == 1
    assert out[0].n_eval == 1 and out[0].mae == 10.0


def test_funnel_within_adversarial_boundaries(spark):
    """r6 VERDICT item 7: the within-window fold's tie semantics pinned on
    an adversarial micro-fixture — duplicate events exactly ON the
    boundary, same-timestamp multi-step rows, and a non-qualifying
    earliest occurrence — asserted on BOTH engines (the DuckDB twin runs
    the same fixture)."""
    import duckdb

    from raise_featurestore_spark.analytics.funnel import (
        funnel_report,
        funnel_report_sql,
    )

    rows = [
        # u1: TWO B events both exactly at t_A + 1d (duplicate timestamps
        # at the step boundary) — boundary is inclusive, user counts once
        (1, "2026-01-01 00:00:00", "A"),
        (1, "2026-01-02 00:00:00", "B"),
        (1, "2026-01-02 00:00:00", "B"),
        # u2: B at the SAME timestamp as A — strict `>` excludes it even
        # though it is trivially inside the window
        (2, "2026-01-01 00:00:00", "A"),
        (2, "2026-01-01 00:00:00", "B"),
        # u3: earliest B is BEFORE A (non-qualifying); a later B inside
        # the window converts — the conditional min ranges over
        # QUALIFYING events only, not the global earliest
        (3, "2026-01-01 00:00:00", "A"),
        (3, "2025-12-31 00:00:00", "B"),
        (3, "2026-01-01 12:00:00", "B"),
        # u4: B one microsecond past the boundary — out
        (4, "2026-01-01 00:00:00", "A"),
        (4, "2026-01-02 00:00:00.000001", "B"),
        # u5: C exactly at (earliest qualifying B) + 1d — chained boundary
        (5, "2026-01-01 00:00:00", "A"),
        (5, "2026-01-01 06:00:00", "B"),
        (5, "2026-01-02 06:00:00", "C"),
    ]
    df = _events(spark, rows)
    out = {r.step: r.n_entities for r in funnel_report(
        df, ["A", "B", "C"], within="1d"
    ).collect()}
    assert out == {"A": 5, "B": 3, "C": 1}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events(user_id INT, ts TIMESTAMP, event_type VARCHAR)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?)",
                    [(u, t, e) for u, t, e in rows])
    want = {
        r[1]: r[2]
        for r in con.sql(
            funnel_report_sql("events", ["A", "B", "C"], within="1d")
        ).fetchall()
    }
    assert want == out
