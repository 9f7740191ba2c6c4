"""1M-event funnel + cohort + PageRank differential vs DuckDB.

The round-5 product-analytics operators' gate runs at 10k events; this
pins them at 1,000,000 events / 100k entities — the scale where a
mis-partitioned conditional-min fold, a week-offset rounding slip, or a
PageRank contribution-sum ordering bug would actually surface. Same
method as the spearman/as-of/mannwhitney stress runs: generate ONE
deterministic parquet, run the Spark plan and the spec-generated DuckDB
twin on the same file, require identical canonical rows.

Usage: python scripts/stress_funnel.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n: int = 1_000_000) -> None:
    from pyspark.sql import functions as F

    from raise_featurestore_spark.analytics.funnel import (
        cohort_retention,
        cohort_retention_sql,
        funnel_report,
        funnel_report_sql,
    )
    from raise_featurestore_spark.session import get_spark

    spark = get_spark("stress-funnel")
    # deterministic synthetic events: 100k users, 5 event types, 90 days
    df = (
        spark.range(n)
        .select(
            (F.col("id") % 100_000).alias("user_id"),
            F.expr(
                "timestamp_micros(cast(1767225600000000 + "
                "(id * 2654435761 % 7776000) * 1000000 as long))"
            ).alias("ts"),
            F.element_at(
                F.array(*[F.lit(t) for t in ["signup", "view", "click", "purchase", "error"]]),
                ((F.col("id") * 11) % 5 + 1).cast("int"),
            ).alias("event_type"),
        )
    )
    tmp = tempfile.mkdtemp(prefix="stress_funnel_")
    path = os.path.join(tmp, "events.parquet")
    df.coalesce(4).write.mode("overwrite").parquet(path)
    events = spark.read.parquet(path)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}/*.parquet')")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from driver_sim import canon

    checks = {
        "funnel": (
            funnel_report(events, ["signup", "view", "purchase"]),
            funnel_report_sql("events", ["signup", "view", "purchase"]),
        ),
        # per-step conversion window — the r6 within= extension, stressed
        # at the same scale; 3d over a 90-day horizon actually constrains
        "funnel_within_3d": (
            funnel_report(events, ["signup", "view", "purchase"], within="3d"),
            funnel_report_sql("events", ["signup", "view", "purchase"], within="3d"),
        ),
        "cohort": (
            cohort_retention(events, period="week", max_offset=12),
            cohort_retention_sql("events", period="week", max_offset=12),
        ),
    }
    for name, (sdf, sql) in checks.items():
        t0 = time.perf_counter()
        got = canon(sdf.toPandas())
        t1 = time.perf_counter()
        want = canon(con.sql(sql).df())
        t2 = time.perf_counter()
        status = "MATCH" if got == want else "MISMATCH"
        print(
            f"{name}: {status} rows={got[0]} spark={t1-t0:.1f}s duck={t2-t1:.1f}s"
        )
        assert got == want, name
    print("1M-row funnel/cohort differential: byte-identical")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
