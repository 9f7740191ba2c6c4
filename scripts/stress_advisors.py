"""1M-row differential for the two pre-flight scale advisors.

The skew reporter (analytics/skew_report.py) and the join-cardinality
guardrail (functions/join_estimate.py) are the tools a user trusts BEFORE
launching a 100 TB job, so their numbers must be RIGHT, not just
cross-engine-consistent. This stress (r5 VERDICT item 5) builds a
1,000,000-row corpus with a CONSTRUCTED skew profile whose ground truth is
analytic — 90% of rows share one hot key, the tail spreads evenly over 100
keys — and checks three ways:

1. advisor output == hand-computed truth (counts, fracs, hot_factor,
   est_rows, top_key_rows, amplification),
2. the join estimate == the ACTUAL row count of running the join,
3. Spark output == DuckDB twin, canonically hashed (the driver's gate).

Usage: python scripts/stress_advisors.py [n_rows]
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

    from raise_featurestore_spark.analytics.skew_report import (
        skew_report,
        skew_report_sql,
    )
    from raise_featurestore_spark.functions.join_estimate import (
        equi_join_cardinality,
        equi_join_cardinality_sql,
    )
    from raise_featurestore_spark.session import get_spark

    assert n % 10_000 == 0, "n must be a multiple of 10000 for exact truth"
    spark = get_spark("stress-advisors")

    # left: 90% of rows on hot key 0; the rest spread over exactly 100
    # tail keys (9, 19, ..., 999), n/10000 rows each. All counts analytic.
    left = spark.range(n).select(
        F.when((F.col("id") % 10) < 9, F.lit(0))
        .otherwise(F.col("id") % 1000)
        .cast("bigint")
        .alias("k"),
        (F.col("id") % 7).alias("payload"),
    )
    # right: every key 0..999, 10 rows each
    right = spark.range(10_000).select((F.col("id") % 1000).cast("bigint").alias("k"))

    tmp = tempfile.mkdtemp(prefix="stress_advisors_")
    lp, rp = os.path.join(tmp, "left.parquet"), os.path.join(tmp, "right.parquet")
    left.coalesce(8).write.mode("overwrite").parquet(lp)
    right.coalesce(2).write.mode("overwrite").parquet(rp)
    left, right = spark.read.parquet(lp), spark.read.parquet(rp)

    hot_rows = n * 9 // 10
    tail_keys = 100
    tail_rows = (n - hot_rows) // tail_keys
    n_distinct = tail_keys + 1

    # ---------------------------------------------------------- skew_report
    t0 = time.perf_counter()
    rep = {r.rank: r for r in skew_report(left, ["k"], top_k=3).collect()}
    t1 = time.perf_counter()
    assert rep[1].value == "0" and rep[1].cnt == hot_rows, rep[1]
    assert abs(rep[1].frac - hot_rows / n) < 1e-9
    want_hot = hot_rows * n_distinct / n  # cnt * n_distinct / n_rows
    assert abs(rep[1].hot_factor - want_hot) / want_hot < 1e-4, (
        rep[1].hot_factor, want_hot,
    )
    # rank 2/3: tail keys, exact counts, value-ascending tie-break
    assert rep[2].cnt == tail_rows and rep[3].cnt == tail_rows
    # equal-count ties break by STRING value ascending: of {"9","19",...,
    # "999"} the smallest strings are "109" then "119"
    assert rep[2].value == "109" and rep[3].value == "119", (rep[2], rep[3])
    print(f"skew_report: truth OK (hot={rep[1].cnt}, hot_factor={rep[1].hot_factor}) "
          f"spark={t1-t0:.1f}s")

    # ----------------------------------------------------- join cardinality
    t0 = time.perf_counter()
    est = equi_join_cardinality(left, right, "k").collect()[0]
    t1 = time.perf_counter()
    want_est = hot_rows * 10 + tail_keys * tail_rows * 10
    assert est.n_left == n and est.n_right == 10_000
    assert est.matched_keys == n_distinct
    assert est.est_rows == float(want_est), (est.est_rows, want_est)
    assert est.top_key_rows == float(hot_rows * 10)
    # the forecast must equal the REAL join's row count exactly
    actual = left.join(right, "k").count()
    assert actual == want_est, (actual, want_est)
    print(f"join_estimate: est_rows={est.est_rows:.0f} == actual={actual} "
          f"(amplification={est.amplification}, top_key_frac={est.top_key_frac}) "
          f"spark={t1-t0:.1f}s")

    # ------------------------------------------------------- oracle parity
    con = duckdb.connect()
    con.execute(f"CREATE VIEW left_t AS SELECT * FROM read_parquet('{lp}/*.parquet')")
    con.execute(f"CREATE VIEW right_t AS SELECT * FROM read_parquet('{rp}/*.parquet')")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from driver_sim import canon

    checks = {
        "skew_report": (
            skew_report(left, ["k"], top_k=3),
            skew_report_sql("left_t", ["k"], top_k=3),
        ),
        "join_estimate": (
            equi_join_cardinality(left, right, "k"),
            equi_join_cardinality_sql("left_t", "right_t", "k"),
        ),
    }
    for name, (sdf, sql) in checks.items():
        got, want = canon(sdf.toPandas()), canon(con.sql(sql).df())
        status = "MATCH" if got == want else "MISMATCH"
        print(f"{name}: {status} rows={got[0]}")
        assert got == want, name
    print(f"1M-row advisor differential: ground truth + byte-identical twins (n={n})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
