"""1M-row Mann-Whitney / KS differential vs DuckDB (VERDICT.md r4 item 8).

The rank-based stat tests share the distributed prefix-sum kernel
(functions/prefix.py) whose range-exchange corruption bug only manifested
at data scales where RangePartitioner's bound sample is PARTIAL — the
oracle-scale gate could never see it. This pins mannwhitney/ks at 1M rows
(heavy ties: values quantized to 0.01) the same way the round-4 spearman
and as-of stress runs pinned their kernels: generate one deterministic
parquet, run the Spark plan and the spec-generated DuckDB SQL twin on the
SAME file, and require byte-identical canonical rows.

Usage: python scripts/stress_stattest.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from driver_sim import canon  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from pyspark.sql import functions as F

    from raise_featurestore_spark.analytics.analysis import StatTest
    from raise_featurestore_spark.analytics.stattest import (
        compile_stattest,
        stattest_to_sql,
    )
    from raise_featurestore_spark.session import get_spark

    spark = get_spark("stress-stattest")
    path = "/tmp/stress_stattest.parquet"
    # deterministic skewed two-arm data, quantized to 2 decimals => massive
    # rank ties (the hard case for the distributed tie-correction)
    spark.range(n).select(
        F.when(F.col("id") % 3 == 0, F.lit("control"))
        .otherwise(F.lit("treatment"))
        .alias("arm"),
        F.round(
            (F.sin(F.col("id").cast("double")) * 50.0)
            + F.when(F.col("id") % 3 == 0, 0.0).otherwise(0.7),
            2,
        ).alias("metric"),
    ).write.mode("overwrite").parquet(path)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{path}/*.parquet')")

    ok = True
    for test in ("mannwhitney", "ks"):
        spec = StatTest(
            feature="metric", test=test, segment_by="arm",
            control="control", treatment="treatment",
        )
        t0 = time.perf_counter()
        got = compile_stattest(
            spark.read.parquet(path), spec, include_p=False
        ).toPandas()
        spark_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        want = con.sql(stattest_to_sql(spec, "t")).df()
        duck_s = time.perf_counter() - t0
        g, w = canon(got), canon(want)
        match = g == w
        ok = ok and match
        print(
            f"{test}: {'MATCH' if match else 'MISMATCH'} "
            f"spark={spark_s:.1f}s duckdb={duck_s:.1f}s rows={n} "
            f"hash={g[2][:8]}/{w[2][:8]}"
        )
        if not match:
            print("  spark:", got.to_dict("records"))
            print("  oracle:", want.to_dict("records"))
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
