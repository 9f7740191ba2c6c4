"""Decompose a query's wall time into PLAN-BUILD (fn() return, including
any eager jobs the compile path runs) vs ACTION (noop sink), repeated.

Usage: python scripts/compile_decomp.py [--repeats N] QUERY [QUERY ...]

Motivation: VERDICT r11 item 6 — corr_matrix_wide's warm time carries
~2.2 s of per-call plan construction (eager rank-map collect + py4j
column building); this isolates that slice so an optimization of it is
measurable independently of the action.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    args = sys.argv[1:]
    repeats = 3
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from raise_featurestore_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("compile-decomp")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(100).groupBy().applyInPandas(lambda pdf: pdf.head(1), "id long").collect()

    qs = entrymod.queries()
    for name in args:
        fn = qs[name]
        for r in range(repeats):
            spark.sparkContext.setJobDescription(f"{name} decomp run{r}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            print(
                f"{name} run{r}: plan-build {t1 - t0:.3f} s, "
                f"action {t2 - t1:.3f} s, total {t2 - t0:.3f} s",
                flush=True,
            )
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
