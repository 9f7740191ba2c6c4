"""Isolated per-query timing: fresh session, bench-style one-time warm-up,
then N cold+warm repeats of the named queries, timed with the same action
bench.py uses (Arrow toPandas) or the noop sink (guide §1.4).

Usage: python scripts/iso_bench.py [--noop] [--repeats N] QUERY [QUERY ...]

The point vs bench.py: no 144 other queries contending for page cache /
codegen context, so a query's own cost decomposes cleanly; and --noop times
computation without the result transfer.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    args = sys.argv[1:]
    noop = "--noop" in args
    if noop:
        args.remove("--noop")
    repeats = 2
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i : i + 2]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from raise_featurestore_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("iso-bench")
    # same one-time warm-up families as bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(1000).selectExpr(
        "percentile(id, array(0.5, 0.9)) AS p", "count(DISTINCT id % 7) AS d"
    ).collect()
    spark.range(100).groupBy().applyInPandas(lambda pdf: pdf.head(1), "id long").collect()
    try:
        from raise_featurestore_spark.queries import prime_reference_artifacts

        prime_reference_artifacts(spark, sf_dir)
    except Exception:
        pass

    qs = entrymod.queries()
    for name in names:
        fn = qs[name]
        for r in range(repeats):
            spark.sparkContext.setJobDescription(f"{name} run{r}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.toPandas()
            dt = time.perf_counter() - t0
            print(f"{name} run{r}: {dt:.3f} s", flush=True)
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
