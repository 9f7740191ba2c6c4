"""Run queries in a BARE SparkSession (no session.py confs) to mimic the
driver's own environment. Catches conf-dependencies like the parquet
nanosAsLong legacy flag that our get_spark() would otherwise mask.

Usage: python scripts/foreign_session_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as em

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("foreign-session-check")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    qs = em.queries()
    names = only or sorted(qs)
    bad = 0
    for name in names:
        t0 = time.time()
        try:
            n = qs[name](spark, sf_dir).count()
            print(f"{name}: OK rows={n} ({time.time() - t0:.1f}s)")
        except Exception:
            bad += 1
            print(f"{name}: ERR")
            traceback.print_exc(limit=3)
    try:
        df = em.entry(spark)
        print(f"entry: OK rows={df.count()}")
    except Exception:
        bad += 1
        traceback.print_exc(limit=3)
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
