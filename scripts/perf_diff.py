"""Differential perf: every registered query's Spark wall time vs its own
DuckDB oracle SQL over the same parquet (the single-node throughput bar).

Usage: python scripts/perf_diff.py [sf_dir]  → JSON lines + markdown table
to stdout; feed the table into PERF.md.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import duckdb

    import __spark_entry__ as em
    from raise_featurestore_spark.session import get_spark

    spark = get_spark("perf-diff")
    con = duckdb.connect()
    for path in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(path)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")

    qs, oracles = em.queries(), em.oracle_sql()
    # warm-up: JVM + parquet footer caches
    em.entry(spark)

    rows = []
    # symmetric columnar materialization on both engines (Arrow toPandas
    # vs .df()): row-collect()/fetchall() charge Python row pickling to
    # the engine — ~3 s on 600k-row outputs (bench.py carries the note)
    for name in sorted(qs):
        t0 = time.time()
        qs[name](spark, sf_dir).toPandas()
        t_spark = time.time() - t0
        t_duck = None
        if name in oracles:
            t0 = time.time()
            con.sql(oracles[name]).df()
            t_duck = time.time() - t0
        rows.append({"query": name, "spark_s": round(t_spark, 2),
                     "duckdb_s": round(t_duck, 2) if t_duck is not None else None})
        print(json.dumps(rows[-1]), flush=True)

    total_s = sum(r["spark_s"] for r in rows)
    total_d = sum(r["duckdb_s"] for r in rows if r["duckdb_s"] is not None)
    n_d = sum(1 for r in rows if r["duckdb_s"] is not None)
    print(f"\nTotal across {len(rows)} queries: Spark {total_s:.1f}s, "
          f"DuckDB {total_d:.1f}s (oracle side, {n_d} queries).\n")
    print("| query | spark s | duckdb s | spark/duck |")
    print("|---|---|---|---|")
    for r in sorted(rows, key=lambda r: -r["spark_s"]):
        if r["spark_s"] < 1.0:
            continue
        if r["duckdb_s"] is None:
            print(f"| {r['query']} | {r['spark_s']:.2f} | — | rows-only |")
        else:
            ratio = r["spark_s"] / max(r["duckdb_s"], 0.01)
            print(f"| {r['query']} | {r['spark_s']:.2f} | {r['duckdb_s']:.2f} | {ratio:.1f}× |")
    spark.stop()


if __name__ == "__main__":
    main()
