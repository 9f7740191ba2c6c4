"""Cross-engine dtype parity sweep.

The r5 driver gate failed exactly the 3 queries whose ORACLE frame carried
integer-valued float64 columns (DuckDB SUM(BIGINT) -> HUGEINT -> pandas
float64) where the Spark frame carried int64 — a rendering-divergence class
invisible to driver_sim's %.6g canon ("4568" == "4568") but fatal under any
canon that renders floats with repr/str ("4568.0" != "4568"). This sweep
runs every queries() entry on BOTH engines and reports any per-column pandas
dtype family mismatch (int vs float vs object/decimal) so the registry can
pin dtype parity as an invariant.

Usage: python scripts/dtype_sweep.py [sf_dir] [name_substring ...]
"""

from __future__ import annotations

import glob
import json
import os
import sys


def family(dtype: str, sample) -> str:
    if dtype.startswith(("int", "uint")):
        return "int"
    if dtype.startswith("float"):
        return "float"
    if dtype == "object":
        import decimal

        if isinstance(sample, decimal.Decimal):
            return "decimal"
        if isinstance(sample, bool):
            return "bool"
        return "object"
    if dtype == "bool" or dtype.startswith("boolean"):
        return "bool"
    return dtype


def frame_families(df) -> dict[str, str]:
    out = {}
    for c in df.columns:
        s = df[c]
        sample = None
        nn = s.dropna()
        if len(nn):
            sample = nn.iloc[0]
        out[c] = family(str(s.dtype), sample)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import duckdb

    import __spark_entry__ as em
    from raise_featurestore_spark.session import get_spark

    spark = get_spark("dtype-sweep")
    con = duckdb.connect()
    for path in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(path)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")

    qs, oracles = em.queries(), em.oracle_sql()
    if len(sys.argv) > 2:
        pats = sys.argv[2:]
        qs = {n: f for n, f in qs.items() if any(p in n for p in pats)}
    bad = {}
    for name in sorted(qs):
        if name not in oracles:
            continue
        try:
            spark_pd = qs[name](spark, sf_dir).toPandas()
            want_pd = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001 - report, keep sweeping
            bad[name] = {"error": str(e)[:200]}
            continue
        g, w = frame_families(spark_pd), frame_families(want_pd)
        diffs = {
            c: {"spark": g.get(c, "MISSING"), "oracle": w.get(c, "MISSING")}
            for c in sorted(set(g) | set(w))
            if g.get(c) != w.get(c)
        }
        if diffs:
            bad[name] = diffs
            print(f"{name}: DTYPE-DIFF {diffs}")
        else:
            print(f"{name}: ok")
    print(json.dumps({"dtype_mismatches": len(bad), "detail": bad}, indent=1))
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
