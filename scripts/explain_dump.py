"""Dump .explain("formatted") for named queries to files.

Usage: python scripts/explain_dump.py OUT_DIR SUFFIX QUERY [QUERY ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each named query, built against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1). Plan-only: no action is
executed beyond whatever eager work the query's compile path itself does
(e.g. rank-map builds documented in analytics/correlation.py).
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from raise_featurestore_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("explain-dump")
    qs = entrymod.queries()
    for name in names:
        if name not in qs:
            print(f"{name}: NOT REGISTERED", file=sys.stderr)
            continue
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
