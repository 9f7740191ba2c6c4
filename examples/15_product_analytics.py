"""Example: product analytics — funnels, cohorts, cross-tabs, and graph
importance over the events/orders tables.

(engine capstone #4: the dashboard-feeding query family. Everything is a
bounded number of grouped aggregates: the funnel is a conditional-min
fold, retention is two grouped passes, the cube is one Expand aggregate,
and PageRank iterations are join+aggregate pairs over a basket-derived
edge list.
run: python examples/15_product_analytics.py)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main(sf_dir: str = SF_DIR) -> dict:
    from raise_featurestore_spark.analytics.funnel import (
        cohort_retention,
        funnel_report,
    )
    from raise_featurestore_spark.analytics.graph import pagerank
    from raise_featurestore_spark.analytics.multidim import TOTAL, cube_report
    from raise_featurestore_spark.session import get_spark
    from raise_featurestore_spark.tables import load_table

    spark = get_spark("example-15")
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    # 1. acquisition funnel with strict ordering
    funnel = {
        r.step: r.n_entities
        for r in funnel_report(events, ["signup", "view", "purchase"]).collect()
    }
    assert funnel["signup"] >= funnel["view"] >= funnel["purchase"]

    # 2. weekly cohort retention
    cohorts = cohort_retention(events, period="week", max_offset=4).collect()
    sizes = {r.cohort: r.n_active for r in cohorts if r.offset == 0}
    assert sizes and all(n > 0 for n in sizes.values())

    # 3. revenue cube with subtotal lattice
    cube = {
        (r.o_orderstatus, r.o_orderpriority): r
        for r in cube_report(
            orders, ["o_orderstatus", "o_orderpriority"], "o_totalprice"
        ).collect()
    }
    grand = cube[(TOTAL, TOTAL)]
    assert grand.n_rows == orders.count()

    # 4. which parts anchor the co-purchase graph
    pr = pagerank(lineitem, "l_orderkey", "l_partkey", iterations=2)
    top = pr.orderBy(pr.pr.desc(), "node").limit(3).collect()
    assert len(top) == 3 and top[0].pr >= top[2].pr

    return {
        "funnel": funnel,
        "n_cohorts": len(sizes),
        "cube_cells": len(cube),
        "grand_total": float(grand.total),
        "top_part_pr": round(float(top[0].pr), 6),
    }


if __name__ == "__main__":
    print(main())
