"""Example: the full analytics surface — every analysis type, freshness
cache, async jobs, live tables, alerts, dashboards. (parity with reference
examples/06_analytics.py, written against this engine's API)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main(sf_dir: str = SF_DIR) -> dict:
    from pyspark.sql import functions as F

    from raise_featurestore_spark.analytics.alert import AnalyticsAlert, Condition, Op
    from raise_featurestore_spark.analytics.analysis import (
        Aggregation, Correlation, DataQuality, Distribution, Drift, RecordLookup, StatTest,
    )
    from raise_featurestore_spark.analytics.dashboard import Chart, Dashboard, Parameter
    from raise_featurestore_spark.analytics.freshness import within
    from raise_featurestore_spark.analytics.result import AnalyticsClient
    from raise_featurestore_spark.analytics.router import compile_analysis
    from raise_featurestore_spark.session import get_spark
    from raise_featurestore_spark.streaming import LiveTable
    from raise_featurestore_spark.tables import load_table

    spark = get_spark("example-06")
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    client = AnalyticsClient()
    checks = {}

    # --- every analysis type, one line each ------------------------------
    agg = client.analyze(orders, Aggregation(
        features=["o_totalprice"], metrics=["count", "avg", "p95"],
        group_by="o_orderstatus"))
    checks["aggregation_rows"] = agg.row_count

    dist = client.analyze(orders, Distribution(
        feature="o_totalprice", metrics=["histogram", "cdf"], bins=10))
    checks["histogram_buckets"] = dist.row_count

    corr = client.analyze(events, Correlation(features=["value", "user_id"]))
    checks["correlation_cells"] = corr.row_count

    # spearman defaults to the grid-snapped matrix (broadcast rank maps —
    # the 100 TB path); exact=True opts into the row-level rank kernel
    sp = client.analyze(
        events, Correlation(features=["value", "user_id"], method="spearman")
    )
    sp_exact = client.analyze(
        events,
        Correlation(features=["value", "user_id"], method="spearman", exact=True),
    )
    checks["spearman_grid_cells"] = sp.row_count
    checks["spearman_exact_cells"] = sp_exact.row_count

    tt = client.analyze(events, StatTest(
        feature="value", test="welch", segment_by="event_type",
        control="view", treatment="purchase"))
    checks["welch_p_value"] = float(tt.value("p_value"))

    drift = client.analyze(orders, Drift(
        feature="o_totalprice", metrics=["psi", "kl_divergence"], bins=10,
        baseline_filter="o_orderstatus = 'F'", current_filter="o_orderstatus = 'O'"))
    checks["psi"] = float(drift.value("psi"))

    dq = client.analyze(orders, DataQuality(
        features=["o_totalprice"], checks=["completeness", "uniqueness"],
        key_columns=["o_orderkey"]))
    checks["quality_rows"] = dq.row_count

    top = client.analyze(orders, RecordLookup(
        features=["o_orderkey", "o_totalprice"], order_by="o_totalprice",
        descending=True, limit=5))
    checks["topk_rows"] = top.row_count

    # --- freshness cache: second call is a hit ---------------------------
    client.analyze(orders, Aggregation(
        features=["o_totalprice"], metrics=["count", "avg", "p95"],
        group_by="o_orderstatus"), freshness=within("1h"))
    checks["cache_hits"] = client.cache.stats()["hits"]

    # --- async job --------------------------------------------------------
    job = client.analyze_async(events, Correlation(features=["value", "user_id"]))
    checks["async_status"] = job.wait(120)

    # --- live table + query ----------------------------------------------
    mat = tempfile.mkdtemp(prefix="ex06_live_")
    os.rmdir(mat)
    lt = LiveTable(
        "status_rollup",
        lambda s: compile_analysis(
            load_table(s, sf_dir, "orders"),
            Aggregation(features=["o_totalprice"], metrics=["count", "sum"],
                        group_by="o_orderstatus")),
        mat,
    )
    ev = lt.refresh(spark)
    top_status = lt.query(spark, order_by="-sum_o_totalprice", limit=1).collect()
    checks["live_refresh"] = ev.status
    checks["live_top_status"] = top_status[0]["o_orderstatus"]

    # --- alert over the drift result --------------------------------------
    alert = AnalyticsAlert(
        name="price_drift",
        conditions=[Condition(None, Op.PSI_GT, 0.0)],
        fetch=lambda: compile_analysis(orders, Drift(
            feature="o_totalprice", metrics=["psi"], bins=10,
            baseline_filter="o_orderstatus = 'F'",
            current_filter="o_orderstatus = 'O'")).first().asDict(),
    )
    checks["alert_fired"] = alert.check().fired

    # --- dashboard ---------------------------------------------------------
    dash = Dashboard(
        name="orders_overview",
        parameters=[Parameter("status", "select", default="F", options=["F", "O", "P"])],
    ).add_chart(Chart(
        title="Revenue by status", chart_type="bar",
        spec=Aggregation(features=["o_totalprice"], metrics=["sum"],
                         group_by="o_orderstatus"),
        compute=lambda p: compile_analysis(
            orders, Aggregation(features=["o_totalprice"], metrics=["sum"],
                                group_by="o_orderstatus")).toPandas(),
        x="o_orderstatus", y="sum_o_totalprice"))
    page = dash.render()
    checks["dashboard_status"] = page["charts"][0]["status"]

    for k, v in checks.items():
        print(f"{k}: {v}")
    return checks


if __name__ == "__main__":
    main()
