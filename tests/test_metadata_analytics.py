"""Metadata-plane analytics: alert conditions, freshness cache, dashboards
— wired to REAL Spark-computed results."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from raise_featurestore_spark.analytics.alert import (
    AnalyticsAlert,
    Condition,
    Op,
)
from raise_featurestore_spark.analytics.analysis import Aggregation, Drift
from raise_featurestore_spark.analytics.dashboard import (
    Chart,
    Dashboard,
    Parameter,
)
from raise_featurestore_spark.analytics.freshness import (
    CACHED,
    REAL_TIME,
    Freshness,
    ResultCache,
    within,
)

from tests.conftest import SF_DIR


# -------------------------------------------------------------- conditions

def test_condition_operators():
    r = {"psi": 0.3, "p_value": 0.01, "count": 5, "tags": ["a", "b"]}
    assert Condition("psi", Op.GT, 0.2).evaluate(r)
    assert not Condition("psi", Op.LT, 0.2).evaluate(r)
    assert Condition("count", Op.EQ, 5).evaluate(r)
    assert Condition("count", Op.NE, 4).evaluate(r)
    assert Condition("count", Op.GTE, 5).evaluate(r)
    assert Condition("count", Op.LTE, 5).evaluate(r)
    assert Condition("psi", Op.BETWEEN, 0.2, upper=0.4).evaluate(r)
    assert Condition("psi", Op.OUTSIDE, 0.4, upper=0.9).evaluate(r)
    assert Condition("tags", Op.CONTAINS, "a").evaluate(r)
    # domain shortcuts auto-bind their metric
    assert Condition(None, Op.PSI_GT, 0.2).evaluate(r)
    assert Condition(None, Op.P_VALUE_LT, 0.05).evaluate(r)
    with pytest.raises(ValueError, match="both"):
        Condition("psi", Op.BETWEEN, 0.2)
    with pytest.raises(KeyError):
        Condition("missing", Op.GT, 1).evaluate(r)


def test_alert_fires_on_real_drift(spark):
    """Alert over the real Drift analysis (orders F vs O)."""
    from raise_featurestore_spark.analytics.drift import compile_drift

    drift = Drift(
        feature="o_totalprice",
        metrics=["psi", "kl_divergence"],
        bins=10,
        baseline_filter="o_orderstatus = 'F'",
        current_filter="o_orderstatus = 'O'",
    )
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))

    def fetch():
        return compile_drift(orders, drift).first().asDict()

    fired_events = []
    alert = AnalyticsAlert(
        name="order_drift",
        conditions=[Condition(None, Op.PSI_GT, -1.0)],  # any psi fires
        fetch=fetch,
        notify=fired_events.append,
    )
    ev = alert.check()
    assert ev.fired
    assert len(fired_events) == 1
    assert "psi" in ev.observed

    quiet = AnalyticsAlert(
        name="no_fire", conditions=[Condition(None, Op.PSI_GT, 1e9)], fetch=fetch
    )
    assert not quiet.check().fired


# ---------------------------------------------------------------- freshness

def test_freshness_policies():
    assert not REAL_TIME.accepts(0.0)
    assert CACHED.accepts(1e9)
    w = within("1h")
    assert w.accepts(3599)
    assert not w.accepts(3601)
    with pytest.raises(ValueError):
        Freshness("sometimes")
    with pytest.raises(ValueError):
        Freshness("within")


def test_result_cache_hit_miss_expiry():
    clock = {"t": 1000.0}
    cache = ResultCache(_now=lambda: clock["t"])
    spec = Aggregation(features=["x"], metrics=["count"])
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return pd.DataFrame({"count_x": [calls["n"]]})

    r1 = cache.get_or_compute(spec, compute, within("1h"))
    r2 = cache.get_or_compute(spec, compute, within("1h"))
    assert calls["n"] == 1 and r2.equals(r1)  # hit

    clock["t"] += 7200
    cache.get_or_compute(spec, compute, within("1h"))
    assert calls["n"] == 2  # expired → recompute

    cache.get_or_compute(spec, compute, REAL_TIME)
    assert calls["n"] == 3  # real_time never accepts

    cache.get_or_compute(spec, compute, CACHED)
    assert calls["n"] == 3  # cached always accepts
    assert cache.stats()["hits"] == 2

    # different spec → different key
    other = Aggregation(features=["y"], metrics=["count"])
    cache.get_or_compute(other, compute, CACHED)
    assert calls["n"] == 4

    cache.invalidate(spec)
    cache.get_or_compute(spec, compute, CACHED)
    assert calls["n"] == 5


def test_cache_key_stability():
    a = Aggregation(features=["x"], metrics=["count"], group_by="g")
    b = Aggregation(features=["x"], metrics=["count"], group_by="g")
    c = Aggregation(features=["x"], metrics=["sum"], group_by="g")
    assert a.cache_key() == b.cache_key()
    assert a.cache_key() != c.cache_key()


# ---------------------------------------------------------------- dashboard

def test_dashboard_render_with_cache_and_params(spark):
    from raise_featurestore_spark.analytics.aggregation import compile_aggregation

    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    spec = Aggregation(features=["o_totalprice"], metrics=["count", "sum"],
                       group_by="o_orderstatus")
    calls = {"n": 0}

    def compute(params):
        calls["n"] += 1
        df = orders
        if params.get("status"):
            df = df.where(F.col("o_orderstatus") == params["status"])
        return compile_aggregation(df, spec).toPandas()

    dash = Dashboard(
        name="orders",
        parameters=[Parameter("status", "select", default=None, options=["F", "O", "P"])],
    ).add_chart(
        Chart(title="Revenue by status", chart_type="bar", spec=spec,
              compute=compute, x="o_orderstatus", y="sum_o_totalprice")
    )

    page = dash.render()
    assert page["charts"][0]["status"] == "ok"
    assert len(page["charts"][0]["data"]) == 3
    assert calls["n"] == 1

    page2 = dash.render()  # cache hit: same spec, same params
    assert calls["n"] == 1
    assert page2["charts"][0]["data"] == page["charts"][0]["data"]

    # regression: different parameter bindings must MISS the cache — the key
    # includes resolved params, not just the chart spec
    page3 = dash.render(params={"status": "F"})
    assert calls["n"] == 2
    assert len(page3["charts"][0]["data"]) == 1
    page4 = dash.render(params={"status": "F"})  # hit under the same binding
    assert calls["n"] == 2
    assert page4["charts"][0]["data"] == page3["charts"][0]["data"]

    with pytest.raises(ValueError, match="not in options"):
        dash.render(params={"status": "Z"})


def test_dashboard_fails_soft():
    def boom(params):
        raise RuntimeError("backend down")

    dash = Dashboard(name="d").add_chart(
        Chart(title="x", chart_type="metric", spec="k1", compute=boom)
    )
    page = dash.render()
    assert page["charts"][0]["status"] == "error"
    assert "backend down" in page["charts"][0]["error"]


def test_chart_and_parameter_validation():
    with pytest.raises(ValueError, match="chart type"):
        Chart(title="x", chart_type="sankey", spec="s", compute=lambda p: None)
    with pytest.raises(ValueError, match="parameter type"):
        Parameter("p", "decimal")
    with pytest.raises(ValueError, match="options"):
        Parameter("p", "select")


def test_approx_percentiles_match_exact_within_tolerance(spark):
    from raise_featurestore_spark.analytics.aggregation import compile_aggregation
    from raise_featurestore_spark.analytics.analysis import Aggregation

    df = spark.range(0, 5000).selectExpr(
        "id % 4 AS seg", "CAST(id AS DOUBLE) AS v"
    )
    exact_spec = Aggregation(features=["v"], metrics=["median", "p90"], group_by="seg")
    approx_spec = Aggregation(
        features=["v"], metrics=["median", "p90"], group_by="seg",
        approx_percentiles=True, percentile_accuracy=10_000,
    )
    exact = {r.seg: (r.median_v, r.p90_v)
             for r in compile_aggregation(df, exact_spec).collect()}
    approx = {r.seg: (r.median_v, r.p90_v)
              for r in compile_aggregation(df, approx_spec).collect()}
    assert set(exact) == set(approx)
    for seg in exact:
        for e, a in zip(exact[seg], approx[seg]):
            # rank error <= n/accuracy = 5000/10000 => neighbouring values
            assert abs(e - a) <= 8.0
    # the sketch path must actually be approx_percentile in the plan
    plan = compile_aggregation(df, approx_spec)._jdf.queryExecution().toString()
    assert "approx_percentile" in plan


def test_approx_distinct_count_metric(spark):
    from raise_featurestore_spark.analytics.aggregation import compile_aggregation
    from raise_featurestore_spark.analytics.analysis import Aggregation

    df = spark.range(0, 20_000).selectExpr("id % 7 AS seg", "id % 9973 AS v")
    spec = Aggregation(features=["v"],
                       metrics=["distinct_count", "approx_distinct_count"],
                       group_by="seg")
    rows = compile_aggregation(df, spec).collect()
    assert len(rows) == 7
    for r in rows:
        exact = r.distinct_count_v
        approx = r.approx_distinct_count_v
        assert abs(approx - exact) / exact < 0.1  # HLL++ default rsd ~2.3%
    # the sketch, not Expand, is in the plan
    plan = compile_aggregation(
        df, Aggregation(features=["v"], metrics=["approx_distinct_count"])
    )._jdf.queryExecution().toString()
    assert "approx_count_distinct" in plan


def test_alert_condition_tolerates_null_metric():
    """A NULL observed metric (stat test over empty input) must evaluate
    as not-fired, not crash the alert sweep with a None comparison."""
    c = Condition(metric="p_value", op=Op.P_VALUE_LT, value=0.05)
    assert c.evaluate({"p_value": None}) is False
    assert c.evaluate({"p_value": 0.01}) is True


def test_windowed_aggregation_anchor_respects_filter(spark, ddb):
    """Regression: the SQL twin anchored MAX(ts) over the UNFILTERED table
    while the compiled plan anchors after the filter — different 7d slices
    whenever the filter excludes the newest rows."""
    import duckdb

    from raise_featurestore_spark.analytics.aggregation import (
        aggregation_to_sql,
        compile_aggregation,
    )
    from tests.conftest import assert_frames_match

    rows = [
        # 'click' rows end 2026-01-10; later 'view' rows would shift an
        # unfiltered anchor
        (i, "click", f"2026-01-{i:02d} 00:00:00", float(i)) for i in range(1, 11)
    ] + [(99, "view", "2026-01-20 00:00:00", 99.0)]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts_s string, value double"
    ).selectExpr("event_id", "event_type", "CAST(ts_s AS TIMESTAMP) AS ts", "value")
    spec = Aggregation(
        features=["value"], metrics=["count", "sum"], window="3d",
        time_column="ts", filter="event_type = 'click'",
    )
    con = duckdb.connect()
    con.register("t", df.toPandas())
    got = compile_aggregation(df, spec)
    want = con.sql(aggregation_to_sql(spec, "t")).df()
    assert_frames_match(got, want)
    # the filtered anchor is 01-10, so 3d covers 01-07..01-10 (4 rows)
    assert got.first()["count_value"] == 4


def test_distinct_plus_percentile_keeps_null_group(spark):
    """Regression: the split distinct path rejoined with an equi-join that
    dropped the NULL group."""
    from raise_featurestore_spark.analytics.aggregation import compile_aggregation

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), (None, 3.0), (None, 4.0)],
        "region string, value double",
    )
    spec = Aggregation(
        features=["value"], metrics=["p50", "distinct_count"], group_by="region"
    )
    out = compile_aggregation(df, spec)
    assert out.count() == 2  # 'a' AND the NULL group
    assert out.where(F.col("region").isNull()).count() == 1


def test_distribution_filter_with_feature_substring_literal(spark, ddb):
    """Regression: the SQL twin rewrote the filter with str.replace of the
    feature name, corrupting literals containing it ('v' in 'vip')."""
    import duckdb

    from raise_featurestore_spark.analytics.analysis import Distribution
    from raise_featurestore_spark.analytics.distribution import (
        compile_distribution,
        distribution_to_sql,
    )
    from tests.conftest import assert_frames_match

    rows = [(float(i), "vip" if i % 2 else "std") for i in range(20)]
    df = spark.createDataFrame(rows, "v double, tag string")
    spec = Distribution(feature="v", metrics=["histogram"], bins=4,
                        filter="tag = 'vip'")
    con = duckdb.connect()
    con.register("t", df.toPandas())
    assert_frames_match(
        compile_distribution(df, spec), con.sql(distribution_to_sql(spec, "t")).df()
    )


def test_correlation_oracle_applies_sample_size(spark, ddb):
    """Regression: pearson/spearman SQL twins ignored sample_size, so the
    oracle correlated the full table against Spark's sample."""
    import duckdb

    from raise_featurestore_spark.analytics.analysis import Correlation
    from raise_featurestore_spark.analytics.correlation import (
        compile_correlation,
        correlation_to_sql,
    )
    from tests.conftest import assert_frames_match

    rows = [(float(i), float((i * 13) % 50)) for i in range(500)]
    df = spark.createDataFrame(rows, "x double, y double")
    spec = Correlation(features=["x", "y"], method="pearson", sample_size=100)
    con = duckdb.connect()
    con.register("t", df.toPandas())
    assert_frames_match(
        compile_correlation(df, spec), con.sql(correlation_to_sql(spec, "t")).df()
    )


def test_label_balance_report_semantics(spark):
    """r8: entropy/gini/majority from exact counts; NULL labels are a
    real class; a constant-label group reads entropy 0 / gini 0 /
    majority 1."""
    import math

    from raise_featurestore_spark.analytics.profile import label_balance_report

    rows = (
        [("a", "en")] * 6 + [("a", "fr")] * 2 + [("a", None)] * 2
        + [("b", "en")] * 5
    )
    df = spark.createDataFrame(rows, "src string, lang string")
    got = {r.src: r for r in label_balance_report(df, "lang", group_by="src").collect()}
    a, b = got["a"], got["b"]
    assert a.n == 10 and a.n_classes == 3 and a.majority_share == 0.6
    want_ent = -(0.6 * math.log(0.6) + 0.2 * math.log(0.2) * 2)
    assert abs(a.entropy - want_ent) < 1e-6
    assert abs(a.gini - (1 - 0.36 - 0.04 - 0.04)) < 1e-6
    assert b.n == 5 and b.n_classes == 1 and b.majority_share == 1.0
    assert b.entropy == 0.0 and b.gini == 0.0


def test_label_balance_null_vs_literal_null_string(spark):
    """r8 ADVICE low: a genuine label value '<null>' must stay a class
    distinct from actual NULL labels (no string sentinel in the group
    key) — on BOTH engines."""
    import duckdb

    from raise_featurestore_spark.analytics.profile import (
        label_balance_report,
        label_balance_report_sql,
    )

    rows = [("<null>",)] * 3 + [(None,)] * 2 + [("en",)] * 5
    df = spark.createDataFrame(rows, "lang string")
    got = label_balance_report(df, "lang").first()
    assert got.n == 10 and got.n_classes == 3 and got.majority_share == 0.5

    con = duckdb.connect()
    con.register("t", df.toPandas())
    oracle = con.sql(label_balance_report_sql("t", "lang")).df().iloc[0]
    assert int(oracle.n) == 10 and int(oracle.n_classes) == 3
    assert float(oracle.majority_share) == 0.5
    assert abs(float(oracle.entropy) - got.entropy) < 1e-12
    assert abs(float(oracle.gini) - got.gini) < 1e-12
