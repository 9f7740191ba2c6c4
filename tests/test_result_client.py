"""AnalysisResult export, async AnalysisJob lifecycle, AnalyticsClient
freshness-cached execution."""

from __future__ import annotations

import json
import os

import pytest

from raise_featurestore_spark.analytics.analysis import Aggregation
from raise_featurestore_spark.analytics.freshness import REAL_TIME, within
from raise_featurestore_spark.analytics.result import AnalyticsClient

from tests.conftest import SF_DIR

SPEC = Aggregation(
    features=["o_totalprice"], metrics=["count", "sum", "avg"], group_by="o_orderstatus"
)


@pytest.fixture()
def orders(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))


def test_analyze_sync_and_export(orders, tmp_path):
    client = AnalyticsClient()
    res = client.analyze(orders, SPEC)
    assert res.row_count == 3
    pdf = res.to_dataframe()
    assert set(pdf.columns) == {
        "o_orderstatus", "count_o_totalprice", "sum_o_totalprice", "avg_o_totalprice"
    }

    payload = json.loads(res.to_json(str(tmp_path / "r.json")))
    assert len(payload["rows"]) == 3
    assert os.path.exists(tmp_path / "r.json")

    csv_text = res.to_csv(str(tmp_path / "r.csv"))
    assert csv_text.splitlines()[0].startswith("o_orderstatus")
    assert len(csv_text.splitlines()) == 4


def test_analyze_cache_respects_freshness(orders):
    client = AnalyticsClient()
    client.analyze(orders, SPEC, freshness=within("1h"))
    client.analyze(orders, SPEC, freshness=within("1h"))
    assert client.cache.stats() == {"hits": 1, "misses": 1, "entries": 1}
    client.analyze(orders, SPEC, freshness=REAL_TIME)
    assert client.cache.stats()["misses"] == 2


def test_analyze_async_lifecycle(orders):
    client = AnalyticsClient()
    job = client.analyze_async(orders, SPEC, freshness=REAL_TIME)
    assert job.wait(60) == "completed"
    res = job.result()
    assert res.row_count == 3
    assert res.value("count_o_totalprice", 0) > 0
    assert job.cancel() is False  # already done


def test_analyze_async_failure(spark, orders):
    client = AnalyticsClient()
    bad = Aggregation(features=["no_such_column"], metrics=["count"])
    job = client.analyze_async(orders, bad, freshness=REAL_TIME)
    assert job.wait(60) == "failed"
    with pytest.raises(RuntimeError, match="failed"):
        job.result()
