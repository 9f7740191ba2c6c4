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


def test_result_and_job_management(spark, orders):
    from raise_featurestore_spark.analytics.analysis import Aggregation

    client = AnalyticsClient()
    spec = Aggregation(features=["o_totalprice"], metrics=["count"])
    r1 = client.analyze(orders, spec)
    r2 = client.analyze(orders, spec)
    assert client.get_result(r1.result_id) is r1
    assert len(client.list_results()) == 2
    assert client.delete_result(r1.result_id) is True
    assert client.delete_result(r1.result_id) is False
    assert len(client.list_results()) == 1
    # age the remaining result and prune by age
    old = client.list_results()[0]
    from datetime import datetime, timedelta, timezone

    old.created_at = (datetime.now(timezone.utc) - timedelta(days=10)).isoformat()
    assert client.delete_results(older_than_days=7) == 1
    assert client.list_results() == []

    job = client.analyze_async(orders, spec)
    job.wait(timeout=30)
    assert client.get_job(job.job_id) is job
    assert client.list_jobs(status="completed") == [job]
    assert client.cancel_job("nope") is False
    assert r2.result_id != r1.result_id


def test_store_job_registry_and_listings(spark, tmp_path):
    from raise_featurestore_spark.catalog.store import FeatureStore, NotFoundError
    from raise_featurestore_spark.transforms.job import Job, Target
    from raise_featurestore_spark.transforms.source import FileSystemSource
    from raise_featurestore_spark.transforms.transform import PythonTransform
    import pytest as _pytest

    src = str(tmp_path / "src")
    spark.range(0, 5).selectExpr("id", "id * 1.0 AS v").write.parquet(src)

    fs = FeatureStore(str(tmp_path / "cat"))
    fs.create_organization("acme")
    fs.create_domain("acme", "ml")
    fs.create_project("acme", "ml", "p1")
    fs.create_project("acme", "ml", "p2")
    assert fs.list_organizations() == ["acme"]
    assert fs.list_domains("acme") == ["ml"]
    assert fs.list_projects_in("acme", "ml") == ["p1", "p2"]

    job = Job(
        job_id="daily-agg",
        sources={"src": FileSystemSource(path=src)},
        transform=PythonTransform(lambda ctx, df: df),
        target=Target(path=str(tmp_path / "out"), write_mode="overwrite"),
    )
    fs.deploy_job(job)  # registers + deploys
    assert fs.list_jobs() == ["daily-agg"]
    assert fs.list_jobs(status="active") == ["daily-agg"]
    run = fs.trigger_job(spark, "daily-agg")
    assert run.status == "completed" and run.rows_written == 5
    with _pytest.raises(NotFoundError):
        fs.get_job("missing")
    # the registry is shared across re-scoped views
    assert fs.with_context("acme", "ml", "p1").list_jobs() == ["daily-agg"]
    # job lifecycle audit entries exist
    acts = {e.action for e in fs.audit.query(actions=["*job*"], limit=50)}
    assert {"register_job", "deploy_job", "trigger_job"} <= acts
