"""Reference-example API parity: every method the reference's examples/
call on the public surface exists here with the same shape —
get_lineage().as_graph().to_ascii(), grant_external_access, dashboard
add_parameter, BlobRegistry list/validate, AcceleratorConfig cpu/tpu,
InferenceTransform with_gpu/with_batch_size, fs.transforms.use_airflow."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from raise_featurestore_spark.catalog.store import FeatureStore


@pytest.fixture()
def fs(tmp_path):
    fs = FeatureStore(str(tmp_path / "store"))
    fs.create_organization("acme")
    fs.create_domain("acme", "ml")
    fs.create_project("acme", "ml", "recsys")
    return fs.with_context("acme", "ml", "recsys")


def test_get_lineage_handle(fs):
    g = fs.create_feature_group("users", entity_key="uid")
    g.create_feature("clicks", "int64")
    g.create_feature("views", "int64")
    g.create_feature("ctr", "float64", derived_from="clicks / NULLIF(views, 0)")

    lin = g.get_lineage("ctr")
    assert set(lin.upstream) == {
        "acme/ml/recsys/users/clicks",
        "acme/ml/recsys/users/views",
    }
    assert lin.downstream == []
    assert lin.all_upstream() == lin.upstream  # depth-1 graph here
    ascii_art = lin.as_graph().to_ascii()
    assert "ctr" in ascii_art and "clicks" in ascii_art
    d = lin.to_dict()
    assert d["feature"].endswith("users/ctr") and len(d["upstream"]) == 2

    # downstream from a base feature's perspective
    up = g.get_lineage("clicks")
    assert any(x.endswith("users/ctr") for x in up.downstream)


def test_grant_external_access_reference_name(fs):
    g = fs.create_feature_group("users", entity_key="uid")
    g.create_feature("spend", "float64")
    grant = g.grant_external_access("partner-org", ["spend"], permission="read")
    assert grant.grantee_org == "partner-org" and grant.role == "reader"
    assert len(g.list_external_grants()) == 1


def test_dashboard_add_parameter_chainable():
    from raise_featurestore_spark.analytics.dashboard import Dashboard, Parameter

    d = Dashboard(name="ops")
    out = d.add_parameter(Parameter(name="seg", type="select", options=["a", "b"]))
    assert out is d and d.parameters[0].name == "seg"


def test_blob_registry_list_and_validate(spark):
    from raise_featurestore_spark.dataprep.multimodal import BlobRegistry

    df = spark.createDataFrame(
        [("s3://imgs/a.png", b"abc"), ("s3://docs/b.txt", b"defg")],
        "uri string, content binary",
    )
    reg = BlobRegistry.from_bytes(df, "uri", "content", content_type="image/png")
    assert reg.list_references(prefix="s3://imgs/").count() == 1
    assert reg.list_references(content_type="image/png").count() == 2
    assert reg.list_references(content_type="video/mp4").count() == 0

    v = {r["uri"]: r for r in reg.validate_batch().collect()}
    assert v["s3://imgs/a.png"]["valid"] and v["s3://docs/b.txt"]["valid"]
    assert v["s3://docs/b.txt"]["actual_size"] == 4

    # corrupt one blob: validation must actually detect it (the reference
    # mocks this to always-success)
    tampered = reg.refs.withColumn(
        "content", F.when(F.col("blob_ref.uri").endswith(".txt"), F.lit(b"XXXX")).otherwise(F.col("content"))
    )
    v2 = {r["uri"]: r["valid"] for r in reg.validate_batch(tampered).collect()}
    assert v2["s3://imgs/a.png"] is True and v2["s3://docs/b.txt"] is False


def test_accelerator_and_inference_builders():
    from raise_featurestore_spark.transforms.inference import (
        AcceleratorConfig,
        InferenceTransform,
        ModelSpec,
    )

    cpu = AcceleratorConfig.cpu(cores=8)
    assert cpu.accelerator == "cpu" and cpu.count_per_task == 8.0
    tpu = AcceleratorConfig.tpu("v4-8", count=2)
    assert tpu.accelerator == "tpu" and tpu.count_per_task == 2.0

    t = InferenceTransform(model=ModelSpec(uri="mem://m", loader=lambda u: None), input_columns=["x"])
    t2 = t.with_gpu("nvidia-a100", count=2).with_batch_size(512)
    assert t2.accelerator.accelerator == "gpu" and t2.accelerator.count_per_task == 2.0
    assert t2.batch.batch_size == 512 and t2.batch.dynamic is False
    # builders return copies — original untouched
    assert t.accelerator.accelerator == "cpu" and t.batch.batch_size != 512 or t.batch.batch_size == 1024


def test_transforms_client_engine_selection(fs, tmp_path):
    import os

    from raise_featurestore_spark.transforms.job import Job, Target
    from raise_featurestore_spark.transforms.schedule import CronSchedule
    from raise_featurestore_spark.transforms.source import FileSystemSource
    from raise_featurestore_spark.transforms.transform import SQLTransform
    from tests.conftest import SF_DIR

    job = Job(
        job_id="nightly",
        sources={"n": FileSystemSource(path=os.path.join(SF_DIR, "nation.parquet"))},
        transform=SQLTransform("SELECT * FROM n"),
        target=Target(path=str(tmp_path / "o"), write_mode="overwrite"),
    )
    tc = fs.transforms
    assert tc.engine == "internal"
    with pytest.raises(ValueError):
        tc.generate_definition(job)

    dag = tc.use_airflow(airflow_url="http://af:8080").generate_definition(
        job, CronSchedule("0 3 * * *")
    )
    assert "airflow" in dag and "'0 3 * * *'" in dag
    flow = tc.use_prefect().generate_definition(job)
    assert "prefect" in flow
    dg = tc.use_dagster().generate_definition(job)
    assert "dagster" in dg
    tc.use_internal()
    assert fs.transforms.engine == "internal"


def test_schedule_factory_constructors():
    from raise_featurestore_spark.transforms.schedule import (
        CronSchedule,
        IntervalSchedule,
        ManualSchedule,
        OnChangeSchedule,
        Schedule,
    )

    assert Schedule.daily(hour=2, minute=0) == CronSchedule("0 2 * * *")
    assert Schedule.hourly(minute=30) == CronSchedule("30 * * * *")
    assert Schedule.cron("*/5 * * * *").expression == "*/5 * * * *"
    assert isinstance(Schedule.every("15m"), IntervalSchedule)
    from datetime import timedelta

    assert Schedule.every(timedelta(minutes=10)).seconds == 600
    oc = Schedule.on_change(sources=["clicks"], debounce_seconds=30)
    assert isinstance(oc, OnChangeSchedule) and oc.watched_sources == ["clicks"]
    assert isinstance(Schedule.manual(), ManualSchedule)
    with pytest.raises(TypeError):
        Schedule()


def test_incremental_config_factories():
    from raise_featurestore_spark.transforms.checkpoint import (
        IncrementalConfig,
        IncrementalMode,
    )

    assert IncrementalConfig.full().mode == IncrementalMode.FULL
    c = IncrementalConfig.incremental("ts", lookback="2h")
    assert c.mode == IncrementalMode.INCREMENTAL and c.checkpoint_column == "ts"


def test_store_create_job_and_generate_dag(fs, spark, tmp_path):
    import os

    from raise_featurestore_spark.transforms.schedule import Schedule
    from raise_featurestore_spark.transforms.source import FileSystemSource
    from raise_featurestore_spark.transforms.transform import SQLTransform
    from tests.conftest import SF_DIR

    job = fs.create_job(
        "rollup",
        sources=FileSystemSource(path=os.path.join(SF_DIR, "region.parquet"), alias="r"),
        transform=SQLTransform("SELECT r_regionkey, COUNT(*) AS n FROM r GROUP BY 1"),
        target=str(tmp_path / "out"),
        schedule=Schedule.daily(hour=2),
    )
    assert fs.get_job("rollup") is job
    assert fs.list_jobs() == ["rollup"]
    run = fs.transforms.trigger(spark, "rollup")
    assert run.status == "completed"
    dag = fs.transforms.use_airflow().generate_dag("rollup")
    assert "featurestore_rollup" in dag and "'0 2 * * *'" in dag


def test_list_projects_with_tags(fs):
    base = fs.with_context("acme", "ml", None)
    fs.create_project("acme", "ml", "tagged", tags=["ml", "prod"])
    assert "tagged" in base.list_projects(tags=["ml"])
    assert base.list_projects(tags=["nope"]) == []
    # persisted across reload
    from raise_featurestore_spark.catalog.store import FeatureStore

    fs2 = FeatureStore(fs.path).with_context("acme", "ml")
    assert "tagged" in fs2.list_projects(tags=["prod"])


def test_dashboard_parameter_conveniences_and_publish(tmp_path):
    from raise_featurestore_spark.analytics.dashboard import (
        Dashboard,
        DashboardParameter,
    )

    d = Dashboard(name="ops")
    d.add_parameter(DashboardParameter.date_range("dr", label="Dates"))
    d.add_parameter(DashboardParameter.dropdown("tier", ["a", "b"], default="a"))
    url = d.publish(str(tmp_path))
    assert url.startswith("file://")
    import json

    spec = json.load(open(url[len("file://"):]))
    assert spec["parameters"][0]["type"] == "date_range"
    assert spec["parameters"][1]["options"] == ["a", "b"]


def test_blob_registry_integrity_policy_and_lookups(spark):
    from raise_featurestore_spark.dataprep.multimodal import (
        BlobRegistry,
        IntegrityPolicy,
        blob_refs_from_bytes,
    )

    df = spark.createDataFrame(
        [("s3://a/1", b"abc"), ("s3://a/2", b"defg")], "uri string, content binary"
    )
    reg = BlobRegistry.from_bytes(df, "uri", "content")
    assert reg.policy.mode == "on_write"

    # on_write: registering a tampered batch raises
    bad = blob_refs_from_bytes(
        spark.createDataFrame([("s3://a/3", b"x")], "uri string, content binary"),
        "uri", "content",
    ).withColumn("content", F.lit(b"TAMPERED"))
    with pytest.raises(ValueError, match="integrity"):
        reg.register(bad)
    # lazy policy lets it through
    reg_lazy = BlobRegistry.from_bytes(df, "uri", "content", policy=IntegrityPolicy.lazy())
    reg_lazy.register(bad)
    assert reg_lazy.refs.count() == 3

    row = reg.get_by_uri("s3://a/1")
    assert row is not None and row["blob_ref"]["size_bytes"] == 3
    assert reg.get_by_uri("s3://nope") is None

    listing = blob_refs_from_bytes(
        spark.createDataFrame(
            [("s3://a/1", b"abc"), ("s3://a/orphan", b"zz")], "uri string, content binary"
        ),
        "uri", "content",
    )
    orphans = [r["uri"] for r in reg.find_orphans(listing).collect()]
    assert orphans == ["s3://a/orphan"]

    import hashlib

    assert BlobRegistry.compute_checksum(b"abc") == hashlib.sha256(b"abc").hexdigest()


def test_group_create_live_table(fs, spark, tmp_path):
    from raise_featurestore_spark.analytics.analysis import Aggregation

    g = fs.create_feature_group("events_g", entity_key="eid")
    src = spark.createDataFrame(
        [(1, 10.0), (2, 30.0), (3, 50.0)], "eid long, v double"
    )
    g.write(src)

    lt = g.create_live_table(
        "v_summary",
        Aggregation(features=["v"], metrics=["count", "sum"]),
        refresh="manual",
        description="v rollup",
    )
    lt.refresh(spark)
    got = lt.query(spark).collect()[0]
    assert got["count_v"] == 3 and got["sum_v"] == 90.0
    assert lt.policy.mode == "manual" and lt.description == "v rollup"


def test_job_lifecycle_and_namespace_accessors(fs, tmp_path):
    import os

    from raise_featurestore_spark.transforms.job import Job, JobStatus, Target
    from raise_featurestore_spark.transforms.source import FileSystemSource
    from raise_featurestore_spark.transforms.transform import SQLTransform
    from tests.conftest import SF_DIR

    job = Job(
        job_id="lc",
        sources={"r": FileSystemSource(path=os.path.join(SF_DIR, "region.parquet"))},
        transform=SQLTransform("SELECT * FROM r"),
        target=Target(path=str(tmp_path / "o")),
    )
    assert job.status == JobStatus.DRAFT
    job.activate()
    assert job.status == JobStatus.ACTIVE
    job.pause()
    assert job.status == JobStatus.PAUSED
    job.resume()
    assert job.status == JobStatus.ACTIVE
    job.pause()
    job.deprecate()
    assert job.status == JobStatus.DEPRECATED
    with pytest.raises(ValueError):
        job.resume()

    assert fs.domain("ml").name == "ml"
    assert fs.project("recsys").name == "recsys"
    with pytest.raises(Exception):
        fs.domain("nope")


def test_codegen_sanitizes_non_identifier_job_ids(fs, tmp_path):
    """Review finding: a job id like 'daily-rollup' must still generate
    syntactically valid Airflow/Dagster/Prefect modules."""
    import os

    from raise_featurestore_spark.transforms.orchestrator import (
        generate_airflow_dag,
        generate_dagster_job,
        generate_prefect_flow,
    )
    from raise_featurestore_spark.transforms.job import Job, Target
    from raise_featurestore_spark.transforms.schedule import Schedule
    from raise_featurestore_spark.transforms.source import FileSystemSource
    from raise_featurestore_spark.transforms.transform import SQLTransform
    from tests.conftest import SF_DIR

    job = Job(
        job_id="daily-rollup.v2",
        sources={"r": FileSystemSource(path=os.path.join(SF_DIR, "region.parquet"))},
        transform=SQLTransform("SELECT * FROM r"),
        target=Target(path=str(tmp_path / "o")),
    )
    for gen in (generate_airflow_dag, generate_dagster_job, generate_prefect_flow):
        mod = gen(job, Schedule.daily(hour=1))
        compile(mod, "<gen>", "exec")  # would SyntaxError without sanitization


def test_dagster_interval_rejects_uneven_cadence():
    """Review finding: */N crons distort intervals that don't divide the
    clock period — those must be rejected, not silently rescheduled."""
    from raise_featurestore_spark.transforms.orchestrator import schedule_to_dagster
    from raise_featurestore_spark.transforms.schedule import IntervalSchedule

    assert schedule_to_dagster(IntervalSchedule("20m")) == "*/20 * * * *"
    assert schedule_to_dagster(IntervalSchedule("2h")) == "0 */2 * * *"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="distort|even cron"):
        schedule_to_dagster(IntervalSchedule("35m"))
    with _pytest.raises(ValueError, match="even cron"):
        schedule_to_dagster(IntervalSchedule("90m"))


def test_with_context_views_share_one_transforms_client(tmp_path):
    """Review finding: context views created before first .transforms
    access must still share one orchestrator registry."""
    from raise_featurestore_spark.catalog.store import FeatureStore

    fs = FeatureStore(str(tmp_path / "store"))
    fs.create_organization("o")
    fs.create_domain("o", "d")
    fs.create_project("o", "d", "p1")
    fs.create_project("o", "d", "p2")
    a = fs.with_context("o", "d", "p1")
    b = fs.with_context("o", "d", "p2")
    assert a.transforms is b.transforms is fs.transforms
