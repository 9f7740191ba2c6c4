"""Example-parity smoke tests: each example runs end-to-end on sf0.001
(the reference's de-facto test strategy is executable examples, SURVEY §5)."""

from __future__ import annotations

import importlib.util
import os

import pytest

from tests.conftest import SF_DIR

_EX_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")


def _load(name: str):
    path = os.path.join(_EX_DIR, name)
    spec = importlib.util.spec_from_file_location(name.removesuffix(".py"), path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_example_derived_features(spark):
    out = _load("02_derived_features.py").main(SF_DIR)
    assert out["rows"] > 0
    assert out["rejected"] is True
    assert out["version"] == 2


def test_example_cross_org(spark):
    out = _load("04_cross_org_access.py").main(SF_DIR)
    assert out["before_grant"] == "denied"
    assert out["after_grant"] == "allowed"
    assert out["after_revoke"] == "denied"
    assert out["acl_audit_events"] >= 2


def test_example_analytics(spark):
    out = _load("06_analytics.py").main(SF_DIR)
    assert out["aggregation_rows"] == 3
    assert 0.0 <= out["welch_p_value"] <= 1.0
    assert out["cache_hits"] >= 1
    assert out["async_status"] == "completed"
    assert out["live_refresh"] == "completed"
    assert out["alert_fired"] in (True, False)
    assert out["dashboard_status"] == "ok"


def test_example_transformations(spark):
    out = _load("07_transformations.py").main(SF_DIR)
    assert out["sql_job"] == "completed"
    assert out["rows_written"] == 25
    assert out["quality_passed"] is True
    assert out["incremental_first"] > 0
    assert out["checkpoint_advanced"] is True
    assert out["quality_gate"] == "failed"
    assert out["airflow_dag_lines"] > 10


def test_example_basic_feature_creation(spark):
    out = _load("01_basic_feature_creation.py").main(SF_DIR)
    assert out["n_features"] == 6
    assert out["lookup_rows"] == 3
    assert out["idempotent_version"] == 1
    assert out["entity_key"] == "user_id"


def test_example_bulk_operations(spark):
    out = _load("03_bulk_operations.py").main(SF_DIR)
    assert out["schema_features"] == 4
    assert out["list_features"] == 5
    assert out["yaml_features"] == 3
    assert out["derived_count"] == 2
    assert out["embedding_hits"] >= 4
    assert out["dim512_hits"] == 2
    assert out["versions"] == [1, 2]


def test_example_audit_logging(spark):
    out = _load("05_audit_logging.py").main(SF_DIR)
    assert out["total_entries"] > 0
    assert out["schema_changes"] >= 6
    assert out["acl_changes"] >= 2
    assert out["alert_fired"] >= 1
    assert out["alerts_after_delete"] == 1
    assert out["exported"] > 0
    assert all(b <= 3 for b in out["stream_batches"])
    assert out["page1"] == 5 and out["page2"] == 5
    assert out["retention_days"] == 365


def test_example_multimodal(spark):
    out = _load("08_multimodal.py").main(SF_DIR)
    assert out["typed_blob_ref"] == "blob_ref<image/png|image/jpeg>"
    assert out["scanned"] == 6
    assert out["byte_feature_rows"] == 20
    assert out["frame_rows"] == 60
    assert out["decode_stubbed"] is True
    assert out["integrity_issues"] == {"missing": 2}
    assert out["checksum_mismatches"] == 0


def test_example_bulk_inference(spark):
    out = _load("09_bulk_inference.py").main(SF_DIR)
    assert out["scored"] == 500
    assert out["degraded_nulls"] == 500
    assert out["max_abs_normed"] <= 1.0 + 1e-9
    assert out["decorated"] == 500
    assert out["gpu_confs"]["spark.task.resource.gpu.amount"] == "1.0"


@pytest.mark.slow
def test_example_training_pipeline(spark):
    out = _load("10_training_pipeline.py").main(SF_DIR)
    assert out["raw"] == 525
    assert out["deduped"] == 500  # 25 injected re-fetches dropped
    assert out["quality_kept"] <= out["deduped"]
    assert out["decontaminated"] <= out["quality_kept"]  # benchmark leaks dropped
    assert out["sampled"] < out["decontaminated"]  # non-en halved
    assert out["train_chunks"] > 0
    assert out["written"] == out["sampled"]
    assert set(out["split_counts"]) == {"train", "val", "test"}
    assert sum(out["split_counts"].values()) == out["sampled"]
    assert out["partitions"] == ["test", "train", "val"]


def test_example_governed_ingestion(spark):
    out = _load("11_governed_ingestion.py").main(SF_DIR)
    assert out["jdbc_rows"] > 0
    assert out["stored"] == 2
    assert out["wrong_dim_rejected"] is True
    assert out["sources"] > 0 and out["mixed_rows"] > 0


def test_example_corpus_finishing(spark):
    out = _load("12_corpus_finishing.py").main(SF_DIR)
    assert out["mined_grams"] > 0
    assert 0 < out["selected_docs"]
    assert 0 < out["tokens_used"] <= 5_000
    assert out["chunks"] >= out["selected_docs"]
    assert out["shards"] <= 8


def test_example_retrieval_training_set(spark):
    out = _load("13_retrieval_training_set.py").main(SF_DIR)
    assert out["train_rows"] > 0
    assert 0 < out["feature_coverage"] <= 1.0
    # every query returns a full k=8 neighbor list on the synthetic corpus
    assert out["neighbor_rows"] == 16 * 8
    # nprobe=3/8 on near-uniform vectors: observed ~0.6-0.8; alert floor
    assert out["recall_at_8"] >= 0.2


def test_example_feature_engineering(spark):
    out = _load("14_feature_engineering.py").main(SF_DIR)
    assert out["event_rows"] > 0
    assert set(out["splits"]) == {"train", "val", "test"}
    assert out["splits"]["train"] > out["splits"]["val"]
    assert out["train_bins"] >= 8


def test_example_product_analytics(spark):
    out = _load("15_product_analytics.py").main(SF_DIR)
    f = out["funnel"]
    assert f["signup"] >= f["view"] >= f["purchase"] >= 0
    assert out["n_cohorts"] > 0 and out["cube_cells"] > 4
    assert out["grand_total"] > 0


def test_example_dashboard_live_metrics(spark):
    out = _load("16_dashboard_live_metrics.py").main(SF_DIR)
    assert out["charts_ok"] == 3
    assert out["rev_f_count"] < out["rev_all_count"]
    assert out["live_rows"] == 3 and out["history_events"] == 2
    assert out["published"].startswith("file://")
