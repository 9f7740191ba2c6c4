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
