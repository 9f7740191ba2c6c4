"""VersionDiff: catalog version resolution + schema/stats/drift report."""

from __future__ import annotations

import os

import pytest

from raise_featurestore_spark.analytics.analysis import VersionDiff
from raise_featurestore_spark.analytics.version_diff import version_diff_report
from raise_featurestore_spark.catalog.store import FeatureStore

from tests.conftest import SF_DIR


@pytest.fixture()
def events_group(tmp_path):
    fs = FeatureStore(str(tmp_path / "cat")).with_context("org", "dom", "proj")
    fs.create_organization("org", if_exists="skip")
    fs.create_domain("org", "dom", if_exists="skip")
    fs.create_project("org", "dom", "proj", if_exists="skip")
    g = fs.create_feature_group(
        "ev", entity_key="event_id",
        storage_path=os.path.join(SF_DIR, "events.parquet"),
    )
    g.create_feature("value", "float64")
    # v1: raw score; v2: recalibrated (same name → new immutable version)
    g.create_feature("score", "float64", derived_from="value * 2")
    g.create_feature("score", "float64", derived_from="value * 2 + 5", if_exists="update")
    return g


def test_version_diff_report_schema_and_metrics(spark, events_group):
    spec = VersionDiff(
        feature="score", from_version="v1", to_version="v2",
        compare=["schema", "statistics", "distribution"], bins=8,
    )
    rep = version_diff_report(events_group, spark, spec)
    assert rep["schema_changes"] == {
        "derived_from": {"from": "value * 2", "to": "value * 2 + 5"}
    }
    m = rep["metrics"]
    assert m["count_from"] == m["count_to"]
    # v2 = v1 + 5 exactly: mean shifts by 5, stddev unchanged
    assert m["mean_to"] - m["mean_from"] == pytest.approx(5.0, abs=1e-6)
    assert m["stddev_from"] == pytest.approx(m["stddev_to"], abs=1e-3)
    # constant shift changes the histogram → nonzero divergence
    assert m["psi"] > 0
    assert m["kl_divergence"] >= 0


def test_version_diff_identical_versions_no_drift(spark, events_group):
    spec = VersionDiff(
        feature="value", from_version="v1", to_version="v1",
        compare=["statistics", "distribution"], bins=8,
    )
    rep = version_diff_report(events_group, spark, spec)
    m = rep["metrics"]
    assert m["mean_change_pct"] == pytest.approx(0.0, abs=1e-9)
    assert m["psi"] == pytest.approx(0.0, abs=1e-6)
    assert m["js_divergence"] == pytest.approx(0.0, abs=1e-6)


def test_version_diff_requires_comparison():
    from raise_featurestore_spark.analytics.version_diff import compile_version_diff

    spec = VersionDiff(feature="x", from_version="v1", to_version="v2", compare=[])
    with pytest.raises(ValueError, match="nothing to compare"):
        compile_version_diff(None, spec, None, None)
