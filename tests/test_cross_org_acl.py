"""Plan-time cross-org ACL enforcement: a cross-org derived-feature
reference resolves only with a valid, unexpired grant covering the feature
(SURVEY §7 hard-item 5; reference examples/04_cross_org_access.py)."""

from __future__ import annotations

import os
import time

import pytest

from raise_featurestore_spark.catalog.acl import AccessDeniedError
from raise_featurestore_spark.catalog.store import FeatureStore

from tests.conftest import SF_DIR


@pytest.fixture()
def two_orgs(tmp_path):
    fs = FeatureStore(str(tmp_path / "cat"))
    for org in ("acme", "partner"):
        fs.create_organization(org, if_exists="skip")
        fs.create_domain(org, "ml", if_exists="skip")
        fs.create_project(org, "ml", "core", if_exists="skip")

    owner = fs.with_context("acme", "ml", "core")
    cust = owner.create_feature_group(
        "cust", entity_key="c_custkey",
        storage_path=os.path.join(SF_DIR, "customer.parquet"),
    )
    cust.create_feature("c_acctbal", "float64")
    cust.create_feature("c_nationkey", "int64")

    reader = fs.with_context("partner", "ml", "core")
    ords = reader.create_feature_group(
        "ords", entity_key="o_custkey",
        storage_path=os.path.join(SF_DIR, "orders.parquet"),
    )
    ords.create_feature("o_totalprice", "float64")
    return cust, ords


def _cross_org_read(spark, ords):
    ords.create_feature(
        "price_vs_balance", "float64",
        derived_from="o_totalprice / NULLIF(@acme/ml/core/cust.c_acctbal, 0)",
        if_exists="skip", validation_level="permissive",
    )
    return ords.read(spark, ["o_totalprice", "price_vs_balance"]).limit(1).collect()


def test_cross_org_denied_without_grant(spark, two_orgs):
    cust, ords = two_orgs
    with pytest.raises(AccessDeniedError, match="partner"):
        _cross_org_read(spark, ords)


def test_cross_org_allowed_with_grant_then_revoked(spark, two_orgs):
    cust, ords = two_orgs
    cust.grant_access("partner", features=["c_acctbal"])
    rows = _cross_org_read(spark, ords)
    assert len(rows) == 1

    # wildcard scope: a grant for other features does NOT cover this one
    assert cust.revoke_access("partner") == 1
    cust.grant_access("partner", features=["c_nation*"])
    with pytest.raises(AccessDeniedError):
        _cross_org_read(spark, ords)


def test_cross_org_expired_grant(spark, two_orgs):
    cust, ords = two_orgs
    cust.grant_access("partner", features=["*"], expires_at=time.time() - 10)
    with pytest.raises(AccessDeniedError):
        _cross_org_read(spark, ords)


def test_grants_persist_across_store_reload(spark, two_orgs, tmp_path):
    cust, ords = two_orgs
    cust.grant_access("partner", features=["*"])
    # reopen the catalog from disk: the grant must survive
    fs2 = FeatureStore(cust.store.path).with_context("partner", "ml", "core")
    ords2 = fs2.get_feature_group("ords")
    rows = _cross_org_read(spark, ords2)
    assert len(rows) == 1
