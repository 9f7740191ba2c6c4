"""Example: cross-org access — grants with wildcard scopes + expiry,
plan-time enforcement, audit trail. (parity with reference
examples/04_cross_org_access.py, written against this engine's API)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main(sf_dir: str = SF_DIR) -> dict:
    from raise_featurestore_spark.catalog.acl import AccessDeniedError
    from raise_featurestore_spark.catalog.store import FeatureStore
    from raise_featurestore_spark.session import get_spark

    spark = get_spark("example-04")
    fs = FeatureStore(tempfile.mkdtemp(prefix="ex04_"))
    checks: dict = {}

    for org in ("acme", "partner"):
        fs.create_organization(org, if_exists="skip")
        fs.create_domain(org, "ml", if_exists="skip")
        fs.create_project(org, "ml", "core", if_exists="skip")

    # acme owns customer balances
    acme = fs.with_context("acme", "ml", "core")
    cust = acme.create_feature_group(
        "cust", entity_key="c_custkey",
        storage_path=os.path.join(sf_dir, "customer.parquet"))
    cust.create_feature("c_acctbal", "float64")

    # partner wants a derived feature over acme's data
    partner = fs.with_context("partner", "ml", "core")
    ords = partner.create_feature_group(
        "ords", entity_key="o_custkey",
        storage_path=os.path.join(sf_dir, "orders.parquet"))
    ords.create_feature("o_totalprice", "float64")
    ords.create_feature(
        "price_vs_balance", "float64",
        derived_from="o_totalprice / NULLIF(@acme/ml/core/cust.c_acctbal, 0)",
        validation_level="permissive")

    def try_read() -> str:
        try:
            ords.read(spark, ["price_vs_balance"]).limit(1).collect()
            return "allowed"
        except AccessDeniedError:
            return "denied"

    checks["before_grant"] = try_read()                      # denied
    grant = cust.grant_access("partner", features=["c_acct*"],
                              expires_at=time.time() + 3600)
    checks["after_grant"] = try_read()                       # allowed
    cust.revoke_access("partner")
    checks["after_revoke"] = try_read()                      # denied

    acl_events = [e for e in fs.audit.query(category="acl")]
    checks["acl_audit_events"] = len(acl_events)

    for k, v in checks.items():
        print(f"{k}: {v}")
    return checks


if __name__ == "__main__":
    main()
