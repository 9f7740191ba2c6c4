"""Example: audit logging — querying, filtering, alerts, streaming export,
retention config, pagination. (parity with reference
examples/05_audit_logging.py:1-314, written against this engine's API;
run: python examples/05_audit_logging.py)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main(sf_dir: str = SF_DIR, catalog_dir: str | None = None) -> dict:
    from raise_featurestore_spark.catalog.acl import ACL
    from raise_featurestore_spark.catalog.audit import AuditQuery
    from raise_featurestore_spark.catalog.store import FeatureStore

    fs = FeatureStore(catalog_dir or tempfile.mkdtemp(prefix="ex05_"))
    fs = fs.with_context("acme", "mlplatform", "recommendation")
    fs.create_organization("acme", if_exists="skip")
    fs.create_domain("acme", "mlplatform", if_exists="skip")
    fs.create_project("acme", "mlplatform", "recommendation", if_exists="skip")

    # --- alerts are standing queries: set them up FIRST ------------------
    external_alert = fs.audit.create_alert(
        name="external-feature-access",
        query=AuditQuery(category="acl", actions=["grant_*", "revoke_*"]),
        notify=["security@example.invalid"],
        channels=["email", "slack"],
    )
    fs.audit.create_alert(
        name="sensitive-data-access",
        query=AuditQuery(resource="*revenue*"),
        notify=["compliance@example.invalid"],
    )

    # --- generate audit events -------------------------------------------
    user_signals = fs.create_feature_group(
        "user-signals", entity_key="user_id", if_exists="skip",
    )
    user_signals.create_features_from_schema({
        "click_count": "int64",
        "impression_count": "int64",
        "user_embedding": "float32[8]",
        "revenue": "float64",
    }, if_exists="skip")
    user_signals.create_feature(
        "ctr", dtype="float64",
        derived_from="click_count / NULLIF(impression_count, 0)", if_exists="skip",
    )
    user_signals.set_acl(ACL(readers={"ml-engineers"}, writers={"ml-team"}))
    user_signals.grant_access("partner-org", features=["click_count"])

    # --- querying: wildcard resource, action filters, since --------------
    week_ago = time.time() - 7 * 86400
    recent = fs.audit.query(resource="*user-signals*", since=week_ago, limit=100)
    print(f"user-signals entries this week: {recent.total_count}")

    schema_changes = fs.audit.query(
        resource="*user-signals*", actions=["create_*"], since=week_ago
    )
    acl_changes = fs.audit.query(category="acl", since=week_ago)

    # --- alert results ----------------------------------------------------
    assert len(external_alert.fired) >= 1  # the grant_access call matched
    alerts = fs.audit.list_alerts()
    fs.audit.delete_alert("sensitive-data-access")

    # --- export (filtered) + streaming export ----------------------------
    export_path = os.path.join(tempfile.mkdtemp(prefix="ex05x_"), "audit.jsonl")
    n_exported = fs.audit.export(export_path, fmt="jsonl",
                                 query=AuditQuery(category="catalog"))
    batches = []
    with fs.audit.stream(AuditQuery(since=week_ago)) as stream:
        for batch in stream.batches(size=3):
            batches.append(len(batch))

    # --- org-level audit retention config --------------------------------
    org = fs.organization("acme")
    cfg = org.set_audit_config(retention_days=365, immutable=True,
                               export_destination="/tmp/audit-archive")
    got = org.get_audit_config()
    assert got.retention_days == 365 and got.immutable

    # --- pagination -------------------------------------------------------
    page1 = fs.audit.query(resource="*", limit=5)
    page2 = (fs.audit.query(resource="*", limit=5, cursor=page1.next_cursor)
             if page1.has_more else None)

    os.remove(export_path)
    return {
        "total_entries": recent.total_count,
        "schema_changes": schema_changes.total_count,
        "acl_changes": acl_changes.total_count,
        "alert_fired": len(external_alert.fired),
        "alerts_after_delete": len(fs.audit.list_alerts()),
        "exported": n_exported,
        "stream_batches": batches,
        "page1": len(page1),
        "page2": len(page2) if page2 else 0,
        "retention_days": got.retention_days,
    }


if __name__ == "__main__":
    print(main())
