from __future__ import annotations

import pytest

from raise_featurestore_spark.catalog.acl import (
    ACL,
    AccessDeniedError,
    ExternalGrant,
    check_access,
)
from raise_featurestore_spark.catalog.store import AlreadyExistsError, FeatureStore
from raise_featurestore_spark.expressions.compiler import ExpressionError


@pytest.fixture()
def fs(tmp_path):
    fs = FeatureStore(str(tmp_path / "store"))
    fs.create_organization("acme")
    fs.create_domain("acme", "ml")
    fs.create_project("acme", "ml", "recsys")
    return fs.with_context("acme", "ml", "recsys")


def test_if_exists_semantics(fs):
    fs.create_organization("acme", if_exists="skip")
    with pytest.raises(AlreadyExistsError):
        fs.create_organization("acme")
    fs.create_organization("acme", description="updated", if_exists="update")


def test_feature_versioning(fs):
    g = fs.create_feature_group("users", entity_key="user_id")
    f1 = g.create_feature("spend", "float64")
    assert f1.version == 1 and f1.physical_column == "spend"
    f2 = g.create_feature("spend", "float64", if_exists="update")
    assert f2.version == 2 and f2.physical_column == "spend__v2"
    assert g.get_feature("spend").version == 2  # latest wins
    assert g.get_feature("spend@v1").version == 1


def test_derived_feature_validation(fs):
    g = fs.create_feature_group("users", entity_key="user_id")
    g.create_feature("spend", "float64")
    d = g.create_feature("spend2x", "float64", derived_from="spend * 2")
    assert d.is_derived
    with pytest.raises(ExpressionError):
        g.create_feature("bad", "float64", derived_from="nonexistent * 2")


def test_lineage_and_cycles(fs):
    g = fs.create_feature_group("users", entity_key="user_id")
    g.create_feature("a", "float64")
    g.create_feature("b", "float64", derived_from="a * 2")
    g.create_feature("c", "float64", derived_from="b + a")
    qn = "acme/ml/recsys/users/"
    assert fs.lineage.all_upstream(qn + "c") == {qn + "a", qn + "b"}
    assert fs.lineage.all_downstream(qn + "a") == {qn + "b", qn + "c"}


def test_persistence_round_trip(fs, tmp_path):
    g = fs.create_feature_group("users", entity_key="user_id")
    g.create_feature("spend", "float64", tags={"pii": "no"})
    g.create_feature("spend2x", "float64", derived_from="spend * 2")

    fs2 = FeatureStore(fs.path).with_context("acme", "ml", "recsys")
    g2 = fs2.get_feature_group("users")
    assert g2.get_feature("spend").tags == {"pii": "no"}
    assert g2.get_feature("spend2x").derived_from == "spend * 2"


def test_search_features(fs):
    g = fs.create_feature_group("users", entity_key="user_id")
    g.create_feature("user_embedding", "float32[64]")
    g.create_feature("spend", "float64")
    hits = fs.search_features("embedding")
    assert len(hits) == 1 and "user_embedding" in hits[0]["qualified_name"]
    hits = fs.search_features(dtype="float32[[]64]")  # fnmatch needs [ escaped
    assert len(hits) == 1


def test_audit_log(fs):
    g = fs.create_feature_group("users", entity_key="user_id")
    g.create_feature("spend", "float64")
    page = fs.audit.query(category="catalog", resource="*users*")
    actions = {e.action for e in page}
    assert "create_feature_group" in actions and "create_feature" in actions
    assert page.total_count >= 2 and not page.has_more


def test_acl():
    acl = ACL()
    acl.grant("alice", "admin")
    acl.grant("bob", "reader")
    assert acl.allows("alice", "reader")  # implication chain
    assert not acl.allows("bob", "writer")
    merged = acl.merge(ACL(readers={"carol"}))
    assert merged.allows("carol", "reader")


def test_external_grant_expiry_and_wildcards():
    g = ExternalGrant(grantee_org="partner", features=["emb_*"], role="reader",
                      expires_at=None)
    check_access(ACL(), [g], "partner", "acme", "emb_user", "reader")
    with pytest.raises(AccessDeniedError):
        check_access(ACL(), [g], "partner", "acme", "spend", "reader")
    expired = ExternalGrant(grantee_org="partner", expires_at=1.0)
    with pytest.raises(AccessDeniedError):
        check_access(ACL(), [expired], "partner", "acme", "emb_user", "reader")


def test_end_to_end_derived_read(fs, spark, tmp_path):
    g = fs.create_feature_group("users", entity_key="user_id")
    g.create_feature("spend", "float64")
    g.create_feature("tier", "string")
    g.create_feature(
        "spend_z", "float64", derived_from="(spend - AVG(spend)) / STDDEV(spend)"
    )
    g.create_feature(
        "tier_bonus", "float64",
        derived_from="CASE WHEN tier = 'gold' THEN spend * 2 ELSE spend END",
    )
    df = spark.createDataFrame(
        [(1, 10.0, "gold"), (2, 20.0, "silver"), (3, 30.0, "gold")],
        ["user_id", "spend", "tier"],
    )
    g.write(df, mode="overwrite")
    out = g.read(spark, ["spend", "spend_z", "tier_bonus"]).orderBy("user_id").collect()
    assert [round(r.tier_bonus, 1) for r in out] == [20.0, 20.0, 60.0]
    assert abs(out[1].spend_z) < 1e-9  # middle value is the mean
    # point lookup
    got = g.get(spark, [1, 3]).orderBy("user_id").collect()
    assert [r.user_id for r in got] == [1, 3]


def test_cross_group_join_expression(fs, spark):
    users = fs.create_feature_group("users", entity_key="uid")
    users.create_feature("user_emb", "float32[4]")
    items = fs.create_feature_group("item-signals", entity_key="uid")
    items.create_feature("item_emb", "float32[4]")

    udf_ = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])], ["uid", "user_emb"]
    )
    idf = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0, 0.0])], ["uid", "item_emb"]
    )
    users.write(udf_, mode="overwrite")
    items.write(idf, mode="overwrite")

    from raise_featurestore_spark.functions.vector import register_sql_functions

    register_sql_functions(spark)
    users.create_feature(
        "affinity", "float64", derived_from="DOT(user_emb, item-signals.item_emb)"
    )
    rows = users.read(spark, ["affinity"]).orderBy("uid").collect()
    assert [r.affinity for r in rows] == [1.0, 0.0]


# -- bulk creation + listing (reference: examples/03) -----------------------


def test_bulk_create_from_schema_and_list(fs):
    g = fs.create_feature_group("emb", entity_key="id")
    feats = g.create_features_from_schema(
        {"e1": "float32[8]", "e2": "float32[16]"}, if_exists="skip"
    )
    assert [f.name for f in feats] == ["e1", "e2"]
    # idempotent re-run returns existing
    again = g.create_features_from_schema({"e1": "float32[8]"}, if_exists="skip")
    assert again[0].version == 1
    assert [f.name for f in g.list_features()] == ["e1", "e2"]


def test_bulk_create_from_specs_with_derived_and_tags(fs):
    g = fs.create_feature_group("user-features", entity_key="uid")
    feats = g.create_features(
        [
            {"name": "total_revenue", "dtype": "float64", "default": 0.0},
            {"name": "total_purchases", "dtype": "int64", "tags": ["core"]},
            {
                "name": "revenue_per_purchase",
                "dtype": "float64",
                "derived_from": "total_revenue / NULLIF(total_purchases, 0)",
                "tags": ["derived"],
            },
        ]
    )
    assert len(feats) == 3 and feats[2].is_derived
    assert [f.name for f in g.list_features(tags=["derived"])] == ["revenue_per_purchase"]
    # bad spec fails before anything is created
    g2 = fs.create_feature_group("other", entity_key="uid")
    with pytest.raises(Exception):
        g2.create_features([{"name": "ok", "dtype": "int64"}, {"dtype": "int64"}])
    assert g2.list_features() == []


def test_bulk_create_from_yaml_file(fs, tmp_path):
    manifest = tmp_path / "features.yaml"
    manifest.write_text(
        "features:\n"
        "  - name: click_count\n    dtype: int64\n    tags: [engagement]\n"
        "  - name: impression_count\n    dtype: int64\n"
        "  - name: ctr\n    dtype: float64\n"
        "    derived_from: click_count / NULLIF(impression_count, 0)\n"
    )
    g = fs.create_feature_group("engagement", entity_key="uid")
    feats = g.create_features_from_file(str(manifest), if_exists="skip")
    assert [f.name for f in feats] == ["click_count", "impression_count", "ctr"]
    assert g.get_feature("ctr").is_derived


def test_path_syntax_and_get_or_create(fs):
    fs.create_feature_group("signals", entity_key="uid")
    f = fs.create_feature("signals/score", dtype="float64")
    assert fs.feature("signals/score").name == "score"
    same = fs.get_feature_group("signals").get_or_create_feature("score", "float64")
    assert same.version == f.version
    versions = fs.get_feature_group("signals").list_versions("score")
    assert [v.version for v in versions] == [1]


def test_group_acl_persistence(fs, tmp_path):
    g = fs.create_feature_group("guarded", entity_key="uid")
    acl = ACL(readers={"ml-engineers"}, writers={"ml-team"})
    g.set_acl(acl)
    # reload from disk: acl round-trips
    fs2 = FeatureStore(fs.path).with_context("acme", "ml", "recsys")
    g2 = fs2.get_feature_group("guarded")
    assert g2.get_acl().allows("ml-engineers", "reader")
    assert g2.get_acl().allows("ml-team", "reader")  # writer implies reader
    assert not g2.get_acl().allows("stranger", "reader")


# -- audit alerts / streaming / pagination / config (reference: examples/05) --


def test_audit_alerts_and_stream(fs):
    from raise_featurestore_spark.catalog.audit import AuditQuery

    alert = fs.audit.create_alert(
        "acl-changes",
        AuditQuery(category="acl"),
        notify=["security@example.invalid"],
        channels=["email"],
    )
    g = fs.create_feature_group("watched", entity_key="uid")
    g.grant_access("partner")
    g.revoke_access("partner")
    assert len(alert.fired) == 2
    assert {e.action for e in alert.fired} == {"grant_access", "revoke_access"}
    assert fs.audit.get_alert("acl-changes") is alert
    assert [a.name for a in fs.audit.list_alerts()] == ["acl-changes"]
    assert fs.audit.delete_alert("acl-changes") is True
    assert fs.audit.delete_alert("acl-changes") is False

    with fs.audit.stream(AuditQuery(category="catalog")) as stream:
        batches = list(stream.batches(size=2))
    flat = [e for b in batches for e in b]
    assert all(len(b) <= 2 for b in batches)
    assert {e.category for e in flat} == {"catalog"}


def test_audit_pagination_and_actions_filter(fs):
    for i in range(7):
        fs.audit.log("data", "write_append", f"t{i}")
    page1 = fs.audit.query(category="data", actions=["write_*"], limit=3)
    assert len(page1) == 3 and page1.has_more and page1.total_count == 7
    page2 = fs.audit.query(category="data", actions=["write_*"], limit=99,
                           cursor=page1.next_cursor)
    assert len(page2) == 4 and not page2.has_more


def test_org_audit_config_roundtrip(fs):
    org = fs.organization("acme")
    cfg = org.set_audit_config(retention_days=30, immutable=True,
                               export_destination="/tmp/audit-archive")
    assert cfg.retention_days == 30
    fs2 = FeatureStore(fs.path)
    got = fs2.organization("acme").get_audit_config()
    assert got.retention_days == 30 and got.immutable is True
    assert got.export_destination == "/tmp/audit-archive"


def test_audit_retention_prune(fs, tmp_path):
    from raise_featurestore_spark.catalog.audit import AuditConfig

    now = 1_000_000.0
    for i in range(5):
        fs.audit.log("data", "write_append", f"t{i}")
    # age three of the five data entries past retention (the fixture's own
    # catalog entries stay recent)
    for e in fs.audit.entries:
        e.timestamp = now - 1 * 86400
    for e in fs.audit.entries:
        if e.resource in ("t0", "t1", "t2"):
            e.timestamp = now - 10 * 86400

    archive = tmp_path / "archive"
    cfg = AuditConfig(retention_days=7, immutable=True,
                      export_destination=str(archive))
    assert fs.audit.prune(cfg, now=now) == 3
    remaining = [e for e in fs.audit.entries if e.resource.startswith("t")]
    assert sorted(e.resource for e in remaining) == ["t3", "t4"]
    dumped = list(archive.glob("audit_pruned_*.jsonl"))
    assert len(dumped) == 1
    assert len(dumped[0].read_text().splitlines()) == 3
    # immutable without archive refuses to destroy records
    fs.audit.entries[0].timestamp = now - 10 * 86400
    with pytest.raises(ValueError):
        fs.audit.prune(AuditConfig(retention_days=7, immutable=True), now=now)


def test_feature_audit_log_scoped(fs):
    g = fs.create_feature_group("sig", entity_key="uid")
    g.create_feature("a", "float64")
    g.create_feature("a", "float64", if_exists="update")  # v2
    g.create_feature("b", "float64")
    page_a = g.feature_audit_log("a")
    assert page_a.total_count == 2  # v1 + v2 creations
    assert all("sig/a" in e.resource for e in page_a)
    page_b = g.feature_audit_log("b", actions=["create_*"])
    assert page_b.total_count == 1


def test_acl_inheritance_chain(fs):
    g = fs.create_feature_group("guarded2", entity_key="uid")
    fs.set_namespace_acl(ACL(readers={"org-wide"}), org="acme")
    fs.set_namespace_acl(ACL(writers={"ml-dom"}), org="acme", domain="ml")
    fs.set_namespace_acl(ACL(admins={"proj-admin"}), org="acme", domain="ml",
                         project="recsys")
    g.set_acl(ACL(readers={"group-reader"}))
    chain = g.get_acl_chain()
    assert len(chain) == 4
    eff = g.get_effective_acl()
    assert eff.allows("org-wide", "reader")
    assert eff.allows("ml-dom", "reader")  # writer implies reader
    assert eff.allows("proj-admin", "writer")  # admin implies writer
    assert eff.allows("group-reader", "reader")
    assert not eff.allows("stranger", "reader")
    # namespace ACLs persist
    fs2 = FeatureStore(fs.path).with_context("acme", "ml", "recsys")
    assert fs2.get_feature_group("guarded2").get_effective_acl().allows(
        "org-wide", "reader")


def test_validate_feature_without_create(fs):
    g = fs.create_feature_group("vals", entity_key="uid")
    g.create_feature("spend", "float64")
    ok = g.validate_feature("spend2x", "float64", derived_from="spend * 2")
    assert ok.valid and not g.meta.features.get("spend2x")
    bad = g.validate_feature("bad", "float64", derived_from="nope * 2")
    assert not bad.valid
    assert g.validate_feature("plain", "int64").valid
    with pytest.raises(Exception):
        g.validate_feature("x", "not_a_type")


def test_group_delete_and_grants_listing(fs):
    g = fs.create_feature_group("tmp-group", entity_key="uid")
    g.grant_access("partner", features=["a*"])
    assert len(g.list_external_grants()) == 1
    log = g.audit_log(actions=["create_*", "grant_*"])
    assert log.total_count >= 2
    g.delete()
    with pytest.raises(Exception):
        fs.get_feature_group("tmp-group")
    # deletion is audited
    assert fs.audit.query(actions=["delete_feature_group"]).total_count == 1


def test_if_exists_update_preserves_features(fs):
    """Regression: if_exists='update' (and any unrecognized value) used to
    fall through and REPLACE the group with a fresh empty meta, wiping
    features; update now edits metadata in place and bad values raise."""
    g = fs.create_feature_group("keepme", entity_key="id")
    g.create_feature("f1", "float64")
    g2 = fs.create_feature_group(
        "keepme", entity_key="id", description="updated", if_exists="update"
    )
    assert [f.name for f in g2.list_features()] == ["f1"]
    assert g2.meta.description == "updated"
    with pytest.raises(ValueError, match="error|skip|update"):
        fs.create_feature_group("keepme", entity_key="id", if_exists="Skip")


def test_create_features_bad_dtype_fails_before_any_creation(fs):
    g = fs.create_feature_group("atomic", entity_key="id")
    with pytest.raises(Exception):
        g.create_features(
            [{"name": "ok", "dtype": "float64"}, {"name": "bad", "dtype": "flaot64"}]
        )
    assert [f.name for f in g.list_features()] == []  # nothing half-applied
