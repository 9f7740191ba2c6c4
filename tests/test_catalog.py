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
    page, _ = fs.audit.query(category="catalog", resource="*users*")
    actions = {e.action for e in page}
    assert "create_feature_group" in actions and "create_feature" in actions


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
