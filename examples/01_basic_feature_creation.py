"""Example: basic feature creation — groups, typed features, idempotent
creation, path syntax, point lookup. (parity with reference
examples/01_basic_feature_creation.py:1-144, written against this engine's
API; run: python examples/01_basic_feature_creation.py)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main(sf_dir: str = SF_DIR, catalog_dir: str | None = None) -> dict:
    from pyspark.sql import functions as F

    from raise_featurestore_spark.catalog.store import FeatureStore
    from raise_featurestore_spark.session import get_spark
    from raise_featurestore_spark.tables import load_table

    spark = get_spark("example-01")
    fs = FeatureStore(catalog_dir or tempfile.mkdtemp(prefix="ex01_"))
    fs = fs.with_context("acme", "mlplatform", "recommendation")
    fs.create_organization("acme", if_exists="skip")
    fs.create_domain("acme", "mlplatform", if_exists="skip")
    fs.create_project("acme", "mlplatform", "recommendation", if_exists="skip")

    # --- create a feature group with an entity key -----------------------
    user_signals = fs.create_feature_group(
        "user-signals",
        description="User behavioral signals for recommendation models",
        tags=["user", "behavioral", "ranking"],
        entity_key="user_id",
        entity_dtype="int64",
        if_exists="skip",
    )

    # --- typed features: plain, described, embedding, timestamp ----------
    user_signals.create_feature("click_count", dtype="int64", if_exists="skip")
    user_signals.create_feature(
        "impression_count",
        dtype="int64",
        description="Total ad impressions shown to user",
        tags=["engagement", "ads"],
        nullable=False,
        default=0,
        if_exists="skip",
    )
    user_signals.create_feature(
        "user_embedding",
        dtype="float32[8]",
        description="User profile embedding",
        tags=["embedding", "prod"],
        if_exists="skip",
    )
    user_signals.create_feature(
        "last_active_ts", dtype="timestamp",
        description="Last time the user was active", if_exists="skip",
    )

    # --- retrieval + listing ---------------------------------------------
    retrieved = user_signals.feature("click_count")
    assert str(retrieved.dtype) == "int64"
    all_features = user_signals.list_features()
    print(f"features in user-signals: {[f.name for f in all_features]}")

    # --- idempotent creation ---------------------------------------------
    same = user_signals.create_feature("click_count", dtype="int64", if_exists="skip")
    assert same.version == 1
    another = user_signals.get_or_create_feature(
        "session_count", dtype="int64", description="Number of sessions"
    )
    assert another.name == "session_count"

    # --- path syntax ------------------------------------------------------
    score = fs.create_feature("user-signals/relevance_score", dtype="float64",
                              if_exists="skip")
    via_path = fs.feature("user-signals/relevance_score")
    assert via_path.name == score.name == "relevance_score"

    # --- write real data (from the events table) and point-lookup --------
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("click_count"),
        (F.count(F.lit(1)) * 2).alias("impression_count"),
        F.max("ts").alias("last_active_ts"),
        F.array([F.lit(0.0)] * 8).cast("array<float>").alias("user_embedding"),
        F.lit(1).alias("session_count"),
        F.avg("value").alias("relevance_score"),
    )
    user_signals.write(per_user, mode="overwrite")

    ids = [r.user_id for r in per_user.select("user_id").orderBy("user_id").limit(3).collect()]
    rows = user_signals.get(spark, ids)
    looked_up = rows.count()
    selective = user_signals.get(spark, ids[:1],
                                 features=["click_count", "impression_count"])
    assert set(selective.columns) == {"user_id", "click_count", "impression_count"}

    print(f"point lookup returned {looked_up} rows; entity_key="
          f"{user_signals.entity_key} ({user_signals.entity_dtype})")
    return {
        "n_features": len(user_signals.list_features()),
        "lookup_rows": looked_up,
        "idempotent_version": same.version,
        "entity_key": user_signals.entity_key,
    }


if __name__ == "__main__":
    out = main()
    print(out)
