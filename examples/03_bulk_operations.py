"""Example: bulk feature operations — schema-dict / spec-list / YAML-file
creation, listing + filtering, search, bulk versioning. (parity with
reference examples/03_bulk_operations.py:1-279, written against this
engine's API; run: python examples/03_bulk_operations.py)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main(sf_dir: str = SF_DIR, catalog_dir: str | None = None) -> dict:
    from raise_featurestore_spark.catalog.store import FeatureStore

    fs = FeatureStore(catalog_dir or tempfile.mkdtemp(prefix="ex03_"))
    fs = fs.with_context("acme", "mlplatform", "pretraining")
    fs.create_organization("acme", if_exists="skip")
    fs.create_domain("acme", "mlplatform", if_exists="skip")
    fs.create_project("acme", "mlplatform", "pretraining", if_exists="skip")

    # --- bulk creation from a schema dict --------------------------------
    embeddings = fs.create_feature_group(
        "embeddings", entity_key="entity_id",
        description="Pre-computed embeddings", tags=["embeddings", "pretraining"],
        if_exists="skip",
    )
    schema_feats = embeddings.create_features_from_schema({
        "user_embedding_v1": "float32[256]",
        "user_embedding_v2": "float32[512]",
        "item_embedding": "float32[512]",
        "query_embedding": "float32[768]",
    }, if_exists="skip")
    print(f"from schema: {[f.name for f in schema_feats]}")

    # --- bulk creation from a list of spec dicts -------------------------
    user_features = fs.create_feature_group(
        "user-features", entity_key="user_id",
        description="User profile and behavioral features", if_exists="skip",
    )
    list_feats = user_features.create_features([
        {"name": "age", "dtype": "int64", "nullable": False},
        {"name": "total_purchases", "dtype": "int64", "default": 0},
        {"name": "total_revenue", "dtype": "float64", "default": 0.0},
        {
            "name": "revenue_per_purchase",
            "dtype": "float64",
            "derived_from": "total_revenue / NULLIF(total_purchases, 0)",
            "tags": ["derived"],
        },
        {
            "name": "user_value_tier",
            "dtype": "string",
            "derived_from": "CASE WHEN total_revenue > 5000 THEN 'high' "
                            "WHEN total_revenue > 500 THEN 'medium' ELSE 'low' END",
            "tags": ["derived", "segmentation"],
        },
    ], if_exists="skip")
    print(f"from list: {[f.name for f in list_feats]}")

    # --- bulk creation from a YAML manifest ------------------------------
    yaml_path = os.path.join(tempfile.mkdtemp(prefix="ex03y_"), "features.yaml")
    with open(yaml_path, "w") as fh:
        fh.write(
            "features:\n"
            "  - name: click_count\n    dtype: int64\n    tags: [engagement, core]\n"
            "  - name: impression_count\n    dtype: int64\n    tags: [engagement]\n"
            "  - name: ctr\n    dtype: float64\n"
            "    derived_from: click_count / NULLIF(impression_count, 0)\n"
            "    tags: [derived, ratio]\n"
        )
    engagement = fs.create_feature_group(
        "engagement", entity_key="user_id", if_exists="skip",
    )
    yaml_feats = engagement.create_features_from_file(yaml_path, if_exists="skip")
    os.remove(yaml_path)
    print(f"from yaml: {[f.name for f in yaml_feats]}")

    # --- listing + filtering + search ------------------------------------
    derived = user_features.list_features(tags=["derived"])
    emb_hits = fs.search_features(query="embedding", limit=10)
    dim512 = fs.search_features(dtype="float32[[]512]", limit=10)  # fnmatch-escaped

    # --- bulk versioning --------------------------------------------------
    v2 = embeddings.create_feature(
        "user_embedding_v1", dtype="float32[384]",
        description="updated architecture", if_exists="update",
    )
    versions = embeddings.list_versions("user_embedding_v1")
    v1 = embeddings.feature("user_embedding_v1@v1")
    assert str(v1.dtype) == "float32[256]" and str(v2.dtype) == "float32[384]"

    return {
        "schema_features": len(schema_feats),
        "list_features": len(list_feats),
        "yaml_features": len(yaml_feats),
        "derived_count": len(derived),
        "embedding_hits": len(emb_hits),
        "dim512_hits": len(dim512),
        "versions": [v.version for v in versions],
    }


if __name__ == "__main__":
    print(main())
