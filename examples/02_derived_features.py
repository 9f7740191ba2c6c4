"""Example: derived features — expression validation, lineage, versions,
cross-group references. (parity with reference examples/02_derived_features.py,
written against this engine's API; run: python examples/02_derived_features.py)
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
    from raise_featurestore_spark.expressions.validator import validate_expression
    from raise_featurestore_spark.session import get_spark

    spark = get_spark("example-02")
    fs = FeatureStore(catalog_dir or tempfile.mkdtemp(prefix="ex02_"))
    fs = fs.with_context("acme", "ml", "ranking")
    fs.create_organization("acme", if_exists="skip")
    fs.create_domain("acme", "ml", if_exists="skip")
    fs.create_project("acme", "ml", "ranking", if_exists="skip")

    # --- base + derived features on the customer group -------------------
    cust = fs.create_feature_group(
        "customers", entity_key="c_custkey",
        storage_path=os.path.join(sf_dir, "customer.parquet"), if_exists="skip",
    )
    cust.create_feature("c_acctbal", "float64", if_exists="skip")
    cust.create_feature(
        "balance_tier", "string",
        derived_from="CASE WHEN c_acctbal > 5000 THEN 'high' "
                     "WHEN c_acctbal > 0 THEN 'mid' ELSE 'low' END",
        if_exists="skip",
    )
    # hoisted aggregate: row value vs global moments (z-score pattern)
    cust.create_feature(
        "balance_z", "float64",
        derived_from="(c_acctbal - AVG(c_acctbal)) / STDDEV(c_acctbal)",
        if_exists="skip",
    )

    out = cust.read(spark, ["c_acctbal", "balance_tier", "balance_z"])
    sample = out.orderBy("c_custkey").limit(3).collect()
    print("derived features:")
    for r in sample:
        print(f"  cust {r['c_custkey']}: bal={r['c_acctbal']:.2f} "
              f"tier={r['balance_tier']} z={r['balance_z']:.3f}")

    # --- cross-group reference → entity-key join -------------------------
    orders = fs.create_feature_group(
        "orders", entity_key="o_custkey",
        storage_path=os.path.join(sf_dir, "orders.parquet"), if_exists="skip",
    )
    orders.create_feature("o_totalprice", "float64", if_exists="skip")
    orders.create_feature(
        "price_vs_balance", "float64",
        derived_from="o_totalprice / NULLIF(customers.c_acctbal, 0)",
        if_exists="skip",
    )
    joined = orders.read(spark, ["o_totalprice", "price_vs_balance"])
    n_joined = joined.where(F.col("price_vs_balance").isNotNull()).count()
    print(f"cross-group derived rows with a match: {n_joined}")

    # --- validation: negative cases --------------------------------------
    bad_ref = validate_expression("no_such_col * 2", known_features={"c_acctbal"})
    bad_fn = validate_expression("MAGIC(c_acctbal)", known_features={"c_acctbal"})
    print("unknown reference rejected:", not bad_ref.valid,
          "| unknown function rejected:", not bad_fn.valid)

    # --- lineage + immutable versions ------------------------------------
    ups = fs.lineage.all_upstream("acme/ml/ranking/customers/balance_z")
    print("balance_z upstream:", sorted(ups))
    cust.create_feature("balance_z", "float64",
                        derived_from="(c_acctbal - AVG(c_acctbal)) / NULLIF(STDDEV(c_acctbal), 0)",
                        if_exists="update")
    v2 = cust.get_feature("balance_z@v2")
    print("balance_z now at version:", v2.version)

    return {
        "rows": n_joined,
        "rejected": (not bad_ref.valid) and (not bad_fn.valid),
        "version": v2.version,
    }


if __name__ == "__main__":
    main()
