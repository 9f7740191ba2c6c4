"""Example: governed ingestion — JDBC source → schema-validated feature
group write → temperature-mixed training slice.

Composes the round-4 surfaces: a DatabaseSource reading through real
``spark.read.jdbc`` (embedded Derby — the one JDBC engine on every Spark
classpath), a FeatureGroup whose declared types are ENFORCED at write time
(a wrong-dim embedding batch is rejected before any byte lands), and
alpha-sampled source mixing producing a deterministic, reproducible
training slice. Mirrors the reference's Source → FeatureGroup → Analysis
flow (raise_/transforms/source.py:310-348, raise_/models/types.py:124-148)
with real execution.
run: python examples/11_governed_ingestion.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main(sf_dir: str = SF_DIR) -> dict:
    from pyspark.sql import functions as F

    from raise_featurestore_spark.catalog.store import FeatureStore
    from raise_featurestore_spark.dataprep.mixing import MixSpec, mix_report, temperature_mix
    from raise_featurestore_spark.session import get_spark
    from raise_featurestore_spark.tables import load_table
    from raise_featurestore_spark.transforms.source import DatabaseSource, derby_fixture
    from raise_featurestore_spark.types import DTypeError

    spark = get_spark("example-11")
    work = tempfile.mkdtemp(prefix="ex11_")

    # 1. JDBC ingestion: seed Derby with the nation dim, read back with the
    #    WHERE pushed into the database, not Spark
    nation = load_table(spark, sf_dir, "nation")
    url, props = derby_fixture(spark, nation, os.path.join(work, "derby"), "nation")
    dim = DatabaseSource(
        url=url,
        query='SELECT "n_nationkey", "n_name", "n_regionkey" FROM nation '
        'WHERE "n_regionkey" < 3',
        properties=props,
    ).read(spark)
    n_jdbc = dim.count()

    # 2. Governed write: declared types are enforced on the data path
    fs = FeatureStore(os.path.join(work, "store"))
    fs.create_organization("acme")
    fs.create_domain("acme", "ml")
    fs.create_project("acme", "ml", "corpus")
    fs = fs.with_context("acme", "ml", "corpus")
    group = fs.create_feature_group("doc_vectors", entity_key="doc_id")
    group.create_feature("embedding", "float32[4]")
    group.create_feature("lang", "string[8]")

    ok_batch = spark.createDataFrame(
        [(1, [0.1, 0.2, 0.3, 0.4], "en"), (2, None, "de")],
        "doc_id long, embedding array<float>, lang string",
    )
    group.write(ok_batch)

    try:
        group.write(
            spark.createDataFrame(
                [(3, [1.0, 2.0], "en")], "doc_id long, embedding array<float>, lang string"
            )
        )
        rejected = False
    except DTypeError:
        rejected = True

    # 3. Deterministic training mix: alpha-sample documents across sources
    docs = load_table(spark, sf_dir, "documents")
    spec = MixSpec(alpha=0.5, target_rows=200)
    report = mix_report(docs, spec)
    mixed = temperature_mix(docs, spec)
    n_sources = report.count()
    n_mixed = mixed.count()
    # reproducible: the same spec re-selects the same rows
    assert n_mixed == temperature_mix(docs, spec).count()

    stored = group.read(spark).count()
    print(
        f"jdbc_rows={n_jdbc} stored={stored} wrong_dim_rejected={rejected} "
        f"sources={n_sources} mixed_rows={n_mixed}"
    )
    return {
        "jdbc_rows": n_jdbc,
        "stored": stored,
        "wrong_dim_rejected": rejected,
        "sources": n_sources,
        "mixed_rows": n_mixed,
    }


if __name__ == "__main__":
    print(main())
