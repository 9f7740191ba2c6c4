"""Example: multimodal data and blob references — blob_ref dtype, storage
scan, byte features, frame sampling, integrity checks. (parity with
reference examples/08_multimodal.py:1-418, written against this engine's
API; run: python examples/08_multimodal.py)

The runtime has no image codecs, so decode is a documented stub
(dataprep/multimodal.py:133); everything around it — schema, Arrow batch
flow, anti-join integrity — is real Spark.
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
    from raise_featurestore_spark.dataprep.multimodal import (
        blob_refs_from_bytes,
        decode_image,
        extract_byte_features,
        integrity_report,
        sample_frames,
        scan_blobs,
        verify_checksums,
    )
    from raise_featurestore_spark.session import get_spark
    from raise_featurestore_spark.tables import load_table
    from raise_featurestore_spark.types import parse_dtype

    spark = get_spark("example-08")

    # --- blob_ref is a first-class dtype ---------------------------------
    plain = parse_dtype("blob_ref")
    typed = parse_dtype("blob_ref<image/png|image/jpeg>")
    assert typed.content_types == ("image/png", "image/jpeg")

    fs = FeatureStore(catalog_dir or tempfile.mkdtemp(prefix="ex08_"))
    fs = fs.with_context("acme", "mlplatform", "vision")
    fs.create_organization("acme", if_exists="skip")
    fs.create_domain("acme", "mlplatform", if_exists="skip")
    fs.create_project("acme", "mlplatform", "vision", if_exists="skip")
    image_features = fs.create_feature_group(
        "image-features", entity_key="image_id", if_exists="skip",
    )
    image_features.create_features_from_schema({
        "thumbnail": "blob_ref<image/png>",
        "raw_image": "blob_ref<image/png|image/jpeg>",
        "caption": "string",
    }, if_exists="skip")

    # --- build a small blob store on disk, then scan it ------------------
    blob_dir = tempfile.mkdtemp(prefix="ex08b_")
    for i in range(6):
        with open(os.path.join(blob_dir, f"img_{i}.png"), "wb") as fh:
            fh.write(bytes([i * 37 % 256] * 64) + os.urandom(0))  # deterministic
    listing = scan_blobs(spark, blob_dir, glob_pattern="*.png", with_content=True)
    n_scanned = listing.count()
    assert listing.select("blob_ref.content_type").distinct().collect()[0][0] == "image/png"

    # --- blob refs from an existing binary column (documents as bytes) ---
    docs = load_table(spark, sf_dir, "documents").limit(20)
    doc_blobs = blob_refs_from_bytes(
        docs.select(
            F.concat(F.lit("mem://doc/"), F.col("doc_id")).alias("uri"),
            F.encode("text", "utf-8").alias("content"),
        ),
        uri_col="uri", content_col="content", content_type="text/plain",
    ).localCheckpoint()  # reused 4× below: checkpoint beats recompute

    # --- byte features + frame sampling (Arrow-batched mapInPandas) ------
    feats = extract_byte_features(
        doc_blobs.select(F.col("blob_ref.uri").alias("uri"), "content")
    )
    frames = sample_frames(
        doc_blobs.select(F.col("blob_ref.uri").alias("uri"), "content"), n_frames=3
    )

    # --- decode is a documented stub (no codecs in this runtime) ---------
    try:
        decode_image(b"\x89PNG\r\n")
        decoded = True
    except NotImplementedError:
        decoded = False

    # --- integrity: missing + orphan blobs, checksum verification --------
    refs = doc_blobs.select("blob_ref")
    # listing is missing 2 of the referenced blobs
    partial_listing = refs.limit(18)
    report = integrity_report(refs, partial_listing)
    issues: dict = {}
    for r in report.collect():
        issues[r.issue] = issues.get(r.issue, 0) + 1
    assert issues.get("missing") == 2
    mismatches = verify_checksums(doc_blobs, sample_rate=1.0).count()

    return {
        "typed_blob_ref": str(typed),
        "scanned": n_scanned,
        "byte_feature_rows": feats.count(),
        "frame_rows": frames.count(),
        "decode_stubbed": not decoded,
        "integrity_issues": issues,
        "checksum_mismatches": mismatches,
    }


if __name__ == "__main__":
    print(main())
