"""Multimodal plumbing: binaryFile scan, frame sampling, integrity."""

from __future__ import annotations

import pytest


@pytest.fixture()
def blob_dir(tmp_path):
    (tmp_path / "a.png").write_bytes(b"\x89PNG fake image bytes" * 10)
    (tmp_path / "b.jpg").write_bytes(b"\xff\xd8 fake jpeg" * 5)
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "c.wav").write_bytes(b"RIFF fake audio" * 20)
    return str(tmp_path)


def test_scan_blobs_metadata_only(spark, blob_dir):
    from raise_featurestore_spark.dataprep import multimodal as MM

    df = MM.scan_blobs(spark, blob_dir)
    rows = {r["blob_ref"]["uri"].split("/")[-1]: r["blob_ref"] for r in df.collect()}
    assert set(rows) == {"a.png", "b.jpg", "c.wav"}
    assert rows["a.png"]["content_type"] == "image/png"
    assert rows["b.jpg"]["content_type"] == "image/jpeg"
    assert rows["c.wav"]["content_type"] == "audio/wav"
    assert rows["a.png"]["size_bytes"] == 210
    # metadata-only scan: checksum not computed
    assert rows["a.png"]["checksum"] is None
    # the physical plan must not read the content column
    assert "content" not in df.schema.fieldNames()


def test_scan_blobs_with_content_checksums(spark, blob_dir):
    import hashlib

    from raise_featurestore_spark.dataprep import multimodal as MM

    df = MM.scan_blobs(spark, blob_dir, glob_pattern="*.png", with_content=True)
    [row] = df.collect()
    assert row["blob_ref"]["checksum"] == hashlib.sha256(b"\x89PNG fake image bytes" * 10).hexdigest()


def test_frame_sampling_shape(spark, blob_dir):
    from raise_featurestore_spark.dataprep import multimodal as MM

    blobs = MM.scan_blobs(spark, blob_dir, with_content=True).select(
        "blob_ref.uri", "content"
    )
    frames = MM.sample_frames(blobs, n_frames=4, frame_bytes=16)
    rows = frames.collect()
    assert len(rows) == 12  # 3 blobs × 4 frames
    assert all(len(r["frame"]) <= 16 for r in rows)
    assert {r["frame_idx"] for r in rows} == {0, 1, 2, 3}


def test_integrity_and_checksums(spark, blob_dir):
    from pyspark.sql import functions as F

    from raise_featurestore_spark.dataprep import multimodal as MM

    listing = MM.scan_blobs(spark, blob_dir, with_content=True)
    refs = MM.blob_refs_from_bytes(
        listing.select(F.col("blob_ref.uri").alias("uri"), F.col("content")),
        "uri",
        "content",
    )
    # all refs present → no issues
    assert MM.integrity_report(refs, listing).count() == 0
    # drop one file from the listing → one missing
    partial = listing.where(~F.col("blob_ref.uri").endswith("a.png"))
    issues = {r["issue"] for r in MM.integrity_report(refs, partial).collect()}
    assert issues == {"missing"}
    # checksums recomputed over content all match
    assert MM.verify_checksums(refs).count() == 0


def test_decode_image_stub_raises():
    from raise_featurestore_spark.dataprep import multimodal as MM

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL unexpectedly present")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"not an image")


def test_derive_blobs_thumbnail_pattern(spark, blob_dir):
    import hashlib

    from raise_featurestore_spark.dataprep.multimodal import derive_blobs, scan_blobs

    src = scan_blobs(spark, blob_dir, with_content=True)
    thumbs = derive_blobs(
        src, processor=lambda b: b[:16], uri_suffix=".thumb.png",
        content_type="image/png",
    )
    rows = thumbs.collect()
    assert len(rows) == src.count()
    for r in rows:
        ref = r.blob_ref
        assert ref.uri.endswith(".thumb.png")
        assert ref.content_type == "image/png"
        assert ref.size_bytes == len(r.content) <= 16
        assert ref.checksum == hashlib.sha256(bytes(r.content)).hexdigest()
        assert ref.metadata["derived_from"] + ".thumb.png" == ref.uri
        assert "source_checksum" in ref.metadata


def test_null_checksum_refs_are_reported_not_waved_through(spark):
    """Regression: NULL stored checksums made both verify_checksums and the
    strict register gate silently pass (NULL != x is NULL)."""
    import raise_featurestore_spark.dataprep.multimodal as MM

    ref = {
        "uri": "mem://a", "content_type": "text/plain", "checksum": None,
        "hash_algorithm": "sha256", "size_bytes": None, "etag": None,
        "version_id": None, "created_at": None, "metadata": {},
    }
    df = spark.createDataFrame(
        [(ref, bytearray(b"payload"))],
        "blob_ref struct<uri:string,content_type:string,checksum:string,"
        "hash_algorithm:string,size_bytes:bigint,etag:string,version_id:string,"
        "created_at:timestamp,metadata:map<string,string>>, content binary",
    )
    assert MM.verify_checksums(df).count() == 1  # unverifiable IS a finding
    reg = MM.BlobRegistry(df.limit(0), policy=MM.IntegrityPolicy.strict())
    with pytest.raises(ValueError, match="integrity violation"):
        reg.register(df)
