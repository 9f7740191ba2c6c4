"""Multimodal plumbing: blob-reference columns, metadata-only scans,
Arrow-batched decode/feature pipelines with stubbed codecs.

(reference: raise_/transforms/multimodal.py — BlobReference :102-141,
MultimodalSource scan :577-676, blob validation :482-493 (mocked there),
derived-blob processor :721-758.)

Design:
- A blob is an opaque ``binary`` column plus a typed metadata struct
  (BLOB_REF_SCHEMA). References travel through ordinary DataFrame ops;
  bytes are only materialized where a decode step needs them.
- ``scan_blobs`` uses Spark's binaryFile source. Selecting only
  path/length/modificationTime *prunes the content column* — the scan is
  metadata-only (no byte reads) unless content is requested, matching the
  reference's "references, not data" contract.
- Decode / resize / frame-sample run as ``mapInPandas`` (Arrow batches,
  N rows → M rows). The container has no image/audio codecs, so the
  actual decode is STUBBED: ``decode_image`` raises NotImplementedError
  unless PIL is importable; the deterministic byte-level feature extractor
  below is REAL computation (moments over raw bytes) exercising the same
  batch shape, schema, and partitioning a production decoder would use.
- Integrity checking is an anti-join (refs without files = missing,
  files without refs = orphans, reference multimodal.py:536-548) plus
  sampled checksum recomputation.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

BLOB_REF_SCHEMA = StructType(
    [
        StructField("uri", StringType(), False),
        StructField("content_type", StringType(), True),
        StructField("checksum", StringType(), True),
        StructField("hash_algorithm", StringType(), True),
        StructField("size_bytes", LongType(), True),
        StructField("etag", StringType(), True),
        StructField("version_id", StringType(), True),
        StructField("created_at", TimestampType(), True),
        StructField("metadata", MapType(StringType(), StringType()), True),
    ]
)

_EXT_CONTENT_TYPES = {
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "wav": "audio/wav",
    "mp3": "audio/mpeg",
    "mp4": "video/mp4",
    "txt": "text/plain",
    "bin": "application/octet-stream",
}


def content_type_for(path_col) -> "F.Column":
    """Infer MIME type from the file extension (metadata-only)."""
    ext = F.lower(F.element_at(F.split(path_col, r"\."), -1))
    expr = F.lit("application/octet-stream")
    for e, ct in _EXT_CONTENT_TYPES.items():
        expr = F.when(ext == e, F.lit(ct)).otherwise(expr)
    return expr


def scan_blobs(
    spark: SparkSession,
    uri_prefix: str,
    glob_pattern: str = "*",
    recursive: bool = True,
    with_content: bool = False,
) -> DataFrame:
    """MultimodalSource.scan as a Spark plan: blob-ref rows from a path.

    Column pruning keeps this metadata-only: unless ``with_content``,
    the binaryFile reader never materializes file bytes.
    """
    reader = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob_pattern)
        .option("recursiveFileLookup", str(recursive).lower())
    )
    df = reader.load(uri_prefix)
    ref = F.struct(
        F.col("path").alias("uri"),
        content_type_for(F.col("path")).alias("content_type"),
        (F.sha2(F.col("content"), 256) if with_content else F.lit(None).cast("string")).alias(
            "checksum"
        ),
        F.lit("sha256" if with_content else None).cast("string").alias("hash_algorithm"),
        F.col("length").alias("size_bytes"),
        F.lit(None).cast("string").alias("etag"),
        F.lit(None).cast("string").alias("version_id"),
        F.col("modificationTime").alias("created_at"),
        F.create_map().cast("map<string,string>").alias("metadata"),
    )
    cols = [ref.alias("blob_ref")] + ([F.col("content")] if with_content else [])
    return df.select(*cols)


def blob_refs_from_bytes(
    df: DataFrame, uri_col, content_col, content_type: str = "application/octet-stream"
) -> DataFrame:
    """Wrap an existing binary column into (blob_ref, content) rows —
    checksum/size computed JVM-side (sha2 + octet_length, no UDF)."""
    content = F.col(content_col).cast("binary")
    ref = F.struct(
        F.col(uri_col).cast("string").alias("uri"),
        F.lit(content_type).alias("content_type"),
        F.sha2(content, 256).alias("checksum"),
        F.lit("sha256").alias("hash_algorithm"),
        F.octet_length(content).cast("long").alias("size_bytes"),
        F.lit(None).cast("string").alias("etag"),
        F.lit(None).cast("string").alias("version_id"),
        F.lit(None).cast("timestamp").alias("created_at"),
        F.create_map().cast("map<string,string>").alias("metadata"),
    )
    return df.select(ref.alias("blob_ref"), content.alias("content"))


def decode_image(data: bytes):  # pragma: no cover - stub by design
    """Decode an image blob. STUB: the runtime has no codec libraries."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(data))
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires PIL/pillow, not present in this runtime; "
            "byte-level features below exercise the same Spark plumbing"
        ) from e


def extract_byte_features(
    df: DataFrame, id_col: str = "uri", content_col: str = "content"
) -> DataFrame:
    """Deterministic per-blob features over raw bytes via mapInPandas.

    Stands in for image/audio feature extraction: same Arrow batch flow,
    same schema discipline; numpy does the per-batch vector math. In
    production the body would decode and run a model; the plumbing —
    partition-parallel, batch-at-a-time, bounded memory — is identical.
    """
    schema = StructType(
        [
            StructField("id", StringType(), False),
            StructField("n_bytes", LongType(), True),
            StructField("mean_byte", StringType(), True),  # rounded str for stability
            StructField("entropy_bits", StringType(), True),
        ]
    )

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for _id, blob in zip(pdf[id_col], pdf[content_col]):
                if blob is None:
                    rows.append((str(_id), 0, None, None))
                    continue
                arr = np.frombuffer(blob, dtype=np.uint8)
                counts = np.bincount(arr, minlength=256)
                p = counts[counts > 0] / max(len(arr), 1)
                ent = float(-(p * np.log2(p)).sum()) if len(arr) else 0.0
                rows.append(
                    (str(_id), int(len(arr)), f"{float(arr.mean()):.4f}" if len(arr) else None,
                     f"{ent:.4f}")
                )
            yield pd.DataFrame(rows, columns=["id", "n_bytes", "mean_byte", "entropy_bits"])

    return df.mapInPandas(batches, schema)


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    frame_bytes: int = 256,
    id_col: str = "uri",
    content_col: str = "content",
) -> DataFrame:
    """Frame sampling (1 blob → N frames) via mapInPandas. The STUB
    "decoder" slices evenly spaced byte windows — deterministic, and the
    N-rows-out-per-row-in shape is exactly what a video frame sampler
    produces."""
    schema = StructType(
        [
            StructField("id", StringType(), False),
            StructField("frame_idx", LongType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for _id, blob in zip(pdf[id_col], pdf[content_col]):
                if not blob:
                    continue
                step = max(len(blob) // n_frames, 1)
                for i in range(min(n_frames, len(blob))):
                    start = i * step
                    rows.append((str(_id), i, bytes(blob[start : start + frame_bytes])))
            yield pd.DataFrame(rows, columns=["id", "frame_idx", "frame"])

    return df.mapInPandas(batches, schema)


def derive_blobs(
    df: DataFrame,
    processor,
    uri_suffix: str = ".derived",
    content_type: str = "application/octet-stream",
) -> DataFrame:
    """Distributed derived-blob creation (reference: multimodal.py:721-758
    ``MultimodalContext.create_derived`` — there a per-ref driver call; here
    one Arrow-batched pass over (blob_ref, content) rows).

    ``processor: bytes -> bytes`` (thumbnail, transcode, redact...) runs in
    a pandas UDF; the new ref is rebuilt JVM-side (sha2 checksum,
    octet_length size — no Python in the metadata path) with provenance
    recorded as ``derived_from`` + ``source_checksum`` metadata.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _proc(s):  # pd.Series[bytes] -> pd.Series[bytes]
        return s.map(lambda b: None if b is None else processor(bytes(b)))

    out = df.select(
        F.col("blob_ref.uri").alias("__src_uri"),
        F.col("blob_ref.checksum").alias("__src_ck"),
        _proc(F.col("content")).alias("content"),
    )
    ref = F.struct(
        F.concat(F.col("__src_uri"), F.lit(uri_suffix)).alias("uri"),
        F.lit(content_type).alias("content_type"),
        F.sha2(F.col("content"), 256).alias("checksum"),
        F.lit("sha256").alias("hash_algorithm"),
        F.octet_length("content").cast("long").alias("size_bytes"),
        F.lit(None).cast("string").alias("etag"),
        F.lit(None).cast("string").alias("version_id"),
        F.lit(None).cast("timestamp").alias("created_at"),
        F.map_from_arrays(
            F.array(F.lit("derived_from"), F.lit("source_checksum")),
            F.array(F.col("__src_uri"), F.coalesce(F.col("__src_ck"), F.lit(""))),
        ).alias("metadata"),
    )
    return out.select(ref.alias("blob_ref"), "content")


def integrity_report(refs: DataFrame, listing: DataFrame) -> DataFrame:
    """BlobIntegrityCheck: refs missing from storage + orphan files.

    ``refs``: rows with blob_ref struct; ``listing``: rows with blob_ref
    struct from scan_blobs. Anti-joins on uri both ways (reference
    multimodal.py:536-548)."""
    r = refs.select(F.col("blob_ref.uri").alias("uri"))
    l_ = listing.select(F.col("blob_ref.uri").alias("uri"))
    missing = r.join(l_, "uri", "left_anti").withColumn("issue", F.lit("missing"))
    orphans = l_.join(r, "uri", "left_anti").withColumn("issue", F.lit("orphan"))
    return missing.unionByName(orphans)


def verify_checksums(refs_with_content: DataFrame, sample_rate: float = 1.0) -> DataFrame:
    """Recompute sha256 over content for a sample of refs; emit mismatches."""
    df = refs_with_content
    if sample_rate < 1.0:
        df = df.sample(fraction=sample_rate, seed=7)
    actual = F.sha2(F.col("content"), 256)
    # null-safe compare: a ref with NO stored checksum cannot be verified
    # and must surface as a finding — a plain != is NULL for it and the
    # row silently vanishes from the report
    return df.select(
        F.col("blob_ref.uri").alias("uri"),
        F.col("blob_ref.checksum").alias("expected"),
        actual.alias("actual"),
    ).where(~F.col("expected").eqNullSafe(F.col("actual")))


@dataclass
class IntegrityPolicy:
    """When referential integrity is enforced (reference README:1630-1650:
    strict = every access, on_write = create/update, lazy = explicit check).

    mode: "strict" | "on_write" | "lazy"
    """

    mode: str = "on_write"
    fail_on_missing: bool = True
    fail_on_mismatch: bool = True
    cache_validation_seconds: int = 3600

    @classmethod
    def strict(cls) -> "IntegrityPolicy":
        return cls(mode="strict")

    @classmethod
    def on_write(cls) -> "IntegrityPolicy":
        return cls(mode="on_write")

    @classmethod
    def lazy(cls) -> "IntegrityPolicy":
        return cls(mode="lazy")


class BlobRegistry:
    """Registry of blob references, DataFrame-native (reference:
    raise_/transforms/multimodal.py:430-530's BlobRegistry, whose
    validation is mocked — here both listing filters and batch validation
    are real Spark plans).

    Holds a frame of ``(blob_ref struct[, content])`` rows. Where the
    reference keeps a dict and returns Python lists, this registry keeps a
    DataFrame so a 100 TB blob catalog lists/validates with pushdown
    filters instead of a driver loop; callers `.collect()` if they want
    the small result as rows.
    """

    def __init__(self, refs: DataFrame, policy: "IntegrityPolicy | None" = None):
        self.refs = refs
        self.policy = policy or IntegrityPolicy.on_write()

    @classmethod
    def from_bytes(cls, df: DataFrame, uri_col, content_col,
                   content_type: str = "application/octet-stream",
                   policy: "IntegrityPolicy | None" = None) -> "BlobRegistry":
        return cls(blob_refs_from_bytes(df, uri_col, content_col, content_type), policy)

    def register(self, more: DataFrame) -> "BlobRegistry":
        """Append refs; under an on_write/strict policy with content rows,
        mismatching blobs are rejected before entering the registry.
        (``fail_on_missing`` governs the storage-side checks instead —
        :meth:`find_orphans` / :func:`integrity_report` — where "missing"
        is meaningful; a register batch always carries its own content.)"""
        if (
            self.policy.mode in ("strict", "on_write")
            and self.policy.fail_on_mismatch
            and "content" in more.columns
        ):
            # ONE job: take(5) both answers emptiness and samples the
            # evidence (isEmpty + collect would recompute the checksums)
            bad = self.validate_batch(more).where(~F.col("valid")).take(5)
            if bad:
                raise ValueError(
                    f"integrity violation on register: {[r['uri'] for r in bad]}"
                )
        self.refs = self.refs.unionByName(more, allowMissingColumns=True)
        return self

    def get_by_uri(self, uri: str):
        """One ref Row (or None) — reference README:1588; a point lookup
        that prunes on the uri predicate at scan."""
        return self.refs.where(F.col("blob_ref.uri") == uri).first()

    def find_orphans(self, listing: DataFrame) -> DataFrame:
        """Storage objects with no registered ref (reference README:1596)
        — the orphan half of integrity_report's anti-join pair."""
        l_ = listing.select(F.col("blob_ref.uri").alias("uri"))
        r = self.refs.select(F.col("blob_ref.uri").alias("uri"))
        return l_.join(r, "uri", "left_anti")

    @staticmethod
    def compute_checksum(data: bytes, algorithm: str = "sha256") -> str:
        """Driver-side checksum helper (reference README:1599)."""
        import hashlib

        return hashlib.new(algorithm, data).hexdigest()

    def list_references(self, content_type: str | None = None,
                        prefix: str | None = None) -> DataFrame:
        """Filtered ref listing (reference: :495-530). Both filters are
        plain column predicates — pushdown-friendly on a materialized
        registry table."""
        out = self.refs
        if content_type is not None:
            out = out.where(F.col("blob_ref.content_type") == content_type)
        if prefix is not None:
            out = out.where(F.col("blob_ref.uri").startswith(prefix))
        return out

    def validate_batch(self, refs_with_content: DataFrame | None = None) -> DataFrame:
        """(uri, valid, actual_checksum, actual_size) per ref — REAL
        validation (sha256 + size recomputed over content), where the
        reference's validate_batch always returns success (:478-493)."""
        df = refs_with_content if refs_with_content is not None else self.refs
        if "content" not in df.columns:
            raise ValueError("validate_batch needs rows that carry `content`")
        actual_ck = F.sha2(F.col("content"), 256)
        actual_sz = F.octet_length(F.col("content")).cast("long")
        # fail-closed on NULL metadata: a ref without a stored checksum or
        # size is UNVERIFIABLE, not valid — a raw == would yield NULL and
        # the strict register gate's ~valid filter would wave it through
        return df.select(
            F.col("blob_ref.uri").alias("uri"),
            (
                F.coalesce(F.col("blob_ref.checksum") == actual_ck, F.lit(False))
                & F.coalesce(F.col("blob_ref.size_bytes") == actual_sz, F.lit(False))
            ).alias("valid"),
            actual_ck.alias("actual_checksum"),
            actual_sz.alias("actual_size"),
        )
