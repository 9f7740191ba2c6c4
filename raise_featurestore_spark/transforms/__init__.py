"""ETL dataflow: declarative sources, SQL/Python/Hybrid transforms, jobs
with incremental checkpoints, write targets (append/overwrite/upsert), and
post-write quality checks.

(reference surface: raise_/transforms/{source,transform,job,checkpoint,
observability,schedule}.py — declared there, mocked; computed here on Spark)
"""

from raise_featurestore_spark.transforms.source import (
    ColumnarSource,
    DatabaseSource,
    FeatureGroupSource,
    FileSystemSource,
    ObjectStorageSource,
    read_source,
)
from raise_featurestore_spark.transforms.transform import (
    HybridTransform,
    PandasBatchTransform,
    PythonTransform,
    SQLTransform,
    TransformContext,
    python_transform,
)
from raise_featurestore_spark.transforms.checkpoint import (
    Checkpoint,
    CheckpointStore,
    CheckpointType,
    IncrementalConfig,
    IncrementalMode,
)
from raise_featurestore_spark.transforms.job import Job, JobRun, Target
from raise_featurestore_spark.transforms.observability import (
    BlobIntegrityCheck,
    CheckResult,
    CustomCheck,
    FreshnessCheck,
    NullCheck,
    QualityReport,
    RangeCheck,
    RowCountCheck,
    Severity,
    UniqueCheck,
    run_checks,
)

__all__ = [
    "ColumnarSource",
    "DatabaseSource",
    "FeatureGroupSource",
    "FileSystemSource",
    "ObjectStorageSource",
    "read_source",
    "HybridTransform",
    "PandasBatchTransform",
    "PythonTransform",
    "SQLTransform",
    "TransformContext",
    "python_transform",
    "Checkpoint",
    "CheckpointStore",
    "CheckpointType",
    "IncrementalConfig",
    "IncrementalMode",
    "Job",
    "JobRun",
    "Target",
    "BlobIntegrityCheck",
    "CheckResult",
    "CustomCheck",
    "FreshnessCheck",
    "NullCheck",
    "QualityReport",
    "RangeCheck",
    "RowCountCheck",
    "Severity",
    "UniqueCheck",
    "run_checks",
]
