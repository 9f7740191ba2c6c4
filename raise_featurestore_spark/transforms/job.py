"""Job: sources + transform + target + incremental checkpoint + quality.

(reference: raise_/transforms/job.py:41-336 — Target with write_mode and
column→feature rename map, Job lifecycle DRAFT→ACTIVE→PAUSED→FAILED→
DEPRECATED, JobRun metrics rows_read/rows_written/duration/checkpoint
before/after; real flow per raise_/PRD.md:1511-1591. The reference's
``run()`` is a mock (job.py:310-318, ``rows_read = 1000  # Mock``); this
one reads, transforms, writes, checkpoints, and checks for real.)

Row metrics use ``df.observe`` (Spark Observation API): counts are captured
as a side-effect of the write job itself — no second scan of input or
output. The run order is write-target THEN advance-checkpoint, so a crash
between the two replays a batch; with an UPSERT target the replay is
idempotent (effectively-once).
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field
from datetime import datetime, timezone
from enum import Enum
from typing import Any

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from raise_featurestore_spark.io.writer import write_feature_group
from raise_featurestore_spark.transforms.checkpoint import (
    Checkpoint,
    CheckpointStore,
    IncrementalConfig,
    IncrementalMode,
    advance_checkpoint,
    incremental_filter,
)
from raise_featurestore_spark.transforms.observability import (
    Check,
    QualityReport,
    run_checks,
)
from raise_featurestore_spark.transforms.transform import TransformContext


class QualityGateError(RuntimeError):
    """Deterministic quality-check failure: the same inputs produce the same
    report, so retrying re-runs the whole pipeline — and for append targets
    re-appends the already-written batch. Never retried."""


class JobStatus(str, Enum):
    # reference: raise_/PRD.md:1577-1591
    DRAFT = "draft"
    ACTIVE = "active"
    PAUSED = "paused"
    FAILED = "failed"
    DEPRECATED = "deprecated"


@dataclass
class Target:
    """Write destination (reference: raise_/transforms/job.py:41-71).

    ``column_mapping`` renames output columns → feature names before write;
    ``write_mode`` append/overwrite/upsert with ``key_columns`` driving the
    upsert MERGE (raise_/PRD.md:1523-1540).
    """

    path: str
    write_mode: str = "append"
    key_columns: list[str] = field(default_factory=list)
    column_mapping: dict[str, str] = field(default_factory=dict)
    partition_by: list[str] = field(default_factory=list)
    # deterministic upsert conflict winner = max(sequence_column) per key;
    # REQUIRED when an incremental lookback can re-read old versions
    sequence_column: str | None = None

    def __post_init__(self) -> None:
        if self.write_mode not in ("append", "overwrite", "upsert"):
            raise ValueError(f"unknown write_mode {self.write_mode!r}")
        if self.write_mode == "upsert" and not self.key_columns:
            raise ValueError("upsert target requires key_columns")

    def apply_mapping(self, df: DataFrame) -> DataFrame:
        for src, dst in self.column_mapping.items():
            df = df.withColumnRenamed(src, dst)
        return df


@dataclass
class JobRun:
    """reference: raise_/transforms/job.py:75-125 + std metric names
    raise_/transforms/observability.py:552-571."""

    job_id: str
    run_id: str
    execution_date: datetime
    status: str = "running"
    rows_read: int = 0
    rows_written: int = 0
    duration_seconds: float = 0.0
    checkpoint_before: Any = None
    checkpoint_after: Any = None
    quality: QualityReport | None = None
    error: str | None = None
    retryable: bool = True
    # user metrics emitted via TransformContext.log_metric
    user_metrics: dict[str, Any] = field(default_factory=dict)

    def metrics(self) -> dict[str, Any]:
        return {
            "rows_read": self.rows_read,
            "rows_written": self.rows_written,
            "duration_seconds": round(self.duration_seconds, 3),
            "checkpoint_before": self.checkpoint_before,
            "checkpoint_after": self.checkpoint_after,
            "quality_passed": self.quality.passed if self.quality else None,
            **self.user_metrics,
        }


@dataclass
class Job:
    """reference: raise_/transforms/job.py:129-336."""

    job_id: str
    sources: dict[str, Any]  # alias → source spec (transforms.source.*)
    transform: Any  # SQLTransform | PythonTransform | PandasBatchTransform | Hybrid
    target: Target
    incremental: IncrementalConfig = field(default_factory=IncrementalConfig)
    checkpoint_store: CheckpointStore | None = None
    quality_checks: list[Check] = field(default_factory=list)
    params: dict[str, Any] = field(default_factory=dict)
    max_retries: int = 0
    status: JobStatus = JobStatus.DRAFT
    runs: list[JobRun] = field(default_factory=list)

    def validate(self) -> None:
        # reference: raise_/transforms/job.py:253-269
        if not self.sources:
            raise ValueError("job needs at least one source")
        if self.transform is None:
            raise ValueError("job needs a transform")
        if self.target is None:
            raise ValueError("job needs a target")
        if (
            self.incremental.mode != IncrementalMode.FULL
            and self.checkpoint_store is None
        ):
            raise ValueError("incremental job needs a checkpoint_store")

    # builder form (reference: raise_/transforms/job.py:191-209)

    def add_source(self, alias: str, source: Any) -> "Job":
        self.sources[alias] = source
        return self

    def set_transform(self, transform: Any) -> "Job":
        self.transform = transform
        return self

    def set_target(self, target: "Target | str") -> "Job":
        self.target = Target(path=target) if isinstance(target, str) else target
        return self

    def deploy(self) -> None:
        self.validate()
        self.status = JobStatus.ACTIVE

    # lifecycle (reference: raise_/transforms/job.py:227-252)

    def activate(self) -> "Job":
        self.validate()
        self.status = JobStatus.ACTIVE
        return self

    def pause(self) -> "Job":
        self.status = JobStatus.PAUSED
        return self

    def resume(self) -> "Job":
        if self.status != JobStatus.PAUSED:
            raise ValueError(f"cannot resume a {self.status.value} job")
        self.status = JobStatus.ACTIVE
        return self

    def deprecate(self) -> "Job":
        self.status = JobStatus.DEPRECATED
        return self

    def run(self, spark: SparkSession, execution_date: datetime | None = None) -> JobRun:
        attempts = self.max_retries + 1
        last: JobRun | None = None
        for _ in range(attempts):
            last = self._run_once(spark, execution_date)
            if last.status == "completed":
                return last
            if not last.retryable:
                break
        self.status = JobStatus.FAILED
        return last  # type: ignore[return-value]

    def _run_once(self, spark: SparkSession, execution_date: datetime | None) -> JobRun:
        t0 = time.perf_counter()
        execution_date = execution_date or datetime.now(timezone.utc)
        run = JobRun(
            job_id=self.job_id,
            run_id=uuid.uuid4().hex[:12],
            execution_date=execution_date,
        )
        chk = (
            self.checkpoint_store.get(self.job_id, self.incremental.checkpoint_type)
            if self.checkpoint_store
            else Checkpoint(self.incremental.checkpoint_type)
        )
        run.checkpoint_before = chk.value
        try:
            ctx = TransformContext(
                job_id=self.job_id,
                run_id=run.run_id,
                execution_date=execution_date,
                checkpoint=chk.effective_lower_bound(self.incremental.lookback),
                params=self.params,
            )

            # read: incremental predicate lands on every source that has the
            # checkpoint column → parquet row-group / partition pruning
            read_obs: list[Observation] = []
            frames: dict[str, DataFrame] = {}
            batch_for_checkpoint: DataFrame | None = None
            for alias, src in self.sources.items():
                df = src.read(spark)
                if (
                    self.incremental.mode != IncrementalMode.FULL
                    and self.incremental.checkpoint_column in df.columns
                ):
                    df = incremental_filter(df, self.incremental, chk)
                    batch_for_checkpoint = df if batch_for_checkpoint is None else batch_for_checkpoint
                obs = Observation(f"read_{alias}")
                df = df.observe(obs, F.count(F.lit(1)).alias("n"))
                read_obs.append(obs)
                frames[alias] = df

            out = self.transform.apply(spark, ctx, frames)
            out = self.target.apply_mapping(out)

            write_obs = Observation("written")
            out = out.observe(write_obs, F.count(F.lit(1)).alias("n"))

            # write — the single action that executes the whole pipeline
            mode = self.target.write_mode
            if self.incremental.mode == IncrementalMode.UPSERT:
                mode = "upsert"
            elif self.incremental.mode == IncrementalMode.APPEND:
                mode = "append"
            write_feature_group(
                out,
                self.target.path,
                mode=mode,
                key_columns=self.target.key_columns or None,
                partition_by=self.target.partition_by or None,
                sequence_column=self.target.sequence_column,
            )

            run.rows_written = int(write_obs.get["n"])
            run.rows_read = sum(int(o.get["n"]) for o in read_obs)
            run.user_metrics = dict(ctx.metrics)

            # quality gate on the BATCH that was just written, not the
            # accumulated table — an append target re-checked over history
            # would drift (RowCountCheck fails on run 2) and cost O(table)
            # per run instead of O(batch). For overwrite the table IS the
            # batch, so re-reading the written parquet is the cheap form;
            # append/upsert re-run the (lazy) batch pipeline for the check.
            if self.quality_checks:
                scope = (
                    spark.read.parquet(self.target.path)
                    if mode == "overwrite"
                    else out
                )
                run.quality = run_checks(scope, self.quality_checks)
                if run.quality.should_fail_job():
                    raise QualityGateError(
                        "quality checks failed: "
                        + "; ".join(r.name for r in run.quality.failures())
                    )

            # advance checkpoint AFTER a successful write (replay-safe)
            if (
                self.incremental.mode != IncrementalMode.FULL
                and self.checkpoint_store is not None
                and batch_for_checkpoint is not None
            ):
                new_chk = advance_checkpoint(batch_for_checkpoint, self.incremental, chk)
                self.checkpoint_store.put(self.job_id, new_chk)
                run.checkpoint_after = new_chk.value
            else:
                run.checkpoint_after = chk.value

            run.status = "completed"
        except Exception as ex:
            run.status = "failed"
            run.error = f"{type(ex).__name__}: {ex}"[:500]
            if isinstance(ex, QualityGateError):
                run.retryable = False
        run.duration_seconds = time.perf_counter() - t0
        self.runs.append(run)
        return run
