"""Incremental-processing checkpoints: typed watermarks + predicate injection.

(reference: raise_/transforms/checkpoint.py:15-188 — checkpoint types
TIMESTAMP/OFFSET/SEQUENCE/WATERMARK/COMPOSITE; IncrementalConfig with
``lookback`` for late data; flow per raise_/PRD.md:1511-1521:
``WHERE col >= checkpoint - lookback`` → transform → write → advance
checkpoint to max(col))

Scale posture: the incremental predicate is a plain column comparison, so
it pushes down into the parquet scan (row-group min/max skipping) and, on a
date-partitioned table, prunes whole partitions — an incremental run reads
only the new slice, never the 100 TB history. Advancing the checkpoint is a
1-row aggregate on the *batch*, not the full table.

The store is a JSON file per job (atomic tmp+rename). In production this
would be a Delta table committed after the target write — the ordering
(write target, then advance checkpoint) plus an idempotent UPSERT target
gives effectively-once semantics; a crash between the two steps replays a
batch the MERGE dedupes.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone
from enum import Enum
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raise_featurestore_spark.analytics.analysis import parse_duration_seconds


class CheckpointType(str, Enum):
    # reference: raise_/transforms/checkpoint.py:15-30
    TIMESTAMP = "timestamp"
    OFFSET = "offset"
    SEQUENCE = "sequence"
    WATERMARK = "watermark"
    COMPOSITE = "composite"


class IncrementalMode(str, Enum):
    # reference: raise_/transforms/checkpoint.py (modes per PRD.md:1511-1540)
    FULL = "full"
    INCREMENTAL = "incremental"
    APPEND = "append"
    UPSERT = "upsert"


@dataclass
class IncrementalConfig:
    """reference: raise_/transforms/checkpoint.py:100-188 (lookback at :119)."""

    mode: IncrementalMode = IncrementalMode.FULL
    checkpoint_column: str | None = None
    checkpoint_type: CheckpointType = CheckpointType.TIMESTAMP
    lookback: str | None = None  # duration "2h", "1d" — late-data re-read window

    def __post_init__(self) -> None:
        self.mode = IncrementalMode(self.mode)
        self.checkpoint_type = CheckpointType(self.checkpoint_type)
        if self.mode != IncrementalMode.FULL and not self.checkpoint_column:
            raise ValueError(f"{self.mode.value} mode requires checkpoint_column")
        if self.lookback is not None:
            parse_duration_seconds(self.lookback)  # validate grammar s/m/h/d/w

    @classmethod
    def full(cls) -> "IncrementalConfig":
        """Full-refresh config (reference: raise_/transforms/checkpoint.py —
        ``IncrementalConfig.full()`` in examples/07)."""
        return cls(mode=IncrementalMode.FULL)

    @classmethod
    def incremental(cls, checkpoint_column: str,
                    checkpoint_type: "CheckpointType | str" = CheckpointType.TIMESTAMP,
                    lookback: str | None = None) -> "IncrementalConfig":
        """Incremental config keyed on a checkpoint column (reference
        examples/07: ``IncrementalConfig.incremental("date")``)."""
        return cls(mode=IncrementalMode.INCREMENTAL,
                   checkpoint_column=checkpoint_column,
                   checkpoint_type=checkpoint_type, lookback=lookback)


@dataclass
class Checkpoint:
    """Current high-water mark for one job."""

    type: CheckpointType
    value: Any = None  # ISO datetime string (timestamp/watermark), int, or dict
    updated_at: str | None = None

    def effective_lower_bound(self, lookback: str | None) -> Any:
        """checkpoint - lookback (late-data window); None if no checkpoint yet.

        Lookback only applies to time-valued checkpoints; OFFSET/SEQUENCE
        and COMPOSITE (dict-valued) marks pass through unchanged — a
        composite's members advance together and rewinding one member
        without the others would re-read an inconsistent slice."""
        if self.value is None:
            return None
        if lookback is None or not isinstance(self.value, str):
            return self.value
        if self.type in (CheckpointType.OFFSET, CheckpointType.SEQUENCE):
            return self.value
        secs = parse_duration_seconds(lookback)
        ts = datetime.fromisoformat(self.value)
        return (ts - timedelta(seconds=secs)).isoformat(sep=" ")


def incremental_filter(
    df: DataFrame, config: IncrementalConfig, checkpoint: Checkpoint
) -> DataFrame:
    """Inject ``col >= checkpoint - lookback`` (pushdown-friendly)."""
    if config.mode == IncrementalMode.FULL or checkpoint.value is None:
        return df
    bound = checkpoint.effective_lower_bound(config.lookback)
    col = F.col(config.checkpoint_column)
    if config.checkpoint_type in (CheckpointType.TIMESTAMP, CheckpointType.WATERMARK):
        return df.where(col >= F.to_timestamp(F.lit(bound)))
    if config.checkpoint_type == CheckpointType.COMPOSITE:
        # dict of {column: lower_bound}; all bounds conjoined
        out = df
        for c, v in bound.items():
            out = out.where(F.col(c) >= F.lit(v))
        return out
    return df.where(col >= F.lit(bound))


def advance_checkpoint(batch: DataFrame, config: IncrementalConfig,
                       checkpoint: Checkpoint) -> Checkpoint:
    """New high-water mark = max(checkpoint_column) of the processed batch.

    One distributed 1-row aggregate; never a full-table pass because the
    batch is already the incremental slice.
    """
    if config.mode == IncrementalMode.FULL or config.checkpoint_column is None:
        return checkpoint
    row = batch.agg(F.max(config.checkpoint_column).alias("hi")).collect()[0]
    hi = row["hi"]
    if hi is None:  # empty batch → no advance
        return checkpoint
    if isinstance(hi, datetime):
        hi = hi.isoformat(sep=" ")
    return Checkpoint(
        type=config.checkpoint_type,
        value=hi,
        updated_at=datetime.now(timezone.utc).isoformat(),
    )


class CheckpointStore:
    """JSON-file-backed checkpoint registry, one entry per job_id.

    Atomic via tmp-file + ``os.replace``. Production: a Delta table keyed by
    job_id, committed post-write (see module docstring for the ordering).
    """

    def __init__(self, path: str) -> None:
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def _load(self) -> dict[str, dict]:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def get(self, job_id: str,
            default_type: CheckpointType = CheckpointType.TIMESTAMP) -> Checkpoint:
        entry = self._load().get(job_id)
        if entry is None:
            return Checkpoint(type=default_type)
        return Checkpoint(
            type=CheckpointType(entry["type"]),
            value=entry["value"],
            updated_at=entry.get("updated_at"),
        )

    def put(self, job_id: str, checkpoint: Checkpoint) -> None:
        data = self._load()
        data[job_id] = {
            "type": checkpoint.type.value,
            "value": checkpoint.value,
            "updated_at": checkpoint.updated_at,
        }
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path) or ".", suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(data, f, indent=1)
        os.replace(tmp, self.path)
