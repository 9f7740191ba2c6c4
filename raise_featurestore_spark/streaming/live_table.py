"""LiveTable: auto-refreshing materialized view of an Analysis.

(reference: raise_/analytics/live_table.py — LiveTable :162-209,
RefreshPolicy on_change with debounce_seconds/batch_size/track_columns
:21-90, scheduled policies :92-110, RefreshEvent history :135-158,273-328,
``query`` with filter/order_by("-col")/limit :211-252; CDC pipeline
raise_/PRD.md:1090-1167. The reference refresh is a no-op registry write;
here refresh recomputes the analysis on Spark and rewrites the
materialization, and on_change is a real Structured Streaming query.)

Design:

- The materialization is a parquet table (Delta in production — its Change
  Data Feed is the natural CDC source; plain files here). Queries against
  the live table hit the small materialized result, which is how the
  reference's <200 ms live-query target survives a 100 TB base table.
- ``start_on_change`` attaches a Structured Streaming file-source over the
  watched input directory. Each micro-batch = "changes detected";
  ``foreachBatch`` re-runs the FULL analysis (the reference's refresh
  contract is recompute, not incremental maintenance) after the debounce
  gate. ``trigger(processingTime=debounce)`` maps the reference's
  ``debounce_seconds``; ``maxFilesPerTrigger`` maps ``batch_size``.
- Refresh history is an in-memory list mirrored to a JSONL sidecar so
  ``refresh_history()`` survives restarts.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class RefreshPolicy:
    """reference: raise_/analytics/live_table.py:21-110."""

    mode: str = "manual"  # on_change | hourly | daily | weekly | manual
    debounce_seconds: int = 60
    batch_size: int = 100  # max changed files folded into one refresh
    track_columns: list[str] = field(default_factory=list)
    schedule_time: str | None = None  # "HH:MM" for daily/weekly
    timezone: str = "UTC"

    def __post_init__(self) -> None:
        allowed = {"on_change", "hourly", "daily", "weekly", "manual"}
        if self.mode not in allowed:
            raise ValueError(f"refresh mode {self.mode!r} not in {sorted(allowed)}")


@dataclass
class RefreshEvent:
    """reference: raise_/analytics/live_table.py:135-158."""

    trigger: str  # manual | on_change | scheduled
    status: str  # completed | failed
    rows_affected: int = 0
    changes_detected: int = 0
    duration_seconds: float = 0.0
    at: str = ""
    error: str | None = None


class LiveTable:
    """A named, materialized, auto-refreshable analysis result."""

    def __init__(
        self,
        name: str,
        compute: Callable[[SparkSession], DataFrame],
        storage_path: str,
        policy: RefreshPolicy | None = None,
    ) -> None:
        self.name = name
        self.compute = compute
        self.storage_path = storage_path
        self.policy = policy or RefreshPolicy()
        self.events: list[RefreshEvent] = []
        self._stream = None
        self._history_path = os.path.join(storage_path + "_history.jsonl")

    # ------------------------------------------------------------- refresh

    def refresh(self, spark: SparkSession, trigger: str = "manual",
                changes_detected: int = 0, at: datetime | None = None) -> RefreshEvent:
        t0 = time.perf_counter()
        ev = RefreshEvent(
            trigger=trigger,
            status="completed",
            changes_detected=changes_detected,
            at=(at or datetime.now(timezone.utc)).isoformat(),
        )
        try:
            result = self.compute(spark)
            # stage-and-swap (same pattern as the upsert writer): readers
            # never see a half-written materialization, and the PREVIOUS
            # generation is retained until the next refresh so an in-flight
            # query holding pre-swap file references keeps scanning the
            # retained backup instead of failing mid-scan (local-FS
            # directories can't be swapped atomically)
            staging = f"{self.storage_path}__staging_{uuid.uuid4().hex[:8]}"
            result.write.mode("overwrite").parquet(staging)
            n = spark.read.parquet(staging).count()
            if os.path.exists(self.storage_path):
                import glob
                import shutil

                for leftover in glob.glob(f"{self.storage_path}__old_*"):
                    shutil.rmtree(leftover, ignore_errors=True)
                old = f"{self.storage_path}__old_{uuid.uuid4().hex[:8]}"
                os.rename(self.storage_path, old)
                os.rename(staging, self.storage_path)
            else:
                os.rename(staging, self.storage_path)
            ev.rows_affected = n
        except Exception as ex:
            ev.status = "failed"
            ev.error = f"{type(ex).__name__}: {ex}"[:500]
        ev.duration_seconds = round(time.perf_counter() - t0, 3)
        self.events.append(ev)
        self._log_event(ev)
        return ev

    def _log_event(self, ev: RefreshEvent) -> None:
        os.makedirs(os.path.dirname(self._history_path) or ".", exist_ok=True)
        with open(self._history_path, "a") as f:
            f.write(json.dumps(ev.__dict__) + "\n")

    # ----------------------------------------------------------- schedule

    def scheduled_due(self, now: datetime | None = None) -> bool:
        """True when the hourly/daily/weekly policy calls for a refresh:
        the most recent scheduling boundary (top of hour; ``schedule_time``
        today; Monday ``schedule_time``) has passed with no completed
        refresh since. Callers drive this from their own ticker (cron, the
        orchestrator codegen, a driver loop) — the engine deliberately
        owns no background thread, matching the job scheduler split in
        transforms/schedule.py."""
        from datetime import timedelta
        from zoneinfo import ZoneInfo

        p = self.policy
        if p.mode not in ("hourly", "daily", "weekly"):
            return False
        tz = ZoneInfo(p.timezone)
        now_l = (now or datetime.now(timezone.utc)).astimezone(tz)
        if p.mode == "hourly":
            boundary = now_l.replace(minute=0, second=0, microsecond=0)
        else:
            hh, mm = map(int, (p.schedule_time or "00:00").split(":"))
            boundary = now_l.replace(hour=hh, minute=mm, second=0, microsecond=0)
            if boundary > now_l:
                boundary -= timedelta(days=1)
            if p.mode == "weekly":
                boundary -= timedelta(days=boundary.weekday())  # back to Monday
        done = [
            datetime.fromisoformat(e.at).astimezone(tz)
            for e in self.refresh_history()
            if e.status == "completed" and e.at
        ]
        return not done or max(done) < boundary

    def run_pending(
        self, spark: SparkSession, now: datetime | None = None
    ) -> RefreshEvent | None:
        """Refresh if the schedule is due; the scheduled-mode entry point."""
        if self.scheduled_due(now):
            return self.refresh(spark, trigger="scheduled", at=now)
        return None

    def refresh_history(self) -> list[RefreshEvent]:
        if not self.events and os.path.exists(self._history_path):
            with open(self._history_path) as f:
                self.events = [RefreshEvent(**json.loads(line)) for line in f]
        return list(self.events)

    # --------------------------------------------------------------- query

    def query(
        self,
        spark: SparkSession,
        filter: str | None = None,
        order_by: str | None = None,
        limit: int | None = None,
    ) -> DataFrame:
        """Filter/sort/limit over the materialized rows; leading ``-`` on
        ``order_by`` means descending (reference: live_table.py:242-252).
        sort+limit lowers to TakeOrderedAndProject (top-k, no full sort)."""
        df = spark.read.parquet(self.storage_path)
        if filter:
            df = df.where(filter)
        if order_by:
            if order_by.startswith("-"):
                df = df.orderBy(F.col(order_by[1:]).desc())
            else:
                df = df.orderBy(order_by)
        if limit is not None:
            df = df.limit(limit)
        return df

    # ----------------------------------------------------------- on_change

    def start_on_change(
        self,
        spark: SparkSession,
        watch_path: str,
        schema: Any,
        checkpoint_dir: str,
        format: str = "parquet",
    ):
        """Attach a Structured Streaming change source: every micro-batch
        of changes under ``watch_path`` triggers a refresh. Returns the
        StreamingQuery (caller owns its lifecycle).

        ``format="delta-cdf"`` reads the Delta table's Change Data Feed —
        the production CDC source (reference: raise_/analytics/
        live_table.py:21-57; requires delta-spark on the classpath and
        ``delta.enableChangeDataFeed=true`` on the table; schema comes from
        the Delta log, so ``schema`` is ignored). Any other format is a
        file source over newly arrived files — the no-Delta stand-in, same
        foreachBatch refresh contract either way."""
        if self.policy.mode != "on_change":
            raise ValueError("policy mode must be on_change")
        if format == "delta-cdf":
            stream = (
                spark.readStream.format("delta")
                .option("readChangeFeed", "true")
                .option("maxFilesPerTrigger", str(self.policy.batch_size))
                .load(watch_path)
            )
            # CDF change-metadata rows count as detected changes; only the
            # actual data columns are tracked
            stream = stream.drop("_change_type", "_commit_version", "_commit_timestamp")
        else:
            reader = (
                spark.readStream.format(format)
                .schema(schema)
                .option("maxFilesPerTrigger", str(self.policy.batch_size))
            )
            stream = reader.load(watch_path)
        if self.policy.track_columns:
            stream = stream.select(*self.policy.track_columns)

        def on_batch(batch_df: DataFrame, batch_id: int) -> None:
            changes = batch_df.count()
            if changes == 0:
                return
            self.refresh(spark, trigger="on_change", changes_detected=changes)

        self._stream = (
            stream.writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(processingTime=f"{self.policy.debounce_seconds} seconds")
            .start()
        )
        return self._stream

    def stop(self) -> None:
        if self._stream is not None:
            self._stream.stop()
            self._stream = None
