"""Small-file compaction: report + rewrite for parquet feature groups.

The classic operational failure at 100 TB is not a slow plan but a slow
SCAN: a feature group appended to in many small increments accumulates
thousands of KB-sized parquet files, and every query pays the per-file
open/footer cost (and the driver pays listing + InMemoryFileIndex
memory). ``compaction_report`` quantifies the damage from the file
listing alone — no data read — and ``compact`` rewrites the table to the
target file size with one job.

Design notes:

- The report is driver-side filesystem metadata (names + sizes), the same
  information a table format keeps in its manifest — bounded by file
  COUNT, never data volume. No Spark job runs.
- ``compact`` reads once (``mergeSchema`` on: increments of an appended
  table may have evolved the schema, and a footer-sampled read would
  silently drop late columns from the rewrite) and writes
  ``ceil(total_bytes / target_size)`` files via ``coalesce`` (narrow — no
  shuffle; each output task concatenates input splits). Pass
  ``shuffle=True`` to ``repartition`` instead when the input is also
  SKEWED across files (one 5 GB file among thousands of KB files) and
  balanced outputs matter more than avoiding one shuffle.
- The rewrite stages into a temp dir and swaps, mirroring
  ``io/writer._upsert``: readers never observe a half-written table, the
  pre-swap generation is RETAINED until the next compact (an in-flight
  reader that resolved file paths pre-swap keeps scanning it instead of
  failing mid-query), and stale staging/backup dirs from crashed prior
  runs are pruned on entry.
- Partitioned layouts (``k=v`` dirs) are detected from the file listing
  and re-written with the same ``partitionBy`` automatically, so
  partition pruning survives compaction; pass ``partition_by`` only to
  CHANGE the layout.
"""

from __future__ import annotations

import glob
import math
import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024  # maxPartitionBytes default


@dataclass
class CompactionReport:
    path: str
    n_files: int
    total_bytes: int
    avg_bytes: float
    min_bytes: int
    max_bytes: int
    small_files: int  # under half the target
    target_bytes: int
    recommended_files: int

    @property
    def needs_compaction(self) -> bool:
        # worth a rewrite when most files are small AND the rewrite would
        # actually reduce the file count meaningfully
        return self.small_files > max(1, self.n_files // 2) and (
            self.recommended_files * 2 <= self.n_files
        )


def _data_files(path: str) -> list[tuple[str, int]]:
    out: list[tuple[str, int]] = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")):  # _SUCCESS, checksums, hidden
                continue
            p = os.path.join(root, f)
            out.append((p, os.path.getsize(p)))
    return out


def compaction_report(
    path: str, target_bytes: int = DEFAULT_TARGET_BYTES
) -> CompactionReport:
    """File-listing-only diagnosis of a parquet directory (no data read)."""
    files = _data_files(path)
    if not files:
        return CompactionReport(path, 0, 0, 0.0, 0, 0, 0, target_bytes, 0)
    sizes = sorted(s for _, s in files)
    total = sum(sizes)
    return CompactionReport(
        path=path,
        n_files=len(sizes),
        total_bytes=total,
        avg_bytes=total / len(sizes),
        min_bytes=sizes[0],
        max_bytes=sizes[-1],
        small_files=sum(1 for s in sizes if s < target_bytes // 2),
        target_bytes=target_bytes,
        recommended_files=max(1, math.ceil(total / target_bytes)),
    )


def _infer_partition_columns(path: str) -> list[str]:
    """Ordered ``k=v`` partition columns from the first data file's
    relative directory components (Hive layouts are uniform by
    construction)."""
    for p, _ in _data_files(path):
        rel = os.path.relpath(p, path)
        return [
            seg.split("=", 1)[0]
            for seg in rel.split(os.sep)[:-1]
            if "=" in seg
        ]
    return []


def compact(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    partition_by: list[str] | None = None,
    shuffle: bool = False,
) -> CompactionReport:
    """Rewrite ``path`` to ~``target_bytes`` files and swap (pre-swap
    generation retained one cycle). Returns the POST-compaction report."""
    base = path.rstrip("/")
    # crashed prior runs leave full-size staging copies — sweep them first
    for stale in glob.glob(f"{base}__compact_*"):
        shutil.rmtree(stale, ignore_errors=True)

    pre = compaction_report(path, target_bytes)
    if pre.n_files == 0:
        return pre
    if partition_by is None:
        partition_by = _infer_partition_columns(path)
    n_out = pre.recommended_files
    df: DataFrame = spark.read.option("mergeSchema", "true").parquet(path)
    df = df.repartition(n_out) if shuffle else df.coalesce(n_out)

    staging = f"{base}__compact_{uuid.uuid4().hex[:8]}"
    try:
        writer = df.write
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.mode("overwrite").parquet(staging)

        # prune backups from PREVIOUS compactions, retain this one until
        # the next run (same in-flight-reader contract as io/writer._upsert)
        for leftover in glob.glob(f"{base}__precompact_*"):
            shutil.rmtree(leftover, ignore_errors=True)
        backup = f"{base}__precompact_{uuid.uuid4().hex[:8]}"
        os.rename(path, backup)
        try:
            os.rename(staging, path)
        except OSError:  # roll back: the old table must survive a failed swap
            os.rename(backup, path)
            raise
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    return compaction_report(path, target_bytes)
