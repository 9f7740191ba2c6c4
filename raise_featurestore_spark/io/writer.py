"""Feature-group writer: append / overwrite / upsert.

(reference: Target.write_mode in raise_/transforms/job.py:41-71,
upsert semantics raise_/PRD.md:1523-1540)

With Delta/Iceberg available, upsert is ``MERGE INTO ... WHEN MATCHED
UPDATE WHEN NOT MATCHED INSERT`` on the key columns — transactional and
able to prune untouched files. This environment has plain parquet only, so
upsert is implemented as the equivalent relational rewrite:

    new_table = old ANTI JOIN updates ON keys  UNION ALL  updates

staged into a temp directory and atomically swapped in. The anti-join is a
broadcast when the update batch is small (the common incremental case), so
the rewrite cost is one scan of the old table. At 100 TB you would (a) use
Delta MERGE, and (b) partition/cluster by the key so the join prunes files;
the helper keeps that contract by requiring explicit key_columns.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_feature_group(
    df: DataFrame,
    path: str,
    mode: str = "append",
    key_columns: list[str] | None = None,
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if mode == "append":
        writer.mode("append").parquet(path)
        return
    if mode == "overwrite":
        writer.mode("overwrite").parquet(path)
        return
    if mode == "upsert":
        if not key_columns:
            raise ValueError("upsert requires key_columns")
        _upsert(df, path, key_columns, partition_by)
        return
    raise ValueError(f"unknown write mode {mode!r}")


def _upsert(updates: DataFrame, path: str, key_columns: list[str],
            partition_by: list[str] | None) -> None:
    spark = updates.sparkSession
    if not os.path.exists(path):
        w = updates.write
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.mode("overwrite").parquet(path)
        return
    # updates win on key collision; dedupe the batch itself first so the
    # anti-join and union are deterministic
    deduped = updates.dropDuplicates(key_columns)
    old = spark.read.parquet(path)
    kept = old.join(F.broadcast(deduped.select(*key_columns)), on=key_columns, how="left_anti")
    merged = kept.unionByName(deduped, allowMissingColumns=True)

    staging = f"{path}__staging_{uuid.uuid4().hex[:8]}"
    w = merged.write
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.mode("overwrite").parquet(staging)
    backup = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
