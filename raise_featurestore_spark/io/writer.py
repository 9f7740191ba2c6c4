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

import glob
import os
import shutil
import uuid

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _latest_per_key(updates: DataFrame, key_columns: list[str],
                    sequence_column: str | None) -> DataFrame:
    """One row per key from the update batch.

    With ``sequence_column`` the winner is the row with the greatest
    sequence value (deterministic — the semantics of a sequenced MERGE,
    ties broken arbitrarily). Without it, ``dropDuplicates`` picks an
    ARBITRARY row per key: fine when a batch can't contain two versions of
    one key (e.g. keyed CDC compaction upstream), nondeterministic
    otherwise — an incremental batch whose lookback window re-reads an old
    row alongside its correction MUST pass a sequence column.
    """
    if sequence_column is None:
        return updates.dropDuplicates(key_columns)
    w = Window.partitionBy(*key_columns).orderBy(F.col(sequence_column).desc())
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def write_feature_group(
    df: DataFrame,
    path: str,
    mode: str = "append",
    key_columns: list[str] | None = None,
    partition_by: list[str] | None = None,
    sequence_column: str | None = None,
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
        _upsert(df, path, key_columns, partition_by, sequence_column)
        return
    raise ValueError(f"unknown write mode {mode!r}")


def _try_delta_merge(updates: DataFrame, path: str, key_columns: list[str],
                     sequence_column: str | None) -> bool:
    """Transactional ``MERGE INTO`` when delta-spark is on the classpath AND
    the target is a Delta table (capability-gated — this sandbox has plain
    parquet, so the rewrite below is the tested path). Returns False to fall
    back. At 100 TB this is the right branch: MERGE prunes untouched files
    via the Delta log instead of rewriting the table."""
    try:
        from delta.tables import DeltaTable
    except ImportError:
        return False
    spark = updates.sparkSession
    try:
        if not DeltaTable.isDeltaTable(spark, path):
            return False
        target = DeltaTable.forPath(spark, path)
    except Exception:
        return False
    deduped = _latest_per_key(updates, key_columns, sequence_column)
    cond = " AND ".join(f"t.`{k}` = s.`{k}`" for k in key_columns)
    m = target.alias("t").merge(deduped.alias("s"), cond)
    if sequence_column is None:
        m = m.whenMatchedUpdateAll()
    else:
        # sequenced MERGE: a late/replayed batch carrying an OLDER sequence
        # must not regress the stored row; updates win sequence ties
        m = m.whenMatchedUpdateAll(
            condition=f"s.`{sequence_column}` >= t.`{sequence_column}`"
        )
    m.whenNotMatchedInsertAll().execute()
    return True


def _upsert(updates: DataFrame, path: str, key_columns: list[str],
            partition_by: list[str] | None, sequence_column: str | None = None) -> None:
    spark = updates.sparkSession
    if _try_delta_merge(updates, path, key_columns, sequence_column):
        return
    if not os.path.exists(path):
        w = _latest_per_key(updates, key_columns, sequence_column).write
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.mode("overwrite").parquet(path)
        return
    # dedupe the batch itself first so the merge is deterministic; no
    # broadcast hint on the key frame — a backfill-sized update batch
    # would blow the broadcast limit, and Catalyst/AQE already broadcasts
    # small sides on its own
    deduped = _latest_per_key(updates, key_columns, sequence_column)
    old = spark.read.parquet(path)
    if sequence_column is None:
        # updates win on key collision
        kept = old.join(deduped.select(*key_columns), on=key_columns, how="left_anti")
        merged = kept.unionByName(deduped, allowMissingColumns=True)
    else:
        # sequenced upsert across batches: the STORED row wins when its
        # sequence is newer (late/replayed batches must not regress a
        # key); updates win ties. Mirrors the Delta MERGE condition above.
        tagged = old.withColumn("__src", F.lit(0)).unionByName(
            deduped.withColumn("__src", F.lit(1)), allowMissingColumns=True
        )
        w_seq = Window.partitionBy(*key_columns).orderBy(
            F.col(sequence_column).desc(), F.col("__src").desc()
        )
        merged = (
            tagged.withColumn("__rn", F.row_number().over(w_seq))
            .where(F.col("__rn") == 1)
            .drop("__rn", "__src")
        )

    staging = f"{path}__staging_{uuid.uuid4().hex[:8]}"
    w = merged.write
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.mode("overwrite").parquet(staging)
    # Prune backups from PREVIOUS upserts, then keep this one until the
    # next refresh: an in-flight reader that resolved file paths against
    # the pre-swap directory keeps scanning the retained backup instead of
    # failing mid-query. (Local-FS staging can't swap two directories
    # atomically; the retained generation is the pragmatic middle ground —
    # the transactional answer is the Delta MERGE branch above.)
    for leftover in glob.glob(f"{path}__old_*"):
        shutil.rmtree(leftover, ignore_errors=True)
    backup = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, backup)
    os.rename(staging, path)
