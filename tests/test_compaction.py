"""Small-file compaction (io/compaction.py): report math, rewrite
round-trip, atomic swap, partitioned layouts."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from raise_featurestore_spark.io.compaction import (
    compact,
    compaction_report,
)


@pytest.fixture()
def fragmented(spark, tmp_path):
    """200 rows written as ~40 tiny files (the many-small-appends shape)."""
    path = str(tmp_path / "frag")
    for batch in range(8):
        spark.range(batch * 25, (batch + 1) * 25).select(
            F.col("id"), (F.col("id") % 3).alias("g"), F.rand(seed=batch).alias("v")
        ).repartition(5).write.mode("append").parquet(path)
    return path


def test_report_counts_only_data_files(fragmented):
    rep = compaction_report(fragmented, target_bytes=1 << 20)
    n_parquet = len(glob.glob(os.path.join(fragmented, "*.parquet")))
    assert rep.n_files == n_parquet > 10
    assert rep.small_files == rep.n_files  # all far under 512 KiB
    assert rep.recommended_files == 1
    assert rep.needs_compaction


def test_compact_preserves_rows_and_reduces_files(spark, fragmented):
    before = spark.read.parquet(fragmented)
    rows_before = sorted(r.id for r in before.collect())
    rep = compact(spark, fragmented, target_bytes=1 << 20)
    assert rep.n_files == 1
    after = spark.read.parquet(fragmented)
    assert sorted(r.id for r in after.collect()) == rows_before
    assert not rep.needs_compaction
    # the pre-swap generation is RETAINED one cycle for in-flight readers
    # (io/writer._upsert contract); no staging dirs survive
    parent = os.path.dirname(fragmented)
    leftovers = [d for d in os.listdir(parent) if "compact" in d]
    assert len(leftovers) == 1 and "__precompact_" in leftovers[0]
    # ...and the NEXT compact prunes it
    compact(spark, fragmented, target_bytes=1 << 20)
    leftovers = [
        d for d in os.listdir(parent) if "compact" in d and "__precompact_" in d
    ]
    assert len(leftovers) == 1  # only the newest generation survives


def test_compact_partitioned_keeps_pruning(spark, fragmented):
    # re-shape as a partitioned table, fragment each partition
    part = fragmented + "_bypart"
    spark.read.parquet(fragmented).repartition(6).write.partitionBy("g").parquet(part)
    rep = compact(spark, part, target_bytes=1 << 20, partition_by=["g"])
    assert rep.n_files <= 3  # one file per g partition
    pruned = spark.read.parquet(part).where("g = 1")
    assert pruned.count() == spark.read.parquet(fragmented).where("id % 3 = 1").count()
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(g" in plan


def test_empty_dir_report(tmp_path):
    rep = compaction_report(str(tmp_path / "nothing_here"))
    assert rep.n_files == 0 and not rep.needs_compaction


def test_partition_columns_inferred_automatically(spark, fragmented):
    part = fragmented + "_autopart"
    spark.read.parquet(fragmented).repartition(6).write.partitionBy("g").parquet(part)
    rep = compact(spark, part)  # no partition_by passed
    assert rep.n_files <= 3
    # k=v layout survived: pruning still applies
    plan = (
        spark.read.parquet(part)
        .where("g = 1")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(g" in plan


def test_compact_merges_evolved_schema(spark, tmp_path):
    # increments with an extra column must not be dropped by the rewrite
    path = str(tmp_path / "evolved")
    spark.range(10).write.parquet(path)
    spark.range(10, 20).withColumn("late_col", F.lit("x")).write.mode(
        "append"
    ).parquet(path)
    compact(spark, path, target_bytes=1 << 20)
    cols = set(spark.read.option("mergeSchema", "true").parquet(path).columns)
    assert cols == {"id", "late_col"}
