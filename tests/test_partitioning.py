"""Physical layout: Hive-partitioned feature-group writes give partition
pruning on read (SURVEY §4 layout decisions; reference partition_columns
surface raise_/transforms/source.py:90,124-134)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from raise_featurestore_spark.io.writer import write_feature_group
from raise_featurestore_spark.transforms.source import ObjectStorageSource

from tests.conftest import SF_DIR


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    out = str(tmp_path / "events_by_type")
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    write_feature_group(events, out, mode="overwrite", partition_by=["event_type"])

    # layout: one dir per event_type value
    parts = sorted(d for d in os.listdir(out) if d.startswith("event_type="))
    assert len(parts) >= 3

    df = spark.read.parquet(out).where(F.col("event_type") == "purchase")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # the partition predicate must land in PartitionFilters (dir-level
    # pruning: non-matching partitions are never listed, let alone read)
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]

    got = {r["event_type"] for r in df.select("event_type").distinct().collect()}
    assert got == {"purchase"}


def test_partition_path_source_skips_listing(spark, tmp_path):
    """with_partition narrows the scan path itself — object-store prefix
    pruning before any file is opened."""
    out = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("2024-01-01", 1), ("2024-01-02", 2)], "dt string, v int"
    )
    df.write.partitionBy("dt").parquet(out)

    src = ObjectStorageSource(path=out).with_partition("dt", "2024-01-02")
    rows = src.read(spark).collect()
    assert [r["v"] for r in rows] == [2]


def test_filesystem_source_orc_roundtrip(spark, tmp_path):
    from raise_featurestore_spark.transforms.source import FileSystemSource

    out = str(tmp_path / "nation_orc")
    nation = spark.read.parquet(os.path.join(SF_DIR, "nation.parquet"))
    nation.write.mode("overwrite").orc(out)
    src = FileSystemSource(path=out, format="orc")
    got = src.read(spark)
    assert got.count() == nation.count()
    assert set(got.columns) == set(nation.columns)


def test_source_format_whitelist():
    import pytest

    from raise_featurestore_spark.transforms.source import FileSystemSource

    with pytest.raises(ValueError, match="unsupported format"):
        FileSystemSource(path="/tmp/x", format="xml").read(None)


def test_plan_audit_flags_unpartitioned_window(spark):
    """VERDICT r3 item 5: the audit's window detector must flag a global
    (unpartitioned) window and pass a properly partitioned one."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "plan_audit", "/root/repo/scripts/plan_audit.py"
    )
    pa = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pa)

    from pyspark.sql import Window, functions as F

    df = spark.range(100).selectExpr("id", "id % 7 as k", "id * 2 as v")

    w_global = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    bad_plan = (
        df.select("id", F.sum("v").over(w_global).alias("s"))
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    )
    assert pa.unpartitioned_windows(bad_plan), bad_plan

    w_part = Window.partitionBy("k").orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    good_plan = (
        df.select("id", F.sum("v").over(w_part).alias("s"))
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    )
    assert pa.unpartitioned_windows(good_plan) == [], good_plan

    # order-less partitioned frame (whole-partition aggregate) is fine too
    w_frame = Window.partitionBy("k").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    frame_plan = (
        df.select("id", F.sum("v").over(w_frame).alias("s"))
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    )
    assert pa.unpartitioned_windows(frame_plan) == [], frame_plan
