"""Format-whitelist coverage (VERDICT.md r4 items 3-4): every format in
``transforms/source.FORMATS`` is either exercised against a real fixture or
explicitly skip-marked with the missing capability.

- parquet/csv/json/jsonl: oracle-green via the source_* registry queries.
- ORC ships inside Spark — full round-trip through the source specs here.
- avro needs the external spark-avro module; delta/iceberg need their
  connector packages. Absent in this sandbox → the tests skip with the
  reason, and run for real the moment the package lands on the classpath.
  The Delta tests cover the two branches the reference blesses
  (raise_/PRD.md:2505): transactional MERGE upsert (io/writer.py
  ``_try_delta_merge``, incl. the sequenced late-batch rule) and the
  LiveTable Change-Data-Feed refresh source
  (streaming/live_table.py ``start_on_change(format="delta-cdf")``).
"""

from __future__ import annotations

import os

import pytest

from raise_featurestore_spark.transforms.source import (
    FileSystemSource,
    ObjectStorageSource,
)


def _has_module(spark, fmt: str) -> bool:
    """Probe a datasource by attempting a zero-row write."""
    import tempfile

    try:
        spark.range(0).write.format(fmt).save(
            os.path.join(tempfile.mkdtemp(), f"probe_{fmt}")
        )
        return True
    except Exception:
        return False


def _has_delta() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


# --------------------------------------------------------------------- ORC


def test_orc_roundtrip_through_source_specs(spark, tmp_path):
    path = str(tmp_path / "orc_table")
    df = spark.range(100).selectExpr(
        "id", "CAST(id * 1.5 AS DOUBLE) AS v", "concat('k', id % 7) AS k"
    )
    df.write.orc(path)

    got = ObjectStorageSource(path=path, format="orc").read(spark)
    assert got.count() == 100
    assert set(got.columns) == {"id", "v", "k"}

    fs = FileSystemSource(path=path, format="orc", glob="*.orc").read(spark)
    assert fs.count() == 100
    # projection+filter stay pushable on ORC scans too
    plan = (
        got.select("id").where("id < 10")._jdf.queryExecution().executedPlan().toString()
    )
    assert "FileScan orc" in plan and "LessThan(id,10)" in plan


def test_orc_partitioned_prunes_path(spark, tmp_path):
    path = str(tmp_path / "orc_part")
    df = spark.range(40).selectExpr("id", "CAST(id % 4 AS STRING) AS dt")
    df.write.partitionBy("dt").orc(path)
    pruned = (
        ObjectStorageSource(path=path, format="orc", partition_columns=["dt"])
        .with_partition("dt", "2")
        .read(spark)
    )
    assert pruned.count() == 10


# -------------------------------------------------------------------- avro


def test_avro_roundtrip_or_skip(spark, tmp_path):
    if not _has_module(spark, "avro"):
        pytest.skip("spark-avro module not on the classpath in this sandbox")
    path = str(tmp_path / "avro_table")
    spark.range(50).selectExpr("id", "concat('s', id) AS s").write.format(
        "avro"
    ).save(path)
    got = ObjectStorageSource(path=path, format="avro").read(spark)
    assert got.count() == 50 and set(got.columns) == {"id", "s"}


# ----------------------------------------------------------------- iceberg


def test_iceberg_roundtrip_or_skip(spark, tmp_path):
    if not _has_module(spark, "iceberg"):
        pytest.skip("iceberg-spark runtime not on the classpath in this sandbox")
    path = str(tmp_path / "iceberg_table")
    spark.range(25).write.format("iceberg").save(path)
    got = ObjectStorageSource(path=path, format="iceberg").read(spark)
    assert got.count() == 25


# ------------------------------------------------------------------- delta


# Delta needs its SQL extension + catalog as STATIC session confs; a
# getOrCreate() next to the suite's live session would silently return
# that session with the confs ignored, and the tests would fail exactly
# when delta-spark IS installed. Each scenario therefore runs in its own
# subprocess with a fresh, delta-configured SparkSession.

_DELTA_PRELUDE = """
import sys
sys.path.insert(0, {repo!r})
from delta import configure_spark_with_delta_pip
from pyspark.sql import SparkSession
spark = configure_spark_with_delta_pip(
    SparkSession.builder.appName("delta-tests").master("local[4]")
    .config("spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension")
    .config("spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog")
).getOrCreate()
"""


def _run_delta_script(body: str, tmp_path) -> None:
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _DELTA_PRELUDE.format(repo=repo) + body.format(tmp=str(tmp_path))
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=600
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"


@pytest.mark.skipif(not _has_delta(), reason="delta-spark not installed in this sandbox")
class TestDeltaPaths:
    def test_merge_upsert_updates_and_inserts(self, tmp_path):
        _run_delta_script(
            """
from raise_featurestore_spark.io.writer import write_feature_group
path = {tmp!r} + "/delta_merge"
spark.createDataFrame([(1, "a", 1), (2, "b", 1)],
                      "k long, v string, seq long"
                      ).write.format("delta").save(path)
write_feature_group(
    spark.createDataFrame([(2, "B", 2), (3, "c", 2)], "k long, v string, seq long"),
    path, mode="upsert", key_columns=["k"])
got = {{r.k: r.v for r in spark.read.format("delta").load(path).collect()}}
assert got == {{1: "a", 2: "B", 3: "c"}}, got
""",
            tmp_path,
        )

    def test_sequenced_merge_rejects_late_batch(self, tmp_path):
        _run_delta_script(
            """
from raise_featurestore_spark.io.writer import write_feature_group
path = {tmp!r} + "/delta_seq"
spark.createDataFrame([(1, "new", 5)], "k long, v string, seq long"
                      ).write.format("delta").save(path)
# replayed batch with an OLDER sequence must not regress the row
write_feature_group(
    spark.createDataFrame([(1, "stale", 3)], "k long, v string, seq long"),
    path, mode="upsert", key_columns=["k"], sequence_column="seq")
rows = spark.read.format("delta").load(path).collect()
assert rows[0].v == "new", rows
""",
            tmp_path,
        )

    def test_live_table_cdf_refresh(self, tmp_path):
        _run_delta_script(
            """
import time
from raise_featurestore_spark.streaming.live_table import LiveTable, RefreshPolicy
src = {tmp!r} + "/cdf_src"
spark.sql("CREATE TABLE delta.`" + src + "` (k LONG, v DOUBLE) USING delta "
          "TBLPROPERTIES (delta.enableChangeDataFeed = true)")
lt = LiveTable(
    name="cdf_live",
    compute=lambda sp: sp.read.format("delta").load(src).groupBy().count(),
    storage_path={tmp!r} + "/cdf_mat",
    policy=RefreshPolicy(mode="on_change", debounce_seconds=1))
q = lt.start_on_change(spark, src, schema=None,
                       checkpoint_dir={tmp!r} + "/ckpt", format="delta-cdf")
try:
    spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double"
                          ).write.format("delta").mode("append").save(src)
    deadline = time.time() + 60
    while time.time() < deadline:
        if any(e.trigger == "on_change" for e in lt.refresh_history()):
            break
        time.sleep(1)
    assert any(e.trigger == "on_change" for e in lt.refresh_history())
finally:
    q.stop()
""",
            tmp_path,
        )
