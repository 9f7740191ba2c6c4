"""Example: ETL jobs — SQL templating, incremental upsert with checkpoints,
quality gates, schedules, Airflow codegen. (parity with reference
examples/07_transformations.py, written against this engine's API)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main(sf_dir: str = SF_DIR) -> dict:
    from raise_featurestore_spark.session import get_spark
    from raise_featurestore_spark.transforms import (
        CheckpointStore, FileSystemSource, IncrementalConfig, IncrementalMode,
        Job, NullCheck, RowCountCheck, SQLTransform, Target, UniqueCheck,
    )
    from raise_featurestore_spark.transforms.orchestrator import (
        InternalOrchestrator, generate_airflow_dag,
    )
    from raise_featurestore_spark.transforms.schedule import CronSchedule

    spark = get_spark("example-07")
    work = tempfile.mkdtemp(prefix="ex07_")
    checks: dict = {}

    # --- batch SQL job: 3-way join with templated filter -----------------
    rollup = Job(
        job_id="nation_revenue",
        sources={
            "ord": FileSystemSource(path=os.path.join(sf_dir, "orders.parquet")),
            "cust": FileSystemSource(path=os.path.join(sf_dir, "customer.parquet")),
            "nat": FileSystemSource(path=os.path.join(sf_dir, "nation.parquet")),
        },
        transform=SQLTransform(
            "SELECT n.n_name AS nation, COUNT(*) AS orders, "
            "SUM(o.o_totalprice) AS revenue "
            "FROM ord o JOIN cust c ON o.o_custkey = c.c_custkey "
            "JOIN nat n ON c.c_nationkey = n.n_nationkey "
            "WHERE o.o_orderstatus = '{{status}}' GROUP BY n.n_name"
        ),
        params={"status": "F"},
        target=Target(path=os.path.join(work, "nation_revenue"), write_mode="overwrite"),
        quality_checks=[
            NullCheck(column="nation"),
            UniqueCheck(columns=["nation"]),
            RowCountCheck(expected=25, tolerance=0.2),
        ],
    )
    orch = InternalOrchestrator()
    orch.deploy(rollup, CronSchedule("0 4 * * *"))
    run = orch.trigger(spark, "nation_revenue")
    checks["sql_job"] = run.status
    checks["rows_read"] = run.rows_read
    checks["rows_written"] = run.rows_written
    checks["quality_passed"] = run.quality.passed

    # --- incremental upsert job over events ------------------------------
    store = CheckpointStore(os.path.join(work, "checkpoints.json"))
    inc = Job(
        job_id="event_features",
        sources={"ev": FileSystemSource(path=os.path.join(sf_dir, "events.parquet"))},
        transform=SQLTransform(
            "SELECT event_id, user_id, value, ts FROM ev"
        ),
        target=Target(path=os.path.join(work, "event_features"),
                      write_mode="upsert", key_columns=["event_id"],
                      sequence_column="ts"),
        incremental=IncrementalConfig(
            mode=IncrementalMode.UPSERT, checkpoint_column="ts", lookback="1h"),
        checkpoint_store=store,
    )
    run1 = inc.run(spark)
    chk1 = store.get("event_features").value
    run2 = inc.run(spark)  # nothing new beyond lookback window
    checks["incremental_first"] = run1.rows_written
    checks["incremental_second"] = run2.rows_read
    checks["checkpoint_advanced"] = chk1 is not None
    print(f"checkpoint after run1: {chk1}")

    # --- failure policy: quality gate aborts ------------------------------
    bad = Job(
        job_id="bad_job",
        sources={"n": FileSystemSource(path=os.path.join(sf_dir, "nation.parquet"))},
        transform=SQLTransform("SELECT * FROM n"),
        target=Target(path=os.path.join(work, "bad"), write_mode="overwrite"),
        quality_checks=[RowCountCheck(expected=1)],
    )
    checks["quality_gate"] = bad.run(spark).status  # "failed"

    # --- Airflow DAG codegen ----------------------------------------------
    dag_src = generate_airflow_dag(rollup, CronSchedule("0 4 * * *"))
    compile(dag_src, "<dag>", "exec")
    checks["airflow_dag_lines"] = len(dag_src.splitlines())

    for k, v in checks.items():
        print(f"{k}: {v}")
    return checks


if __name__ == "__main__":
    main()
