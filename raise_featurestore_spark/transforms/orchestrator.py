"""Orchestrators: in-process runner + Airflow DAG code generation.

(reference: raise_/transforms/orchestrator.py:18-163 internal orchestrator;
raise_/transforms/airflow.py:64-290 + raise_/PRD.md:1663-1757 DAG codegen)

The internal orchestrator runs deployed jobs in-process against a live
SparkSession — enough for tests and single-node batches. The Airflow
generator emits a self-contained DAG file per job; schedule kinds map to
``schedule_interval`` (cron string, timedelta, or None for manual/once).
Dagster/Prefect would plug in behind the same ``deploy`` protocol.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import SparkSession

from raise_featurestore_spark.transforms.job import Job, JobRun
from raise_featurestore_spark.transforms.schedule import (
    CronSchedule,
    IntervalSchedule,
    ManualSchedule,
    OnceSchedule,
    OnChangeSchedule,
    Schedule,
)


@dataclass
class InternalOrchestrator:
    """In-process job registry + trigger (reference: raise_/transforms/orchestrator.py:18-163)."""

    jobs: dict[str, tuple[Job, Schedule | None]] = field(default_factory=dict)

    def deploy(self, job: Job, schedule: Schedule | None = None) -> None:
        job.deploy()
        self.jobs[job.job_id] = (job, schedule)

    def trigger(self, spark: SparkSession, job_id: str,
                execution_date: datetime | None = None) -> JobRun:
        job, _ = self.jobs[job_id]
        return job.run(spark, execution_date)

    def due_jobs(self, now: datetime, last_runs: dict[str, datetime]) -> list[str]:
        due = []
        for job_id, (_, sched) in self.jobs.items():
            if sched is None or isinstance(sched, (ManualSchedule, OnChangeSchedule)):
                continue
            last = last_runs.get(job_id, datetime.min)
            nxt = sched.next_run(last)
            if nxt is not None and nxt <= now:
                due.append(job_id)
        return due


def schedule_to_airflow(schedule: Schedule | None) -> str:
    if isinstance(schedule, CronSchedule):
        return repr(schedule.expression)
    if isinstance(schedule, IntervalSchedule):
        return f"timedelta(seconds={schedule.seconds})"
    if isinstance(schedule, OnceSchedule):
        return '"@once"'
    return "None"  # manual / on-change (externally triggered)


def generate_airflow_dag(job: Job, schedule: Schedule | None = None,
                         owner: str = "featurestore") -> str:
    """Emit a runnable Airflow DAG module for one job
    (reference: raise_/transforms/airflow.py:145-268, raise_/PRD.md:1663-1757)."""
    retries = job.max_retries
    return f'''"""Auto-generated Airflow DAG for featurestore job {job.job_id!r}."""
from datetime import datetime, timedelta

from airflow import DAG
from airflow.operators.python import PythonOperator


def _run_job(**context):
    from pyspark.sql import SparkSession
    from my_featurestore_jobs import build_job_{job.job_id}  # user-provided factory

    spark = SparkSession.builder.getOrCreate()
    job = build_job_{job.job_id}()
    run = job.run(spark, execution_date=context["logical_date"])
    if run.status != "completed":
        raise RuntimeError(f"job failed: {{run.error}}")
    return run.metrics()


with DAG(
    dag_id="featurestore_{job.job_id}",
    schedule_interval={schedule_to_airflow(schedule)},
    start_date=datetime(2024, 1, 1),
    catchup=False,
    default_args={{
        "owner": {owner!r},
        "retries": {retries},
        "retry_delay": timedelta(minutes=5),
    }},
    tags=["featurestore"],
) as dag:
    run_transform = PythonOperator(
        task_id="run_transform",
        python_callable=_run_job,
    )
'''
