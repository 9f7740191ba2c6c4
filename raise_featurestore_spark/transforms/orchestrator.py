"""Orchestrators: in-process runner + Airflow/Dagster/Prefect codegen.

(reference: raise_/transforms/orchestrator.py:18-163 declares the pluggable
orchestrator protocol with AIRFLOW/DAGSTER/PREFECT/INTERNAL types and a
``generate_definition`` hook; raise_/transforms/airflow.py:64-290 +
raise_/PRD.md:1663-1757 DAG codegen)

The internal orchestrator runs deployed jobs in-process against a live
SparkSession — enough for tests and single-node batches. The external
generators each emit a self-contained definition module per job: Airflow
(DAG + PythonOperator), Dagster (@op/@job + ScheduleDefinition), Prefect
(@flow + cron/interval deployment schedule). Schedule kinds map to each
engine's native form; manual/on-change jobs get no schedule (externally
triggered). None of the three engines ships in this sandbox, so each
generated module is validated by compiling it (``compile()``) rather than
importing the engine.
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


def _ident(job_id: str) -> str:
    """job_id → a safe Python identifier fragment for generated modules.
    Job ids are arbitrary strings (``daily-rollup``); interpolating them
    into def/variable names verbatim would emit SyntaxError modules."""
    import re

    out = re.sub(r"\W", "_", job_id)
    return f"_{out}" if out and out[0].isdigit() else (out or "job")


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
    ident = _ident(job.job_id)
    return f'''"""Auto-generated Airflow DAG for featurestore job {job.job_id!r}."""
from datetime import datetime, timedelta

from airflow import DAG
from airflow.operators.python import PythonOperator


def _run_job(**context):
    from pyspark.sql import SparkSession
    from my_featurestore_jobs import build_job_{ident}  # user-provided factory

    spark = SparkSession.builder.getOrCreate()
    job = build_job_{ident}()
    run = job.run(spark, execution_date=context["logical_date"])
    if run.status != "completed":
        raise RuntimeError(f"job failed: {{run.error}}")
    return run.metrics()


with DAG(
    dag_id="featurestore_{ident}",
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


@dataclass
class TransformsClient:
    """Orchestrator selection facade (reference: raise_/transforms/
    client.py:180-260): ``fs.transforms.use_airflow(...)`` /
    ``use_dagster()`` / ``use_prefect()`` / ``use_internal()`` pick the
    engine; ``generate_definition(job)`` emits its definition module;
    deploy/trigger run through the in-process registry either way (the
    external engines execute the generated modules on their own
    schedulers)."""

    orchestrator: InternalOrchestrator = field(default_factory=InternalOrchestrator)
    engine: str = "internal"
    engine_options: dict = field(default_factory=dict)

    def use_airflow(self, airflow_url: str = "http://localhost:8080") -> "TransformsClient":
        self.engine = "airflow"
        self.engine_options = {"airflow_url": airflow_url}
        return self

    def use_dagster(self) -> "TransformsClient":
        self.engine = "dagster"
        self.engine_options = {}
        return self

    def use_prefect(self) -> "TransformsClient":
        self.engine = "prefect"
        self.engine_options = {}
        return self

    def use_internal(self) -> "TransformsClient":
        self.engine = "internal"
        self.engine_options = {}
        return self

    def create_job(self, name: str, sources=None, transform=None, target=None,
                   schedule: Schedule | None = None, incremental=None, **kwargs) -> Job:
        """Job factory (reference: raise_/transforms/client.py:47 via
        raise_/client.py:689): builds, validates, deploys, and registers
        the job under ``name`` with its schedule."""
        from raise_featurestore_spark.transforms.checkpoint import IncrementalConfig
        from raise_featurestore_spark.transforms.job import Target

        if sources is not None and not isinstance(sources, dict):
            src_list = sources if isinstance(sources, (list, tuple)) else [sources]
            sources = {
                getattr(s, "alias", None) or f"src{i}": s
                for i, s in enumerate(src_list)
            }
        if isinstance(target, str):
            target = Target(path=target)
        job = Job(
            job_id=name,
            sources=sources or {},
            transform=transform,
            target=target,
            incremental=incremental or IncrementalConfig(),
            **kwargs,
        )
        job.validate()
        self.deploy(job, schedule)
        return job

    def get_job(self, name: str) -> Job:
        return self.orchestrator.jobs[name][0]

    def list_jobs(self) -> list[Job]:
        return [j for j, _ in self.orchestrator.jobs.values()]

    def generate_dag(self, job: Job | str) -> str:
        """Reference-named alias of :meth:`generate_definition`
        (raise_/transforms/client.py:238); accepts a job or its name."""
        if isinstance(job, str):
            job, sched = self.orchestrator.jobs[job]
        else:
            sched = self.orchestrator.jobs.get(job.job_id, (None, None))[1]
        return self.generate_definition(job, sched)

    def deploy(self, job: Job, schedule: Schedule | None = None) -> None:
        self.orchestrator.deploy(job, schedule)

    def trigger(self, spark: SparkSession, job_id: str,
                execution_date: datetime | None = None) -> JobRun:
        return self.orchestrator.trigger(spark, job_id, execution_date)

    def generate_definition(self, job: Job, schedule: Schedule | None = None) -> str:
        """The selected engine's definition module for a job (reference
        protocol: raise_/transforms/orchestrator.py:62-66)."""
        if self.engine == "airflow":
            return generate_airflow_dag(job, schedule)
        if self.engine == "dagster":
            return generate_dagster_job(job, schedule)
        if self.engine == "prefect":
            return generate_prefect_flow(job, schedule)
        raise ValueError(
            f"internal orchestrator has no definition module (engine={self.engine!r})"
        )


def schedule_to_dagster(schedule: Schedule | None) -> str | None:
    """Dagster cron string, or None for unscheduled (manual/on-change).
    Interval schedules render as a */N cron, which only preserves the
    cadence when N divides the clock period (a */35 cron fires at :00 and
    :35 — 35- and 25-minute gaps). Intervals that don't divide evenly into
    an hour (or whole hours into a day) are REJECTED rather than silently
    distorted; express those as an explicit CronSchedule instead.
    Sub-minute intervals round up to 1 minute."""
    if isinstance(schedule, CronSchedule):
        return schedule.expression
    if isinstance(schedule, IntervalSchedule):
        minutes = max(1, int(schedule.seconds // 60))
        if minutes < 60:
            if 60 % minutes != 0:
                raise ValueError(
                    f"{minutes}-minute interval does not divide an hour; a */N "
                    f"cron would distort the cadence — use an explicit CronSchedule"
                )
            return f"*/{minutes} * * * *"
        hours, rem = divmod(minutes, 60)
        if rem != 0 or 24 % hours != 0:
            raise ValueError(
                f"{minutes}-minute interval does not map to an even cron cadence; "
                f"use an explicit CronSchedule"
            )
        return f"0 */{hours} * * *"
    if isinstance(schedule, OnceSchedule):
        return None  # trigger once externally; Dagster has no "@once"
    return None


def generate_dagster_job(job: Job, schedule: Schedule | None = None) -> str:
    """Emit a runnable Dagster definitions module for one job (op + job +
    optional ScheduleDefinition), mirroring the Airflow generator
    (reference protocol: raise_/transforms/orchestrator.py:18-66)."""
    cron = schedule_to_dagster(schedule)
    retries = job.max_retries
    ident = _ident(job.job_id)
    sched_block = (
        f'''

featurestore_{ident}_schedule = ScheduleDefinition(
    job=featurestore_{ident},
    cron_schedule={cron!r},
)

defs = Definitions(
    jobs=[featurestore_{ident}],
    schedules=[featurestore_{ident}_schedule],
)
'''
        if cron
        else f'''

defs = Definitions(jobs=[featurestore_{ident}])
'''
    )
    return f'''"""Auto-generated Dagster definitions for featurestore job {job.job_id!r}."""
from dagster import Definitions, OpExecutionContext, RetryPolicy, ScheduleDefinition, job, op


@op(retry_policy=RetryPolicy(max_retries={retries}))
def run_transform_{ident}(context: OpExecutionContext):
    from pyspark.sql import SparkSession
    from my_featurestore_jobs import build_job_{ident}  # user-provided factory

    spark = SparkSession.builder.getOrCreate()
    run = build_job_{ident}().run(spark)
    if run.status != "completed":
        raise RuntimeError(f"job failed: {{run.error}}")
    return run.metrics()


@job(tags={{"featurestore": "true"}})
def featurestore_{ident}():
    run_transform_{ident}()
{sched_block}'''


def schedule_to_prefect(schedule: Schedule | None) -> str | None:
    """Prefect schedule constructor source, or None for unscheduled."""
    if isinstance(schedule, CronSchedule):
        return f"CronSchedule(cron={schedule.expression!r})"
    if isinstance(schedule, IntervalSchedule):
        return f"IntervalSchedule(interval=timedelta(seconds={schedule.seconds}))"
    return None  # once / manual / on-change: run via `prefect deployment run`


def generate_prefect_flow(job: Job, schedule: Schedule | None = None) -> str:
    """Emit a runnable Prefect flow module for one job, with the schedule
    attached via ``Flow.serve`` when the kind maps to one."""
    sched_src = schedule_to_prefect(schedule)
    retries = job.max_retries
    ident = _ident(job.job_id)
    serve = (
        f"    featurestore_{ident}.serve(\n"
        f'        name="featurestore_{job.job_id}",\n'
        f"        schedule={sched_src},\n"
        f"    )"
        if sched_src
        else f'    featurestore_{ident}.serve(name="featurestore_{job.job_id}")'
    )
    return f'''"""Auto-generated Prefect flow for featurestore job {job.job_id!r}."""
from datetime import timedelta

from prefect import flow
from prefect.client.schemas.schedules import CronSchedule, IntervalSchedule


@flow(name="featurestore_{job.job_id}", retries={retries}, retry_delay_seconds=300)
def featurestore_{ident}():
    from pyspark.sql import SparkSession
    from my_featurestore_jobs import build_job_{ident}  # user-provided factory

    spark = SparkSession.builder.getOrCreate()
    run = build_job_{ident}().run(spark)
    if run.status != "completed":
        raise RuntimeError(f"job failed: {{run.error}}")
    return run.metrics()


if __name__ == "__main__":
{serve}
'''
