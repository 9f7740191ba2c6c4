"""Job schedules: cron / interval / on-change / manual / once.

(reference: raise_/transforms/schedule.py:16-361 — the five schedule kinds,
OnChange with debounce + max_delay over watched sources)

Schedules are orchestrator-plane metadata: the engine computes next-run
times and decides whether a CDC event should trigger, but actual timers
live in the orchestrator (internal loop / Airflow / cron). OnChange maps to
a Structured Streaming trigger in the live-table path (streaming.live_table).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta

from raise_featurestore_spark.analytics.analysis import parse_duration_seconds

_CRON_FIELDS = 5


@dataclass
class CronSchedule:
    """Standard 5-field cron (reference: raise_/transforms/schedule.py:16-96).

    Full cron parsing is orchestrator territory; we validate the shape and
    support the common ``M H * * *`` / ``*/N`` forms for next_run math.
    """

    expression: str
    timezone: str = "UTC"

    def __post_init__(self) -> None:
        parts = self.expression.split()
        if len(parts) != _CRON_FIELDS:
            raise ValueError(f"cron needs {_CRON_FIELDS} fields, got {self.expression!r}")

    def next_run(self, after: datetime) -> datetime:
        minute, hour = self.expression.split()[:2]
        if minute.startswith("*/"):
            step = int(minute[2:])
            base = after.replace(second=0, microsecond=0)
            add = step - (base.minute % step) or step
            return base + timedelta(minutes=add)
        if minute.isdigit() and hour.isdigit():
            candidate = after.replace(
                hour=int(hour), minute=int(minute), second=0, microsecond=0
            )
            return candidate if candidate > after else candidate + timedelta(days=1)
        if minute.isdigit():  # "M * * * *" → hourly at minute M
            candidate = after.replace(minute=int(minute), second=0, microsecond=0)
            return candidate if candidate > after else candidate + timedelta(hours=1)
        return after + timedelta(minutes=1)


@dataclass
class IntervalSchedule:
    """Every N duration (reference: raise_/transforms/schedule.py:100-152)."""

    every: str  # duration grammar s/m/h/d/w

    def __post_init__(self) -> None:
        self.seconds = parse_duration_seconds(self.every)

    def next_run(self, after: datetime) -> datetime:
        return after + timedelta(seconds=self.seconds)


@dataclass
class OnChangeSchedule:
    """CDC-triggered with debounce + max_delay
    (reference: raise_/transforms/schedule.py:249-292).

    ``should_trigger`` implements the debounce contract: fire when either
    (a) ``debounce_seconds`` have elapsed since the latest change, or
    (b) the oldest unprocessed change is older than ``max_delay_seconds``.
    """

    watched_sources: list[str] = field(default_factory=list)
    debounce_seconds: int = 60
    max_delay_seconds: int = 3600

    def should_trigger(
        self, now: datetime, first_change: datetime | None, last_change: datetime | None
    ) -> bool:
        if last_change is None:
            return False
        quiet = (now - last_change).total_seconds() >= self.debounce_seconds
        overdue = (
            first_change is not None
            and (now - first_change).total_seconds() >= self.max_delay_seconds
        )
        return quiet or overdue


@dataclass
class ManualSchedule:
    """Trigger only via API (reference: raise_/transforms/schedule.py:296-318)."""


@dataclass
class OnceSchedule:
    """Single run at a fixed time (reference: raise_/transforms/schedule.py:322-361)."""

    at: datetime
    fired: bool = False

    def next_run(self, after: datetime) -> datetime | None:
        return None if self.fired or self.at <= after else self.at


# Typing union of the five kinds (kept for annotations and isinstance)
ScheduleKind = (
    CronSchedule | IntervalSchedule | OnChangeSchedule | ManualSchedule | OnceSchedule
)


class Schedule:
    """Factory namespace matching the reference's ``Schedule.daily(...)`` /
    ``.hourly`` / ``.cron`` / ``.every`` / ``.on_change`` / ``.manual`` /
    ``.once`` constructors (reference: raise_/transforms/schedule.py:73-118).
    Instances are the concrete dataclasses above, never this class."""

    def __new__(cls, *a, **k):  # pragma: no cover - guard
        raise TypeError("Schedule is a factory namespace; use Schedule.daily() etc.")

    @staticmethod
    def cron(expression: str, timezone: str = "UTC") -> CronSchedule:
        return CronSchedule(expression, timezone)

    @staticmethod
    def hourly(minute: int = 0) -> CronSchedule:
        return CronSchedule(f"{minute} * * * *")

    @staticmethod
    def daily(hour: int = 0, minute: int = 0) -> CronSchedule:
        return CronSchedule(f"{minute} {hour} * * *")

    @staticmethod
    def every(interval: str | timedelta) -> IntervalSchedule:
        if isinstance(interval, timedelta):
            interval = f"{int(interval.total_seconds())}s"
        return IntervalSchedule(interval)

    @staticmethod
    def on_change(sources: list[str] | None = None, debounce_seconds: int = 60,
                  max_delay_seconds: int = 3600) -> OnChangeSchedule:
        return OnChangeSchedule(sources or [], debounce_seconds, max_delay_seconds)

    @staticmethod
    def manual() -> ManualSchedule:
        return ManualSchedule()

    @staticmethod
    def once(run_at: datetime) -> OnceSchedule:
        return OnceSchedule(run_at)
