"""Post-write quality checks → QualityReport.

(reference: raise_/transforms/observability.py:109-501 — NullCheck,
UniqueCheck, RangeCheck, RowCountCheck, CustomCheck, FreshnessCheck,
BlobIntegrityCheck, severity levels, QualityReport; table of semantics
raise_/PRD.md:1552-1563. The reference returns hardcoded values
(observability.py:177-181 etc.); here every check computes.)

Execution: all single-table checks for a job are FUSED into one aggregate
pass — each check contributes aggregate expressions to a single
``df.agg(...)`` so a 100-check suite still scans the table exactly once
(partial+final hash aggregate, no shuffle beyond the 1-row combine).
BlobIntegrityCheck is the exception (needs an anti-join against a listing).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone
from enum import Enum
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from raise_featurestore_spark.analytics.analysis import parse_duration_seconds


class Severity(str, Enum):
    # reference: raise_/transforms/observability.py (severity policy per PRD.md:1565-1575)
    INFO = "info"
    WARNING = "warning"
    ERROR = "error"
    CRITICAL = "critical"


def _snap(x: float, decimals: int) -> float:
    """Driver-side twin of functions/stable.grid_snap: FLOOR(x*s + 0.5)/s.
    Python's round() is banker's rounding and diverges from the engine
    oracles on exact ties (count ratios hit them)."""
    import math

    s10 = float(10**decimals)
    return math.floor(x * s10 + 0.5) / s10


@dataclass
class CheckResult:
    check: str
    name: str
    passed: bool
    severity: Severity
    observed: Any
    threshold: Any
    detail: str = ""


@dataclass
class QualityReport:
    """reference: raise_/transforms/observability.py:455-501."""

    results: list[CheckResult] = field(default_factory=list)
    created_at: str = ""

    @property
    def passed(self) -> bool:
        return all(r.passed for r in self.results)

    def failures(self, min_severity: Severity = Severity.INFO) -> list[CheckResult]:
        order = [Severity.INFO, Severity.WARNING, Severity.ERROR, Severity.CRITICAL]
        floor = order.index(min_severity)
        return [
            r for r in self.results
            if not r.passed and order.index(r.severity) >= floor
        ]

    def should_fail_job(self) -> bool:
        """ERROR/CRITICAL failures abort the job; WARNING/INFO only report
        (reference severity policy: raise_/PRD.md:1565-1575)."""
        return bool(self.failures(Severity.ERROR))


class _AggCheck:
    """A check expressible as aggregate expressions over the output table."""

    name: str
    severity: Severity

    def agg_exprs(self, prefix: str) -> list[Column]:
        raise NotImplementedError

    def evaluate(self, row: dict[str, Any], prefix: str) -> CheckResult:
        raise NotImplementedError


@dataclass
class NullCheck(_AggCheck):
    """max_null_rate on a column (reference: raise_/transforms/observability.py:109-181)."""

    column: str
    max_null_rate: float = 0.0
    severity: Severity = Severity.ERROR
    name: str = ""

    def __post_init__(self) -> None:
        self.name = self.name or f"null_{self.column}"

    def agg_exprs(self, p: str) -> list[Column]:
        c = F.col(self.column)
        return [
            (F.sum(c.isNull().cast("long")) / F.greatest(F.count(F.lit(1)), F.lit(1)))
            .alias(f"{p}_rate")
        ]

    def evaluate(self, row: dict[str, Any], p: str) -> CheckResult:
        rate = float(row[f"{p}_rate"] or 0.0)
        return CheckResult(
            "null", self.name, rate <= self.max_null_rate, self.severity,
            _snap(rate, 6), self.max_null_rate,
            f"null_rate({self.column})={rate:.4%}",
        )


@dataclass
class UniqueCheck(_AggCheck):
    """key columns must be unique (reference: raise_/transforms/observability.py:186-211).

    Duplicate count = count(*) − countDistinct(keys); exact. At extreme
    cardinality swap in approx_count_distinct with a tolerance.
    """

    columns: list[str]
    max_duplicates: int = 0
    severity: Severity = Severity.ERROR
    name: str = ""

    def __post_init__(self) -> None:
        self.name = self.name or f"unique_{'_'.join(self.columns)}"

    def agg_exprs(self, p: str) -> list[Column]:
        # null-safe distinct: countDistinct DROPS rows with any NULL key
        # column, which would count every null-keyed row as a duplicate.
        # Hashing the key struct keeps nulls as a distinct value (xxhash64
        # collision odds are 2^-64-scale — negligible against row counts).
        return [
            F.count(F.lit(1)).alias(f"{p}_n"),
            F.countDistinct(
                F.xxhash64(F.struct(*[F.col(c) for c in self.columns]))
            ).alias(f"{p}_d"),
        ]

    def evaluate(self, row: dict[str, Any], p: str) -> CheckResult:
        dups = int(row[f"{p}_n"]) - int(row[f"{p}_d"])
        return CheckResult(
            "unique", self.name, dups <= self.max_duplicates, self.severity,
            dups, self.max_duplicates, f"duplicate keys on ({', '.join(self.columns)})",
        )


@dataclass
class RangeCheck(_AggCheck):
    """value bounds (reference: raise_/transforms/observability.py:216-243)."""

    column: str
    min_value: float | None = None
    max_value: float | None = None
    max_violation_rate: float = 0.0
    severity: Severity = Severity.ERROR
    name: str = ""

    def __post_init__(self) -> None:
        if self.min_value is None and self.max_value is None:
            raise ValueError("RangeCheck needs min_value and/or max_value")
        self.name = self.name or f"range_{self.column}"

    def _violation(self) -> Column:
        c = F.col(self.column)
        cond = F.lit(False)
        if self.min_value is not None:
            cond = cond | (c < F.lit(self.min_value))
        if self.max_value is not None:
            cond = cond | (c > F.lit(self.max_value))
        return cond & c.isNotNull()

    def agg_exprs(self, p: str) -> list[Column]:
        return [
            (F.sum(self._violation().cast("long")) / F.greatest(F.count(F.lit(1)), F.lit(1)))
            .alias(f"{p}_rate")
        ]

    def evaluate(self, row: dict[str, Any], p: str) -> CheckResult:
        rate = float(row[f"{p}_rate"] or 0.0)
        return CheckResult(
            "range", self.name, rate <= self.max_violation_rate, self.severity,
            _snap(rate, 6), self.max_violation_rate,
            f"{self.column} outside [{self.min_value}, {self.max_value}]",
        )


@dataclass
class RowCountCheck(_AggCheck):
    """expected count ± tolerance (reference: raise_/transforms/observability.py:248-279)."""

    expected: int
    tolerance: float = 0.0  # fraction, e.g. 0.1 = ±10%
    severity: Severity = Severity.ERROR
    name: str = "row_count"

    def agg_exprs(self, p: str) -> list[Column]:
        return [F.count(F.lit(1)).alias(f"{p}_n")]

    def evaluate(self, row: dict[str, Any], p: str) -> CheckResult:
        n = int(row[f"{p}_n"])
        lo = self.expected * (1 - self.tolerance)
        hi = self.expected * (1 + self.tolerance)
        return CheckResult(
            "row_count", self.name, lo <= n <= hi, self.severity,
            n, (lo, hi), f"expected {self.expected} ±{self.tolerance:.0%}",
        )


@dataclass
class FreshnessCheck(_AggCheck):
    """max(ts) within max_age of now (reference: raise_/transforms/observability.py:352-411)."""

    column: str
    max_age: str = "1d"  # duration grammar s/m/h/d/w
    severity: Severity = Severity.WARNING
    name: str = ""
    _now: datetime | None = None  # injectable for tests

    def __post_init__(self) -> None:
        parse_duration_seconds(self.max_age)
        self.name = self.name or f"fresh_{self.column}"

    def agg_exprs(self, p: str) -> list[Column]:
        return [F.max(F.col(self.column)).alias(f"{p}_max")]

    def evaluate(self, row: dict[str, Any], p: str) -> CheckResult:
        newest = row[f"{p}_max"]
        limit = parse_duration_seconds(self.max_age)
        now = self._now or datetime.now(timezone.utc)
        if newest is None:
            return CheckResult("freshness", self.name, False, self.severity,
                               None, self.max_age, "no rows / all-null timestamp")
        if newest.tzinfo is None:
            newest = newest.replace(tzinfo=timezone.utc)
        age = (now - newest).total_seconds()
        return CheckResult(
            "freshness", self.name, age <= limit, self.severity,
            _snap(age, 1), limit, f"max({self.column}) is {age:.0f}s old",
        )


@dataclass
class CustomCheck(_AggCheck):
    """SQL predicate that must hold for (almost) every row
    (reference: raise_/transforms/observability.py:312-347).

    ``predicate`` is any Spark SQL boolean expression; the check fails when
    the violation rate exceeds ``max_violation_rate``.
    """

    predicate: str
    max_violation_rate: float = 0.0
    severity: Severity = Severity.ERROR
    name: str = "custom"

    def agg_exprs(self, p: str) -> list[Column]:
        ok = F.expr(self.predicate)
        return [
            (F.sum((~F.coalesce(ok, F.lit(False))).cast("long"))
             / F.greatest(F.count(F.lit(1)), F.lit(1))).alias(f"{p}_rate")
        ]

    def evaluate(self, row: dict[str, Any], p: str) -> CheckResult:
        rate = float(row[f"{p}_rate"] or 0.0)
        return CheckResult(
            "custom", self.name, rate <= self.max_violation_rate, self.severity,
            _snap(rate, 6), self.max_violation_rate, f"violates: {self.predicate}",
        )


@dataclass
class BlobIntegrityCheck:
    """Blob refs must exist in storage; sampled checksum validation
    (reference: raise_/transforms/observability.py:416-451 + the always-true
    validation at raise_/transforms/multimodal.py:482-493 — real here).

    Not fusable into the single-pass aggregate: missing-blob detection is a
    LEFT ANTI join of refs against a storage listing (broadcast when the
    listing is small; at 100 TB both sides shuffle-partition on uri).
    """

    uri_column: str = "uri"
    max_missing_rate: float = 0.0
    severity: Severity = Severity.ERROR
    name: str = "blob_integrity"

    def run(self, refs: DataFrame, listing: DataFrame) -> CheckResult:
        total = refs.count()
        missing = (
            refs.select(self.uri_column)
            .join(listing.select(self.uri_column), on=self.uri_column, how="left_anti")
            .count()
        )
        rate = missing / total if total else 0.0
        return CheckResult(
            "blob_integrity", self.name, rate <= self.max_missing_rate, self.severity,
            _snap(rate, 6), self.max_missing_rate,
            f"{missing}/{total} refs missing from storage",
        )


Check = NullCheck | UniqueCheck | RangeCheck | RowCountCheck | FreshnessCheck | CustomCheck


def checks_agg_exprs(checks: list[Check]) -> list[Column]:
    exprs: list[Column] = []
    for i, chk in enumerate(checks):
        exprs.extend(chk.agg_exprs(f"c{i}"))
    return exprs


def run_checks(df: DataFrame, checks: list[Check]) -> QualityReport:
    """ONE aggregation job evaluates every check (single table scan)."""
    report = QualityReport(created_at=datetime.now(timezone.utc).isoformat())
    if not checks:
        return report
    row = df.agg(*checks_agg_exprs(checks)).collect()[0].asDict()
    for i, chk in enumerate(checks):
        report.results.append(chk.evaluate(row, f"c{i}"))
    return report


def checks_report_df(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Report as a DataFrame (check, name, passed, observed) — oracle-checkable
    form: the same fused single-pass aggregate, unpivoted."""
    spark = df.sparkSession
    rep = run_checks(df, checks)
    rows = [
        (r.check, r.name, bool(r.passed), float(r.observed)
         if isinstance(r.observed, (int, float)) and r.observed is not None else None)
        for r in rep.results
    ]
    return spark.createDataFrame(rows, "check string, name string, passed boolean, observed double")
