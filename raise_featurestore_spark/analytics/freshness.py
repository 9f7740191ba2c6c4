"""Freshness-policied result cache: skip recompute when a cached result is
acceptably fresh.

(reference: raise_/analytics/freshness.py:16-111 — REAL_TIME / WITHIN(d) /
CACHED policies, acceptance test :95-111; cache keyed by md5 of the
analysis spec raise_/analytics/client.py:61-79,194-199; sizing
raise_/PRD.md:1039-1062,2519-2531)

The cache stores COLLECTED results (analysis outputs are small by
construction — aggregates, histograms, matrices — never raw rows), keyed
by the spec's ``cache_key()`` (md5 of its sorted-JSON dict). In production
the store is Redis/Delta; here an in-memory dict with the same contract.
The expensive thing being skipped is the distributed scan, so a cache hit
is the difference between <10 ms and a cluster job — this is how the
reference's p99 latency targets are meant to be met for repeat queries.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable

import pandas as pd

from raise_featurestore_spark.analytics.analysis import parse_duration_seconds


@dataclass(frozen=True)
class Freshness:
    """reference: raise_/analytics/freshness.py:16-93."""

    policy: str = "cached"  # real_time | within | cached
    within: str | None = None  # duration s/m/h/d/w, for policy="within"

    def __post_init__(self) -> None:
        if self.policy not in ("real_time", "within", "cached"):
            raise ValueError(f"unknown freshness policy {self.policy!r}")
        if self.policy == "within":
            if self.within is None:
                raise ValueError("within policy needs a duration")
            parse_duration_seconds(self.within)

    def accepts(self, age_seconds: float) -> bool:
        """reference acceptance rule: raise_/analytics/freshness.py:95-111."""
        if self.policy == "real_time":
            return False
        if self.policy == "cached":
            return True
        return age_seconds <= parse_duration_seconds(self.within)


REAL_TIME = Freshness("real_time")
CACHED = Freshness("cached")


def within(duration: str) -> Freshness:
    return Freshness("within", duration)


@dataclass
class _Entry:
    result: pd.DataFrame
    created_at: float


@dataclass
class ResultCache:
    """Spec-hash-keyed result store with freshness acceptance + stats."""

    entries: dict[str, _Entry] = field(default_factory=dict)
    hits: int = 0
    misses: int = 0
    _now: Callable[[], float] = time.time  # injectable for tests

    def get_or_compute(
        self,
        spec: Any,
        compute: Callable[[], pd.DataFrame],
        freshness: Freshness = CACHED,
        extra_key: str | None = None,
    ) -> pd.DataFrame:
        """Return the cached result if the policy accepts its age, else run
        ``compute`` (a collected/toPandas analysis) and cache it.

        ``extra_key`` distinguishes computations whose spec alone doesn't
        capture every input (e.g. a dashboard chart rendered under different
        parameter bindings)."""
        key = spec.cache_key() if hasattr(spec, "cache_key") else str(spec)
        if extra_key is not None:
            key = f"{key}|{extra_key}"
        entry = self.entries.get(key)
        if entry is not None and freshness.accepts(self._now() - entry.created_at):
            self.hits += 1
            return entry.result
        self.misses += 1
        result = compute()
        self.entries[key] = _Entry(result=result, created_at=self._now())
        return result

    def invalidate(self, spec: Any | None = None) -> None:
        if spec is None:
            self.entries.clear()
        else:
            self.entries.pop(spec.cache_key(), None)

    def stats(self) -> dict[str, int]:
        return {"hits": self.hits, "misses": self.misses, "entries": len(self.entries)}
