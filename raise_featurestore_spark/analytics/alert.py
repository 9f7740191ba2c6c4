"""Analytics alerts: threshold conditions evaluated over REAL results.

(reference: raise_/analytics/alert.py — Condition operators :18-158 with
``evaluate()`` :62-107, AnalyticsAlert check loop :238-330. The reference
evaluates conditions against mocked analysis dicts; here they run against
the dict/row output of our Spark-computed analyses.)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone
from enum import Enum
from typing import Any, Callable


class Op(str, Enum):
    # reference: raise_/analytics/alert.py:18-44
    GT = "gt"
    LT = "lt"
    EQ = "eq"
    NE = "ne"
    GTE = "gte"
    LTE = "lte"
    BETWEEN = "between"
    OUTSIDE = "outside"
    CONTAINS = "contains"
    # domain shortcuts (reference :38-44): sugar over GT/LT on named metrics
    PSI_GT = "psi_gt"
    KL_GT = "kl_gt"
    P_VALUE_LT = "p_value_lt"
    CHANGE_PCT_GT = "change_pct_gt"


# metric key each domain shortcut reads from the result dict
_SHORTCUT_METRIC = {
    Op.PSI_GT: "psi",
    Op.KL_GT: "kl_divergence",
    Op.P_VALUE_LT: "p_value",
    Op.CHANGE_PCT_GT: "change_pct",
}


@dataclass
class Condition:
    """reference: raise_/analytics/alert.py:47-107."""

    metric: str | None
    op: Op
    value: Any = None
    upper: Any = None  # second bound for BETWEEN / OUTSIDE

    def __post_init__(self) -> None:
        self.op = Op(self.op)
        if self.op in (Op.BETWEEN, Op.OUTSIDE) and self.upper is None:
            raise ValueError(f"{self.op.value} needs both value (lower) and upper")
        if self.op in _SHORTCUT_METRIC and self.metric is None:
            self.metric = _SHORTCUT_METRIC[self.op]

    def evaluate(self, result: dict[str, Any]) -> bool:
        """True = condition met = alert should fire."""
        if self.metric not in result:
            raise KeyError(f"metric {self.metric!r} not in result {sorted(result)}")
        observed = result[self.metric]
        if observed is None:
            # NULL metric (e.g. a stat test on empty input): nothing was
            # observed, so no threshold can have been crossed — don't
            # crash the whole alert sweep on a None comparison
            return False
        op = self.op
        if op in (Op.GT, Op.PSI_GT, Op.KL_GT, Op.CHANGE_PCT_GT):
            return observed > self.value
        if op in (Op.LT, Op.P_VALUE_LT):
            return observed < self.value
        if op == Op.GTE:
            return observed >= self.value
        if op == Op.LTE:
            return observed <= self.value
        if op == Op.EQ:
            return observed == self.value
        if op == Op.NE:
            return observed != self.value
        if op == Op.BETWEEN:
            return self.value <= observed <= self.upper
        if op == Op.OUTSIDE:
            return observed < self.value or observed > self.upper
        if op == Op.CONTAINS:
            return self.value in observed
        raise AssertionError(op)


@dataclass
class AlertEvent:
    alert_name: str
    fired: bool
    observed: dict[str, Any]
    at: str


@dataclass
class AnalyticsAlert:
    """Periodic condition check over an analysis result
    (reference: raise_/analytics/alert.py:238-330).

    ``fetch`` recomputes/fetches the current result dict (typically a
    1-row Spark analysis collected via ``first().asDict()``); every
    condition must hold for the alert to fire (AND semantics, matching the
    reference's all-conditions loop).
    """

    name: str
    conditions: list[Condition]
    fetch: Callable[[], dict[str, Any]]
    notify: Callable[[AlertEvent], None] | None = None
    history: list[AlertEvent] = field(default_factory=list)

    def check(self) -> AlertEvent:
        result = self.fetch()
        fired = all(c.evaluate(result) for c in self.conditions)
        ev = AlertEvent(
            alert_name=self.name,
            fired=fired,
            observed={c.metric: result.get(c.metric) for c in self.conditions},
            at=datetime.now(timezone.utc).isoformat(),
        )
        self.history.append(ev)
        if fired and self.notify is not None:
            self.notify(ev)
        return ev
