"""Dashboards: chart + parameter specs rendered over real analysis results.

(reference: raise_/analytics/dashboard.py:19-593 — 12 chart types :19-33,
7 parameter types :36-44, Dashboard/Chart wiring and render; the reference
renders over mocked results, here ``render`` pulls each chart's analysis
through the freshness-policied cache and emits a JSON-able payload.)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Any, Callable

import pandas as pd

from raise_featurestore_spark.analytics.freshness import CACHED, Freshness, ResultCache

# reference: raise_/analytics/dashboard.py:19-33
CHART_TYPES = frozenset(
    {
        "line",
        "bar",
        "area",
        "scatter",
        "pie",
        "histogram",
        "heatmap",
        "table",
        "metric",
        "gauge",
        "box",
        "funnel",
    }
)

# reference: raise_/analytics/dashboard.py:36-44
PARAMETER_TYPES = frozenset(
    {"string", "number", "date", "date_range", "select", "multi_select", "boolean"}
)


@dataclass
class Parameter:
    """Dashboard-level input substituted into chart filters
    (reference: raise_/analytics/dashboard.py:330-420)."""

    name: str
    type: str = "string"
    default: Any = None
    options: list[Any] = field(default_factory=list)

    def __post_init__(self) -> None:
        if self.type not in PARAMETER_TYPES:
            raise ValueError(f"unknown parameter type {self.type!r}")
        if self.type in ("select", "multi_select") and not self.options:
            raise ValueError(f"{self.type} parameter needs options")

    @classmethod
    def date_range(cls, name: str, label: str = "", default: Any = None) -> "Parameter":
        """reference README: ``DashboardParameter.date_range(...)``."""
        p = cls(name=name, type="date_range", default=default)
        p.label = label
        return p

    @classmethod
    def dropdown(cls, name: str, options: list[Any], label: str = "",
                 default: Any = None) -> "Parameter":
        """reference README: ``DashboardParameter.dropdown(...)``."""
        p = cls(name=name, type="select", options=options, default=default)
        p.label = label
        return p

    def resolve(self, overrides: dict[str, Any]) -> Any:
        value = overrides.get(self.name, self.default)
        if self.type == "select" and value is not None and value not in self.options:
            raise ValueError(f"{value!r} not in options for {self.name}")
        return value


@dataclass
class Chart:
    """One visual: an analysis spec + a compute callable + display hints.

    ``compute(params)`` returns the (small) result frame; the spec rides
    along for cache keying so two charts over the same analysis share one
    computation.
    """

    title: str
    chart_type: str
    spec: Any  # analysis spec (has cache_key()) or any hashable descriptor
    compute: Callable[[dict[str, Any]], pd.DataFrame]
    x: str | None = None
    y: str | list[str] | None = None
    width: int = 6  # 12-column grid
    height: int = 4

    def __post_init__(self) -> None:
        if self.chart_type not in CHART_TYPES:
            raise ValueError(f"unknown chart type {self.chart_type!r}")


@dataclass
class Dashboard:
    """reference: raise_/analytics/dashboard.py (Dashboard + render)."""

    name: str
    charts: list[Chart] = field(default_factory=list)
    parameters: list[Parameter] = field(default_factory=list)
    cache: ResultCache = field(default_factory=ResultCache)

    def add_chart(self, chart: Chart) -> "Dashboard":
        self.charts.append(chart)
        return self

    def add_parameter(self, parameter: Parameter) -> "Dashboard":
        """reference: raise_/analytics/dashboard.py:431 — chainable."""
        self.parameters.append(parameter)
        return self

    def render(
        self,
        params: dict[str, Any] | None = None,
        freshness: Freshness = CACHED,
    ) -> dict[str, Any]:
        """Compute (or cache-hit) every chart; returns a JSON-able payload.
        Fails soft per chart — one broken analysis doesn't blank the page."""
        overrides = params or {}
        resolved = {p.name: p.resolve(overrides) for p in self.parameters}
        out: dict[str, Any] = {
            "name": self.name,
            "rendered_at": datetime.now(timezone.utc).isoformat(),
            "parameters": resolved,
            "charts": [],
        }
        for chart in self.charts:
            entry: dict[str, Any] = {
                "title": chart.title,
                "type": chart.chart_type,
                "x": chart.x,
                "y": chart.y,
                "layout": {"w": chart.width, "h": chart.height},
            }
            try:
                # key on spec AND resolved params — the same chart rendered
                # under different parameter bindings is a different result
                frame = self.cache.get_or_compute(
                    chart.spec,
                    lambda c=chart: c.compute(resolved),
                    freshness,
                    extra_key=repr(sorted(resolved.items())),
                )
                entry["data"] = frame.to_dict(orient="records")
                entry["status"] = "ok"
            except Exception as ex:
                entry["status"] = "error"
                entry["error"] = f"{type(ex).__name__}: {ex}"[:300]
            out["charts"].append(entry)
        return out

    def publish(self, directory: str | None = None) -> str:
        """Persist the dashboard SPEC (charts, parameters, layout — not
        computed data) as JSON and return its URL (reference README:1063's
        ``dashboard.publish()``; the reference returns a mock URL). A
        serving layer renders from this spec; data stays in the engine."""
        import json as _json
        import os as _os
        import tempfile as _tf

        directory = directory or _tf.mkdtemp(prefix="dash_")
        _os.makedirs(directory, exist_ok=True)
        spec = {
            "name": self.name,
            "description": getattr(self, "description", ""),
            "parameters": [
                {"name": p.name, "type": p.type, "default": p.default,
                 "options": list(p.options), "label": getattr(p, "label", "")}
                for p in self.parameters
            ],
            "charts": [
                {"title": c.title, "type": c.chart_type, "x": c.x, "y": c.y,
                 "layout": {"w": c.width, "h": c.height}}
                for c in self.charts
            ],
        }
        path = _os.path.join(directory, f"{self.name}.json")
        with open(path, "w") as fh:
            _json.dump(spec, fh, indent=1, default=str)
        return f"file://{path}"


# Reference-named alias (raise_/analytics/dashboard.py calls the class
# DashboardParameter; the README uses both)
DashboardParameter = Parameter
