"""Transforms: SQL templating, Python dataflow, pandas-batch UDTFs, hybrid.

(reference: raise_/transforms/transform.py:27-348 — TransformContext,
SQLTransform ``{{param}}``/``{{checkpoint}}``/``{{execution_date}}``/
``{{run_id}}`` substitution, source_aliases, PythonTransform
``f(context, data) -> data``, HybridTransform SQL→Python chaining,
``@python_transform`` decorator)

Execution strategy:

- SQLTransform registers each source DataFrame as a temp view under its
  alias and hands the rendered SQL to ``spark.sql`` — the multi-source join
  strategy (broadcast / shuffled hash / sort-merge) is Catalyst's pick, with
  AQE re-planning at runtime. This is the reference's declared semantics
  with a real optimizer behind it.
- PythonTransform runs the user function on the driver over *DataFrames*
  (lazy plans), so "python" logic that composes Spark ops stays fully
  distributed and optimizable.
- PandasBatchTransform is the row-data escape hatch: Arrow-batched
  ``mapInPandas`` (N rows → M rows, UDTF-like), never row-at-a-time Python.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field
from datetime import datetime
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_TEMPLATE_RE = re.compile(r"\{\{\s*(\w+)\s*\}\}")


@dataclass
class TransformContext:
    """Per-run execution context (reference: raise_/transforms/transform.py:27-51)."""

    job_id: str
    run_id: str
    execution_date: datetime
    checkpoint: Any = None
    params: dict[str, Any] = field(default_factory=dict)
    metrics: dict[str, Any] = field(default_factory=dict)

    def log_metric(self, name: str, value: Any) -> None:
        """User-emitted run metric (reference: transform.py:45-47); surfaces
        on the JobRun alongside the observed row counts."""
        self.metrics[name] = value

    def get_param(self, name: str, default: Any = None) -> Any:
        return self.params.get(name, default)

    def template_vars(self) -> dict[str, str]:
        out = {k: _render_value(v) for k, v in self.params.items()}
        out["job_id"] = self.job_id
        out["run_id"] = self.run_id
        out["execution_date"] = _render_value(self.execution_date)
        out["checkpoint"] = _render_value(self.checkpoint)
        return out


def _render_value(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    return str(v)


@dataclass
class SQLTransform:
    """SQL template over aliased sources
    (reference: raise_/transforms/transform.py:98-175).

    ``source_aliases`` maps SQL names → source index/alias; each source is
    registered as a temp view under that name before ``spark.sql`` runs.
    Unknown ``{{placeholders}}`` raise rather than silently passing through.
    """

    sql: str
    source_aliases: dict[str, str] = field(default_factory=dict)

    def get_sql(self, context: TransformContext) -> str:
        vars_ = context.template_vars()

        def sub(m: re.Match[str]) -> str:
            name = m.group(1)
            if name not in vars_:
                raise KeyError(f"unknown template parameter {{{{{name}}}}} in SQLTransform")
            return vars_[name]

        return _TEMPLATE_RE.sub(sub, self.sql)

    def apply(
        self, spark: SparkSession, context: TransformContext, sources: dict[str, DataFrame]
    ) -> DataFrame:
        for alias, df in sources.items():
            df.createOrReplaceTempView(alias)
        # source_aliases maps SQL view name -> sources key, letting the SQL
        # refer to a source under a different name than the job wired it as
        for view, src in (self.source_aliases or {}).items():
            if src in sources:
                sources[src].createOrReplaceTempView(view)
        return spark.sql(self.get_sql(context))


@dataclass
class PythonTransform:
    """Driver-side dataflow function ``f(context, data) -> data`` where
    ``data`` is a dict of lazy DataFrames (single-source jobs receive the
    lone DataFrame directly) — reference: raise_/transforms/transform.py:183-251.

    Because inputs/outputs are DataFrames, the "python" transform is still a
    declarative Spark plan unless the author drops to pandas explicitly.
    """

    fn: Callable[[TransformContext, Any], DataFrame]
    name: str | None = None

    def apply(
        self, spark: SparkSession, context: TransformContext, sources: dict[str, DataFrame]
    ) -> DataFrame:
        data: Any = sources
        if len(sources) == 1:
            data = next(iter(sources.values()))
        return self.fn(context, data)


@dataclass
class PandasBatchTransform:
    """Arrow-batched row transform via ``mapInPandas``: the user function
    maps a pandas batch → pandas batch (N rows in, M rows out).

    (reference UDTF-ish surface: raise_/transforms/transform.py:183-251 —
    the "rows level" PythonTransform; Spark mapping per SURVEY §2.12)

    ``schema`` is the output schema (DDL string or StructType). The function
    must be row-wise deterministic if results feed the differential oracle —
    batch boundaries are not stable across partitionings.
    """

    fn: Callable[[pd.DataFrame], pd.DataFrame]
    schema: Any
    name: str | None = None

    def apply(
        self, spark: SparkSession, context: TransformContext, sources: dict[str, DataFrame]
    ) -> DataFrame:
        if len(sources) != 1:
            raise ValueError("PandasBatchTransform takes exactly one source")
        (df,) = sources.values()
        fn = self.fn

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for batch in batches:
                yield fn(batch)

        return df.mapInPandas(gen, schema=self.schema)


@dataclass
class HybridTransform:
    """SQL stage, then Python post-processing
    (reference: raise_/transforms/transform.py:255-304)."""

    sql: str
    post: Callable[[TransformContext, DataFrame], DataFrame]
    source_aliases: dict[str, str] = field(default_factory=dict)

    def apply(
        self, spark: SparkSession, context: TransformContext, sources: dict[str, DataFrame]
    ) -> DataFrame:
        sql_out = SQLTransform(self.sql, self.source_aliases).apply(spark, context, sources)
        return self.post(context, sql_out)


def python_transform(
    fn: Callable[[TransformContext, Any], DataFrame] | None = None, *, name: str | None = None
):
    """Decorator form (reference: raise_/transforms/transform.py:324-348)."""

    def wrap(f: Callable[[TransformContext, Any], DataFrame]) -> PythonTransform:
        return PythonTransform(f, name=name or f.__name__)

    return wrap(fn) if fn is not None else wrap
