"""Serialization for jobs / transforms / sources / targets.

(reference: raise_/transforms/transform.py:74-96,153-175,212-235,284-304
to_dict/from_dict on every transform; job.py:56-71 Target round-trip —
the reference serializes PythonTransform functions BY MODULE PATH, which
is what lets orchestrators ship job definitions to workers.)

Function-valued fields (PythonTransform.fn, HybridTransform.post,
PandasBatchTransform.fn) serialize as ``module:qualname`` and are
re-imported on load; lambdas/closures are rejected with a clear error —
exactly the constraint a distributed orchestrator imposes anyway.
"""

from __future__ import annotations

import importlib
from dataclasses import asdict, fields
from typing import Any

from raise_featurestore_spark.transforms import source as source_mod
from raise_featurestore_spark.transforms import observability as obs_mod
from raise_featurestore_spark.transforms.checkpoint import (
    CheckpointStore,
    IncrementalConfig,
)
from raise_featurestore_spark.transforms.job import Job, Target
from raise_featurestore_spark.transforms.transform import (
    HybridTransform,
    PandasBatchTransform,
    PythonTransform,
    SQLTransform,
)

_SOURCE_TYPES = {
    "ObjectStorageSource": source_mod.ObjectStorageSource,
    "FileSystemSource": source_mod.FileSystemSource,
    "ColumnarSource": source_mod.ColumnarSource,
    "DatabaseSource": source_mod.DatabaseSource,
}

_CHECK_TYPES = {
    name: getattr(obs_mod, name)
    for name in ("NullCheck", "UniqueCheck", "RangeCheck", "RowCountCheck",
                 "FreshnessCheck", "CustomCheck")
}


def _fn_ref(fn: Any) -> str:
    qualname = getattr(fn, "__qualname__", "")
    module = getattr(fn, "__module__", "")
    if "<lambda>" in qualname or "<locals>" in qualname or not module:
        raise ValueError(
            f"cannot serialize function {qualname!r}: transforms shipped to an "
            "orchestrator must be importable module-level functions"
        )
    return f"{module}:{qualname}"


def _fn_load(ref: str) -> Any:
    module, _, qualname = ref.partition(":")
    obj: Any = importlib.import_module(module)
    for part in qualname.split("."):
        obj = getattr(obj, part)
    return obj


# ---------------------------------------------------------------- transforms


def transform_to_dict(t: Any) -> dict:
    if isinstance(t, SQLTransform):
        return {"type": "sql", "sql": t.sql, "source_aliases": dict(t.source_aliases)}
    if isinstance(t, PandasBatchTransform):
        from pyspark.sql.types import StructType

        # StructType's str() is a repr, not DDL — simpleString() round-trips
        schema = (
            t.schema.simpleString()
            if isinstance(t.schema, StructType)
            else str(t.schema)
        )
        return {"type": "pandas_batch", "fn": _fn_ref(t.fn),
                "schema": schema, "name": t.name}
    if isinstance(t, PythonTransform):
        return {"type": "python", "fn": _fn_ref(t.fn), "name": t.name}
    if isinstance(t, HybridTransform):
        return {"type": "hybrid", "sql": t.sql, "post": _fn_ref(t.post),
                "source_aliases": dict(t.source_aliases)}
    raise TypeError(f"unknown transform type {type(t).__name__}")


def transform_from_dict(d: dict) -> Any:
    kind = d["type"]
    if kind == "sql":
        return SQLTransform(sql=d["sql"], source_aliases=d.get("source_aliases", {}))
    if kind == "python":
        return PythonTransform(fn=_fn_load(d["fn"]), name=d.get("name"))
    if kind == "pandas_batch":
        return PandasBatchTransform(fn=_fn_load(d["fn"]), schema=d["schema"],
                                    name=d.get("name"))
    if kind == "hybrid":
        return HybridTransform(sql=d["sql"], post=_fn_load(d["post"]),
                               source_aliases=d.get("source_aliases", {}))
    raise ValueError(f"unknown transform type {kind!r}")


# ---------------------------------------------------------------- sources


def source_to_dict(s: Any) -> dict:
    tname = type(s).__name__
    if tname not in _SOURCE_TYPES:
        raise TypeError(f"source type {tname} is not serializable")
    d = {f.name: getattr(s, f.name) for f in fields(s) if not f.name.startswith("_")}
    d["type"] = tname
    # partition narrowing is builder state outside the public fields — a
    # round-trip that dropped it would silently scan the ENTIRE dataset
    pv = getattr(s, "_partition_values", None)
    if pv:
        d["partitions"] = [list(p) for p in pv]
    return d


def source_from_dict(d: dict) -> Any:
    d = dict(d)
    cls = _SOURCE_TYPES[d.pop("type")]
    partitions = d.pop("partitions", None)
    src = cls(**d)
    for col, val in partitions or []:
        src = src.with_partition(col, val)
    return src


# ---------------------------------------------------------------- target/job


def target_to_dict(t: Target) -> dict:
    return asdict(t)


def target_from_dict(d: dict) -> Target:
    return Target(**d)


def job_to_dict(job: Job) -> dict:
    return {
        "job_id": job.job_id,
        "sources": {alias: source_to_dict(s) for alias, s in job.sources.items()},
        "transform": transform_to_dict(job.transform),
        "target": target_to_dict(job.target),
        "incremental": {
            "mode": job.incremental.mode.value,
            "checkpoint_column": job.incremental.checkpoint_column,
            "checkpoint_type": job.incremental.checkpoint_type.value,
            "lookback": job.incremental.lookback,
        },
        "checkpoint_store": job.checkpoint_store.path if job.checkpoint_store else None,
        "quality_checks": [
            {**{f.name: getattr(c, f.name) for f in fields(c)
                if f.name != "severity" and not callable(getattr(c, f.name))},
             "type": type(c).__name__, "severity": c.severity.value}
            for c in job.quality_checks
        ],
        "params": dict(job.params),
        "max_retries": job.max_retries,
    }


def job_from_dict(d: dict) -> Job:
    checks = []
    for c in d.get("quality_checks", []):
        c = dict(c)
        cls = _CHECK_TYPES[c.pop("type")]
        c["severity"] = obs_mod.Severity(c["severity"])
        checks.append(cls(**c))
    return Job(
        job_id=d["job_id"],
        sources={a: source_from_dict(s) for a, s in d["sources"].items()},
        transform=transform_from_dict(d["transform"]),
        target=target_from_dict(d["target"]),
        incremental=IncrementalConfig(**d.get("incremental", {})),
        checkpoint_store=(
            CheckpointStore(d["checkpoint_store"]) if d.get("checkpoint_store") else None
        ),
        quality_checks=checks,
        params=d.get("params", {}),
        max_retries=d.get("max_retries", 0),
    )
