"""Read-through parquet cache for derived REFERENCE tables (fitted
models, corpus assignments) — the train-once/score-many pattern.

A 100 TB pipeline does not refit its LM or re-assign its ANN corpus per
query: the fitted artifact is written once as a governed reference table
(Delta/Iceberg in production; the reference blesses materialized derived
state in raise_/analytics/live_table.py:162-209) and every scoring run
joins against it. This module is that pattern for the sandbox: a
content-keyed parquet directory, installed atomically by rename, read on
every subsequent call. Correctness is unaffected by construction — the
cache key includes the source files' (size, mtime) signature plus every
build parameter, and the builders are deterministic, so a cache hit IS
the from-scratch result (the driver's DuckDB oracles regenerate the
artifact from raw data and hash-match against the cached path).

Concurrency: two processes building the same key race benignly — each
writes to a pid-unique staging dir and the loser's rename onto the
installed dir fails, after which it reads the winner's copy.
"""

from __future__ import annotations

import hashlib
import os
import shutil

CACHE_ROOT = os.environ.get("SPARK_GRAFT_CACHE", "/tmp/spark_graft_cache")


def source_signature(*paths: str) -> str:
    """Cheap staleness key over source parquet files: name+size+mtime.
    (Content hashing a 100 TB input is not a thing; size+mtime is the
    standard freshness proxy, same as incremental checkpointing.)"""
    parts = []
    for p in paths:
        st = os.stat(p)
        parts.append(f"{os.path.abspath(p)}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(parts)


def _key(tag: str, key_parts) -> str:
    h = hashlib.md5()
    h.update(tag.encode())
    for p in key_parts:
        h.update(b"|")
        h.update(str(p).encode())
    return h.hexdigest()


def cached_json(tag: str, key_parts, build_fn):
    """Driver-side artifact cache (e.g. a trained coarse quantizer's
    centroid matrix): JSON on disk, atomic install via os.replace."""
    import json

    path = os.path.join(CACHE_ROOT, tag, _key(tag, key_parts) + ".json")
    if os.path.isfile(path):
        with open(path) as fh:
            return json.load(fh)
    val = build_fn()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    stage = f"{path}.stage-{os.getpid()}"
    with open(stage, "w") as fh:
        json.dump(val, fh)
    os.replace(stage, path)
    return val


def cached_table(spark, tag: str, key_parts, build_fn, partition_by=None):
    """Return ``build_fn()`` materialized under a deterministic key:
    parquet-read on hit, build+atomic-install on miss. ``key_parts`` must
    capture EVERYTHING the artifact depends on (source signature via
    :func:`source_signature` + parameters). ``partition_by`` writes the
    artifact hive-partitioned so downstream equi-filters on that column
    prune FILES (the IVF probe-join contract)."""
    path = os.path.join(CACHE_ROOT, tag, _key(tag, key_parts))
    # the hit predicate requires an actual DATA file, not just the
    # directory: a zero-row partitioned build writes only _SUCCESS (no
    # partition dirs), and reading that back is an AnalysisException on a
    # schema-less directory (r9 ADVICE) — treat it as a miss instead
    if os.path.isdir(path) and _has_parquet(path):
        return spark.read.parquet(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    stage = f"{path}.stage-{os.getpid()}"
    df = build_fn()
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(stage)
    try:
        os.rename(stage, path)
    except OSError:
        shutil.rmtree(stage, ignore_errors=True)  # concurrent builder won
    if _has_parquet(path):
        return spark.read.parquet(path)
    # legitimately-empty artifact: parquet has no file to carry the
    # schema, so hand back the built (0-row) frame itself — schema intact,
    # and the next call rebuilds (cheap by definition: the build scanned
    # to zero rows)
    return df


def _has_parquet(path: str) -> bool:
    for root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False
