"""Deterministic training-shard assignment, manifest, and export.

The last step of a pretraining data pipeline: deal the curated corpus
into N shards that (a) are reproducible — a document's shard never
depends on cluster size, partition layout, or retries — and (b) come
with a manifest the trainer can use for sizing and integrity checks.

Assignment is ``h32(salt‖id) mod n_shards`` over the shared cross-engine
hash primitive (dataprep/hashing.py): pure map-side column work, stable
under any execution plan, and exactly reproducible by any engine that
can compute md5 — the manifest is therefore oracle-checkable.

Scale design: assignment adds zero shuffle; the manifest is one grouped
aggregate over n_shards keys (map-side partials collapse it to ~N rows
per task). ``write_shards`` repartitions BY THE SHARD COLUMN so each
shard's rows land in tasks that write only that shard — one shuffle,
then ``partitionBy`` emits one directory per shard with no small-file
spray (without the repartition, every task writes a sliver of every
shard: n_tasks × n_shards files).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from raise_featurestore_spark.dataprep import hashing as H


def shard_col(id_col: Column, n_shards: int, salt: str = "shard") -> Column:
    """Shard id in [0, n_shards): h32 of the salted id string."""
    return (
        H.h32(F.concat(F.lit(salt + "|"), id_col.cast("string"))) % F.lit(n_shards)
    ).cast("int")


def shard_col_sql(id_expr: str, n_shards: int, salt: str = "shard") -> str:
    h = H.h32_sql(f"'{salt}|' || CAST({id_expr} AS VARCHAR)")
    return f"CAST({h} % {n_shards} AS INT)"


def assign_shards(
    df: DataFrame, n_shards: int, id_col: str = "doc_id", salt: str = "shard"
) -> DataFrame:
    """Append a ``shard`` column (deterministic, engine-independent)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return df.withColumn("shard", shard_col(F.col(id_col), n_shards, salt))


def shard_manifest(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "shard",
) -> DataFrame:
    """Per-shard manifest: row count, char total, id range — the sizing /
    integrity summary written next to the shards."""
    return (
        assign_shards(df, n_shards, id_col, salt)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.length(F.col(text_col)).cast("long")).alias("total_chars"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
        )
    )


def shard_manifest_sql(
    table: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "shard",
) -> str:
    """DuckDB twin of :func:`shard_manifest`."""
    s = shard_col_sql(id_col, n_shards, salt)
    return (
        f"SELECT {s} AS shard, COUNT(*) AS n_rows, "
        f"CAST(SUM(length({text_col})) AS BIGINT) AS total_chars, "
        f"MIN({id_col}) AS min_id, MAX({id_col}) AS max_id "
        f"FROM {table} GROUP BY 1"
    )


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard",
    mode: str = "error",
) -> None:
    """Write the corpus as ``path/shard=K/`` parquet directories, one
    coherent file set per shard (see module docstring for the
    repartition-before-partitionBy rationale). ``mode`` keeps Spark's
    errorifexists default — pass ``"overwrite"`` explicitly to clobber.

    Range- rather than hash-repartitioning by the shard column: hashing N
    distinct shard ids into N partitions is not a permutation (balls-into
    -bins leaves ~1/e of tasks empty and doubles up others); range
    boundaries over the N ids give the intended one-task-per-shard deal."""
    out = assign_shards(df, n_shards, id_col, salt)
    out.repartitionByRange(n_shards, F.col("shard")).write.mode(mode).partitionBy(
        "shard"
    ).parquet(path)
