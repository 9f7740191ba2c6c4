"""Z-order (Morton-curve) clustering for multi-column file pruning.

Sorting a table by ONE column gives perfect parquet min/max pruning on
that column and none on any other. Interleaving the bits of k columns
into one Morton code and range-partitioning + sorting by it gives GOOD
pruning on EVERY interleaved column at once — each output file covers a
small hyper-rectangle of the key space, so its per-column min/max stats
are tight. This is the technique behind Delta/Iceberg ``ZORDER BY``,
implemented here Spark-first over plain parquet:

- ``z_value`` is a pure column expression (shift/mask/sum — JVM-side,
  whole-stage codegen, no UDF), with a byte-equivalent DuckDB twin for
  the oracle.
- ``zorder_write`` computes per-column min/max as a broadcast 1-row agg
  (never collected), normalizes each column to a ``bits``-wide bucket,
  range-partitions by the Morton code (sampling-based range exchange —
  balanced output files even for skewed keys), sorts within partitions,
  and writes. The z column is dropped from the output; clustering lives
  in the LAYOUT, not the schema.
- Pruning quality is measured, not asserted by vibes:
  ``file_stats_candidates`` reads the parquet FOOTERS (pyarrow, metadata
  only) and counts how many files a given equality/range predicate could
  touch — the number a min/max-pruning scan planner would read.

Normalization arithmetic is pure IEEE (subtract/divide/floor) — the
same cross-engine-deterministic discipline as ``functions/stable.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16
_MAX_TOTAL_BITS = 63  # keep the Morton code in a signed 64-bit long


def z_value(cols: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton code: interleave the low ``bits`` bits of each column
    (columns must already be non-negative integers < 2^bits — see
    ``bucketize`` for continuous/unbounded inputs)."""
    k = len(cols)
    if k < 2:
        raise ValueError("z-ordering needs at least 2 columns")
    if k * bits > _MAX_TOTAL_BITS:
        raise ValueError(f"{k} columns x {bits} bits exceeds a 64-bit code")
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, j * k + i)
    return z


def z_value_sql(exprs: list[str], bits: int = DEFAULT_BITS) -> str:
    """DuckDB twin of :func:`z_value` — identical bit arithmetic."""
    k = len(exprs)
    if k < 2:
        raise ValueError("z-ordering needs at least 2 columns")
    if k * bits > _MAX_TOTAL_BITS:
        raise ValueError(f"{k} columns x {bits} bits exceeds a 64-bit code")
    terms = [
        f"(((CAST({e} AS BIGINT) >> {j}) & 1) << {j * k + i})"
        for j in range(bits)
        for i, e in enumerate(exprs)
    ]
    return "(" + " + ".join(terms) + ")"


def bucketize(c: Column, cmin: Column, cmax: Column, bits: int = DEFAULT_BITS) -> Column:
    """Min-max normalize ``c`` into ``[0, 2^bits)`` (pure IEEE ops; a
    constant column collapses to bucket 0)."""
    top = float(2**bits - 1)
    span = (cmax - cmin).cast("double")
    scaled = F.when(
        span > 0, F.floor((c - cmin).cast("double") / span * F.lit(top))
    ).otherwise(F.lit(0))
    return F.least(F.greatest(scaled.cast("long"), F.lit(0)), F.lit(2**bits - 1))


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write ``df`` to ``path`` clustered on the Morton code of ``cols``."""
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c)).alias(f"__mn_{c}"),
            F.max(F.col(c)).alias(f"__mx_{c}"),
        ]
    bounds = df.agg(*aggs)
    with_b = df.join(F.broadcast(bounds))
    buckets = [
        bucketize(F.col(c), F.col(f"__mn_{c}"), F.col(f"__mx_{c}"), bits)
        for c in cols
    ]
    z = z_value(buckets, bits)
    (
        with_b.withColumn("__z", z)
        .drop(*[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols])
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats_candidates(path: str, column: str, value) -> tuple[int, int]:
    """(candidate_files, total_files): how many parquet files a min/max-
    pruning planner would read for ``column = value``. Footer metadata
    only — no data pages are touched."""
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    total = candidates = 0
    for f in sorted(_glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        total += 1
        touch = False
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                if col.path_in_schema != column:
                    continue
                st = col.statistics
                if st is None or not st.has_min_max:
                    touch = True
                elif st.min <= value <= st.max:
                    touch = True
        if touch:
            candidates += 1
    return candidates, total
