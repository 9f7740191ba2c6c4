"""Pre-join cardinality guardrail: exact equi-join output size WITHOUT
running the join.

The production failure this prevents: an equi-join on a key both sides
thought was selective explodes to |A_k|·|B_k| rows on a shared hot key
(the classic "join blew up the cluster" incident). The output size of an
inner equi-join is exactly Σ_k cnt_A(k)·cnt_B(k) — computable from the
two key HISTOGRAMS, i.e. after compressing each side to one row per
distinct key. That costs one map-side-combined groupBy per side plus a
join of the (distinct-key-sized) histograms — tiny next to the join it
predicts, and independent of how wide the payload rows are.

Returns one row:

- ``est_rows``: EXACT inner-join output rows;
- ``amplification``: est_rows / max(n_left, n_right) — >1 means the join
  multiplies data;
- ``top_key_rows`` / ``top_key_frac``: the single worst key's
  contribution — if this dominates, salt THAT key
  (`functions/skew.salted_join`) rather than repartitioning everything;
- ``matched_keys``: distinct keys present on both sides.

DuckDB twin from the same spec → oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raise_featurestore_spark.functions.stable import stable_round, stable_round_sql


def equi_join_cardinality(
    left: DataFrame, right: DataFrame, on: str | list[str]
) -> DataFrame:
    """One-row exact size/skew forecast for ``left.join(right, on)``."""
    keys = [on] if isinstance(on, str) else list(on)
    lh = left.groupBy(*keys).agg(F.count(F.lit(1)).alias("__lc"))
    rh = right.groupBy(*keys).agg(F.count(F.lit(1)).alias("__rc"))
    matched = lh.join(rh, keys)
    contrib = (F.col("__lc") * F.col("__rc")).alias("__k")
    per_key = matched.select(contrib)
    totals = per_key.agg(
        F.coalesce(F.sum("__k"), F.lit(0)).cast("long").alias("est_rows"),
        F.coalesce(F.max("__k"), F.lit(0)).cast("long").alias("top_key_rows"),
        F.count(F.lit(1)).alias("matched_keys"),
    )
    nl = left.agg(F.count(F.lit(1)).alias("n_left"))
    nr = right.agg(F.count(F.lit(1)).alias("n_right"))
    out = totals.crossJoin(F.broadcast(nl)).crossJoin(F.broadcast(nr))
    est, top = F.col("est_rows"), F.col("top_key_rows")
    bigger = F.greatest(F.col("n_left"), F.col("n_right"))
    return out.select(
        "n_left",
        "n_right",
        "matched_keys",
        "est_rows",
        "top_key_rows",
        stable_round(est / bigger).alias("amplification"),
        F.when(est > 0, stable_round(top / est)).otherwise(F.lit(0.0)).alias(
            "top_key_frac"
        ),
    )


def equi_join_cardinality_sql(
    left_sql: str, right_sql: str, on: str | list[str]
) -> str:
    """DuckDB twin of :func:`equi_join_cardinality`; ``left_sql``/
    ``right_sql`` are relations (table names or parenthesized queries)."""
    keys = [on] if isinstance(on, str) else list(on)
    ks = ", ".join(keys)
    return (
        f"WITH lh AS (SELECT {ks}, COUNT(*) AS lc FROM {left_sql} GROUP BY {ks}), "
        f"rh AS (SELECT {ks}, COUNT(*) AS rc FROM {right_sql} GROUP BY {ks}), "
        f"m AS (SELECT l.lc * l2.rc AS k FROM lh l JOIN rh l2 ON "
        + " AND ".join(f"l.{k} = l2.{k}" for k in keys)
        + "), "
        f"t AS (SELECT CAST(COALESCE(SUM(k), 0) AS BIGINT) AS est_rows, "
        f"CAST(COALESCE(MAX(k), 0) AS BIGINT) AS top_key_rows, "
        f"COUNT(*) AS matched_keys FROM m), "
        f"nl AS (SELECT COUNT(*) AS n_left FROM {left_sql}), "
        f"nr AS (SELECT COUNT(*) AS n_right FROM {right_sql}) "
        f"SELECT n_left, n_right, matched_keys, est_rows, top_key_rows, "
        f"{stable_round_sql('est_rows * 1.0 / GREATEST(n_left, n_right)')} "
        f"AS amplification, "
        f"CASE WHEN est_rows > 0 THEN "
        f"{stable_round_sql('top_key_rows * 1.0 / est_rows')} ELSE 0.0 END "
        f"AS top_key_frac "
        f"FROM t, nl, nr"
    )
