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

- ``est_rows``: exact inner-join output rows (double — integer-exact
  below 2^53, saturating gracefully above where 64-bit math would wrap
  or raise; see the function docstring);
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
    """One-row exact size/skew forecast for ``left.join(right, on)``.

    ``est_rows``/``top_key_rows`` are computed in DOUBLE: a shared hot key
    with ~3.1e9 rows per side puts lc·rc past 2^63, where 64-bit math
    wraps silently in Spark (non-ANSI) and raises in DuckDB — i.e. the
    guardrail would lie (or crash) in exactly the mega-blowup scenario it
    exists to catch. Doubles lose integer exactness above 2^53, which for
    a SIZE FORECAST is the right trade; the emitted columns are doubles.
    ``n_left``/``n_right`` fold out of the histograms (Σ counts), so each
    input is scanned exactly once."""
    keys = [on] if isinstance(on, str) else list(on)
    lh = left.groupBy(*keys).agg(F.count(F.lit(1)).cast("double").alias("__lc"))
    rh = right.groupBy(*keys).agg(F.count(F.lit(1)).cast("double").alias("__rc"))
    nl = lh.agg(F.coalesce(F.sum("__lc"), F.lit(0.0)).alias("n_left"))
    nr = rh.agg(F.coalesce(F.sum("__rc"), F.lit(0.0)).alias("n_right"))
    matched = lh.join(rh, keys)
    per_key = matched.select((F.col("__lc") * F.col("__rc")).alias("__k"))
    totals = per_key.agg(
        F.coalesce(F.sum("__k"), F.lit(0.0)).alias("est_rows"),
        F.coalesce(F.max("__k"), F.lit(0.0)).alias("top_key_rows"),
        F.count(F.lit(1)).alias("matched_keys"),
    )
    out = totals.crossJoin(F.broadcast(nl)).crossJoin(F.broadcast(nr))
    est, top = F.col("est_rows"), F.col("top_key_rows")
    bigger = F.greatest(F.col("n_left"), F.col("n_right"))
    return out.select(
        "n_left",
        "n_right",
        "matched_keys",
        "est_rows",
        "top_key_rows",
        F.when(bigger > 0, stable_round(est / bigger)).otherwise(F.lit(0.0)).alias(
            "amplification"
        ),
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
        f"WITH lh AS (SELECT {ks}, CAST(COUNT(*) AS DOUBLE) AS lc "
        f"FROM {left_sql} GROUP BY {ks}), "
        f"rh AS (SELECT {ks}, CAST(COUNT(*) AS DOUBLE) AS rc "
        f"FROM {right_sql} GROUP BY {ks}), "
        f"m AS (SELECT l.lc * l2.rc AS k FROM lh l JOIN rh l2 ON "
        + " AND ".join(f"l.{k} = l2.{k}" for k in keys)
        + "), "
        f"t AS (SELECT COALESCE(SUM(k), 0.0) AS est_rows, "
        f"COALESCE(MAX(k), 0.0) AS top_key_rows, "
        f"COUNT(*) AS matched_keys FROM m), "
        f"nl AS (SELECT COALESCE(SUM(lc), 0.0) AS n_left FROM lh), "
        f"nr AS (SELECT COALESCE(SUM(rc), 0.0) AS n_right FROM rh) "
        f"SELECT n_left, n_right, matched_keys, est_rows, top_key_rows, "
        f"CASE WHEN GREATEST(n_left, n_right) > 0 THEN "
        f"{stable_round_sql('est_rows / GREATEST(n_left, n_right)')} ELSE 0.0 END "
        f"AS amplification, "
        f"CASE WHEN est_rows > 0 THEN "
        f"{stable_round_sql('top_key_rows / est_rows')} ELSE 0.0 END "
        f"AS top_key_frac "
        f"FROM t, nl, nr"
    )
