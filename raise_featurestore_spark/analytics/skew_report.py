"""Key-skew advisor: per-column heavy-hitter report over any table.

The operational question at 100 TB is "which keys will make this
join/groupBy skew, and how badly": one dominant user_id serializes a
window, one hot hash bucket stalls a shuffle stage. This report gives,
per candidate key column, its top-k values by count with their corpus
fraction and a ``hot_factor`` — how many times larger the hot key is than
the MEAN key group (cnt · n_distinct / n_rows). hot_factor ≈ the salt
factor that would level that key (`functions/skew.salted_join`,
`functions/asof.asof_join(salt=...)`).

Scale design:

- ALL requested columns profile in ONE shuffle: each row explodes to
  (column, stringified value) pairs and a single hash groupBy counts them
  (partial aggregation combines map-side, so the exchange carries one row
  per distinct (column, value) per mapper — the same cost as profiling
  the single worst column).
- Per-column totals/distincts are a second aggregate over the ALREADY
  GROUPED relation (one row per distinct value — tiny), broadcast back.
- The per-column top-k truncates INSIDE each partition first (mapInPandas
  with an incrementally re-truncated buffer — the same kernel shape as
  the batch-ANN top-k), so the final per-column merge sees ≤ k rows per
  partition rather than every distinct value of a high-cardinality key.
- NULL key values are first-class (they are often THE hot key) and emit
  as real NULLs — no in-band sentinel that a genuine string value could
  collide with. Tie-ordering places NULL after any equal-count string on
  both engines via an explicit (is-null, value-or-'') sort key.
- ``hot_factor`` arithmetic runs in double: cnt · n_distinct as 64-bit
  ints overflows at exactly the cardinalities this advisor targets
  (Spark would wrap silently, DuckDB raises).
- Only string/integral/boolean key columns are accepted: the report
  groups and orders on the STRINGIFIED value, and the engines' casts of
  float/decimal/timestamp values to text disagree ('1.0E20' vs '1e+20'),
  which would silently diverge the twin. Skew profiling of a continuous
  column is a histogram question — use ``analytics/distribution``.

DuckDB twin built from the same spec → fully oracle-checked.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raise_featurestore_spark.functions.stable import stable_round, stable_round_sql

# exact dtype names, not prefixes: "interval ..." must not ride in on "int"
_STRINGABLE_TYPES = {"string", "boolean", "tinyint", "smallint", "int", "bigint"}


def _check_columns(df: DataFrame, columns: list[str]) -> None:
    if not columns:
        raise ValueError("skew_report requires at least one column")
    dtypes = dict(df.dtypes)
    missing = [c for c in columns if c not in dtypes]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    bad = {c: dtypes[c] for c in columns if dtypes[c] not in _STRINGABLE_TYPES}
    if bad:
        raise ValueError(
            f"skew_report keys must be string/integer/boolean (engines' text "
            f"casts of float/timestamp values differ); got {bad}. For "
            f"continuous columns use analytics/distribution histograms."
        )


def skew_report(
    df: DataFrame, columns: list[str], top_k: int = 5, frac_round: int = 6
) -> DataFrame:
    """(column_name, rank, value, cnt, frac, hot_factor) — top-``top_k``
    heaviest values per requested column, rank 1 = heaviest; ties broken
    by value ascending with NULL last."""
    _check_columns(df, columns)

    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in columns
                ]
            )
        ).alias("p")
    ).select("p.column_name", "p.value")
    grouped = pairs.groupBy("column_name", "value").agg(F.count(F.lit(1)).alias("cnt"))

    stats = grouped.groupBy("column_name").agg(
        F.sum("cnt").alias("n_rows"), F.count(F.lit(1)).alias("n_distinct")
    )

    k = top_k

    def local_topk(batches):
        buf = None
        for pdf in batches:
            cur = pdf if buf is None else pd.concat([buf, pdf], ignore_index=True)
            cur = cur.assign(
                __vn=cur["value"].isna(), __vs=cur["value"].fillna("")
            ).sort_values(
                ["column_name", "cnt", "__vn", "__vs"],
                ascending=[True, False, True, True],
                kind="mergesort",
            )
            buf = cur.groupby("column_name", sort=False).head(k)[
                ["column_name", "value", "cnt"]
            ]
        if buf is not None and len(buf):
            yield buf

    pruned = grouped.mapInPandas(
        local_topk, "column_name string, value string, cnt long"
    )
    # sort key fields: count desc, NULL-last flag, text; the raw nullable
    # value rides along as the LAST field, which the struct comparator can
    # only reach on ties the earlier fields already make impossible
    entry = F.struct(
        (-F.col("cnt")).alias("nc"),
        F.col("value").isNull().cast("int").alias("vn"),
        F.coalesce(F.col("value"), F.lit("")).alias("vs"),
        F.col("value").alias("v"),
    )
    merged = pruned.groupBy("column_name").agg(
        F.slice(F.sort_array(F.collect_list(entry)), 1, k).alias("__top")
    )
    top = merged.select(
        "column_name", F.posexplode("__top").alias("__pos", "__e")
    ).select(
        "column_name",
        (F.col("__pos") + 1).cast("int").alias("rank"),
        F.col("__e.v").alias("value"),
        (-F.col("__e.nc")).alias("cnt"),
    )

    out = top.join(F.broadcast(stats), "column_name")
    cnt_d = F.col("cnt").cast("double")
    hot = cnt_d * F.col("n_distinct").cast("double") / F.col("n_rows").cast("double")
    return out.select(
        "column_name",
        "rank",
        "value",
        "cnt",
        stable_round(cnt_d / F.col("n_rows"), decimals=frac_round).alias("frac"),
        stable_round(hot).alias("hot_factor"),
    )


def skew_report_sql(
    table: str, columns: list[str], top_k: int = 5, frac_round: int = 6
) -> str:
    """DuckDB twin of :func:`skew_report` (exact window-rank top-k —
    correctness only; the Spark side carries the scale design)."""
    unions = " UNION ALL ".join(
        f"SELECT '{c}' AS column_name, CAST({c} AS VARCHAR) AS value FROM {table}"
        for c in columns
    )
    hot = "g.cnt * 1.0 * s.n_distinct / s.n_rows"
    frac = "g.cnt * 1.0 / s.n_rows"
    return (
        f"WITH p AS ({unions}), "
        f"g AS (SELECT column_name, value, COUNT(*) AS cnt FROM p GROUP BY 1, 2), "
        f"s AS (SELECT column_name, SUM(cnt) AS n_rows, COUNT(*) AS n_distinct "
        f"FROM g GROUP BY 1), "
        f"r AS (SELECT g.column_name, g.value, g.cnt, "
        f"ROW_NUMBER() OVER (PARTITION BY g.column_name "
        f"ORDER BY g.cnt DESC, (g.value IS NULL), COALESCE(g.value, '')) AS rank, "
        f"{stable_round_sql(frac, decimals=frac_round)} AS frac, "
        f"{stable_round_sql(hot)} AS hot_factor "
        f"FROM g JOIN s USING (column_name)) "
        f"SELECT column_name, CAST(rank AS INT) AS rank, value, cnt, frac, hot_factor "
        f"FROM r WHERE rank <= {top_k}"
    )
