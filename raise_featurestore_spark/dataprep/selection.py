"""Quality-ordered corpus selection under a global token budget.

The DataComp/DoReMi-style curation step the reference has no surface for
(engine addition per the task brief): rank every document by a quality
score and keep documents best-first until a global token budget is
exhausted — "give me the best 10B tokens out of this 100 TB crawl".

Scale design: the naive plan is ``SUM(n_tokens) OVER (ORDER BY quality
DESC)`` — a single-partition global-sort window, the canonical scale
killer. Instead the ordering is lowered to ONE bigint key

    key = (10^4 - round(quality · 10^4)) · 10^12  +  id

(ascending key == quality descending, id ascending tiebreak; quality is
already rounded to 4 decimals so the lowering is exact) and the running
total comes from the distributed range-partitioned prefix sum
(``functions/prefix.py``): a range shuffle on the key, per-partition
local sums, and a broadcast offset join — no stage ever sees more than a
partition of the corpus. The id must fit under 10^12; widen ``KEY_STRIDE``
for larger id domains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raise_featurestore_spark.dataprep.text import quality_score, quality_score_sql
from raise_featurestore_spark.functions.prefix import range_prefix_sums

KEY_STRIDE = 10**12
QUALITY_STEPS = 10**4  # quality_score is rounded to 4 decimals


def select_token_budget(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """Documents kept under ``budget`` total tokens, best-quality-first.

    Output: (id, quality_score, n_tokens, cum_tokens) for every kept
    document; ``cum_tokens`` is the inclusive running total in selection
    order, so the last kept row shows how much of the budget was used.
    """
    # null-text docs carry no tokens and a null quality score; Spark orders
    # NULLS FIRST where DuckDB orders NULLS LAST, so excluding them is the
    # only cross-engine-stable (and semantically right) treatment
    m = quality_score(
        df.where(F.col(text_col).isNotNull()), id_col, text_col
    ).select(id_col, "n_tokens", "quality_score")
    # FLOOR(x + 0.5), not engine ROUND: a 4-decimal quality_score times
    # QUALITY_STEPS lands on exact .5 ties where Spark/DuckDB ROUND
    # disagree and reorder the whole selection (emission rules)
    key = (
        F.lit(QUALITY_STEPS) - F.floor(F.col("quality_score") * QUALITY_STEPS + F.lit(0.5))
    ).cast("long") * F.lit(KEY_STRIDE) + F.col(id_col).cast("long")
    keyed = m.withColumn("__ord", key).withColumn(
        "__tok", F.col("n_tokens").cast("long")
    )
    cum = range_prefix_sums(keyed, "__ord", {"cum_tokens": "__tok"}, num_partitions)
    return cum.where(F.col("cum_tokens") <= budget).select(
        F.col(id_col),
        F.col("quality_score"),
        F.col("n_tokens"),
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
    )


def select_token_budget_sql(
    table: str, budget: int, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`select_token_budget` (window form — the
    oracle may use the global-sort plan the engine avoids)."""
    q = quality_score_sql(
        f"(SELECT * FROM {table} WHERE {text_col} IS NOT NULL) __nn", id_col, text_col
    )
    key = (
        f"({QUALITY_STEPS} - CAST(FLOOR(quality_score * {QUALITY_STEPS} + 0.5) AS BIGINT))"
        f" * {KEY_STRIDE} + CAST({id_col} AS BIGINT)"
    )
    return (
        f"WITH __m AS ({q}), "
        f"__c AS (SELECT {id_col}, quality_score, n_tokens, "
        f"CAST(SUM(CAST(n_tokens AS BIGINT)) OVER (ORDER BY {key}) AS BIGINT) "
        f"AS cum_tokens FROM __m) "
        f"SELECT {id_col}, quality_score, n_tokens, cum_tokens "
        f"FROM __c WHERE cum_tokens <= {budget}"
    )
