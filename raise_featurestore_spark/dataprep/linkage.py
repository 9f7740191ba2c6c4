"""Fuzzy record linkage: blocked edit-distance matching.

Entity resolution for feature stores (the same customer/product arriving
under slightly different names). The scalable shape is always two-phase:

1. **Block**: a cheap deterministic key (here: the last name token, with
   a length band folded into the join predicate) — pairs are only formed
   WITHIN a block, turning the O(n²) all-pairs problem into
   Σ O(block²). At 100 TB you tighten the block key (token + length
   band + first char) until the largest block is shuffle-partition
   sized; the key is data-dependent, so `analytics/skew_report` is the
   companion tool.
2. **Score**: exact Levenshtein inside the block (JVM `levenshtein` —
   both engines implement plain edit distance, so the oracle is exact).

``fuzzy_pairs`` emits DISTINCT-NAME pairs under ``max_distance``,
canonically ordered (name_a < name_b); self-pairs and symmetric
duplicates never materialize — the inequality is part of the join
condition, not a post-filter. ``best_match`` links records.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _block_key(name):
    toks = F.filter(F.split(F.lower(name), r"\s+"), lambda w: F.length(w) > 0)
    # try_element_at: an empty/whitespace-only name has no tokens, and
    # Spark-4 ANSI element_at(-1) on an empty array is a hard error; NULL
    # block keys never match an equi-join on either engine, so blank names
    # drop from pairing identically everywhere (r5 review finding)
    return F.try_element_at(toks, F.lit(-1))


def _block_key_sql(name: str) -> str:
    return (
        f"list_filter(string_split_regex(LOWER({name}), '\\s+'), "
        f"w -> length(w) > 0)[-1]"
    )


def fuzzy_pairs(
    df: DataFrame,
    name_col: str,
    max_distance: int = 3,
    length_band: int = 4,
) -> DataFrame:
    """Near-duplicate NAME pairs over the DISTINCT-name vocabulary, with
    per-name record support counts.

    Scoring distinct names, not records, is what makes this survive
    scale: record-level pairing is quadratic in the records per repeated
    name (a first draft emitted 106k pairs from 2k rows here — and 100×
    that at 10× the data), while the vocabulary grows sub-linearly.
    Exact duplicates (distance 0) are excluded by construction — that is
    `dedup.exact_duplicates`' job. Returns (name_a < name_b, distance,
    n_a, n_b)."""
    names = df.groupBy(F.col(name_col).alias("name")).agg(
        F.count(F.lit(1)).alias("n")
    )
    a = names.select(
        F.col("name").alias("name_a"), F.col("n").alias("n_a"),
        _block_key(F.col("name")).alias("__blk"),
    )
    b = names.select(
        F.col("name").alias("name_b"), F.col("n").alias("n_b"),
        _block_key(F.col("name")).alias("__blk"),
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(b, "__blk")
        .where(
            (F.col("name_a") < F.col("name_b"))
            & (
                F.abs(F.length("name_a") - F.length("name_b"))
                <= F.lit(length_band)
            )
        )
        .where(dist <= F.lit(max_distance))
        .select("name_a", "name_b", dist.alias("distance"), "n_a", "n_b")
    )


def fuzzy_pairs_sql(
    table: str,
    name_col: str,
    max_distance: int = 3,
    length_band: int = 4,
) -> str:
    """DuckDB twin of :func:`fuzzy_pairs`."""
    blk = _block_key_sql("name")
    names = (
        f"SELECT {name_col} AS name, COUNT(*) AS n "
        f"FROM {table} GROUP BY {name_col}"
    )
    return (
        f"WITH __n AS ({names}) "
        f"SELECT a.name AS name_a, b.name AS name_b, "
        f"levenshtein(a.name, b.name) AS distance, a.n AS n_a, b.n AS n_b "
        f"FROM (SELECT *, {blk} AS __blk FROM __n) a "
        f"JOIN (SELECT *, {blk} AS __blk FROM __n) b USING (__blk) "
        f"WHERE a.name < b.name "
        f"AND ABS(LENGTH(a.name) - LENGTH(b.name)) <= {length_band} "
        f"AND levenshtein(a.name, b.name) <= {max_distance}"
    )


def best_match(
    left: DataFrame,
    right: DataFrame,
    name_col: str,
    id_col: str,
    max_distance: int = 3,
    length_band: int = 4,
) -> DataFrame:
    """Top-1 linkage: each left row's closest right-side name within its
    block (ties broken by right id). Two-stage: the blocked candidate
    join, then a partition-local min_by per left id — no window over the
    full candidate set."""
    a = left.select(
        F.col(id_col).alias("left_id"),
        F.col(name_col).alias("left_name"),
        _block_key(F.col(name_col)).alias("__blk"),
    )
    b = right.select(
        F.col(id_col).alias("right_id"),
        F.col(name_col).alias("right_name"),
        _block_key(F.col(name_col)).alias("__blk"),
    )
    dist = F.levenshtein(F.col("left_name"), F.col("right_name"))
    cand = (
        a.join(b, "__blk")
        .where(
            F.abs(F.length("left_name") - F.length("right_name"))
            <= F.lit(length_band)
        )
        .withColumn("distance", dist)
        .where(F.col("distance") <= F.lit(max_distance))
    )
    pick = F.struct("distance", "right_id", "right_name")
    return (
        cand.groupBy("left_id", "left_name")
        .agg(F.min(pick).alias("__best"))
        .select(
            "left_id",
            "left_name",
            F.col("__best.right_id").alias("right_id"),
            F.col("__best.right_name").alias("right_name"),
            F.col("__best.distance").alias("distance"),
        )
    )
