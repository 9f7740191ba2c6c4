"""Cross-document boilerplate mining: repeated word n-grams and removal.

License headers, navigation chrome, cookie banners — spans repeated
verbatim across many crawl documents — are the classic pretraining-data
contaminant (and, per the round-4 LSH stress test, the thing that blows
up banded minhash when left in). This module finds them: the word-n-gram
analogue of suffix-array duplicated-substring mining, at the granularity
a distributed engine can afford.

``mine_boilerplate`` emits the top-k n-grams by document frequency —
each counted once per containing doc (``array_distinct`` before the
explode), so a phrase repeated inside ONE doc doesn't masquerade as
corpus boilerplate. ``strip_boilerplate`` removes a mined gram list from
the text (the grams are top-k, i.e. driver-bounded, so they ship as plan
literals — no join).

Scale design: mining is explode → groupBy(gram) count → global top-k,
the exact shape of ``vocab_topk`` (one shuffle on the gram hash; the
top-k lowers to TakeOrderedAndProject so no global sort materializes).
The explode factor is n_tokens per doc — linear, not quadratic; df
concentration on true boilerplate is the point, and the groupBy partial-
aggregates it map-side. Removal is a pure per-row expression chain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from raise_featurestore_spark.dataprep.dedup import _norm_text, _norm_text_sql


def _word_grams(toks: Column, n: int) -> Column:
    """Distinct word n-grams from a PRE-PROJECTED token array (empty if
    < n tokens). The caller must materialize the token array as its own
    column first (r11-opt): referencing a split-of-normalized-text
    expression inside the transform lambda re-evaluates the whole
    tokenize per gram position — O(tokens²) work per doc, the same
    per-element-recompute class measured and fixed in dedup.shingles."""
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.array_distinct(F.filter(grams, lambda g: F.length(g) > 0))


def _word_grams_sql(text_expr: str, n: int) -> str:
    toks = (
        f"list_filter(string_split_regex({_norm_text_sql(text_expr)}, '\\s+'), "
        f"w -> length(w) > 0)"
    )
    grams = (
        f"list_transform(range(1, GREATEST(len({toks}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' '))"
    )
    return f"list_distinct(list_filter({grams}, g -> length(g) > 0))"


def mine_boilerplate(
    df: DataFrame,
    n: int = 6,
    min_df: int = 2,
    top_k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Top-``top_k`` word ``n``-grams appearing in ≥ ``min_df`` distinct
    documents, ordered by document frequency (gram string tiebreak)."""
    toks = df.select(
        F.filter(
            F.split(_norm_text(F.col(text_col)), r"\s+"), lambda w: F.length(w) > 0
        ).alias("__toks")
    )
    grams = toks.select(F.explode(_word_grams(F.col("__toks"), n)).alias("gram"))
    counted = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    return (
        counted.where(F.col("df") >= min_df)
        .orderBy(F.col("df").desc(), F.col("gram"))
        .limit(top_k)
    )


def mine_boilerplate_sql(
    table: str, n: int = 6, min_df: int = 2, top_k: int = 100, text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`mine_boilerplate`."""
    return (
        f"SELECT gram, COUNT(*) AS df FROM ("
        f"SELECT UNNEST({_word_grams_sql(text_col, n)}) AS gram FROM {table}) __g "
        f"GROUP BY gram HAVING COUNT(*) >= {min_df} "
        f"ORDER BY df DESC, gram LIMIT {top_k}"
    )


def strip_boilerplate(
    df: DataFrame, grams: list[str], text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Remove every occurrence of each mined gram from the ORIGINAL text,
    longest-first so sub-grams of a longer boilerplate span don't leave
    fragments.

    Mining normalizes (lower+trim), so grams are matched case-insensitively
    (``(?iu)`` — plain ``(?i)`` is ASCII-only in Java regex and would skip
    'Über'↔'über') with ``\\s+`` between tokens. The source text is
    byte-identical everywhere a gram does NOT match — an earlier version
    emitted the normalized text corpus-wide, silently lowercasing exported
    training shards, and a global whitespace collapse would destroy code
    indentation the same way. Matches anchor on whitespace/string edges,
    not ``\\b``: mining is token-granular, so a gram must not match
    mid-word ('tuba b c…' vs gram 'a b c…'), and word-boundary anchors
    silently skip grams edged by punctuation ('corp.', '(c) 2024 …').

    Seam repair is sentinel-scoped: each match (zero-width lookarounds, so
    adjacent occurrences all match in one pass) becomes a NUL sentinel,
    and three final replaces operate ONLY where a sentinel sits — a
    document-edge run disappears outright, an interior run collapses to
    the first original separator char (a newline between paragraphs stays
    a newline, not a space). Documents whose text contains literal NUL
    bytes would interact with the sentinel; real text corpora don't.

    ``grams`` is a driver-side list (top-k mining output — bounded by
    construction); each becomes one JVM ``regexp_replace`` in a fused
    expression chain, so removal stays inside the scan stage."""
    import re as _re

    cleaned: Column = F.col(text_col)
    replaced_any = False
    for g in sorted(grams, key=len, reverse=True):
        toks = [t for t in g.split() if t]
        if not toks:
            continue
        replaced_any = True
        pat = (
            r"(?iu)(?<=^|\s)"
            + r"\s+".join(_re.escape(t) for t in toks)
            + r"(?=\s|$)"
        )
        cleaned = F.regexp_replace(cleaned, pat, "\x00")
    if replaced_any:
        cleaned = F.regexp_replace(cleaned, r"\s*(?:\x00\s*)+$", "")
        cleaned = F.regexp_replace(cleaned, r"^\s*(?:\x00\s*)+", "")
        cleaned = F.regexp_replace(cleaned, r"(\s?)\s*(?:\x00\s*)+", "$1")
    return df.withColumn(out_col or text_col, cleaned)
