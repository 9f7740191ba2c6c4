"""Exact-substring overlap detection between documents (token windows).

The staple "exact substring dedup" from the LLM-curation literature
(Lee et al., *Deduplicating Training Data Makes Language Models Better*,
arXiv:2107.06499): two documents sharing a verbatim run of ≥ ``window``
tokens are near-duplicates even when their MinHash/Jaccard similarity is
low (e.g. a long quote embedded in otherwise-unrelated pages). The
reference has no such operator (its dedup surface is mocked); this is an
engine addition per the §2.14 charter.

Plan shape (scale-first — the suffix-array construction of the paper is
replaced by a pure shuffle-join formulation Spark executes well):

1. one Generate per doc emits a rolling ``window``-token hash per position
   (rows ≈ corpus token count — a flat map, no shuffle);
2. an occurrence cap drops hot windows (a window appearing in hundreds of
   docs is boilerplate, handled by `dataprep/boilerplate.py`; without the
   cap a stop-window with occ occurrences contributes occ² join rows —
   the same df-cap lesson as `dedup.py` n-gram Jaccard);
3. ONE equi-join on the 60-bit window hash (`hashing.h60`) produces
   matched position pairs; the hash-partitioned Exchange is shared between
   the cap join and the pair join (same key);
4. longest verbatim span per pair falls out of a run-length trick: matched
   positions with equal ``pos_a − pos_b`` offset and consecutive ``pos_a``
   belong to one verbatim run, so ``pos_a − row_number()`` within
   (pair, offset) is constant per run; span_tokens = run_len + window − 1.
   The window partitions by (id_a, id_b, offset) — bounded by document
   length, never a global sort.

Collision posture: the 60-bit hash's birthday expectation at 4×10⁹
distinct windows is ~7×10⁻³ false pairs corpus-wide — acceptable for a
near-dup *report*; a pipeline that deletes text on the result should
verify candidate spans against the raw text (one extra semi-join).

Oracle: `substring_overlap_pairs_sql` emits the same plan in ANSI SQL over
the same md5-derived hash, so DuckDB reproduces it bit-for-bit. All output
columns are integers — no float-grid concerns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from raise_featurestore_spark.dataprep import hashing as H

DEFAULT_WINDOW = 20
DEFAULT_MAX_OCC = 50


def window_hashes(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = DEFAULT_WINDOW,
) -> DataFrame:
    """(id, pos, gh): one 60-bit hash per ``window``-token rolling window.

    Tokenization is a plain single-space split of lower(trim(text)) —
    chosen for bit-exact cross-engine parity with DuckDB's string_split
    (both keep empty tokens on repeated spaces), not linguistic fidelity.
    """
    # token array PROJECTED before the window transform (r11-opt): a
    # split expression referenced inside the lambda re-tokenizes the doc
    # once per window position — O(tokens²) per doc (the shingles /
    # word-grams per-element-recompute class).
    base = df.select(
        F.col(id_col).alias("id"),
        F.split(F.lower(F.trim(F.col(text_col))), " ").alias("__toks"),
    )
    toks = F.col("__toks")
    n = F.size(toks)
    grams = F.when(
        n >= window,
        F.transform(
            F.sequence(F.lit(0), n - window),
            lambda i: F.array_join(F.slice(toks, i + F.lit(1), window), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        base.select("id", F.posexplode(grams).alias("pos", "gram"))
        .select("id", "pos", H.h60(F.col("gram")).alias("gh"))
    )


def _window_hashes_sql(table: str, id_col: str, text_col: str, window: int) -> str:
    t = f"LOWER(TRIM({text_col}))"
    gram = f"array_to_string(tk[i + 1 : i + {window}], ' ')"
    return (
        f"SELECT id, i AS pos, {H.h60_sql(gram)} AS gh FROM ("
        f"SELECT {id_col} AS id, string_split({t}, ' ') AS tk FROM {table}) __tk, "
        f"UNNEST(range(0, GREATEST(len(tk) - {window} + 1, 0))) AS __t(i)"
    )


def substring_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = DEFAULT_WINDOW,
    max_occ: int = DEFAULT_MAX_OCC,
) -> DataFrame:
    """Doc pairs sharing ≥1 verbatim ``window``-token run.

    Returns (id_a, id_b, shared_windows, max_span_tokens): the number of
    matched window-position pairs and the longest verbatim token span.
    """
    win = window_hashes(df, id_col, text_col, window)
    # occurrence cap: stop-windows would contribute occ² join rows each
    keep = win.groupBy("gh").count().where(F.col("count") <= max_occ).select("gh")
    w2 = win.join(keep, "gh")
    a = w2.select(F.col("id").alias("id_a"), F.col("pos").alias("pos_a"), "gh")
    b = w2.select(F.col("id").alias("id_b"), F.col("pos").alias("pos_b"), "gh")
    m = a.join(b, "gh").where(F.col("id_a") < F.col("id_b"))
    off = (F.col("pos_a") - F.col("pos_b")).alias("off")
    runs = m.select("id_a", "id_b", "pos_a", off).withColumn(
        "grp",
        F.col("pos_a")
        - F.row_number().over(
            Window.partitionBy("id_a", "id_b", "off").orderBy("pos_a")
        ),
    )
    spans = runs.groupBy("id_a", "id_b", "off", "grp").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return spans.groupBy("id_a", "id_b").agg(
        F.sum("run_len").cast("long").alias("shared_windows"),
        (F.max("run_len") + F.lit(window - 1)).cast("long").alias("max_span_tokens"),
    )


def substring_overlap_pairs_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = DEFAULT_WINDOW,
    max_occ: int = DEFAULT_MAX_OCC,
) -> str:
    win = _window_hashes_sql(table, id_col, text_col, window)
    return (
        f"WITH win AS ({win}), "
        f"keep AS (SELECT gh FROM win GROUP BY gh HAVING COUNT(*) <= {max_occ}), "
        f"w2 AS (SELECT win.* FROM win JOIN keep USING (gh)), "
        f"m AS (SELECT a.id AS id_a, b.id AS id_b, a.pos AS pos_a, "
        f"a.pos - b.pos AS off FROM w2 a JOIN w2 b USING (gh) WHERE a.id < b.id), "
        f"runs AS (SELECT id_a, id_b, off, pos_a - ROW_NUMBER() OVER ("
        f"PARTITION BY id_a, id_b, off ORDER BY pos_a) AS grp FROM m), "
        f"spans AS (SELECT id_a, id_b, off, grp, COUNT(*) AS run_len "
        f"FROM runs GROUP BY 1, 2, 3, 4) "
        f"SELECT id_a, id_b, CAST(SUM(run_len) AS BIGINT) AS shared_windows, "
        f"CAST(MAX(run_len) + {window - 1} AS BIGINT) AS max_span_tokens "
        f"FROM spans GROUP BY 1, 2"
    )
