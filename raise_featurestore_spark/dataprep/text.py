"""Text analysis over a (doc_id, text) corpus: language-ID, quality
scoring, token counting, document fingerprinting.

All four are pure column expressions (split/regexp/higher-order functions)
— JVM-side, whole-stage-codegen, zero Python in the row path — and each has
a DuckDB twin built from the same literals, so every operator here is
oracle-checked, not just smoke-tested.

- **language-ID**: distinct-token overlap against per-language stopword
  lists (the classic cheap n-gram/stopword heuristic). Deterministic
  argmax with a fixed tie-break order.
- **quality score**: length/punctuation/digit/stopword-ratio components
  combined into a [0,1] score — the usual pre-training heuristic filters.
- **token counting**: whitespace tokens plus a BPE-ish regex token count
  (letter runs / digit runs / punctuation runs counted separately).
- **fingerprint**: min-over-windows of the shared 32-bit hash of character
  8-grams (winnowing-style witness). A true Rabin-Karp rolling hash needs
  per-row state Spark can't express declaratively; min-of-window-hashes
  has the same collision/determinism properties for fingerprint equality
  and stays engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from raise_featurestore_spark.dataprep import hashing as H
from raise_featurestore_spark.functions.stable import grid_snap, grid_snap_sql

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "as"],
    "de": ["der", "die", "das", "und", "ist", "von", "nicht", "mit", "ein", "eine", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "des", "une", "dans", "que", "pour", "pas", "sur"],
    "es": ["el", "la", "los", "las", "es", "una", "para", "con", "por", "del", "que", "se"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # deterministic tie-break priority

PUNCT_RE = r"[^\w\s]"
DIGIT_RE = "[0-9]"
BPE_RE = r"\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+"


def _tokens(c: Column) -> Column:
    return F.filter(F.split(F.lower(c), r"\W+"), lambda w: F.length(w) > 0)


def _tokens_sql(e: str) -> str:
    return f"list_filter(string_split_regex(LOWER({e}), '\\W+'), w -> length(w) > 0)"


def ws_tokens(c: Column) -> Column:
    """Whitespace tokenizer shared by token_counts / chunking / packing —
    the Spark form and :func:`ws_tokens_sql` must stay byte-equivalent or
    cross-engine token budgets silently drift."""
    return F.filter(F.split(c, r"\s+"), lambda w: F.length(w) > 0)


def ws_tokens_sql(e: str) -> str:
    return f"list_filter(string_split_regex({e}, '\\s+'), w -> length(w) > 0)"


def _lang_scores(toks: Column) -> dict[str, Column]:
    d = F.array_distinct(toks)
    return {
        lang: F.size(F.array_intersect(d, F.array(*[F.lit(w) for w in words])))
        for lang, words in STOPWORDS.items()
    }


def detect_language(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, predicted_lang, stopword_hits) via stopword-overlap argmax."""
    toks = _tokens(F.col(text_col))
    scores = _lang_scores(toks)
    best = F.greatest(*scores.values())
    pred = F.lit("unknown")
    for lang in reversed(LANG_ORDER):  # earlier langs win ties (applied last)
        pred = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return df.select(
        F.col(id_col),
        pred.alias("predicted_lang"),
        best.cast("int").alias("stopword_hits"),
    )


def detect_language_sql(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    toks = _tokens_sql(text_col)
    score_cols = ", ".join(
        f"len(list_intersect(list_distinct(__t), [{', '.join(repr(w) for w in words)}])) "
        f"AS __s_{lang}"
        for lang, words in STOPWORDS.items()
    )
    best = f"GREATEST({', '.join(f'__s_{lang}' for lang in STOPWORDS)})"
    case = "CASE "
    for lang in LANG_ORDER:
        case += f"WHEN __s_{lang} = __best AND __best > 0 THEN '{lang}' "
    case += "ELSE 'unknown' END"
    return (
        f"SELECT {id_col}, {case} AS predicted_lang, CAST(__best AS INT) AS stopword_hits "
        f"FROM (SELECT {id_col}, {score_cols}, {best} AS __best "
        f"FROM (SELECT {id_col}, {toks} AS __t FROM {table}) __t0) __s"
    )


def quality_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", round_to: int = 4
) -> DataFrame:
    """Heuristic [0,1] quality score + its component ratios."""
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = _tokens(t)
    n_toks = F.size(toks)
    punct_ratio = F.regexp_count(t, F.lit(PUNCT_RE)) / F.greatest(n_chars, F.lit(1))
    digit_ratio = F.regexp_count(t, F.lit(DIGIT_RE)) / F.greatest(n_chars, F.lit(1))
    stop_ratio = F.size(
        F.filter(toks, lambda w: w.isin(*STOPWORDS["en"]))
    ) / F.greatest(n_toks, F.lit(1))
    len_score = F.least(n_toks / F.lit(100.0), F.lit(1.0))
    punct_score = F.greatest(F.lit(1.0) - 5.0 * punct_ratio, F.lit(0.0))
    digit_score = F.greatest(F.lit(1.0) - 5.0 * digit_ratio, F.lit(0.0))
    stop_score = F.least(5.0 * stop_ratio, F.lit(1.0))
    score = 0.25 * (len_score + punct_score + digit_score + stop_score)
    # grid_snap, not engine ROUND: int/int ratios routinely land on exact
    # .xxx5 repr-ties where Spark (HALF_UP on shortest repr) and DuckDB
    # (binary round) disagree in the last decimal — the banned emission
    # class (functions/stable.py); these columns also feed the
    # quality-filter thresholds downstream (dataprep/filters.py)
    return df.select(
        F.col(id_col),
        n_toks.cast("int").alias("n_tokens"),
        grid_snap(punct_ratio, round_to).alias("punct_ratio"),
        grid_snap(digit_ratio, round_to).alias("digit_ratio"),
        grid_snap(stop_ratio, round_to).alias("stopword_ratio"),
        grid_snap(score, round_to).alias("quality_score"),
    )


def quality_score_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text", round_to: int = 4
) -> str:
    t = text_col
    stop_list = ", ".join(repr(w) for w in STOPWORDS["en"])
    inner = (
        f"SELECT {id_col}, "
        f"len({_tokens_sql(t)}) AS __nt, "
        f"len(regexp_extract_all({t}, '{PUNCT_RE}')) * 1.0 / GREATEST(length({t}), 1) AS __pr, "
        f"len(regexp_extract_all({t}, '{DIGIT_RE}')) * 1.0 / GREATEST(length({t}), 1) AS __dr, "
        f"len(list_filter({_tokens_sql(t)}, w -> w IN ({stop_list}))) * 1.0 "
        f"/ GREATEST(len({_tokens_sql(t)}), 1) AS __sr "
        f"FROM {table}"
    )
    score = (
        f"0.25 * (LEAST(__nt / 100.0, 1.0) + GREATEST(1.0 - 5.0 * __pr, 0.0) "
        f"+ GREATEST(1.0 - 5.0 * __dr, 0.0) + LEAST(5.0 * __sr, 1.0))"
    )
    return (
        f"SELECT {id_col}, CAST(__nt AS INT) AS n_tokens, "
        f"{grid_snap_sql('__pr', round_to)} AS punct_ratio, "
        f"{grid_snap_sql('__dr', round_to)} AS digit_ratio, "
        f"{grid_snap_sql('__sr', round_to)} AS stopword_ratio, "
        f"{grid_snap_sql(score, round_to)} "
        f"AS quality_score FROM ({inner}) __q"
    )


def token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    t = F.col(text_col)
    ws = F.size(ws_tokens(t))
    bpe = F.regexp_count(t, F.lit(BPE_RE))
    return df.select(
        F.col(id_col),
        ws.cast("int").alias("ws_tokens"),
        bpe.cast("int").alias("bpe_tokens"),
    )


def token_counts_sql(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    t = text_col
    return (
        f"SELECT {id_col}, "
        f"CAST(len({ws_tokens_sql(t)}) AS INT) AS ws_tokens, "
        f"CAST(len(regexp_extract_all({t}, '{BPE_RE}')) AS INT) AS bpe_tokens "
        f"FROM {table}"
    )


def fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 8
) -> DataFrame:
    """Winnowing-style document fingerprint: min 32-bit hash over character
    n-gram windows of the normalized text."""
    # normalized text PROJECTED once per row (r11-opt): referencing the
    # lower(trim(...)) expression inside the gram lambda re-lowercases
    # the whole document per gram position — O(len²) bytes per doc (the
    # dedup.shingles per-element-recompute class).
    base = df.select(
        F.col(id_col), F.lower(F.trim(F.col(text_col))).alias("__t")
    )
    t = F.col("__t")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.length(t) - n, F.lit(0))),
        lambda i: F.substring(t, F.lit(1) + i, n),
    )
    fp = F.array_min(F.transform(grams, lambda g: H.h32(g)))
    return base.select(F.col(id_col), fp.alias("fingerprint"))


def fingerprint_sql(table: str, id_col: str = "doc_id", text_col: str = "text", n: int = 8) -> str:
    t = f"LOWER(TRIM({text_col}))"
    grams = (
        f"list_transform(range(0, GREATEST(length({t}) - {n}, 0) + 1), "
        f"i -> substr({t}, i + 1, {n}))"
    )
    return (
        f"SELECT {id_col}, list_aggregate(list_transform({grams}, g -> {H.h32_sql('g')}), 'min') "
        f"AS fingerprint FROM {table}"
    )


def repetition_metrics(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document: token count, duplicate
    -token fraction, and the count of the most-repeated bigram.

    Zero-shuffle: the max-bigram count folds a sorted in-row array with a
    higher-order ``aggregate`` (longest equal-run over the sorted bigram
    array == max multiplicity), so the whole operator is one projection —
    no explode, no groupBy, scan-speed at 100 TB. (Compare
    raise_/PRD.md's quality checks, which declare only null/range-style
    checks; repetition filters are an engine addition per the task brief.)

    Documents with <2 tokens (empty/punctuation-only text) produce an empty
    bigram array and ``top_bigram_count = 0`` — the slice length is clamped
    with ``greatest(..., 0)`` because Spark rejects negative slice lengths.
    """
    toks = _tokens(F.col(text_col))
    best = F.expr(
        """
        aggregate(
          array_sort(zip_with(slice(__t, 1, greatest(size(__t)-1, 0)),
                              slice(__t, 2, greatest(size(__t)-1, 0)),
                              (a, b) -> concat(a, ' ', b))),
          named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0),
          (acc, x) -> named_struct(
             'prev', x,
             'run',  IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1, 1),
             'best', GREATEST(acc.best,
                              IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1, 1))),
          acc -> acc.best)
        """
    )
    return (
        df.withColumn("__t", toks)
        .select(
            F.col(id_col),
            F.size("__t").alias("n_tokens"),
            # grid_snap, not engine ROUND (repr-tie divergence; this column
            # feeds the dup_token_frac filter threshold)
            grid_snap(
                F.lit(1.0) - F.size(F.array_distinct("__t")) / F.greatest(F.size("__t"), F.lit(1)),
                6,
            ).alias("dup_token_frac"),
            best.alias("top_bigram_count"),
        )
    )


def repetition_metrics_sql(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB twin of :func:`repetition_metrics`. The oracle counts bigram
    multiplicity the direct way (unnest + group) — correctness only, the
    Spark side carries the scale design. Documents with <2 tokens emit no
    bigram rows, so the join to the bigram CTE is LEFT + COALESCE(0) to
    mirror Spark's empty-bigram behavior."""
    toks = _tokens_sql(text_col)
    return (
        f"WITH t AS (SELECT {id_col}, {toks} AS toks FROM {table}), "
        f"b AS (SELECT {id_col}, unnest(list_transform(range(1, len(toks)), "
        f"i -> toks[i] || ' ' || toks[i+1])) AS bg FROM t), "
        f"c AS (SELECT {id_col}, MAX(cnt) AS top_bigram_count FROM "
        f"(SELECT {id_col}, bg, COUNT(*) AS cnt FROM b GROUP BY {id_col}, bg) GROUP BY {id_col}) "
        f"SELECT t.{id_col}, len(toks) AS n_tokens, "
        f"{grid_snap_sql('1.0 - len(list_distinct(toks)) * 1.0 / GREATEST(len(toks), 1)', 6)} AS dup_token_frac, "
        f"CAST(COALESCE(c.top_bigram_count, 0) AS INT) AS top_bigram_count "
        f"FROM t LEFT JOIN c ON t.{id_col} = c.{id_col}"
    )


def vocab_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """Corpus vocabulary profile: top-k tokens by frequency with corpus
    coverage fraction — the first look tokenizer training takes at a
    corpus.

    One explode + one hash groupBy (partial+final, map-side combine), the
    scalar total broadcast back, and the final top-k lowered to
    TakeOrderedAndProject — no global sort materialization. Deterministic
    order: count desc, token asc.
    """
    toks = df.select(F.explode(_tokens(F.col(text_col))).alias("token"))
    counts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("__total"))
    return (
        counts.join(F.broadcast(total))
        .select(
            "token",
            "cnt",
            grid_snap(F.col("cnt") / F.col("__total"), round_to).alias("frac"),
        )
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(k)
    )


def vocab_topk_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text", k: int = 100, round_to: int = 6
) -> str:
    toks = _tokens_sql(text_col)
    return (
        f"WITH __tok AS (SELECT UNNEST({toks}) AS token FROM {table}), "
        f"__cnt AS (SELECT token, COUNT(*) AS cnt FROM __tok GROUP BY token) "
        f"SELECT token, cnt, {grid_snap_sql('cnt * 1.0 / (SELECT SUM(cnt) FROM __cnt)', round_to)} AS frac "
        f"FROM __cnt ORDER BY cnt DESC, token LIMIT {k}"
    )


def encoding_report(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", round_to: int = 4
) -> DataFrame:
    """Per-document encoding-health signals — the crawl-cleaning triage
    columns (mojibake and binary-pasted-as-text both light these up):

    - ``n_control``: C0/C1 control characters other than \\t \\n \\r
    - ``n_replacement``: U+FFFD replacement characters (a decoder already
      gave up upstream)
    - ``non_ascii_ratio``: fraction of non-ASCII characters
    - ``mojibake_hits``: classic UTF-8-read-as-Latin-1 digraphs (Ã., Â.,
      â€., the smart-quote wrecks)

    Pure per-row regexp_count folds — zero shuffle, scan-stage only.
    Ratios snap with the IEEE grid form so thresholding downstream is
    engine-stable.
    """
    from raise_featurestore_spark.functions.stable import grid_snap

    c = F.col(text_col)
    n_chars = F.length(c).cast("double")
    ctl = F.regexp_count(c, F.lit(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]"))
    rep = F.regexp_count(c, F.lit("�"))
    non_ascii = F.regexp_count(c, F.lit(r"[^\x00-\x7F]"))
    moji = F.regexp_count(c, F.lit("(?:Ã.|Â.|â€.)"))
    return df.select(
        id_col,
        ctl.alias("n_control"),
        rep.alias("n_replacement"),
        grid_snap(
            F.when(n_chars > 0, non_ascii / n_chars).otherwise(F.lit(0.0)), round_to
        ).alias("non_ascii_ratio"),
        moji.alias("mojibake_hits"),
        (
            (ctl == 0) & (rep == 0) & (moji == 0)
        ).alias("looks_clean"),
    )


def encoding_report_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text", round_to: int = 4
) -> str:
    """DuckDB twin of :func:`encoding_report`.

    DuckDB regexes are RE2: no \\x{..} niceties needed — the same class
    literals as the Spark (Java regex) side match the same code points.
    """
    from raise_featurestore_spark.functions.stable import grid_snap_sql

    c = text_col
    ctl = (
        f"len(regexp_extract_all({c}, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]'))"
    )
    rep = f"len(regexp_extract_all({c}, '�'))"
    non_ascii = f"len(regexp_extract_all({c}, '[^\\x00-\\x7F]'))"
    moji = f"len(regexp_extract_all({c}, '(?:Ã.|Â.|â€.)'))"
    ratio = (
        f"CASE WHEN length({c}) > 0 "
        f"THEN CAST({non_ascii} AS DOUBLE) / length({c}) ELSE 0.0 END"
    )
    return (
        f"SELECT {id_col}, {ctl} AS n_control, {rep} AS n_replacement, "
        f"{grid_snap_sql(ratio, round_to)} AS non_ascii_ratio, "
        f"{moji} AS mojibake_hits, "
        f"({ctl} = 0 AND {rep} = 0 AND {moji} = 0) AS looks_clean "
        f"FROM {table}"
    )
