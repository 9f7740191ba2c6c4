"""BPE tokenizer-training support: corpus-scale symbol-pair statistics.

Training a BPE tokenizer has two very different halves:

1. **Word frequency + pair counting** — corpus-scale, embarrassingly
   parallel, and the part that actually needs 100 TB of data. That is
   what this module distributes.
2. **The merge loop** — inherently sequential (each merge changes the
   next iteration's pair counts) over a state of ~|vocab| words, i.e.
   driver-scale by nature once step 1 has collapsed the corpus into a
   word-frequency table (Sennrich et al. 2016 operate on exactly that
   table; GPT-2's training corpus collapses to ~10⁶ distinct words).

``word_freqs`` is one shuffle (explode tokens → groupBy word); its
output is the ONLY thing the merge loop needs, so a 100 TB corpus flows
through Spark exactly once. ``pair_counts`` derives the initial
character-pair statistics the first merge consumes — also a pure plan
(per-word char bigrams weighted by word frequency; the per-word
transform is a map-side higher-order function, then ONE groupBy(pair)).
``train_bpe`` runs the sequential merge loop on the driver against a
top-``max_words`` frequency table (bounded memory; the tail of the
word distribution cannot affect early merges at realistic skew).

The end-of-word marker ``</w>`` follows the original BPE formulation so
"low" as a word-suffix and "low" mid-compound count separately.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from raise_featurestore_spark.dataprep.text import ws_tokens, ws_tokens_sql

EOW = "</w>"


def word_freqs(df: DataFrame, text_col: str = "text", lowercase: bool = True) -> DataFrame:
    """(word, freq) over the corpus — the collapsed input of BPE training.

    One explode + one groupBy (map-side combinable). At 100 TB the output
    is ~|distinct words| rows — a table, not a corpus.
    """
    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    return (
        df.select(F.explode(ws_tokens(c)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def word_freqs_sql(table: str, text_col: str = "text", lowercase: bool = True) -> str:
    c = f"LOWER({text_col})" if lowercase else text_col
    return (
        f"SELECT word, COUNT(*) AS freq FROM ("
        f"SELECT UNNEST({ws_tokens_sql(c)}) AS word FROM {table}) __w "
        f"GROUP BY word"
    )


def _char_pairs(word: Column) -> Column:
    """Adjacent character pairs of ``word + EOW``, as 'a b' strings.

    The marker is appended as ONE symbol: pairs are (c1,c2)…(c_n, </w>).
    """
    n = F.length(word)
    inner = F.when(
        n >= 2, F.sequence(F.lit(1), n - F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
    pairs = F.transform(
        inner, lambda i: F.concat(F.substring(word, i, 1), F.lit(" "), F.substring(word, i + 1, 1))
    )
    last = F.concat(F.substring(word, -1, 1), F.lit(" "), F.lit(EOW))
    return F.concat(pairs, F.array(last))


def _char_pairs_sql(word: str) -> str:
    inner = (
        f"list_transform(range(1, GREATEST(length({word}) - 1, 0) + 1), "
        f"i -> substr({word}, i, 1) || ' ' || substr({word}, i + 1, 1))"
    )
    last = f"[substr({word}, -1, 1) || ' {EOW}']"
    return f"list_concat({inner}, {last})"


def pair_counts(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 200,
    min_freq: int = 2,
    lowercase: bool = True,
) -> DataFrame:
    """Top-``top_k`` adjacent character pairs by corpus frequency — the
    statistic the FIRST BPE merge consumes, at corpus scale.

    Plan: word_freqs (one shuffle) → map-side per-word pair explode
    weighted by freq → groupBy(pair) sum (second shuffle, partial-agg
    combinable) → top-k (TakeOrderedAndProject). The explode factor is
    word LENGTH over the DISTINCT-word table, not the corpus — the heavy
    lifting happened in word_freqs.
    """
    wf = word_freqs(df, text_col, lowercase)
    pairs = wf.select(
        F.explode(_char_pairs(F.col("word"))).alias("pair"),
        F.col("freq"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("n"))
        .where(F.col("n") >= min_freq)
        .orderBy(F.col("n").desc(), F.col("pair"))
        .limit(top_k)
    )


def pair_counts_sql(
    table: str,
    text_col: str = "text",
    top_k: int = 200,
    min_freq: int = 2,
    lowercase: bool = True,
) -> str:
    """DuckDB twin of :func:`pair_counts`.

    ``SUM(freq)`` is cast to BIGINT: DuckDB widens integer SUM to HUGEINT,
    which pandas renders as float64 — an int-vs-float dtype split against
    Spark's long that canon-hashes differently under repr-style float
    rendering (the r5 driver-gate red on this query; scripts/dtype_sweep.py
    pins parity).
    """
    return (
        f"WITH __wf AS ({word_freqs_sql(table, text_col, lowercase)}) "
        f"SELECT pair, CAST(SUM(freq) AS BIGINT) AS n FROM ("
        f"SELECT UNNEST({_char_pairs_sql('word')}) AS pair, freq FROM __wf) __p "
        f"GROUP BY pair HAVING SUM(freq) >= {min_freq} "
        f"ORDER BY n DESC, pair LIMIT {top_k}"
    )


def train_bpe(
    df: DataFrame,
    n_merges: int = 100,
    text_col: str = "text",
    max_words: int = 100_000,
    min_pair_freq: int = 2,
    lowercase: bool = True,
) -> list[tuple[str, str]]:
    """The sequential BPE merge loop, driver-side over the top-``max_words``
    word-frequency table (ONE corpus pass; ties break lexicographically so
    the merge list is deterministic).

    Returns the ordered merge list — the artifact a tokenizer ships.
    """
    rows = (
        word_freqs(df, text_col, lowercase)
        .orderBy(F.col("freq").desc(), F.col("word"))
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r.word) + (EOW,): r.freq for r in rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, freq in vocab.items():
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        best = max(counts.items(), key=lambda kv: (kv[1], kv[0]))
        (a, b), n = best
        if n < min_pair_freq:
            break
        merges.append((a, b))
        merged = a + b
        out: dict[tuple[str, ...], int] = {}
        for sym, freq in vocab.items():
            parts: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    parts.append(merged)
                    i += 2
                else:
                    parts.append(sym[i])
                    i += 1
            out[tuple(parts)] = out.get(tuple(parts), 0) + freq
        vocab = out
    return merges
