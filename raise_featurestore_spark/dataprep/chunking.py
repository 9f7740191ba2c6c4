"""Sliding-window document chunking for RAG / pretraining-context prep.

Complement of ``packing.py`` (which concatenates short docs into fixed
windows): split each LONG document into overlapping fixed-size token
windows — window ``W`` tokens, stride ``S`` — the standard retrieval /
long-context chunker. Engine addition; the reference has no text-prep
surface.

Chunk starts are 1-based token offsets ``1, 1+S, 1+2S, …`` up to
``max(n − W + S, 1)``: every token is covered, the final chunk may be
shorter than ``W``, and a doc shorter than ``W`` yields exactly one
chunk. Emitted per chunk: start offset, token count, and the h32 hash of
the chunk text (the cross-engine-checkable identity of the content
without shipping the strings twice).

Scale design: pure per-row column work — tokenize once, build the start
list with ``sequence`` and ``posexplode`` it; no shuffle at all (the
chunker is a flatMap the optimizer keeps inside the scan stage). Output
grows by ~W/S×; at 100 TB you write it partitioned by the downstream
key, you don't re-shuffle here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raise_featurestore_spark.dataprep import hashing as H
from raise_featurestore_spark.dataprep import text as TX


def chunk_documents(
    df: DataFrame,
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per (doc, chunk): chunk_idx, chunk_start, n_chunk_tokens,
    chunk_hash. ``stride < window`` gives overlapping chunks; ``stride ==
    window`` gives a disjoint split."""
    if not 0 < stride <= window:
        raise ValueError(f"need 0 < stride <= window, got {stride}/{window}")
    # null text -> no chunks (without the filter, NULL propagates through
    # size() but greatest(NULL, 1) = 1, emitting a phantom all-NULL chunk)
    df = df.where(F.col(text_col).isNotNull())
    toks = TX.ws_tokens(F.col(text_col))
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(toks) - F.lit(window - stride), F.lit(1)),
        F.lit(stride),
    )
    exploded = df.select(
        F.col(id_col), toks.alias("__toks"), F.posexplode(starts)
    ).withColumnsRenamed({"pos": "chunk_idx", "col": "chunk_start"})
    chunk = F.slice(F.col("__toks"), F.col("chunk_start"), window)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("chunk_start").cast("int").alias("chunk_start"),
        F.size(chunk).cast("int").alias("n_chunk_tokens"),
        H.h32(F.array_join(chunk, " ")).alias("chunk_hash"),
    )


def chunk_documents_sql(
    table: str,
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`chunk_documents` (zipped unnests)."""
    slc = f"list_slice(toks, st, st + {window} - 1)"
    # COALESCE: DuckDB's array_to_string over an EMPTY list is NULL while
    # Spark's array_join is '' — a zero-token doc's single empty chunk
    # must hash identically on both engines
    joined = f"COALESCE(array_to_string({slc}, ' '), '')"
    return (
        f"WITH __t AS (SELECT {id_col}, {TX.ws_tokens_sql(text_col)} "
        f"AS toks FROM {table} WHERE {text_col} IS NOT NULL), "
        f"__s AS (SELECT {id_col}, toks, "
        f"generate_series(1, GREATEST(len(toks) - {window - stride}, 1), {stride}) "
        f"AS starts FROM __t), "
        f"__z AS (SELECT {id_col}, starts, "
        f"list_transform(starts, st -> len({slc})) AS lens, "
        f"list_transform(starts, st -> {H.h32_sql(joined)}) "
        f"AS hashes FROM __s) "
        f"SELECT {id_col}, "
        f"CAST(UNNEST(generate_series(1, len(starts))) - 1 AS INT) AS chunk_idx, "
        f"CAST(UNNEST(starts) AS INT) AS chunk_start, "
        f"CAST(UNNEST(lens) AS INT) AS n_chunk_tokens, "
        f"UNNEST(hashes) AS chunk_hash FROM __z"
    )
