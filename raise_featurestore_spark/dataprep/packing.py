"""Sequence packing: assign documents to fixed-size context windows.

LLM pre-training consumes documents as fixed-length token windows: the
standard recipe concatenates documents in a deterministic order and cuts
the stream every ``window_tokens`` tokens ("concat-then-chunk"). This
module computes, fully declaratively, which chunk each document starts in
and at what offset — the shuffle-free metadata a downstream tokenizer
needs to materialize packed sequences.

Scale design: packing is a running sum, i.e. a window aggregate. A single
global ``ORDER BY`` window would funnel 100 TB through one partition, so
the stream is sharded first (by ``shard_col``, e.g. language or a hash
bucket) and packed independently within each shard —
``SUM() OVER (PARTITION BY shard ORDER BY ...)`` keeps every partition
local to its executor. Shards are independent token streams; chunk ids are
per-shard. Document order within a shard is the shared md5-derived h32
hash (see dataprep/hashing.py) — deterministic, engine-portable, and
decorrelated from insertion order (adjacent near-duplicates scatter).

The reference has no packing surface; engine addition per the task brief.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from raise_featurestore_spark.dataprep import hashing as H


@dataclass
class PackingSpec:
    window_tokens: int = 512
    id_col: str = "doc_id"
    text_col: str = "text"
    shard_col: str = "lang"
    # filtered-whitespace token count; swap for a real tokenizer's count
    # column when one is materialized
    token_count_expr: str | None = None


def _n_tok(spec: PackingSpec):
    if spec.token_count_expr:
        return F.expr(spec.token_count_expr)
    # filtered whitespace tokenizer — consecutive/leading whitespace must not
    # mint empty-string tokens, matching every other text operator's count
    from raise_featurestore_spark.dataprep.text import ws_tokens

    return F.size(ws_tokens(F.col(spec.text_col)))


def pack_documents(df: DataFrame, spec: PackingSpec | None = None) -> DataFrame:
    """(id, shard, n_tok, chunk_id, chunk_off) per document.

    ``chunk_id`` = which window the document STARTS in; ``chunk_off`` = its
    token offset within that window. A document longer than the remaining
    window simply continues into the next chunk(s) — exactly the
    concat-then-chunk semantics of pre-training data loaders.
    """
    spec = spec or PackingSpec()
    d = df.select(
        F.col(spec.id_col),
        F.col(spec.shard_col),
        _n_tok(spec).alias("n_tok"),
        H.h32(F.col(spec.id_col).cast("string")).alias("__h"),
    )
    w = (
        Window.partitionBy(spec.shard_col)
        .orderBy("__h", spec.id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tok").over(w) - F.col("n_tok")
    b = spec.window_tokens
    return d.select(
        spec.id_col,
        spec.shard_col,
        "n_tok",
        F.floor(start / b).alias("chunk_id"),
        (start % b).alias("chunk_off"),
    )


def pack_documents_sql(table: str, spec: PackingSpec | None = None) -> str:
    """DuckDB twin of :func:`pack_documents`."""
    spec = spec or PackingSpec()
    from raise_featurestore_spark.dataprep.text import ws_tokens_sql

    tok = (
        spec.token_count_expr
        if spec.token_count_expr
        else f"len({ws_tokens_sql(spec.text_col)})"
    )
    return (
        f"WITH d AS (SELECT {spec.id_col}, {spec.shard_col}, {tok} AS n_tok, "
        f"{H.h32_sql(f'CAST({spec.id_col} AS VARCHAR)')} AS __h FROM {table}), "
        f"c AS (SELECT {spec.id_col}, {spec.shard_col}, n_tok, "
        f"SUM(n_tok) OVER (PARTITION BY {spec.shard_col} ORDER BY __h, {spec.id_col} "
        f"ROWS UNBOUNDED PRECEDING) - n_tok AS strt FROM d) "
        f"SELECT {spec.id_col}, {spec.shard_col}, CAST(n_tok AS BIGINT) AS n_tok, "
        f"CAST(FLOOR(strt / {spec.window_tokens}) AS BIGINT) AS chunk_id, "
        f"CAST(strt % {spec.window_tokens} AS BIGINT) AS chunk_off FROM c"
    )
