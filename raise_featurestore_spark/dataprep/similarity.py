"""Similarity search over embedding columns (array<float>).

- **brute_force_topk**: exact cosine top-k against a literal query vector.
  One scan; Catalyst turns sort+limit into TakeOrderedAndProject (no global
  sort materialization). The JVM-side higher-order dot product keeps the
  hot loop out of Python entirely. This is the correctness baseline.
- **lsh_bucket_topk**: the scale path — random-hyperplane (sign) LSH.
  Bucket id = bits of sign(v·h_p) over P hyperplanes; the query prunes to
  its own bucket (expected n/2^P of the corpus) before exact scoring.
  Recall can be raised by probing neighbor buckets (bit flips) — the probe
  list is generated driver-side as literals, still one pruned scan.
- **embedding_near_dup_pairs**: near-duplicate detection — banded
  sign-LSH candidates (B bands × r planes each; a pair is a candidate if
  it agrees on ALL r planes of ANY band), exact cosine ≥ τ on the
  deduped candidates. The per-band key width r is N-ADAPTIVE: r grows
  with log2(corpus rows) so the key domain scales with the corpus and
  expected bucket occupancy stays constant — a FIXED plane count (the
  pre-r11 design: one band of 6 planes = 64 buckets forever) makes
  bucket occupancy grow linearly and the within-bucket self-join
  quadratically, the same fixed-domain ceiling the r11 rehearsal
  measured for byte-banded simhash. Banding (OR over B bands) keeps
  recall from collapsing as r grows: P(candidate) = 1-(1-p^r)^B for
  per-plane agreement p = 1-θ/π.

Hyperplanes are ±1 vectors from ``random.Random(seed)`` — embedded as
literals into both the Spark plan and the DuckDB oracle SQL, so both
engines compute identical buckets (integer signs; no float RNG drift).
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from raise_featurestore_spark.functions import vector as V
from raise_featurestore_spark.functions.stable import grid_snap, grid_snap_sql

DEFAULT_PLANES = 6
# banded near-dup candidates: B fixed bands, per-band width n-adaptive
DEFAULT_BANDS = 4
MAX_BAND_WIDTH = 24  # key domain 2^24 ≈ 16.8M per band; clamp point
_BAND_TARGET_ROWS = 16  # expected bucket occupancy the width formula holds


def hyperplanes(dim: int, n_planes: int = DEFAULT_PLANES, seed: int = 13) -> list[list[int]]:
    """n ±1-valued hyperplanes (deterministic, shared with the oracle)."""
    rng = random.Random(seed)
    return [[rng.choice((-1, 1)) for _ in range(dim)] for _ in range(n_planes)]


def band_width(n_rows: int) -> int:
    """Per-band plane count r for an n-row corpus: smallest r with
    ``_BAND_TARGET_ROWS * 2^r >= n`` (clamped to [4, MAX_BAND_WIDTH]), so
    expected bucket occupancy n/2^r stays ≤ ~16 at ANY corpus size.

    The oracle derives the SAME r inside SQL from COUNT(*) (see
    :func:`_band_width_sql`); the ``- 1e-9`` guard absorbs last-ulp log2
    differences between libms — it can only matter when log2(n/16) sits
    within 1e-9 of an integer, which for integer n first happens at
    n ≈ 2^30 · 16, far beyond the clamp point where both engines emit
    MAX_BAND_WIDTH regardless."""
    import math

    return max(
        4,
        min(
            MAX_BAND_WIDTH,
            math.ceil(math.log2(max(n_rows, 1) / float(_BAND_TARGET_ROWS)) - 1e-9),
        ),
    )


def _band_width_sql(table: str) -> str:
    """SQL twin of :func:`band_width` over COUNT(*) of ``table``."""
    return (
        f"(SELECT GREATEST(4, LEAST({MAX_BAND_WIDTH}, CAST(ceil("
        f"log2(GREATEST(COUNT(*), 1) / {float(_BAND_TARGET_ROWS)}) - 1e-9) AS INT)))"
        f" FROM {table})"
    )


def _dot_chain(plane: list[int], elem) -> str:
    """``± v[0] ± v[1] ± …`` for a ±1 plane — a FLAT left-to-right chain,
    not a higher-order fold: Spark evaluates it inside whole-stage
    codegen (an ``aggregate()`` lambda is interpreted per element — the
    band kernel's first JVM cut spent ~10 s/query on lambda dispatch or
    janino-overflow interpreted fallback at sf0.1 — the Spark side now
    computes keys in the Arrow pandas UDF instead), and because every
    product is an exact sign flip the chain's rounding sequence is
    identical in any evaluator that accumulates dimension-sequentially —
    the same bit-equal ±-element-chain contract as the sliced-W1 drift
    oracle. ``elem(j)`` renders the 0-based element ref (DuckDB
    ``v[j+1]``)."""
    terms = [("+ " if c > 0 else "- ") + elem(j) for j, c in enumerate(plane)]
    first = terms[0][2:] if plane[0] > 0 else "-" + terms[0][2:]
    return "(" + " ".join([first] + terms[1:]) + ")"


def _band_key_expr(plane_slice: list[list[int]], elem) -> str:
    """Band key = Σ 2^i · [v·h_i > 0] over the slice, as ONE SQL string
    (string-built: py4j per-node Column construction costs ~0.3 ms/node
    and the r11 literal-map experiment rejected exactly that class)."""
    bits = [
        f"CASE WHEN {_dot_chain(p, elem)} > 0.0 THEN CAST({2 ** i} AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END"
        for i, p in enumerate(plane_slice)
    ]
    return "(" + " + ".join(bits) + ")"


def _duck_elem(col: str):
    return lambda j: f"{col}[{j + 1}]"


def _lit_array(vals) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def _sql_array(vals) -> str:
    return "[" + ", ".join(str(float(v)) for v in vals) + "]"


def bucket_col(emb: Column, planes: list[list[int]]) -> Column:
    """LSH bucket id = Σ 2^p · [v·h_p > 0]."""
    bits = [
        F.when(V.dot(emb, _lit_array(p)) > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    return sum(bits[1:], bits[0])


def bucket_sql(emb_expr: str, planes: list[list[int]]) -> str:
    bits = [
        f"CASE WHEN list_dot_product({emb_expr}, {_sql_array(p)}) > 0 "
        f"THEN CAST({2**i} AS BIGINT) ELSE 0 END"
        for i, p in enumerate(planes)
    ]
    return "(" + " + ".join(bits) + ")"


def py_bucket(vec: list[float], planes: list[list[int]]) -> int:
    return sum(
        2**i
        for i, p in enumerate(planes)
        if sum(x * y for x, y in zip(vec, p)) > 0
    )


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    q = _lit_array(query_vec)
    # dimension guard: a malformed row (wrong vector length) would yield a
    # NULL cosine via zip_with padding on Spark but an ERROR in engines
    # with strict list math — filter it identically everywhere
    cos = V.cosine_similarity(F.col(emb_col), q)
    return (
        df.where(F.size(F.col(emb_col)) == len(query_vec))
        .select(F.col(id_col), grid_snap(cos, round_to).alias("cosine"))
        .where(F.col("cosine").isNotNull())
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def brute_force_topk_sql(
    table: str,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_to: int = 4,
) -> str:
    q = _sql_array(query_vec)
    cos = f"list_cosine_similarity(CAST({emb_col} AS DOUBLE[]), {q})"
    # order by the ROUNDED cosine (matching the Spark twin) — ordering by
    # the raw value can pick a different top-k set on rounding ties
    return (
        f"SELECT {id_col}, {grid_snap_sql(cos, round_to)} AS cosine FROM {table} "
        f"WHERE len({emb_col}) = {len(query_vec)} AND {cos} IS NOT NULL "
        f"ORDER BY {grid_snap_sql(cos, round_to)} DESC, {id_col} LIMIT {k}"
    )


def lsh_bucket_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    planes: list[list[int]] | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Approximate top-k: exact cosine within the query's LSH bucket."""
    planes = planes or hyperplanes(len(query_vec))
    qb = py_bucket(query_vec, planes)
    pruned = df.where(bucket_col(F.col(emb_col), planes) == F.lit(qb))
    return brute_force_topk(pruned, query_vec, k, id_col, emb_col, round_to)


def lsh_bucket_topk_sql(
    table: str,
    query_vec: list[float],
    k: int = 10,
    planes: list[list[int]] | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_to: int = 4,
) -> str:
    planes = planes or hyperplanes(len(query_vec))
    qb = py_bucket(query_vec, planes)
    q = _sql_array(query_vec)
    cos = f"list_cosine_similarity(CAST({emb_col} AS DOUBLE[]), {q})"
    b = bucket_sql(f"CAST({emb_col} AS DOUBLE[])", planes)
    return (
        f"SELECT {id_col}, {grid_snap_sql(cos, round_to)} AS cosine FROM {table} "
        f"WHERE len({emb_col}) = {len(query_vec)} AND {b} = {qb} AND {cos} IS NOT NULL "
        f"ORDER BY {grid_snap_sql(cos, round_to)} DESC, {id_col} LIMIT {k}"
    )


# ---------------------------------------------------------------- IVF ANN


def kmeans_centroids(
    df: DataFrame,
    dim: int,
    k: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    sample_rows: int = 4096,
    iters: int = 8,
    seed: int = 29,
) -> list[list[float]]:
    """Coarse quantizer: Lloyd's k-means on a BOUNDED, deterministic sample
    (first ``sample_rows`` by id — a TakeOrdered, not a full sort), numpy
    float64 on the driver. At 100 TB quantizer training stays a
    bounded-sample problem; only assignment is corpus-scale."""
    rows = (
        df.select(id_col, emb_col)
        # NULL vectors must not reach the driver matrix (list(None) was a
        # raw TypeError; the documented guard below is the contract)
        .where(F.col(emb_col).isNotNull())
        .orderBy(id_col)
        .limit(sample_rows)
        .collect()
    )
    X = np.array([list(r[1]) for r in rows], dtype=np.float64)
    if len(X) < k:
        raise ValueError(f"need >= {k} sample vectors, got {len(X)}")
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=k, replace=False)].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(1)
        for j in range(k):
            pts = X[assign == j]
            if len(pts):
                C[j] = pts.mean(0)
    _ = dim  # dim is part of the index signature for catalog metadata
    return [c.tolist() for c in C]


def centroid_signature(centroids: list[list[float]]) -> str:
    """Content hash binding an ``ivf_cluster`` assignment to the exact
    centroid matrix that produced it (shape + float64 bytes)."""
    import hashlib

    C = np.array(centroids, dtype=np.float64)
    return hashlib.md5(str(C.shape).encode() + C.tobytes()).hexdigest()[:16]


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Append ``ivf_cluster``: nearest-centroid id via ONE vectorized
    Arrow-batched matmul per batch (the centroid matrix rides the closure —
    a broadcast at cluster scale). At 100 TB, write the corpus partitioned
    (or bucketed) by this column so probes prune files, not rows.

    The column carries ``ivf_centroids_sig`` field metadata (the
    :func:`centroid_signature` of the quantizer that produced it), which
    survives an unpartitioned parquet round-trip; probe functions verify
    it so an assignment from DIFFERENT centroids can't silently prune the
    wrong inverted lists. Hive-partitioned writes reconstruct the column
    from directory names (metadata stripped) — those callers pass
    ``assigned=True`` to assert the binding explicitly (the r9 ADVICE
    finding: column presence alone was the trust signal)."""
    from pyspark.sql.functions import pandas_udf

    C = np.array(centroids, dtype=np.float64)
    cn = (C * C).sum(1)

    def assign(s: pd.Series) -> pd.Series:
        M = np.stack([np.asarray(v, dtype=np.float64) for v in s.to_numpy()])
        d2 = (M * M).sum(1)[:, None] - 2.0 * (M @ C.T) + cn[None, :]
        return pd.Series(d2.argmin(1))

    cluster = pandas_udf(assign, "int")(F.col(emb_col)).alias(
        "ivf_cluster", metadata={"ivf_centroids_sig": centroid_signature(centroids)}
    )
    # REPLACE semantics on re-assignment (r10 ADVICE): a frame that
    # already carries ivf_cluster (e.g. an old assignment fed back in)
    # must not end up with two same-named columns — drop the stale one
    # so downstream F.col("ivf_cluster") stays unambiguous.
    if "ivf_cluster" in df.columns:
        df = df.drop("ivf_cluster")
    return df.select("*", cluster)


def _bound_assignment(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    emb_col: str,
    assigned: bool | None,
) -> DataFrame:
    """Resolve the corpus-with-``ivf_cluster`` frame a probe may prune on.

    ``assigned=None`` (default): trust a pre-existing column only if its
    ``ivf_centroids_sig`` metadata matches ``centroids`` — raise on a
    mismatch (wrong index), REASSIGN if the column carries no signature
    (an unbound external column is not evidence). ``assigned=True``: the
    caller asserts the column was produced with these centroids (the
    hive-partitioned materialized-index path, where partition columns
    lose metadata); the column must exist. ``assigned=False``: always
    reassign."""
    has = "ivf_cluster" in df.columns
    if assigned is True:
        if not has:
            raise ValueError("assigned=True but corpus has no ivf_cluster column")
        return df
    if assigned is False or not has:
        return ivf_assign(
            df.drop("ivf_cluster") if has else df, centroids, id_col, emb_col
        )
    sig = df.schema["ivf_cluster"].metadata.get("ivf_centroids_sig")
    want = centroid_signature(centroids)
    if sig == want:
        return df
    if sig is not None:
        raise ValueError(
            f"corpus ivf_cluster assignment was built with different centroids "
            f"(signature {sig} != {want}); pass the matching centroids or "
            f"assigned=False to reassign"
        )
    return ivf_assign(df.drop("ivf_cluster"), centroids, id_col, emb_col)


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_to: int = 4,
    assigned: bool | None = None,
) -> DataFrame:
    """IVF probe: rank centroids by distance to the query driver-side,
    prune the corpus to the ``nprobe`` nearest inverted lists, exact cosine
    within. ``nprobe=len(centroids)`` degrades gracefully to brute force.
    ``assigned`` binds a precomputed ``ivf_cluster`` column to these
    centroids — see :func:`_bound_assignment`."""
    q = np.asarray(query_vec, dtype=np.float64)
    C = np.array(centroids, dtype=np.float64)
    probe = ((C - q[None, :]) ** 2).sum(1).argsort()[:nprobe].tolist()
    bound = _bound_assignment(df, centroids, id_col, emb_col, assigned)
    pruned = bound.where(F.col("ivf_cluster").isin([int(p) for p in probe]))
    return brute_force_topk(pruned, query_vec, k, id_col, emb_col, round_to)


def query_probes(
    queries: DataFrame,
    centroids: list[list[float]],
    nprobe: int,
    emb_col: str = "embedding",
) -> DataFrame:
    """Append ``__probes``: each query's ``nprobe`` nearest centroid ids
    (stable argsort — deterministic under distance ties), one Arrow batch
    matmul per partition, mirroring :func:`ivf_assign`."""
    from pyspark.sql.functions import pandas_udf

    C = np.array(centroids, dtype=np.float64)
    cn = (C * C).sum(1)

    def probes(s: pd.Series) -> pd.Series:
        M = np.stack([np.asarray(v, dtype=np.float64) for v in s.to_numpy()])
        d2 = (M * M).sum(1)[:, None] - 2.0 * (M @ C.T) + cn[None, :]
        idx = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.tolist() for row in idx])

    return queries.withColumn("__probes", pandas_udf(probes, "array<int>")(F.col(emb_col)))


def ivf_batch_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
    query_emb_col: str = "embedding",
    round_to: int = 4,
    assigned: bool | None = None,
) -> DataFrame:
    """Batch-mode IVF ANN: a query TABLE joined through the same
    inverted-list pruning as :func:`ivf_topk` — the shape a training
    pipeline actually runs (point lookups don't amortize the corpus scan).

    Plan, scale-first:

    1. Corpus rows get ``ivf_cluster`` (one Arrow matmul pass; at 100 TB
       the corpus is WRITTEN partitioned by this column, so the probe join
       prunes files, and the assignment pass is free). A corpus that
       ALREADY CARRIES ``ivf_cluster`` — e.g. the materialized assignment
       from ``io/cache.cached_table`` or a table written partitioned by
       cluster — skips the matmul entirely (r8 VERDICT item 4: the
       assignment was recomputed per query against the operator's own
       written-partitioned contract). The ``assigned`` parameter binds
       that precomputed column to these centroids (signature-validated by
       default; ``assigned=True`` for hive-partitioned tables whose
       partition column lost its metadata — see :func:`_bound_assignment`).
    2. Queries get their ``nprobe`` nearest lists, exploded to
       (query, probe_cluster) and BROADCAST — a query batch is bounded
       (thousands), so the corpus never shuffles: candidates come out of a
       broadcast hash join on the pruned scan.
    3. Per-query exact cosine top-k in TWO stages: a partition-local top-k
       (groupBy (query, partition-id) → sort_array + slice, completed
       map-side) cuts candidates to ≤ k rows per (query, partition) BEFORE
       the only shuffle on query id; the final merge re-sorts ≤ k·P structs
       per query. A single per-query window would instead ship every
       candidate of a hot query to one task.

    Returns (query_id, rank 1..k, vec_id, cosine) rows.
    """
    bound = _bound_assignment(corpus, centroids, id_col, emb_col, assigned)
    # Probe selection runs DRIVER-side on the collected batch: the batch
    # is broadcast to every executor two lines down regardless (that IS
    # the scale contract — queries bounded, corpus never shuffles), so
    # collecting it first moves no extra bytes and saves a Python-worker
    # stage per query run. Same stable-argsort tie-break as query_probes.
    C = np.array(centroids, dtype=np.float64)
    cn = (C * C).sum(1)
    qrows = queries.select(
        F.col(query_id_col).alias("__qid"),
        F.col(query_emb_col).cast("array<double>").alias("__qv"),
    ).collect()
    spark = queries.sparkSession
    if qrows:
        M = np.stack([np.asarray(r["__qv"], dtype=np.float64) for r in qrows])
        d2 = (M * M).sum(1)[:, None] - 2.0 * (M @ C.T) + cn[None, :]
        probes = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]
    qid_t = queries.schema[query_id_col].dataType.simpleString()
    probed = spark.createDataFrame(
        [
            (r["__qid"], list(r["__qv"]), int(c))
            for r, row in zip(qrows, probes)
            for c in row
        ]
        if qrows
        else [],
        f"__qid {qid_t}, __qv array<double>, ivf_cluster int",
    )
    cand = bound.join(F.broadcast(probed), "ivf_cluster").where(
        F.size(F.col(emb_col)) == F.size(F.col("__qv"))
    )
    cos = grid_snap(
        V.cosine_similarity(F.col(emb_col).cast("array<double>"), F.col("__qv")),
        round_to,
    )
    return _two_stage_topk(cand, cos, k, id_col, query_id_col)


def _two_stage_topk(
    cand: DataFrame, cos: Column, k: int, id_col: str, query_id_col: str
) -> DataFrame:
    """Per-query top-k over candidate rows carrying ``__qid``.

    Stage 1 truncates INSIDE each input partition (mapInPandas with an
    incrementally re-truncated pandas buffer: memory ≤ k × queries-seen +
    one Arrow batch, never the whole partition) — so the one query-keyed
    shuffle moves ≤ k rows per (query, partition). A groupBy(query,
    partition-id) + collect_list would instead ship every candidate in
    full partial-aggregate buffers through its exchange — the truncating
    slice there sits ABOVE the final aggregate, after the wire. Stage 2
    merges ≤ k·P structs per query. Ordering is (cosine desc, id asc) in
    both stages — deterministic on rounded-cosine ties."""
    scored = cand.select(
        F.col("__qid"), F.col(id_col), cos.alias("cosine")
    ).where(F.col("cosine").isNotNull())
    fields = {f.name: f.dataType.simpleString() for f in scored.schema.fields}
    schema = f"__qid {fields['__qid']}, {id_col} {fields[id_col]}, cosine double"

    def local_topk(batches):
        buf = None
        for pdf in batches:
            cur = pdf if buf is None else pd.concat([buf, pdf], ignore_index=True)
            cur = cur.sort_values(
                ["__qid", "cosine", id_col], ascending=[True, False, True],
                kind="mergesort",
            )
            buf = cur.groupby("__qid", sort=False).head(k)
        if buf is not None and len(buf):
            yield buf

    pruned = scored.mapInPandas(local_topk, schema)
    entry = F.struct((-F.col("cosine")).alias("nc"), F.col(id_col).alias("i"))
    merged = pruned.groupBy("__qid").agg(
        F.slice(F.sort_array(F.collect_list(entry)), 1, k).alias("__top")
    )
    return merged.select(
        F.col("__qid").alias(query_id_col),
        F.posexplode("__top").alias("__pos", "__e"),
    ).select(
        query_id_col,
        (F.col("__pos") + 1).alias("rank"),
        F.col("__e.i").alias(id_col),
        (-F.col("__e.nc")).alias("cosine"),
    )


def brute_force_batch_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
    query_emb_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact batch top-k (corpus × broadcast queries) — the recall ground
    truth for :func:`ivf_batch_topk`'s band verdict; at scale you run the
    IVF path and sample THIS one for recall monitoring only."""
    q = queries.select(
        F.col(query_id_col).alias("__qid"),
        F.col(query_emb_col).cast("array<double>").alias("__qv"),
    )
    cand = corpus.select(F.col(id_col), F.col(emb_col)).crossJoin(F.broadcast(q)).where(
        F.size(F.col(emb_col)) == F.size(F.col("__qv"))
    )
    cos = grid_snap(
        V.cosine_similarity(F.col(emb_col).cast("array<double>"), F.col("__qv")),
        round_to,
    )
    return _two_stage_topk(cand, cos, k, id_col, query_id_col)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    planes: list[list[int]] | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_to: int = 4,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Pairs with cosine ≥ threshold sharing a banded LSH key: candidate
    = agrees on ALL r planes of ANY of ``bands`` bands, r n-adaptive
    (:func:`band_width`), exact cosine on the deduped candidates.

    Scale contract (the r11 rehearsal finding this rebuild answers): the
    pre-r11 single-band fixed-6-plane design has a FIXED 64-key domain,
    so bucket occupancy grows linearly with the corpus and the
    within-bucket self-join quadratically — the same ceiling as
    byte-banded simhash. Here the per-band key domain is 2^band_width(n)
    ≥ n/16, so expected occupancy (and per-key join work) is constant at
    any corpus size; banding keeps recall from collapsing as r grows
    (P = 1-(1-p^r)^bands).

    All band keys are computed in ONE Arrow pandas-UDF pass (the
    ivf_assign precedent: per-row work is a dim×(bands·r) sign-matrix
    product, vectorized over rows — a JVM expression for this is either
    an interpreted higher-order fold or a janino-overflow flat chain,
    both measured ~10 s/query at sf0.1). Accumulation is SEQUENTIAL over
    dimensions (vectorized over rows and planes), so each dot's rounding
    order is bit-identical to the oracle's left-to-right ± element chain.
    Candidates come from ONE (band, key) groupBy with streaming in-row
    pair expansion (r12 — see the inline comment), not a self-join: the
    vectors cross a single unsorted exchange once, and the former
    broadcast-vs-SMJ question for the join (the jaccard x64 OOM class)
    no longer exists because there is no join. Multi-band duplicates are
    removed by ONE final DISTINCT after the threshold filter, where the
    relation is smallest.

    Plan build is EAGER (one count() job) to derive the band width, the
    same documented posture as compile_correlation's rank maps. Passing
    explicit ``planes`` keeps the legacy single-band fixed-plane
    semantics for callers that pinned them."""
    if planes is not None:
        with_b = df.select(
            F.col(id_col).alias("id"),
            F.col(emb_col).cast("array<double>").alias("v"),
            bucket_col(F.col(emb_col), planes).alias("b"),
        )
        a, b = with_b.alias("a"), with_b.alias("b")
        cos = V.cosine_similarity(F.col("a.v"), F.col("b.v"))
        return (
            a.join(b, (F.col("a.b") == F.col("b.b")) & (F.col("a.id") < F.col("b.id")))
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                grid_snap(cos, round_to).alias("cosine"),
            )
            .where(F.col("cosine") >= threshold)
        )
    r = band_width(df.count())
    pool = hyperplanes(dim, bands * MAX_BAND_WIDTH, seed=13)
    # sign matrix S[j, c]: column c = bit i of band b (c = b*r + i)
    sign = np.array(
        [
            [pool[bd * MAX_BAND_WIDTH + i][j] for bd in range(bands) for i in range(r)]
            for j in range(dim)
        ],
        dtype=np.float64,
    )
    weights = np.array([1 << i for i in range(r)], dtype=np.int64)
    n_dim, n_bands = dim, bands

    @F.pandas_udf("array<long>")
    def _band_keys(col: pd.Series) -> pd.Series:
        vecs = col.to_numpy()
        # rows the oracle's ± chain can evaluate to non-NULL/non-NaN: at
        # least dim elements (extras ignored by both sides), none missing
        # — anything else yields key 0 in BOTH engines (NULL/NaN chain
        # never satisfies > 0, so every CASE arm contributes 0)
        ok = np.array(
            [
                u is not None
                and len(u) >= n_dim
                and not pd.isna(np.asarray(u[:n_dim], dtype=np.float64)).any()
                for u in vecs
            ],
            dtype=bool,
        )
        keys = np.zeros((len(vecs), n_bands), dtype=np.int64)
        if ok.any():
            mat = np.stack(
                [np.asarray(u[:n_dim], dtype=np.float64) for u in vecs[ok]]
            )
            acc = np.zeros((mat.shape[0], sign.shape[1]))
            for j in range(n_dim):  # sequential over dims = oracle's ± chain order
                acc += mat[:, j : j + 1] * sign[j][None, :]
            bits = (acc > 0.0).reshape(mat.shape[0], n_bands, -1)
            keys[ok] = bits @ weights
        return pd.Series(list(keys), dtype=object)

    @F.pandas_udf("double")
    def _pair_cos(ca: pd.Series, cb: pd.Series) -> pd.Series:
        """cos = a·b / (‖a‖·‖b‖) with the SAME operation sequence as
        V.cosine_similarity / list_cosine_similarity (sequential mul+add
        over dims from 0.0, sqrt each norm, multiply, divide — each step
        single-rounded), vectorized over the batch; NULL when either
        norm is 0 or a vector is malformed (matching the JVM fold's NULL
        propagation). The HOF fold it replaces cost ~100 interpreted
        lambda dispatches per pair — ~6 s/query on sf0.1's candidates."""
        av, bv = ca.to_numpy(), cb.to_numpy()
        ok = np.zeros(len(av), dtype=bool)
        fa, fb = [], []
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None or y is None or len(x) != n_dim or len(y) != n_dim:
                continue
            try:
                fa.append(np.asarray(x, dtype=np.float64))
                fb.append(np.asarray(y, dtype=np.float64))
            except (TypeError, ValueError):
                continue
            ok[i] = True
        out = np.full(len(av), None, dtype=object)
        if ok.any():
            A, B = np.stack(fa), np.stack(fb)
            d = np.zeros(len(A))
            na = np.zeros(len(A))
            nb = np.zeros(len(A))
            for j in range(n_dim):  # sequential over dims = the fold's order
                d += A[:, j] * B[:, j]
                na += A[:, j] * A[:, j]
                nb += B[:, j] * B[:, j]
            sna, snb = np.sqrt(na), np.sqrt(nb)
            valid = (sna > 0) & (snb > 0)
            with np.errstate(all="ignore"):
                cosv = d / (sna * snb)
            out[ok] = [float(c) if m else None for c, m in zip(cosv, valid)]
        return pd.Series(out, dtype=object)

    base = df.select(
        F.col(id_col).alias("id"), F.col(emb_col).cast("array<double>").alias("v")
    )
    keyed = base.select(
        "id", "v", F.posexplode(_band_keys("v")).alias("band", "key")
    )
    # Candidate generation is ONE groupBy over the keyed frame with
    # in-row pair expansion (r12-opt; the simhash/jaccard shape): each
    # (band, key) bucket collects its (id, v) occupants — expected
    # occupancy is pinned at ~_BAND_TARGET_ROWS by the n-adaptive width,
    # so the list is small at ANY corpus size — and streams its pairs
    # through two chained Generates (posexplode of the bucket, then
    # explode of the per-pivot tail slice: O(bucket) bytes per row, the
    # same streaming class as the SMJ's buffered key group). This
    # replaces the banded self-join, which ran the scan + the _band_keys
    # Arrow UDF once PER SIDE and paid two sorted band-key exchanges of
    # the vector-carrying rows; now the vectors cross one unsorted
    # exchange once. The _pair_cos UDF sees the same candidate multiset
    # as the join produced (one occurrence per shared bucket); the
    # multi-band duplicates are still removed by the ONE final DISTINCT
    # after the threshold filter, where the relation is smallest.
    bucket = (
        keyed.groupBy("band", "key")
        .agg(F.collect_list(F.struct("id", "v")).alias("xs"))
        .where(F.size("xs") >= 2)
    )
    pairs = (
        bucket.select("xs", F.posexplode("xs").alias("__i", "x"))
        .select(
            F.col("x"),
            F.explode(F.expr("slice(xs, __i + 2, size(xs))")).alias("y"),
        )
        .selectExpr(
            "IF(x.id < y.id, x.id, y.id) AS id_a",
            "IF(x.id < y.id, y.id, x.id) AS id_b",
            # _pair_cos is bit-symmetric in its arguments (per-dim
            # products commute; the norm product is the same either
            # way), so pair orientation cannot change the value
            "x.v AS va",
            "y.v AS vb",
        )
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            grid_snap(_pair_cos(F.col("va"), F.col("vb")), round_to).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .distinct()
    )


def embedding_near_dup_pairs_sql(
    table: str,
    threshold: float = 0.95,
    planes: list[list[int]] | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_to: int = 4,
    bands: int = DEFAULT_BANDS,
) -> str:
    """DuckDB twin. The static SQL cannot know the corpus size, so each
    band's FULL MAX_BAND_WIDTH-bit key is computed and masked down to the
    low band_width(COUNT(*)) bits — bit-identical to the Spark side
    building only the first r planes (bit i of the masked key = plane i
    of the band's pool slice in both engines)."""
    if planes is not None:
        b = bucket_sql(f"CAST({emb_col} AS DOUBLE[])", planes)
        src = f"(SELECT {id_col} AS id, CAST({emb_col} AS DOUBLE[]) AS v, {b} AS b FROM {table}) "
        cos = "list_cosine_similarity(a.v, b.v)"
        return (
            f"SELECT a.id AS id_a, b.id AS id_b, {grid_snap_sql(cos, round_to)} AS cosine "
            f"FROM {src} a JOIN {src} b ON a.b = b.b AND a.id < b.id "
            f"WHERE {grid_snap_sql(cos, round_to)} >= {threshold}"
        )
    pool = hyperplanes(dim, bands * MAX_BAND_WIDTH, seed=13)
    arms = " UNION ALL ".join(
        f"SELECT id, v, {bd} AS band, "
        + _band_key_expr(
            pool[bd * MAX_BAND_WIDTH : (bd + 1) * MAX_BAND_WIDTH], _duck_elem("v")
        )
        + " & (SELECT mask FROM __w) AS key FROM __src"
        for bd in range(bands)
    )
    cos = "list_cosine_similarity(a.v, b.v)"
    return (
        f"WITH __w AS (SELECT (CAST(1 AS BIGINT) << {_band_width_sql(table)}) - 1 AS mask), "
        f"__src AS (SELECT {id_col} AS id, CAST({emb_col} AS DOUBLE[]) AS v FROM {table}), "
        f"__keys AS ({arms}) "
        f"SELECT DISTINCT a.id AS id_a, b.id AS id_b, "
        f"{grid_snap_sql(cos, round_to)} AS cosine "
        f"FROM __keys a JOIN __keys b "
        f"ON a.band = b.band AND a.key = b.key AND a.id < b.id "
        f"WHERE {grid_snap_sql(cos, round_to)} >= {threshold}"
    )


def quantize_int8(
    df: DataFrame, id_col: str = "vec_id", emb_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = 127 / max|x|,
    q_i = round(x_i * scale).

    At 100 TB the point is wire/shuffle volume: float32 embeddings
    quantized to int8 cut every downstream exchange and cache 4×, with the
    scale kept per-vector for dequantization. Pure higher-order column
    expressions — no Python, no shuffle. Output carries per-vector
    checksums (sum, L1) so the op is oracle-checkable without emitting the
    full array; ``quantized`` itself is included for downstream use.
    """
    absmax = F.array_max(F.transform(emb_col, lambda x: F.abs(x.cast("double"))))
    scale = F.when(absmax > 0, F.lit(127.0) / absmax).otherwise(F.lit(0.0))
    q = F.transform(emb_col, lambda x: grid_snap(x.cast("double") * F.col("__scale"), 0).cast("int"))
    return (
        df.withColumn("__scale", scale)
        .withColumn("quantized", q)
        .select(
            F.col(id_col),
            grid_snap(F.col("__scale"), 6).alias("scale_r"),
            F.aggregate("quantized", F.lit(0), lambda a, x: a + x).alias("q_sum"),
            F.aggregate("quantized", F.lit(0), lambda a, x: a + F.abs(x)).alias("q_l1"),
            "quantized",
        )
    )


def quantize_int8_sql(table: str, id_col: str = "vec_id", emb_col: str = "embedding") -> str:
    """DuckDB twin of :func:`quantize_int8` (checksum columns only — the
    driver compare hashes scalar columns; array column is dropped by the
    query wrapper)."""
    return (
        f"WITH s AS (SELECT {id_col}, "
        f"list_max(list_transform({emb_col}, x -> abs(CAST(x AS DOUBLE)))) AS m, {emb_col} "
        f"FROM {table}), "
        f"q AS (SELECT {id_col}, CASE WHEN m > 0 THEN 127.0 / m ELSE 0.0 END AS scale, {emb_col} "
        f"FROM s) "
        # COALESCE: list_aggregate([], 'sum') is NULL in DuckDB while the
        # Spark fold returns its 0 init — empty vectors must agree
        f"SELECT {id_col}, {grid_snap_sql('scale', 6)} AS scale_r, "
        f"CAST(COALESCE(list_aggregate(list_transform({emb_col}, "
        f"x -> CAST(FLOOR(CAST(x AS DOUBLE) * scale + 0.5) AS INT)), 'sum'), 0) AS INT) AS q_sum, "
        f"CAST(COALESCE(list_aggregate(list_transform({emb_col}, "
        f"x -> abs(CAST(FLOOR(CAST(x AS DOUBLE) * scale + 0.5) AS INT))), 'sum'), 0) AS INT) AS q_l1 "
        f"FROM q"
    )


def semantic_dedup_clusters(
    df: DataFrame,
    threshold: float = 0.95,
    planes: list[list[int]] | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic duplicate clusters: hyperplane-LSH-bucketed
    cosine near-dup pairs (:func:`embedding_near_dup_pairs`) resolved to
    transitive clusters by the alternating-star connected-components
    kernel (dataprep/components.py) — cluster label = min vec_id, so
    ``labels.where(node != cluster)`` is the drop set and the keepers are
    one representative per semantic group.

    Scale: pair generation is banded n-adaptive LSH (no all-pairs join,
    key domain grows with the corpus — see
    :func:`embedding_near_dup_pairs`); CC is the same shuffles-per-round
    plan as ``dedup_clusters``."""
    pairs = embedding_near_dup_pairs(
        df, threshold=threshold, planes=planes, dim=dim,
        id_col=id_col, emb_col=emb_col,
    )
    from raise_featurestore_spark.dataprep.components import connected_components

    labels = connected_components(pairs, "id_a", "id_b")
    return labels.select(F.col("node").alias(id_col), "cluster")


def semantic_dedup_clusters_sql(
    table: str,
    threshold: float = 0.95,
    planes: list[list[int]] | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> str:
    """DuckDB twin (recursive-CTE label propagation — oracle-scale only)."""
    from raise_featurestore_spark.dataprep.components import components_sql

    inner = components_sql(
        embedding_near_dup_pairs_sql(
            table, threshold=threshold, planes=planes, dim=dim,
            id_col=id_col, emb_col=emb_col,
        )
    )
    return f"SELECT node AS {id_col}, cluster FROM ({inner}) __cc"
