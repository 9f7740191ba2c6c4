"""Deduplication operators over a (doc_id, text) corpus.

Five strategies, cheapest-first, all deterministic and (except where noted)
oracle-checkable against DuckDB running the SAME plan:

- **exact**        : md5-groupBy; one shuffle of (hash → id).
- **ngram jaccard**: inverted-index self-join on character shingles with a
  document-frequency cap — the classic all-pairs-similarity plan that
  avoids O(n²) by only pairing docs sharing a (rare) shingle.
- **minhash + LSH**: k seeded min-hashes per doc (one explode + one groupBy),
  banded into (band, band-hash) buckets; candidate pairs join only within
  buckets. The scale path for corpora where even the shingle join is too hot.
- **simhash**      : 32-bit sign-of-weighted-sums fingerprint; near-dup =
  hamming ≤ radius among pairs sharing one of four 8-bit bands.
- **embedding cosine** near-dup lives in similarity.py (same banding trick
  with random-hyperplane signs).

Scale notes:
- Shingling multiplies rows by ~|text|; the df-cap (`max_df`) both bounds
  skew (a stop-shingle appearing in every doc would square the join) and
  cuts output volume. At 100 TB, raise `ngram_n` and cap `max_df` low.
- Every join here is an equi-join on a hash/band key → hash-partitioned
  shuffle, AQE-coalesced; no broadcast needed since both sides are big.
- All hashes derive from the shared md5-based h32 (see hashing.py), so the
  DuckDB oracle reproduces values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from raise_featurestore_spark.dataprep import hashing as H
from raise_featurestore_spark.functions.stable import grid_snap, grid_snap_sql

DEFAULT_NGRAM = 5
DEFAULT_MAX_DF = 100
DEFAULT_MINHASH_K = 16
DEFAULT_BANDS = 4


def _norm_text(c: Column) -> Column:
    return F.lower(F.trim(c))


def _norm_text_sql(e: str) -> str:
    return f"LOWER(TRIM({e}))"


# ---------------------------------------------------------------- exact


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", only_dups: bool = True
) -> DataFrame:
    """Group identical (normalized) texts: keeper = min id, plus dup count.

    ``only_dups=False`` returns the full keeper table (the thing you'd
    anti-join the corpus against to drop duplicates)."""
    h = F.md5(_norm_text(F.col(text_col)).cast("binary")).alias("content_hash")
    out = (
        df.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )
    return out.where(F.col("n_docs") > 1) if only_dups else out


def exact_duplicates_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text", only_dups: bool = True
) -> str:
    having = " HAVING COUNT(*) > 1" if only_dups else ""
    return (
        f"SELECT md5({_norm_text_sql(text_col)}) AS content_hash, "
        f"MIN({id_col}) AS keeper_id, COUNT(*) AS n_docs "
        f"FROM {table} GROUP BY 1{having}"
    )


# ---------------------------------------------------------------- shingles


def shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = DEFAULT_NGRAM
) -> DataFrame:
    """(id, shingle-hash) pairs — distinct character n-grams per doc.

    The normalized text is PROJECTED once per row before the gram
    transform (r11-opt): referencing ``lower(trim(text))`` inside the
    lambda re-evaluates it per element — one full lowered copy of the
    document per shingle position, O(len²) bytes per doc (measured
    0.43–0.46 → 0.29–0.30 s for the sf0.1 shingle pass, identical
    hashes).
    """
    base = df.select(
        F.col(id_col).alias("id"), _norm_text(F.col(text_col)).alias("__t")
    )
    t = F.col("__t")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.length(t) - n, F.lit(0))),
        lambda i: F.substring(t, F.lit(1) + i, n),
    )
    return base.select(
        "id",
        F.explode(F.array_distinct(grams)).alias("shingle"),
    ).select("id", H.h32(F.col("shingle")).alias("sh"))


def _shingles_sql(table: str, id_col: str, text_col: str, n: int) -> str:
    t = _norm_text_sql(text_col)
    return (
        f"SELECT {id_col} AS id, {H.h32_sql('shingle')} AS sh FROM ("
        f"SELECT {id_col}, UNNEST(list_distinct(list_transform("
        f"range(0, GREATEST(length({t}) - {n}, 0) + 1), "
        f"i -> substr({t}, i + 1, {n})))) AS shingle FROM {table}) __sh"
    )


# ---------------------------------------------------------------- jaccard


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_NGRAM,
    threshold: float = 0.6,
    max_df: int = DEFAULT_MAX_DF,
    round_to: int = 4,
    persist_shingles: bool = True,
) -> DataFrame:
    """Near-duplicate pairs by character-n-gram Jaccard ≥ threshold.

    Prefix-filtered inverted-index plan (PPJoin-style): docs pair up only
    through shared RARE shingles (document frequency ≤ max_df) drawn from
    each doc's rarest-first prefix, so candidate complexity is Σ df(s)²
    over prefix shingles — a small slice of the rare index — rather than
    |docs|²; candidates are then verified with one in-row array_intersect
    per pair.

    Candidate generation is ONE groupBy over the prefix index (r11):
    collect each shingle's posting list — bounded by the df cap, ≤ max_df
    ids — and emit its C(df, 2) pairs IN-ROW with an array transform. No
    self-join, no skew machinery: per-group work is structurally bounded
    at C(max_df, 2) (~20k pairs at the default 200), so there is nothing
    to salt and nothing to broadcast. This replaced a prefix-index
    self-join that needed hot-key salting plus a broadcast hot-set — the
    x64 scale rehearsal OOM'd the driver on that broadcast's
    corpus-linear cardinality, and the fixed (capped + sort-merge)
    variant still paid two sorted shuffles of the index where this shape
    pays one unsorted one. Same wall at sf0.1, identical pair sets.

    The shingle frame is consumed three times (df-cap, index join, sizes);
    ``persist_shingles`` caches it for interactive/local use. At 100 TB pass
    ``False`` and materialize ``shingles(...)`` to a parquet table first —
    an executor-memory cache of a corpus-sized exploded frame is the wrong
    tool there (same pattern as the simhash note below).
    """
    sh = shingles(df, id_col, text_col, n)
    if persist_shingles:
        sh = sh.persist()
    df_counts = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("__df"))
    # SORT-MERGE, not broadcast, for the df-attach join: df_counts is the
    # corpus's DISTINCT-shingle relation — Catalyst's size estimate reads
    # it as broadcastable at toy scale, but it grows linearly with the
    # corpus and the x64 scale rehearsal killed the driver building the
    # broadcast (r11). SMJ clusters on sh (the build side reuses the
    # groupBy's own exchange) and SPILLS instead of holding a per-task
    # hash relation: the shuffle_hash variant measured in between GC-
    # thrashed at x64 — 32 concurrent in-heap builds of a corpus-scale
    # relation is the same unbounded-memory bet as the broadcast, one
    # level down. This is the join shape a 100 TB corpus needs anyway.
    #
    # The join keeps EVERY shingle row (the cap becomes an in-row
    # condition) so that ONE groupBy(id) computes both the full set size
    # sz and the rare sorted array — the r11-opt fold of the old separate
    # sizes = sh.groupBy(id) aggregation, which paid a second pass over
    # the persisted shingle frame. The rare condition sits INSIDE
    # collect_list as a WHEN (collect_list skips nulls), so the partial
    # aggregate drops common shingles map-side and the exchange ships
    # only rare structs plus the partial counts — not the full corpus of
    # struct rows a post-collect filter would.
    flagged = sh.join(df_counts.hint("merge"), "sh")

    # Prefix filtering (the PPJoin family's candidate pruning): order each
    # doc's rare shingles by a GLOBAL (df asc, sh) order and index only the
    # first  r - ceil(t·r) + 1  of them. Any pair with (capped) Jaccard ≥ t
    # has rare-intersection ≥ ceil(t·r) on each side (union ≥ r because
    # full sizes bound rare sizes), and two sets with intersection ≥ o must
    # collide within those prefixes — so candidate generation only touches
    # the rarest ~(1-t) fraction of the index, shrinking Σdf² by orders of
    # magnitude on collision-heavy corpora. Verification then runs in-row:
    # one array_intersect per surviving candidate pair instead of the old
    # (id_a, id_b, shared-shingle)-row explosion + groupBy, which dominated
    # runtime. t gets a 1e-3 safety margin because the emitted jaccard is
    # rounded before the threshold compare.
    t_eff = max(threshold - 1e-3, 0.0)
    doc_sets = (
        flagged.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("sz"),
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("__df") <= max_df, F.struct("__df", "sh"))
                    )
                ),
                lambda x: x["sh"],
            ).alias("arr"),
        )
        .select(
            "id",
            "sz",
            "arr",
            F.slice(
                "arr",
                1,
                F.greatest(
                    F.size("arr") - F.ceil(F.size("arr") * F.lit(t_eff)).cast("int") + 1,
                    F.lit(1),
                ),
            ).alias("prefix"),
        )
    )
    if persist_shingles:
        # consumed twice (prefix index + array verification); one compact
        # row per doc. At 100 TB this frame IS the signature store —
        # materialize it to a table instead (same note as simhash below).
        doc_sets = doc_sets.persist()
    # The prefix rows CARRY the doc's (sz, rsz) ints (r12-opt): candidate
    # pairs inherit both sides' size metadata straight from the in-row
    # expansion, so the two slim (id, sz, rsz) SMJ attach joins — two
    # sorted exchanges of the candidate frame plus two of the doc frame —
    # disappear outright (guide §2.3 ship metadata, §2.4 remove
    # shuffles). Cost: +8 bytes on each prefix-index row and +16 on each
    # pre-dedup candidate occurrence, orders below the removed join
    # machinery at any scale.
    pref = doc_sets.select(
        "id", "sz", F.size("arr").alias("rsz"), F.posexplode("prefix").alias("pos", "sh")
    )

    # Candidate generation: ONE groupBy over the prefix index. Each
    # shingle's posting list is ≤ max_df ids (the df cap upstream), so
    # collect_list is bounded and the in-row expansion emits that key's
    # C(df, 2) ordered pairs without any join — skew is structurally
    # bounded at C(max_df, 2) per group, so no salting, no hot-set
    # broadcast, and HALF the shuffled index volume of the self-join
    # shape this replaced (whose skew/broadcast machinery the x64 scale
    # rehearsal broke twice — see the docstring). The expansion is TWO
    # chained Generates (posexplode of the posting list, then explode of
    # the per-pivot tail slice) rather than one nested
    # flatten/transform/slice expression (r12-opt): the pair stream and
    # per-row memory are identical, but the shallow per-Generate
    # expressions replace one deep tree in whole-stage codegen — the
    # nested form was a measurable slice of the query's one-time janino
    # cost. Pairs carry the PREFIX POSITIONS of the colliding shingle in
    # both docs; the groupBy that dedups candidate pairs keeps the
    # minimum position per side, feeding the positional filter below
    # (r11-opt; replaces a plain dropDuplicates at identical shuffle
    # shape). The length filter runs per-OCCURRENCE before that groupBy
    # (it depends only on the pair's sizes, not the positions), so
    # length-hopeless candidates never cross the dedup exchange.
    cand = (
        pref.groupBy("sh")
        .agg(F.collect_list(F.struct("pos", "id", "sz", "rsz")).alias("ids"))
        .where(F.size("ids") >= 2)
        .select("ids", F.posexplode("ids").alias("__i", "x"))
        .select(
            F.col("x"), F.explode(F.expr("slice(ids, __i + 2, size(ids))")).alias("y")
        )
        .select(
            F.expr("IF(x.id < y.id, x, y)").alias("a"),
            F.expr("IF(x.id < y.id, y, x)").alias("b"),
        )
        .where(
            F.least("a.sz", "b.sz") >= F.lit(t_eff) * F.greatest("a.sz", "b.sz")
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.min("a.pos").alias("pa"),
            F.min("b.pos").alias("pb"),
            # functional of the id — min is a deterministic pick
            F.min("a.sz").alias("sz_a"),
            F.min("a.rsz").alias("rsz_a"),
            F.min("b.sz").alias("sz_b"),
            F.min("b.rsz").alias("rsz_b"),
        )
    )
    # PPJoin prefilters BEFORE the in-row verification, on the carried
    # int columns — candidates must survive BOTH before they ever carry
    # a shingle ARRAY through a join (the arrays are ~100× wider than
    # the int rows, and the id_b attach exchange used to ship arr_a for
    # every unfiltered candidate — 250 MB of the pre-r11 plan's shuffle):
    # 1. length filter (applied per-occurrence above, before the dedup
    #    exchange): jaccard ≥ t needs inter ≥ t·union ≥ t·max(|A|,|B|)
    #    and inter ≤ min(|A|,|B|), so min ≥ t·max is necessary.
    # 2. positional filter (PPJoin-family, set-based form): both rare
    #    arrays are sorted by the same global (df, sh) order, so for the
    #    min-position colliding shingle s (pa in A; its position in B is
    #    ≥ pb), common shingles before s number ≤ pa and common shingles
    #    after s number ≤ min(rsz_a − 1 − pa, rsz_b − 1 − pb); with the
    #    symmetric argument via B's pivot:
    #      inter ≤ min(pa, pb) + 1 + min(rsz_a − 1 − pa, rsz_b − 1 − pb).
    #    (NOT the classic scan-time 1 + suffix bound — with independent
    #    per-side min positions a common shingle can sit in A's prefix
    #    but B's suffix and precede the first collision, so the
    #    min(pa, pb) headroom term is required for soundness.)
    #    Jaccard ≥ t over FULL sizes needs inter ≥ t·(sz_a + sz_b)/(1+t);
    #    candidates whose positional bound can't reach that are dropped.
    #    It must see the MIN positions, so it runs after the dedup
    #    groupBy (a per-occurrence bound with non-min positions is not
    #    conservative).
    #    Both filters are conservative (t_eff ≤ t), so the emitted pair
    #    set is unchanged — the DuckDB twin needs no mirror.
    # Both array attach joins pair corpus-scale relations and are pinned
    # sort-merge: under the local session's 64 MB broadcast threshold the
    # optimizer read their COMPRESSED shuffle bytes as broadcastable (the
    # array frame decompresses ~10× as a hash relation) and the x64
    # rehearsal OOM'd the driver; SMJ spills instead, and is the plan a
    # default-threshold cluster picks anyway.
    arrs = doc_sets.select("id", "arr")
    required = F.lit(t_eff) / F.lit(1.0 + t_eff) * (F.col("sz_a") + F.col("sz_b"))
    out = (
        cand.where(
            F.least("pa", "pb")
            + 1
            + F.least(
                F.col("rsz_a") - 1 - F.col("pa"), F.col("rsz_b") - 1 - F.col("pb")
            )
            >= required
        )
        .join(arrs.withColumnRenamed("id", "id_a").withColumnRenamed("arr", "arr_a").hint("merge"), "id_a")
        .join(arrs.withColumnRenamed("id", "id_b").withColumnRenamed("arr", "arr_b").hint("merge"), "id_b")
        .withColumn("inter", F.size(F.array_intersect("arr_a", "arr_b")))
        .withColumn(
            "jaccard",
            # grid_snap, not engine ROUND: int/int jaccard lands on repr-
            # ties where Spark/DuckDB ROUND disagree (emission rules)
            grid_snap(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), round_to
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def jaccard_pairs_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_NGRAM,
    threshold: float = 0.6,
    max_df: int = DEFAULT_MAX_DF,
    round_to: int = 4,
) -> str:
    sh = _shingles_sql(table, id_col, text_col, n)
    return (
        f"WITH __sh AS ({sh}), "
        f"__rare AS (SELECT sh FROM __sh GROUP BY sh HAVING COUNT(*) <= {max_df}), "
        f"__r AS (SELECT __sh.id, __sh.sh FROM __sh JOIN __rare USING (sh)), "
        f"__sz AS (SELECT id, COUNT(*) AS sz FROM __sh GROUP BY id), "
        f"__i AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS inter "
        f"FROM __r a JOIN __r b ON a.sh = b.sh AND a.id < b.id GROUP BY 1, 2) "
        # threshold on the ROUNDED jaccard, matching the Spark twin — a raw
        # compare disagrees on boundary pairs that round up to the threshold
        f"SELECT id_a, id_b, {grid_snap_sql('CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter)', round_to)} "
        f"AS jaccard FROM __i "
        f"JOIN __sz sa ON sa.id = id_a JOIN __sz sb ON sb.id = id_b "
        f"WHERE {grid_snap_sql('CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter)', round_to)} >= {threshold}"
    )


# ---------------------------------------------------------------- minhash


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_NGRAM,
    k: int = DEFAULT_MINHASH_K,
    seed: int = 7,
) -> DataFrame:
    """One row per doc: columns mh_0..mh_{k-1} (k seeded min-hashes).

    Single explode + single groupBy: all k min() aggregates run in the same
    partial+final hash aggregation over the shingle stream.
    """
    sh = shingles(df, id_col, text_col, n)
    coeffs = H.seeded_coeffs(k, seed)
    aggs = [
        F.min(H.affine(F.col("sh"), a, b)).alias(f"mh_{i}") for i, (a, b) in enumerate(coeffs)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_signatures_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_NGRAM,
    k: int = DEFAULT_MINHASH_K,
    seed: int = 7,
) -> str:
    sh = _shingles_sql(table, id_col, text_col, n)
    coeffs = H.seeded_coeffs(k, seed)
    cols = ", ".join(
        f"MIN({H.affine_sql('sh', a, b)}) AS mh_{i}" for i, (a, b) in enumerate(coeffs)
    )
    return f"SELECT id, {cols} FROM ({sh}) __s GROUP BY id"


def _band_hash(sig_cols: list[Column]) -> Column:
    return F.md5(F.concat_ws(":", *[c.cast("string") for c in sig_cols]))



def _banded_frame(sig: DataFrame, bands: int, r: int) -> DataFrame:
    """(id, band, bh) — one NARROW row per (doc, band): band id plus the
    hash of that band's signature slice. Shared by the self-join and the
    incremental new-vs-corpus variant so the banding scheme cannot drift
    between them (a drift would silently break batch/corpus agreement)."""
    return sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        _band_hash([F.col(f"mh_{bi * r + j}") for j in range(r)]).alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("__b"),
    ).select("id", "__b.band", "__b.bh")


def _band_rows_sql(from_name: str, k: int, bands: int, r: int) -> str:
    """SQL twin of :func:`_banded_frame` (kept signature columns included —
    the SQL plans score matches inline rather than re-joining)."""
    sep = " || ':' || "
    return " UNION ALL ".join(
        f"SELECT id, {', '.join(f'mh_{i}' for i in range(k))}, {bi} AS band, "
        f"md5({sep.join(f'CAST(mh_{bi * r + j} AS VARCHAR)' for j in range(r))}) AS bh "
        f"FROM {from_name}"
        for bi in range(bands)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_NGRAM,
    k: int = DEFAULT_MINHASH_K,
    bands: int = DEFAULT_BANDS,
    seed: int = 7,
    min_est: float = 0.5,
    round_to: int = 4,
    persist_signatures: bool = True,
) -> DataFrame:
    """Candidate near-dup pairs via banded minhash LSH, scored by the
    fraction of matching signature components (the minhash estimate of
    Jaccard), filtered to ≥ min_est.

    TUNING FOR BOILERPLATE-HEAVY CORPORA: candidate volume is governed by
    the band width r = k/bands — a pair with background similarity j
    collides with probability ≈ 1-(1-j^r)^bands, and a shared license
    header / template frame easily pushes j to ~0.5, where r=4 admits a
    quarter of ALL pairs as candidates. Measured on a 50k-doc corpus with
    a universal boilerplate sentence: (k=16, bands=4, r=4) generated 383M
    candidates in 90 s; (k=16, bands=2, r=8) the same corpus in 9 s with
    508k candidates. At 100 TB use k=128, bands=16 (r=8) or wider — and
    prefer stripping known boilerplate before shingling."""
    if k % bands != 0:
        raise ValueError("k must be divisible by bands")
    r = k // bands
    sig = minhash_signatures(df, id_col, text_col, n, k, seed)
    if persist_signatures:
        # the banded frame self-joins below; without this the whole
        # shingle-explode + k-minhash pipeline runs once per join side
        # (no ReusedExchange for self-joins here — measured 2 parquet
        # scans). One compact row per doc; at 100 TB materialize the
        # signature table instead (same note as simhash below).
        sig = sig.persist()
    # Candidate generation shuffles ONLY (id, band, bh) — 3 narrow columns
    # per banded row, not the k signature components (k=128 at scale would
    # multiply the exploded shuffle ~40×). Signatures are attached to the
    # surviving DISTINCT pairs afterwards by two id-equi-joins against the
    # persisted signature frame.
    #
    # r12 measured-and-REJECTED: the (band, bh) bucket aggregate with
    # in-row pair expansion (the shape that won for simhash/jaccard/
    # embedding-LSH) is ~0.5 s SLOWER here at sf0.1 (warm 0.9–1.0 s
    # self-join vs 1.45 s aggregate, iso noop ×3): this banded frame is
    # three ints per row with NO array payload, so the local plan
    # broadcasts it (zero extra exchange) and the broadcast estimate is
    # sound — the compressed-bytes underestimation that OOM'd the
    # array-carrying jaccard/simhash joins at x64 does not apply, and
    # the un-pinned join flips to SMJ adaptively as the relation grows
    # (x64 rehearsal: linear). Keep the join.
    bands_df = _banded_frame(sig, bands, r)
    cand = (
        bands_df.alias("a")
        .join(
            bands_df.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sig_a = sig.select(
        F.col("id").alias("id_a"), *[F.col(f"mh_{i}").alias(f"__a_mh_{i}") for i in range(k)]
    )
    sig_b = sig.select(
        F.col("id").alias("id_b"), *[F.col(f"mh_{i}").alias(f"__b_mh_{i}") for i in range(k)]
    )
    matches = sum(
        (F.col(f"__a_mh_{i}") == F.col(f"__b_mh_{i}")).cast("int") for i in range(k)
    )
    pairs = (
        cand.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .select(
            "id_a",
            "id_b",
            grid_snap(matches / F.lit(float(k)), round_to).alias("est_jaccard"),
        )
        .where(F.col("est_jaccard") >= min_est)
    )
    return pairs


def minhash_lsh_pairs_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_NGRAM,
    k: int = DEFAULT_MINHASH_K,
    bands: int = DEFAULT_BANDS,
    seed: int = 7,
    min_est: float = 0.5,
    round_to: int = 4,
) -> str:
    if k % bands:
        raise ValueError(f"k ({k}) must divide into bands ({bands})")
    r = k // bands
    sig = minhash_signatures_sql(table, id_col, text_col, n, k, seed)
    band_rows = _band_rows_sql("__sig", k, bands, r)
    matches = " + ".join(f"CASE WHEN a.mh_{i} = b.mh_{i} THEN 1 ELSE 0 END" for i in range(k))
    return (
        f"WITH __sig AS ({sig}), __bands AS ({band_rows}) "
        f"SELECT id_a, id_b, est_jaccard FROM ("
        f"SELECT a.id AS id_a, b.id AS id_b, "
        f"{grid_snap_sql(f'MIN(({matches}) / {float(k)})', round_to)} AS est_jaccard "
        f"FROM __bands a JOIN __bands b ON a.band = b.band AND a.bh = b.bh AND a.id < b.id "
        f"GROUP BY 1, 2) __p WHERE est_jaccard >= {min_est}"
    )


# ---------------------------------------------------------------- simhash


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 60
) -> DataFrame:
    """SimHash over word tokens: bit j = sign(Σ_tokens ±1). 60-bit
    fingerprints by default (r11): the banded candidate join's key domain
    is carved out of the fingerprint, and the previous 32-bit/byte-band
    scheme's 1024-key domain made bucket occupancy — and candidate pairs
    — grow QUADRATICALLY with the corpus (285× wall at ×64 data in the
    scale rehearsal). 60 md5 bits is what both engines can carry in an
    int64 (functions h60/h60_sql).

    Single-pass plan: explode tokens once, hash each token ONCE, then one
    hash aggregation carries all 60 per-bit sums (partial+final, map-side
    combine). An earlier formulation used per-bit higher-order
    ``aggregate`` expressions over the token array — Catalyst does not
    CSE the shared tokenize+md5 subexpression across them, so the text
    was re-tokenized and re-hashed once per bit (~40× slower at sf0.1,
    measured).
    """
    t = _norm_text(F.col(text_col))
    toks = F.filter(F.split(t, r"\W+"), lambda w: F.length(w) > 0)
    ids = df.select(F.col(id_col).alias("id"), toks.alias("__toks"))
    # explode_OUTER keeps token-less docs as one NULL-hash row (r11-opt):
    # h60(NULL) is NULL, every bit condition is then NULL → the -1 arm, so
    # all 60 sums come out negative and the fingerprint is 0 — exactly
    # what the old  ids LEFT JOIN sums  + coalesce(sh, 0) produced, minus
    # one whole source scan and an id-scale join+exchange per call site
    # (this subplan runs on BOTH sides of the banded self-join).
    tok_hashes = ids.select("id", F.explode_outer("__toks").alias("__w")).select(
        "id", H.h60(F.col("__w")).alias("h")
    )
    sums = tok_hashes.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j) % 2 == 1, 1).otherwise(-1)
            ).alias(f"__c{j}")
            for j in range(bits)
        ]
    )
    bit_cols = [
        F.when(F.col(f"__c{j}") > 0, F.lit(2**j).cast("long")).otherwise(F.lit(0))
        for j in range(bits)
    ]
    sh = sum(bit_cols[1:], bit_cols[0])
    return sums.select("id", sh.alias("simhash"))


def simhash_sql(table: str, id_col: str = "doc_id", text_col: str = "text", bits: int = 60) -> str:
    t = _norm_text_sql(text_col)
    th = (
        f"list_transform(list_filter(string_split_regex({t}, '\\W+'), w -> length(w) > 0), "
        f"w -> {H.h60_sql('w')})"
    )
    bit_terms = []
    for j in range(bits):
        contrib = (
            f"list_aggregate(list_transform(__th, h -> "
            f"CASE WHEN (h >> {j}) % 2 = 1 THEN 1 ELSE -1 END), 'sum')"
        )
        bit_terms.append(f"CASE WHEN {contrib} > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END")
    return (
        f"SELECT {id_col} AS id, {' + '.join(bit_terms)} AS simhash "
        f"FROM (SELECT {id_col}, {th} AS __th FROM {table}) __s"
    )


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    radius: int = 3,
    round_to: int = 4,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash_a, simhash_b) ≤ radius.

    Banding (Manku/Jain/Sarma, WWW'07 shape): split the 60-bit
    fingerprint into 6 blocks of 10 bits; a pair within hamming ≤ r has
    flipped bits in at most r blocks, so it agrees EXACTLY on some
    (6 − r)-block combination — index every C(6, 6−r) combination as an
    equi-join key. At r = 3 that is 20 keys per doc over a 2³⁰ key
    domain. The previous 4×8-bit byte-banding had a FIXED 1024-key
    domain, so bucket occupancy — and candidate pairs — grew
    quadratically with the corpus: the ×64 scale rehearsal measured 285×
    wall (single-task bucket stragglers); this shape's key domain keeps
    random collisions rare at any realistic corpus size, with candidate
    volume driven by true near-dup clusters only. ``radius`` stays capped
    at 3 — beyond that the combination count explodes and recall silently
    degrades on narrower blocks.
    """
    if not 0 <= radius <= 3:
        raise ValueError(
            f"radius must be in [0, 3] for 6-block-combination candidates, got {radius}"
        )
    from itertools import combinations as _combos

    sh = simhash(df, id_col, text_col)
    combos = list(_combos(range(6), 6 - radius))

    def _key(combo: tuple[int, ...]):
        k = F.lit(0).cast("long")
        for pos, blk in enumerate(combo):
            k = k + (F.shiftright(F.col("simhash"), blk * 10) % 1024) * F.lit(
                2 ** (10 * pos)
            )
        return k

    banded = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(ci).alias("band"), _key(c).alias("bkey"))
                    for ci, c in enumerate(combos)
                ]
            )
        ).alias("__b"),
    ).select("id", "simhash", "__b.band", "__b.bkey")
    # Candidate generation is ONE groupBy over the banded frame with
    # IN-ROW pair expansion (r12-opt; the shape that fixed jaccard): each
    # (band, bkey) bucket collects its (id, simhash) occupants — the key
    # domain is 2³⁰, so occupancy is near-dup-cluster-sized, not
    # corpus-sized — and emits its hamming-filtered pairs without any
    # join. The self-join this replaces ran the WHOLE signature subplan
    # (scan + token explode + 60-sum aggregate) once per side plus two
    # sorted band-key exchanges; AQE's runtime stage reuse de-duplicated
    # the signature stages but both SMJ sorts and the downstream pair
    # stage remained (measured: 3.2–3.9 s warm isolated at sf0.1 vs
    # 2.0–2.3 s for this shape). Earlier rejected alternatives for the
    # double computation — .cache() (InMemoryRelation barrier) and lazy
    # localCheckpoint (ExistingRDD breaks codegen, 15–33 s) — are moot:
    # there is no second side anymore.
    #
    # Memory shape: the pair expansion is TWO chained Generates
    # (posexplode of the bucket, then explode of the per-pivot tail
    # slice), so a bucket of m docs streams its C(m, 2) candidates one
    # pivot at a time with O(m) bytes per row — the same streaming
    # behaviour as the SMJ it replaces (whose buffered side was also the
    # full key group) — rather than one flatten() materializing C(m, 2)
    # structs in a single row. The hamming filter sits INSIDE the tail
    # transform, so non-near-dup candidates die before the second
    # Generate emits them. collect_list holds one bucket in memory at
    # finalization (ObjectHashAggregate spills between groups); a
    # degenerate exact-dup megacluster makes THAT list corpus-sized —
    # the module's cheapest-first contract (exact_duplicates runs before
    # near-dup passes) is what bounds it, exactly as the SMJ shape's
    # single-key reduce task was what bounded the old plan.
    bucket = (
        banded.groupBy("band", "bkey")
        .agg(F.collect_list(F.struct("id", "simhash")).alias("xs"))
        .where(F.size("xs") >= 2)
    )
    tail = (
        "filter(transform(slice(xs, __i + 2, size(xs)), y -> "
        "IF(x.id < y.id, "
        "struct(x.id AS id_a, y.id AS id_b, "
        "bit_count(x.simhash ^ y.simhash) AS h), "
        "struct(y.id AS id_a, x.id AS id_b, "
        "bit_count(x.simhash ^ y.simhash) AS h))), "
        f"p -> p.h <= {int(radius)})"
    )
    return (
        bucket.select("xs", F.posexplode("xs").alias("__i", "x"))
        .select(F.explode(F.expr(tail)).alias("p"))
        # a pair sharing several bands/buckets appears once per bucket;
        # hamming is a function of the pair, so first == min
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.min("p.h").cast("int").alias("hamming"))
    )


def simhash_near_pairs_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text", radius: int = 3
) -> str:
    """DuckDB twin of :func:`simhash_near_pairs` (same 6×10-bit block
    combination banding over the 60-bit fingerprint)."""
    if not 0 <= radius <= 3:
        raise ValueError(
            f"radius must be in [0, 3] for 6-block-combination candidates, got {radius}"
        )
    from itertools import combinations as _combos

    sh = simhash_sql(table, id_col, text_col)
    combos = list(_combos(range(6), 6 - radius))

    def _key(combo: tuple[int, ...]) -> str:
        return " + ".join(
            f"((simhash >> {blk * 10}) % 1024) * {2 ** (10 * pos)}"
            for pos, blk in enumerate(combo)
        )

    bands = " UNION ALL ".join(
        f"SELECT id, simhash, {ci} AS band, {_key(c)} AS bkey FROM __sh"
        for ci, c in enumerate(combos)
    )
    return (
        f"WITH __sh AS ({sh}), __bd AS ({bands}) "
        f"SELECT a.id AS id_a, b.id AS id_b, "
        f"CAST(MIN(bit_count(xor(a.simhash, b.simhash))) AS INT) AS hamming "
        f"FROM __bd a JOIN __bd b ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id "
        f"WHERE bit_count(xor(a.simhash, b.simhash)) <= {radius} GROUP BY 1, 2"
    )


# ------------------------------------------------------- incremental dedup


def incremental_minhash_dedup(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_NGRAM,
    k: int = DEFAULT_MINHASH_K,
    bands: int = DEFAULT_BANDS,
    seed: int = 7,
    min_est: float = 0.5,
    round_to: int = 4,
    persist_signatures: bool = True,
) -> DataFrame:
    """Dedup a NEW batch against an EXISTING corpus: per new document, the
    best minhash-estimated match in the corpus (if any band collides) and
    an ``is_dup`` verdict at ``min_est``.

    This is the steady-state shape of corpus curation at 100 TB: the daily
    crawl (small) never self-joins the full corpus — its banded signatures
    equi-join the corpus's banded signature store. Only band-colliding
    corpus rows are ever scored; Catalyst broadcasts the new batch's band
    table when it is small, so the big side streams through unshuffled. In
    production the corpus signatures are materialized once (a table
    partitioned by band hash — the same note as dedup.py's simhash
    store-the-signatures pattern) and only APPENDED to as novel docs
    arrive; here both sides are computed from text so the operator is
    self-contained and oracle-checkable.

    Best-match choice is deterministic: max estimate, then min corpus id.
    """
    if k % bands != 0:
        raise ValueError("k must be divisible by bands")
    r = k // bands

    # Band join carries ONLY (id, band, bh); signatures attach to the
    # distinct candidate pairs afterwards (same narrow-shuffle shape as
    # minhash_lsh_pairs — at k=128 the banded shuffle would otherwise be
    # ~40× wider). The new batch's band table is the small side, so
    # Catalyst broadcasts it and the corpus streams through unshuffled.
    # persist_signatures=False for REPEATED callers (the streaming curation
    # loop runs this once per micro-batch): each call builds fresh frames
    # the CacheManager can't dedup, so persisted entries would accumulate
    # one corpus-sized cache per batch with no unpersist hook. The cost of
    # False is recomputing each side's signature pipeline twice (banded +
    # attach) within the single batch.
    def signatures(df: DataFrame) -> DataFrame:
        sig = minhash_signatures(df, id_col, text_col, n, k, seed)
        return sig.persist() if persist_signatures else sig

    def banded(sig: DataFrame) -> DataFrame:
        return _banded_frame(sig, bands, r)

    sn, sc = signatures(new_df), signatures(corpus_df)
    cand_ids = (
        banded(sn).select(F.col("id").alias("new_id"), "band", "bh")
        .join(banded(sc).select(F.col("id").alias("match_id"), "band", "bh"),
              on=["band", "bh"])
        .select("new_id", "match_id")
        .dropDuplicates(["new_id", "match_id"])
    )
    est = sum(
        F.when(F.col(f"__n_mh_{i}") == F.col(f"__c_mh_{i}"), 1).otherwise(0) for i in range(k)
    ) / float(k)
    cand = (
        cand_ids.join(
            sn.select(F.col("id").alias("new_id"),
                      *[F.col(f"mh_{i}").alias(f"__n_mh_{i}") for i in range(k)]),
            "new_id",
        )
        .join(
            sc.select(F.col("id").alias("match_id"),
                      *[F.col(f"mh_{i}").alias(f"__c_mh_{i}") for i in range(k)]),
            "match_id",
        )
        .select("new_id", "match_id", grid_snap(est, round_to).alias("est_jaccard"))
    )
    w = Window.partitionBy("new_id").orderBy(F.col("est_jaccard").desc(), F.col("match_id"))
    best = (
        cand.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    return (
        new_df.select(F.col(id_col).alias("new_id"))
        .join(best, on="new_id", how="left")
        .select(
            "new_id",
            "match_id",
            "est_jaccard",
            (F.coalesce(F.col("est_jaccard"), F.lit(0.0)) >= min_est).alias("is_dup"),
        )
    )


def incremental_minhash_dedup_sql(
    new_table: str,
    corpus_table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_NGRAM,
    k: int = DEFAULT_MINHASH_K,
    bands: int = DEFAULT_BANDS,
    seed: int = 7,
    min_est: float = 0.5,
    round_to: int = 4,
) -> str:
    """DuckDB twin of :func:`incremental_minhash_dedup`."""
    if k % bands:
        raise ValueError(f"k ({k}) must divide into bands ({bands})")
    r = k // bands

    def banded_sql(table: str, alias: str) -> str:
        sig = minhash_signatures_sql(table, id_col, text_col, n, k, seed)
        rows = _band_rows_sql(f"__sig_{alias}", k, bands, r)
        return f"__sig_{alias} AS ({sig}), __bands_{alias} AS ({rows})"

    matches = " + ".join(f"CASE WHEN a.mh_{i} = b.mh_{i} THEN 1 ELSE 0 END" for i in range(k))
    return (
        f"WITH {banded_sql(new_table, 'n')}, {banded_sql(corpus_table, 'c')}, "
        f"__cand AS ("
        f"SELECT a.id AS new_id, b.id AS match_id, "
        f"{grid_snap_sql(f'MAX(({matches}) / {float(k)})', round_to)} AS est_jaccard "
        f"FROM __bands_n a JOIN __bands_c b ON a.band = b.band AND a.bh = b.bh "
        f"GROUP BY 1, 2), "
        f"__best AS (SELECT new_id, match_id, est_jaccard FROM __cand "
        f"QUALIFY ROW_NUMBER() OVER (PARTITION BY new_id "
        f"ORDER BY est_jaccard DESC, match_id) = 1) "
        f"SELECT nw.{id_col} AS new_id, b.match_id, b.est_jaccard, "
        f"COALESCE(b.est_jaccard, 0.0) >= {min_est} AS is_dup "
        f"FROM {new_table} nw LEFT JOIN __best b ON nw.{id_col} = b.new_id"
    )
