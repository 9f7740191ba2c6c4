"""Scale rehearsal: do the plans HOLD when the data grows?

The registry's plan audit proves shapes (pushdown, no cartesian, no
unpartitioned windows); this script proves the CURVE: run a
representative slice of the registry at sf0.1 and at an F-times
inflated copy, and report t(F·n) / t(n) per query. A shuffle-clean,
scan-dominated operator should scale ≈ linearly (ratio ≤ F, usually
well under because fixed stage floors amortize); a ratio drifting
toward F² exposes a hidden all-pairs or single-task collapse that
fixture-scale correctness runs can never surface.

Inflation is REALISTIC, not naive duplication: keys are offset per
replica so join fan-outs and group counts scale linearly, document text
is salted per replica and embeddings get a per-replica first-component
nudge so the dedup/ANN families don't degenerate into F-sized
exact-duplicate cliques (which would make candidate generation
quadratic BY CONSTRUCTION of the data, not the plan — real corpora
grow mostly-new content).

Usage: python scripts/scale_rehearsal.py [factor] [sf_dir] [q1,q2,...]

The optional third argument restricts the run to a comma-separated query
subset — the r11 x64 pass reruns just the shuffle families this way
(inflation cost grows with the factor, so the big factors run the
queries whose curves actually bend).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

# representative slice: one per shuffle/join/window/UDF/ANN/dedup family
QUERIES = [
    "agg_pricing_summary",        # groupBy partial+final hash agg
    "agg_global_stats_approx",    # the 100 TB stats path (GK + HLL)
    "window_tumbling_daily",      # time-window agg
    "window_session_user",        # session windows (keyed)
    "join_tpch_q3_topk",          # join + TakeOrdered
    "asof_purchase_last_click",   # as-of join
    "dedup_minhash_lsh",          # banded LSH equi-join
    "dedup_ngram_jaccard",        # PPJoin-style inverted index
    "corr_spearman_wide_grid",    # broadcast rank maps (zero row shuffles)
    "corr_matrix_wide",           # one-pass pearson + grid spearman
    "ann_bruteforce_topk",        # vectorized scan + TakeOrdered
    "text_quality_score",         # JVM string exprs over documents
    "dedup_clusters",             # alternating-star CC (rounds ~ log n)
]

if len(sys.argv) > 3:
    QUERIES = [q.strip() for q in sys.argv[3].split(",") if q.strip()]

DIMS = ["region", "nation", "customer", "supplier", "part"]


def inflate(spark, src: str, dst: str, factor: int) -> None:
    from pyspark.sql import functions as F

    from raise_featurestore_spark.tables import load_table

    os.makedirs(dst, exist_ok=True)
    for t in DIMS:
        p = os.path.join(src, f"{t}.parquet")
        if os.path.isdir(p):
            shutil.copytree(p, os.path.join(dst, f"{t}.parquet"))
        elif os.path.exists(p):  # single-file parquet
            shutil.copy2(p, os.path.join(dst, f"{t}.parquet"))

    def write(name, df):
        df.write.mode("overwrite").parquet(os.path.join(dst, f"{name}.parquet"))

    li = load_table(spark, src, "lineitem")
    ok = 10_000_000  # key stride > any sf's max orderkey
    write(
        "lineitem",
        li.crossJoin(spark.range(factor).select(F.col("id").alias("__r"))).select(
            (F.col("l_orderkey") + F.col("__r") * ok).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"],
        ),
    )
    o = load_table(spark, src, "orders")
    write(
        "orders",
        o.crossJoin(spark.range(factor).select(F.col("id").alias("__r"))).select(
            (F.col("o_orderkey") + F.col("__r") * ok).alias("o_orderkey"),
            *[c for c in o.columns if c != "o_orderkey"],
        ),
    )
    ev = load_table(spark, src, "events")
    uk = 10_000_000
    write(
        "events",
        ev.crossJoin(spark.range(factor).select(F.col("id").alias("__r"))).select(
            (F.col("event_id") + F.col("__r") * uk).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("__r") * uk).alias("user_id"),
            "event_type",
            "value",
            "props",
        ),
    )
    docs = load_table(spark, src, "documents")
    # Replica salt INTERLEAVED every 8 chars, not appended: the dedup
    # family shingles at n=12, so an end-salt leaves replicas of one doc
    # ~0.99-Jaccard near-dups of each other and the TRUE pair output
    # grows quadratically in the replica count — a property of that
    # naive data, not of any plan (first rehearsal run measured 59x wall
    # for ~4600x more output pairs). A salt char every 8 puts a
    # replica-specific token inside EVERY 12-gram, so cross-replica
    # copies of the same doc share ~no shingles (growth = new content),
    # while base near-dup PAIRS stay near-dups within each replica (the
    # salts land at the same offsets in near-identical texts) — the dup
    # structure scales linearly, like a real corpus.
    salted = F.regexp_replace(
        F.col("text"), F.lit("(.{8})"), F.concat(F.lit("$1~"), F.col("__r"))
    )
    write(
        "documents",
        docs.crossJoin(spark.range(factor).select(F.col("id").alias("__r"))).select(
            (F.col("doc_id") + F.col("__r") * uk).alias("doc_id"),
            salted.alias("text"),
            "lang",
            "source",
            F.length(salted).alias("n_chars"),
        ),
    )
    emb = load_table(spark, src, "embeddings")
    # Per-replica SIGN-FLIP isometry, not a nudge: multiplying component i
    # of replica r by s(r,i) ∈ {±1} (r=0 keeps the base corpus bit-exact)
    # preserves every WITHIN-replica inner product exactly (s_i² = 1), so
    # each replica carries the base data's true near-dup structure, while
    # CROSS-replica cosines become Rademacher averages ≈ 0 — the first
    # run of the 4th sweep showed the old first-component 0.001 nudge
    # leaves all F copies of a vector mutual near-dups, so the semantic
    # dedup graph densifies quadratically BY DATA (the same property the
    # document salt interleaving fixes for the text dedup family).
    write(
        "embeddings",
        emb.crossJoin(spark.range(factor).select(F.col("id").alias("__r"))).select(
            (F.col("vec_id") + F.col("__r") * uk).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, i) -> CAST(x * IF(__r = 0, 1.0,"
                " IF(pmod(hash(__r, i), 2) = 0, 1.0, -1.0)) AS FLOAT))"
            ).alias("embedding"),
            "label",
        ),
    )


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _jaccard_candidate_volume(spark, sf_dir: str, n: int = 12, max_df: int = 200) -> float:
    """Work proxy for the inverted-index jaccard join: Σ C(df, 2) over
    shingles inside the df-cap. An inverted-index similarity join's cost
    contract is LINEAR IN THIS VOLUME (bounded by distinct_shingles ×
    C(max_df, 2) — the cap's whole point), not in the row count: a corpus
    whose df distribution fattens (more shared shingles) legitimately
    costs more per row on ANY correct algorithm. The rehearsal therefore
    judges the dedup query by wall-ratio / work-ratio ≈ 1, separating
    data-driven candidate growth from an actual plan defect."""
    from pyspark.sql import functions as F

    from raise_featurestore_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length(text) - {n} + 1, 0)),"
                f" i -> substring(text, i, {n}))"
            )
        ).alias("sh"),
    ).distinct()
    return float(
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_df)
        .agg(F.sum(F.col("df") * (F.col("df") - 1) / 2))
        .collect()[0][0]
        or 0.0
    )


# queries whose cost contract is a data-dependent work volume, not the
# row count: judged on wall-ratio / work-ratio instead of wall-ratio / F
WORK_PROXIES = {"dedup_ngram_jaccard": _jaccard_candidate_volume}


def main() -> None:
    import __spark_entry__ as em
    from raise_featurestore_spark.session import get_spark

    spark = get_spark("scale-rehearsal")
    big = os.path.join(tempfile.mkdtemp(prefix="scale_rehearsal_"), f"x{FACTOR}")
    print(f"inflating {SRC} x{FACTOR} -> {big}", flush=True)
    t_inf = timed(lambda: inflate(spark, SRC, big, FACTOR))
    print(f"inflation wrote in {t_inf:.1f}s", flush=True)

    from raise_featurestore_spark.dataprep import components as CC

    qs = em.queries()
    rows = []
    for name in QUERIES:
        q = qs[name]
        q(spark, SRC).count()  # warm-up (and artifact build) at base
        t_base = min(timed(lambda: q(spark, SRC).count()) for _ in range(2))
        rounds_base = CC.LAST_ROUNDS
        q(spark, big).count()  # warm-up (and artifact build) at F·n
        t_big = min(timed(lambda: q(spark, big).count()) for _ in range(2))
        rounds_big = CC.LAST_ROUNDS
        ratio = t_big / t_base if t_base > 0 else float("inf")
        if name in WORK_PROXIES:
            wfn = WORK_PROXIES[name]
            work_ratio = wfn(spark, big) / max(wfn(spark, SRC), 1.0)
            bound, basis = work_ratio, f"work x{work_ratio:.1f}"
        elif name in ("dedup_clusters", "semantic_dedup_clusters"):
            # wall may grow ~F·(rounds_big/rounds_base); the CONTRACT is
            # that the round count stays logarithmic, so report it
            extra = max(rounds_big, 1) / max(rounds_base, 1)
            bound = float(FACTOR) * extra
            basis = f"rows x{FACTOR} · rounds {rounds_base}->{rounds_big}"
        else:
            bound, basis = float(FACTOR), f"rows x{FACTOR}"
        rows.append((name, t_base, t_big, ratio, bound, basis))
        print(
            f"{name:28s} base {t_base:6.2f}s  x{FACTOR} {t_big:7.2f}s  "
            f"ratio {ratio:5.2f} (linear bound {bound:.1f}, {basis})",
            flush=True,
        )

    print("\n| query | t(sf0.1) s | t(x%d) s | wall ratio | linear basis | verdict |" % FACTOR)
    print("|---|---|---|---|---|---|")
    bad = 0
    for name, tb, tg, r, bound, basis in rows:
        # pass = at-or-under linear in the query's cost basis (row count,
        # or the measured work volume for data-dependent joins) with 25%
        # grace (AQE partition counts, memory pressure); anything beyond
        # means a super-linear operator
        ok = r <= bound * 1.25
        bad += 0 if ok else 1
        print(
            f"| {name} | {tb:.2f} | {tg:.2f} | {r:.2f}x | {basis} | "
            f"{'linear-ok' if ok else 'SUPER-LINEAR'} |"
        )
    shutil.rmtree(os.path.dirname(big), ignore_errors=True)
    print(f"\n{len(rows) - bad}/{len(rows)} within the linear envelope at x{FACTOR}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
