"""Collision-heavy corpus stress bench: the dedup battery on 50k synthetic
docs that all share a license-style boilerplate sentence (background
pairwise jaccard ≈ 0.5) — banded LSH's documented failure mode.

Reproduces the PERF.md "Round 4 stress" numbers:

    python scripts/stress_corpus.py [n_docs]

Prints one timing line per operator. The corpus: n/10 templates × 10 near
-identical variants + a universal boilerplate prefix, so exact dedup finds
n/10 keepers, near-dup finds the within-template pairs, and the hot
boilerplate shingles exercise the df-cap and band-width safeguards.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_templates = max(n_docs // 10, 1)

    import pyspark.sql.functions as F

    import raise_featurestore_spark.dataprep.dedup as DD
    from raise_featurestore_spark.dataprep.components import connected_components
    from raise_featurestore_spark.session import get_spark

    spark = get_spark("stress-corpus")
    boiler = "this document is provided under the standard license terms and conditions "
    df = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit(boiler),
                F.lit("template "), (F.col("id") % n_templates).cast("string"),
                F.lit(" body content section "),
                F.sha2(F.concat((F.col("id") % n_templates).cast("string"), F.lit("x")), 256),
                F.lit(" variant "), (F.col("id") % 10).cast("string"),
            ).alias("text"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
    )
    print(f"docs={df.count()} templates={n_templates}")

    t = time.time()
    n = DD.exact_duplicates(df).count()
    print(f"exact_dedup: {time.time() - t:.1f}s keepers={n}")

    # r=8 band width — the documented setting for boilerplate corpora
    # (r=4 admits ~25% of ALL pairs as candidates here; see dedup.py)
    t = time.time()
    pairs = DD.minhash_lsh_pairs(df, k=16, bands=2, min_est=0.8).persist()
    n = pairs.count()
    print(f"minhash_lsh r=8: {time.time() - t:.1f}s pairs={n}")

    t = time.time()
    cc = connected_components(pairs.select("id_a", "id_b"))
    n_comp = cc.select("cluster").distinct().count()
    print(f"connected_components: {time.time() - t:.1f}s clusters={n_comp}")

    t = time.time()
    n = DD.jaccard_pairs(df, n=12, threshold=0.5, max_df=200).count()
    print(f"jaccard_prefix: {time.time() - t:.1f}s pairs={n}")

    # ---- curation tier on the same corpus ----
    from raise_featurestore_spark.dataprep import boilerplate as BP
    from raise_featurestore_spark.dataprep.chunking import chunk_documents
    from raise_featurestore_spark.dataprep.selection import select_token_budget
    from raise_featurestore_spark.dataprep.shards import shard_manifest

    # min_df at half the corpus: only the universal license sentence
    # qualifies (within-template grams have df = n_docs / n_templates)
    t = time.time()
    grams = [r.gram for r in BP.mine_boilerplate(df, n=6, min_df=n_docs // 2, top_k=20).collect()]
    print(f"boilerplate_mine: {time.time() - t:.1f}s grams={len(grams)}")
    assert all("license" in g or "document" in g or "terms" in g or "standard" in g
               or "provided" in g or "conditions" in g for g in grams), grams

    t = time.time()
    stripped = BP.strip_boilerplate(df, grams)
    shrink = (
        df.agg(F.sum(F.length("text"))).first()[0]
        - stripped.agg(F.sum(F.length("text"))).first()[0]
    )
    print(f"boilerplate_strip: {time.time() - t:.1f}s chars_removed={shrink}")

    t = time.time()
    sel = select_token_budget(df, budget=20 * n_docs // 2)
    n_sel, used = sel.agg(F.count(F.lit(1)), F.max("cum_tokens")).first()
    print(f"select_token_budget: {time.time() - t:.1f}s kept={n_sel} tokens={used}")

    t = time.time()
    n = chunk_documents(df, window=16, stride=12).count()
    print(f"chunk_sliding: {time.time() - t:.1f}s chunks={n}")

    t = time.time()
    m = shard_manifest(df, n_shards=64).agg(
        F.count(F.lit(1)), F.max("n_rows"), F.min("n_rows")
    ).first()
    print(f"shard_manifest: {time.time() - t:.1f}s shards={m[0]} max={m[1]} min={m[2]}")

    spark.stop()


if __name__ == "__main__":
    main()
