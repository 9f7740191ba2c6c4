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

    spark.stop()


if __name__ == "__main__":
    main()
