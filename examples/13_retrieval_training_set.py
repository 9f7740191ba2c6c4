"""Example: retrieval-augmented training-set assembly — point-in-time
features via the salted as-of join + batch ANN neighbor retrieval over the
embedding corpus, with an in-plan recall monitor.

(engine capstone #3, round 5: the two ops a training pipeline runs at
scale that plain SQL engines lack. The as-of join attaches each training
event's LATEST features without future leakage — one shuffle, and a hot
entity is scattered across salt sub-windows instead of serializing in one
task. Batch ANN pushes a query TABLE through IVF inverted-list pruning:
the corpus never shuffles (broadcast probe join on the cluster-pruned
scan) and the per-query top-k truncates map-side, so at 100 TB the wire
carries ≤ k rows per (query, partition). The recall monitor is the
sampled brute-force differential you'd page on in production.
run: python examples/13_retrieval_training_set.py)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main(sf_dir: str = SF_DIR) -> dict:
    from pyspark.sql import functions as F

    from raise_featurestore_spark.dataprep.similarity import (
        brute_force_batch_topk,
        ivf_batch_topk,
        kmeans_centroids,
    )
    from raise_featurestore_spark.functions.asof import asof_join
    from raise_featurestore_spark.session import get_spark
    from raise_featurestore_spark.tables import load_table

    spark = get_spark("example-13")

    # ---- 1. leak-free training spine: purchases get the latest click
    # features as of each purchase timestamp (salt=8: a power user whose
    # events dominate the spine would otherwise sort in ONE window task)
    ev = load_table(spark, sf_dir, "events")
    spine = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("label")
    )
    feats = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("last_click_value"))
    )
    train = asof_join(spine, feats, on="user_id", salt=8)
    n_train = train.count()
    coverage = train.where(F.col("last_click_value").isNotNull()).count()

    # ---- 2. neighbor retrieval: for a batch of query vectors, the top-8
    # nearest corpus embeddings through the IVF index (nprobe=3 of 8 lists
    # ⇒ ~5/8 of the corpus pruned before any cosine is computed)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = (
        emb.orderBy("vec_id")
        .limit(16)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    centroids = kmeans_centroids(emb, dim=64, k=8, sample_rows=2048)
    neighbors = ivf_batch_topk(emb, queries, centroids, k=8, nprobe=3)
    n_neighbors = neighbors.count()

    # ---- 3. recall monitor: sampled exact differential — the number a
    # production retrieval pipeline alerts on when the index drifts
    exact = brute_force_batch_topk(emb, queries, k=8).select(
        "query_id", F.col("vec_id").alias("exact_id")
    )
    recall = (
        exact.join(
            neighbors.withColumnRenamed("query_id", "nq"),
            (F.col("query_id") == F.col("nq"))
            & (F.col("exact_id") == F.col("vec_id")),
            "left",
        )
        .agg(
            (F.sum(F.col("vec_id").isNotNull().cast("long")) / F.count("*")).alias(
                "recall_at_8"
            )
        )
        .collect()[0]
        .recall_at_8
    )

    return {
        "train_rows": int(n_train),
        "feature_coverage": float(coverage / max(n_train, 1)),
        "neighbor_rows": int(n_neighbors),
        "recall_at_8": float(recall),
    }


if __name__ == "__main__":
    print(main())
