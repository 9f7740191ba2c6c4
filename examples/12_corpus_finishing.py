"""Example: corpus finishing — boilerplate mine/strip → token-budget
selection → sliding-window chunking → deterministic shard export.

(engine capstone #2: the LAST mile of a pre-training data build, after
example 10's dedup/filter/decontaminate pass. Every step is a
shuffle-minimal Spark plan: mining is one groupBy + top-k; stripping is a
fused literal-replace chain (the mined gram list is driver-bounded by
top-k); budget selection is the distributed range-partitioned prefix sum,
NOT a global-sort window; chunking is a zero-shuffle flatMap; the shard
writer repartitions by shard before partitionBy so N shards get N
coherent file sets.
run: python examples/12_corpus_finishing.py)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main(sf_dir: str = SF_DIR) -> dict:
    from pyspark.sql import functions as F

    from raise_featurestore_spark.dataprep.boilerplate import (
        mine_boilerplate,
        strip_boilerplate,
    )
    from raise_featurestore_spark.dataprep.chunking import chunk_documents
    from raise_featurestore_spark.dataprep.selection import select_token_budget
    from raise_featurestore_spark.dataprep.shards import shard_manifest, write_shards
    from raise_featurestore_spark.session import get_spark
    from raise_featurestore_spark.tables import load_table

    spark = get_spark("example-12")
    base = load_table(spark, sf_dir, "documents")

    # crawl corpora carry site chrome: simulate by appending a license
    # sentence to 40% of docs — mining must surface it, stripping must
    # remove it without touching real content
    chrome = "all rights reserved see the license file for terms"
    docs = base.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 < 2, F.concat(F.col("text"), F.lit(" " + chrome))
        ).otherwise(F.col("text")),
    )

    # 1. mine: top repeated word-6-grams by document frequency
    mined = mine_boilerplate(docs, n=6, min_df=5, top_k=20)
    grams = [r.gram for r in mined.collect()]  # driver-bounded by top_k
    assert any("rights reserved" in g for g in grams)

    # 2. strip: remove the mined grams, collapse whitespace
    cleaned = strip_boilerplate(docs, grams)
    assert cleaned.where(F.col("text").contains("rights reserved")).count() == 0

    # 3. select: best-quality docs until the token budget is spent
    budget = 5_000
    selected = select_token_budget(cleaned, budget=budget)
    stats = selected.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("cum_tokens").alias("used"),
        F.min("quality_score").alias("q_floor"),
    ).collect()[0]
    assert 0 < stats.used <= budget

    # 4. chunk the selected docs into 64-token windows, stride 48
    chosen = cleaned.join(selected.select("doc_id"), "doc_id", "left_semi")
    chunks = chunk_documents(chosen, window=64, stride=48)
    n_chunks = chunks.count()
    assert n_chunks >= stats.n  # every selected doc yields >= 1 chunk

    # 5. export: deterministic 8-way shard deal + manifest next to it
    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "corpus")
        write_shards(chosen, out, n_shards=8)
        manifest = shard_manifest(chosen, n_shards=8)
        m = manifest.agg(
            F.sum("n_rows").alias("rows"), F.count(F.lit(1)).alias("shards")
        ).collect()[0]
        back = spark.read.parquet(out)
        assert back.count() == m.rows == stats.n

    return {
        "mined_grams": len(grams),
        "selected_docs": int(stats.n),
        "tokens_used": int(stats.used),
        "quality_floor": float(stats.q_floor),
        "chunks": int(n_chunks),
        "shards": int(m.shards),
    }


if __name__ == "__main__":
    print(main())
