"""Example: end-to-end training-data pipeline — dedup → quality filter →
language-stratified sample → deterministic split → bucketed write.

(engine capstone: composes the dataprep operators the way a pre-training
corpus build would at 100 TB. Every step is a shuffle-minimal Spark plan:
exact dedup is one hash-groupBy + anti-join; quality/lang are pure column
expressions; sampling/splitting are map-side hash thresholds; the final
write clusters by doc_id so downstream entity joins are shuffle-free.
run: python examples/10_training_pipeline.py)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main(sf_dir: str = SF_DIR) -> dict:
    from pyspark.sql import functions as F

    from raise_featurestore_spark.dataprep.dedup import exact_duplicates
    from raise_featurestore_spark.dataprep.sampling import hash_split, stratified_sample
    from raise_featurestore_spark.dataprep.text import detect_language, quality_score
    from raise_featurestore_spark.session import get_spark
    from raise_featurestore_spark.tables import load_table

    spark = get_spark("example-10")
    base = load_table(spark, sf_dir, "documents")
    # crawl corpora contain re-fetches: simulate by re-ingesting 5% of docs
    # under new ids — exact dedup must drop exactly these
    refetched = base.limit(25).withColumn("doc_id", F.col("doc_id") + 10_000_000)
    docs = base.unionByName(refetched)
    n_raw = docs.count()

    # 1. exact dedup: keeper table (hash-groupBy), anti-join drops the rest
    keepers = exact_duplicates(docs, only_dups=False).select(
        F.col("keeper_id").alias("doc_id")
    )
    deduped = docs.join(keepers, "doc_id", "left_semi")
    n_dedup = deduped.count()
    assert n_dedup == n_raw - 25  # every re-fetch deduped, keeper kept

    # 2. quality filter: heuristic score as a scan predicate (no UDF)
    scored = quality_score(deduped).select("doc_id", "quality_score")
    kept = deduped.join(
        scored.where(F.col("quality_score") >= 0.3), "doc_id", "left_semi"
    )
    n_quality = kept.count()

    # 3. language-stratified downsample: keep all en, half of everything else
    langs = detect_language(kept).select(
        "doc_id", F.col("predicted_lang").alias("lang_pred")
    )
    with_lang = kept.join(langs, "doc_id")
    sampled = stratified_sample(
        with_lang, "doc_id", "lang_pred", {"en": 1.0}, default_fraction=0.5
    )
    n_sampled = sampled.count()

    # 4. deterministic split: stable under growth, retries, repartitioning
    split = hash_split(sampled, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
    split_counts = {r.split: r.cnt for r in split.groupBy("split")
                    .agg(F.count(F.lit(1)).alias("cnt")).collect()}

    # 5. write each split partitioned by split name (at scale: bucketed by
    #    doc_id via io.bucketing.write_bucketed for shuffle-free joins)
    out_dir = tempfile.mkdtemp(prefix="ex10_")
    split.write.mode("overwrite").partitionBy("split").parquet(out_dir)
    back = spark.read.parquet(out_dir)
    n_written = back.count()
    partitions = sorted(
        d.split("=")[1] for d in os.listdir(out_dir) if d.startswith("split=")
    )

    print(f"raw={n_raw} dedup={n_dedup} quality={n_quality} "
          f"sampled={n_sampled} written={n_written} splits={split_counts}")
    return {
        "raw": n_raw,
        "deduped": n_dedup,
        "quality_kept": n_quality,
        "sampled": n_sampled,
        "written": n_written,
        "split_counts": split_counts,
        "partitions": partitions,
    }


if __name__ == "__main__":
    print(main())
