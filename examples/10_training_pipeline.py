"""Example: end-to-end training-data pipeline — dedup → repetition +
quality filter → PII redaction → benchmark decontamination →
language-stratified sample → deterministic split → context-window packing
→ partitioned write.

(engine capstone: composes the dataprep operators the way a pre-training
corpus build would at 100 TB. Every step is a shuffle-minimal Spark plan:
exact dedup is one hash-groupBy + anti-join; repetition/quality/lang/
redaction are pure column expressions; decontamination is a broadcast
semi-join against the benchmark gram set; sampling/splitting are map-side
hash thresholds; packing is a shard-partitioned prefix sum; the final
write clusters by split so downstream reads prune files.
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

    # 2. quality + repetition filter: heuristic score and Gopher-style
    #    duplicate-token fraction, both scan predicates (no UDF). (The
    #    packaged form of this step — thresholds + per-rule rejection
    #    accounting — is dataprep.filters.quality_filter/_report.)
    from raise_featurestore_spark.dataprep.text import repetition_metrics

    scored = quality_score(deduped).select("doc_id", "quality_score")
    rep = repetition_metrics(deduped).select("doc_id", "dup_token_frac")
    kept = (
        deduped.join(scored.where(F.col("quality_score") >= 0.3), "doc_id", "left_semi")
        .join(rep.where(F.col("dup_token_frac") <= 0.95), "doc_id", "left_semi")
    )
    n_quality = kept.count()

    # 2b. PII redaction: replace the text column with its scrubbed form
    from raise_featurestore_spark.dataprep.redact import RedactionSpec, redact

    red = redact(kept, RedactionSpec()).select("doc_id", F.col("redacted").alias("text"))
    kept = kept.drop("text").join(red, "doc_id")

    # 2c. benchmark decontamination: drop docs sharing any word-8-gram with
    #     the (here: simulated) held-out eval set
    from raise_featurestore_spark.dataprep.decontaminate import decontaminate

    benchmark = base.where(F.col("doc_id") % 97 == 0)
    verdicts = decontaminate(kept, benchmark)
    kept = kept.join(
        verdicts.where(~F.col("contaminated")).select("doc_id"), "doc_id", "left_semi"
    )
    n_clean = kept.count()
    assert n_clean <= n_quality

    # 3. language-stratified downsample: keep all en, half of everything else
    langs = detect_language(kept).select(
        "doc_id", F.col("predicted_lang").alias("lang_pred")
    )
    with_lang = kept.join(langs, "doc_id")
    sampled = stratified_sample(
        with_lang, "doc_id", "lang_pred", {"en": 1.0}, default_fraction=0.5
    )

    # 3b. temperature mixing: rebalance the per-source shares toward
    #     n^0.5-proportional — deterministic hash membership, the corpus
    #     itself never shuffles (dataprep/mixing.py)
    from raise_featurestore_spark.dataprep.mixing import MixSpec, temperature_mix

    sampled = temperature_mix(sampled, MixSpec(alpha=0.5, target_rows=400))
    n_sampled = sampled.count()

    # 4. deterministic split: stable under growth, retries, repartitioning
    split = hash_split(sampled, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
    split_counts = {r.split: r.cnt for r in split.groupBy("split")
                    .agg(F.count(F.lit(1)).alias("cnt")).collect()}

    # 5. context-window packing: assign every surviving train doc a chunk
    #    id + offset in 512-token windows, packed independently per lang
    from raise_featurestore_spark.dataprep.packing import PackingSpec, pack_documents

    train_docs = (
        split.where(F.col("split") == "train")
        .select("doc_id")
        .join(with_lang.select("doc_id", "text", F.col("lang_pred").alias("lang")), "doc_id")
    )
    packed = pack_documents(train_docs, PackingSpec(window_tokens=512))
    n_chunks = packed.agg(
        F.count_distinct("lang", "chunk_id").alias("c")
    ).collect()[0]["c"]
    assert packed.where((F.col("chunk_off") < 0) | (F.col("chunk_off") >= 512)).count() == 0

    # 6. write each split partitioned by split name (at scale: bucketed by
    #    doc_id via io.bucketing.write_bucketed for shuffle-free joins)
    out_dir = tempfile.mkdtemp(prefix="ex10_")
    split.write.mode("overwrite").partitionBy("split").parquet(out_dir)
    back = spark.read.parquet(out_dir)
    n_written = back.count()
    partitions = sorted(
        d.split("=")[1] for d in os.listdir(out_dir) if d.startswith("split=")
    )

    print(f"raw={n_raw} dedup={n_dedup} quality={n_quality} clean={n_clean} "
          f"sampled={n_sampled} chunks={n_chunks} written={n_written} "
          f"splits={split_counts}")
    return {
        "raw": n_raw,
        "deduped": n_dedup,
        "quality_kept": n_quality,
        "decontaminated": n_clean,
        "sampled": n_sampled,
        "train_chunks": n_chunks,
        "written": n_written,
        "split_counts": split_counts,
        "partitions": partitions,
    }


if __name__ == "__main__":
    print(main())
