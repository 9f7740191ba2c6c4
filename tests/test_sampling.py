"""Deterministic split/sampling properties (dataprep/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from raise_featurestore_spark.dataprep.sampling import hash_split, stratified_sample


@pytest.fixture()
def docs(spark):
    return spark.range(0, 2000).selectExpr(
        "id", "CASE WHEN id % 3 = 0 THEN 'en' WHEN id % 3 = 1 THEN 'de' ELSE 'fr' END AS lang"
    )


def test_hash_split_partitions_every_row_once(docs):
    out = hash_split(docs, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.cnt for r in out.groupBy("split").count()
              .withColumnRenamed("count", "cnt").collect()}
    assert sum(counts.values()) == 2000
    assert set(counts) == {"train", "val", "test"}
    # fractions hold within hash noise
    assert 0.75 <= counts["train"] / 2000 <= 0.85


def test_hash_split_is_stable_under_data_growth(docs):
    """A row's split assignment never changes because other rows appeared."""
    small = hash_split(docs.where("id < 500"), "id", {"train": 0.8, "test": 0.2})
    big = hash_split(docs, "id", {"train": 0.8, "test": 0.2})
    s = {r.id: r.split for r in small.collect()}
    b = {r.id: r.split for r in big.where("id < 500").collect()}
    assert s == b


def test_hash_split_rejects_bad_fractions(docs):
    with pytest.raises(ValueError):
        hash_split(docs, "id", {"a": 0.9, "b": 0.3})


def test_hash_split_is_map_side_only(docs):
    plan = hash_split(docs, "id", {"a": 0.5, "b": 0.5})._jdf.queryExecution().toString()
    assert "Exchange" not in plan  # no shuffle: pure projection


def test_stratified_sample_deterministic_and_proportional(docs):
    frac = {"en": 0.5, "de": 0.2}
    a = stratified_sample(docs, "id", "lang", frac, default_fraction=0.0)
    b = stratified_sample(docs, "id", "lang", frac, default_fraction=0.0)
    assert sorted(r.id for r in a.collect()) == sorted(r.id for r in b.collect())
    counts = {r.lang: r.cnt for r in a.groupBy("lang").count()
              .withColumnRenamed("count", "cnt").collect()}
    assert "fr" not in counts  # default fraction 0 drops unlisted strata
    n_en = 2000 / 3
    assert 0.4 <= counts["en"] / n_en <= 0.6
    assert 0.12 <= counts["de"] / n_en <= 0.28


def test_sample_order_key_partition_invariant(docs):
    from raise_featurestore_spark.dataprep.sampling import sample_order_key

    key = sample_order_key(["id", "lang"], seed=7)
    a = {r.id for r in docs.orderBy(key, "id", "lang").limit(100).collect()}
    b = {
        r.id
        for r in docs.repartition(13, "lang").orderBy(key, "id", "lang").limit(100).collect()
    }
    c = {r.id for r in docs.coalesce(1).orderBy(key, "id", "lang").limit(100).collect()}
    assert a == b == c
    assert len(a) == 100


def test_sample_is_terminal_selection(spark):
    from raise_featurestore_spark.analytics.analysis import RecordLookup
    from raise_featurestore_spark.analytics.record_lookup import compile_record_lookup

    df = spark.range(0, 5000).selectExpr("id", "CAST(id % 17 AS STRING) AS grp")
    spec = RecordLookup(features=["id", "grp"], sample=300)  # default limit=100 must not apply
    assert compile_record_lookup(df, spec).count() == 300


def test_temperature_mix_alpha_semantics(spark):
    """alpha=1 keeps natural proportions; alpha=0 flattens sources toward
    equal counts; everything is deterministic across invocations."""
    from raise_featurestore_spark.dataprep.mixing import MixSpec, mix_report

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    # alpha=1: rate = target/N for every source -> kept ~ proportional
    r1 = {r["source"]: r for r in mix_report(df, MixSpec(alpha=1.0, target_rows=500)).collect()}
    assert r1["big"]["rate"] == r1["small"]["rate"] == pytest.approx(0.5)

    # alpha=0: per-source quota target/n_sources -> small source rate is
    # capped at 1.0 (kept whole), big source downsampled toward the quota
    r0 = {r["source"]: r for r in mix_report(df, MixSpec(alpha=0.0, target_rows=500)).collect()}
    assert r0["small"]["rate"] == 1.0 and r0["small"]["n_kept"] == 100
    assert r0["big"]["rate"] == pytest.approx(0.2778, abs=1e-4)

    # deterministic: identical kept sets on re-run
    from raise_featurestore_spark.dataprep.mixing import temperature_mix

    a = sorted(r["doc_id"] for r in temperature_mix(df, MixSpec(alpha=0.5, target_rows=400)).collect())
    b = sorted(r["doc_id"] for r in temperature_mix(df, MixSpec(alpha=0.5, target_rows=400)).collect())
    assert a == b and len(a) > 0


def test_temperature_mix_corpus_never_shuffles(spark):
    """The keep-filter joins the corpus against a BROADCAST rate table —
    no exchange of the corpus rows themselves."""
    from raise_featurestore_spark.dataprep.mixing import MixSpec, temperature_mix

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(100)], "doc_id long, source string"
    )
    plan = (
        temperature_mix(df, MixSpec())
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan


def test_exact_k_per_stratum_counts_and_determinism(spark):
    from raise_featurestore_spark.dataprep.sampling import exact_k_per_stratum

    # skewed strata: 'big' has 1500 rows, 'tiny' has 3
    df = spark.range(0, 1503).selectExpr(
        "id", "CASE WHEN id < 1500 THEN 'big' ELSE 'tiny' END AS src"
    )
    out = exact_k_per_stratum(df, "id", "src", k=10)
    counts = {r.src: r.n for r in out.groupBy("src")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"big": 10, "tiny": 3}  # min(k, |stratum|)
    ranks = sorted(r.rank for r in out.where("src = 'big'").collect())
    assert ranks == list(range(1, 11))
    # deterministic under any physical layout
    again = exact_k_per_stratum(df.repartition(17), "id", "src", k=10)
    assert sorted(r.id for r in out.collect()) == sorted(r.id for r in again.collect())
    with pytest.raises(ValueError):
        exact_k_per_stratum(df, "id", "src", k=0)


def test_group_keyed_split_is_leakage_safe(spark):
    """hash_split keyed on a GROUP column: every group lands in exactly
    one split (the train/test-contamination guard), fractions still
    roughly honored at the group level."""
    from raise_featurestore_spark.dataprep.sampling import hash_split

    rows = [(i, f"src{i % 40}") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = hash_split(df, "source", {"train": 0.8, "val": 0.1, "test": 0.1},
                     salt="group-split")
    per_source = out.groupBy("source").agg(
        F.count_distinct("split").alias("k")
    ).collect()
    assert all(r.k == 1 for r in per_source)  # no source straddles splits
    sizes = {r.split: r.n for r in out.select("source", "split").distinct()
             .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(sizes.values()) == 40
    assert sizes.get("train", 0) >= 20  # 0.8 of 40 sources, hash-noisy
