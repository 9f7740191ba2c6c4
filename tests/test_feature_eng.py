"""Semantic properties of the feature-engineering operators (oracle parity
is covered by the driver gate; these pin the math and the determinism)."""

from __future__ import annotations


import pytest

from conftest import SF_DIR


def test_decay_features_matches_naive_per_entity(spark):
    from raise_featurestore_spark.dataprep.feature_eng import decay_features

    rows = [
        (1, "2026-01-01 00:00:00", 10, 10.0),
        (1, "2026-01-08 00:00:00", 11, 20.0),
        (1, "2026-01-15 00:00:00", 12, 40.0),
        (2, "2026-01-15 00:00:00", 20, 5.0),
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "user_id int, ts string, event_id int, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = {
        r.event_id: r
        for r in decay_features(df, half_life_days=7.0).collect()
    }
    # entity 1, half-life 7d: at event 12 the weights of (10, 11, 12)
    # are 2^-2, 2^-1, 1
    expect_sum = 10.0 * 0.25 + 20.0 * 0.5 + 40.0
    expect_avg = expect_sum / (0.25 + 0.5 + 1.0)
    assert out[12].decay_sum == pytest.approx(expect_sum, rel=1e-4)
    assert out[12].decay_avg == pytest.approx(expect_avg, rel=1e-4)
    # first event of an entity is its own decayed value
    assert out[10].decay_sum == pytest.approx(10.0, rel=1e-6)
    assert out[20].decay_avg == pytest.approx(5.0, rel=1e-6)


def test_target_encode_loo_prior_and_exclusion(spark):
    from raise_featurestore_spark.dataprep.feature_eng import target_encode_loo

    rows = [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 100.0)]
    df = spark.createDataFrame(rows, "id int, cat string, y double")
    out = {
        r.id: r.target_enc
        for r in target_encode_loo(
            df, "cat", "y", "id", prior_weight=2.0
        ).collect()
    }
    prior = (10 + 20 + 100) / 3.0
    # singleton category encodes to exactly the prior
    assert out[3] == pytest.approx((0.0 + 2 * prior) / (0 + 2), rel=1e-4)
    # LOO: row 1's own y excluded — only row 2 remains in the numerator
    assert out[1] == pytest.approx((20.0 + 2 * prior) / (1 + 2), rel=1e-4)
    assert out[2] == pytest.approx((10.0 + 2 * prior) / (1 + 2), rel=1e-4)


def test_discretize_quantile_equal_frequency(spark):
    from raise_featurestore_spark.dataprep.feature_eng import discretize_quantile
    from raise_featurestore_spark.tables import load_table

    df = load_table(spark, SF_DIR, "orders")
    out = discretize_quantile(df, "o_totalprice", "o_orderkey", n_bins=4)
    counts = {r.bin: r.n for r in out.groupBy("bin").count().withColumnRenamed("count", "n").collect()}
    assert set(counts) == {1, 2, 3, 4}
    n = sum(counts.values())
    for b, c in counts.items():
        assert abs(c - n / 4) < n * 0.02, (b, c, n)


def test_discretize_quantile_approx_close_to_exact(spark):
    from raise_featurestore_spark.dataprep.feature_eng import discretize_quantile
    from raise_featurestore_spark.tables import load_table

    df = load_table(spark, SF_DIR, "orders")
    exact = discretize_quantile(df, "o_totalprice", "o_orderkey", n_bins=4)
    approx = discretize_quantile(df, "o_totalprice", "o_orderkey", n_bins=4, approx=True)
    joined = exact.alias("e").join(approx.alias("a"), "o_orderkey")
    n = joined.count()
    agree = joined.where("e.bin = a.bin").count()
    assert agree / n > 0.99


def test_weighted_sample_deterministic_and_weight_sensitive(spark):
    from pyspark.sql import functions as F

    from raise_featurestore_spark.dataprep.feature_eng import weighted_sample

    df = spark.range(2000).select(
        F.col("id"),
        # ids < 100 get 50× the weight of the rest
        F.when(F.col("id") < 100, 50.0).otherwise(1.0).alias("w"),
    )
    base = spark.conf.get("spark.sql.shuffle.partitions")
    picks = []
    try:
        for parts in (1, 32):
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            got = weighted_sample(df.repartition(int(parts)), "w", "id", k=200)
            picks.append(sorted(r.id for r in got.collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert picks[0] == picks[1]  # partitioning cannot change membership
    heavy = sum(1 for i in picks[0] if i < 100)
    # 100 heavy ids at 50× among 1900 light: heavy ids should dominate
    assert heavy > 60, heavy


def test_weighted_sample_rejects_nonpositive_weights(spark):
    from pyspark.sql import functions as F

    from raise_featurestore_spark.dataprep.feature_eng import weighted_sample

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 2 - 0.5).alias("w")  # half negative
    )
    got = weighted_sample(df, "w", "id", k=100).collect()
    assert all(r.weight > 0 for r in got)
    assert len(got) == 50


def test_train_bpe_learns_expected_merges(spark):
    """Driver merge loop: a corpus dominated by 'aaab' should merge
    ('a','a') first; merges apply transitively."""
    from raise_featurestore_spark.dataprep.bpe import train_bpe

    rows = [("aaab aaab aaab aaab ab",)] * 5
    df = spark.createDataFrame(rows, "text string")
    merges = train_bpe(df, n_merges=3, min_pair_freq=2)
    assert merges[0] == ("a", "a")
    assert len(merges) == 3
    # every later merge must reference a symbol built so far
    known = {"a", "b", "</w>"} | {"".join(m) for m in merges}
    for a, b in merges:
        assert a in known and b in known


def test_pair_counts_weighted_by_word_freq(spark):
    from raise_featurestore_spark.dataprep.bpe import EOW, pair_counts

    df = spark.createDataFrame([("ab ab ab cd",)], "text string")
    got = {r.pair: r.n for r in pair_counts(df, top_k=10, min_freq=1).collect()}
    assert got["a b"] == 3
    assert got[f"b {EOW}"] == 3
    assert got["c d"] == 1


def test_standardize_zscore_and_robust(spark):
    from pyspark.sql import functions as F

    from raise_featurestore_spark.dataprep.feature_eng import standardize

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)] + [(101, None)],
        "id int, x double",
    )
    z = standardize(df, ["x"], "id").collect()
    vals = [r.x_scaled for r in z if r.x_scaled is not None]
    assert len(vals) == 100
    import statistics

    assert statistics.mean(vals) == pytest.approx(0.0, abs=1e-3)
    assert statistics.pstdev(vals) == pytest.approx(
        statistics.pstdev(range(1, 101)) / statistics.stdev(range(1, 101)), rel=1e-3
    )
    # robust: median 50.5, IQR 50 → x=50.5 scales to 0
    r = {row.id: row.x_scaled for row in standardize(df, ["x"], "id", method="robust").collect()}
    assert r[50] == pytest.approx((50 - 50.5) / 50.0, rel=1e-2)
    # constant column → NULL, not inf
    const = spark.createDataFrame([(1, 5.0), (2, 5.0)], "id int, x double")
    got = standardize(const, ["x"], "id").collect()
    assert all(row.x_scaled is None for row in got)


def test_sequence_features_history_window(spark):
    from pyspark.sql import functions as F

    from raise_featurestore_spark.dataprep.feature_eng import sequence_features

    rows = [
        (1, "2026-01-01 00:00:00", 1, "a"),
        (1, "2026-01-02 00:00:00", 2, "b"),
        (1, "2026-01-03 00:00:00", 3, "c"),
        (1, "2026-01-04 00:00:00", 4, "d"),
        (2, "2026-01-01 00:00:00", 9, "x"),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts string, event_id int, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = {r.event_id: r for r in sequence_features(df, n=2).collect()}
    assert out[1].history == "" and out[1].history_len == 0
    assert out[2].history == "a"
    assert out[3].history == "a|b"
    assert out[4].history == "b|c"  # bounded frame: only the last 2
    assert out[9].history == ""  # entities never leak into each other


def test_fuzzy_linkage_blocks_and_best_match(spark):
    from raise_featurestore_spark.dataprep.linkage import best_match, fuzzy_pairs

    rows = [
        (1, "red widget"), (2, "red widget"), (3, "rad widget"),
        (4, "blue bolt"), (5, "blu bolt"), (6, "green gear"),
    ]
    df = spark.createDataFrame(rows, "id int, name string")
    pairs = {(r.name_a, r.name_b): r for r in fuzzy_pairs(df, "name").collect()}
    # distance-0 exact dups are NOT emitted; cross-block pairs never form
    assert ("red widget", "red widget") not in pairs
    assert ("rad widget", "red widget") in pairs
    assert pairs[("rad widget", "red widget")].distance == 1
    assert pairs[("rad widget", "red widget")].n_b == 2  # support count
    assert not any("bolt" in a and "widget" in b for a, b in pairs)

    # the typo must be OUTSIDE the blocking token (the last word) — a
    # typo in the block key lands in a different block by design
    left = spark.createDataFrame([(10, "redd widget")], "id int, name string")
    m = best_match(left, df, "name", "id").collect()
    assert len(m) == 1 and m[0].right_name == "red widget" and m[0].distance == 1
