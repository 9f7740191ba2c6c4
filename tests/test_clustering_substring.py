"""Exact-substring overlap + distributed k-means (round-5 engine additions).

Oracle parity for both lives in the driver gate (queries
`dedup_substring_overlap`, `cluster_kmeans_report`,
`cluster_balanced_sample`); here we pin the behaviors the value hash
alone can't see: planted-overlap recovery, short-doc/cap edges, Lloyd's
invariants, and partition-perturbation determinism (the r4 flake class —
snapped distances/centroids must yield identical hashes under any
partitioning).
"""

from __future__ import annotations

import pytest

from conftest import SF_DIR, SF_DIR_MED

from raise_featurestore_spark.dataprep import clustering as KM
from raise_featurestore_spark.dataprep import substring as SUB


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR_MED}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR_MED}/embeddings.parquet")


# ---------------------------------------------------------------- substring


def test_substring_finds_planted_overlaps(docs):
    out = SUB.substring_overlap_pairs(docs, window=20, max_occ=50).toPandas()
    assert len(out) > 0
    # every reported span is at least the window, and pairs are canonical
    assert (out.max_span_tokens >= 20).all()
    assert (out.id_a < out.id_b).all()
    assert (out.shared_windows >= 1).all()
    # a run of R matched windows spans R + w - 1 tokens
    assert (out.max_span_tokens <= out.shared_windows + 19).all()


def test_substring_window_larger_than_doc_is_empty(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], ["doc_id", "text"]
    )
    out = SUB.substring_overlap_pairs(df, window=5, max_occ=50)
    assert out.count() == 0


def test_substring_identical_short_docs_pair_up(spark):
    df = spark.createDataFrame(
        [(1, "x y z w v"), (2, "x y z w v"), (3, "p q r s t")],
        ["doc_id", "text"],
    )
    out = SUB.substring_overlap_pairs(df, window=5, max_occ=50).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.id_a, r.id_b, r.shared_windows, r.max_span_tokens) == (1, 2, 1, 5)


def test_substring_occurrence_cap_drops_hot_windows(spark):
    # the same 5-token window in 4 docs → 4 occurrences; cap at 3 kills it
    rows = [(i, "x y z w v") for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    assert SUB.substring_overlap_pairs(df, window=5, max_occ=3).count() == 0
    assert SUB.substring_overlap_pairs(df, window=5, max_occ=4).count() == 6


# ------------------------------------------------------------------ k-means


def test_kmeans_partition_invariants(emb):
    rep = KM.kmeans_report(emb, k=8, iters=2).toPandas()
    assert len(rep) == 8
    assert rep.n_points.sum() == emb.count()
    assert (rep.n_points > 0).all()
    assert (rep.inertia > 0).all()


def test_kmeans_inertia_non_increasing(emb):
    # Lloyd's monotonicity (up to the 5-sig snap): total SSE after the
    # M-step re-assignment must not exceed the initial assignment's
    one = KM.kmeans_report(emb, k=8, iters=1).toPandas().inertia.sum()
    two = KM.kmeans_report(emb, k=8, iters=2).toPandas().inertia.sum()
    assert two <= one * 1.001


def test_balanced_sample_exact_k_per_cluster(emb):
    out = KM.cluster_balanced_sample(emb, k=8, iters=2, per_cluster=5).toPandas()
    sizes = out.groupby("cluster").size()
    assert len(sizes) == 8
    assert (sizes == 5).all()
    assert out.vec_id.is_unique


def test_kmeans_hash_stable_under_partition_perturbation(spark):
    """r4 flake-class pin: snapped distances + snapped centroids ⇒ the
    canonical hash is identical under any shuffle/input partitioning."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from driver_sim import canon

    path = f"{SF_DIR}/embeddings.parquet"
    hashes = []
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts, splits in [(1, 1), (7, 3), (32, 32)]:
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            df = spark.read.parquet(path).repartition(splits)
            hashes.append(canon(KM.kmeans_report(df, k=8, iters=2).toPandas()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert hashes[0] == hashes[1] == hashes[2]
