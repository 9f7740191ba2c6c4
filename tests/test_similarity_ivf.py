"""IVF ANN: quantizer determinism, assignment totality, probe recall."""

from __future__ import annotations

import os

import pytest

from raise_featurestore_spark.dataprep.similarity import (
    brute_force_topk,
    hyperplanes,
    ivf_assign,
    ivf_topk,
    kmeans_centroids,
)
from raise_featurestore_spark.tables import load_table
from tests.conftest import SF_DIR

K_CLUSTERS = 8
QUERY = hyperplanes(64, 1, seed=99)[0]


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def cents(emb):
    return kmeans_centroids(emb, dim=64, k=K_CLUSTERS, sample_rows=2048)


def test_centroids_deterministic(emb, cents):
    again = kmeans_centroids(emb, dim=64, k=K_CLUSTERS, sample_rows=2048)
    assert cents == again


def test_assignment_covers_every_row(emb, cents):
    assigned = ivf_assign(emb, cents)
    n = emb.count()
    assert assigned.count() == n
    counts = {r.ivf_cluster: r.cnt for r in assigned.groupBy("ivf_cluster")
              .count().withColumnRenamed("count", "cnt").collect()}
    assert sum(counts.values()) == n
    assert all(0 <= c < K_CLUSTERS for c in counts)


def test_reassignment_replaces_existing_column(emb, cents):
    # r10 ADVICE: feeding an already-assigned frame back into ivf_assign
    # must REPLACE the column, not duplicate it (ambiguous F.col downstream)
    once = ivf_assign(emb, cents)
    twice = ivf_assign(once, cents)
    assert twice.columns.count("ivf_cluster") == 1
    from pyspark.sql import functions as F

    # the re-derived column resolves unambiguously and matches
    assert twice.where(F.col("ivf_cluster").isNull()).count() == 0
    a = {r.vec_id: r.ivf_cluster for r in once.select("vec_id", "ivf_cluster").collect()}
    b = {r.vec_id: r.ivf_cluster for r in twice.select("vec_id", "ivf_cluster").collect()}
    assert a == b


def test_full_probe_equals_brute_force(emb, cents):
    exact = [r.vec_id for r in brute_force_topk(emb, QUERY, k=10).collect()]
    full = [r.vec_id for r in
            ivf_topk(emb, QUERY, cents, k=10, nprobe=K_CLUSTERS).collect()]
    assert full == exact


def test_partial_probe_prunes_and_recalls(emb, cents):
    exact = {r.vec_id for r in brute_force_topk(emb, QUERY, k=10).collect()}
    approx = {r.vec_id for r in
              ivf_topk(emb, QUERY, cents, k=10, nprobe=K_CLUSTERS // 2).collect()}
    # probing half the lists must actually prune...
    from pyspark.sql import functions as F

    assigned = ivf_assign(emb, cents)
    probed_rows = assigned.where(
        F.col("ivf_cluster").isin(list(range(K_CLUSTERS)))
    ).count()
    assert probed_rows == emb.count()
    # ...and still recover a reasonable share of the true top-10 on
    # near-uniform synthetic vectors (recall floor is deliberately loose)
    assert len(approx & exact) >= 3


def test_batch_topk_full_probe_equals_bruteforce(emb, cents):
    """ivf_batch_topk with nprobe = all lists prunes nothing, so it must
    equal the exact batch top-k row-for-row (rank, id, cosine)."""
    from pyspark.sql import functions as F

    from raise_featurestore_spark.dataprep.similarity import (
        brute_force_batch_topk,
        ivf_batch_topk,
    )

    qs = emb.orderBy("vec_id").limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    full = ivf_batch_topk(emb, qs, cents, k=7, nprobe=K_CLUSTERS)
    exact = brute_force_batch_topk(emb, qs, k=7)
    key = ["query_id", "rank", "vec_id", "cosine"]
    assert sorted(map(tuple, full.select(key).collect())) == sorted(
        map(tuple, exact.select(key).collect())
    )


def test_batch_topk_self_recall(emb, cents):
    """A query drawn from the corpus must retrieve itself at rank 1 with
    cosine 1.0 even under aggressive pruning (its own vector shares its
    own inverted list by construction)."""
    from pyspark.sql import functions as F

    from raise_featurestore_spark.dataprep.similarity import ivf_batch_topk

    qs = emb.orderBy("vec_id").limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top1 = (
        ivf_batch_topk(emb, qs, cents, k=3, nprobe=1)
        .where(F.col("rank") == 1)
        .collect()
    )
    assert len(top1) == 5
    for r in top1:
        assert r.vec_id == r.query_id and r.cosine == 1.0


def test_assignment_binding_signature(emb, cents):
    """r9 ADVICE: a precomputed ivf_cluster column must be BOUND to the
    centroids used at probe time, not trusted on column presence."""
    from raise_featurestore_spark.dataprep.similarity import (
        centroid_signature,
        ivf_batch_topk,
    )

    assigned = ivf_assign(emb, cents)
    # signed column + matching centroids: reused as-is (plan contains no
    # second assignment UDF — compare via schema metadata identity)
    assert (
        assigned.schema["ivf_cluster"].metadata["ivf_centroids_sig"]
        == centroid_signature(cents)
    )
    same = ivf_topk(assigned, QUERY, cents, k=5, nprobe=K_CLUSTERS)
    assert same.count() == 5

    # signed column + DIFFERENT centroids: loud failure, not wrong pruning
    other = [[c + 1.0 for c in row] for row in cents]
    with pytest.raises(ValueError, match="different centroids"):
        ivf_topk(assigned, QUERY, other, k=5, nprobe=2)
    qs = emb.limit(2).selectExpr("vec_id AS query_id", "embedding")
    with pytest.raises(ValueError, match="different centroids"):
        ivf_batch_topk(assigned, qs, other, k=3, nprobe=2)

    # UNSIGNED external column (e.g. arbitrary int): reassigned, so the
    # probe result matches a fresh assignment instead of trusting garbage
    from pyspark.sql import functions as F

    garbage = emb.withColumn("ivf_cluster", F.lit(0))
    fresh = {r.vec_id for r in ivf_topk(emb, QUERY, cents, k=5, nprobe=2).collect()}
    refit = {r.vec_id for r in ivf_topk(garbage, QUERY, cents, k=5, nprobe=2).collect()}
    assert refit == fresh

    # assigned=True asserts the binding: requires the column to exist
    with pytest.raises(ValueError, match="assigned=True"):
        ivf_topk(emb, QUERY, cents, k=5, nprobe=2, assigned=True)


def test_band_width_formula_cross_engine():
    """The banded near-dup kernel derives its per-band key width r from
    COUNT(*) in BOTH engines (Python eagerly, the oracle inside SQL) —
    the two formulas must agree at every boundary or the bucket keys
    diverge and every pair silently disappears. Sweep n across the
    clamp points, each power-of-two boundary, and off-by-one neighbors."""
    import duckdb

    from raise_featurestore_spark.dataprep.similarity import (
        MAX_BAND_WIDTH,
        _band_width_sql,
        band_width,
    )

    assert band_width(0) == 4
    assert band_width(16 * 2**4) == 4          # exactly at the r=4 capacity
    assert band_width(16 * 2**4 + 1) == 5      # first row past it
    assert band_width(2000) == 7
    assert band_width(16 * 2**24) == MAX_BAND_WIDTH
    assert band_width(10**12) == MAX_BAND_WIDTH  # clamped at any corpus

    con = duckdb.connect()
    ns = [0, 1, 15, 16, 17, 255, 256, 257, 500, 2000, 65535, 65536, 65537]
    ns += [16 * 2**r for r in range(2, 26)] + [16 * 2**r + 1 for r in range(2, 26)]
    for n in ns:
        con.execute(f"CREATE OR REPLACE VIEW __t AS SELECT * FROM range({n})")
        got = con.execute(f"SELECT {_band_width_sql('__t')}").fetchone()[0]
        assert got == band_width(n), f"n={n}: sql {got} != py {band_width(n)}"


def test_banded_pairs_scale_domain(spark):
    """The r11 fixed-domain finding, pinned as a property: the banded
    kernel's candidate key domain must GROW with the corpus (band_width
    strictly increases past each 16·2^r boundary), and the pair output
    must stay a subset of brute-force truth with every emitted cosine
    above threshold."""
    from pyspark.sql import functions as F

    from raise_featurestore_spark.dataprep.similarity import (
        embedding_near_dup_pairs,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    pairs = embedding_near_dup_pairs(emb, threshold=0.45).collect()
    assert pairs, "fixture corpus has near-dup structure at 0.45"
    vecs = {r.vec_id: r.embedding for r in emb.collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return num / (na * nb)

    for r in pairs:
        assert r.id_a < r.id_b
        assert r.cosine >= 0.45
        assert abs(cos(vecs[r.id_a], vecs[r.id_b]) - r.cosine) < 1e-3
    # no duplicate pairs despite multi-band candidate generation
    keys = [(r.id_a, r.id_b) for r in pairs]
    assert len(keys) == len(set(keys))

    # recall contract vs brute-force truth: every emitted pair is TRUE
    # (subset — exact cosine filter on candidates) and the banded OR
    # holds a floor of the truth set. The fixture's true pairs all sit
    # at borderline cosine 0.45-0.6, the HARDEST regime for sign-LSH
    # (P = 1-(1-p^r)^B with p = 1-θ/π ≈ 0.65 → ~0.2 expected at the
    # sf0.001/0.01 widths) — the floor pins that the n-adaptive widening
    # never silently collapses recall below the documented formula's
    # ballpark. High-cosine near-dups (the operator's production regime,
    # p ≥ 0.9) recall near 1.0 by the same formula.
    import numpy as np

    idl = sorted(vecs)
    V = np.array([vecs[i] for i in idl], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    C = np.round(Vn @ Vn.T, 4)
    iu = np.triu_indices(len(idl), 1)
    truth = {
        (idl[i], idl[j])
        for i, j in zip(iu[0][C[iu] >= 0.45], iu[1][C[iu] >= 0.45])
    }
    assert set(keys) <= truth, "banded output must be a subset of truth"
    # the floor only binds on a meaningful sample: at sf0.001 truth is
    # ~7 pairs and a 0.2-recall binomial draw legitimately lands on 1
    if len(truth) >= 20:
        assert len(keys) >= 0.15 * len(truth), (
            f"recall collapsed: {len(keys)}/{len(truth)}"
        )
