"""Read-through reference-artifact cache (io/cache.py): hit/miss
semantics, key sensitivity, atomic install, and value-transparency of the
train-once/score-many wiring."""

from __future__ import annotations

import os

import pytest

from conftest import SF_DIR


@pytest.fixture()
def cache_root(tmp_path, monkeypatch):
    import raise_featurestore_spark.io.cache as C

    root = str(tmp_path / "cache")
    monkeypatch.setattr(C, "CACHE_ROOT", root)
    return root


def test_cached_table_builds_once_and_is_key_sensitive(spark, cache_root):
    from raise_featurestore_spark.io.cache import cached_table

    calls = []

    def build():
        calls.append(1)
        return spark.range(10).selectExpr("id", "id * 2 AS v")

    a = cached_table(spark, "t", ["k1"], build)
    b = cached_table(spark, "t", ["k1"], build)
    assert len(calls) == 1  # second call is a read, not a rebuild
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    cached_table(spark, "t", ["k2"], build)
    assert len(calls) == 2  # different key -> different artifact


def test_cached_table_partition_by_prunes_and_roundtrips(spark, cache_root):
    from raise_featurestore_spark.io.cache import cached_table

    df = spark.range(100).selectExpr("id", "CAST(id % 4 AS INT) AS part")
    out = cached_table(
        spark, "p", ["k"], lambda: df.repartition(4, "part"), partition_by="part"
    )
    assert sorted(map(tuple, out.select("id", "part").collect())) == sorted(
        map(tuple, df.collect())
    )
    # hive layout on disk: one directory per partition value
    base = [d for d in os.listdir(os.path.join(cache_root, "p"))][0]
    dirs = {
        n
        for n in os.listdir(os.path.join(cache_root, "p", base))
        if n.startswith("part=")
    }
    assert dirs == {f"part={i}" for i in range(4)}


def test_cached_table_zero_row_partitioned_build(spark, cache_root):
    """r9 ADVICE: a partitioned build that legitimately yields zero rows
    installs a directory holding only _SUCCESS; subsequent calls must not
    throw on the schema-less directory — they return the empty frame with
    its schema and rebuild rather than treating the husk as a hit."""
    from raise_featurestore_spark.io.cache import cached_table

    calls = []

    def build():
        calls.append(1)
        return (
            spark.range(10)
            .selectExpr("id", "CAST(id % 4 AS INT) AS part")
            .where("id < 0")
        )

    a = cached_table(spark, "z", ["k"], build, partition_by="part")
    assert a.count() == 0 and set(a.columns) == {"id", "part"}
    b = cached_table(spark, "z", ["k"], build, partition_by="part")  # no throw
    assert b.count() == 0 and set(b.columns) == {"id", "part"}
    assert len(calls) == 2  # empty artifact is a miss, rebuilt (cheap: 0 rows)


def test_source_signature_tracks_mtime(tmp_path):
    from raise_featurestore_spark.io.cache import source_signature

    p = tmp_path / "f.parquet"
    p.write_bytes(b"abc")
    s1 = source_signature(str(p))
    os.utime(p, ns=(1, 1))
    assert source_signature(str(p)) != s1


def test_cached_json_roundtrip(cache_root):
    from raise_featurestore_spark.io.cache import cached_json

    calls = []

    def build():
        calls.append(1)
        return [[1.0, 2.0], [3.0, 4.0]]

    a = cached_json("c", ["x"], build)
    b = cached_json("c", ["x"], build)
    assert a == b == [[1.0, 2.0], [3.0, 4.0]] and len(calls) == 1


def test_pagerank_prebuilt_edges_value_transparent(spark):
    """pagerank(edges=stored) must be bit-identical to the inline build —
    the materialized derived table changes cost, never answers."""
    from raise_featurestore_spark.analytics.graph import (
        cooccurrence_edges,
        pagerank,
    )
    from raise_featurestore_spark.tables import load_table

    li = load_table(spark, SF_DIR, "lineitem").where("l_orderkey % 7 = 0")
    inline = sorted(
        map(tuple, pagerank(li, "l_orderkey", "l_partkey", iterations=2).collect())
    )
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey")
    via_stored = sorted(
        map(
            tuple,
            pagerank(
                li, "l_orderkey", "l_partkey", iterations=2, edges=edges
            ).collect(),
        )
    )
    assert inline == via_stored and len(inline) > 0
