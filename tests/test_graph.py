"""PageRank semantics: mass conservation, hub dominance, determinism."""

from __future__ import annotations

import pytest


def test_pagerank_mass_and_hub(spark):
    from raise_featurestore_spark.analytics.graph import pagerank

    # star graph: hub h co-occurs with 4 spokes; spokes only see the hub
    rows = []
    for b, spoke in enumerate(["s1", "s2", "s3", "s4"]):
        rows += [(b, "h"), (b, spoke)]
    df = spark.createDataFrame(rows, "basket int, item string")
    got = {r.node: r.pr for r in pagerank(df, "basket", "item", iterations=3).collect()}
    assert got["h"] == max(got.values())  # hub dominates
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-3)  # mass conserved
    assert len({got[s] for s in ["s1", "s2", "s3", "s4"]}) == 1  # symmetry


def test_pagerank_partition_invariant(spark):
    from raise_featurestore_spark.analytics.graph import pagerank
    from raise_featurestore_spark.tables import load_table

    df = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    a = {r.node: r.pr for r in pagerank(df.repartition(1), "l_orderkey", "l_partkey").collect()}
    b = {r.node: r.pr for r in pagerank(df.repartition(32), "l_orderkey", "l_partkey").collect()}
    assert a == b


def test_pagerank_iterations_are_exchange_free(spark):
    """r6 VERDICT item 5: the iteration sub-plan must contain NO
    edge-scale shuffle — edges are repartitioned by dst ONCE before the
    checkpoint (created with AQE scoped off so the LogicalRDD keeps the
    layout), and the broadcast pr-join preserves it, so each iteration's
    contribution aggregate runs in place. The only hashpartitioning
    Exchange left in a multi-iteration plan is the one-time pr0/degree
    distinct; broadcast exchanges (the k tiny pr frames) are expected."""
    import re

    from raise_featurestore_spark.analytics.graph import pagerank
    from raise_featurestore_spark.tables import load_table

    df = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    for iters in (1, 3):
        pr = pagerank(df, "l_orderkey", "l_partkey", iterations=iters)
        plan = pr._jdf.queryExecution().executedPlan().toString()
        hashes = len(re.findall(r"Exchange hashpartitioning", plan))
        bcasts = len(re.findall(r"Exchange HashedRelationBroadcastMode", plan))
        # r8: ZERO hash exchanges — degrees are node-scale and
        # checkpointed (no more pr0/degree-distinct exchange either);
        # each iteration broadcasts twice (the deg join + the pr-side
        # edge join), both node-scale
        assert hashes == 0, f"iters={iters}: {hashes} hash exchanges\n{plan}"
        assert bcasts == 2 * iters, f"iters={iters}: {bcasts} broadcasts"
    # AQE conf restored after the scoped creation window
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
