"""CUBE/ROLLUP/PIVOT semantics: subtotal lattice consistency."""

from __future__ import annotations

import pytest

from conftest import SF_DIR


@pytest.fixture(scope="module")
def orders(spark):
    from raise_featurestore_spark.tables import load_table

    return load_table(spark, SF_DIR, "orders")


def test_cube_lattice_consistent(spark, orders):
    from raise_featurestore_spark.analytics.multidim import TOTAL, cube_report

    rows = cube_report(orders, ["o_orderstatus", "o_orderpriority"], "o_totalprice").collect()
    by = {(r.o_orderstatus, r.o_orderpriority): r for r in rows}
    grand = by[(TOTAL, TOTAL)]
    leaves = [r for (s, p), r in by.items() if s != TOTAL and p != TOTAL]
    assert grand.n_rows == sum(r.n_rows for r in leaves) == orders.count()
    assert grand.total == pytest.approx(sum(r.total for r in leaves), rel=1e-9)
    # one-dim subtotals match their leaf sums
    for (s, p), r in by.items():
        if s != TOTAL and p == TOTAL:
            kids = [x for (s2, p2), x in by.items() if s2 == s and p2 != TOTAL]
            assert r.n_rows == sum(x.n_rows for x in kids)


def test_rollup_is_hierarchical_not_full_lattice(spark, orders):
    from raise_featurestore_spark.analytics.multidim import TOTAL, rollup_report

    rows = rollup_report(orders, ["o_orderstatus", "o_orderpriority"], "o_totalprice").collect()
    combos = {(r.o_orderstatus, r.o_orderpriority) for r in rows}
    # rollup has no (all, p) slots — that's cube's job
    assert not any(s == TOTAL and p != TOTAL for s, p in combos)
    assert (TOTAL, TOTAL) in combos


def test_pivot_columns_and_row_sums(spark, orders):
    from pyspark.sql import functions as F

    from raise_featurestore_spark.analytics.multidim import pivot_report

    out = pivot_report(
        orders, "o_orderstatus", "o_orderpriority",
        ["1-URGENT", "9-NONEXISTENT"], "o_totalprice",
    ).collect()
    assert {"total_1_urgent", "n_1_urgent", "total_9_nonexistent", "n_9_nonexistent"} <= set(out[0].asDict())
    # absent pivot value yields zeros, not NULLs
    assert all(r.n_9_nonexistent == 0 and r.total_9_nonexistent == 0.0 for r in out)
    want = {
        r.o_orderstatus: r.n
        for r in orders.where("o_orderpriority = '1-URGENT'")
        .groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = {r.o_orderstatus: r.n_1_urgent for r in out}
    for k, v in want.items():
        assert got[k] == v


def test_pivot_alias_collision_rejected(spark, orders):
    from raise_featurestore_spark.analytics.multidim import pivot_report

    with pytest.raises(ValueError, match="collide"):
        pivot_report(orders, "o_orderstatus", "o_orderpriority",
                     ["A-B", "A_B"], "o_totalprice")


def test_cube_null_key_distinct_from_subtotal(spark):
    from pyspark.sql import functions as F

    from raise_featurestore_spark.analytics.multidim import TOTAL, cube_report

    df = spark.createDataFrame(
        [("x", 1.0), (None, 2.0), ("x", 3.0)], "k string, v double"
    )
    rows = {r.k: r for r in cube_report(df, ["k"], "v").collect()}
    assert rows["(null)"].total == 2.0      # the legitimate NULL key
    assert rows[TOTAL].total == 6.0         # the subtotal slot
    assert rows["x"].total == 4.0
