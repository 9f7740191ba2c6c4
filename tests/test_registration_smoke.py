"""Fast registration smoke: every registered query must BUILD a plan
against limit(0) tables.

This is the cheap half of the empty-input invariant (the full
``.count()`` sweep lives in test_empty_input.py). Rationale — the r9
escape class: ``corr_spearman_wide_grid`` was registered AFTER the
round's full-pytest run and shipped with a plan-build-time
``KeyError`` on empty input (analytics/correlation.py ``_lookup``
on an empty collected rank map). Plan BUILD + analysis (touching
``.schema``) is where driver-side map collection, column resolution
and UDF closure construction happen, so this smoke catches that
whole bug class while running in well under a minute — cheap enough
that a late registration has no excuse to skip it before the final
commit of a round.

Policy (PERF.md "gate ledger"): the LAST commit of a round re-runs at
minimum this smoke + test_empty_input.py; any commit that registers a
new query re-runs them immediately.
"""

from __future__ import annotations

import glob
import os

import pytest

from tests.test_empty_input import EXPECTED_GUARDS


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("sf_empty_smoke"))
    for p in glob.glob(os.path.join(src, "*.parquet")):
        out = os.path.join(dst, os.path.basename(p))
        spark.read.parquet(p).limit(0).coalesce(1).write.mode("overwrite").parquet(out)
    return dst


def test_every_query_builds_plan_on_empty_tables(spark, empty_sf_dir):
    import __spark_entry__ as em

    failures = []
    for name, fn in sorted(em.queries().items()):
        try:
            df = fn(spark, empty_sf_dir)
            # analysis only — resolves columns, constructs UDF closures,
            # runs any plan-build driver collects; no job over the result
            assert df.schema is not None and len(df.schema.fields) > 0
        except Exception as ex:  # noqa: BLE001 - classifying failure modes
            if not isinstance(ex, EXPECTED_GUARDS.get(name, ())):
                failures.append(
                    f"{name}: {type(ex).__name__}: {str(ex).splitlines()[0][:140]}"
                )
    assert not failures, "\n".join(failures)
