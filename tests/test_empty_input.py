"""Empty-input robustness sweep: every registered query must either run
cleanly (usually to 0 rows) or fail with a DOCUMENTED, intentional guard —
never an engine error like DIVIDE_BY_ZERO or a lost schema. This is the
systematic form of the round-3 zero-token-slice bug class: operators built
on slices/ratios/inference must degrade, not crash, when a filter or an
upstream stage leaves nothing."""

from __future__ import annotations

import glob
import os

import pytest

# queries that REQUIRE non-empty input by documented design; each raises an
# explicit, typed error (not an engine fault)
EXPECTED_GUARDS = {
    "ann_ivf_topk": ValueError,  # k-means quantizer needs >= k sample vectors
    "ann_ivf_batch_topk": ValueError,  # same quantizer guard, batch path
    "embedding_pca_spectrum": ValueError,  # pca_fit needs >= 2 vectors
    "embedding_pca_trace_check": ValueError,  # same pca_fit guard
    "embedding_pca_frobenius_check": ValueError,  # same pca_fit guard
}


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("sf_empty"))
    for p in glob.glob(os.path.join(src, "*.parquet")):
        out = os.path.join(dst, os.path.basename(p))
        spark.read.parquet(p).limit(0).coalesce(1).write.mode("overwrite").parquet(out)
    return dst


@pytest.mark.slow
def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    import __spark_entry__ as em

    failures = []
    for name, fn in sorted(em.queries().items()):
        try:
            fn(spark, empty_sf_dir).count()
            if name in EXPECTED_GUARDS:
                failures.append(f"{name}: expected {EXPECTED_GUARDS[name].__name__}, ran clean")
        except Exception as ex:  # noqa: BLE001 - classifying failure modes
            if not isinstance(ex, EXPECTED_GUARDS.get(name, ())):
                failures.append(f"{name}: {type(ex).__name__}: {str(ex).splitlines()[0][:140]}")
    assert not failures, "\n".join(failures)
