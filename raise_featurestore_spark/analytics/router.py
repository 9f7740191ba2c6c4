"""Dispatch an Analysis spec to its compiler (the ``group.analyze`` path,
reference: raise_/analytics/client.py:46-79 — here the execution is real)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from raise_featurestore_spark.analytics import analysis as A


def compile_analysis(df: DataFrame, spec, **kwargs) -> DataFrame:
    from raise_featurestore_spark.analytics.aggregation import compile_aggregation
    from raise_featurestore_spark.analytics.record_lookup import compile_record_lookup

    if isinstance(spec, A.Aggregation):
        return compile_aggregation(df, spec, **kwargs)
    if isinstance(spec, A.RecordLookup):
        return compile_record_lookup(df, spec, **kwargs)
    if isinstance(spec, A.Distribution):
        from raise_featurestore_spark.analytics.distribution import compile_distribution

        return compile_distribution(df, spec, **kwargs)
    if isinstance(spec, A.Correlation):
        from raise_featurestore_spark.analytics.correlation import compile_correlation

        return compile_correlation(df, spec, **kwargs)
    if isinstance(spec, A.StatTest):
        from raise_featurestore_spark.analytics.stattest import compile_stattest

        return compile_stattest(df, spec, **kwargs)
    if isinstance(spec, A.Drift):
        from raise_featurestore_spark.analytics.drift import compile_drift

        return compile_drift(df, spec, **kwargs)
    if isinstance(spec, A.DataQuality):
        from raise_featurestore_spark.analytics.quality import compile_data_quality

        return compile_data_quality(df, spec, **kwargs)
    raise TypeError(f"no compiler for {type(spec).__name__}")
