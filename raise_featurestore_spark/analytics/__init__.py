from raise_featurestore_spark.analytics.analysis import (  # noqa: F401
    Aggregation,
    Correlation,
    DataQuality,
    Distribution,
    Drift,
    RecordLookup,
    StatTest,
    VersionDiff,
)
from raise_featurestore_spark.analytics.aggregation import compile_aggregation  # noqa: F401
from raise_featurestore_spark.analytics.record_lookup import compile_record_lookup  # noqa: F401
