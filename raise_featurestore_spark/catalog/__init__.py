from raise_featurestore_spark.catalog.entities import (  # noqa: F401
    Feature,
    FeatureGroup,
    FeatureStatus,
)
from raise_featurestore_spark.catalog.store import FeatureStore  # noqa: F401
from raise_featurestore_spark.catalog.lineage import FeatureRef, parse_reference  # noqa: F401
