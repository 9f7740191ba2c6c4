from raise_featurestore_spark.io.writer import write_feature_group  # noqa: F401
