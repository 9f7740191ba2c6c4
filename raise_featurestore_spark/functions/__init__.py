from raise_featurestore_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot,
    l1_distance,
    l2_distance,
    norm,
    normalize,
)
