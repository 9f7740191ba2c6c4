from raise_featurestore_spark.expressions.validator import (  # noqa: F401
    ValidationResult,
    validate_expression,
)
from raise_featurestore_spark.expressions.compiler import compile_expression  # noqa: F401
