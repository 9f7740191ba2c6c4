"""Vector functions over array<float|double> embedding columns.

The reference whitelists DOT / COSINE_SIMILARITY / L2_DISTANCE / NORM
(reference: raise_/validation/validator.py:117-120) plus L1_DISTANCE /
NORMALIZE (raise_/PRD.md:577). Spark has no vector builtins, so these
compile to higher-order-function expressions (zip_with + aggregate) that
run inside the JVM with whole-stage codegen — no Python boundary, no UDF
serialization, which matters when scoring billions of 512-dim embeddings.

All functions accept Column or column name and return a Column, so they
compose with the rest of the DataFrame API and with the expression
compiler.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _d(col: Column | str) -> Column:
    return _c(col).cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product Σ aᵢ·bᵢ."""
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    """Euclidean norm ‖a‖₂."""
    return F.sqrt(F.aggregate(_d(a), F.lit(0.0), lambda acc, x: acc + x * x))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(_d(a), _d(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def l1_distance(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: F.abs(x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a, b) = a·b / (‖a‖‖b‖); NULL when either norm is 0."""
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb))


def normalize(a: Column | str) -> Column:
    """a / ‖a‖₂ (unit vector); NULL when the norm is 0."""
    n = norm(a)
    arr = _d(a)
    return F.when(n > 0, F.transform(arr, lambda x: x / n))


SQL_VECTOR_FUNCS = {
    "DOT": dot,
    "COSINE_SIMILARITY": cosine_similarity,
    "L2_DISTANCE": l2_distance,
    "L1_DISTANCE": l1_distance,
    "NORM": norm,
    "NORMALIZE": normalize,
}


def register_sql_functions(spark) -> None:
    """Expose the vector functions to SQL/`F.expr` via SQL macros so the
    expression compiler can pass whitelisted vector calls straight through
    Spark's SQL parser.

    Uses temp SQL functions (DECLARE ... SQL) built from the same
    higher-order expressions, keeping execution JVM-side.
    """
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION DOT(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE "
        "RETURN aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION NORM(a ARRAY<DOUBLE>) RETURNS DOUBLE "
        "RETURN sqrt(aggregate(a, 0D, (acc, x) -> acc + x * x))"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION L2_DISTANCE(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE "
        "RETURN sqrt(aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x))"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION L1_DISTANCE(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE "
        "RETURN aggregate(zip_with(a, b, (x, y) -> abs(x - y)), 0D, (acc, x) -> acc + x)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION COSINE_SIMILARITY(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE "
        "RETURN CASE WHEN NORM(a) > 0 AND NORM(b) > 0 THEN DOT(a, b) / (NORM(a) * NORM(b)) END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION NORMALIZE(a ARRAY<DOUBLE>) RETURNS ARRAY<DOUBLE> "
        "RETURN CASE WHEN NORM(a) > 0 THEN transform(a, x -> x / NORM(a)) END"
    )
