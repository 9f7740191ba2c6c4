"""Feature type system: dtype grammar ↔ Spark DataTypes.

Re-implements the reference's type grammar (reference: raise_/models/types.py
— string shortcuts :276-292, parse_dtype :295-330, infer_result_type
:333-365; physical sizing raise_/PRD.md:2799-2839) on top of Spark's type
system:

  int64 float32 float64 bool string string[N] bytes timestamp
  float16[N] float32[N] float64[N]          (fixed-dim embeddings)
  dtype[] dtype[:N]                          (arrays, optionally bounded)
  struct<field: dtype, ...>                  (nested, recursive)
  blob_ref blob_ref<mime|mime>               (multimodal pointer struct)

Spark notes:
- float16 embeddings upcast to float32 (Spark has no half type) — exact
  in VALUE; for STORAGE-bound fp16 corpora the opt-in packed-binary codec
  ``functions/fp16.py`` keeps the declared 2-bytes/component width on
  disk (pack_fp16/unpack_fp16, decode-on-read).
- string[N] / bounded arrays / embedding dims carry a logical constraint
  Spark types can't express; ``validation_predicate`` compiles it to a
  boolean Column for write-time enforcement (distributed check, no collect).
- blob_ref maps to the BlobReference struct (see sources/multimodal.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class FeatureType:
    """A parsed feature dtype: kind + parameters."""

    kind: str  # int64|float32|float64|bool|string|bytes|timestamp|embedding|array|struct|blob_ref
    max_length: int | None = None  # string[N] / bounded array
    dim: int | None = None  # embedding dimension
    element: "FeatureType | None" = None  # array element / embedding scalar
    fields: tuple[tuple[str, "FeatureType"], ...] = ()  # struct fields
    content_types: tuple[str, ...] = ()  # blob_ref mime whitelist

    def __str__(self) -> str:
        if self.kind == "embedding":
            return f"{self.element.kind}[{self.dim}]"
        if self.kind == "array":
            bound = f":{self.max_length}" if self.max_length else ""
            return f"{self.element}[{bound}]" if bound else f"{self.element}[]"
        if self.kind == "string" and self.max_length:
            return f"string[{self.max_length}]"
        if self.kind == "struct":
            inner = ", ".join(f"{n}: {t}" for n, t in self.fields)
            return f"struct<{inner}>"
        if self.kind == "blob_ref" and self.content_types:
            return f"blob_ref<{'|'.join(self.content_types)}>"
        return self.kind


BLOB_REF_SPARK_TYPE = T.StructType(
    [
        T.StructField("uri", T.StringType(), False),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("checksum", T.StringType(), True),
        T.StructField("hash_algorithm", T.StringType(), True),
        T.StructField("size_bytes", T.LongType(), True),
        T.StructField("etag", T.StringType(), True),
        T.StructField("version_id", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

_SCALARS = {
    "int64": T.LongType(),
    "int32": T.IntegerType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "bool": T.BooleanType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
    "timestamp": T.TimestampType(),
}

_EMBED_RE = re.compile(r"^(float16|float32|float64)\[(\d+)\]$")
_STRING_RE = re.compile(r"^string\[(\d+)\]$")
_ARRAY_RE = re.compile(r"^(.+)\[(?::(\d+))?\]$")
_BLOB_RE = re.compile(r"^blob_ref(?:<([^>]+)>)?$")


class DTypeError(ValueError):
    pass


def parse_dtype(spec: str) -> FeatureType:
    s = spec.strip()
    if not s:
        raise DTypeError("empty dtype")
    if s in _SCALARS:
        return FeatureType(kind=s)
    m = _STRING_RE.match(s)
    if m:
        return FeatureType(kind="string", max_length=int(m.group(1)))
    m = _EMBED_RE.match(s)
    if m:
        elem = "float32" if m.group(1) == "float16" else m.group(1)  # upcast half
        return FeatureType(kind="embedding", dim=int(m.group(2)), element=FeatureType(kind=elem))
    m = _BLOB_RE.match(s)
    if m:
        cts = tuple(p.strip() for p in m.group(1).split("|")) if m.group(1) else ()
        return FeatureType(kind="blob_ref", content_types=cts)
    if s.startswith("struct<") and s.endswith(">"):
        return _parse_struct(s[len("struct<") : -1])
    m = _ARRAY_RE.match(s)
    if m:
        elem = parse_dtype(m.group(1))
        bound = int(m.group(2)) if m.group(2) else None
        return FeatureType(kind="array", element=elem, max_length=bound)
    raise DTypeError(f"unknown dtype: {spec!r}")


def _parse_struct(body: str) -> FeatureType:
    fields: list[tuple[str, FeatureType]] = []
    depth = 0
    part = ""
    parts: list[str] = []
    for ch in body:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append(part)
            part = ""
        else:
            part += ch
    if part.strip():
        parts.append(part)
    for p in parts:
        if ":" not in p:
            raise DTypeError(f"struct field missing ':': {p!r}")
        name, _, ty = p.partition(":")
        fields.append((name.strip(), parse_dtype(ty)))
    if not fields:
        raise DTypeError("empty struct")
    return FeatureType(kind="struct", fields=tuple(fields))


def to_spark_type(ft: FeatureType) -> T.DataType:
    if ft.kind in _SCALARS:
        return _SCALARS[ft.kind]
    if ft.kind == "embedding":
        return T.ArrayType(to_spark_type(ft.element), containsNull=False)
    if ft.kind == "array":
        return T.ArrayType(to_spark_type(ft.element))
    if ft.kind == "struct":
        return T.StructType([T.StructField(n, to_spark_type(t), True) for n, t in ft.fields])
    if ft.kind == "blob_ref":
        return BLOB_REF_SPARK_TYPE
    raise DTypeError(f"no Spark mapping for {ft}")


def from_spark_type(dt: T.DataType) -> FeatureType:
    for name, st in _SCALARS.items():
        if dt == st:
            return FeatureType(kind=name)
    if isinstance(dt, T.ArrayType):
        return FeatureType(kind="array", element=from_spark_type(dt.elementType))
    if isinstance(dt, T.StructType):
        if dt == BLOB_REF_SPARK_TYPE:
            return FeatureType(kind="blob_ref")
        return FeatureType(
            kind="struct", fields=tuple((f.name, from_spark_type(f.dataType)) for f in dt.fields)
        )
    if isinstance(dt, T.FloatType):
        return FeatureType(kind="float32")
    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
        return FeatureType(kind="int32")
    if isinstance(dt, T.TimestampNTZType):
        return FeatureType(kind="timestamp")
    raise DTypeError(f"no feature type for Spark type {dt}")


def has_constraint(ft: FeatureType) -> bool:
    """True iff :func:`validation_predicate` is non-trivial for this type."""
    return bool(
        (ft.kind == "string" and ft.max_length)
        or (ft.kind == "embedding" and ft.dim)
        or (ft.kind == "array" and ft.max_length)
        or (ft.kind == "blob_ref" and ft.content_types)
    )


def validation_predicate(ft: FeatureType, col: Column) -> Column:
    """Boolean Column that is true iff the value satisfies the logical
    constraints Spark's type system can't enforce (string max length,
    embedding dim, bounded arrays, blob content-type whitelist).

    Runs distributed at write time — a filter/observe over the DataFrame,
    never a collect.
    """
    pred = F.lit(True)
    if ft.kind == "string" and ft.max_length:
        pred = col.isNull() | (F.length(col) <= ft.max_length)
    elif ft.kind == "embedding":
        pred = col.isNull() | (F.size(col) == ft.dim)
    elif ft.kind == "array" and ft.max_length:
        pred = col.isNull() | (F.size(col) <= ft.max_length)
    elif ft.kind == "blob_ref" and ft.content_types:
        pred = col.isNull() | col.getField("content_type").isin(list(ft.content_types))
    return pred


# ---------------------------------------------------------------------------
# binary-op result type inference (reference: types.py:333-365)
# ---------------------------------------------------------------------------

_NUMERIC_ORDER = ["int32", "int64", "float32", "float64"]


def infer_result_type(op: str, left: FeatureType, right: FeatureType) -> FeatureType:
    """Result type of ``left <op> right`` with numeric widening.

    ``+ - *`` promote to the widest operand type; ``/`` always returns
    float64; comparisons and AND/OR return bool; ``||`` returns string.
    """
    if op in ("==", "=", "!=", "<", "<=", ">", ">=", "AND", "OR", "and", "or"):
        return FeatureType(kind="bool")
    if op == "||":
        return FeatureType(kind="string")
    if op == "/":
        return FeatureType(kind="float64")
    if op in ("+", "-", "*", "%"):
        if left.kind not in _NUMERIC_ORDER or right.kind not in _NUMERIC_ORDER:
            raise DTypeError(f"non-numeric operands for {op}: {left}, {right}")
        idx = max(_NUMERIC_ORDER.index(left.kind), _NUMERIC_ORDER.index(right.kind))
        return FeatureType(kind=_NUMERIC_ORDER[idx])
    raise DTypeError(f"unknown operator {op!r}")
