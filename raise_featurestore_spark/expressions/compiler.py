"""Derived-feature expression → Spark plan compiler.

Pipeline (the reference declares parse → resolve refs → type check →
optimize → emit plan, raise_/PRD.md:601-622; Catalyst does the optimize/
codegen half for free once we emit a Column):

1. validate (whitelist, parens, references) — expressions/validator.py
2. resolve references:
   - local features → plain columns (version suffix resolution)
   - ``group.feature`` / path refs → entity-key equi-join against the other
     group's DataFrame (broadcast when small), ref rewritten to the joined
     column
3. hoist bare aggregates: ``(x - AVG(x)) / STDDEV(x)`` mixes row and
   aggregate scope. Compiling AVG(x) to ``AVG(x) OVER ()`` would funnel the
   whole table through one partition; instead each distinct bare aggregate
   becomes a 1-row broadcast-joined aggregate frame (scale-safe, same
   result).
4. emit ``F.expr`` — Spark's SQL parser/Catalyst handle the rest, including
   full OVER(...) window syntax which we pass through untouched.

Function-name normalization maps the reference's spellings onto Spark SQL
(IIF→if, SIGN→signum is not needed — Spark has sign; vector functions are
registered as temp SQL macros by functions/vector.py).
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from raise_featurestore_spark.catalog.lineage import FeatureRef
from raise_featurestore_spark.expressions.validator import (
    AGGREGATE_FUNCS,
    ValidationResult,
    validate_expression,
)

_STRING_LITERAL_RE = re.compile(r"'(?:[^'\\]|\\.)*'")

# Resolver: given a non-local FeatureRef, return (other_df, local_key,
# other_key, column_in_other_df). The compiler joins and rewrites.
Resolver = Callable[[FeatureRef], tuple[DataFrame, str, str, str]]


class ExpressionError(ValueError):
    def __init__(self, result: ValidationResult):
        self.result = result
        msgs = "; ".join(f"{e.code}: {e.message}" for e in result.errors)
        super().__init__(msgs or "invalid expression")


def _replace_outside_literals(expr: str, replacements: list[tuple[str, str]]) -> str:
    """Textually replace tokens, skipping string-literal spans."""
    spans = [m.span() for m in _STRING_LITERAL_RE.finditer(expr)]

    def in_literal(pos: int) -> bool:
        return any(a <= pos < b for a, b in spans)

    for old, new in sorted(replacements, key=lambda r: -len(r[0])):
        out: list[str] = []
        i = 0
        pattern = re.compile(re.escape(old) + r"(?![\w.@/])")
        while i < len(expr):
            m = pattern.search(expr, i)
            if not m or in_literal(m.start()):
                if m and in_literal(m.start()):
                    out.append(expr[i : m.end()])
                    i = m.end()
                    continue
                out.append(expr[i:])
                break
            # avoid replacing mid-token: check char before
            if m.start() > 0 and (expr[m.start() - 1].isalnum() or expr[m.start() - 1] in "_.@/"):
                out.append(expr[i : m.end()])
                i = m.end()
                continue
            out.append(expr[i : m.start()])
            out.append(new)
            i = m.end()
        expr = "".join(out)
        spans = [m.span() for m in _STRING_LITERAL_RE.finditer(expr)]
    return expr


_BARE_AGG_RE = re.compile(
    r"\b(" + "|".join(AGGREGATE_FUNCS) + r")\s*\(",
    re.IGNORECASE,
)


def _find_bare_aggregates(expr: str) -> list[tuple[int, int, str]]:
    """Spans of aggregate calls NOT followed by OVER — these need hoisting."""
    stripped = _STRING_LITERAL_RE.sub(lambda m: "'" + " " * (len(m.group(0)) - 2) + "'", expr)
    out = []
    for m in _BARE_AGG_RE.finditer(stripped):
        depth = 1
        i = m.end()
        while i < len(stripped) and depth:
            if stripped[i] == "(":
                depth += 1
            elif stripped[i] == ")":
                depth -= 1
            i += 1
        rest = stripped[i:].lstrip()
        if not rest.upper().startswith("OVER"):
            out.append((m.start(), i, expr[m.start() : i]))
    return out


def hoist_global_aggregates(df: DataFrame, expr: str) -> tuple[DataFrame, str]:
    """Replace bare aggregate calls with broadcast-joined scalar columns."""
    calls = _find_bare_aggregates(expr)
    if not calls:
        return df, expr
    uniq: dict[str, str] = {}
    for _, _, call in calls:
        if call not in uniq:
            uniq[call] = f"__gagg_{len(uniq)}"
    agg_frame = df.agg(*[F.expr(call).alias(alias) for call, alias in uniq.items()])
    joined = df.join(F.broadcast(agg_frame))
    # splice by the exact spans _find_bare_aggregates reported, back to
    # front — a plain str.replace would also clobber a textually identical
    # WINDOWED call ("AVG(x) OVER (...)") or text inside a string literal
    new_expr = expr
    for start, end, call in sorted(calls, key=lambda c: -c[0]):
        new_expr = new_expr[:start] + uniq[call] + new_expr[end:]
    return joined, new_expr


_FUNC_NORMALIZE = {
    "IIF": "if",
    "IF": "if",
    "IFNULL": "ifnull",
    "NVL": "nvl",
    "POWER": "power",
    "LOG": "ln",  # reference LOG is natural log; Spark log(x) is ln but be explicit
    "STDDEV": "stddev_samp",
    "VARIANCE": "var_samp",
}


def normalize_functions(expr: str) -> str:
    def sub(m: re.Match) -> str:
        name = m.group(1)
        return _FUNC_NORMALIZE.get(name.upper(), name) + "("

    return re.sub(r"\b([A-Za-z_][A-Za-z0-9_]*)\s*\(", sub, expr)


def compile_expression(
    df: DataFrame,
    expr: str,
    resolver: Resolver | None = None,
    known_features: set[str] | None = None,
    version_map: dict[str, str] | None = None,
    level: str = "standard",
) -> tuple[DataFrame, Column]:
    """Compile ``expr`` against ``df``; returns (possibly-joined df, column).

    ``version_map`` maps logical names (``price``, ``price@v2``) to physical
    column names for versioned features.
    """
    known = known_features if known_features is not None else set(df.columns)
    result = validate_expression(expr, known_features=known | set(version_map or {}), level=level)
    if not result.valid:
        raise ExpressionError(result)

    replacements: list[tuple[str, str]] = []
    for name, phys in (version_map or {}).items():
        if name != phys:
            replacements.append((name, phys))

    if resolver is not None:
        seen: set[str] = set()
        for ref in result.references:
            if ref.is_local and ref.version is None:
                continue
            token = _ref_token(ref)
            if token in seen:
                continue
            seen.add(token)
            other_df, local_key, other_key, col = resolver(ref)
            alias = "__x_" + re.sub(r"\W", "_", token)
            side = other_df.select(
                F.col(other_key).alias(f"__k_{alias}"), F.col(col).alias(alias)
            )
            df = df.join(
                F.broadcast(side) if _broadcastable(side) else side,
                on=df[local_key] == side[f"__k_{alias}"],
                how="left",
            ).drop(f"__k_{alias}")
            replacements.append((token, alias))

    if replacements:
        expr = _replace_outside_literals(expr, replacements)

    df, expr = hoist_global_aggregates(df, expr)
    expr = normalize_functions(expr)
    return df, F.expr(expr)


def _ref_token(ref: FeatureRef) -> str:
    parts = []
    if ref.org:
        parts.append(f"@{ref.org}")
    if ref.domain:
        parts.append(ref.domain)
    if ref.project:
        parts.append(ref.project)
    head = "/".join(parts)
    g = f"{ref.group}." if ref.group else ""
    v = f"@{ref.version}" if ref.version else ""
    return (head + "/" if head else "") + g + ref.feature + v


def _broadcastable(df: DataFrame) -> bool:
    # dimension-side groups are usually small; AQE will demote if not.
    return True
