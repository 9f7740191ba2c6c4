"""Derived-feature expression validator.

Re-implements the reference's validation pipeline (reference:
raise_/validation/validator.py:143-316 — paren balance :186-205, literal
stripping :208-210, reference extraction :213-255, function whitelist
:257-266, division warning :269-274) with the same error codes:

    EMPTY_EXPRESSION  UNBALANCED_PARENS  UNKNOWN_REFERENCE
    UNKNOWN_FUNCTION  INVALID_REFERENCE

Validation levels strict/standard/permissive (validator.py:319-351):
strict — unknown references and unknown functions are errors;
standard — unknown functions are errors, unknown references are errors
only when a known-feature context is provided; permissive — both downgrade
to warnings.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from raise_featurestore_spark.catalog.lineage import (
    FeatureRef,
    InvalidReferenceError,
    parse_reference,
)

# function whitelist (reference: validator.py:98-132 + PRD.md:544-581)
AGGREGATE_FUNCS = {"AVG", "SUM", "MIN", "MAX", "COUNT", "STDDEV", "VARIANCE", "PERCENTILE"}
MATH_FUNCS = {"ABS", "CEIL", "FLOOR", "ROUND", "LOG", "EXP", "POWER", "SQRT", "LOG10", "SIGN"}
VECTOR_FUNCS = {"DOT", "COSINE_SIMILARITY", "L2_DISTANCE", "L1_DISTANCE", "NORM", "NORMALIZE"}
STRING_FUNCS = {
    "CONCAT",
    "LOWER",
    "UPPER",
    "TRIM",
    "LTRIM",
    "RTRIM",
    "SUBSTRING",
    "LENGTH",
    "REPLACE",
}
CONDITIONAL_FUNCS = {"COALESCE", "NULLIF", "IF", "IIF", "IFNULL", "NVL"}
WINDOW_FUNCS = {"LAG", "LEAD", "FIRST_VALUE", "LAST_VALUE", "ROW_NUMBER", "RANK", "DENSE_RANK"}

ALL_FUNCTIONS = (
    AGGREGATE_FUNCS | MATH_FUNCS | VECTOR_FUNCS | STRING_FUNCS | CONDITIONAL_FUNCS | WINDOW_FUNCS
)

# keywords (reference: validator.py:135-140)
KEYWORDS = {
    "AND",
    "OR",
    "NOT",
    "IS",
    "NULL",
    "TRUE",
    "FALSE",
    "CASE",
    "WHEN",
    "THEN",
    "ELSE",
    "END",
    "IN",
    "BETWEEN",
    "LIKE",
    "AS",
    "CAST",
    "OVER",
    "PARTITION",
    "BY",
    "ORDER",
    "ROWS",
    "RANGE",
    "PRECEDING",
    "FOLLOWING",
    "CURRENT",
    "ROW",
    "UNBOUNDED",
    "ASC",
    "DESC",
    "DOUBLE",
    "FLOAT",
    "BIGINT",
    "INT",
    "STRING",
    "BOOLEAN",
    "TIMESTAMP",
    "INTERVAL",
    "DAY",
    "HOUR",
    "MINUTE",
    "SECOND",
}

_STRING_LITERAL_RE = re.compile(r"'(?:[^'\\]|\\.)*'")
_NUMBER_RE = re.compile(r"^\d+(\.\d+)?([eE][+-]?\d+)?$")
# candidate reference tokens, including path syntax: @org/d/p/g.f, p/g.f, g.f, f, f@v2
# numbers first so scientific notation (1.5e3) lexes as ONE numeric token
# instead of number + bogus identifier 'e3'
_TOKEN_RE = re.compile(r"\d+(?:\.\d+)?(?:[eE][+-]?\d+)?|@?[A-Za-z_][\w\-./@]*")


@dataclass
class ValidationIssue:
    code: str
    message: str


@dataclass
class ValidationResult:
    valid: bool
    errors: list[ValidationIssue] = field(default_factory=list)
    warnings: list[ValidationIssue] = field(default_factory=list)
    references: list[FeatureRef] = field(default_factory=list)

    @property
    def reference_strings(self) -> list[str]:
        return [r.qualified() for r in self.references]


def _strip_literals(expr: str) -> str:
    return _STRING_LITERAL_RE.sub("''", expr)


def _paren_balanced(expr: str) -> bool:
    depth = 0
    for ch in expr:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                return False
    return depth == 0


def _suggest(name: str, known: set[str]) -> str | None:
    """Closest known name — prefix match first, then difflib
    (reference: validator.py:236-248 suggests near-misses)."""
    low = name.lower()
    prefixed = [k for k in known if k.lower().startswith(low) or low.startswith(k.lower())]
    if prefixed:
        return min(prefixed, key=len)
    import difflib

    close = difflib.get_close_matches(low, [k.lower() for k in known], n=1, cutoff=0.6)
    if close:
        for k in known:
            if k.lower() == close[0]:
                return k
    return None


def extract_references(
    expr: str, known_features: set[str] | None = None
) -> tuple[list[str], list[str]]:
    """Return (candidate reference tokens, function call names).

    ``-`` and ``/`` are legal INSIDE path references (hyphenated group
    names, path separators) but are also arithmetic operators, so an
    unspaced ``clicks/impressions`` lexes as one token. A genuine path
    reference always contains ``.`` (it ends in ``group.feature``) — a
    DOTLESS token containing ``-`` or ``/`` that isn't itself a known
    local feature is therefore unspaced arithmetic and is re-split into
    its operand identifiers. (``a/b.c`` stays a path reference: write
    division around dotted names with spaces.)"""
    stripped = _strip_literals(expr)
    funcs: list[str] = []
    refs: list[str] = []
    for m in _TOKEN_RE.finditer(stripped):
        tok = m.group(0)
        rest = stripped[m.end() :].lstrip()
        if _NUMBER_RE.match(tok):
            continue
        if tok.upper() in KEYWORDS:
            continue
        if (
            "." not in tok
            and not tok.startswith("@")
            and ("/" in tok or "-" in tok)
            and not (known_features and tok in known_features)
        ):
            parts = [p for p in re.split(r"[-/]+", tok) if p]
            for i, p in enumerate(parts):
                if _NUMBER_RE.match(p) or p.upper() in KEYWORDS:
                    continue
                if i == len(parts) - 1 and rest.startswith("("):
                    funcs.append(p)
                else:
                    refs.append(p)
            continue
        if rest.startswith("("):
            funcs.append(tok)
            continue
        refs.append(tok)
    return refs, funcs


def validate_expression(
    expr: str,
    known_features: set[str] | None = None,
    level: str = "standard",
) -> ValidationResult:
    """Validate a derived-feature expression.

    ``known_features`` holds the local feature names of the owning group;
    path references (``group.feature`` etc.) are validated structurally and
    resolved later against the catalog.
    """
    errors: list[ValidationIssue] = []
    warnings: list[ValidationIssue] = []
    refs: list[FeatureRef] = []

    if not expr or not expr.strip():
        return ValidationResult(False, [ValidationIssue("EMPTY_EXPRESSION", "expression is empty")])

    if not _paren_balanced(_strip_literals(expr)):
        errors.append(ValidationIssue("UNBALANCED_PARENS", "unbalanced parentheses"))

    ref_tokens, func_tokens = extract_references(expr, known_features)

    for fn in func_tokens:
        if fn.upper() not in ALL_FUNCTIONS:
            sug = _suggest(fn.upper(), ALL_FUNCTIONS)
            msg = f"unknown function {fn!r}" + (f"; did you mean {sug}?" if sug else "")
            issue = ValidationIssue("UNKNOWN_FUNCTION", msg)
            (warnings if level == "permissive" else errors).append(issue)

    for tok in ref_tokens:
        try:
            ref = parse_reference(tok)
        except InvalidReferenceError as ex:
            errors.append(ValidationIssue("INVALID_REFERENCE", str(ex)))
            continue
        refs.append(ref)
        if ref.is_local and known_features is not None and ref.feature not in known_features:
            sug = _suggest(ref.feature, known_features)
            msg = f"unknown feature {ref.feature!r}" + (f"; did you mean {sug!r}?" if sug else "")
            issue = ValidationIssue("UNKNOWN_REFERENCE", msg)
            if level == "permissive":
                warnings.append(issue)
            elif level == "strict" or known_features:
                errors.append(issue)

    # division-by-zero warning unless NULLIF guards (reference: :269-274)
    if re.search(r"/(?!\s*NULLIF)", _strip_literals(expr)) and "NULLIF" not in expr.upper():
        warnings.append(
            ValidationIssue(
                "DIVISION_BY_ZERO",
                "division without NULLIF guard may produce divide-by-zero",
            )
        )

    return ValidationResult(not errors, errors, warnings, refs)
