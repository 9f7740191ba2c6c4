"""PII detection and redaction over text columns.

Training-data pipelines scrub personally-identifying strings (emails,
phone numbers, IP addresses, long digit runs) before a corpus ships to a
trainer. Everything here is JVM-side ``regexp_replace`` / ``regexp_count``
column expressions — whole-stage codegen, zero Python in the row path, so
the scan stays at parquet-read speed at 100 TB.

Patterns are written in the common subset of Java regex (Spark) and RE2
(DuckDB): no lookaround, no backreferences — so every redaction is
oracle-checkable cross-engine. The reference has no PII surface (its blob
"processor" hooks, raise_/transforms/multimodal.py:721-758, are the nearest
concept); this module is an engine addition per the task brief's
training-data-pipeline mandate.

Replacement order matters and is fixed: emails first (an email would
otherwise be visibly altered by the digit-run rule), then phones, then
IPv4, then bare digit runs. ``redact`` applies them in that order; the
per-pattern counts are measured on the same intermediate strings the
replacement sees, so count and replacement always agree.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered: each pattern is counted/replaced on text already redacted by the
# previous ones
DEFAULT_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("digit_run", r"\b\d{9,}\b", "<NUM>"),
]


@dataclass
class RedactionSpec:
    """Which patterns to apply, in order. ``patterns`` entries are
    (name, regex, replacement)."""

    text_col: str = "text"
    id_col: str = "doc_id"
    patterns: list[tuple[str, str, str]] = field(default_factory=lambda: list(DEFAULT_PATTERNS))
    keep_text: bool = True  # emit the redacted text column itself


def redact(df: DataFrame, spec: RedactionSpec | None = None) -> DataFrame:
    """(id, n_<pattern>..., redacted[, total_redactions]) per row.

    One projection, no shuffle: counts and the rewritten string are all
    computed in a single pass over the text column.
    """
    spec = spec or RedactionSpec()
    cur: Column = F.col(spec.text_col)
    counts = []
    for name, regex, repl in spec.patterns:
        counts.append(F.regexp_count(cur, F.lit(regex)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, regex, repl)
    out = [F.col(spec.id_col), *counts]
    if spec.keep_text:
        out.append(cur.alias("redacted"))
    return df.select(*out)


def redact_sql(table: str, spec: RedactionSpec | None = None) -> str:
    """DuckDB twin of :func:`redact` (RE2 needs the explicit 'g' flag —
    DuckDB's regexp_replace is first-match-only by default)."""
    spec = spec or RedactionSpec()
    cur = spec.text_col
    cols = [spec.id_col]
    for name, regex, repl in spec.patterns:
        rx = regex.replace("'", "''")
        cols.append(f"CAST(len(regexp_extract_all({cur}, '{rx}')) AS INT) AS n_{name}")
        cur = f"regexp_replace({cur}, '{rx}', '{repl}', 'g')"
    if spec.keep_text:
        cols.append(f"{cur} AS redacted")
    return f"SELECT {', '.join(cols)} FROM {table}"
