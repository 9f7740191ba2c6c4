"""Cross-engine deterministic hashing for dedup/LSH operators.

Spark's ``hash()`` (Murmur3) and DuckDB's ``hash()`` disagree, so every
operator that must be oracle-checkable builds on a shared primitive both
engines compute identically:

    h32(s) = int(md5(s)[:8 hex], 16)          ∈ [0, 2³²)

Seeded universal hashes derive affine transforms over h32:

    h_i(s) = (a_i · h32(s) + b_i) mod P       P = 4294967311 (prime > 2³²)

The (a_i, b_i) streams come from ``random.Random(seed)`` in THIS process
and are embedded as literals into both the Spark plan and the oracle SQL —
one source of truth, no cross-engine RNG drift.

md5-per-shingle is ~100 ns/row-ish JVM-side intrinsic work — fine for the
scan-heavy dedup path; at 100 TB the cost is dominated by the shingle
explosion itself, not the hash.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = 4294967311  # smallest prime > 2^32


def h32(col: Column) -> Column:
    """First 32 bits of md5 as a BIGINT (Spark side)."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 8), 16, 10).cast("long")


def h32_sql(expr: str) -> str:
    """Same value in DuckDB SQL."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


def h60(col: Column) -> Column:
    """First 60 bits of md5 as a BIGINT (Spark side).

    Wider than :func:`h32` for join keys over very large key populations
    (e.g. one rolling window hash per token of a corpus): birthday-collision
    expectation at 4e9 keys is ~7e-3 under 60 bits vs ~4e6 under 32. 15 hex
    chars = 60 bits keeps the value strictly below 2^63 on both engines."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    """Same value in DuckDB SQL."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def seeded_coeffs(k: int, seed: int = 7) -> list[tuple[int, int]]:
    """k (a, b) pairs for the affine universal-hash family.

    Coefficients stay below 2³¹ so a·h32 < 2⁶³ — no int64 overflow on
    either engine (Spark under ANSI mode and DuckDB both trap overflow).
    """
    rng = random.Random(seed)
    bound = 2**31
    return [(rng.randrange(1, bound), rng.randrange(0, bound)) for _ in range(k)]


def affine(h: Column, a: int, b: int) -> Column:
    return (h * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)


def affine_sql(h_expr: str, a: int, b: int) -> str:
    return f"(({h_expr}) * {a} + {b}) % {MERSENNE_P}"
