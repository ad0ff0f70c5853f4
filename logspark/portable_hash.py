"""Portable deterministic hashing — identical results in Spark SQL and DuckDB.

Building block for the dedup/fingerprint operators whose DuckDB oracles must
hash exactly like the Spark side: both engines share md5() (lowercase hex),
instr(), substr(); a 32-bit integer is rebuilt from the first 8 hex digits.
No engine-specific hash (xxhash64, duckdb hash()) ever crosses the oracle
boundary — those are reserved for physical concerns (partitioning, salting).

Hot-path rule: the md5 digest is computed ONCE per token into its own column
(`*_from_digest_sql` variants) — inlining md5 into every derived expression
re-evaluates it per hex digit / per permutation / per simhash bit (measured
2x on simhash in round 1).
"""

from __future__ import annotations

HEX = "0123456789abcdef"

# MinHash permutation constants. First four are the legacy fixed pairs
# (public-domain LCG style); the rest are generated deterministically.
# Multipliers stay < 2^31 so a*h32 + b < 2^63 (no BIGINT overflow on a
# 32-bit word hash) — identical arithmetic in Spark and DuckDB.
_LEGACY_PERMS = [
    (1_103_515_245, 12_345),
    (214_013, 2_531_011),
    (69_069, 1),
    (1_664_525, 1_013_904_223),
]
MERSENNE31 = 2_147_483_647


def perm(k: int) -> tuple[int, int]:
    """k-th MinHash permutation (a, b): legacy constants for k < 4, then a
    deterministic Knuth-style derivation (odd multiplier < 2^30)."""
    if k < len(_LEGACY_PERMS):
        return _LEGACY_PERMS[k]
    a = ((k + 1) * 2_654_435_761) % (2**30) | 1
    b = (k * 40_503 + 12_345) % (2**30)
    return a, b


def hex32_from_digest_sql(digest: str) -> str:
    """Portable SQL: first 8 hex digits of a precomputed md5 digest column
    -> BIGINT in [0, 2^32)."""
    terms = []
    for i in range(1, 9):
        w = 16 ** (8 - i)
        terms.append(
            f"(instr('{HEX}', substr({digest}, {i}, 1)) - 1) * CAST({w} AS BIGINT)"
        )
    return "(" + " + ".join(terms) + ")"


def hex32_sql(expr: str) -> str:
    """Portable SQL: first 8 hex digits of md5(expr) -> BIGINT in [0, 2^32).
    Prefer hoisting md5(expr) to a column and using hex32_from_digest_sql."""
    return hex32_from_digest_sql(f"md5({expr})")


def minhash_perm_sql(h32: str, k: int) -> str:
    """Portable SQL: k-th MinHash permutation applied to a precomputed
    32-bit word-hash column."""
    a, b = perm(k)
    return f"(({a} * {h32} + {b}) % {MERSENNE31})"


def minhash_term_sql(expr: str, k: int) -> str:
    """Portable SQL: k-th MinHash permutation of a token expression
    (digest inlined — oracle-side convenience only)."""
    return minhash_perm_sql(hex32_sql(expr), k)


def simhash_bit_from_digest_sql(digest: str, j: int) -> str:
    """Portable SQL: bit j (0..31) of the word hash = MSB of hex digit j+1
    of a precomputed md5 digest column: +1 / -1 simhash contribution."""
    return (
        f"(CASE WHEN instr('{HEX}', substr({digest}, {j + 1}, 1)) - 1 >= 8 "
        f"THEN 1 ELSE -1 END)"
    )


def simhash_bit_sql(expr: str, j: int) -> str:
    """Portable SQL: simhash bit j of md5(expr) (digest inlined — oracle-side
    convenience; the Spark hot path hoists the digest to one column)."""
    return simhash_bit_from_digest_sql(f"md5({expr})", j)


def simhash_fingerprint_sql(sum_cols: list[str]) -> str:
    """Portable SQL: recombine per-bit signed sums into a 32-bit fingerprint."""
    terms = [
        f"(CASE WHEN {c} > 0 THEN CAST({2 ** j} AS BIGINT) ELSE 0 END)"
        for j, c in enumerate(sum_cols)
    ]
    return "(" + " + ".join(terms) + ")"
