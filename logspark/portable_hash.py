"""Portable deterministic hashing — identical results in Spark SQL and DuckDB.

Building block for the dedup/fingerprint operators whose DuckDB oracles must
hash exactly like the Spark side: both engines share md5() (lowercase hex),
instr(), substr(); a 32-bit integer is rebuilt from the first 8 hex digits.
No engine-specific hash (xxhash64, duckdb hash()) ever crosses the oracle
boundary — those are reserved for physical concerns (partitioning, salting).
"""

from __future__ import annotations

HEX = "0123456789abcdef"

# MinHash permutation constants (fixed, public-domain LCG style)
MINHASH_PERMS = [(1_103_515_245, 12_345), (214_013, 2_531_011), (69_069, 1), (1_664_525, 1_013_904_223)]
MERSENNE31 = 2_147_483_647


def hex32_sql(expr: str) -> str:
    """Portable SQL: first 8 hex digits of md5(expr) -> BIGINT in [0, 2^32)."""
    terms = []
    for i in range(1, 9):
        w = 16 ** (8 - i)
        terms.append(
            f"(instr('{HEX}', substr(md5({expr}), {i}, 1)) - 1) * CAST({w} AS BIGINT)"
        )
    return "(" + " + ".join(terms) + ")"


def minhash_term_sql(expr: str, k: int) -> str:
    """Portable SQL: k-th MinHash permutation of a token expression."""
    a, b = MINHASH_PERMS[k]
    return f"(({a} * {hex32_sql(expr)} + {b}) % {MERSENNE31})"


def simhash_bit_sql(expr: str, j: int) -> str:
    """Portable SQL: bit j (0..31) of the word hash = MSB of hex digit j+1
    of md5(expr): +1 / -1 contribution for simhash accumulation."""
    return (
        f"(CASE WHEN instr('{HEX}', substr(md5({expr}), {j + 1}, 1)) - 1 >= 8 "
        f"THEN 1 ELSE -1 END)"
    )


def simhash_fingerprint_sql(sum_cols: list[str]) -> str:
    """Portable SQL: recombine per-bit signed sums into a 32-bit fingerprint."""
    terms = [
        f"(CASE WHEN {c} > 0 THEN CAST({2 ** j} AS BIGINT) ELSE 0 END)"
        for j, c in enumerate(sum_cols)
    ]
    return "(" + " + ".join(terms) + ")"
