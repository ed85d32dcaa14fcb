"""Shared deterministic expression helpers.

Every hash used by the dedup/similarity operators must be *exactly*
reproducible in two engines (Spark executes the operator; DuckDB executes
the oracle), so each helper exposes the same computation twice:

* ``*_spark(...)``  -> a Spark SQL expression string (used via F.expr)
* ``*_duck(...)``   -> the DuckDB SQL equivalent

The base token hash is the first 8 hex chars of md5 reduced mod the
Mersenne prime 2^31-1, keeping every subsequent linear-congruential step
inside int64 under ANSI overflow rules (a*h < 2^62).
"""

from __future__ import annotations

import random

__all__ = [
    "HASH_PRIME",
    "token_hash_spark",
    "token_hash_duck",
    "minhash_params",
    "shingles_spark",
    "shingles_duck",
    "tokens_spark",
    "tokens_duck",
]

HASH_PRIME = 2147483647  # 2^31 - 1


def token_hash_spark(col: str) -> str:
    """Deterministic 31-bit hash of a string column (Spark SQL dialect)."""
    return f"(CAST(CONV(SUBSTRING(MD5({col}), 1, 8), 16, 10) AS BIGINT) % {HASH_PRIME})"


def token_hash_duck(col: str) -> str:
    """The same hash in DuckDB SQL (verified equal value-by-value)."""
    return f"(CAST('0x' || substr(md5({col}), 1, 8) AS BIGINT) % {HASH_PRIME})"


def minhash_params(k: int, seed: int = 1234) -> list[tuple[int, int]]:
    """(a_i, b_i) for the k universal-hash functions (a*h+b) mod P."""
    rng = random.Random(seed)
    return [
        (rng.randrange(1, HASH_PRIME), rng.randrange(0, HASH_PRIME))
        for _ in range(k)
    ]


def tokens_spark(col: str) -> str:
    return f"split({col}, ' ')"


def tokens_duck(col: str) -> str:
    return f"string_split({col}, ' ')"


def shingles_spark(tokens: str, n: int = 3) -> str:
    """n-word shingle array (Spark SQL). Empty array when < n tokens.

    Matches the DuckDB comprehension in :func:`shingles_duck` element by
    element (both 1-indexed, both produce size(tokens)-n+1 shingles).
    """
    joined = ", ".join(f"element_at({tokens}, i + {j})" for j in range(n))
    return (
        f"CASE WHEN size({tokens}) >= {n} THEN "
        f"transform(sequence(1, size({tokens}) - {n - 1}), i -> concat_ws(' ', {joined})) "
        f"ELSE array() END"
    )


def shingles_duck(tokens: str, n: int = 3) -> str:
    joined = " || ' ' || ".join(f"{tokens}[i + {j}]" for j in range(n))
    return (
        f"[{joined} for i in range(1, greatest(len({tokens}) - {n - 2}, 1))]"
    )
