"""Deterministic cross-engine hashing.

MinHash / SimHash / fingerprint operators need hash values that are
bit-identical between the Spark query and the DuckDB oracle (SURVEY.md §7
"hard parts"). Spark's ``hash``/``xxhash64`` and DuckDB's ``hash`` use
different algorithms, so we derive a 60-bit integer from ``md5`` — both
engines expose md5 as a hex string and can slice/convert it identically:

- Spark:  ``conv(substring(md5(x), 1, 15), 16, 10)`` cast to long
- DuckDB: ``('0x' || substr(md5(x), 1, 15))::BIGINT``

15 hex digits = 60 bits, always non-negative, never overflows a signed
64-bit int in either engine. Verified bit-identical (session setup,
2026-08-13). md5 is ~2-3x slower than xxhash64 but stays JVM-side and
vectorized; at 100 TB you would swap in ``xxhash64(col, seed)`` once the
oracle no longer needs to reproduce it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Modulus used when a bounded hash is needed (largest prime < 2^31).
HASH_MOD = 2_147_483_647


def hash60(col: Column | str) -> Column:
    """60-bit non-negative deterministic hash of a string column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash60_seeded(col: Column | str, seed: int) -> Column:
    """Seeded variant: prefix the value with ``"{seed}:"`` before hashing."""
    c = F.col(col) if isinstance(col, str) else col
    return hash60(F.concat(F.lit(f"{seed}:"), c))


def hash60_sql(expr: str) -> str:
    """DuckDB SQL fragment computing the same value as :func:`hash60`."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def hash60_seeded_sql(expr: str, seed: int) -> str:
    return hash60_sql(f"'{seed}:' || {expr}")
