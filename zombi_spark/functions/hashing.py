"""Deterministic, engine-portable hashing.

The LLM-pipeline operators (MinHash, SimHash, fingerprinting) need hash
functions that are (a) cheap and JVM-side in Spark, (b) reproducible by
the DuckDB oracle so correctness can be hash-checked. Spark's builtin
``hash()`` (murmur3) has no DuckDB twin, so we standardize on
md5-prefix→bigint: ``conv(substr(md5(x),1,15),16,10)`` — 60 bits, always
non-negative, identical in any engine with md5.

At 100 TB scale md5 on short tokens is still JVM-side codegen (no Python);
if throughput ever demanded it we would switch to xxhash64 inside Spark
and keep md5 only for the oracle-checked paths.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 60-bit space (15 hex chars) so arithmetic stays well inside BIGINT.
_HEX_CHARS = 15


def md5_long(col: Column) -> Column:
    """Stable 60-bit non-negative hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, _HEX_CHARS), 16, 10).cast("long")


def stable_token_hash(token: Column, seed: int | Column = 0) -> Column:
    """Seeded variant: hash(seed || ':' || token) — used for MinHash perms."""
    seed_col = F.lit(str(seed)) if isinstance(seed, int) else seed.cast("string")
    return md5_long(F.concat(seed_col, F.lit(":"), token))


def md5_long_sql(expr: str) -> str:
    """DuckDB SQL fragment equivalent to :func:`md5_long` (for oracles)."""
    return f"('0x' || substr(md5({expr}), 1, {_HEX_CHARS}))::BIGINT"


def stable_token_hash_sql(token_expr: str, seed_expr: str = "0") -> str:
    """DuckDB SQL fragment equivalent to :func:`stable_token_hash`."""
    return md5_long_sql(f"({seed_expr})::VARCHAR || ':' || {token_expr}")
