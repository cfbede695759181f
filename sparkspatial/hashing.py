"""Deterministic cross-engine 32-bit hash.

``h32(s) = int(md5(utf8(s)).hexdigest()[:8], 16)`` — a uniform hash in
[0, 2^32) computable bit-identically in

* Python / numpy (driver + pandas UDFs),
* Spark SQL (``conv(substring(md5(x),1,8),16,10)``),
* DuckDB SQL (a strpos polynomial over the hex digits — DuckDB has no
  ``conv``), used by the oracle harness in ``__spark_entry__.py``.

This replaces the reference's SHA-256 cache keys (Loader.groovy:242)
as the engine's deterministic derivation primitive, and seeds every
synthetic derivation (geocoding, minhash permutations) so Spark
results and DuckDB oracle results agree exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

__all__ = ["h32", "h32_pandas", "h32_spark_sql", "h32_duckdb_sql", "h64"]


def h32(s: str) -> int:
    """32-bit uniform hash of a string (first 8 hex chars of md5)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def h64(s: str) -> int:
    """64-bit variant (first 16 hex chars of md5), non-negative int63.

    Masked to 63 bits so it round-trips through Spark/DuckDB BIGINT
    without sign surprises.
    """
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16) & 0x7FFFFFFFFFFFFFFF


def h32_pandas(s: pd.Series) -> np.ndarray:
    """Vectorized h32 over a pandas string Series -> int64 ndarray."""
    return np.fromiter(
        (int(hashlib.md5(x.encode("utf-8")).hexdigest()[:8], 16) for x in s),
        dtype=np.int64,
        count=len(s),
    )


def h32_spark_sql(expr: str) -> str:
    """Spark SQL expression string computing h32 of SQL expression `expr`."""
    return f"CAST(conv(substring(md5({expr}), 1, 8), 16, 10) AS BIGINT)"


def h32_duckdb_sql(expr: str) -> str:
    """DuckDB SQL expression computing h32 of `expr` (no conv() in DuckDB).

    Evaluates the 8-hex-digit prefix of md5 as a base-16 polynomial via
    strpos into the hex alphabet. Exact integer arithmetic, matches
    :func:`h32` bit-for-bit.
    """
    terms = []
    for i in range(8):
        coef = 16 ** (7 - i)
        terms.append(
            f"(strpos('0123456789abcdef', substring(md5({expr}), {i + 1}, 1)) - 1)"
            f" * {coef}"
        )
    return "(" + " + ".join(terms) + ")"
