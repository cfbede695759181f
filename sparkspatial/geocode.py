"""Deterministic page -> coordinate derivation (cross-engine exact).

The graft input is a web-page corpus with no coordinates; the engine's
extraction stage (extract.py) pulls geocodable markers out of the HTML.
For *oracle-checkable* queries the driver harness needs a derivation
that Spark and DuckDB can both compute bit-identically from the base
tables, so this module defines the canonical arithmetic geocode:

    dh = h32(domain)                 # one "place" per domain
    ph = h32(url)                    # per-page jitter around the place
    hot = dh % 10 < 3                # 30% of domains pile into 25 hot
                                     # centers -> the dense web-corpus
                                     # hotspot skew of BASELINE.json
    center_lat = hot ? 40.1  + (dh % 5) * 0.2
                     : -59.9 + (dh % 1199) * 0.1
    center_lon = hot ? -74.3 + ((dh div 7) % 5) * 0.2
                     : -179.7 + ((dh div 1200) % 3595) * 0.1
    lat = center_lat + ((ph % 1000) - 500) * 0.0005      # +-0.25 deg
    lon = center_lon + (((ph div 1000) % 1000) - 500) * 0.0005

All operations are int64 mod/div followed by the same IEEE-double
expression shape in numpy, Spark SQL and DuckDB SQL, so the three
agree to the bit. Latitude stays within (-61, 61), longitude within
(-180, 180) by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .hashing import h32_duckdb_sql, h32_pandas, h32_spark_sql

__all__ = ["geocode_pandas", "lat_sql", "lon_sql", "url_sql"]


def geocode_pandas(domain: pd.Series, url: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized canonical geocode -> (lat, lon) float64 arrays."""
    dh = h32_pandas(domain)
    ph = h32_pandas(url)
    hot = (dh % 10) < 3
    center_lat = np.where(hot, 40.1 + (dh % 5).astype(np.float64) * 0.2,
                          -59.9 + (dh % 1199).astype(np.float64) * 0.1)
    center_lon = np.where(hot, -74.3 + ((dh // 7) % 5).astype(np.float64) * 0.2,
                          -179.7 + ((dh // 1200) % 3595).astype(np.float64) * 0.1)
    lat = center_lat + ((ph % 1000) - 500) * 0.0005
    lon = center_lon + (((ph // 1000) % 1000) - 500) * 0.0005
    return lat, lon


def _div(dialect: str) -> str:
    return "DIV" if dialect == "spark" else "//"


def _h32(expr: str, dialect: str) -> str:
    return h32_spark_sql(expr) if dialect == "spark" else h32_duckdb_sql(expr)


def url_sql(source_expr: str, id_expr: str, dialect: str = "spark") -> str:
    """url := source || '/' || id — the FIXTURES.md B.4 stand-in rule."""
    return f"({source_expr} || '/' || CAST({id_expr} AS STRING))" if dialect == "spark" \
        else f"({source_expr} || '/' || CAST({id_expr} AS VARCHAR))"


def lat_sql(domain_expr: str, url_expr: str, dialect: str = "spark") -> str:
    dh = _h32(domain_expr, dialect)
    ph = _h32(url_expr, dialect)
    # e-notation literals are DOUBLE in both Spark SQL and DuckDB
    # (plain `0.2` would be DECIMAL in both, with exact — different — math)
    center = (f"(CASE WHEN ({dh}) % 10 < 3 THEN 4.01e1 + (({dh}) % 5) * 2e-1 "
              f"ELSE -5.99e1 + (({dh}) % 1199) * 1e-1 END)")
    return f"({center} + ((({ph}) % 1000) - 500) * 5e-4)"


def lon_sql(domain_expr: str, url_expr: str, dialect: str = "spark") -> str:
    d = _div(dialect)
    dh = _h32(domain_expr, dialect)
    ph = _h32(url_expr, dialect)
    center = (f"(CASE WHEN ({dh}) % 10 < 3 THEN -7.43e1 + ((({dh}) {d} 7) % 5) * 2e-1 "
              f"ELSE -1.797e2 + ((({dh}) {d} 1200) % 3595) * 1e-1 END)")
    return f"({center} + (((({ph}) {d} 1000) % 1000) - 500) * 5e-4)"
