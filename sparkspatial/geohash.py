"""Standard geohash encoding (Niemeyer base32) — interop codec.

The engine's native index is the int64 cell id (cells.py — better
join key: fixed width, parent arithmetic). Geohash strings are the
lingua franca for EXPORT to other GIS systems, so this module
generates the textbook encoding as pure integer SQL, identical in
Spark (shiftright builtin) and DuckDB (>> operator): lat/lon
quantized to 2^k grids, bits interleaved lon-first, 5-bit groups
mapped through the base32 alphabet. No loops at runtime — the
interleave unrolls into a generated expression exactly like the h32
polynomial (hashing.py), so the whole thing is one codegen
projection.

Pinned against the published test vectors (Wikipedia's ezs42 etc.)
and a pure-Python textbook reference in tests.

Boundary semantics: the index is floor-quantized (like
cells.cell_sql); a coordinate within ~1 ulp of a cell boundary can
land one cell off from an exact-bisection implementation (the
floating-point product rounds before the floor). Both engines here
agree bit-for-bit with each other; only adversarially
boundary-adjacent inputs can differ from other libraries, the
inherent trade-off of any closed-form grid codec.
"""

from __future__ import annotations

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_sql(lat_expr: str, lon_expr: str, precision: int = 7,
                dialect: str = "spark") -> str:
    """SQL expression: geohash string of `precision` chars.

    total bits = 5 * precision; lon gets ceil(n/2), lat floor(n/2)
    (interleave starts with lon — the standard)."""
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    # e-notation literals: plain decimals are DECIMAL-typed in DuckDB
    # (the documented literal trap, cells.py); same quantization shape
    # as cells.cell_sql, clamped BOTH ends so out-of-range inputs land
    # in the edge cells instead of indexing the alphabet negatively
    lon_idx = (f"CAST(floor((({lon_expr}) + 1.8e2) / 3.6e2 "
               f"* {1 << lon_bits}) AS BIGINT)")
    lat_idx = (f"CAST(floor((({lat_expr}) + 9e1) / 1.8e2 "
               f"* {1 << lat_bits}) AS BIGINT)")
    lon_idx = f"GREATEST(LEAST({lon_idx}, {(1 << lon_bits) - 1}), 0)"
    lat_idx = f"GREATEST(LEAST({lat_idx}, {(1 << lat_bits) - 1}), 0)"

    def shr(e, k):
        if k == 0:
            return e
        return (f"shiftright({e}, {k})" if dialect == "spark"
                else f"(({e}) >> {k})")

    # bit i of the interleaved stream (MSB first): even i -> lon,
    # odd i -> lat
    def bit(i):
        if i % 2 == 0:
            src, width = "__lon", lon_bits
            pos = width - 1 - (i // 2)
        else:
            src, width = "__lat", lat_bits
            pos = width - 1 - (i // 2)
        return f"({shr(src, pos)} % 2)"

    chars = []
    for c in range(precision):
        terms = [f"({bit(c * 5 + j)} * {1 << (4 - j)})" for j in range(5)]
        idx = " + ".join(terms)
        chars.append(f"substring('{BASE32}', CAST({idx} AS INT) + 1, 1)")
    concat = " || ".join(chars)
    if dialect == "duckdb":
        # correlated scalar subquery binds the indexes once per row
        return (f"(SELECT {concat} FROM (SELECT {lon_idx} AS __lon, "
                f"{lat_idx} AS __lat))")
    # Spark: substitute the index expressions textually (Catalyst
    # subexpression elimination collapses the duplicates)
    return (concat.replace("__lon", f"({lon_idx})")
            .replace("__lat", f"({lat_idx})"))


def geohash_reference(lat: float, lon: float, precision: int = 7) -> str:
    """Textbook bisection geohash (the pytest oracle)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits, out, even = 0, [], True
    ch = 0
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = ch * 2 + 1
                lon_lo = mid
            else:
                ch = ch * 2
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = ch * 2 + 1
                lat_lo = mid
            else:
                ch = ch * 2
                lat_hi = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(BASE32[ch])
            bits, ch = 0, 0
    return "".join(out)
