"""CRS reprojection (ST_TRANSFORM / ST_SETSRID analog), pure numpy.

The reference reprojects layers into a per-zone UTM CRS chosen from
the envelope centre (Data.groovy:370-372) and back
(Transform.groovy:231 etc. via H2GIS ST_TRANSFORM). The engine's
default stance is to stay in EPSG:4326 + cells (SURVEY.md §7.1), but
metric operations (areas, buffers, lengths in meters) need a
projection, so this module provides:

- :func:`utm_epsg` — the reference's UTM zone pick from lon/lat,
- :func:`project_utm` / :func:`unproject_utm` — WGS84 <-> UTM
  transverse Mercator (Karney/Krüger series, standard public
  formulas, sub-mm accuracy within a zone),
- :func:`to_mercator` / :func:`from_mercator` — EPSG:3857.

All functions are vectorized over numpy arrays and safe inside pandas
UDFs. No pyproj dependency.
"""

from __future__ import annotations

import numpy as np

# WGS84 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257223563
_K0 = 0.9996
_E2 = _F * (2 - _F)

# third flattening + Krüger alpha series (to n^4, sub-mm in-zone)
_N = _F / (2 - _F)
_ALPHA = (
    _N / 2 - 2 * _N ** 2 / 3 + 5 * _N ** 3 / 16 + 41 * _N ** 4 / 180,
    13 * _N ** 2 / 48 - 3 * _N ** 3 / 5 + 557 * _N ** 4 / 1440,
    61 * _N ** 3 / 240 - 103 * _N ** 4 / 140,
    49561 * _N ** 4 / 161280,
)
_BETA = (
    _N / 2 - 2 * _N ** 2 / 3 + 37 * _N ** 3 / 96 - _N ** 4 / 360,
    _N ** 2 / 48 + _N ** 3 / 15 - 437 * _N ** 4 / 1440,
    17 * _N ** 3 / 480 - 37 * _N ** 4 / 840,
    4397 * _N ** 4 / 161280,
)
_A_HAT = _A / (1 + _N) * (1 + _N ** 2 / 4 + _N ** 4 / 64)


def utm_epsg(lat, lon) -> np.ndarray:
    """EPSG code of the UTM zone containing each point (326xx/327xx) —
    the reference's per-zone CRS pick (Data.groovy:370-372)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    zone = (np.floor((lon + 180.0) / 6.0).astype(np.int64) % 60) + 1
    return np.where(lat >= 0, 32600 + zone, 32700 + zone)


def _utm_lon0(epsg) -> np.ndarray:
    zone = np.asarray(epsg, dtype=np.int64) % 100
    return (zone - 1) * 6.0 - 180.0 + 3.0


def valid_utm_epsg(epsg) -> np.ndarray:
    """Bool mask: EPSG codes in the UTM WGS84 families (326xx/327xx,
    zone 1..60). The reference's processes reject epsg <= -1 by
    returning false (TransformTest.groovy bad* cases)."""
    e = np.asarray(epsg, dtype=np.int64)
    fam = e // 100
    zone = e % 100
    return ((fam == 326) | (fam == 327)) & (zone >= 1) & (zone <= 60)


def project_utm(lat, lon, epsg) -> tuple[np.ndarray, np.ndarray]:
    """WGS84 degrees -> UTM easting/northing meters for the given EPSG
    (scalar or per-point array). Invalid EPSG codes yield NaN
    coordinates (negative-path contract: empty/absent, never garbage
    meters)."""
    bad = ~valid_utm_epsg(epsg)
    if np.any(bad):
        lat = np.where(bad, np.nan, np.asarray(lat, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lon0 = np.radians(_utm_lon0(epsg))
    south = (np.asarray(epsg, dtype=np.int64) // 100) % 10 == 7

    # conformal latitude
    e = np.sqrt(_E2)
    t = np.sinh(np.arctanh(np.sin(lat)) - e * np.arctanh(e * np.sin(lat)))
    xi_p = np.arctan2(t, np.cos(lon - lon0))
    eta_p = np.arcsinh(np.sin(lon - lon0) / np.hypot(t, np.cos(lon - lon0)))

    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)

    easting = _K0 * _A_HAT * eta + 500000.0
    northing = _K0 * _A_HAT * xi + np.where(south, 10000000.0, 0.0)
    return easting, northing


def unproject_utm(easting, northing, epsg) -> tuple[np.ndarray, np.ndarray]:
    """UTM meters -> WGS84 degrees (inverse Krüger series)."""
    easting = np.asarray(easting, dtype=np.float64)
    northing = np.asarray(northing, dtype=np.float64)
    south = (np.asarray(epsg, dtype=np.int64) // 100) % 10 == 7
    lon0 = np.radians(_utm_lon0(epsg))

    xi = (northing - np.where(south, 10000000.0, 0.0)) / (_K0 * _A_HAT)
    eta = (easting - 500000.0) / (_K0 * _A_HAT)

    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)

    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    # conformal -> geodetic latitude fixed point:
    # sin(chi) = tanh(artanh(sin lat) - e artanh(e sin lat))
    lat = chi.copy()
    e = np.sqrt(_E2)
    for _ in range(8):
        t = np.arctanh(np.sin(chi)) + e * np.arctanh(e * np.sin(lat))
        lat = np.arcsin(np.tanh(t))
    lon = lon0 + np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.degrees(lat), np.degrees(lon)


def transform_geom(g, epsg: int, inverse: bool = False):
    """Reproject a tagged-tuple geometry between EPSG:4326 (x=lon,
    y=lat) and the given UTM EPSG (x=easting, y=northing) — the
    ST_TRANSFORM step of the reference's per-zone layer export
    (Data.groovy:370-372 picks the zone's UTM EPSG,
    Transform.groovy:231 reprojects every output geometry). Vectorized
    per ring/line via project_utm/unproject_utm; safe inside the layer
    builders' existing Arrow stage (no extra Python stage needed).
    """
    tag, body = g

    def _xy(arr):
        a = np.asarray(arr, dtype=np.float64)
        if inverse:
            lat, lon = unproject_utm(a[:, 0], a[:, 1], epsg)
            return np.column_stack([lon, lat])
        e, n = project_utm(a[:, 1], a[:, 0], epsg)
        return np.column_stack([e, n])

    if tag == "Point":
        return (tag, tuple(_xy(np.asarray(body, dtype=np.float64)
                               .reshape(1, 2))[0]))
    if tag == "LineString":
        return (tag, _xy(body))
    if tag == "Polygon":
        return (tag, [_xy(r) for r in body])
    if tag in ("MultiPoint", "MultiPolygon", "MultiLineString",
               "GeometryCollection"):
        return (tag, [transform_geom(sub, epsg, inverse) for sub in body])
    raise ValueError(f"transform_geom: unsupported geometry {tag!r}")


def to_mercator(lat, lon) -> tuple[np.ndarray, np.ndarray]:
    """WGS84 -> EPSG:3857 web-mercator meters."""
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.06, 85.06)
    lon = np.asarray(lon, dtype=np.float64)
    x = _A * np.radians(lon)
    y = _A * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def from_mercator(x, y) -> tuple[np.ndarray, np.ndarray]:
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / _A)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / _A)) - np.pi / 2.0)
    return lat, lon
