"""CRS reprojection tests (ST_TRANSFORM parity, Data.groovy:370-372)."""

from __future__ import annotations

import numpy as np
import pytest

from sparkspatial import crs


def test_utm_epsg_pick():
    # the reference picks the UTM zone from the envelope centre
    got = crs.utm_epsg(np.array([48.85, -33.87, 0.0]),
                       np.array([2.35, 151.21, -180.0]))
    assert list(got) == [32631, 32756, 32601]


def test_utm_known_points():
    # equator on the zone-31 central meridian: by definition E=500000 N=0
    e, n = crs.project_utm(np.array([0.0]), np.array([3.0]),
                           np.array([32631]))
    assert abs(e[0] - 500000.0) < 1e-6 and abs(n[0]) < 1e-6
    # Paris (published UTM31N ~ E452482 N5411717, meter-level)
    e, n = crs.project_utm(np.array([48.8566]), np.array([2.3522]),
                           np.array([32631]))
    assert abs(e[0] - 452482.5) < 2.0 and abs(n[0] - 5411717.2) < 2.0
    # Sydney, southern hemisphere false northing
    e, n = crs.project_utm(np.array([-33.8688]), np.array([151.2093]),
                           np.array([32756]))
    assert abs(e[0] - 334368.6) < 2.0 and abs(n[0] - 6250948.3) < 2.0


def test_utm_roundtrip_submm():
    rng = np.random.RandomState(7)
    lat = rng.uniform(-79, 83, 200)
    lon = rng.uniform(-179.9, 179.9, 200)
    epsg = crs.utm_epsg(lat, lon)
    e, n = crs.project_utm(lat, lon, epsg)
    lat2, lon2 = crs.unproject_utm(e, n, epsg)
    err_m = np.abs(lat2 - lat) * 110574 + np.abs(lon2 - lon) * 111320
    assert err_m.max() < 1e-3  # sub-mm


def test_mercator_roundtrip():
    lat = np.array([48.8566, -33.8688, 0.0])
    lon = np.array([2.3522, 151.2093, 0.0])
    x, y = crs.to_mercator(lat, lon)
    lat2, lon2 = crs.from_mercator(x, y)
    assert np.abs(lat2 - lat).max() < 1e-9
    assert np.abs(lon2 - lon).max() < 1e-9
    # spot value: x = R * radians(lon)
    assert abs(x[2]) < 1e-9 and abs(y[2]) < 1e-9
