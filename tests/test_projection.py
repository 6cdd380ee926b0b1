"""Mollweide fidelity vs the reference's stored goldens
(/root/reference/tests/data/i_result.json via FIXTURES.md §4)."""

import numpy as np

from pandarus_spark.geometry.projection import (
    mollweide_forward, mollweide_inverse, web_mercator_forward,
    web_mercator_inverse, to_wgs84,
)


def _box_area(x0, y0, x1, y1):
    lons = np.array([x0, x1, x1, x0])
    lats = np.array([y0, y0, y1, y1])
    x, y = mollweide_forward(lons, lats)
    return 0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def test_golden_quarter_areas():
    # the four grid×square intersection quarters (i_result.json)
    assert abs(_box_area(0.5, 0.5, 1.0, 1.0) - 3097719886.0413523) / 3097719886.0413523 < 1e-9
    assert abs(_box_area(0.5, 1.0, 1.0, 1.5) - 3097248058.207055) / 3097248058.207055 < 1e-9
    assert abs(_box_area(1.0, 0.5, 1.5, 1.0) - 3097719886.041353) / 3097719886.041353 < 1e-9
    assert abs(_box_area(1.0, 1.0, 1.5, 1.5) - 3097248058.207057) / 3097248058.207057 < 1e-9


def test_inverse_roundtrip():
    lon = np.linspace(-179, 179, 37)
    lat = np.linspace(-89, 89, 37)
    x, y = mollweide_forward(lon, lat)
    lon2, lat2 = mollweide_inverse(x, y)
    assert np.allclose(lon, lon2, atol=1e-9)
    assert np.allclose(lat, lat2, atol=1e-9)


def test_web_mercator_roundtrip():
    lon = np.array([-120.0, 0.0, 3.7, 60.0])
    lat = np.array([-45.0, 0.0, 50.2, 70.0])
    x, y = web_mercator_forward(lon, lat)
    lon2, lat2 = web_mercator_inverse(x, y)
    assert np.allclose(lon, lon2, atol=1e-9)
    assert np.allclose(lat, lat2, atol=1e-9)


def test_to_wgs84_dispatch():
    lon, lat = to_wgs84(np.array([0.0]), np.array([0.0]), "EPSG:3857")
    assert abs(lon[0]) < 1e-12 and abs(lat[0]) < 1e-12
