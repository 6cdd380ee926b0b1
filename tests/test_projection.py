"""Mollweide fidelity vs the reference's stored goldens
(/root/reference/tests/data/i_result.json via FIXTURES.md §4)."""

import numpy as np
import pytest

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


def test_utm_roundtrip_all_zone_quadrants():
    from pandarus_spark.geometry.projection import from_wgs84, to_wgs84 as inv
    rng = np.random.default_rng(3)
    for crs, lon_lo, lat_lo, lat_hi in [("EPSG:32631", 0.0, 0.0, 80.0),
                                        ("EPSG:32733", 12.0, -75.0, 0.0),
                                        ("EPSG:32601", -180.0, 0.0, 80.0),
                                        ("EPSG:32760", 174.0, -75.0, 0.0)]:
        lon = rng.uniform(lon_lo + 0.05, lon_lo + 5.95, 300)
        lat = rng.uniform(lat_lo + 0.5, lat_hi - 0.5, 300)
        x, y = from_wgs84(lon, lat, crs)
        lon2, lat2 = inv(x, y, crs)
        assert np.allclose(lon2, lon, atol=2e-8), crs
        assert np.allclose(lat2, lat, atol=2e-8), crs


def test_utm_known_anchors():
    from pandarus_spark.geometry.projection import from_wgs84
    # natural origin of every zone: (lon0, 0) -> (500000, 0) exactly
    x, y = from_wgs84(np.array([3.0]), np.array([0.0]), "EPSG:32631")
    assert x[0] == pytest.approx(500_000.0, abs=1e-6) and abs(y[0]) < 1e-6
    # south zone false northing
    x, y = from_wgs84(np.array([15.0]), np.array([0.0]), "EPSG:32733")
    assert y[0] == pytest.approx(10_000_000.0, abs=1e-6)
    # central-meridian scale factor: 1 deg of latitude from equator along
    # lon0 must measure k0 * meridian_arc
    from pandarus_spark.geometry.projection import _meridian_arc
    x, y = from_wgs84(np.array([3.0]), np.array([1.0]), "EPSG:32631")
    assert y[0] == pytest.approx(0.9996 * float(_meridian_arc(np.radians(1.0))), rel=1e-12)


def test_laea_equal_area_and_roundtrip():
    from pandarus_spark.geometry.geom import ring_area
    from pandarus_spark.geometry.projection import from_wgs84, to_wgs84 as inv
    # origin maps to false origin exactly
    x, y = from_wgs84(np.array([10.0]), np.array([52.0]), "EPSG:3035")
    assert x[0] == pytest.approx(4_321_000.0, abs=1e-6)
    assert y[0] == pytest.approx(3_210_000.0, abs=1e-6)
    rng = np.random.default_rng(4)
    lon = rng.uniform(-10, 30, 500)
    lat = rng.uniform(35, 70, 500)
    x, y = from_wgs84(lon, lat, "EPSG:3035")
    lon2, lat2 = inv(x, y, "EPSG:3035")
    assert np.allclose(lon2, lon, atol=1e-10)
    assert np.allclose(lat2, lat, atol=1e-10)
    # equal-area: two 1-deg boxes at the same latitude, different lon,
    # must project to equal areas
    def area(lon0, lat0):
        box = np.array([[lon0, lat0], [lon0 + 1, lat0], [lon0 + 1, lat0 + 1],
                        [lon0, lat0 + 1], [lon0, lat0]])
        bx, by = from_wgs84(box[:, 0], box[:, 1], "EPSG:3035")
        return abs(ring_area(np.column_stack([bx, by])))
    assert area(0.0, 50.0) == pytest.approx(area(20.0, 50.0), rel=1e-6)


def test_unsupported_crs_raises():
    with pytest.raises(ValueError, match="unsupported CRS"):
        to_wgs84(np.array([0.0]), np.array([0.0]), "EPSG:9999")
    with pytest.raises(ValueError, match="unsupported CRS"):
        to_wgs84(np.array([0.0]), np.array([0.0]), "EPSG:32699")  # zone 99
