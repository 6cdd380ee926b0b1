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


def test_proj4_strings_match_epsg_twins():
    """PROJ4 spellings must dispatch onto the exact same kernels as
    their EPSG names (reference accepts any PROJ4 via pyproj,
    utils/projection.py:23-60)."""
    from pandarus_spark.geometry.projection import from_wgs84, to_wgs84 as inv
    cases = [
        ("+proj=utm +zone=31 +datum=WGS84 +units=m +no_defs", "EPSG:32631",
         np.array([4.5, 1.2]), np.array([51.2, 43.0])),
        ("+proj=utm +zone=33 +south +ellps=WGS84", "EPSG:32733",
         np.array([13.5, 16.2]), np.array([-33.9, -8.8])),
        ("+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 "
         "+ellps=GRS80 +units=m +no_defs", "EPSG:3035",
         np.array([10.0, -5.0]), np.array([52.0, 60.0])),
        ("+init=epsg:3857", "EPSG:3857",
         np.array([4.5, -120.0]), np.array([51.2, 33.0])),
    ]
    for p4, epsg, lon, lat in cases:
        xa, ya = from_wgs84(lon, lat, p4)
        xb, yb = from_wgs84(lon, lat, epsg)
        assert np.array_equal(xa, xb) and np.array_equal(ya, yb), p4
        lo, la = inv(xa, ya, p4)
        assert np.allclose(lo, lon, atol=1e-9) and np.allclose(la, lat, atol=1e-9), p4


def test_proj4_tmerc_generic_origin_and_roundtrip():
    """tmerc with a nonzero lat_0 folds the origin's meridian arc into
    the false northing: forward(lon_0, lat_0) == (x_0, y_0) exactly and
    the round trip holds at 1e-9 within the zone."""
    from pandarus_spark.geometry.projection import from_wgs84, to_wgs84 as inv
    p4 = "+proj=tmerc +lat_0=10 +lon_0=9 +k=0.9996 +x_0=500000 +y_0=200000 +ellps=WGS84"
    x, y = from_wgs84(np.array([9.0]), np.array([10.0]), p4)
    assert x[0] == pytest.approx(500_000.0, abs=1e-6)
    assert y[0] == pytest.approx(200_000.0, abs=1e-6)
    lon = np.array([7.2, 11.9]); lat = np.array([5.0, 35.0])
    lo, la = inv(*from_wgs84(lon, lat, p4), p4)
    assert np.allclose(lo, lon, atol=1e-9) and np.allclose(la, lat, atol=1e-9)


def test_proj4_longlat_identity_and_moll():
    from pandarus_spark.geometry.projection import (
        MOLLWEIDE, from_wgs84, mollweide_forward)
    lon = np.array([4.5, -120.0]); lat = np.array([51.2, 33.0])
    lo, la = to_wgs84(lon, lat, "+proj=longlat +ellps=WGS84 +datum=WGS84 +no_defs")
    assert np.array_equal(lo, lon) and np.array_equal(la, lat)
    xm, ym = from_wgs84(lon, lat, MOLLWEIDE)
    xr, yr = mollweide_forward(lon, lat)
    assert np.array_equal(xm, xr) and np.array_equal(ym, yr)


def test_proj4_unsupported_raises():
    from pandarus_spark.geometry.projection import to_wgs84 as inv
    z = np.array([0.0])
    with pytest.raises(ValueError, match="unsupported PROJ4 projection"):
        inv(z, z, "+proj=sinu +lon_0=0")
    with pytest.raises(ValueError, match="unsupported ellipsoid"):
        inv(z, z, "+proj=utm +zone=33 +ellps=clrk66")
    with pytest.raises(ValueError, match="spherical web-Mercator"):
        inv(z, z, "+proj=merc +lon_0=110 +ellps=WGS84")
    with pytest.raises(ValueError, match="moll parameterization"):
        inv(z, z, "+proj=moll +lon_0=90")


def test_albers_roundtrip_origin_and_proj4_twin():
    """EPSG:5070 (Conus Albers, Snyder 14-3..14-12): origin maps to the
    false origin exactly, round-trips over CONUS at 1e-12, and the PROJ4
    spelling dispatches onto the identical kernel."""
    from pandarus_spark.geometry.projection import from_wgs84, to_wgs84 as inv
    x, y = from_wgs84(np.array([-96.0]), np.array([23.0]), "EPSG:5070")
    assert abs(x[0]) < 1e-9 and abs(y[0]) < 1e-9
    rng = np.random.default_rng(11)
    lon = rng.uniform(-125, -66, 500); lat = rng.uniform(24, 50, 500)
    lo, la = inv(*from_wgs84(lon, lat, "EPSG:5070"), "EPSG:5070")
    assert np.allclose(lo, lon, atol=1e-12) and np.allclose(la, lat, atol=1e-12)
    p4 = ("+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 "
          "+x_0=0 +y_0=0 +ellps=GRS80 +units=m +no_defs")
    xa, ya = from_wgs84(lon, lat, p4)
    xb, yb = from_wgs84(lon, lat, "EPSG:5070")
    assert np.array_equal(xa, xb) and np.array_equal(ya, yb)


def test_albers_area_matches_laea():
    """Cross-oracle between two independent ellipsoidal equal-area
    implementations: a densified polygon's area through Albers must
    equal its area through LAEA (the reference's moll is spherical, so
    it is NOT this oracle — see the module header)."""
    from pandarus_spark.geometry.geom import ring_area
    from pandarus_spark.geometry.projection import from_wgs84
    box = np.array([[-100.0, 35.0], [-90.0, 35.0], [-90.0, 42.0], [-100.0, 42.0]])
    t = np.linspace(0, 1, 2001)[:-1]
    dens = np.vstack([np.column_stack([
        box[i, 0] + (box[(i + 1) % 4, 0] - box[i, 0]) * t,
        box[i, 1] + (box[(i + 1) % 4, 1] - box[i, 1]) * t]) for i in range(4)])
    dens = np.vstack([dens, dens[0]])
    ax, ay = from_wgs84(dens[:, 0], dens[:, 1], "EPSG:5070")
    lx, ly = from_wgs84(dens[:, 0], dens[:, 1],
                        "+proj=laea +lat_0=38 +lon_0=-95 +ellps=WGS84")
    a_alb = abs(ring_area(np.column_stack([ax, ay])))
    a_laea = abs(ring_area(np.column_stack([lx, ly])))
    assert a_alb == pytest.approx(a_laea, rel=1e-9)


def test_albers_degenerate_parallels_raise():
    from pandarus_spark.geometry.projection import from_wgs84
    with pytest.raises(ValueError, match="degenerates"):
        from_wgs84(np.array([0.0]), np.array([10.0]),
                   "+proj=aea +lat_1=-10 +lat_2=10")


def test_project_geom_reference_semantics():
    """project_geom mirrors the reference API (utils/projection.py:
    23-60): falsey from_proj → WGS84, to_proj default → Mollweide,
    same-CRS and geographic-geographic short-circuits return the input
    object untouched."""
    from pandarus_spark.geometry.projection import (
        MOLLWEIDE, from_wgs84, mollweide_forward, project_geom)
    sq = {"type": "Polygon", "coordinates": [np.array(
        [[0.5, 0.5], [1.5, 0.5], [1.5, 1.5], [0.5, 1.5], [0.5, 0.5]])]}
    out = project_geom(sq)  # WGS84 -> Mollweide default
    mx, my = mollweide_forward(np.array([0.5]), np.array([0.5]))
    assert np.allclose(out["coordinates"][0][0], [mx[0], my[0]])
    assert project_geom(sq, None, None) is not sq  # projected: new object
    # short-circuits return the SAME object (reference returns geom)
    assert project_geom(sq, "EPSG:4326",
                        "+proj=longlat +ellps=WGS84 +datum=WGS84 +no_defs") is sq
    assert project_geom(sq, MOLLWEIDE, MOLLWEIDE) is sq
    assert project_geom(sq, "", "EPSG:4326") is sq  # falsey from -> WGS84
    # projected -> projected chains through WGS84
    pt = {"type": "Point", "coordinates": np.array(
        from_wgs84(np.array([-96.0]), np.array([40.0]), "EPSG:5070")).reshape(2)}
    back = project_geom(project_geom(pt, "EPSG:5070", "EPSG:3035"),
                        "EPSG:3035", "EPSG:4326")
    assert np.allclose(back["coordinates"], [-96.0, 40.0], atol=1e-9)


def test_proj4_review_fix_regressions():
    """Round-2 review findings on the PROJ4 front-end: NAD83/ETRS89
    datums accepted (GRS80-based — the spellings PROJ emits for
    EPSG:5070/3035), axis overrides and non-Greenwich meridians
    rejected, zero towgs84 tolerated, and project_geom short-circuits
    equal CRS strings."""
    from pandarus_spark.geometry.projection import from_wgs84, project_geom
    lon = np.array([-100.0]); lat = np.array([40.0])
    # canonical PROJ spelling of EPSG:5070
    p5070 = ("+proj=aea +lat_0=23 +lon_0=-96 +lat_1=29.5 +lat_2=45.5 "
             "+x_0=0 +y_0=0 +datum=NAD83 +units=m +no_defs")
    xa, ya = from_wgs84(lon, lat, p5070)
    xb, yb = from_wgs84(lon, lat, "EPSG:5070")
    assert np.array_equal(xa, xb) and np.array_equal(ya, yb)
    # EPSG:2163-style sphere override must raise, not silently use WGS84
    with pytest.raises(ValueError, match="semi-major|sphere|spherical"):
        from_wgs84(lon, lat, "+proj=laea +lat_0=45 +lon_0=-100 +a=6370997 +b=6370997")
    with pytest.raises(ValueError, match="prime meridian"):
        from_wgs84(lon, lat, "+proj=longlat +ellps=WGS84 +pm=paris")
    # all-zero towgs84 (the common WGS84 spelling) is fine
    lo, la = to_wgs84(lon, lat, "+proj=longlat +ellps=WGS84 +towgs84=0,0,0,0,0,0,0")
    assert np.array_equal(lo, lon) and np.array_equal(la, lat)
    with pytest.raises(ValueError, match="towgs84"):
        to_wgs84(lon, lat, "+proj=longlat +ellps=WGS84 +towgs84=100,0,0")
    # same-CRS short-circuit for dynamically resolved CRSs
    pt = {"type": "Point", "coordinates": np.array([500000.0, 4649776.0])}
    assert project_geom(pt, "EPSG:32633", "EPSG:32633") is pt
    assert project_geom(pt, "+proj=utm +zone=33", "+proj=utm +zone=33") is pt


def test_lcc_lambert93_properties():
    """Ellipsoidal Lambert conformal conic (Snyder 15): Lambert-93
    (EPSG:2154 parameters) must round-trip at 1e-12, map the grid
    origin exactly, hold scale exactly 1 along BOTH standard parallels
    (the defining 2SP property), be locally isotropic (conformal), and
    hit the known Paris coordinate to the metre."""
    from pandarus_spark.geometry.projection import (
        WGS84_A, _E2, from_wgs84, to_wgs84 as inv)
    p = ("+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 "
         "+x_0=700000 +y_0=6600000 +ellps=GRS80 +units=m +no_defs")
    rng = np.random.default_rng(8)
    lon = rng.uniform(-5, 9, 500); lat = rng.uniform(41, 51, 500)
    lo, la = inv(*from_wgs84(lon, lat, p), p)
    assert np.allclose(lo, lon, atol=1e-12) and np.allclose(la, lat, atol=1e-12)
    x, y = from_wgs84(np.array([3.0]), np.array([46.5]), p)
    assert x[0] == pytest.approx(700_000.0, abs=1e-6)
    assert y[0] == pytest.approx(6_600_000.0, abs=1e-6)
    for lat_sp in (49.0, 44.0):
        phi = np.radians(lat_sp)
        d = 1e-5
        x1, y1 = from_wgs84(np.array([3.0]), np.array([lat_sp]), p)
        x2, y2 = from_wgs84(np.array([3.0 + d]), np.array([lat_sp]), p)
        chord = float(np.hypot(x2[0] - x1[0], y2[0] - y1[0]))
        true = float(WGS84_A * np.cos(phi) / np.sqrt(1 - _E2 * np.sin(phi) ** 2)
                     * np.radians(d))
        assert chord / true == pytest.approx(1.0, abs=1e-9), lat_sp
    x, y = from_wgs84(np.array([2.3522]), np.array([48.8566]), p)
    assert x[0] == pytest.approx(652_469.0, abs=1.0)
    assert y[0] == pytest.approx(6_862_035.3, abs=1.0)
    # southern cone
    ps = "+proj=lcc +lat_1=-30 +lat_2=-60 +lat_0=-45 +lon_0=170 +ellps=WGS84"
    lon = rng.uniform(160, 180, 300); lat = rng.uniform(-58, -32, 300)
    lo, la = inv(*from_wgs84(lon, lat, ps), ps)
    assert np.allclose(lo, lon, atol=1e-12) and np.allclose(la, lat, atol=1e-12)
    # Belgium/scaled variants refuse rather than mis-project
    with pytest.raises(ValueError, match="scale factor"):
        from_wgs84(lon, lat, "+proj=lcc +lat_1=49 +lat_0=49 +k=0.9996 +ellps=WGS84")


def test_antimeridian_longitude_wrap():
    """(lam - lam0) must wrap into +-pi (PROJ's default): a zone-60 UTM
    feature at lon -179.5 (3.5 deg east of lon_0=177 across the
    antimeridian) must project identically to its +180.5 alias, and the
    same for conic theta = n*(lam - lam0) in aea/lcc and for the plain
    lam in merc/moll."""
    from pandarus_spark.geometry.projection import from_wgs84, mollweide_forward
    cases = [
        ("EPSG:32660", -179.5, 10.0),
        ("+proj=lcc +lat_1=-30 +lat_2=-60 +lat_0=-45 +lon_0=170 +ellps=WGS84",
         -175.0, -45.0),
        ("+proj=aea +lat_1=35 +lat_2=45 +lat_0=40 +lon_0=175 +ellps=WGS84",
         -179.0, 40.0),
        ("EPSG:3857", -170.0, 20.0),
    ]
    for crs, lon, lat in cases:
        x1, y1 = from_wgs84(np.array([lon]), np.array([lat]), crs)
        x2, y2 = from_wgs84(np.array([lon + 360.0]), np.array([lat]), crs)
        assert x1[0] == pytest.approx(x2[0], abs=1e-6), crs
        assert y1[0] == pytest.approx(y2[0], abs=1e-6), crs
    # mollweide_forward is deliberately NOT in the list: it is the
    # MEASURE projection and stays linear in lam so that contiguous
    # >180-lon spans (what projected-CRS inverses return at the
    # antimeridian) measure exactly — see
    # test_lcc_review_fix_regressions for the area-parity assertion.
    xm1, _ = mollweide_forward(np.array([170.0]), np.array([10.0]))
    xm2, _ = mollweide_forward(np.array([190.0]), np.array([10.0]))
    assert xm2[0] > xm1[0]  # linear continuation past 180, no tear


def test_lcc_review_fix_regressions():
    """Second review pass: contiguous >180-lon spans (what projected-CRS
    inverses hand back at the antimeridian) must measure exactly through
    Mollweide; +proj=lcc without lat_1 refuses (PROJ would default to a
    different cone); the pole opposite the LCC cone raises instead of
    emitting NaN/inf."""
    from pandarus_spark.geometry.geom import ring_area
    from pandarus_spark.geometry.projection import from_wgs84, mollweide_forward
    # a 1x1-deg box straddling the antimeridian stored CONTIGUOUSLY
    # (lon 179.5..180.5) must have the same Mollweide area as its
    # within-range twin at the same latitude
    def area(lon0):
        box = np.array([[lon0, 10.0], [lon0 + 1, 10.0], [lon0 + 1, 11.0],
                        [lon0, 11.0], [lon0, 10.0]])
        x, y = mollweide_forward(box[:, 0], box[:, 1])
        return abs(ring_area(np.column_stack([x, y])))
    assert area(179.5) == pytest.approx(area(120.0), rel=1e-9)
    z = np.array([0.0])
    with pytest.raises(ValueError, match="without \\+lat_1"):
        from_wgs84(z, z, "+proj=lcc +lat_0=40 +lat_2=45 +lon_0=-96 +ellps=WGS84")
    with pytest.raises(ValueError, match="pole opposite"):
        from_wgs84(np.array([3.0]), np.array([-90.0]),
                   "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 +ellps=GRS80")
    # the cone-side pole projects cleanly (t -> 0, rho -> 0)
    x, y = from_wgs84(np.array([3.0]), np.array([90.0]),
                      "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 +ellps=GRS80")
    assert np.isfinite(x[0]) and np.isfinite(y[0])
