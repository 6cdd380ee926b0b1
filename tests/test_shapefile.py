"""Shapefile source parity: the pure-python .shp/.dbf reader must
behave exactly like the GeoJSON/GPKG readers (same feature contract,
same goldens, same error paths).  Reference reads shapefiles via fiona
(tests/integration/test_intersections_from_intersection.py:29-37)."""

import numpy as np
import pytest

import pandarus_spark as ps
from pandarus_spark.geometry import geom as G
from pandarus_spark.sources.shapefile import (
    _group_polygon_rings, _read_dbf, _read_shp, read_shapefile,
    write_features_shapefile,
)
from pandarus_spark.sources.pages import extract_features, pages_df
from tests.conftest import GOLDEN_GRID_SQUARE


def _write_fixture_shp(spark, tmp_path, name):
    feats = extract_features(pages_df(spark, name), validate_unique=False)
    return write_features_shapefile(feats, str(tmp_path / f"{name}.shp"))


def test_shp_dbf_roundtrip(spark, tmp_path):
    p = _write_fixture_shp(spark, tmp_path, "grid")
    geoms = _read_shp(p)
    attrs = _read_dbf(str(tmp_path / "grid.dbf"))
    assert len(geoms) == len(attrs) == 4
    assert {a["name"] for a in attrs} == {f"grid cell {i}" for i in range(4)}
    for g in geoms:
        assert g["type"] in ("Polygon", "MultiPolygon")


def test_read_shapefile_contract(spark, tmp_path):
    p = _write_fixture_shp(spark, tmp_path, "grid")
    rows = {r["label"]: r for r in read_shapefile(spark, p).collect()}
    assert set(rows) == {f"grid cell {i}" for i in range(4)}
    assert all(r["kind"] == "polygon" and r["is_rect"] for r in rows.values())
    # .prj written as WGS84 → no reprojection applied
    assert rows["grid cell 0"]["minx"] == pytest.approx(0.0)


def test_shapefile_duplicate_labels_raise(spark, tmp_path):
    p = _write_fixture_shp(spark, tmp_path, "duplicates")
    with pytest.raises(ValueError, match="duplicate"):
        read_shapefile(spark, p)


def test_shapefile_intersect_matches_goldens(spark, tmp_path):
    square = read_shapefile(spark, _write_fixture_shp(spark, tmp_path, "square"))
    grid = read_shapefile(spark, _write_fixture_shp(spark, tmp_path, "grid"))
    out = {(r["from_label"], r["to_label"]): r["measure"]
           for r in ps.intersect(square, grid).collect()}
    for (g_lab, s_lab), golden in GOLDEN_GRID_SQUARE.items():
        assert out[(s_lab, g_lab)] == pytest.approx(golden, rel=1e-9)


def test_lines_and_points_shapes(spark, tmp_path):
    for name, kinds in (("lines", {"line"}), ("points", {"point"})):
        p = _write_fixture_shp(spark, tmp_path, name)
        feats = read_shapefile(spark, p)
        assert {r["kind"] for r in feats.collect()} == kinds
    # lines×grid through the overlay still hit the reference behavior
    lines = read_shapefile(spark, str(tmp_path / "lines.shp"))
    grid = read_shapefile(spark, _write_fixture_shp(spark, tmp_path, "grid"))
    assert ps.intersect(lines, grid).count() == 4


def test_polygon_ring_grouping_with_holes():
    ext = np.array([[0, 0], [0, 4], [4, 4], [4, 0], [0, 0]], dtype=float)  # CW
    hole = np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], dtype=float)  # CCW
    ext2 = np.array([[10, 0], [10, 2], [12, 2], [12, 0], [10, 0]], dtype=float)  # CW
    g = _group_polygon_rings([ext, hole, ext2])
    assert g["type"] == "MultiPolygon"
    by_area = sorted(g["coordinates"], key=lambda p: -G.polygon_area(p))
    assert len(by_area[0]) == 2  # ext + its hole
    assert G.polygon_area(by_area[0]) == pytest.approx(15.0)
    assert G.polygon_area(by_area[1]) == pytest.approx(4.0)


def test_read_vector_dispatch_shp(spark, tmp_path):
    p = _write_fixture_shp(spark, tmp_path, "grid")
    feats = ps.read_vector(spark, p)
    assert feats.count() == 4


def test_prj_crs_detection(spark, tmp_path):
    p = _write_fixture_shp(spark, tmp_path, "square")
    # overwrite .prj with a UTM 31N WKT; stored coords are WGS84 so the
    # reader would now (wrongly for this data) reproject — we only
    # check the detection plumbing resolves the right registry entry
    with open(str(tmp_path / "square.prj"), "w") as f:
        f.write('PROJCS["WGS_1984_UTM_Zone_31N",GEOGCS["GCS_WGS_1984"...]')
    from pandarus_spark.sources.shapefile import _crs_from_prj
    assert _crs_from_prj(p) == "EPSG:32631"
    with open(str(tmp_path / "square.prj"), "w") as f:
        f.write('PROJCS["Mystery_Projection_42"]')
    with pytest.raises(ValueError, match="pass crs="):
        _crs_from_prj(p)


def test_missing_dbf_raises(spark, tmp_path):
    p = _write_fixture_shp(spark, tmp_path, "grid")
    import os
    os.remove(str(tmp_path / "grid.dbf"))
    with pytest.raises(FileNotFoundError, match="attribute table"):
        read_shapefile(spark, p)


def test_repair_flag_through_reader(spark, tmp_path):
    """A bowtie polygon ingested with repair=True becomes a valid
    MultiPolygon with the even-odd area."""
    import json as _json
    bow = {"type": "Feature",
           "geometry": {"type": "Polygon", "coordinates": [
               [[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]]]},
           "properties": {"name": "bow"}}
    p = str(tmp_path / "bow.geojson")
    with open(p, "w") as f:
        _json.dump({"type": "FeatureCollection", "features": [bow]}, f)
    from pandarus_spark.sources.geojson import read_geojson
    plain = read_geojson(spark, p).collect()[0]
    fixed = read_geojson(spark, p, repair=True).collect()[0]
    g_plain = G.wkb_loads(bytes(plain["geom_wkb"]))
    g_fixed = G.wkb_loads(bytes(fixed["geom_wkb"]))
    assert g_plain["type"] == "Polygon"
    assert g_fixed["type"] == "MultiPolygon"
    assert sum(G.polygon_area(part) for part in g_fixed["coordinates"]) == \
        pytest.approx(2.0, rel=1e-12)


def test_overlong_labels_refused(spark, tmp_path):
    feats = extract_features(pages_df(spark, "long", features=[
        {"name": "x" * 300, "geometry": {"type": "Polygon", "coordinates": [np.array(
            [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]])]}}]),
        validate_unique=False)
    with pytest.raises(ValueError, match="254"):
        write_features_shapefile(feats, str(tmp_path / "long.shp"))


ESRI_TMERC_WKT = (
    'PROJCS["Custom_TM_9E",GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
    'SPHEROID["WGS_1984",6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],'
    'UNIT["Degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],'
    'PARAMETER["False_Easting",500000.0],PARAMETER["False_Northing",200000.0],'
    'PARAMETER["Central_Meridian",9.0],PARAMETER["Scale_Factor",0.9996],'
    'PARAMETER["Latitude_Of_Origin",10.0],UNIT["Meter",1.0]]')

WKT2_LAEA = (
    'PROJCRS["Custom LAEA",BASEGEOGCRS["ETRS89",DATUM["ETRS89",'
    'ELLIPSOID["GRS 1980",6378137,298.257222101]]],CONVERSION["LAEA",'
    'METHOD["Lambert Azimuthal Equal Area"],'
    'PARAMETER["Latitude of natural origin",52],'
    'PARAMETER["Longitude of natural origin",10],'
    'PARAMETER["False easting",4321000],PARAMETER["False northing",3210000]]]')


def test_prj_generic_projcs_wkt_to_proj4(spark, tmp_path):
    """PROJCS WKT with explicit parameters (no recognizable name) must
    resolve through the generic parser into a PROJ4 string that the CRS
    registry dispatches — ESRI WKT1 and OGC WKT2 spellings both."""
    import numpy as np

    from pandarus_spark.geometry.projection import from_wgs84, to_wgs84
    from pandarus_spark.sources.shapefile import _crs_from_prj

    p = _write_fixture_shp(spark, tmp_path, "square")
    with open(str(tmp_path / "square.prj"), "w") as f:
        f.write(ESRI_TMERC_WKT)
    crs = _crs_from_prj(p)
    assert crs.startswith("+proj=tmerc")
    x, y = from_wgs84(np.array([9.0]), np.array([10.0]), crs)
    assert x[0] == pytest.approx(500_000.0, abs=1e-6)
    assert y[0] == pytest.approx(200_000.0, abs=1e-6)

    with open(str(tmp_path / "square.prj"), "w") as f:
        f.write(WKT2_LAEA)
    crs = _crs_from_prj(p)
    assert crs.startswith("+proj=laea")
    # parameter-for-parameter the EPSG:3035 definition
    xa, ya = from_wgs84(np.array([10.0, -5.0]), np.array([52.0, 60.0]), crs)
    xb, yb = from_wgs84(np.array([10.0, -5.0]), np.array([52.0, 60.0]), "EPSG:3035")
    assert np.allclose(xa, xb, atol=1e-9) and np.allclose(ya, yb, atol=1e-9)
    lo, la = to_wgs84(xa, ya, crs)
    assert np.allclose(lo, [10.0, -5.0], atol=1e-9)

    # a projected WKT whose GEOGCS mentions WGS84 must NOT fall back to
    # the geographic EPSG:4326 detection (ordering hazard)
    assert _crs_from_prj(p) != "EPSG:4326"


def test_prj_generic_wkt_error_paths(spark, tmp_path):
    from pandarus_spark.sources.shapefile import _crs_from_prj

    p = _write_fixture_shp(spark, tmp_path, "square")
    with open(str(tmp_path / "square.prj"), "w") as f:
        f.write(ESRI_TMERC_WKT.replace('SPHEROID["WGS_1984"', 'SPHEROID["Clarke_1866"'))
    with pytest.raises(ValueError, match="unsupported spheroid"):
        _crs_from_prj(p)
    with open(str(tmp_path / "square.prj"), "w") as f:
        f.write(ESRI_TMERC_WKT.replace('UNIT["Meter",1.0]',
                                       'UNIT["Foot_US",0.3048006096012192]'))
    with pytest.raises(ValueError, match="non-metre"):
        _crs_from_prj(p)
    # an unimplemented projection with full params still raises the
    # pass-crs= message rather than misdetecting
    with open(str(tmp_path / "square.prj"), "w") as f:
        f.write(ESRI_TMERC_WKT.replace("Transverse_Mercator", "Sinusoidal"))
    with pytest.raises(ValueError, match="pass crs="):
        _crs_from_prj(p)


def test_shapefile_projected_prj_ingest_matches_goldens(spark, tmp_path):
    """End to end: a shapefile stored in a custom tmerc CRS with only a
    parameterized .prj on disk must hit the WGS84 overlay goldens."""
    import numpy as np

    import pandarus_spark as ps
    from pandarus_spark.geometry.projection import from_wgs84
    from pandarus_spark.sources.pages import pages_df, extract_features
    from pandarus_spark.sources.shapefile import read_shapefile, write_features_shapefile

    from pandarus_spark.geometry.geom import wkb_dumps

    crs = "+proj=tmerc +lat_0=10 +lon_0=9 +k=0.9996 +x_0=500000 +y_0=200000 +ellps=WGS84"
    sq = {"type": "Polygon",
          "coordinates": [np.column_stack(from_wgs84(
              np.array([0.5, 1.5, 1.5, 0.5, 0.5]),
              np.array([0.5, 0.5, 1.5, 1.5, 0.5]), crs))]}
    src = spark.createDataFrame(
        [(0, "single", bytearray(wkb_dumps(sq)))],
        "feature_id long, label string, geom_wkb binary")
    path = write_features_shapefile(src, str(tmp_path / "proj_square.shp"))
    with open(str(tmp_path / "proj_square.prj"), "w") as f:
        f.write(ESRI_TMERC_WKT)
    square = read_shapefile(spark, path)
    grid = extract_features(pages_df(spark, "grid"))
    out = {(r["from_label"], r["to_label"]): r["measure"]
           for r in ps.intersect(square, grid).collect()}
    assert len(out) == 4
    for (_, g_lab), m in out.items():
        want = 3097719886.0413523 if g_lab in ("grid cell 0", "grid cell 2") \
            else 3097248058.207057
        # 1e-7: the WGS84→tmerc→WGS84 round trip through the Snyder
        # series with a lat_0 false-northing fold carries ~2e-8 relative
        # area truncation (vs 1e-2 in the reference's analytic tests)
        assert m == pytest.approx(want, rel=1e-7)


def test_prj_albers_wkt_detection(spark, tmp_path):
    """ESRI Albers WKT with standard parallels resolves through the
    generic parser onto the aea kernel == EPSG:5070."""
    import numpy as np

    from pandarus_spark.geometry.projection import from_wgs84
    from pandarus_spark.sources.shapefile import _crs_from_prj

    wkt = (
        'PROJCS["NAD_1983_Contiguous_USA_Albers",GEOGCS["GCS_North_American_1983",'
        'DATUM["D_North_American_1983",SPHEROID["GRS_1980",6378137.0,298.257222101]],'
        'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Albers"],PARAMETER["False_Easting",0.0],'
        'PARAMETER["False_Northing",0.0],PARAMETER["Central_Meridian",-96.0],'
        'PARAMETER["Standard_Parallel_1",29.5],PARAMETER["Standard_Parallel_2",45.5],'
        'PARAMETER["Latitude_Of_Origin",23.0],UNIT["Meter",1.0]]')
    p = _write_fixture_shp(spark, tmp_path, "square")
    with open(str(tmp_path / "square.prj"), "w") as f:
        f.write(wkt)
    crs = _crs_from_prj(p)
    assert crs.startswith("+proj=aea")
    lon = np.array([-100.0, -80.5]); lat = np.array([30.0, 44.0])
    xa, ya = from_wgs84(lon, lat, crs)
    xb, yb = from_wgs84(lon, lat, "EPSG:5070")
    assert np.allclose(xa, xb, atol=1e-9) and np.allclose(ya, yb, atol=1e-9)


def test_prj_review_fix_regressions(spark, tmp_path):
    """Round-2 review findings on the WKT front-end: WKT2 false-origin
    parameters must be honored (not silently zeroed), GDAL-style WKTs
    with AUTHORITY nodes after a foot unit must be rejected, a bare
    '3857' substring must not hijack detection, unrecognized parameters
    must raise, and repeating-decimal parameters survive exactly."""
    import numpy as np

    from pandarus_spark.geometry.projection import from_wgs84
    from pandarus_spark.sources.shapefile import _crs_from_prj, _proj4_from_projcs_wkt

    p = _write_fixture_shp(spark, tmp_path, "square")

    def put(wkt):
        with open(str(tmp_path / "square.prj"), "w") as f:
            f.write(wkt)

    # WKT2 Albers with false-origin parameter names == EPSG:5070
    put('PROJCRS["Conus Albers",BASEGEOGCRS["NAD83",DATUM["NAD83",'
        'ELLIPSOID["GRS 1980",6378137,298.257222101]]],CONVERSION["Albers",'
        'METHOD["Albers Equal Area"],'
        'PARAMETER["Latitude of false origin",23],'
        'PARAMETER["Longitude of false origin",-96],'
        'PARAMETER["Latitude of 1st standard parallel",29.5],'
        'PARAMETER["Latitude of 2nd standard parallel",45.5],'
        'PARAMETER["Easting at false origin",0],'
        'PARAMETER["Northing at false origin",0]]]')
    crs = _crs_from_prj(p)
    lon = np.array([-100.0, -80.5]); lat = np.array([30.0, 44.0])
    xa, ya = from_wgs84(lon, lat, crs)
    xb, yb = from_wgs84(lon, lat, "EPSG:5070")
    assert np.allclose(xa, xb, atol=1e-9) and np.allclose(ya, yb, atol=1e-9)

    # GDAL WKT1 with trailing AUTHORITY after a US-survey-foot unit
    put(ESRI_TMERC_WKT.replace(
        'UNIT["Meter",1.0]',
        'UNIT["US survey foot",0.3048006096012192,'
        'AUTHORITY["EPSG","9003"]],AUTHORITY["EPSG","2240"'))
    with pytest.raises(ValueError, match="non-metre"):
        _crs_from_prj(p)

    # a False_Northing containing 3857 must not detect as web mercator
    put(ESRI_TMERC_WKT.replace('PARAMETER["False_Northing",200000.0]',
                               'PARAMETER["False_Northing",3857000.0]'))
    crs = _crs_from_prj(p)
    assert crs.startswith("+proj=tmerc") and "+y_0=3857000" in crs

    # unrecognized parameter: refuse rather than silently drop
    put(ESRI_TMERC_WKT.replace('PARAMETER["Scale_Factor",0.9996]',
                               'PARAMETER["Rectified_Grid_Angle",12.0]'))
    with pytest.raises(ValueError, match="unrecognized projection parameter"):
        _crs_from_prj(p)

    # repeating-decimal meridian preserved exactly through the rebuild
    wkt = ESRI_TMERC_WKT.replace('PARAMETER["Central_Meridian",9.0]',
                                 'PARAMETER["Central_Meridian",-84.16666666666667]')
    crs = _proj4_from_projcs_wkt(wkt)
    assert "+lon_0=-84.16666666666667" in crs


def test_prj_lcc_wkt_detection(spark, tmp_path):
    """ESRI Lambert_Conformal_Conic WKT resolves onto the lcc kernel
    with Lambert-93 parameters."""
    import numpy as np

    from pandarus_spark.geometry.projection import from_wgs84
    from pandarus_spark.sources.shapefile import _crs_from_prj

    wkt = (
        'PROJCS["RGF93_Lambert_93",GEOGCS["GCS_RGF_1993",DATUM["D_RGF_1993",'
        'SPHEROID["GRS_1980",6378137.0,298.257222101]],PRIMEM["Greenwich",0.0],'
        'UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Lambert_Conformal_Conic"],'
        'PARAMETER["False_Easting",700000.0],'
        'PARAMETER["False_Northing",6600000.0],'
        'PARAMETER["Central_Meridian",3.0],'
        'PARAMETER["Standard_Parallel_1",49.0],'
        'PARAMETER["Standard_Parallel_2",44.0],'
        'PARAMETER["Latitude_Of_Origin",46.5],UNIT["Meter",1.0]]')
    p = _write_fixture_shp(spark, tmp_path, "square")
    with open(str(tmp_path / "square.prj"), "w") as f:
        f.write(wkt)
    crs = _crs_from_prj(p)
    assert crs.startswith("+proj=lcc")
    x, y = from_wgs84(np.array([2.3522]), np.array([48.8566]), crs)
    assert x[0] == pytest.approx(652_469.0, abs=1.0)
    assert y[0] == pytest.approx(6_862_035.3, abs=1.0)


def test_prj_utm_hemisphere_not_flipped_by_stray_south(tmp_path):
    """'south' outside the zone name (WKT2 AREA text, datum names) must
    not flip a northern zone to EPSG:327xx (round-2 advice)."""
    from pandarus_spark.sources.shapefile import _crs_from_prj
    p = str(tmp_path / "x.shp")
    wkt2 = ('PROJCRS["WGS 84 / UTM zone 17N",'
            'BASEGEOGCRS["WGS 84",DATUM["World Geodetic System 1984",'
            'ELLIPSOID["WGS 84",6378137,298.257223563]]],'
            'CONVERSION["UTM zone 17N",METHOD["Transverse Mercator"]],'
            'USAGE[SCOPE["Engineering survey."],AREA["South Carolina"]]]')
    with open(str(tmp_path / "x.prj"), "w") as f:
        f.write(wkt2)
    assert _crs_from_prj(p) == "EPSG:32617"
    # but 'south' IN the zone name (no N/S suffix) still resolves south
    with open(str(tmp_path / "x.prj"), "w") as f:
        f.write('PROJCS["WGS_1984_UTM_zone_17 south",'
                'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
                'SPHEROID["WGS_1984",6378137,298.257223563]]],'
                'PROJECTION["Transverse_Mercator"]]')
    assert _crs_from_prj(p) == "EPSG:32717"


def test_prj_utm_shortcut_enforces_spheroid_gate(tmp_path):
    """A NAD27 (Clarke 1866) UTM .prj must raise, not silently resolve
    to the WGS84 EPSG:326xx kernels (round-2 advice)."""
    import pytest

    from pandarus_spark.sources.shapefile import _crs_from_prj
    p = str(tmp_path / "x.shp")
    with open(str(tmp_path / "x.prj"), "w") as f:
        f.write('PROJCS["NAD_1927_UTM_Zone_17N",'
                'GEOGCS["GCS_North_American_1927",'
                'DATUM["D_North_American_1927",'
                'SPHEROID["Clarke_1866",6378206.4,294.978698213898]]],'
                'PROJECTION["Transverse_Mercator"]]')
    with pytest.raises(ValueError, match="spheroid"):
        _crs_from_prj(p)
    # GRS80 (NAD83) UTM is kernel-identical to WGS84 — allowed through
    with open(str(tmp_path / "x.prj"), "w") as f:
        f.write('PROJCS["NAD_1983_UTM_Zone_17N",'
                'GEOGCS["GCS_North_American_1983",'
                'DATUM["D_North_American_1983",'
                'SPHEROID["GRS_1980",6378137,298.257222101]]],'
                'PROJECTION["Transverse_Mercator"]]')
    assert _crs_from_prj(p) == "EPSG:32617"
