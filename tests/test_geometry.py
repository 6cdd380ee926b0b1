"""Geometry-kernel semantics ported from the reference's unit suite
(/root/reference/tests/unit/utils/test_geometry.py — per-kind
intersection expectations, measures, border double-count)."""

import numpy as np
import pytest

from pandarus_spark.geometry import geom as G
from pandarus_spark.sources.pages import FIXTURES, _box
from tests.conftest import GOLDEN_GRID_SQUARE, ONE_DEGREE


def test_wkb_roundtrip_all_types():
    geoms = [
        {"type": "Point", "coordinates": np.array([1.5, -2.5])},
        {"type": "LineString", "coordinates": np.array([[0, 0], [1, 1], [2, 0.5]], float)},
        _box(0, 0, 2, 3),
        {"type": "MultiPoint", "coordinates": np.array([[0, 0], [1, 1]], float)},
        {"type": "MultiLineString", "coordinates": [np.array([[0, 0], [1, 1]], float)]},
        {"type": "MultiPolygon", "coordinates": [_box(0, 0, 1, 1)["coordinates"]]},
    ]
    for g in geoms:
        out = G.wkb_loads(G.wkb_dumps(g))
        assert out["type"] == g["type"]
        assert G.bounds(out) == pytest.approx(G.bounds(g))


def test_geometry_collection_wkb():
    gc = {"type": "GeometryCollection", "geometries": [_box(0, 0, 1, 1)]}
    out = G.wkb_loads(G.wkb_dumps(gc))
    assert out["type"] == "GeometryCollection"
    assert G.geom_kind(out) == "polygon"


def test_kind_mapping():
    assert G.geom_kind({"type": "Point", "coordinates": np.zeros(2)}) == "point"
    assert G.geom_kind({"type": "MultiLineString", "coordinates": []}) == "line"
    assert G.geom_kind(_box(0, 0, 1, 1)) == "polygon"


def test_golden_polygon_intersections():
    """grid × square quarters at 1e-9 relative (BASELINE target 1e-6)."""
    square = FIXTURES["square"]()[0]["geometry"]
    for f in FIXTURES["grid"]():
        inter = G.intersection(square, "polygon", f["geometry"])
        assert inter is not None and inter["type"] == "MultiPolygon"
        m = G.measure(inter, "polygon")
        g = GOLDEN_GRID_SQUARE[(f["name"], "single")]
        assert abs(m - g) / g < 1e-9


def test_line_intersections_reference_tolerance():
    """test_intersect.py:359-432 golden lengths at the reference's rtol."""
    grid = {f["name"]: f["geometry"] for f in FIXTURES["grid"]()}
    lines = {f["name"]: f["geometry"] for f in FIXTURES["lines"]()}
    expect = {
        ("A", "grid cell 0"): (62000.0, 1e-2),
        ("A", "grid cell 1"): (ONE_DEGREE, 1e-2),
        ("A", "grid cell 3"): (50000.0, 1e-2),
        ("B", "grid cell 2"): (2 ** 0.5 * ONE_DEGREE / 2, 2e-2),
    }
    got = {}
    for ln, lg in lines.items():
        for cn, cg in grid.items():
            inter = G.intersection(lg, "line", cg)
            if inter is not None:
                got[(ln, cn)] = G.measure(inter, "line")
    assert set(got) == set(expect)
    for k, (val, rtol) in expect.items():
        assert got[k] == pytest.approx(val, rel=rtol)


def test_point_border_double_count():
    """A point on a shared cell edge belongs to BOTH neighbours
    (reference utils/geometry.py:107-110; test_geometry.py:85-98)."""
    grid = {f["name"]: f["geometry"] for f in FIXTURES["grid"]()}
    pt = {"type": "Point", "coordinates": np.array([0.5, 1.0])}
    hits = {n for n, g in grid.items() if G.intersection(pt, "point", g) is not None}
    assert hits == {"grid cell 0", "grid cell 1"}
    corner = {"type": "Point", "coordinates": np.array([1.0, 1.0])}
    hits = {n for n, g in grid.items() if G.intersection(corner, "point", g) is not None}
    assert hits == {"grid cell 0", "grid cell 1", "grid cell 2", "grid cell 3"}


def test_polygon_edge_touch_yields_no_polygon():
    """Polygons sharing only an edge produce no polygon-kind output
    (recursive_geom_finder drops the line, utils/geometry.py:31-71)."""
    a = _box(0, 0, 1, 1)
    b = _box(1, 0, 2, 1)
    assert G.intersection(a, "polygon", b) is None


def test_concave_clip_via_triangulation():
    """L-shaped (concave) clip polygon: area of intersection must equal
    the analytic planar value."""
    L = {"type": "Polygon", "coordinates": [np.array(
        [[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2], [0, 0]], float)]}
    subj = _box(0.5, 0.5, 1.5, 1.5)
    inter = G.intersection(subj, "polygon", L)
    assert inter is not None
    # planar area: square 1.0 minus the quarter [1,1.5]x[1,1.5] = 0.75
    area = sum(G.polygon_area(p) for p in G.extract_kind_parts(inter, "polygon"))
    assert area == pytest.approx(0.75, rel=1e-9)


def test_polygon_with_hole_measures():
    donut = {"type": "Polygon", "coordinates": [
        np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float),
        np.array([[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]], float)]}
    assert G.polygon_area(donut["coordinates"]) == pytest.approx(12.0)
    inside_hole = np.array([[2.0, 2.0]])
    assert not G.points_in_polygon(inside_hole, donut["coordinates"])[0]
    on_rim = np.array([[0.0, 2.0]])
    assert G.points_in_polygon(on_rim, donut["coordinates"])[0]


def test_line_clip_through_hole():
    donut = {"type": "Polygon", "coordinates": [
        np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float),
        np.array([[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]], float)]}
    line = {"type": "LineString", "coordinates": np.array([[0, 2], [4, 2]], float)}
    inter = G.intersection(line, "line", donut)
    assert inter is not None
    length = sum(G.line_length(p) for p in G.extract_kind_parts(inter, "line"))
    assert length == pytest.approx(2.0, rel=1e-9)  # 1 + 1 outside the hole


def test_clean_geom_closes_rings():
    open_ring = {"type": "Polygon",
                 "coordinates": [np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)]}
    cleaned = G.clean_geom(open_ring)
    r = cleaned["coordinates"][0]
    assert np.array_equal(r[0], r[-1])


def test_degenerate_rings_do_not_crash_clip():
    """A polygon whose rings all degenerate (<4 points) must intersect
    nothing — not IndexError inside the clip kernel (review finding)."""
    empty = G.clean_geom({"type": "Polygon",
                          "coordinates": [np.array([[0.0, 0.0], [1.0, 1.0]])]})
    box = G.clean_geom(_box(0, 0, 1, 1))
    assert G.clip_polygon_by_polygon(empty["coordinates"], box["coordinates"]) == []
    assert G.clip_polygon_by_polygon(box["coordinates"], empty["coordinates"]) == []
    assert G.intersection(empty, "polygon", box) is None
    assert not G.intersects(empty, box)


def test_clean_geom_recurses_into_collections():
    gc = {"type": "GeometryCollection", "geometries": [
        {"type": "Polygon",
         "coordinates": [np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])]},
    ]}
    cleaned = G.clean_geom(gc)
    ring = cleaned["geometries"][0]["coordinates"][0]
    assert np.array_equal(ring[0], ring[-1])  # ring closed inside the GC


def test_wkb_rejects_foreign_variants():
    import struct
    import pytest
    # EWKB point with SRID flag + ISO-WKB PointZ: reject, don't mis-parse
    ewkb = b"\x01" + struct.pack("<I", 0x20000001) + struct.pack("<I", 4326) \
        + struct.pack("<dd", 1.0, 2.0)
    with pytest.raises(ValueError, match="unsupported WKB"):
        G.wkb_loads(ewkb)
    isoz = b"\x01" + struct.pack("<I", 1001) + struct.pack("<ddd", 1.0, 2.0, 3.0)
    with pytest.raises(ValueError, match="unsupported WKB"):
        G.wkb_loads(isoz)


def test_point_outside_exterior_not_claimed_by_hole_boundary():
    """Invalid input (hole outside the exterior) must not mark far-away
    points as inside via the hole-boundary term (review finding)."""
    rings = [np.array([[0.0, 0.0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float),
             np.array([[2.0, 2.0], [3, 2], [3, 3], [2, 3], [2, 2]], dtype=float)]
    res = G.points_in_polygon(np.array([[2.5, 2.0], [0.5, 0.5], [2.5, 2.5]]), rings)
    assert list(res) == [False, True, False]


def test_concave_part_with_partial_hole_subtracts_overlap():
    """L-shaped subject ∩ square-with-hole: the hole overlaps the L
    partially; its overlap area (12) must be subtracted (review
    finding: it used to be dropped entirely, overstating by 23%)."""
    L = [np.array([[0.0, 0.0], [8, 0], [8, 4], [4, 4], [4, 8], [0, 8], [0, 0]])]
    clip = [np.array([[0.0, 0.0], [8, 0], [8, 8], [0, 8], [0, 0]]),
            np.array([[2.0, 2.0], [6, 2], [6, 6], [2, 6], [2, 2]])]  # hole
    parts = G.clip_polygon_by_polygon(L, clip)
    total = sum(G.polygon_area(p) for p in parts)
    # true: area(L)=48; hole∩L = [2,6]x[2,4] (8) + [2,4]x[4,6] (4) = 12
    assert total == pytest.approx(48 - 12, abs=1e-9)
