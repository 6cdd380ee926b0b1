"""calculate_remaining goldens (reference
tests/integration/test_calculate_remaining.py:52-82 and the formula
unit suite tests/unit/utils/test_geometry.py:706-794)."""

import numpy as np
import pytest

import pandarus_spark as ps
from pandarus_spark.geometry import geom as G
from pandarus_spark.operators.remaining import remaining_measure, union_measure
from pandarus_spark.sources.pages import extract_features, pages_df, _box
from tests.conftest import CELL_AREA


def test_remaining_outside_grid(spark):
    """Half of 'by-myself' lies outside the grid: remaining ≈
    cell_area/2 at the reference's rtol 1e-2."""
    grid = extract_features(pages_df(spark, "grid"))
    outside = extract_features(pages_df(spark, "outside"))
    inter = ps.intersect(outside, grid)
    rows = ps.calculate_remaining(outside, inter).collect()
    assert len(rows) == 1
    assert rows[0]["label"] == "by-myself"
    assert rows[0]["remaining"] == pytest.approx(CELL_AREA / 2.0, rel=1e-2)


def test_remaining_no_intersections_returns_full_measure(spark):
    grid = extract_features(pages_df(spark, "grid"))
    big = extract_features(pages_df(spark, "big-grid"))
    inter = ps.intersect(big, grid)  # disjoint -> empty
    rows = {r["label"]: r["remaining"] for r in ps.calculate_remaining(big, inter).collect()}
    assert len(rows) == 4
    for v in rows.values():
        assert v == pytest.approx(CELL_AREA, rel=1e-2)


def test_formula_unit_goldens():
    """Planar unit goldens (projection cancels out in ratios is NOT
    assumed — these check the formula itself on Mollweide measures)."""
    sq = _box(0, 0, 1, 1)
    half = _box(0, 0, 0.5, 1)
    got = remaining_measure(sq, "polygon", [half])
    full = G.measure(sq, "polygon")
    part = G.measure(half, "polygon")
    assert got == pytest.approx(full - part, rel=1e-12)


def test_line_overlap_normalization():
    """(actual - union) * (individ / union): overlap double-counts
    (test_geometry.py:733-794 semantics)."""
    l2 = {"type": "LineString", "coordinates": np.array([[0, 0], [2, 0]], float)}
    la = {"type": "LineString", "coordinates": np.array([[0, 0], [1, 0]], float)}
    lb = {"type": "LineString", "coordinates": np.array([[0.5, 0], [1, 0]], float)}
    actual = G.measure(l2, "line")
    union = union_measure("line", [la, lb])
    individ = G.measure(la, "line") + G.measure(lb, "line")
    got = remaining_measure(l2, "line", [la, lb])
    assert got == pytest.approx((actual - union) * individ / union, rel=1e-12)
    # ratio structure matches the planar golden 1.5 when lengths are planar-proportional
    assert individ / union == pytest.approx(1.5, rel=1e-9)


def test_point_duplicate_normalization():
    p2 = {"type": "MultiPoint", "coordinates": np.array([[0, 0], [1, 0]], float)}
    pa = {"type": "Point", "coordinates": np.array([0.0, 0.0])}
    assert remaining_measure(p2, "point", [pa, pa]) == pytest.approx(2.0)
