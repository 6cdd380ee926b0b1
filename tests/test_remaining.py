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


def test_remaining_distributed_matches_kernel_per_kind(spark):
    """The distributed formula terms (sum/countDistinct/window merge)
    must reproduce remaining_measure for every kind."""
    cases = []
    sq = _box(0, 0, 1, 1)
    half = _box(0, 0, 0.5, 1)
    quarter = _box(0.5, 0, 0.75, 1)
    cases.append(("poly", sq, "polygon", [half, quarter]))
    l2 = {"type": "LineString", "coordinates": np.array([[0, 0], [2, 0]], float)}
    la = {"type": "LineString", "coordinates": np.array([[0, 0], [1, 0]], float)}
    lb = {"type": "LineString", "coordinates": np.array([[0.5, 0], [1, 0]], float)}
    cases.append(("line", l2, "line", [la, lb]))
    p2 = {"type": "MultiPoint", "coordinates": np.array([[0, 0], [1, 0]], float)}
    pa = {"type": "Point", "coordinates": np.array([0.0, 0.0])}
    cases.append(("pt", p2, "point", [pa, pa]))
    src = spark.createDataFrame(
        [(i, lab, bytearray(G.wkb_dumps(orig)), kind)
         for i, (lab, orig, kind, _) in enumerate(cases)],
        "feature_id long, label string, geom_wkb binary, kind string")
    inter = spark.createDataFrame(
        [(lab, bytearray(G.wkb_dumps(g)))
         for lab, _, _, geoms in cases for g in geoms],
        "from_label string, geom_wkb binary")
    got = {r["label"]: r["remaining"]
           for r in ps.calculate_remaining(src, inter).collect()}
    for lab, orig, kind, geoms in cases:
        want = remaining_measure(orig, kind, geoms)
        assert got[lab] == pytest.approx(want, rel=1e-9), (lab, got[lab], want)


def test_remaining_scale_no_single_group_barrier(spark):
    """One feature x 100k intersections: the plan must contain NO
    per-feature Python group (round-2 verdict #2 — the old
    applyInPandas path made this a single quadratic straggler task)."""
    from tests.test_plans import plan_of
    n = 100_000
    dx = 0.0001
    orig = _box(0.0, 0.0, 20.0, 1.0)
    src = spark.createDataFrame(
        [(0, "wide", bytearray(G.wkb_dumps(orig)), "polygon")],
        "feature_id long, label string, geom_wkb binary, kind string")
    # n disjoint same-latitude slivers: Mollweide area is invariant
    # under longitude shift, so the expectation is analytic
    g0 = _box(0.0, 0.0, dx / 2, 1.0)
    blobs = [(("wide"), bytearray(G.wkb_dumps(_box(i * dx, 0.0, i * dx + dx / 2, 1.0))))
             for i in range(n)]
    inter = spark.createDataFrame(blobs, "from_label string, geom_wkb binary") \
        .repartition(32)
    result = ps.calculate_remaining(src, inter)
    plan = plan_of(result)
    assert "FlatMapGroupsInPandas" not in plan  # no per-feature group
    rows = result.collect()
    actual = G.measure(orig, "polygon")
    expect = actual - n * G.measure(g0, "polygon")  # union==individ, ratio 1
    assert len(rows) == 1
    assert rows[0]["remaining"] == pytest.approx(expect, rel=1e-6)
