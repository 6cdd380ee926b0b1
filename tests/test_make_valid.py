"""make_valid — the buffer(0) analogue (round-2, reference clean_geom
utils/geometry.py:22-28): self-intersecting rings become the trapezoid
decomposition of their even-odd region; clean inputs pass through
untouched."""

import numpy as np
import pytest

from pandarus_spark.geometry import geom as G


def _close(r):
    r = np.asarray(r, dtype=float)
    return np.vstack([r, r[0]])


BOWTIE = _close([[0, 0], [2, 2], [2, 0], [0, 2]])  # crosses at (1,1)


def _total_area(geom):
    return sum(G.polygon_area(p) for p in G.extract_kind_parts(geom, "polygon"))


def test_bowtie_splits_into_two_lobes():
    out = G.make_valid({"type": "Polygon", "coordinates": [BOWTIE]})
    assert out["type"] == "MultiPolygon"
    # even-odd region of the bowtie = two triangles, each area 1
    assert _total_area(out) == pytest.approx(2.0, rel=1e-12)
    # raw shoelace of the dirty ring cancels to 0 — repair recovers it
    assert abs(G.ring_area(BOWTIE)) == pytest.approx(0.0, abs=1e-15)


def test_repaired_containment_matches_even_odd_of_dirty_input():
    dirty = [BOWTIE]
    out = G.make_valid({"type": "Polygon", "coordinates": dirty})
    probes = np.array([[0.5, 1.0], [1.5, 1.0], [1.0, 1.0 + 1e-6], [1.0, 0.5],
                       [1.0, 1.5], [3.0, 1.0]])
    before = G.points_in_polygon(probes, dirty)
    after = np.zeros(len(probes), dtype=bool)
    for part in G.extract_kind_parts(out, "polygon"):
        after |= G.points_in_polygon(probes, part)
    # interior points keep their even-odd classification (boundary-new
    # trapezoid edges may differ only ON the seam lines, not probed here)
    np.testing.assert_array_equal(after, before)


def test_hole_crossing_exterior_is_carved():
    ext = _close([[0, 0], [4, 0], [4, 4], [0, 4]])
    hole = _close([[3, 1], [6, 1], [6, 3], [3, 3]])  # sticks out of ext
    out = G.make_valid({"type": "Polygon", "coordinates": [ext, hole]})
    # kernel containment semantics (points_in_polygon): ext minus the
    # union of holes -> 16 - |hole ∩ ext| = 16 - (1x2) = 14; the naive
    # polygon_area of the dirty input over-subtracts to 16 - 6 = 10
    assert _total_area(out) == pytest.approx(14.0, rel=1e-12)


def test_clean_input_untouched():
    """Clean input comes back with its ORIGINAL type and vertex
    structure — wrapping a Polygon into MultiPolygon would flip
    is_axis_rect and lose the rect fast paths (review finding #5)."""
    sq = _close([[0, 0], [1, 0], [1, 1], [0, 1]])
    holed = {"type": "Polygon", "coordinates": [
        _close([[0, 0], [4, 0], [4, 4], [0, 4]]),
        _close([[1, 1], [2, 1], [2, 2], [1, 2]])]}
    clean = {"type": "Polygon", "coordinates": [sq]}
    out = G.make_valid(clean)
    assert out is clean  # identity: type preserved, nothing rebuilt
    assert G.is_axis_rect(out)
    assert G.make_valid(holed) is holed
    mp = {"type": "MultiPolygon", "coordinates": [[sq]]}
    assert G.make_valid(mp) is mp


def test_clean_geom_repair_flag():
    dirty = {"type": "Polygon", "coordinates": [BOWTIE[:-1]]}  # open ring too
    default = G.clean_geom(dirty)
    assert default["type"] == "Polygon"  # no repair by default
    repaired = G.clean_geom(dirty, repair=True)
    assert repaired["type"] == "MultiPolygon"
    assert _total_area(repaired) == pytest.approx(2.0, rel=1e-12)
    # non-polygons pass through
    line = {"type": "LineString", "coordinates": np.array([[0, 0], [1, 1]])}
    assert G.clean_geom(line, repair=True) is line


def test_measure_of_repaired_bowtie():
    repaired = G.make_valid({"type": "Polygon", "coordinates": [BOWTIE]})
    m = G.measure(repaired, "polygon")
    # independent expectation: two clean triangles through the same
    # Mollweide measure path
    tri1 = {"type": "Polygon", "coordinates": [_close([[0, 0], [1, 1], [0, 2]])]}
    tri2 = {"type": "Polygon", "coordinates": [_close([[2, 0], [2, 2], [1, 1]])]}
    want = G.measure(tri1, "polygon") + G.measure(tri2, "polygon")
    assert m == pytest.approx(want, rel=1e-9)


def test_random_dirty_rings_area_matches_montecarlo_parity():
    """Randomized: even-odd area of the repaired polygon equals a
    dense-grid parity estimate of the dirty ring within grid error."""
    rng = np.random.default_rng(77)
    for trial in range(10):
        ring = _close(rng.uniform(0, 10, (6, 2)))
        out = G.make_valid({"type": "Polygon", "coordinates": [ring]})
        area = _total_area(out)
        g = np.linspace(0.025, 9.975, 200)
        gx, gy = np.meshgrid(g, g)
        pts = np.column_stack([gx.ravel(), gy.ravel()])
        inside = G.points_in_polygon(pts, [ring])
        mc = inside.mean() * 100.0
        assert area == pytest.approx(mc, abs=0.6), trial


def _crossing_set(gen):
    out = set()
    for ti, t in gen:
        for i, tv in zip(np.asarray(ti).ravel(), np.asarray(t).ravel()):
            out.add((int(i), float(tv)))
    return out


def test_binned_crossings_match_dense_scan(monkeypatch):
    """The x-binned candidate pruning in _segment_crossings must report
    exactly the dense scan's (edge, parameter) pairs — forced onto the
    binned path by lowering the dense cutoff, since the fixture-sized
    suite otherwise never leaves the dense branch."""
    rng = np.random.default_rng(123)
    for trial in range(20):
        n = int(rng.integers(40, 200))
        a = rng.uniform(0, 10, (n + 1, 2))
        b = rng.uniform(0, 10, (int(rng.integers(40, 200)) + 1, 2))
        dense = _crossing_set(
            G._segment_crossings_dense(a[:-1], a[1:], b[:-1], b[1:], 0.0, 1.0))
        monkeypatch.setattr(G, "_DENSE_MAX_EDGES", 8)
        binned = _crossing_set(
            G._segment_crossings(a[:-1], a[1:], b[:-1], b[1:], 0.0, 1.0))
        monkeypatch.undo()
        assert binned == dense, trial


def test_binned_crossings_self_scan_matches_dense(monkeypatch):
    """Self-crossing scan (the make_valid hot path) through the binned
    branch: same crossing set as dense, including shared-endpoint hits
    of adjacent edges at t in {0,1}."""
    rng = np.random.default_rng(5)
    th = np.sort(rng.uniform(0, 2 * np.pi, 120))
    rad = rng.uniform(0.5, 1.5, 120)
    r = np.column_stack([rad * np.cos(th), rad * np.sin(th)])
    r = np.vstack([r, r[0]])
    e1, e2 = r[:-1], r[1:]
    dense = _crossing_set(G._segment_crossings_dense(e1, e2, e1, e2, 0.0, 1.0))
    monkeypatch.setattr(G, "_DENSE_MAX_EDGES", 8)
    binned = _crossing_set(G._segment_crossings(e1, e2, e1, e2, 0.0, 1.0))
    assert binned == dense


def test_slab_spans_match_naive_mask():
    """_slab_spans (sorted-entry + heap-exit active sets) must select
    exactly the edges the old per-slab mask selected."""
    rng = np.random.default_rng(9)
    for trial in range(20):
        n = int(rng.integers(5, 60))
        exl = rng.uniform(0, 10, n)
        exh = exl + rng.uniform(0, 3, n)
        deg = rng.uniform(size=n) < 0.2
        exh[deg] = exl[deg]  # degenerate (zero x-span) edges
        bounds_x = np.unique(np.r_[rng.uniform(0, 10, int(rng.integers(3, 30))), 0.0, 10.0])
        got = {(x0, x1): idx.tolist() for x0, x1, idx in G._slab_spans(bounds_x, exl, exh)}
        want = {}
        for x0, x1 in zip(bounds_x[:-1], bounds_x[1:]):
            if x1 - x0 <= 1e-15:
                continue
            mask = (exl <= x0 + 1e-15) & (exh >= x1 - 1e-15) & (exh - exl > 1e-15)
            want[(x0, x1)] = np.flatnonzero(mask).tolist()
        assert got == want, trial


def test_make_valid_large_dirty_ring_near_linear():
    """A 1.5k-vertex heavily self-crossing ring must repair in seconds
    (the old dense O(E^2) crossing scan + per-slab edge rescan took
    minutes at this size), and the repaired area must match the dirty
    ring's even-odd parity.  Size and bound are sized for a VM with
    3-4x timing noise; a quadratic regression overshoots by >10x."""
    import time
    rng = np.random.default_rng(7)
    n = 1500
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    rad = 1.0 + 0.3 * np.sin(40 * th) * rng.uniform(0.5, 1.5, n)  # self-crossing wiggle
    r = np.column_stack([rad * np.cos(th), rad * np.sin(th)])
    r = np.vstack([r, r[0]])
    t0 = time.perf_counter()
    out = G.make_valid({"type": "Polygon", "coordinates": [r]})
    elapsed = time.perf_counter() - t0
    assert elapsed < 45.0, f"repair took {elapsed:.1f}s — quadratic regression?"
    area = _total_area(out)
    g = np.linspace(-1.79, 1.79, 150)
    gx, gy = np.meshgrid(g, g)
    pts = np.column_stack([gx.ravel(), gy.ravel()])
    mc = G.points_in_polygon(pts, [r]).mean() * (3.58 ** 2)
    assert area == pytest.approx(mc, rel=0.02)
