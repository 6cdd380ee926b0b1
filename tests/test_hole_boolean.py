"""Exact hole×hole polygon intersection (round-2 verdict item #5).

Round 1 double-subtracted the region where a subject hole and a clip
hole overlap inside the intersection.  These tests pin the fixed
semantics: kernel area equals an independently computed
inclusion–exclusion area built only from convex×convex clips, and
even-odd containment is correct in the overlap region."""

import numpy as np
import pytest

from pandarus_spark.geometry import geom as G


def _box_ring(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float)


def _area_convex(ring_a, ring_b):
    """|a ∩ b| for convex rings via a single S-H pass (trusted)."""
    out = G.clip_ring_convex(ring_a, ring_b)
    return abs(G.ring_area(out)) if out is not None else 0.0


def _incl_excl_area(ext_s, holes_s, ext_c, holes_c):
    """|（ext_s \\ holes_s) ∩ (ext_c \\ holes_c)| with every term a
    convex×convex clip; holes within one side must be disjoint."""
    e_ring = G.clip_ring_convex(ext_s, ext_c)
    if e_ring is None:
        return 0.0
    area = abs(G.ring_area(e_ring))
    for h in holes_s + holes_c:
        area -= _area_convex(h, e_ring)
    for hs in holes_s:
        for hc in holes_c:
            hh = G.clip_ring_convex(hs, hc)
            if hh is not None:
                area += _area_convex(hh, e_ring)
    return area


def _kernel_area(subject_rings, clip_rings):
    parts = G.clip_polygon_by_polygon(subject_rings, clip_rings)
    return sum(G.polygon_area(p) for p in parts)


def test_overlapping_holes_no_double_subtract():
    ext_s = _box_ring(0, 0, 10, 10)
    hole_s = _box_ring(2, 2, 6, 6)
    ext_c = _box_ring(1, 1, 11, 11)
    hole_c = _box_ring(4, 4, 8, 8)          # overlaps hole_s on [4,6]²
    got = _kernel_area([ext_s, hole_s], [ext_c, hole_c])
    want = _incl_excl_area(ext_s, [hole_s], ext_c, [hole_c])
    # 9x9 ∩-ext minus union of holes: 81 - (16 + 16 - 4) = 53
    assert want == pytest.approx(53.0)
    assert got == pytest.approx(want, rel=1e-12)


def test_nested_and_disjoint_hole_cases():
    ext_s = _box_ring(0, 0, 10, 10)
    ext_c = _box_ring(0, 0, 10, 10)
    cases = [
        ([_box_ring(2, 2, 4, 4)], [_box_ring(2.5, 2.5, 3.5, 3.5)]),  # c-hole inside s-hole
        ([_box_ring(2, 2, 4, 4)], [_box_ring(6, 6, 8, 8)]),          # disjoint holes
        ([_box_ring(2, 2, 4, 4)], [_box_ring(2, 2, 4, 4)]),          # identical holes
        ([_box_ring(1, 1, 5, 5), _box_ring(6, 6, 9, 9)],
         [_box_ring(4, 4, 7, 7)]),                                   # one c-hole bridges two s-holes
    ]
    for holes_s, holes_c in cases:
        got = _kernel_area([ext_s] + holes_s, [ext_c] + holes_c)
        want = _incl_excl_area(ext_s, holes_s, ext_c, holes_c)
        assert got == pytest.approx(want, rel=1e-12), (holes_s, holes_c)


def test_hole_overlap_region_is_outside_result():
    ext_s = _box_ring(0, 0, 10, 10)
    hole_s = _box_ring(2, 2, 6, 6)
    ext_c = _box_ring(0, 0, 10, 10)
    hole_c = _box_ring(4, 4, 8, 8)
    parts = G.clip_polygon_by_polygon([ext_s, hole_s], [ext_c, hole_c])
    probes = np.array([
        [5.0, 5.0],   # in both holes -> outside
        [3.0, 3.0],   # in s-hole only -> outside
        [7.0, 7.0],   # in c-hole only -> outside
        [1.0, 1.0],   # in neither -> inside
        [9.0, 1.0],   # in neither -> inside
    ])
    inside = np.zeros(len(probes), dtype=bool)
    for rings in parts:
        inside |= G.points_in_polygon(probes, rings)
    assert inside.tolist() == [False, False, False, True, True]


def test_randomized_hole_pairs_match_inclusion_exclusion():
    rng = np.random.default_rng(101)
    for trial in range(60):
        ext_s = _box_ring(0, 0, 10, 10)
        ext_c = _box_ring(*sorted(rng.uniform(-2, 4, 2)), *sorted(rng.uniform(6, 13, 2)))
        ext_c = _box_ring(rng.uniform(-2, 2), rng.uniform(-2, 2),
                          rng.uniform(8, 12), rng.uniform(8, 12))

        def rand_holes(n):
            holes, taken = [], []
            while len(holes) < n:
                x0, y0 = rng.uniform(0.5, 6.5, 2)
                w, h = rng.uniform(0.5, 2.5, 2)
                box = (x0, y0, x0 + w, y0 + h)
                if all(box[2] <= t[0] or t[2] <= box[0] or box[3] <= t[1] or t[3] <= box[1]
                       for t in taken):
                    taken.append(box)
                    holes.append(_box_ring(*box))
            return holes
        holes_s = rand_holes(int(rng.integers(1, 3)))
        holes_c = rand_holes(int(rng.integers(1, 3)))
        got = _kernel_area([ext_s] + holes_s, [ext_c] + holes_c)
        want = _incl_excl_area(ext_s, holes_s, ext_c, holes_c)
        assert got == pytest.approx(want, rel=1e-9, abs=1e-9), trial


def test_single_sided_holes_keep_direct_attachment():
    """Only one side holed: the vertex-preserving path must still run
    (hole ring appears verbatim in the output part)."""
    ext_s = _box_ring(0, 0, 10, 10)
    hole_s = _box_ring(2, 2, 6, 6)
    parts = G.clip_polygon_by_polygon([ext_s, hole_s], [_box_ring(0, 0, 10, 10)])
    assert len(parts) == 1 and len(parts[0]) == 2
    assert G.polygon_area(parts[0]) == pytest.approx(100 - 16)
