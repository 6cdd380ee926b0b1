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


# ---------------------------------------------------------------------------
# Round-2 fuzz regressions: S-H is only area-exact for convex subjects
# ---------------------------------------------------------------------------

C_SHAPE = np.array([[0, 0], [3, 0], [3, 1], [1, 1], [1, 2], [3, 2],
                    [3, 3], [0, 3], [0, 0]], dtype=float)


def test_concave_subject_disconnected_intersection_exact():
    """A C-shaped subject clipped by a box overlapping both arms has a
    DISCONNECTED intersection (two 1.0x0.5 rects, plane area 1.0).  The
    old single-pass Sutherland–Hodgman lost area to bridge edges here;
    the convex-cover kernel must be exact."""
    clip = np.array([[2, 0.5], [3, 0.5], [3, 2.5], [2, 2.5], [2, 0.5]], dtype=float)
    parts = G.clip_polygon_by_polygon([C_SHAPE], [clip])
    area = sum(abs(G.ring_area(np.asarray(p[0]))) -
               sum(abs(G.ring_area(np.asarray(h))) for h in p[1:]) for p in parts)
    assert area == pytest.approx(1.0, rel=1e-12)
    # and through the public kind-typed API
    inter = G.intersection({"type": "Polygon", "coordinates": [C_SHAPE]},
                           "polygon",
                           {"type": "Polygon", "coordinates": [clip]})
    got = G.measure(inter, "polygon")
    want = sum(G.measure({"type": "Polygon", "coordinates": [np.array(b, dtype=float)]},
                         "polygon")
               for b in ([[2, 0.5], [3, 0.5], [3, 1], [2, 1], [2, 0.5]],
                         [[2, 2], [3, 2], [3, 2.5], [2, 2.5], [2, 2]]))
    assert got == pytest.approx(want, rel=1e-12)


def _quad_pair_area(qa, qb):
    tot = 0.0
    for a in qa:
        for b in qb:
            r = G.clip_ring_convex(a, b)
            if r is not None:
                tot += abs(G.ring_area(r))
    return tot


def _area_of_parts(parts):
    return sum(abs(G.ring_area(np.asarray(p[0]))) -
               sum(abs(G.ring_area(np.asarray(h))) for h in p[1:]) for p in parts)


def test_spiky_concave_pairs_match_decompose_oracle():
    """Seeded fuzz: heavily concave star pairs (no holes) — the kernel
    area must match the independent trapezoid-pairwise oracle exactly.
    The pre-fix kernel failed ~1% of these with errors up to 80%."""
    rng = np.random.default_rng(99)
    for trial in range(120):
        polys = []
        for _ in range(2):
            n = int(rng.integers(5, 14))
            th = np.sort(rng.uniform(0, 2 * np.pi, n))
            r = rng.uniform(0.3, 1.2, n)
            ring = np.c_[r * np.cos(th), r * np.sin(th)]
            polys.append([np.vstack([ring, ring[0]])])
        sub, clip = polys
        got = _area_of_parts(G.clip_polygon_by_polygon(sub, clip))
        want = _quad_pair_area(G.polygon_region_decompose(sub),
                               G.polygon_region_decompose(clip))
        assert got == pytest.approx(want, abs=1e-12), trial


def test_valid_holed_pairs_match_decompose_oracle():
    """Seeded fuzz: valid polygons with 0-2 disjoint interior holes on
    both sides — kernel area == trapezoid-pairwise oracle at 1e-12.
    Catches the bridge-degenerate hole-piece handling the round-2 fuzz
    exposed (union sweep missing self-crossing slab boundaries)."""
    rng = np.random.default_rng(777)

    def gen():
        n = int(rng.integers(14, 24))
        th = (np.arange(n) + rng.uniform(-0.35, 0.35, n)) * (2 * np.pi / n) \
            + rng.uniform(0, 2 * np.pi)
        cx, cy = rng.uniform(-0.5, 0.5, 2)
        r = rng.uniform(0.9, 1.1, n)
        ext = np.c_[cx + r * np.cos(th), cy + r * np.sin(th)]
        rings = [np.vstack([ext, ext[0]])]
        nh = int(rng.integers(0, 3))
        if nh:
            base = rng.uniform(0, 2 * np.pi)
            for i in range(nh):
                ang = base + i * 2 * np.pi / nh
                hx, hy = cx + 0.35 * np.cos(ang), cy + 0.35 * np.sin(ang)
                m = int(rng.integers(4, 9))
                hth = np.sort(rng.uniform(0, 2 * np.pi, m))
                hr = rng.uniform(0.08, 0.22, m)
                h = np.c_[hx + hr * np.cos(hth), hy + hr * np.sin(hth)]
                rings.append(np.vstack([h, h[0]]))
        return rings

    for trial in range(120):
        sub, clip = gen(), gen()
        got = _area_of_parts(G.clip_polygon_by_polygon(sub, clip))
        want = _quad_pair_area(G.polygon_region_decompose(sub),
                               G.polygon_region_decompose(clip))
        assert got == pytest.approx(want, abs=1e-12), trial
