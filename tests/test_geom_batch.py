"""Differential tests: the batched clip/measure kernels must agree
with the scalar kernel row-for-row (same epsilons, same arithmetic)."""

import struct

import numpy as np
import pytest

from pandarus_spark.geometry import batch as B, geom as G


def _close(r):
    r = np.asarray(r, dtype=np.float64)
    return np.vstack([r, r[0]])


def _rand_convex(rng, n_pts, cx, cy, scale):
    """Random convex ring: points on a noisy circle, hull-ordered."""
    ang = np.sort(rng.uniform(0, 2 * np.pi, n_pts))
    rad = scale * (0.7 + 0.3 * rng.random(n_pts))
    return np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])


def _rand_simple(rng, n_pts, cx, cy, scale):
    """Random star-shaped (simple, possibly concave) ring."""
    ang = np.sort(rng.uniform(0, 2 * np.pi, n_pts))
    rad = scale * (0.3 + 0.7 * rng.random(n_pts))
    return np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])


def _scalar_clip(subj, clip):
    out = G.clip_ring_convex(_close(subj), _close(clip))
    return out  # closed ring or None


def _batch_rows(subjects, clips):
    sp, sc = B.pad_rings(subjects)
    cp, cc = B.pad_rings(clips)
    cp = B.ensure_ccw_batch(cp, cc)
    return B.clip_convex_batch(sp, sc, cp, cc)


def test_clip_batch_matches_scalar_on_random_pairs():
    rng = np.random.default_rng(42)
    subjects, clips = [], []
    for i in range(200):
        subjects.append(_rand_simple(rng, int(rng.integers(3, 12)), 0, 0, 1.0))
        # half overlapping, half disjoint clips; mixed vertex counts
        off = 0.5 if i % 2 == 0 else 5.0
        clips.append(_rand_convex(rng, int(rng.integers(3, 9)), off, 0, 1.0))
    pts, cnt = _batch_rows(subjects, clips)
    for i, (s, c) in enumerate(zip(subjects, clips)):
        scalar = _scalar_clip(s, c)
        if scalar is None:
            assert cnt[i] == 0, f"row {i}: batch kept a ring scalar dropped"
            continue
        assert cnt[i] == len(scalar) - 1, f"row {i}: vertex count differs"
        got = pts[i, :cnt[i]]
        np.testing.assert_allclose(got, scalar[:-1], rtol=0, atol=1e-12)


def test_clip_batch_axis_aligned_degeneracies():
    """Shared edges / corner touches — the fixture-grid degeneracies."""
    unit = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    cases = [
        (unit, unit + [1.0, 0.0]),     # shared edge -> empty
        (unit, unit + [1.0, 1.0]),     # corner touch -> empty
        (unit, unit + [0.5, 0.5]),     # quarter overlap
        (unit, unit),                  # identity
        (unit, unit + [10, 10]),       # disjoint
    ]
    pts, cnt = _batch_rows([s for s, _ in cases], [c for _, c in cases])
    for i, (s, c) in enumerate(cases):
        scalar = _scalar_clip(s, c)
        if scalar is None:
            assert cnt[i] == 0
        else:
            np.testing.assert_allclose(pts[i, :cnt[i]], scalar[:-1], rtol=0, atol=0)


def test_area_batch_matches_scalar():
    rng = np.random.default_rng(7)
    rings = [_rand_simple(rng, int(rng.integers(3, 15)), rng.uniform(-50, 50),
                          rng.uniform(-40, 40), rng.uniform(0.1, 5)) for _ in range(60)]
    pts, cnt = B.pad_rings(rings)
    planar = B.ring_area_batch(pts, cnt)
    moll = B.mollweide_area_batch(pts, cnt)
    for i, r in enumerate(rings):
        assert planar[i] == pytest.approx(abs(G.ring_area(_close(r))), rel=1e-14)
        scal = G.measure({"type": "Polygon", "coordinates": [_close(r)]}, "polygon")
        assert moll[i] == pytest.approx(scal, rel=1e-12)


def test_convexity_and_ccw_batch():
    rng = np.random.default_rng(3)
    convex = [_rand_convex(rng, 6, 0, 0, 1.0) for _ in range(20)]
    concave = [np.array([[0, 0], [2, 0], [2, 2], [1, 0.5], [0, 2]], dtype=float)] * 5
    rings = convex + concave + [r[::-1] for r in convex[:5]]  # CW variants
    pts, cnt = B.pad_rings(rings)
    conv = B.is_convex_batch(pts, cnt)
    for i, r in enumerate(rings):
        assert conv[i] == G.is_convex(_close(r)), f"row {i}"
    ccw = B.ensure_ccw_batch(pts, cnt)
    areas = B.signed_ring_area_batch(ccw, cnt)
    assert (areas >= 0).all()


def test_decode_simple_polygon_batch():
    rng = np.random.default_rng(11)
    wkbs, rings = [], []
    for i in range(50):
        r = _rand_simple(rng, int(rng.integers(3, 9)), 0, 0, 1.0)
        rings.append(r)
        g = {"type": "Polygon", "coordinates": [_close(r)]}
        if i % 2:
            g = {"type": "MultiPolygon", "coordinates": [[_close(r)]]}
        wkbs.append(G.wkb_dumps(g))
    # non-simple rows must be rejected, not mis-parsed
    hole = {"type": "Polygon", "coordinates": [_close(rings[0]), _close(rings[1] * 0.1)]}
    two_part = {"type": "MultiPolygon",
                "coordinates": [[_close(rings[0])], [_close(rings[1] + 10)]]}
    wkbs += [G.wkb_dumps(hole), G.wkb_dumps(two_part), None,
             G.wkb_dumps({"type": "Point", "coordinates": np.array([1.0, 2.0])})]
    pts, cnt, ok = B.decode_simple_polygon_batch(wkbs)
    assert ok[:50].all() and not ok[50:].any()
    for i in range(50):
        np.testing.assert_array_equal(pts[i, :cnt[i]], rings[i])
    # padding is the first vertex, not garbage
    pad_rows = np.nonzero(ok & (cnt < pts.shape[1]))[0]
    for i in pad_rows[:3]:
        np.testing.assert_array_equal(pts[i, cnt[i]:],
                                      np.repeat(pts[i, 0:1], pts.shape[1] - cnt[i], axis=0))
