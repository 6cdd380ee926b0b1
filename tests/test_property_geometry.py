"""Property-based tests (hypothesis) for the geometry kernel — the
semantic core every operator rests on.  No SparkSession: these run the
same numpy kernel the Arrow batches call.

Invariants:
* rect×rect: the vectorized fast path (operators/intersect.py
  _refine_rects) agrees with the general clip kernel on random boxes;
* clip results are bounded: area(A∩B) <= min(area A, area B), clipped
  length <= original length, clip stays inside the clip bbox;
* WKB round-trips losslessly; Mollweide forward/inverse round-trips.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from pandarus_spark.geometry import geom as G
from pandarus_spark.geometry.projection import mollweide_forward, mollweide_inverse
from pandarus_spark.operators.intersect import _refine_rects

coord = st.floats(min_value=-170.0, max_value=170.0, allow_nan=False, width=64)
lat = st.floats(min_value=-85.0, max_value=85.0, allow_nan=False, width=64)
span = st.floats(min_value=1e-3, max_value=20.0, allow_nan=False, width=64)


def _rect(x0, y0, w, h):
    return {"type": "Polygon",
            "coordinates": [np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + h],
                                      [x0, y0 + h], [x0, y0]], dtype=np.float64)]}


@settings(max_examples=200, deadline=None)
@given(coord, lat, span, span, coord, lat, span, span)
def test_rect_fast_path_matches_kernel(ax, ay, aw, ah, bx, by, bw, bh):
    ah = min(ah, 85.0 - ay)
    bh = min(bh, 85.0 - by)
    a, b = _rect(ax, ay, aw, ah), _rect(bx, by, bw, bh)
    keep, area, wkbs = _refine_rects(
        *[np.array([v]) for v in (ax, ay, ax + aw, ay + ah,
                                  bx, by, bx + bw, by + bh)])
    inter = G.intersection(a, "polygon", b)
    if inter is None:
        # kernel found nothing; fast path must agree up to a sub-m²
        # degenerate sliver
        assert not keep[0] or area[0] < 1.0
        return
    m = G.measure(inter, "polygon")
    if not keep[0]:
        assert m <= 1e-3  # degenerate edge-touch sliver
        return
    # different ring starting vertices give different shoelace summation
    # orders; on extreme slivers the cancellation wobble is absolute
    # (ulps of the ~1e14 m² term magnitudes), so allow a 1 m² floor —
    # 9 orders below the golden fixture areas
    assert abs(area[0] - m) < max(1e-9 * m, 1.0)


@settings(max_examples=200, deadline=None)
@given(coord, lat, span, span, coord, lat, span, span)
def test_clip_area_bounded(ax, ay, aw, ah, bx, by, bw, bh):
    ah = min(ah, 85.0 - ay)
    bh = min(bh, 85.0 - by)
    a, b = _rect(ax, ay, aw, ah), _rect(bx, by, bw, bh)
    inter = G.intersection(a, "polygon", b)
    if inter is None:
        return
    m = G.measure(inter, "polygon")
    assert m <= G.measure(a, "polygon") * (1 + 1e-9) + 1e-6
    assert m <= G.measure(b, "polygon") * (1 + 1e-9) + 1e-6
    # intersection bbox inside both bboxes
    mnx, mny, mxx, mxy = G.bounds(inter)
    assert mnx >= max(ax, bx) - 1e-9 and mxx <= min(ax + aw, bx + bw) + 1e-9


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(coord, lat), min_size=2, max_size=8),
       coord, lat, span, span)
def test_clip_line_length_bounded(pts, bx, by, bw, bh):
    bh = min(bh, 85.0 - by)
    line = {"type": "LineString", "coordinates": np.array(pts, dtype=np.float64)}
    box = _rect(bx, by, bw, bh)
    inter = G.intersection(line, "line", box)
    if inter is None:
        return
    clipped = G.measure(inter, "line", to_meters=False)
    full = G.measure(line, "line", to_meters=False)
    assert clipped <= full * (1 + 1e-9) + 1e-9


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(coord, lat), min_size=1, max_size=6))
def test_wkb_roundtrip_points(pts):
    g = {"type": "MultiPoint", "coordinates": np.array(pts, dtype=np.float64)}
    back = G.wkb_loads(G.wkb_dumps(g))
    assert back["type"] == "MultiPoint"
    assert np.array_equal(np.asarray(back["coordinates"]).reshape(-1, 2),
                          np.asarray(g["coordinates"]).reshape(-1, 2))


@settings(max_examples=100, deadline=None)
@given(coord, lat, span, span)
def test_wkb_roundtrip_polygon(x0, y0, w, h):
    h = min(h, 85.0 - y0)
    g = _rect(x0, y0, w, h)
    back = G.wkb_loads(G.wkb_dumps(g))
    assert back["type"] == "Polygon"
    assert np.array_equal(back["coordinates"][0], g["coordinates"][0])


@settings(max_examples=300, deadline=None)
@given(coord, lat)
def test_mollweide_roundtrip(lon, la):
    x, y = mollweide_forward(np.array([lon]), np.array([la]))
    lon2, la2 = mollweide_inverse(x, y)
    assert abs(lon2[0] - lon) < 1e-6 and abs(la2[0] - la) < 1e-6


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(coord, lat), min_size=3, max_size=10),
       st.integers(min_value=3, max_value=8),
       coord, lat, span)
def test_clip_batch_matches_scalar_property(subj_pts, n_clip, cx, cy, r):
    """Batched Sutherland–Hodgman == scalar kernel on arbitrary subject
    rings (hypothesis explores collinear/duplicate/degenerate shapes)
    against a random convex clip."""
    from pandarus_spark.geometry import batch as B
    subj = np.array(subj_pts, dtype=np.float64)
    ang = np.sort(np.linspace(0, 2 * np.pi, n_clip, endpoint=False))
    clip = np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])
    scalar = G.clip_ring_convex(np.vstack([subj, subj[:1]]),
                                np.vstack([clip, clip[:1]]))
    sp, sc = B.pad_rings([subj])
    cp, cc = B.pad_rings([clip])
    cp = B.ensure_ccw_batch(cp, cc)
    pts, cnt = B.clip_convex_batch(sp, sc, cp, cc)
    if scalar is None:
        assert cnt[0] == 0
    else:
        assert cnt[0] == len(scalar) - 1
        np.testing.assert_allclose(pts[0, :cnt[0]], scalar[:-1], rtol=0, atol=0)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(coord, lat), min_size=3, max_size=8))
def test_make_valid_area_equals_parity_integral(pts):
    """make_valid area == even-odd membership measured on the original
    dirty ring at the repaired parts' own sample points (vertex-level
    agreement between decomposition and parity predicate)."""
    ring = np.array(pts, dtype=np.float64)
    ring = np.vstack([ring, ring[:1]])
    if not G._has_proper_crossings([ring]):
        return  # pass-through path: original (possibly concave) ring kept,
                # so the convex-part centroid argument below doesn't apply
    out = G.make_valid({"type": "Polygon", "coordinates": [ring]})
    for part in G.extract_kind_parts(out, "polygon"):
        if G.polygon_area(part) < 1e-9:
            continue  # fp-noise slivers from coincident/degenerate edges
        q = np.asarray(part[0], dtype=np.float64)
        centroid = q[:-1].mean(axis=0)[None, :]
        # each substantive trapezoid's centroid must lie inside the
        # dirty ring's even-odd region (interior of a kept parity band)
        assert G.points_in_polygon(centroid, [ring])[0]
