"""Differential audits: batched kernels vs their scalar twins on seeded
random inputs.  This is the test form of the round-2 fuzz campaign that
found the concave Sutherland–Hodgman area loss — every batched numeric
kernel must agree with the scalar implementation it claims to mirror,
not just on fixtures but on adversarial random shapes."""

import numpy as np
import pytest

from pandarus_spark.geometry import batch as B, geom as G
from pandarus_spark.operators.knn import points_geom_distance
from pandarus_spark.tiling import cells as C


def test_batch_decode_convexity_area_match_scalar():
    rng = np.random.default_rng(2468)
    polys = []
    for _ in range(200):
        n = int(rng.integers(3, 50))
        th = np.sort(rng.uniform(0, 2 * np.pi, n))
        r = rng.uniform(0.1, 2.0, n) * 10.0 ** rng.integers(-3, 4)
        ring = np.c_[r * np.cos(th), r * np.sin(th)]
        polys.append({"type": "Polygon", "coordinates": [np.vstack([ring, ring[0]])]})
    wkbs = [G.wkb_dumps(p) for p in polys]
    pts, cnt, ok = B.decode_simple_polygon_batch(wkbs)
    assert ok.all()
    for i, p in enumerate(polys):
        assert np.array_equal(pts[i, :cnt[i]], np.asarray(p["coordinates"][0])[:-1])
    conv_b = B.is_convex_batch(pts, cnt)
    sa_b = B.signed_ring_area_batch(pts, cnt)
    for i in range(len(polys)):
        closed = np.vstack([pts[i, :cnt[i]], pts[i, :1]])
        assert conv_b[i] == G.is_convex(closed), i
        assert sa_b[i] == pytest.approx(G.ring_area(closed), rel=1e-12), i


def test_batch_convex_clip_matches_scalar_kernel():
    """convex×convex is the batch clip's whole contract now — it must
    equal the exact scalar kernel on random convex pairs."""
    rng = np.random.default_rng(2468)
    tested = 0
    while tested < 300:
        def rand_convex():
            n = int(rng.integers(3, 10))
            th = np.sort(rng.uniform(0, 2 * np.pi, n))
            r = rng.uniform(0.3, 1.0)
            cx, cy = rng.uniform(-0.5, 0.5, 2)
            ring = np.c_[cx + r * np.cos(th), cy + r * np.sin(th)]
            ring = np.vstack([ring, ring[0]])
            return ring if G.is_convex(ring) else None
        a, b = rand_convex(), rand_convex()
        if a is None or b is None:
            continue
        tested += 1
        sp, sc = B.pad_rings([a])
        cp, cc = B.pad_rings([b])
        cp = B.ensure_ccw_batch(cp, cc)
        op, oc = B.clip_convex_batch(sp, sc, cp, cc)
        got = float(B.ring_area_batch(op, oc)[0]) if oc[0] >= 3 else 0.0
        want = sum(abs(G.ring_area(np.asarray(p[0])))
                   for p in G.clip_polygon_by_polygon([a], [b]))
        assert got == pytest.approx(want, abs=1e-12), tested


def test_knn_distance_kernel_matches_brute():
    rng = np.random.default_rng(1234)

    def brute_seg(p, a, b):
        d = b - a
        L2 = float(d @ d)
        if L2 == 0:
            return float(np.hypot(*(p - a)))
        t = max(0.0, min(1.0, float((p - a) @ d) / L2))
        return float(np.hypot(*(p - (a + t * d))))

    for trial in range(60):
        kind = rng.integers(0, 3)
        if kind == 0:
            geom = {"type": "MultiPoint",
                    "coordinates": rng.uniform(-1, 1, (int(rng.integers(1, 6)), 2))}
        elif kind == 1:
            geom = {"type": "LineString",
                    "coordinates": rng.uniform(-1, 1, (int(rng.integers(2, 7)), 2))}
        else:
            n = int(rng.integers(4, 10))
            th = np.sort(rng.uniform(0, 2 * np.pi, n))
            r = rng.uniform(0.3, 1.0, n)
            ring = np.c_[r * np.cos(th), r * np.sin(th)]
            geom = {"type": "Polygon",
                    "coordinates": [np.vstack([ring, ring[0]])]}
        pts = rng.uniform(-1.5, 1.5, (int(rng.integers(1, 20)), 2))
        got = points_geom_distance(pts, geom)
        for i, p in enumerate(pts):
            best = np.inf
            for part in G.extract_kind_parts(geom, "point"):
                for q in np.asarray(part, dtype=np.float64).reshape(-1, 2):
                    best = min(best, float(np.hypot(*(p - q))))
            for part in G.extract_kind_parts(geom, "line"):
                arr = np.asarray(part, dtype=np.float64).reshape(-1, 2)
                for k in range(len(arr) - 1):
                    best = min(best, brute_seg(p, arr[k], arr[k + 1]))
            for rings in G.extract_kind_parts(geom, "polygon"):
                for ring in rings:
                    arr = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
                    for k in range(len(arr) - 1):
                        best = min(best, brute_seg(p, arr[k], arr[k + 1]))
                if G.points_in_polygon(p[None, :], rings)[0]:
                    best = 0.0
            assert got[i] == pytest.approx(best, abs=1e-12), (trial, i)


def test_cover_features_batch_matches_scalar_covers():
    """Batch tiling covers (with and without ancestor chains) vs the
    scalar cover functions, including cell-boundary-aligned boxes."""
    rng = np.random.default_rng(13579)
    N = 400
    minx = rng.uniform(-180, 179, N)
    miny = rng.uniform(-90, 89, N)
    maxx = minx + rng.uniform(0, 5, N)
    maxy = miny + rng.uniform(0, 5, N)
    for i in range(0, N, 7):
        res = int(rng.integers(4, 12))
        step = 360.0 / (1 << res)
        minx[i] = np.floor(minx[i] / step) * step
        maxx[i] = minx[i] + step * int(rng.integers(1, 4))
    for parents_to in (None, 4):
        pos, cells_arr, native = C.cover_features_batch(
            minx, miny, maxx, maxy, target_res=12, max_cells=64,
            parents_to=parents_to)
        per = [[] for _ in range(N)]
        for p, c in zip(pos, cells_arr):
            per[p].append(int(c))
        for i in range(N):
            r = int(native[i])
            if parents_to is None:
                want = sorted(C.cover_bbox(minx[i], miny[i], maxx[i], maxy[i], r))
            else:
                want = sorted(C.cover_with_parents(
                    minx[i], miny[i], maxx[i], maxy[i], r, min_res=parents_to))
            assert sorted(per[i]) == want, (parents_to, i)
