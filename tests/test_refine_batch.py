"""End-to-end tests for the batched general refine (tier 2): non-rect
polygon workloads through intersect() must match the scalar kernel's
answers exactly."""

import numpy as np
import pytest

import pandarus_spark as ps
from pandarus_spark.geometry import geom as G
from pandarus_spark.sources.pages import extract_features, grid_features, pages_df


def _hexagon(cx, cy, r):
    ang = np.pi / 180.0 * (60.0 * np.arange(6) + 7.0)  # rotated: no axis alignment
    ring = np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])
    return {"type": "Polygon", "coordinates": [np.vstack([ring, ring[0]])]}


def _lshape(x0, y0, s):
    """Concave (L-shaped) polygon — forces the scalar tier."""
    r = np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s / 2], [x0 + s / 2, y0 + s / 2],
                  [x0 + s / 2, y0 + s], [x0, y0 + s], [x0, y0]], dtype=float)
    return {"type": "Polygon", "coordinates": [r]}


def _scalar_expected(from_feats, to_feats):
    exp = {}
    for f in from_feats:
        for t in to_feats:
            inter = G.intersection(f["geometry"], "polygon", t["geometry"])
            if inter is None:
                continue
            m = G.measure(inter, "polygon")
            if m > 0:
                exp[(str(f["name"]), str(t["name"]))] = m
    return exp


@pytest.fixture(scope="module")
def grid(spark):
    return extract_features(pages_df(spark, "grid"))


def test_hexagons_over_grid_match_scalar(spark, grid):
    hexes = [{"name": f"hex {i}", "geometry": _hexagon(0.4 + 0.45 * i, 0.6 + 0.3 * i, 0.5)}
             for i in range(4)]
    feats = extract_features(pages_df(spark, "hexes", features=hexes))
    got = {(r["from_label"], r["to_label"]): r["measure"]
           for r in ps.intersect(feats, grid).collect()}
    exp = _scalar_expected(hexes, grid_features())
    assert set(got) == set(exp)
    for k, v in exp.items():
        assert got[k] == pytest.approx(v, rel=1e-12)


def test_hexagons_over_hexgrid_match_scalar(spark):
    """Convex × convex, neither rect: pure tier-2 batch on both sides."""
    probes = [{"name": f"p{i}", "geometry": _hexagon(0.3 * i, 0.2 * i, 0.45)}
              for i in range(5)]
    base = [{"name": f"b{j}", "geometry": _hexagon(0.25 * j + 0.1, 0.25 * j, 0.5)}
            for j in range(5)]
    f1 = extract_features(pages_df(spark, "hexp", features=probes))
    f2 = extract_features(pages_df(spark, "hexb", features=base))
    got = {(r["from_label"], r["to_label"]): r["measure"]
           for r in ps.intersect(f1, f2).collect()}
    exp = _scalar_expected(probes, base)
    assert set(got) == set(exp)
    for k, v in exp.items():
        assert got[k] == pytest.approx(v, rel=1e-12)


def test_concave_base_routes_scalar_and_matches(spark):
    """Concave to-side cannot take the batched tier; results must still
    be correct through the scalar fallback."""
    probes = [{"name": f"hex {i}", "geometry": _hexagon(0.5 + 0.3 * i, 0.7, 0.4)}
              for i in range(3)]
    base = [{"name": f"L{j}", "geometry": _lshape(0.2 + 0.5 * j, 0.3, 1.0)}
            for j in range(3)]
    f1 = extract_features(pages_df(spark, "hexq", features=probes))
    f2 = extract_features(pages_df(spark, "lbase", features=base))
    got = {(r["from_label"], r["to_label"]): r["measure"]
           for r in ps.intersect(f1, f2).collect()}
    exp = _scalar_expected(probes, base)
    assert set(got) == set(exp)
    for k, v in exp.items():
        assert got[k] == pytest.approx(v, rel=1e-9)


def test_mixed_rect_and_hex_batch(spark, grid):
    """A batch mixing tier-1 (rect), tier-2 (hex), and empty overlaps."""
    mixed = ([{"name": "sq", "geometry": {"type": "Polygon", "coordinates": [np.array(
        [[0.5, 0.5], [1.5, 0.5], [1.5, 1.5], [0.5, 1.5], [0.5, 0.5]])]}}]
        + [{"name": f"hex {i}", "geometry": _hexagon(0.8 + 0.2 * i, 1.0, 0.35)}
           for i in range(3)]
        + [{"name": "far", "geometry": _hexagon(50.0, 50.0, 0.5)}])
    feats = extract_features(pages_df(spark, "mixed", features=mixed))
    got = {(r["from_label"], r["to_label"]): r["measure"]
           for r in ps.intersect(feats, grid).collect()}
    exp = _scalar_expected(mixed, grid_features())
    assert set(got) == set(exp)
    for k, v in exp.items():
        assert got[k] == pytest.approx(v, rel=1e-9)


def test_concave_disconnected_intersection_through_intersect(spark):
    """A C-shaped feature over a box that overlaps both arms: the true
    intersection is two disjoint rects.  Single-pass S-H lost area here
    (round-2 fuzz), and the tier-2 batch path must defer concave
    subjects to the scalar kernel — the overlay measure must equal the
    sum of the two rects' Mollweide measures exactly."""
    c_shape = {"type": "Polygon", "coordinates": [np.array(
        [[0, 0], [3, 0], [3, 1], [1, 1], [1, 2], [3, 2], [3, 3], [0, 3], [0, 0]],
        dtype=float)]}
    box = {"type": "Polygon", "coordinates": [np.array(
        [[2, 0.5], [3, 0.5], [3, 2.5], [2, 2.5], [2, 0.5]], dtype=float)]}
    feats = extract_features(pages_df(spark, "cshape", features=[
        {"name": "c", "geometry": c_shape}]))
    base = extract_features(pages_df(spark, "cbox", features=[
        {"name": "b", "geometry": box}]))
    rows = ps.intersect(feats, base).collect()
    assert len(rows) == 1
    want = sum(G.measure({"type": "Polygon", "coordinates": [np.array(b, dtype=float)]},
                         "polygon")
               for b in ([[2, 0.5], [3, 0.5], [3, 1], [2, 1], [2, 0.5]],
                         [[2, 2], [3, 2], [3, 2.5], [2, 2.5], [2, 2]]))
    assert rows[0]["measure"] == pytest.approx(want, rel=1e-12)


_PAIRS_SCHEMA = ("from_id long, to_id long, from_label string, to_label string, "
                 "from_wkb binary, from_kind string, to_wkb binary, "
                 "f_minx double, f_miny double, f_maxx double, f_maxy double, "
                 "t_minx double, t_miny double, t_maxx double, t_maxy double, "
                 "from_rect boolean, to_rect boolean")


def _star(cx, cy, r1, r2, n=7):
    ang = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False) + 0.3
    rad = np.where(np.arange(2 * n) % 2 == 0, r2, r1)
    ring = np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])
    return {"type": "Polygon", "coordinates": [np.vstack([ring, ring[0]])]}


def test_concave_tier_bit_identical_to_scalar(spark):
    """Tier 2.5 (batched convex-cover clip for concave sides) must be
    BIT-identical to the scalar kernel: same rows, same float measures,
    same WKB bytes — on L-shapes, stars, concave×concave, and the
    disconnected C-shape case."""
    from pandarus_spark.operators.intersect import refine_pairs

    def _bx(g):
        r = np.asarray(g["coordinates"][0])
        return float(r[:, 0].min()), float(r[:, 1].min()), float(r[:, 0].max()), float(r[:, 1].max())

    c_shape = {"type": "Polygon", "coordinates": [np.array(
        [[0, 0], [3, 0], [3, 1], [1, 1], [1, 2], [3, 2], [3, 3], [0, 3], [0, 0]],
        dtype=float)]}
    froms = ([_lshape(0.2 + 0.4 * j, 0.3, 1.0) for j in range(3)]
             + [_star(0.8, 0.9, 0.3, 0.9), c_shape, _hexagon(0.9, 0.8, 0.7)])
    tos = ([_hexagon(0.5 + 0.3 * i, 0.7, 0.5) for i in range(3)]
           + [_lshape(0.5, 0.5, 1.4), _star(1.0, 1.0, 0.4, 1.1),
              {"type": "Polygon", "coordinates": [np.array(
                  [[2, 0.5], [3, 0.5], [3, 2.5], [2, 2.5], [2, 0.5]], dtype=float)]}])
    rows = []
    for fi, f in enumerate(froms):
        for ti, t in enumerate(tos):
            fb, tb = _bx(f), _bx(t)
            rows.append((fi, ti, f"f{fi}", f"t{ti}",
                         bytearray(G.wkb_dumps(f)), "polygon", bytearray(G.wkb_dumps(t)),
                         *fb, *tb, False, False))
    df = spark.createDataFrame(rows, _PAIRS_SCHEMA).coalesce(1)
    key = lambda r: (r["from_id"], r["to_id"])  # noqa: E731
    batched = sorted(refine_pairs(df, batch_general=True).collect(), key=key)
    scalar = sorted(refine_pairs(df, batch_general=False).collect(), key=key)
    assert len(batched) == len(scalar) > 10
    for b, s in zip(batched, scalar):
        assert key(b) == key(s)
        # identical vertices (bytes); measures agree to the shoelace
        # summation-order ulp (the batched shoelace masks padded slots,
        # the scalar one walks the closed ring)
        assert bytes(b["geom_wkb"]) == bytes(s["geom_wkb"])
        assert b["measure"] == pytest.approx(s["measure"], rel=1e-12)


def test_convex_cover_batch_bit_identical_to_scalar():
    """convex_cover_flat / convex_cover_batch must reproduce
    geom._convex_cover EXACTLY (same piece count, same float vertices)
    on convex rings, concave simple rings, stars, axis-aligned
    C-shapes with collinear runs, degenerate rings, and random
    self-intersecting walks — the flat cover is what the concave
    refine tier clips, so any drift here is a wrong overlay geometry."""
    from pandarus_spark.geometry import batch as B
    from pandarus_spark.geometry import geom as G

    rng = np.random.default_rng(7)
    s = 1.1
    rel = np.array([[0, 0], [s, 0], [s, s / 2], [s / 2, s / 2], [s / 2, s], [0, s]])
    rings = [rel + rng.uniform(-100, 100, 2) for _ in range(20)]
    for _ in range(20):                      # stars: many slabs per ring
        n = int(rng.integers(5, 12))
        ang = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False) + rng.uniform(0, 1)
        rad = np.where(np.arange(2 * n) % 2 == 0,
                       rng.uniform(1.5, 3), rng.uniform(0.3, 1))
        c = rng.uniform(-50, 50, 2)
        rings.append(np.column_stack([c[0] + rad * np.cos(ang),
                                      c[1] + rad * np.sin(ang)]))
    for _ in range(60):                      # random walks, often self-intersecting
        rings.append(rng.uniform(-10, 10, (int(rng.integers(4, 15)), 2)))
    for _ in range(15):                      # convex fans
        n = int(rng.integers(3, 10))
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        rings.append(np.column_stack([3 * np.cos(ang), 3 * np.sin(ang)])
                     + rng.uniform(-5, 5, 2))
    rings.append(np.array([[0, 0], [3, 0], [3, 1], [1, 1], [1, 2], [3, 2],
                           [3, 3], [0, 3]], dtype=float))       # C-shape
    rings.append(np.array([[0, 0], [1, 0], [2, 0], [2, 2], [0, 2]],
                          dtype=float))                         # collinear verts
    rings.append(np.array([[0, 0], [1, 0], [1, 0], [1, 1]], dtype=float))
    rings.append(np.array([[0, 0], [1, 0], [2, 0]], dtype=float))  # zero area

    pts, cnt = B.pad_rings(rings)
    covers = B.convex_cover_batch(pts, cnt)
    for i in range(len(rings)):
        c = int(cnt[i])
        closed = np.vstack([pts[i, :c], pts[i, :1]])
        want = G._convex_cover(closed)
        got = covers[i]
        assert len(got) == len(want), f"ring {i}: {len(got)} != {len(want)} pieces"
        for w, g in zip(want, got):
            assert w.shape == g.shape and np.array_equal(w, g), f"ring {i}"


def test_concave_pair_cap_defers_to_scalar(spark, monkeypatch):
    """Rows whose cover fan-out exceeds _CONCAVE_PAIR_CAP must fall to
    the scalar tier and still produce the identical result."""
    import pandarus_spark.operators.intersect as I
    from pandarus_spark.operators.intersect import refine_pairs

    star = _star(0.8, 0.9, 0.3, 0.9, n=9)     # 18-vertex concave: 16 quads
    box = {"type": "Polygon", "coordinates": [np.array(
        [[0, 0], [1.5, 0], [1.5, 1.5], [0, 1.5], [0, 0]], dtype=float)]}

    def _bx(g):
        r = np.asarray(g["coordinates"][0])
        return float(r[:, 0].min()), float(r[:, 1].min()), float(r[:, 0].max()), float(r[:, 1].max())

    rows = [(0, 0, "f0", "t0", bytearray(G.wkb_dumps(star)), "polygon",
             bytearray(G.wkb_dumps(box)), *_bx(star), *_bx(box), False, False)]
    df = spark.createDataFrame(rows, _PAIRS_SCHEMA).coalesce(1)
    want = refine_pairs(df, batch_general=False).collect()

    monkeypatch.setattr(I, "_CONCAVE_PAIR_CAP", 4)   # force the deferral
    got = refine_pairs(df, batch_general=True).collect()
    assert len(got) == len(want) == 1
    assert got[0]["measure"] == want[0]["measure"]
    assert bytes(got[0]["geom_wkb"]) == bytes(want[0]["geom_wkb"])
