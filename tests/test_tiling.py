"""Cell-index unit tests, including SQL-parity: the tile id of a point
computed by the numpy path must equal the ANSI-SQL rendering evaluated
by DuckDB (the independent-oracle contract)."""

import duckdb
import numpy as np

from pandarus_spark.tiling import cells as C


def test_point_cell_roundtrip():
    ix, iy = C.lonlat_to_xy(np.array([0.3]), np.array([45.0]), 8)
    cid = C.cell_id(8, int(ix[0]), int(iy[0]))
    b = C.cell_bounds(cid)
    assert b[0] <= 0.3 <= b[2] and b[1] <= 45.0 <= b[3]
    assert C.cell_res(cid) == 8
    assert C.cell_xy(cid) == (int(ix[0]), int(iy[0]))


def test_cover_bbox_superset():
    cover = C.cover_bbox(0.0, 0.0, 2.0, 2.0, 8)
    for lon, lat in [(0.0, 0.0), (1.99, 1.99), (1.0, 0.5)]:
        ix, iy = C.lonlat_to_xy(np.array([lon]), np.array([lat]), 8)
        assert C.cell_id(8, int(ix[0]), int(iy[0])) in cover


def test_parent_chain():
    ix, iy = C.lonlat_to_xy(np.array([10.0]), np.array([10.0]), 10)
    cid = C.cell_id(10, int(ix[0]), int(iy[0]))
    p = C.parent(cid, 7)
    assert C.cell_res(p) == 7
    pb, cb = C.cell_bounds(p), C.cell_bounds(cid)
    assert pb[0] <= cb[0] and pb[1] <= cb[1] and pb[2] >= cb[2] and pb[3] >= cb[3]


def test_pick_resolution_bounds_fanout():
    # world-sized bbox -> res 0; tiny bbox -> target res
    assert C.pick_resolution(-180, -90, 180, 90, target_res=12, max_cells=64) <= 3
    assert C.pick_resolution(0, 0, 0.001, 0.001, target_res=12, max_cells=64) == 12
    for res in range(13):
        cover = C.cover_bbox(-120, -60, 130, 70, C.pick_resolution(-120, -60, 130, 70, res, 64), )
        assert len(cover) <= 64


def test_kring():
    ix, iy = C.lonlat_to_xy(np.array([0.0]), np.array([0.0]), 6)
    cid = C.cell_id(6, int(ix[0]), int(iy[0]))
    ring = C.kring(cid, 1)
    assert len(ring) == 9 and cid in ring


def test_sql_parity_with_duckdb():
    res = 9
    rng = np.random.default_rng(42)
    lons = rng.uniform(-179.9, 179.9, 200)
    lats = rng.uniform(-89.9, 89.9, 200)
    ix, iy = C.lonlat_to_xy(lons, lats, res)
    py_cells = [(res << C.RES_SHIFT) | (int(y) << C.Y_SHIFT) | int(x) for x, y in zip(ix, iy)]
    con = duckdb.connect()
    con.register("pts", __import__("pandas").DataFrame({"lon": lons, "lat": lats}))
    expr = C.point_cell_sql("lon", "lat", res)
    sql_cells = [r[0] for r in con.execute(f"SELECT {expr} FROM pts").fetchall()]
    assert py_cells == sql_cells


def test_batch_cover_matches_scalar_loop():
    """cover_features_batch == per-feature pick_resolution +
    cover_with_parents/cover_bbox on random bboxes (including
    domain-edge clipping and multi-level ancestor chains)."""
    rng = np.random.default_rng(7)
    n = 300
    cx = rng.uniform(-185, 185, n)          # some past the domain edge
    cy = rng.uniform(-95, 95, n)
    w = 10 ** rng.uniform(-4, 1.2, n)       # spans 1e-4 .. ~16 degrees
    h = 10 ** rng.uniform(-4, 1.2, n)
    minx, maxx = cx - w / 2, cx + w / 2
    miny, maxy = cy - h / 2, cy + h / 2

    for parents_to in (None, 0, 3, 9):
        fpos, cells, native = C.cover_features_batch(
            minx, miny, maxx, maxy, target_res=10, max_cells=64,
            parents_to=parents_to)
        got = {}
        for p, c in zip(fpos, cells):
            got.setdefault(int(p), set()).add(int(c))
        for i in range(n):
            r = C.pick_resolution(minx[i], miny[i], maxx[i], maxy[i],
                                  target_res=10, max_cells=64)
            assert native[i] == r
            if parents_to is not None and parents_to < r:
                want = set(C.cover_with_parents(minx[i], miny[i], maxx[i], maxy[i],
                                                r, min_res=parents_to))
            else:
                want = set(C.cover_bbox(minx[i], miny[i], maxx[i], maxy[i], r))
            assert got.get(i, set()) == want, (i, parents_to)


def test_knn_cell_udf_matches_kring(spark):
    """The vectorized k-ring inside knn's cell UDF must emit the same
    cell set as the scalar C.kring, including lon wrap and lat edges."""
    import pandas as pd
    from pandarus_spark.operators.knn import _cell_udf
    fn = _cell_udf(6, ring=2).func  # unwrap the pandas_udf
    qx = pd.Series([0.0, 179.95, -179.95, 0.0, 0.0])
    qy = pd.Series([0.0, 10.0, -10.0, 89.9, -89.9])
    got = fn(qx, qy)
    for x, y, cells in zip(qx, qy, got):
        ix, iy = C.lonlat_to_xy(np.array([x]), np.array([y]), 6)
        want = set(C.kring(C.cell_id(6, int(ix[0]), int(iy[0])), 2))
        assert set(cells) == want
