"""Tests for the distance join, hierarchical cell rollup, and
line-level dedup operators (graft additions — the reference has no
distance/aggregation/line-dedup surface; SURVEY.md §2 extension rows)."""

import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from pandarus_spark.operators.dedup import line_dedup, line_dedup_sql
from pandarus_spark.operators.distance import (
    EARTH_R, distance_join, haversine_m, haversine_m_sql, radius_resolution)
from pandarus_spark.operators.rollup import (
    parent_cell, parent_cell_sql, tile_rollup, tile_rollup_levels)
from pandarus_spark.tiling.cells import MAX_RES, RES_SHIFT, Y_SHIFT, cell_id


def hav_py(lon1, lat1, lon2, lat2):
    """Driver-side haversine with the exact same operation order as the
    Column/SQL renderings (explicit products, not pow)."""
    sp = math.sin(math.radians(lat2 - lat1) / 2.0)
    sl = math.sin(math.radians(lon2 - lon1) / 2.0)
    a = (sp * sp + math.cos(math.radians(lat1)) * math.cos(math.radians(lat2))
         * sl * sl)
    return 2.0 * EARTH_R * math.asin(min(1.0, math.sqrt(a)))


# ---------------------------------------------------------------------------
# distance_join
# ---------------------------------------------------------------------------


def _fuzz_points(seed=42, per_cluster=12):
    """Clusters at the equator, mid-latitudes, near the pole, and on
    both sides of the antimeridian — the docstring's hard cases."""
    rng = random.Random(seed)
    pts, pid = [], 0
    for clon, clat, spread in [(0, 0, 3), (30, 45, 3), (10, 88, 5),
                               (179.5, -40, 3), (-179.5, -40, 3)]:
        for _ in range(per_cluster):
            lon = ((clon + rng.uniform(-spread, spread) + 180.0) % 360.0) - 180.0
            lat = max(-90.0, min(90.0, clat + rng.uniform(-spread, spread)))
            pts.append((pid, lon, lat))
            pid += 1
    return pts


def _brute_pairs(pts, radius):
    return {(a[0], b[0]) for a in pts for b in pts
            if a[0] < b[0] and hav_py(a[1], a[2], b[1], b[2]) <= radius}


@pytest.mark.parametrize("seed,radius", [(42, 300_000.0), (7, 120_000.0),
                                         (13, 900_000.0)])
def test_distance_join_fuzz_vs_brute(spark, seed, radius):
    pts = _fuzz_points(seed)
    df = spark.createDataFrame(pts, "pid long, lon double, lat double")
    out = distance_join(df.withColumnRenamed("pid", "a"),
                        df.withColumnRenamed("pid", "b"), radius)
    rows = out.filter(F.col("a") < F.col("b")).collect()
    got = {(r["a"], r["b"]) for r in rows}
    assert got == _brute_pairs(pts, radius)
    # distances agree with the driver-side kernel to the ulp
    by_id = {p[0]: p for p in pts}
    for r in rows:
        a, b = by_id[r["a"]], by_id[r["b"]]
        assert r["dist_m"] == pytest.approx(hav_py(a[1], a[2], b[1], b[2]),
                                            rel=1e-12)


def test_distance_join_antimeridian_pair(spark):
    """A pair straddling ±180 must be found even though their raw cells
    sit at opposite ends of the x index."""
    df = spark.createDataFrame([(1, 179.9, 10.0), (2, -179.9, 10.0)],
                               "pid long, lon double, lat double")
    out = distance_join(df.withColumnRenamed("pid", "a"),
                        df.withColumnRenamed("pid", "b"), 50_000.0)
    pairs = {(r["a"], r["b"]) for r in out.collect()}
    assert (1, 2) in pairs and (2, 1) in pairs


def test_distance_join_res_validation(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0)], "pid long, lon double, lat double")
    auto = radius_resolution(300_000.0)
    with pytest.raises(ValueError, match="finer than the radius"):
        distance_join(df, df, 300_000.0, res=auto + 1)
    # coarser is allowed and gives identical pairs
    out = distance_join(df.withColumnRenamed("pid", "a"),
                        df.withColumnRenamed("pid", "b"),
                        300_000.0, res=max(0, auto - 2))
    assert out.count() == 1


def test_distance_join_reserved_columns(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0, 9)],
                               "pid long, lon double, lat double, __cell long")
    with pytest.raises(ValueError, match="reserved column"):
        distance_join(df, df, 1000.0)


def test_distance_join_payload_suffixes(spark):
    l = spark.createDataFrame([(1, 0.0, 0.0, "L")],
                              "pid long, lon double, lat double, tag string")
    r = spark.createDataFrame([(2, 0.1, 0.1, "R")],
                              "pid long, lon double, lat double, tag string")
    out = distance_join(l, r, 100_000.0)
    cols = set(out.columns)
    assert {"pid_l", "pid_r", "tag_l", "tag_r",
            "lon_l", "lat_l", "lon_r", "lat_r", "dist_m"} <= cols
    row = out.collect()[0]
    assert (row["pid_l"], row["pid_r"], row["tag_l"], row["tag_r"]) == (1, 2, "L", "R")


def test_radius_resolution_monotone():
    prev = None
    for radius in (1e3, 1e4, 1e5, 1e6, 1e7, 5e7):
        res = radius_resolution(radius)
        assert 0 <= res <= MAX_RES
        if prev is not None:
            assert res <= prev  # bigger radius -> coarser (or equal) cells
        prev = res
    with pytest.raises(ValueError):
        radius_resolution(0.0)


def test_haversine_sql_parity(spark):
    """Spark Column and DuckDB SQL renderings agree on the same inputs."""
    pts = [(0.0, 0.0, 1.0, 1.0), (179.9, 45.0, -179.9, 44.0),
           (10.0, 89.5, 12.0, 89.9), (-60.0, -33.0, -60.5, -33.2)]
    df = spark.createDataFrame(pts, "lon1 double, lat1 double, lon2 double, lat2 double")
    got = [r[0] for r in df.select(
        haversine_m(F.col("lon1"), F.col("lat1"),
                    F.col("lon2"), F.col("lat2"))).collect()]
    sql = haversine_m_sql("lon1", "lat1", "lon2", "lat2")
    con = duckdb.connect()
    for (lon1, lat1, lon2, lat2), g in zip(pts, got):
        (w,) = con.execute(
            f"SELECT {sql} FROM (SELECT {lon1!r} lon1, {lat1!r} lat1, "
            f"{lon2!r} lon2, {lat2!r} lat2)").fetchone()
        assert g == pytest.approx(w, rel=1e-12)


# ---------------------------------------------------------------------------
# tile rollup
# ---------------------------------------------------------------------------


def _parent_py(cid, to_res):
    res = cid >> RES_SHIFT
    ix = cid & ((1 << Y_SHIFT) - 1)
    iy = (cid >> Y_SHIFT) & ((1 << Y_SHIFT) - 1)
    return (to_res << RES_SHIFT) | ((iy >> (res - to_res)) << Y_SHIFT) \
        | (ix >> (res - to_res))


def _random_cells(seed=5, n=200, res=10):
    rng = random.Random(seed)
    lim = 1 << res
    return [cell_id(res, rng.randrange(lim), rng.randrange(lim))
            for _ in range(n)]


def test_parent_cell_matches_bitshift(spark):
    cells = _random_cells()
    df = spark.createDataFrame([(c,) for c in cells], "cell long")
    for to_res in (0, 3, 7, 10):
        got = [r[0] for r in df.select(parent_cell(F.col("cell"), to_res)).collect()]
        assert got == [_parent_py(c, to_res) for c in cells]


def test_parent_cell_sql_parity():
    cells = _random_cells(seed=9)
    con = duckdb.connect()
    for to_res in (2, 6, 10):
        expr = parent_cell_sql("cell", to_res)
        rows = con.execute(
            f"SELECT {expr} FROM (SELECT unnest({cells!r}) AS cell)").fetchall()
        assert [r[0] for r in rows] == [_parent_py(c, to_res) for c in cells]


def test_tile_rollup_counts_and_weights(spark):
    cells = _random_cells(seed=11, n=300, res=8)
    rows = [(c, float(i % 7)) for i, c in enumerate(cells)]
    df = spark.createDataFrame(rows, "cell long, w double")
    out = {r["parent_cell"]: (r["n"], r["total"])
           for r in tile_rollup(df, to_res=4, weight_col="w").collect()}
    want = {}
    for c, w in rows:
        p = _parent_py(c, 4)
        n, t = want.get(p, (0, 0.0))
        want[p] = (n + 1, t + w)
    assert set(out) == set(want)
    for p, (n, t) in want.items():
        assert out[p][0] == n
        assert out[p][1] == pytest.approx(round(t, 6))


def test_tile_rollup_levels_equals_per_level(spark):
    cells = _random_cells(seed=3, n=150, res=9)
    df = spark.createDataFrame([(c,) for c in cells], "cell long")
    multi = {(r["res"], r["cell"]): r["n"]
             for r in tile_rollup_levels(df, [2, 5, 9]).collect()}
    for lvl in (2, 5, 9):
        single = {r["parent_cell"]: r["n"]
                  for r in tile_rollup(df, to_res=lvl).collect()}
        assert {c: n for (res, c), n in multi.items() if res == lvl} == single


def test_tile_rollup_coarse_cell_raises(spark):
    df = spark.createDataFrame([(cell_id(2, 1, 1),)], "cell long")
    from py4j.protocol import Py4JJavaError
    with pytest.raises(Exception, match="coarser"):
        try:
            tile_rollup(df, to_res=5).collect()
        except Py4JJavaError as e:  # unwrap for the match
            raise RuntimeError(str(e)) from e


def test_tile_rollup_levels_validation(spark):
    df = spark.createDataFrame([(cell_id(5, 0, 0),)], "cell long")
    with pytest.raises(ValueError):
        tile_rollup_levels(df, [])
    with pytest.raises(ValueError):
        tile_rollup_levels(df, [MAX_RES + 1])


# ---------------------------------------------------------------------------
# line-level dedup
# ---------------------------------------------------------------------------


def test_line_dedup_hand_corpus(spark):
    docs = spark.createDataFrame(
        [(1, "a\nb\nc"), (2, "b\nd"), (3, "b\ne\na"), (4, " b \nf")],
        "doc_id long, text string")
    out = {r["doc_id"]: (r["n_lines"], r["n_kept"])
           for r in line_dedup(docs, min_count=2).collect()}
    # 'b' occurs 4x (doc4's ' b ' trims equal) -> only doc1's kept;
    # 'a' occurs 2x -> doc1's kept, doc3's dropped
    assert out == {1: (3, 3), 2: (2, 1), 3: (3, 1), 4: (2, 1)}


def test_line_dedup_null_and_empty(spark):
    docs = spark.createDataFrame([(1, None), (2, None), (3, "x")],
                                 "doc_id long, text string")
    out = {r["doc_id"]: (r["n_lines"], r["n_kept"])
           for r in line_dedup(docs, min_count=2).collect()}
    # NULL ~ '' = one empty line; the two empty lines are duplicates,
    # first (doc 1) survives
    assert out == {1: (1, 1), 2: (1, 0), 3: (1, 1)}


def test_line_dedup_min_count_3_keeps_pairs(spark):
    docs = spark.createDataFrame([(1, "a\nz"), (2, "a\nz"), (3, "b\nz")],
                                 "doc_id long, text string")
    out = {r["doc_id"]: r["n_kept"]
           for r in line_dedup(docs, min_count=3).collect()}
    # 'z' occurs 3x -> dedup'd (docs 2,3 lose it); 'a' occurs only 2x,
    # below min_count, so BOTH copies survive (doc2 keeps its 'a')
    assert out == {1: 2, 2: 1, 3: 1}


def test_line_dedup_duckdb_parity(spark):
    rng = random.Random(17)
    vocab = ["alpha", "beta", "gamma", "delta", "", "  beta  "]
    docs = [(i, "\n".join(rng.choice(vocab)
                          for _ in range(rng.randrange(1, 6))))
            for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(tuple(r) for r in line_dedup(df, min_count=2).collect())
    import pandas as pd
    con = duckdb.connect()
    docs_pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    con.execute("CREATE TABLE documents AS SELECT * FROM docs_pdf")
    want = sorted(tuple(r) for r in
                  con.execute(line_dedup_sql(min_count=2)).fetchall())
    assert got == want
