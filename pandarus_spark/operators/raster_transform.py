"""Raster normalization + vectorization operators.

Reference:

* ``clean_raster`` (core.py:574-657) — replace a pathological nodata
  sentinel with the first unused candidate of ``[user, -1, -99, -999,
  -9999]``, map NaN to nodata, downcast float64→float32 when all values
  fit.
* ``round_raster`` (core.py:660-697, kernel utils/conversion.py:54-61)
  — round every cell to N significant digits.
* ``convert_to_vector`` (core.py:536-571 + helpers.py:12-93) —
  polygonize contiguous same-value regions.

All three act on the cell-DataFrame raster representation
(operators/raster_stats.py).  clean/round are pure Catalyst column
expressions (whole-stage-codegen, no Python in the hot path); the
candidate-availability probe and the downcast-range check in clean are
single global aggregates.  convert_to_vector groups by value (regions
of different values can never merge) and runs a union-find connected
component pass per group in an Arrow batch.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..geometry import geom as G

NODATA_CANDIDATES = [-1.0, -99.0, -999.0, -9999.0]
_F32_MAX = float(np.finfo(np.float32).max)


def clean_raster(cells: DataFrame, nodata: float | None, user_nodata: float | None = None,
                 value_col: str = "value") -> tuple[DataFrame, float, bool]:
    """Returns (cleaned cells, new_nodata, downcast_to_float32).

    Mirrors core.py:608-642: candidate nodata must not collide with an
    existing data value; ValueError when every candidate is taken."""
    v = F.col(value_col)
    candidates = ([user_nodata] if user_nodata is not None else []) + NODATA_CANDIDATES
    probes = [F.max((v == F.lit(c)).cast("int")).alias(f"c{i}") for i, c in enumerate(candidates)]
    probes.append(F.max(F.abs(F.when(F.isnan(v), None).otherwise(v))).alias("absmax"))
    row = cells.agg(*probes).collect()[0]
    new_nodata = None
    for i, c in enumerate(candidates):
        if not row[f"c{i}"]:
            new_nodata = float(c)
            break
    if new_nodata is None:
        raise ValueError("no nodata candidate available "
                         "(reference core.py:628-632)")
    downcast = row["absmax"] is not None and float(row["absmax"]) <= _F32_MAX

    is_nodata = F.isnan(v) | v.isNull()
    if nodata is not None:
        # isclose semantics (core.py:625): abs(v-nd) <= atol + rtol*|nd|
        is_nodata = is_nodata | (F.abs(v - F.lit(nodata)) <= F.lit(1e-8) + F.lit(1e-5) * F.lit(abs(nodata)))
    cleaned = cells.withColumn(value_col, F.when(is_nodata, F.lit(new_nodata)).otherwise(v))
    if downcast:
        cleaned = cleaned.withColumn(value_col, v.cast("float").cast("double"))
    return cleaned, new_nodata, downcast


def round_raster(cells: DataFrame, sig_digits: int = 3, value_col: str = "value") -> DataFrame:
    """Significant-digit rounding as a pure Catalyst expression
    (reference kernel utils/conversion.py:54-61):
    ``m = 10^(sig-1-floor(log10(|v|)))``, ``round(v*m)/m``; zeros pass
    through; result float32 like the reference's LZW GTiff output."""
    v = F.col(value_col)
    m = F.pow(F.lit(10.0), F.lit(float(sig_digits - 1)) - F.floor(F.log10(F.abs(v))))
    rounded = F.when(v == 0.0, F.lit(0.0)).otherwise(F.round(v * m, 0) / m)
    return cells.withColumn(value_col, rounded.cast("float").cast("double"))


VECTORIZE_SCHEMA = "id bigint, val double, geom_wkb binary"
_TILE_PART_SCHEMA = ("val double, rkey bigint, kind string, geom_wkb binary, "
                     "row bigint, col bigint")


def _polygonize_group(pdf, value_col: str, emit_boundary_mod: int | None = None):
    """Union-find polygonize of one (value[, tile]) cell group.

    Returns (regions, boundary): regions = [(rkey, val, wkb)] with
    rkey = min cell key (row*2^32+col) of the region — a canonical,
    order-independent region id — and MultiPolygon parts sorted by
    (minx, miny); boundary = [(rkey, row, col)] for cells on the tile
    edge (``emit_boundary_mod`` = tile size) — the cells whose regions
    may continue in a neighboring tile."""
    val = float(pdf[value_col].iloc[0])
    rows = pdf["row"].to_numpy(); cols = pdf["col"].to_numpy()
    idx = {(int(r), int(c)): i for i, (r, c) in enumerate(zip(rows, cols))}
    parent = list(range(len(pdf)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(i, j):
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[ri] = rj

    for (r, c), i in idx.items():
        for nb in ((r + 1, c), (r, c + 1)):
            if nb in idx:
                union(i, idx[nb])
    groups: dict[int, list[int]] = {}
    for i in range(len(pdf)):
        groups.setdefault(find(i), []).append(i)

    mnx = pdf["minx"].to_numpy(); mny = pdf["miny"].to_numpy()
    mxx = pdf["maxx"].to_numpy(); mxy = pdf["maxy"].to_numpy()
    keys = rows.astype(np.int64) * (1 << 32) + cols.astype(np.int64)
    regions, boundary = [], []
    for members in groups.values():
        rkey = int(min(keys[i] for i in members))
        members = sorted(members, key=lambda i: (mnx[i], mny[i]))
        polys = [[np.array([[mnx[i], mny[i]], [mxx[i], mny[i]], [mxx[i], mxy[i]],
                            [mnx[i], mxy[i]], [mnx[i], mny[i]]])] for i in members]
        regions.append((rkey, val,
                        G.wkb_dumps({"type": "MultiPolygon", "coordinates": polys})))
        if emit_boundary_mod is not None:
            t = emit_boundary_mod
            for i in members:
                r, c = int(rows[i]), int(cols[i])
                if r % t in (0, t - 1) or c % t in (0, t - 1):
                    boundary.append((rkey, r, c))
    return regions, boundary


def _clip_ring_lon(lon: np.ndarray, lat: np.ndarray, lo: float, hi: float):
    """Sutherland–Hodgman clip of a closed ring against the vertical
    strip ``lo <= lon <= hi``; returns a closed (N,2) array or None
    when the intersection is empty/degenerate."""
    pts = list(zip(lon[:-1].tolist(), lat[:-1].tolist()))  # open ring

    def clip_edge(pts, keep, bound):
        out = []
        n = len(pts)
        for i in range(n):
            a, b = pts[i], pts[(i + 1) % n]
            ia, ib = keep(a), keep(b)
            if ia:
                out.append(a)
            if ia != ib:
                t = (bound - a[0]) / (b[0] - a[0])
                out.append((bound, a[1] + t * (b[1] - a[1])))
        return out

    pts = clip_edge(pts, lambda p: p[0] >= lo, lo)
    if len(pts) >= 3:
        pts = clip_edge(pts, lambda p: p[0] <= hi, hi)
    if len(pts) < 3:
        return None
    arr = np.asarray(pts + [pts[0]], dtype=np.float64)
    if abs(G.ring_area(arr)) == 0.0:
        return None  # zero-width sliver exactly on the cut line
    return arr


def _warp_poly_to_wgs84(rings, crs: str) -> list:
    """One cell-box polygon (single exterior ring — the polygonizer
    never emits holes) → WGS84 polygon(s), CUT at the antimeridian
    like the reference's ``transform_geom(..., antimeridian_cutting=
    True)`` (helpers.py:70-71): inverse-project the vertices, unwrap
    longitudes into a continuous run, clip against each 360°-strip the
    ring touches, shift every piece back into [-180, 180]."""
    from ..geometry.projection import to_wgs84
    ring = np.asarray(rings[0], dtype=np.float64).reshape(-1, 2)
    lon, lat = to_wgs84(ring[:, 0], ring[:, 1], crs)
    lon = np.asarray(lon, dtype=np.float64).copy()
    lat = np.asarray(lat, dtype=np.float64)
    d = np.diff(lon)
    lon[1:] += np.cumsum(np.where(d > 180.0, -360.0, np.where(d < -180.0, 360.0, 0.0)))
    k_lo = int(np.floor((lon.min() + 180.0) / 360.0))
    k_hi = int(np.floor((lon.max() + 180.0) / 360.0))
    # ring entirely inside one strip: no interpolation, vertices pass
    # through exactly (modulo the ±360k normalization shift)
    pieces = []
    for k in range(k_lo, k_hi + 1):
        arr = _clip_ring_lon(lon, lat, -180.0 + 360.0 * k, 180.0 + 360.0 * k)
        if arr is None:
            continue
        arr[:, 0] -= 360.0 * k
        pieces.append([arr])
    return pieces


def _warp_regions_to_wgs84(df: DataFrame, crs: str) -> DataFrame:
    """Post-pass of :func:`convert_to_vector` for projected rasters:
    every region's cell boxes are inverse-projected to WGS84 with
    antimeridian cutting (round-2 verdict item #5 — the reference
    guarantees WGS84 polygons for ANY raster CRS, helpers.py:70-71).
    Geographic rasters return unchanged (no extra stage)."""
    from ..geometry.projection import is_geographic
    if is_geographic(crs):
        return df

    def gen(batches):
        for pdf in batches:
            out = []
            for wkb in pdf["geom_wkb"]:
                g = G.wkb_loads(bytes(wkb))
                parts = []
                for poly in g["coordinates"]:
                    parts.extend(_warp_poly_to_wgs84(poly, crs))
                # canonical order in OUTPUT space (the raster-CRS sort
                # upstream no longer survives the warp)
                parts.sort(key=lambda p: (float(np.min(p[0][:, 0])),
                                          float(np.min(p[0][:, 1]))))
                out.append(G.wkb_dumps({"type": "MultiPolygon",
                                        "coordinates": parts}))
            yield pdf.assign(geom_wkb=out)

    return df.mapInPandas(gen, schema=VECTORIZE_SCHEMA)


def convert_to_vector(cells: DataFrame, value_col: str = "value",
                      strategy: str = "global", tile: int = 512,
                      crs: str = "EPSG:4326") -> DataFrame:
    """Polygonize: contiguous (4-connected) same-value cell regions →
    MultiPolygon of cell boxes, properties (id, val) — the reference
    emits {filename, id, val} (helpers.py:63-72); filename is a sink
    concern here.  ``id`` is the region's minimum cell key
    (row*2^32+col) — canonical across strategies.

    ``crs`` is the raster's CRS (the cell bboxes' coordinate system).
    Output polygons are ALWAYS WGS84, antimeridian-cut, matching the
    reference's ``transform_geom(src.crs, "EPSG:4326", ...,
    antimeridian_cutting=True)`` (helpers.py:70-71); for geographic
    rasters the warp is a no-op.

    ``strategy="global"`` groups by value only (different values never
    share a region) — right when no single value dominates the raster.
    ``strategy="tiles"`` is the 100 TB path: polygonize each
    ``tile``×``tile`` block independently (bounded memory per task, one
    narrow shuffle on (value, tile)), then stitch regions that touch
    across tile edges with the distributed connected-components pass
    (`dedup.duplicate_clusters` — large-star/small-star), and merge
    only the stitched regions' geometry.  Both strategies produce
    byte-identical output (pinned by tests)."""
    if strategy == "global":
        def fn(pdf):
            import pandas as pd
            regions, _ = _polygonize_group(pdf, value_col)
            regions.sort()
            return pd.DataFrame({
                "id": pd.Series([r[0] for r in regions], dtype="int64"),
                "val": pd.Series([r[1] for r in regions], dtype="float64"),
                "geom_wkb": [r[2] for r in regions]})
        return _warp_regions_to_wgs84(
            cells.groupBy(value_col).applyInPandas(fn, schema=VECTORIZE_SCHEMA), crs)

    if strategy != "tiles":
        raise ValueError(f"unknown strategy {strategy!r}")
    t = int(tile)

    def fn_tile(pdf):
        import pandas as pd
        regions, boundary = _polygonize_group(pdf, value_col, emit_boundary_mod=t)
        out = {"val": [], "rkey": [], "kind": [], "geom_wkb": [], "row": [], "col": []}
        val = float(pdf[value_col].iloc[0])
        for rkey, v, wkb in regions:
            out["val"].append(v); out["rkey"].append(rkey); out["kind"].append("region")
            out["geom_wkb"].append(wkb); out["row"].append(-1); out["col"].append(-1)
        for rkey, r, c in boundary:
            out["val"].append(val); out["rkey"].append(rkey); out["kind"].append("edge")
            out["geom_wkb"].append(None); out["row"].append(r); out["col"].append(c)
        return pd.DataFrame({"val": pd.Series(out["val"], dtype="float64"),
                             "rkey": pd.Series(out["rkey"], dtype="int64"),
                             "kind": out["kind"], "geom_wkb": out["geom_wkb"],
                             "row": pd.Series(out["row"], dtype="int64"),
                             "col": pd.Series(out["col"], dtype="int64")})

    tile_id = (F.floor(F.col("row") / t) * F.lit(1 << 31) + F.floor(F.col("col") / t))
    # localCheckpoint (not persist): materialized once for the three
    # downstream uses, and its blocks are released by the ContextCleaner
    # when the DataFrame goes out of scope — a plain .persist() here
    # would leak cached tile parts for the application lifetime, since
    # nothing can unpersist after returning a lazy result
    parts = (cells.withColumn("_tile", tile_id)
             .groupBy(value_col, "_tile").applyInPandas(fn_tile, schema=_TILE_PART_SCHEMA)
             .localCheckpoint(eager=True))
    regions = parts.filter(F.col("kind") == "region").select("val", "rkey", "geom_wkb")
    bd = parts.filter(F.col("kind") == "edge").select("val", "rkey", "row", "col")

    # cross-tile adjacency: same value, 4-neighbor cells, different regions
    def nb_join(dr: int, dc: int):
        a = bd.select(F.col("val").alias("v"), F.col("rkey").alias("ra"),
                      (F.col("row") + dr).alias("nr"), (F.col("col") + dc).alias("nc"))
        b = bd.select(F.col("val").alias("v"), F.col("rkey").alias("rb"),
                      F.col("row").alias("nr"), F.col("col").alias("nc"))
        return a.join(b, ["v", "nr", "nc"]).select("ra", "rb")

    edges = (nb_join(1, 0).unionByName(nb_join(0, 1))
             .filter(F.col("ra") != F.col("rb")))

    from .dedup import duplicate_clusters
    comp = duplicate_clusters(edges, a_col="ra", b_col="rb", id_col="rkey")         .withColumnRenamed("cluster_id", "_comp")

    merged_members = regions.join(comp, "rkey")
    untouched = regions.join(comp, "rkey", "left_anti")         .select(F.col("rkey").alias("id"), "val", "geom_wkb")

    def fn_merge(pdf):
        import pandas as pd
        parts_all = []
        for wkb in pdf["geom_wkb"]:
            parts_all.extend(G.wkb_loads(bytes(wkb))["coordinates"])
        parts_all.sort(key=lambda p: (float(p[0][0][0]), float(p[0][0][1])))
        wkb = G.wkb_dumps({"type": "MultiPolygon", "coordinates": parts_all})
        return pd.DataFrame({"id": pd.Series([int(pdf["_comp"].iloc[0])], dtype="int64"),
                             "val": pd.Series([float(pdf["val"].iloc[0])], dtype="float64"),
                             "geom_wkb": [wkb]})

    stitched = merged_members.groupBy("_comp").applyInPandas(fn_merge,
                                                             schema=VECTORIZE_SCHEMA)
    return _warp_regions_to_wgs84(untouched.unionByName(stitched), crs)
