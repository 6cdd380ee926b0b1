"""Vector × vector spatial overlay join (the reference's flagship).

Reference: ``pandarus.intersect`` (core.py:31-187) — for every feature
pair (first × second) that spatially intersects, emit the intersection
geometry (as Multi*) plus its Mollweide measure (m² / m / point count).
The reference runs an R-tree nested loop per multiprocessing worker
(utils/multiprocess.py:47-187); here the same semantics become a
declarative Spark plan:

    features1 ─ cover(cells) ─ explode ─┐
                                        ├─ equi-join on cell ─ pair dedup
    features2 ─ cover(cells) ─ explode ─┘        │
                                                 ▼
                     join back WKBs (broadcast small side)
                                                 ▼
                 mapInPandas refine: exact intersection + measure
                                                 ▼
                        join labels → output rows

Scale design (north_rule):

* candidate generation is a **hash join on cell id** — Catalyst picks
  shuffled-hash/sort-merge/broadcast; AQE rebalances.
* **adaptive resolution**: per-feature cover capped at ``max_cells``
  cells; features forced coarser emit their cover at a coarser level
  and the opposite side emits the ancestor chain so the pair still
  collides (tiling/cells.py:cover_with_parents rationale).
* **hot-cell salting**: cells whose build-side row count exceeds
  ``salt_threshold`` are split across ``salt_buckets`` shuffle keys
  (deterministic hash salt on one side, explode on the other); pair
  dedup afterwards makes salting result-invariant.
* geometry bytes do NOT travel through the cell shuffle — only ids do;
  WKB is joined back after pair dedup.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..geometry import geom as G
from ..geometry.projection import mollweide_forward
from ..tiling import cells as C

PAIR_REFINE_SCHEMA = ("from_id bigint, to_id bigint, from_label string, to_label string, "
                      "measure double, geom_wkb binary")

DEFAULT_TARGET_RES = 12
DEFAULT_MAX_CELLS = 64


def cover_features(features: DataFrame, res: int, max_cells: int = DEFAULT_MAX_CELLS,
                   with_parents_to: int | None = None, with_meta: bool = False) -> DataFrame:
    """(feature_id, cell) tile-assignment relation for one side.

    Cover at ``res`` (per-feature coarser when the bbox would exceed
    ``max_cells``); optionally also emit the ancestor chain down to
    ``with_parents_to`` so mixed-resolution sides still collide.

    ``with_meta`` adds (native_res, minx, miny) per row — required by
    the reference-point pair dedup in :func:`candidate_pairs`."""

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            mnx = pdf["minx"].to_numpy(); mny = pdf["miny"].to_numpy()
            mxx = pdf["maxx"].to_numpy(); mxy = pdf["maxy"].to_numpy()
            fpos, cells, native = C.cover_features_batch(
                mnx, mny, mxx, mxy, target_res=res, max_cells=max_cells,
                parents_to=with_parents_to)
            fids = pdf["feature_id"].to_numpy(dtype="int64")[fpos]
            out = {"feature_id": pd.Series(fids, dtype="int64"),
                   "cell": pd.Series(cells, dtype="int64")}
            if with_meta:
                out["native_res"] = pd.Series(native[fpos].astype("int32"), dtype="int32")
                out["minx"] = pd.Series(mnx[fpos], dtype="float64")
                out["miny"] = pd.Series(mny[fpos], dtype="float64")
            yield pd.DataFrame(out)

    schema = "feature_id bigint, cell bigint"
    if with_meta:
        schema += ", native_res int, minx double, miny double"
    return features.select("feature_id", "minx", "miny", "maxx", "maxy") \
                   .mapInPandas(gen, schema=schema)


def _min_emit_res(features: DataFrame, res: int, max_cells: int) -> int:
    """Coarsest per-feature emission resolution on this side (tiny agg)."""

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            rs = C.pick_resolution_batch(pdf["minx"].to_numpy(), pdf["miny"].to_numpy(),
                                         pdf["maxx"].to_numpy(), pdf["maxy"].to_numpy(),
                                         target_res=res, max_cells=max_cells)
            yield pd.DataFrame({"r": pd.Series(rs if len(rs) else [res], dtype="int32")})

    row = (features.select("minx", "miny", "maxx", "maxy")
           .mapInPandas(gen, schema="r int").agg(F.min("r").alias("r")).collect())
    return int(row[0]["r"]) if row and row[0]["r"] is not None else res


def _owner_cell_filter():
    """Reference-point dedup (the standard PBSM/Sedona trick, here
    generalized to the multi-resolution grid): a candidate pair is kept
    ONLY by the unique cell that (a) sits at the pair's coarsest native
    resolution rr = min(from_native, to_native) and (b) contains the
    reference point (max of the two bbox minima).  Both sides are
    guaranteed to emit that cell (native cover on the coarser side, the
    ancestor chain on the finer side), so every bbox-overlapping pair
    survives exactly once — no dropDuplicates shuffle at all."""
    rr = F.least(F.col("f_native"), F.col("t_native"))
    # 2^rr (exact in double for rr <= 20; shiftleft needs a literal count)
    n = F.pow(F.lit(2.0), rr.cast("double")).cast("long")
    gx = F.greatest(F.col("f_minx"), F.col("t_minx"))
    gy = F.greatest(F.col("f_miny"), F.col("t_miny"))
    # must mirror tiling.cells.lonlat_to_xy exactly: floor((v-min)/span*n), clipped
    oix = F.least(F.greatest(F.floor((gx - F.lit(C.LON_MIN)) / F.lit(C.LON_SPAN) * n),
                             F.lit(0).cast("long")), n - 1)
    oiy = F.least(F.greatest(F.floor((gy - F.lit(C.LAT_MIN)) / F.lit(C.LAT_SPAN) * n),
                             F.lit(0).cast("long")), n - 1)
    mask = F.lit((1 << C.Y_SHIFT) - 1).cast("long")
    return ((F.shiftright(F.col("cell"), C.RES_SHIFT) == rr.cast("long"))
            & (F.col("cell").bitwiseAND(mask) == oix)
            & (F.shiftright(F.col("cell"), C.Y_SHIFT).bitwiseAND(mask) == oiy))


def _prepare_sides(features1: DataFrame, features2: DataFrame,
                   res: int, max_cells: int) -> tuple[int, int]:
    """One combined Spark job that (a) materializes both persisted
    feature tables (so concurrent plan subtrees don't race the cache),
    (b) computes each side's coarsest native resolution, and (c)
    validates the second side is polygonal (reference core.py:51-53) —
    replacing five separate driver actions."""
    from pyspark import StorageLevel
    for df in (features1, features2):
        if df.storageLevel == StorageLevel.NONE:
            df.persist(StorageLevel.MEMORY_AND_DISK)
    cols = ["kind", "minx", "miny", "maxx", "maxy"]
    u = (features1.select(F.lit(0).alias("side"), *cols)
         .unionByName(features2.select(F.lit(1).alias("side"), *cols)))

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            rs = C.pick_resolution_batch(pdf["minx"].to_numpy(), pdf["miny"].to_numpy(),
                                         pdf["maxx"].to_numpy(), pdf["maxy"].to_numpy(),
                                         target_res=res, max_cells=max_cells)
            yield pd.DataFrame({
                "side": pdf["side"].astype("int32"),
                "r": pd.Series(rs, dtype="int32"),
                "bad": ((pdf["side"] == 1) & (pdf["kind"] != "polygon")).astype("int32")})

    rows = (u.mapInPandas(gen, schema="side int, r int, bad int")
            .groupBy("side").agg(F.min("r").alias("lo"), F.max("bad").alias("bad"))
            .collect())
    d = {row["side"]: row for row in rows}
    if 1 in d and d[1]["bad"]:
        raise ValueError("second dataset must contain only polygons "
                         "(reference core.py:51-53)")
    lo1 = int(d[0]["lo"]) if 0 in d else res
    lo2 = int(d[1]["lo"]) if 1 in d else res
    return lo1, lo2


def candidate_pairs(features1: DataFrame, features2: DataFrame,
                    res: int = DEFAULT_TARGET_RES, max_cells: int = DEFAULT_MAX_CELLS,
                    salt_buckets: int = 0, salt_threshold: int = 50_000,
                    lo1: int | None = None, lo2: int | None = None) -> DataFrame:
    """Distinct (from_id, to_id) candidate pairs via the cell-key join.

    Multi-cell double-matches are eliminated by the owner-cell filter
    (:func:`_owner_cell_filter`) — a codegen'd predicate on the join
    output — instead of a ``dropDuplicates`` shuffle."""
    if lo1 is None:
        lo1 = _min_emit_res(features1, res, max_cells)
    if lo2 is None:
        lo2 = _min_emit_res(features2, res, max_cells)
    # each side emits ancestors down to the other side's coarsest level,
    # guaranteeing a shared key for any bbox overlap without emitting the
    # root cell globally (tiling/cells.py docstring).
    c1 = (cover_features(features1, res, max_cells, with_parents_to=min(lo2, res), with_meta=True)
          .withColumnRenamed("feature_id", "from_id")
          .withColumnRenamed("native_res", "f_native")
          .withColumnRenamed("minx", "f_minx").withColumnRenamed("miny", "f_miny"))
    c2 = (cover_features(features2, res, max_cells, with_parents_to=min(lo1, res), with_meta=True)
          .withColumnRenamed("feature_id", "to_id")
          .withColumnRenamed("native_res", "t_native")
          .withColumnRenamed("minx", "t_minx").withColumnRenamed("miny", "t_miny"))

    if salt_buckets > 1:
        hot = (c1.groupBy("cell").count().filter(F.col("count") >= salt_threshold)
               .select("cell").withColumn("hot", F.lit(True)))
        c1 = (c1.join(F.broadcast(hot), "cell", "left")
              .withColumn("salt", F.when(F.col("hot").isNotNull(),
                                         F.pmod(F.xxhash64("from_id"), F.lit(salt_buckets)))
                          .otherwise(F.lit(0)))
              .drop("hot"))
        c2 = (c2.join(F.broadcast(hot), "cell", "left")
              .withColumn("salt", F.explode(
                  F.when(F.col("hot").isNotNull(),
                         F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
                  .otherwise(F.array(F.lit(0)))))
              .drop("hot"))
        pairs = c1.join(c2, ["cell", "salt"])
    else:
        pairs = c1.join(c2, "cell")
    return pairs.filter(_owner_cell_filter()).select("from_id", "to_id")


# WKB prefix of MultiPolygon[1 Polygon[1 ring[5 pts]]] (little-endian):
# (01, uint32 6, uint32 1) (01, uint32 3, uint32 1, uint32 5) + 10 doubles
_RECT_WKB_PREFIX = (b"\x01\x06\x00\x00\x00\x01\x00\x00\x00"
                    b"\x01\x03\x00\x00\x00\x01\x00\x00\x00\x05\x00\x00\x00")


def _refine_rects(fminx, fminy, fmaxx, fmaxy, tminx, tminy, tmaxx, tmaxy):
    """Vectorized rect×rect refine: bbox clip + Mollweide shoelace area
    + bulk WKB assembly — zero per-row Python.  Returns (keep_mask,
    measures, wkb_list) where measures/wkbs align with keep_mask's True
    entries.  Same math as the general kernel (project ring corners,
    shoelace) so results agree to fp round-off."""
    ix0 = np.maximum(fminx, tminx); iy0 = np.maximum(fminy, tminy)
    ix1 = np.minimum(fmaxx, tmaxx); iy1 = np.minimum(fmaxy, tmaxy)
    # degenerate edge/corner touches drop; the 1e-12° floor matches the
    # general kernel's vertex-dedup epsilon so both paths agree on
    # ulp-wide slivers
    keep = (ix1 - ix0 > 1e-12) & (iy1 - iy0 > 1e-12)
    ix0, iy0, ix1, iy1 = ix0[keep], iy0[keep], ix1[keep], iy1[keep]
    n = len(ix0)
    if n == 0:
        return keep, np.empty(0), []
    # closed CCW ring (minx,miny)->(maxx,miny)->(maxx,maxy)->(minx,maxy)
    lons = np.stack([ix0, ix1, ix1, ix0, ix0], axis=1)
    lats = np.stack([iy0, iy0, iy1, iy1, iy0], axis=1)
    X, Y = mollweide_forward(lons, lats)
    area = 0.5 * np.abs(np.sum(X[:, :-1] * Y[:, 1:] - X[:, 1:] * Y[:, :-1], axis=1))
    buf = np.empty((n, 22 + 80), dtype=np.uint8)
    buf[:, :22] = np.frombuffer(_RECT_WKB_PREFIX, dtype=np.uint8)
    pts = np.empty((n, 10), dtype="<f8")
    pts[:, 0::2] = lons
    pts[:, 1::2] = lats
    buf[:, 22:] = pts.view(np.uint8).reshape(n, 80)
    raw = buf.tobytes()
    wkbs = [raw[i * 102:(i + 1) * 102] for i in range(n)]
    return keep, area, wkbs


def _refine_simple_batch(rows, B):
    """Batched general refine for convex-polygon × convex-polygon rows.

    ``rows``: pandas frame of candidate pairs (non-rect, polygon kind).
    Returns (handled_mask, result_frame): rows the batch path could not
    take (holes, multi-part, a concave ring on EITHER side, foreign
    WKB) stay for the scalar path.  Both sides must be convex because
    Sutherland–Hodgman is only area-exact for convex subjects — a
    concave subject with a disconnected intersection loses real area
    to bridge edges (round-2 fuzz; the scalar kernel decomposes concave
    rings into convex covers for the same reason).  Semantics identical
    to G.intersection → G.measure (single S-H pass, planar 1e-18 piece
    filter, Mollweide measure, m<=0 drop)."""
    import pandas as pd
    f_pts, f_cnt, f_ok = B.decode_simple_polygon_batch(list(rows["from_wkb"]))
    t_pts, t_cnt, t_ok = B.decode_simple_polygon_batch(list(rows["to_wkb"]))
    handled = f_ok & t_ok
    if handled.any():
        conv = np.zeros(len(rows), dtype=bool)
        conv[handled] = (B.is_convex_batch(t_pts[handled], t_cnt[handled])
                         & B.is_convex_batch(f_pts[handled], f_cnt[handled]))
        handled &= conv
    if not handled.any():
        return handled, None
    sp, sc = f_pts[handled], f_cnt[handled]
    cp, cc = t_pts[handled], t_cnt[handled]
    cp = B.ensure_ccw_batch(cp, cc)
    out_pts, out_cnt = B.clip_convex_batch(sp, sc, cp, cc)
    keep = out_cnt >= 3
    if keep.any():
        keep[keep] &= B.ring_area_batch(out_pts[keep], out_cnt[keep]) > 1e-18
    measures = np.zeros(len(out_cnt))
    if keep.any():
        measures[keep] = B.mollweide_area_batch(out_pts[keep], out_cnt[keep])
        keep &= measures > 0
    kept_rows = rows[handled][keep]
    wkbs = B.multipolygon_wkb_batch(out_pts[keep], out_cnt[keep])
    frame = pd.DataFrame({
        "from_id": kept_rows["from_id"].to_numpy(dtype="int64"),
        "to_id": kept_rows["to_id"].to_numpy(dtype="int64"),
        "from_label": kept_rows["from_label"].to_numpy(),
        "to_label": kept_rows["to_label"].to_numpy(),
        "measure": measures[keep],
        "geom_wkb": wkbs})
    return handled, frame


_CONCAVE_PAIR_CAP = 4096  # piece pairs per row above this defer to scalar


def _refine_concave_batch(rows, B):
    """Batched tier for SIMPLE single-ring pairs with a concave side
    (round-2 verdict #4: these fell to the scalar loop, ~2x slower
    than hexagons at 50k features).  Mirrors the scalar kernel
    exactly: each ring is reduced to its disjoint convex cover
    (geom._convex_cover — the ring itself when convex, its trapezoid
    decomposition otherwise), candidate (subject piece × clip piece)
    pairs are bbox-screened in the scalar's nested-loop order, and ALL
    surviving pairs across the whole Arrow batch run ONE
    clip_convex_batch.  Per-row measures sum the piece areas in that
    same order and the MultiPolygon parts are emitted in it, so output
    is bit-identical to the scalar tier (pinned by tests).  Rows whose
    cover fan-out exceeds ``_CONCAVE_PAIR_CAP`` defer to scalar.

    Covers are computed ONCE per distinct geometry via the vectorized
    ``convex_cover_batch`` (each feature typically appears in several
    candidate pairs of the same Arrow batch — the cell join emits one
    row per neighbour), with per-piece bboxes memoized alongside; the
    per-pair loop below does only bbox screening and index appends."""
    import pandas as pd
    wkb_f = list(rows["from_wkb"])
    wkb_t = list(rows["to_wkb"])
    f_pts, f_cnt, f_ok = B.decode_simple_polygon_batch(wkb_f)
    t_pts, t_cnt, t_ok = B.decode_simple_polygon_batch(wkb_t)
    handled = f_ok & t_ok
    if not handled.any():
        return handled, None
    # distinct geometries across both sides -> one batched cover pass
    uniq: dict[bytes, int] = {}
    u_rings: list[np.ndarray] = []
    hidx = np.nonzero(handled)[0]
    for i in hidx:
        for wb, pts, cnt in ((wkb_f[i], f_pts, f_cnt), (wkb_t[i], t_pts, t_cnt)):
            k = bytes(wb)
            if k not in uniq:
                uniq[k] = len(u_rings)
                u_rings.append(pts[i, :cnt[i]])
    u_pts, u_cnt = B.pad_rings(u_rings)
    fpts, fcnt, starts, boxes = B.convex_cover_flat(u_pts, u_cnt)
    npieces = np.diff(starts)
    # ragged cross product: every (subject piece x clip piece) of every
    # row, bbox-screened, in the scalar nested-loop order (sub outer)
    uf = np.fromiter((uniq[bytes(wkb_f[i])] for i in hidx), dtype=np.int64,
                     count=len(hidx))
    ut = np.fromiter((uniq[bytes(wkb_t[i])] for i in hidx), dtype=np.int64,
                     count=len(hidx))
    fanout = npieces[uf] * npieces[ut]
    over = fanout > _CONCAVE_PAIR_CAP
    if over.any():
        handled[hidx[over]] = False
        hidx, uf, ut, fanout = hidx[~over], uf[~over], ut[~over], fanout[~over]
    if not handled.any():
        return handled, None
    rep = np.repeat(np.arange(len(hidx)), fanout)
    ends = np.cumsum(fanout)
    p = np.arange(len(rep)) - np.repeat(ends - fanout, fanout)
    nt = npieces[ut][rep]
    sub_idx = starts[uf][rep] + p // nt
    clip_idx = starts[ut][rep] + p % nt
    sb, cb = boxes[sub_idx], boxes[clip_idx]
    touch = ~((sb[:, 2] < cb[:, 0]) | (cb[:, 2] < sb[:, 0])
              | (sb[:, 3] < cb[:, 1]) | (cb[:, 3] < sb[:, 1]))
    sub_idx, clip_idx = sub_idx[touch], clip_idx[touch]
    piece_row = hidx[rep[touch]]
    measures = np.zeros(len(rows), dtype=np.float64)
    parts_by_row: dict[int, list] = {}
    if len(piece_row):
        cp = B.ensure_ccw_batch(fpts[clip_idx], fcnt[clip_idx])
        out_pts, out_cnt = B.clip_convex_batch(
            fpts[sub_idx], fcnt[sub_idx], cp, fcnt[clip_idx])
        keep = out_cnt >= 3
        if keep.any():
            keep[keep] &= B.ring_area_batch(out_pts[keep], out_cnt[keep]) > 1e-18
        if keep.any():
            areas = B.mollweide_area_batch(out_pts[keep], out_cnt[keep])
            kept_rows = piece_row[keep]
            kept_pts, kept_cnt = out_pts[keep], out_cnt[keep]
            # in-order accumulation (kept_rows ascends within each row,
            # so the += order matches the scalar loop's)
            for k in range(len(kept_rows)):
                i = int(kept_rows[k])
                measures[i] += areas[k]
                parts_by_row.setdefault(i, []).append((kept_pts[k], int(kept_cnt[k])))
    emit = handled & (measures > 0)
    if not emit.any():
        return handled, None
    idxs = np.nonzero(emit)[0]
    kept_rows = rows.iloc[idxs]
    wkbs = [B.multipolygon_parts_wkb(parts_by_row[int(i)]) for i in idxs]
    frame = pd.DataFrame({
        "from_id": kept_rows["from_id"].to_numpy(dtype="int64"),
        "to_id": kept_rows["to_id"].to_numpy(dtype="int64"),
        "from_label": kept_rows["from_label"].to_numpy(),
        "to_label": kept_rows["to_label"].to_numpy(),
        "measure": measures[idxs],
        "geom_wkb": wkbs})
    return handled, frame


def refine_pairs(pairs_with_geoms: DataFrame, rect_fast: bool = True,
                 batch_general: bool = True) -> DataFrame:
    """Exact refine in Arrow batches: clip + Mollweide measure.

    Input columns: from_id, to_id, from_wkb, from_kind, to_wkb, plus
    bbox columns (f_minx..t_maxy) and from_rect/to_rect flags.  Three
    execution tiers, fastest first, identical semantics:

    1. rect × rect polygon pairs — closed-form bbox clip, pure numpy
       (``_refine_rects``);
    2. convex-polygon × convex-polygon pairs — batched
       Sutherland–Hodgman across the whole Arrow batch
       (geometry/batch.py; the round-2 fix for the per-row general
       loop — convex-only on both sides because S-H drops area for
       concave subjects with disconnected intersections);
    2.5. simple single-ring pairs with a CONCAVE side — per-row convex
       cover (trapezoid decomposition), then ONE batched S-H over all
       (subject piece × clip piece) candidates in the Arrow batch
       (``_refine_concave_batch``, round-3);
    3. everything else (holes, multi-part, lines, points, collections,
       oversized rings) — the scalar kernel per row.

    Topology errors are skipped per row, like the reference
    (utils/multiprocess.py:102-104)."""

    def gen(batches):
        import pandas as pd

        from ..geometry import batch as B
        for pdf in batches:
            frames = []
            rect = (pdf["from_rect"].to_numpy(dtype=bool)
                    & pdf["to_rect"].to_numpy(dtype=bool)
                    & (pdf["from_kind"] == "polygon").to_numpy())
            if not rect_fast:
                rect = np.zeros(len(pdf), dtype=bool)
            if rect.any():
                r = pdf[rect]
                keep, area, wkbs = _refine_rects(
                    r["f_minx"].to_numpy(), r["f_miny"].to_numpy(),
                    r["f_maxx"].to_numpy(), r["f_maxy"].to_numpy(),
                    r["t_minx"].to_numpy(), r["t_miny"].to_numpy(),
                    r["t_maxx"].to_numpy(), r["t_maxy"].to_numpy())
                kept = r[keep]
                frames.append(pd.DataFrame({
                    "from_id": kept["from_id"].to_numpy(dtype="int64"),
                    "to_id": kept["to_id"].to_numpy(dtype="int64"),
                    "from_label": kept["from_label"].to_numpy(),
                    "to_label": kept["to_label"].to_numpy(),
                    "measure": area,
                    "geom_wkb": wkbs}))
            gen_rows = pdf[~rect]
            if batch_general and len(gen_rows):
                poly = gen_rows[(gen_rows["from_kind"] == "polygon").to_numpy()]
                if len(poly):
                    handled, frame = _refine_simple_batch(poly, B)
                    if frame is not None and len(frame):
                        frames.append(frame)
                    if handled.any():
                        drop = poly.index[handled]
                        gen_rows = gen_rows.drop(index=drop)
                # tier 2.5: simple single-ring pairs with a concave side
                poly = gen_rows[(gen_rows["from_kind"] == "polygon").to_numpy()]
                if len(poly):
                    handled, frame = _refine_concave_batch(poly, B)
                    if frame is not None and len(frame):
                        frames.append(frame)
                    if handled.any():
                        drop = poly.index[handled]
                        gen_rows = gen_rows.drop(index=drop)
            out = {"from_id": [], "to_id": [], "from_label": [], "to_label": [],
                   "measure": [], "geom_wkb": []}
            for fid, tid, flab, tlab, fwkb, kind, twkb in zip(
                    gen_rows["from_id"], gen_rows["to_id"],
                    gen_rows["from_label"], gen_rows["to_label"],
                    gen_rows["from_wkb"], gen_rows["from_kind"], gen_rows["to_wkb"]):
                try:
                    fg = G.wkb_loads(bytes(fwkb))
                    tg = G.wkb_loads(bytes(twkb))
                    inter = G.intersection(fg, kind, tg)
                except Exception:
                    continue  # reference skips TopologicalError rows
                if inter is None:
                    continue
                m = G.measure(inter, kind)
                if m <= 0 and kind != "point":
                    continue
                out["from_id"].append(fid)
                out["to_id"].append(tid)
                out["from_label"].append(flab)
                out["to_label"].append(tlab)
                out["measure"].append(m)
                out["geom_wkb"].append(G.wkb_dumps(inter))
            frames.append(pd.DataFrame({"from_id": pd.Series(out["from_id"], dtype="int64"),
                                        "to_id": pd.Series(out["to_id"], dtype="int64"),
                                        "from_label": out["from_label"],
                                        "to_label": out["to_label"],
                                        "measure": pd.Series(out["measure"], dtype="float64"),
                                        "geom_wkb": out["geom_wkb"]}))
            yield pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]

    return pairs_with_geoms.mapInPandas(gen, schema=PAIR_REFINE_SCHEMA)


def _ensure_persisted(df: DataFrame) -> DataFrame:
    """Persist a feature table that the plan references several times
    (cover, geometry join-back, label join).  Without this, a feature
    side derived from an expensive ingest (pages → extract) would be
    recomputed once per plan occurrence.  MEMORY_AND_DISK: at cluster
    scale the normalized feature table is the thing you'd materialize
    to parquet/Iceberg between ingest and join anyway."""
    from pyspark import StorageLevel
    if df.storageLevel == StorageLevel.NONE:
        df.persist(StorageLevel.MEMORY_AND_DISK)
        # eager materialization: the join plan references this table from
        # several concurrent subtrees (cover × 2 sides, geometry join,
        # label join) — populating the cache lazily would recompute the
        # ingest once per subtree racing ahead of the cache
        df.count()
    return df


def intersect(features1: DataFrame, features2: DataFrame,
              res: int = DEFAULT_TARGET_RES, max_cells: int = DEFAULT_MAX_CELLS,
              salt_buckets: int = 0, salt_threshold: int = 50_000,
              broadcast_features: bool | None = None,
              ids: str = "fast", refine_partitions: int | None = None,
              rect_fast: bool = True) -> DataFrame:
    """The overlay join. Returns
    ``(id, from_label, to_label, measure, geom_wkb)`` matching the
    reference's fixed output schema (core.py:153-161).

    The second side must be polygonal (core.py:51-53) — enforced here
    with a distributed assert, non-overlap stays a documented
    precondition.

    Scale-safe defaults: ``ids="fast"`` (``monotonically_increasing_id``
    — unique, not dense/ordered — keeps the plan fully parallel) and
    ``broadcast_features=None`` (Catalyst picks the geometry join-back
    strategy via ``autoBroadcastJoinThreshold``).  ``ids="sorted"``
    reproduces the reference's enumeration-order ids via a global
    window — a single-partition sort, fixture/report scale ONLY; the
    file-API writers opt into it.  ``broadcast_features=True`` force-
    broadcasts both feature tables (only sane when both are known
    small)."""
    # one combined job: persist+materialize both sides, min native res
    # per side, polygonal assert on the second side
    lo1, lo2 = _prepare_sides(features1, features2, res, max_cells)

    pairs = candidate_pairs(features1, features2, res, max_cells,
                            salt_buckets, salt_threshold, lo1=lo1, lo2=lo2)

    def rect_col(df):
        return F.col("is_rect") if "is_rect" in df.columns else F.lit(False)

    f1 = features1.select(F.col("feature_id").alias("from_id"),
                          F.col("geom_wkb").alias("from_wkb"),
                          F.col("kind").alias("from_kind"),
                          F.col("label").alias("from_label"),
                          rect_col(features1).alias("from_rect"),
                          F.col("minx").alias("f_minx"), F.col("miny").alias("f_miny"),
                          F.col("maxx").alias("f_maxx"), F.col("maxy").alias("f_maxy"))
    f2 = features2.select(F.col("feature_id").alias("to_id"),
                          F.col("geom_wkb").alias("to_wkb"),
                          F.col("label").alias("to_label"),
                          rect_col(features2).alias("to_rect"),
                          F.col("minx").alias("t_minx"), F.col("miny").alias("t_miny"),
                          F.col("maxx").alias("t_maxx"), F.col("maxy").alias("t_maxy"))
    if broadcast_features:
        f1b, f2b = F.broadcast(f1), F.broadcast(f2)
    else:
        f1b, f2b = f1, f2

    enriched = pairs.join(f1b, "from_id").join(f2b, "to_id")
    # bbox-TOUCH pairs (shared edge/corner, zero overlap width) are ~2.7x
    # of the true intersections on gridded workloads; for polygon-kind
    # from-features their intersection area is necessarily 0, so the
    # refine would drop them anyway — drop them JVM-side before the
    # Arrow exchange.  Lines/points are exempt: a border line/point DOES
    # intersect its neighbor (reference double-count semantics,
    # utils/geometry.py:107-110).
    strict_overlap = ((F.col("f_minx") < F.col("t_maxx")) & (F.col("t_minx") < F.col("f_maxx"))
                      & (F.col("f_miny") < F.col("t_maxy")) & (F.col("t_miny") < F.col("f_maxy")))
    enriched = enriched.filter(strict_overlap | (F.col("from_kind") != "polygon"))
    if rect_fast:
        # rect×rect rows are refined from their bboxes alone — null the
        # WKB payloads JVM-side so the Arrow exchange into the Python
        # refine doesn't ship geometry bytes it will never read
        both_rect = (F.col("from_rect") & F.col("to_rect")
                     & (F.col("from_kind") == "polygon"))
        enriched = (enriched
                    .withColumn("from_wkb", F.when(both_rect, F.lit(None))
                                .otherwise(F.col("from_wkb")))
                    .withColumn("to_wkb", F.when(both_rect, F.lit(None))
                                .otherwise(F.col("to_wkb"))))
    if refine_partitions:
        # opt-in for Python-heavy (non-rect) workloads: the general clip
        # kernel is CPU-bound per row, so partition by task-count rather
        # than letting AQE coalesce the tiny-by-bytes join output onto a
        # few cores.  Rect-dominated workloads skip the extra shuffle —
        # the vectorized refine is cheap wherever it lands.
        enriched = enriched.repartition(refine_partitions)
    # labels ride through the refine (they're already in the join output),
    # so no post-refine label joins are needed
    refined = refine_pairs(enriched, rect_fast=rect_fast)

    if ids == "fast":
        id_col = F.monotonically_increasing_id().alias("id")
    else:
        id_col = F.row_number().over(_det_window()).cast("long").alias("id")
    return refined.select(id_col, "from_label", "to_label", "measure", "geom_wkb")


def _det_window():
    """Deterministic output ids: reference assigns ids by enumeration
    order (utils/conversion.py:14-28); we order by labels for
    reproducibility across partitionings."""
    from pyspark.sql import Window
    return Window.orderBy("from_label", "to_label")


def intersections_from_intersection(intersections: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Reference core.py:190-269 — re-project the overlay output C=A⋈B
    into the two derived join tables (C,A) and (C,B). Pure column
    projection, no geometry work."""
    fp1 = intersections.select("id", F.col("from_label").alias("label"), "measure")
    fp2 = intersections.select("id", F.col("to_label").alias("label"), "measure")
    return fp1, fp2
