"""Geodesic within-radius point join (graft addition — the reference
has no distance join; it matches features only by intersection
(pandarus/calculate.py) or, in this engine's kNN extension, by rank).

:func:`distance_join` pairs every left point with every right point at
great-circle distance ≤ ``radius_m`` — the spatial twin of
``operators/windows.py:interval_join``'s 1-D bucket tiling: the right
side explodes to the tiling cells its radius-neighbourhood touches,
the left side hashes to its single containing cell, and the equi-join
on the cell id + an exact haversine residual replaces the quadratic
theta join Catalyst would otherwise plan.  Everything is pure Catalyst
(trig builtins, ``sequence``/``explode`` higher-order functions —
whole-stage codegen, zero Python), and the haversine has a lockstep
ANSI-SQL rendering so DuckDB reproduces distances bit-for-bit.

Scale notes (the 100 TB shape): ONE shuffle on the cell key; the
right-side fan-out is bounded (3 rows of cells, ``2·kx+1`` columns
where kx grows only near the poles and is capped at a full ring);
each surviving pair is produced exactly once because the left point's
cell is unique — no post-join dedup shuffle.  Hot cells (dense urban
clusters) are ordinary join skew: AQE's skew-join split handles the
probe side, and the residual filter runs inside the join stage.

Candidate superset proof sketch: if hav(l, r) ≤ radius then
|Δlat|·M_PER_DEG ≤ radius (meridional component is a lower bound), so
with the cell height chosen ≥ radius the row index differs by ≤ 1;
for longitude the great-circle distance obeys
d ≥ (2/π)·R·cos(φ_max)·|Δλ_wrapped| (from 2·asin x ≥ 2x and
sin x ≥ (2/π)x on [0, π/2]), so the per-row kx uses the π/2-inflated
radius at the most poleward latitude reachable within the radius —
conservative by construction, and fuzz-tested against brute force
including polar and antimeridian clusters.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from ..tiling.cells import (LAT_MIN, LAT_SPAN, LON_MIN, LON_SPAN, MAX_RES,
                            RES_SHIFT, Y_SHIFT)

EARTH_R = 6371008.8                       # IUGG mean Earth radius, metres
M_PER_DEG = math.pi / 180.0 * EARTH_R     # metres per degree of latitude


def haversine_m(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in metres (spherical haversine, mean
    radius).  Identical expression tree to :func:`haversine_m_sql`."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp = F.radians(lat2 - lat1) / 2.0
    dl = F.radians(lon2 - lon1) / 2.0
    a = F.sin(dp) * F.sin(dp) + F.cos(p1) * F.cos(p2) * F.sin(dl) * F.sin(dl)
    return 2.0 * EARTH_R * F.asin(F.least(F.lit(1.0), F.sqrt(a)))


def haversine_m_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    # explicit products, not pow(): libm pow carries ulp error that x*x
    # does not, and the oracle must reproduce the engine bit-for-bit
    sp = f"sin(radians(({lat2}) - ({lat1})) / 2)"
    sl = f"sin(radians(({lon2}) - ({lon1})) / 2)"
    a = (f"({sp} * {sp}"
         f" + cos(radians({lat1})) * cos(radians({lat2})) * {sl} * {sl})")
    return f"(2 * {EARTH_R!r} * asin(least(1.0, sqrt({a}))))"


def radius_resolution(radius_m: float) -> int:
    """Finest cell resolution whose cell HEIGHT (latitude extent) is
    ≥ ``radius_m``, so a vertical k-ring of 1 always suffices."""
    if radius_m <= 0:
        raise ValueError("radius_m must be positive")
    height_m = LAT_SPAN * M_PER_DEG  # world height in metres
    res = int(math.floor(math.log2(height_m / radius_m))) if radius_m < height_m else 0
    return max(0, min(MAX_RES, res))


def distance_join(left: DataFrame, right: DataFrame, radius_m: float,
                  lon_col: str = "lon", lat_col: str = "lat",
                  suffixes: tuple[str, str] = ("_l", "_r"),
                  res: int | None = None,
                  salt_buckets: int = 0,
                  salt_threshold: int = 100_000) -> DataFrame:
    """All (left, right) point pairs with great-circle distance
    ≤ ``radius_m``, plus ``dist_m``.  Payload columns are carried from
    both sides with ``suffixes`` disambiguating collisions (the
    coordinate columns are always suffixed).

    ``res`` overrides the automatic resolution (coarser = fewer,
    denser cells; finer is rejected because the vertical ring of 1
    would miss neighbours).

    ``salt_buckets`` > 1 enables hot-cell salting (r3 verdict #8, the
    same scheme the overlay uses for join-output amplification AQE
    cannot see: AQE splits oversized shuffle PARTITIONS, but a single
    dense urban CELL is one key and lands in one task either way).
    Cells whose LEFT row count reaches ``salt_threshold`` split the
    left side across ``salt_buckets`` deterministic hash-salt keys and
    replicate the right side's rows in that cell across all salts —
    per-task work drops by ~salt_buckets on the hot cell; each
    surviving pair is still produced exactly once (the left row keeps
    ONE salt), so the result is salting-invariant (pinned by test)."""
    auto = radius_resolution(radius_m)
    if res is None:
        res = auto
    elif res > auto:
        raise ValueError(f"res={res} is finer than the radius allows ({auto})")
    n = 1 << res
    height_deg = LAT_SPAN / n
    width_deg = LON_SPAN / n
    radius_deg = radius_m / M_PER_DEG

    def pt(df: DataFrame, side: int) -> DataFrame:
        sfx = suffixes[side]
        cols = [F.col(c).alias(c + sfx if c in (lon_col, lat_col)
                               or c in common else c)
                for c in df.columns]
        lon, lat = F.col(lon_col), F.col(lat_col)
        ix = F.least(F.greatest(F.floor((lon - LON_MIN) / LON_SPAN * n), F.lit(0)),
                     F.lit(n - 1)).cast("long")
        iy = F.least(F.greatest(F.floor((lat - LAT_MIN) / LAT_SPAN * n), F.lit(0)),
                     F.lit(n - 1)).cast("long")
        return df.select(*cols, ix.alias("__ix"), iy.alias("__iy"))

    common = set(left.columns) & set(right.columns) - {lon_col, lat_col}
    reserved = {"__ix", "__iy", "__cell", "__salt", "__hot", "dist_m"}
    clash = sorted(reserved & (set(left.columns) | set(right.columns)))
    if clash:
        raise ValueError(f"reserved column names in input: {clash}")

    l = pt(left, 0)
    r = pt(right, 1)

    # per-row horizontal fan-out: longitude degrees shrink by cos(lat);
    # use the most poleward latitude reachable within the radius and the
    # π/2 slack from the proof sketch, capped at a full wrap ring
    lat_r = F.col(lat_col + suffixes[1])
    phi_max = F.least(F.abs(lat_r) + F.lit(2.0 * radius_deg), F.lit(89.99))
    rad_lon_deg = (F.lit(radius_m * math.pi / 2.0)
                   / (F.lit(M_PER_DEG) * F.cos(F.radians(phi_max))))
    kx = F.least(F.ceil(rad_lon_deg / F.lit(width_deg)) + 1, F.lit(n)).cast("long")

    # right cells: rows iy-1..iy+1 (clipped) × columns ix-kx..ix+kx
    # (wrapped, deduped after the wrap so a full ring emits each cell once)
    dy = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("__dy")
    r2 = r.select("*", dy).withColumn("__ry", F.col("__iy") + F.col("__dy"))
    r2 = r2.filter((F.col("__ry") >= 0) & (F.col("__ry") < n))
    xs = F.array_distinct(F.transform(
        F.sequence(-kx, kx), lambda d: F.pmod(F.col("__ix") + d, F.lit(n))))
    r3 = (r2.select("*", F.explode(xs).alias("__rx"))
          .withColumn("__cell",
                      F.lit(res << RES_SHIFT)
                      + F.col("__ry") * F.lit(1 << Y_SHIFT) + F.col("__rx"))
          .drop("__ix", "__iy", "__dy", "__ry", "__rx"))

    l2 = l.withColumn("__cell",
                      F.lit(res << RES_SHIFT)
                      + F.col("__iy") * F.lit(1 << Y_SHIFT) + F.col("__ix")) \
          .drop("__ix", "__iy")

    lonl, latl = F.col(lon_col + suffixes[0]), F.col(lat_col + suffixes[0])
    lonr, latr = F.col(lon_col + suffixes[1]), F.col(lat_col + suffixes[1])
    d = haversine_m(lonl, latl, lonr, latr)
    if salt_buckets > 1:
        # checkpoint the keyed left ONCE: the hot-cell scan and the
        # join both consume it, and without the checkpoint the entire
        # upstream plan would recompute for the scan — costly when the
        # left is itself an expensive pipeline (r4 advice; same
        # discipline as dup_span_stats' shared shingle table)
        l2 = l2.localCheckpoint(eager=False)
        hot = (l2.groupBy("__cell").count()
               .filter(F.col("count") >= salt_threshold)
               .select("__cell").withColumn("__hot", F.lit(True)))
        lcols = [c for c in l2.columns if c != "__cell"]
        l2 = (l2.join(F.broadcast(hot), "__cell", "left")
              .withColumn("__salt",
                          F.when(F.col("__hot").isNotNull(),
                                 F.pmod(F.xxhash64(*lcols), F.lit(salt_buckets)))
                          .otherwise(F.lit(0).cast("long")))
              .drop("__hot"))
        r3 = (r3.join(F.broadcast(hot), "__cell", "left")
              .withColumn("__salt", F.explode(
                  F.when(F.col("__hot").isNotNull(),
                         F.sequence(F.lit(0).cast("long"),
                                    F.lit(salt_buckets - 1).cast("long")))
                  .otherwise(F.array(F.lit(0).cast("long")))))
              .drop("__hot"))
        joined = l2.join(r3, ["__cell", "__salt"]).drop("__salt")
    else:
        joined = l2.join(r3, "__cell")
    return (joined
            .withColumn("dist_m", d)
            .filter(F.col("dist_m") <= radius_m)
            .drop("__cell"))

# ---------------------------------------------------------------------------
# Spatial clustering (eps-connectivity / DBSCAN single-linkage core)
# ---------------------------------------------------------------------------


def spatial_clusters(points: DataFrame, eps_m: float,
                     id_col: str = "pid", lon_col: str = "lon",
                     lat_col: str = "lat", res: int | None = None,
                     salt_buckets: int = 0) -> DataFrame:
    """Great-circle eps-connectivity clusters: points closer than
    ``eps_m`` are linked, connected components are clusters — the
    density-reachability core of DBSCAN (min_pts=2; border/noise
    labeling composes on top as a degree filter), and the standard way
    to collapse a web-extracted point cloud of venue/place mentions
    into physical sites (graft addition).

    Output: (``id_col``, cluster_id) — cluster_id = min point id of
    the component; isolated points are their own singleton cluster.

    Pure composition of two proven kernels, which is the point: the
    eps-graph comes from :func:`distance_join` (cell-bucket
    candidates + exact haversine, ONE equi-join shuffle, hot-cell
    salting available — never all-pairs) and the components from
    ``dedup.duplicate_clusters`` (alternating large-star/small-star,
    O(log n) rounds, lineage-checkpointed).  At 10^12 points the
    eps-graph is the dominant cost and inherits the distance join's
    scale story; the component rounds touch only the pair table."""
    from .dedup import duplicate_clusters

    base = points.select(F.col(id_col), F.col(lon_col), F.col(lat_col))
    pairs = distance_join(
        base.withColumnRenamed(id_col, "__a"),
        base.withColumnRenamed(id_col, "__b"),
        eps_m, lon_col=lon_col, lat_col=lat_col, res=res,
        salt_buckets=salt_buckets)
    pairs = (pairs.filter(F.col("__a") < F.col("__b"))
                  .select(F.col("__a").alias("doc_a"),
                          F.col("__b").alias("doc_b")))
    out = duplicate_clusters(
        pairs, universe=base.select(F.col(id_col).alias("doc_id")))
    return out.select(F.col("doc_id").alias(id_col), "cluster_id")
