"""`calculate_remaining` — measure of each source feature left outside
all of its intersections, with double-count normalization.

Reference: pandarus/core.py:272-387; formula utils/geometry.py:177-208
(derivation in reference docs/index.rst, "Lines and points that
intersect two vector features")::

    remaining = (measure(orig) - measure(union(geoms)))
                * (sum(measure(g_i)) / measure(union(geoms)))
    remaining = measure(orig)                       # when no geoms

The reference finds each feature's intersection rows with a quadratic
nested scan (core.py:364-369); here it is a broadcast/shuffled **left
outer join** on the label followed by ``applyInPandas`` per source
feature (the group needs all of a feature's intersection geometries
together — a genuine grouping barrier).

``unary_union`` has no pure-python equivalent, so the union *measure*
is computed per kind:

* point — count of distinct coordinates;
* line — exact: collinear segments are grouped by (direction, offset)
  and their 1-D intervals merged; crossing points have measure zero;
* polygon — first-order inclusion–exclusion (sum of areas minus
  pairwise intersection areas), exact under the reference's documented
  non-overlap precondition on the second map (core.py:51-53).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..geometry import geom as G
from ..geometry.projection import mollweide_forward

REMAINING_SCHEMA = "label string, remaining double"


def union_measure(kind: str, geoms: list[dict]) -> float:
    """Measure of the union of Mollweide-projected geometries."""
    if not geoms:
        return 0.0
    proj = [G.transform_geom(g, mollweide_forward) if kind != "point" else g for g in geoms]
    if kind == "point":
        pts = np.vstack([np.asarray(p, dtype=np.float64).reshape(-1, 2)
                         for g in proj for p in G.extract_kind_parts(g, "point")])
        return float(len(np.unique(np.round(pts, 9), axis=0)))
    if kind == "line":
        return _union_length(proj)
    # polygon: inclusion-exclusion to first order.  Exact under the
    # reference's precondition that the SECOND overlay input is
    # non-overlapping (core.py:51-53): one source feature's
    # intersection geoms are then interior-disjoint, so every pairwise
    # term is 0 and no triple-overlap correction can arise.  Only
    # overlapping second-side polygons (already outside the contract)
    # would make this approximate.
    parts = [p for g in proj for p in G.extract_kind_parts(g, "polygon")]
    total = sum(G.polygon_area(p) for p in parts)
    for i in range(len(parts)):
        for j in range(i + 1, len(parts)):
            if G.bbox_intersects(_rings_bounds(parts[i]), _rings_bounds(parts[j])):
                inter = G.clip_polygon_by_polygon(parts[i], parts[j])
                total -= sum(G.polygon_area(p) for p in inter)
    return total


def _rings_bounds(rings):
    ext = np.asarray(rings[0], dtype=np.float64).reshape(-1, 2)
    return (ext[:, 0].min(), ext[:, 1].min(), ext[:, 0].max(), ext[:, 1].max())


def _union_length(geoms: list[dict]) -> float:
    """Exact union length: merge collinear overlapping segments."""
    segs = []
    for g in geoms:
        for line in G.extract_kind_parts(g, "line"):
            arr = np.asarray(line, dtype=np.float64).reshape(-1, 2)
            for i in range(len(arr) - 1):
                segs.append((arr[i], arr[i + 1]))
    groups: dict[tuple, list[tuple[float, float]]] = {}
    for p, q in segs:
        d = q - p
        L = float(np.hypot(*d))
        if L == 0.0:
            continue
        u = d / L
        if u[0] < 0 or (u[0] == 0 and u[1] < 0):
            u = -u
        # line signature: direction + signed offset from origin
        off = p[0] * u[1] - p[1] * u[0]
        key = (round(float(u[0]), 9), round(float(u[1]), 9), round(float(off), 6))
        t0 = float(p[0] * u[0] + p[1] * u[1])
        t1 = float(q[0] * u[0] + q[1] * u[1])
        groups.setdefault(key, []).append((min(t0, t1), max(t0, t1)))
    total = 0.0
    for ivs in groups.values():
        ivs.sort()
        cur_a, cur_b = ivs[0]
        for a, b in ivs[1:]:
            if a > cur_b:
                total += cur_b - cur_a
                cur_a, cur_b = a, b
            else:
                cur_b = max(cur_b, b)
        total += cur_b - cur_a
    return total


def remaining_measure(orig: dict, kind: str, geoms: list[dict]) -> float:
    """The reference formula (utils/geometry.py:177-208)."""
    actual = G.measure(orig, kind)
    if not geoms:
        return actual
    union = union_measure(kind, geoms)
    individ = float(sum(G.measure(g, kind) for g in geoms))
    if union == 0.0:
        return actual
    return (actual - union) * (individ / union)


def calculate_remaining(source_features: DataFrame, intersections: DataFrame) -> DataFrame:
    """source features ⟕ intersections on label == from_label, grouped
    per feature, remaining formula applied in Arrow batches.

    ``intersections`` needs columns (from_label, geom_wkb) — the
    overlay output of :func:`~pandarus_spark.intersect`. Output:
    (label, remaining) like the reference's JSON ``data`` rows
    (core.py:381-387)."""
    src = source_features.select("feature_id", "label",
                                 F.col("geom_wkb").alias("src_wkb"), "kind")
    inter = intersections.select(F.col("from_label").alias("label"),
                                 F.col("geom_wkb").alias("int_wkb"))
    joined = src.join(inter, "label", "left")

    def fn(pdf):
        import pandas as pd
        orig = G.wkb_loads(bytes(pdf["src_wkb"].iloc[0]))
        kind = pdf["kind"].iloc[0]
        geoms = [G.wkb_loads(bytes(b)) for b in pdf["int_wkb"] if b is not None]
        return pd.DataFrame({"label": [pdf["label"].iloc[0]],
                             "remaining": [remaining_measure(orig, kind, geoms)]})

    return joined.groupBy("feature_id").applyInPandas(fn, schema=REMAINING_SCHEMA)
