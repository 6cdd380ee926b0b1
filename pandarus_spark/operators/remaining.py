"""`calculate_remaining` — measure of each source feature left outside
all of its intersections, with double-count normalization.

Reference: pandarus/core.py:272-387; formula utils/geometry.py:177-208
(derivation in reference docs/index.rst, "Lines and points that
intersect two vector features")::

    remaining = (measure(orig) - measure(union(geoms)))
                * (sum(measure(g_i)) / measure(union(geoms)))
    remaining = measure(orig)                       # when no geoms

The reference finds each feature's intersection rows with a quadratic
nested scan (core.py:364-369); here every term of the formula is
computed DISTRIBUTIVELY (round-2 verdict #2: the former
``applyInPandas`` per source feature shipped ALL of a feature's
intersection geometries to one task — a continent-sized feature over
a fine second map became a single straggler doing quadratic work).

``unary_union`` has no pure-python equivalent, so the union *measure*
is computed per kind — each as an aggregation, never a per-feature
group:

* point — count of distinct rounded coordinates (``countDistinct``
  over exploded points);
* line — exact: collinear segments are keyed by (direction, offset)
  and their 1-D intervals merged with a gaps-and-islands window per
  (label, direction, offset) — far finer granularity than the
  feature;
* polygon — sum of per-geometry Mollweide areas.  Exact under the
  reference's documented non-overlap precondition on the second map
  (core.py:51-53): one source feature's intersection geometries are
  interior-disjoint, so every pairwise inclusion–exclusion term is 0
  and ``union == individ``.  (:func:`union_measure` keeps the
  pairwise-correcting kernel for out-of-contract inputs and as the
  single-machine oracle the distributed path is tested against.)

Per-geometry measures run in ``mapInPandas`` (each row independent);
the only shuffles are hash aggregations on the label and the line
windows' fine-grained keys — no single-group barrier anywhere.
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
        # line signature: direction + signed offset from origin
        ki = _seg_key_interval(p, q)
        if ki is None:
            continue
        groups.setdefault(ki[:3], []).append((ki[3], ki[4]))
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


def _seg_key_interval(p: np.ndarray, q: np.ndarray):
    """Canonical (direction, offset) key + 1-D interval of a segment —
    the exact signature :func:`_union_length` uses, factored out so the
    distributed line-union path merges the same groups."""
    d = q - p
    L = float(np.hypot(*d))
    if L == 0.0:
        return None
    u = d / L
    if u[0] < 0 or (u[0] == 0 and u[1] < 0):
        u = -u
    off = p[0] * u[1] - p[1] * u[0]
    t0 = float(p[0] * u[0] + p[1] * u[1])
    t1 = float(q[0] * u[0] + q[1] * u[1])
    return (round(float(u[0]), 9), round(float(u[1]), 9), round(float(off), 6),
            min(t0, t1), max(t0, t1))


def calculate_remaining(source_features: DataFrame, intersections: DataFrame) -> DataFrame:
    """Distributed `calculate_remaining`: every formula term is an
    aggregation over per-geometry rows — no per-feature grouping
    barrier (round-2 verdict #2).

    ``intersections`` needs columns (from_label, geom_wkb) — the
    overlay output of :func:`~pandarus_spark.intersect`. Output:
    (label, remaining) like the reference's JSON ``data`` rows
    (core.py:381-387).

    Terms (formula utils/geometry.py:177-208):

    * ``actual``  — one ``mapInPandas`` row per source feature;
    * ``individ`` — per-intersection-geometry :func:`G.measure` in
      ``mapInPandas``, ``sum`` per label;
    * ``union``   — polygon: ``== individ`` under the reference's
      non-overlap precondition on the second map (core.py:51-53);
      point: ``countDistinct`` over exploded rounded coordinates;
      line: gaps-and-islands interval merge per (label, direction,
      offset) window key, summed per label.
    """
    from pyspark.sql import Window
    src = source_features.select("feature_id", "label",
                                 F.col("geom_wkb").alias("src_wkb"), "kind")
    inter = intersections.select(F.col("from_label").alias("label"),
                                 F.col("geom_wkb").alias("int_wkb"))
    # dropDuplicates: labels are unique per the extraction contract, but
    # an out-of-contract duplicate would otherwise multiply every
    # intersection row through this join and silently corrupt the sums
    pairs = inter.filter(F.col("int_wkb").isNotNull()).join(
        src.select("label", "kind").dropDuplicates(["label"]), "label")

    def actual_fn(it):
        import pandas as pd
        for pdf in it:
            yield pd.DataFrame({
                "label": pdf["label"],
                "kind": pdf["kind"],
                "actual": [G.measure(G.wkb_loads(bytes(b)), k)
                           for b, k in zip(pdf["src_wkb"], pdf["kind"])]})

    base = src.mapInPandas(actual_fn, schema="label string, kind string, actual double")

    def measure_fn(it):
        import pandas as pd
        for pdf in it:
            yield pd.DataFrame({
                "label": pdf["label"],
                "m": [G.measure(G.wkb_loads(bytes(b)), k)
                      for b, k in zip(pdf["int_wkb"], pdf["kind"])]})

    individ = (pairs.mapInPandas(measure_fn, schema="label string, m double")
               .groupBy("label").agg(F.sum("m").alias("individ")))

    # point union: explode rounded coordinates, distinct count per label
    def points_fn(it):
        import pandas as pd
        for pdf in it:
            labels, xs, ys = [], [], []
            for label, b in zip(pdf["label"], pdf["int_wkb"]):
                g = G.wkb_loads(bytes(b))
                for part in G.extract_kind_parts(g, "point"):
                    pts = np.round(np.asarray(part, dtype=np.float64).reshape(-1, 2), 9)
                    for x, y in pts:
                        labels.append(label); xs.append(float(x)); ys.append(float(y))
            yield pd.DataFrame({"label": labels, "px": xs, "py": ys})

    point_union = (pairs.filter(F.col("kind") == "point")
                   .mapInPandas(points_fn, schema="label string, px double, py double")
                   .groupBy("label")
                   .agg(F.countDistinct("px", "py").cast("double").alias("u_point")))

    # line union: Mollweide segments keyed by (direction, offset);
    # gaps-and-islands merge per fine-grained window key, never per
    # feature — one hot feature's segments spread over many keys
    def segs_fn(it):
        import pandas as pd
        for pdf in it:
            out = {"label": [], "kx": [], "ky": [], "koff": [], "t0": [], "t1": []}
            for label, b in zip(pdf["label"], pdf["int_wkb"]):
                g = G.transform_geom(G.wkb_loads(bytes(b)), mollweide_forward)
                for line in G.extract_kind_parts(g, "line"):
                    arr = np.asarray(line, dtype=np.float64).reshape(-1, 2)
                    for i in range(len(arr) - 1):
                        ki = _seg_key_interval(arr[i], arr[i + 1])
                        if ki is None:
                            continue
                        out["label"].append(label)
                        out["kx"].append(ki[0]); out["ky"].append(ki[1])
                        out["koff"].append(ki[2])
                        out["t0"].append(ki[3]); out["t1"].append(ki[4])
            yield pd.DataFrame(out)

    segs = (pairs.filter(F.col("kind") == "line")
            .mapInPandas(segs_fn, schema=("label string, kx double, ky double, "
                                          "koff double, t0 double, t1 double")))
    wkey = Window.partitionBy("label", "kx", "ky", "koff").orderBy("t0", "t1")
    prev_max = F.max("t1").over(wkey.rowsBetween(Window.unboundedPreceding, -1))
    island = F.sum(
        F.when(prev_max.isNull() | (F.col("t0") > prev_max), 1).otherwise(0)
    ).over(wkey.rowsBetween(Window.unboundedPreceding, 0))
    line_union = (segs.withColumn("island", island)
                  .groupBy("label", "kx", "ky", "koff", "island")
                  .agg((F.max("t1") - F.min("t0")).alias("len"))
                  .groupBy("label").agg(F.sum("len").alias("u_line")))

    out = (base.join(individ, "label", "left")
           .join(point_union, "label", "left")
           .join(line_union, "label", "left"))
    union = (F.when(F.col("kind") == "point", F.coalesce(F.col("u_point"), F.lit(0.0)))
             .when(F.col("kind") == "line", F.coalesce(F.col("u_line"), F.lit(0.0)))
             .otherwise(F.coalesce(F.col("individ"), F.lit(0.0))))
    remaining = (F.when(F.col("individ").isNull(), F.col("actual"))
                 .when(union == 0.0, F.col("actual"))
                 .otherwise((F.col("actual") - union)
                            * (F.col("individ") / union)))
    return out.select("label", remaining.alias("remaining"))
