"""Douglas–Peucker line simplification (graft addition) — the
standard vertex-reduction pass a vector pipeline runs before
rendering or coarse-resolution storage (Douglas & Peucker 1973).

Deterministic contract: recursion splits at the STRICTLY
max-perpendicular-distance vertex (ties to the smallest index), stops
when the max distance is <= eps; a zero-length chord falls back to
point distance from the chord anchor.  Every arithmetic step is IEEE
+-*/ sqrt/abs in a fixed order, so the DuckDB oracle — a recursive
CTE that replays the SAME recursion over interval rows — reproduces
the kept-vertex set bit-exactly.

Three non-obvious oracle hazards, all measured while building the
twin (gate `simplify_docs`):

* a window ``max(d) OVER ()`` inside the correlated LATERAL argmax is
  WRONG after DuckDB decorrelates it — the max runs over every active
  segment of the iteration, not the current one;
* even with explicit partition keys, a float argmax inside the
  RECURSIVE member was UNSTABLE — its answer varied with unrelated
  prior queries on the same connection; the shipped twin therefore
  materializes the argmax for EVERY possible interval in a
  non-recursive CTE (plain deterministic window) and keeps the
  recursion pure integer joins;
* a bare ``UNION`` (dedup) in a non-recursive CTE that lives inside a
  ``WITH RECURSIVE`` list did NOT deduplicate — the kept-endpoint
  union needs an explicit ``SELECT DISTINCT`` over ``UNION ALL``.

Plan shape (100 TB test): pure map — DP is per-feature recursive
work, exactly what an Arrow batch is for; zero shuffles, output
carries the simplified WKB plus integer kept-vertex statistics
(count / index sums) so the gate hashes integers only.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

from ..geometry import geom as G
from ..geometry.projection import mollweide_forward


def dp_keep_indices(arr, eps: float) -> list[int]:
    """Kept-vertex indices of one polyline (list of (x, y))."""
    n = len(arr)
    if n <= 2:
        return list(range(n))
    keep = [False] * n
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b <= a + 1:
            continue
        ax, ay = arr[a]
        bx, by = arr[b]
        l2 = (bx - ax) * (bx - ax) + (by - ay) * (by - ay)
        best, bk = -1.0, None
        for k in range(a + 1, b):
            px, py = arr[k]
            if l2 == 0.0:
                d = math.sqrt((px - ax) * (px - ax)
                              + (py - ay) * (py - ay))
            else:
                d = abs((bx - ax) * (ay - py)
                        - (ax - px) * (by - ay)) / math.sqrt(l2)
            if d > best:        # first max -> smallest index on ties
                best, bk = d, k
        if best > eps:
            keep[bk] = True
            stack.append((a, bk))
            stack.append((bk, b))
    return [i for i, k in enumerate(keep) if k]


def simplify_lines(features: DataFrame, eps: float,
                   project: bool = True) -> DataFrame:
    """Simplify every line feature; output ``(feature_id, label,
    n_points, n_kept, idx_sum, idx_sq_sum, geom_wkb)`` — the
    simplified geometry plus integer kept-vertex statistics (indices
    are per-feature positions, multi-part lines offset each part by
    the cumulative point count).  ``eps`` is in projected metres
    (``project=False``: raw coordinate units)."""
    if eps < 0:
        raise ValueError("eps must be non-negative")
    src = features.select("feature_id", "label", "geom_wkb", "kind")
    do_project = project

    def simp_fn(it):
        import numpy as np
        import pandas as pd

        from .dissolve import _check_kinds
        for pdf in it:
            _check_kinds(pdf, "line", "simplify_lines")
            out = {"feature_id": [], "label": [], "n_points": [],
                   "n_kept": [], "idx_sum": [], "idx_sq_sum": [],
                   "geom_wkb": []}
            for fid, label, wkb in zip(pdf["feature_id"], pdf["label"],
                                       pdf["geom_wkb"]):
                g = G.wkb_loads(bytes(wkb))
                gp = (G.transform_geom(g, mollweide_forward)
                      if do_project else g)
                raw_parts = G.extract_kind_parts(g, "line")
                parts = G.extract_kind_parts(gp, "line")
                n_pts = n_kept = s1 = s2 = 0
                simp_parts = []
                off = 0
                for raw, part in zip(raw_parts, parts):
                    arr = np.asarray(part,
                                     dtype=np.float64).reshape(-1, 2)
                    keep = dp_keep_indices(
                        [(float(x), float(y)) for x, y in arr], eps)
                    rawa = np.asarray(raw,
                                      dtype=np.float64).reshape(-1, 2)
                    simp_parts.append(rawa[keep].tolist())
                    n_pts += len(arr)
                    n_kept += len(keep)
                    s1 += sum(off + i for i in keep)
                    s2 += sum((off + i) ** 2 for i in keep)
                    off += len(arr)
                if len(simp_parts) == 1:
                    gs = {"type": "LineString",
                          "coordinates": simp_parts[0]}
                else:
                    gs = {"type": "MultiLineString",
                          "coordinates": simp_parts}
                out["feature_id"].append(int(fid))
                out["label"].append(label)
                out["n_points"].append(n_pts)
                out["n_kept"].append(n_kept)
                out["idx_sum"].append(s1)
                out["idx_sq_sum"].append(s2)
                out["geom_wkb"].append(G.wkb_dumps(gs))
            yield pd.DataFrame(out)

    return src.mapInPandas(
        simp_fn, schema="feature_id long, label string, n_points long, "
                        "n_kept long, idx_sum long, idx_sq_sum long, "
                        "geom_wkb binary")
