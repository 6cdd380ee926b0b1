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


def convert_to_vector(cells: DataFrame, value_col: str = "value") -> DataFrame:
    """Polygonize: contiguous (4-connected) same-value cell regions →
    MultiPolygon of cell boxes, properties (id, val) — the reference
    emits {filename, id, val} (helpers.py:63-72); filename is a sink
    concern here.

    groupBy(value) distributes safely (different values never share a
    region); union-find joins touching cells inside each group."""

    def fn(pdf):
        import pandas as pd
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
        out_ids, out_vals, out_wkbs = [], [], []
        mnx = pdf["minx"].to_numpy(); mny = pdf["miny"].to_numpy()
        mxx = pdf["maxx"].to_numpy(); mxy = pdf["maxy"].to_numpy()
        for root, members in sorted(groups.items()):
            polys = [[np.array([[mnx[i], mny[i]], [mxx[i], mny[i]], [mxx[i], mxy[i]],
                                [mnx[i], mxy[i]], [mnx[i], mny[i]]])] for i in members]
            geom = {"type": "MultiPolygon", "coordinates": polys}
            out_ids.append(int(rows[root]) * (1 << 32) + int(cols[root]))
            out_vals.append(val)
            out_wkbs.append(G.wkb_dumps(geom))
        return pd.DataFrame({"id": pd.Series(out_ids, dtype="int64"),
                             "val": pd.Series(out_vals, dtype="float64"),
                             "geom_wkb": out_wkbs})

    return cells.groupBy(value_col).applyInPandas(fn, schema=VECTORIZE_SCHEMA)
