"""Hierarchical cell-index rollup (graft addition — the reference has
no aggregation layer at all; this is the hypertable-rollup analogue
over the engine's quadtree cell ids, tiling/cells.py).

Given any table carrying cell ids (tile assignments from
``cover_features``, streaming tile counts, zonal outputs), aggregate
it up the resolution hierarchy: each cell's ancestor at a coarser
resolution is closed-form integer arithmetic on the id —

    parent(res,ix,iy → p) = (p << 58) | ((iy >> (res-p)) << 29) | (ix >> (res-p))

so a rollup is ONE partial-aggregated shuffle per requested level (or
one total with the levels exploded — what :func:`tile_rollup_levels`
does), no geometry in flight, no Python.  The same arithmetic renders
in ANSI SQL (:func:`parent_cell_sql`) for the DuckDB oracle.

Scale notes: the exploded (row × levels) table is narrow (cell id +
measures); partial aggregation collapses it map-side before the single
shuffle, and coarser levels shrink geometrically — the classic rollup
pyramid.  At 100 TB this is the cheapest query in the engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..tiling.cells import MAX_RES, RES_SHIFT, Y_SHIFT

_XY_MASK = (1 << Y_SHIFT) - 1


def parent_cell(cell: Column, to_res: int) -> Column:
    """Ancestor cell id at ``to_res`` (NULL-safe integer arithmetic;
    requires every input cell's resolution ≥ ``to_res`` — enforced by
    the callers below).  The variable-width shift is a division by a
    power of two: exact in doubles (≤ 29 significand bits, exponent
    shift only), so ``floor`` reproduces the bit shift everywhere."""
    res = F.shiftright(cell, RES_SHIFT)
    ix = cell.bitwiseAND(F.lit(_XY_MASK))
    iy = F.shiftright(cell, Y_SHIFT).bitwiseAND(F.lit(_XY_MASK))
    scale = F.pow(F.lit(2.0), (res - F.lit(to_res)).cast("double"))
    px = F.floor(ix.cast("double") / scale).cast("long")
    py = F.floor(iy.cast("double") / scale).cast("long")
    return F.lit(to_res << RES_SHIFT) + py * F.lit(1 << Y_SHIFT) + px


def parent_cell_sql(cell: str, to_res: int) -> str:
    res = f"({cell} // {1 << RES_SHIFT})"
    ix = f"({cell} % {1 << Y_SHIFT})"
    iy = f"(({cell} // {1 << Y_SHIFT}) % {1 << Y_SHIFT})"
    scale = f"power(2.0, {res} - {to_res})"
    return (f"({to_res} * {1 << RES_SHIFT}"
            f" + CAST(floor({iy} / {scale}) AS BIGINT) * {1 << Y_SHIFT}"
            f" + CAST(floor({ix} / {scale}) AS BIGINT))")


def _check_levels(levels) -> list[int]:
    out = sorted(set(int(r) for r in levels))
    if not out:
        raise ValueError("at least one rollup level required")
    if out[0] < 0 or out[-1] > MAX_RES:
        raise ValueError(f"levels must be within [0, {MAX_RES}]")
    return out


def tile_rollup(assign: DataFrame, to_res: int, cell_col: str = "cell",
                weight_col: str | None = None) -> DataFrame:
    """Aggregate per-cell rows to their ancestors at ``to_res``:
    (cell, n) — plus sum(``weight_col``) as ``total`` when given.
    Input cells coarser than ``to_res`` cannot be attributed to a
    single descendant and raise at plan time when detectable, else at
    execution (the guard column)."""
    [to_res] = _check_levels([to_res])
    cell = F.col(cell_col)
    # NULL-out cells coarser than the target, then fail loudly instead
    # of silently mis-attributing them
    guarded = F.coalesce(
        F.when(F.shiftright(cell, RES_SHIFT) >= to_res,
               parent_cell(cell, to_res)),
        F.raise_error(F.lit(f"cell coarser than to_res={to_res}")))
    aggs = [F.count("*").alias("n")]
    if weight_col is not None:
        aggs.append(F.round(F.sum(weight_col), 6).alias("total"))
    return (assign.select(guarded.alias("parent_cell"),
                          *([F.col(weight_col)] if weight_col else []))
            .groupBy("parent_cell").agg(*aggs))


def tile_rollup_levels(assign: DataFrame, levels, cell_col: str = "cell",
                       weight_col: str | None = None) -> DataFrame:
    """Multi-level pyramid in ONE pass: explode each row to every
    requested ancestor level, then a single partial-agg shuffle.
    Output: (res, cell, n[, total])."""
    levels = _check_levels(levels)
    cell = F.col(cell_col)
    pairs = F.array(*[
        F.struct(F.lit(r).alias("res"), parent_cell(cell, r).alias("cell"))
        for r in levels])
    base = assign.select(
        F.coalesce(
            F.when(F.shiftright(cell, RES_SHIFT) >= levels[-1], pairs),
            F.raise_error(F.lit(f"cell coarser than max level {levels[-1]}"))
        ).alias("__lv"),
        *([F.col(weight_col)] if weight_col else []))
    ex = base.select(F.explode("__lv").alias("lv"),
                     *([F.col(weight_col)] if weight_col else []))
    aggs = [F.count("*").alias("n")]
    if weight_col is not None:
        aggs.append(F.round(F.sum(weight_col), 6).alias("total"))
    return (ex.select(F.col("lv.res").alias("res"), F.col("lv.cell").alias("cell"),
                      *([F.col(weight_col)] if weight_col else []))
            .groupBy("res", "cell").agg(*aggs))
