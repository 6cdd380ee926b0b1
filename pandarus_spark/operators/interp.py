"""Area-weighted attribute transfer (areal interpolation) over the
overlay output.

The reference's intersection tables exist to drive exactly this
computation downstream (regionalized LCA allocates source-feature
values across intersecting regions proportionally to intersected
area; reference docs/usage and core.py:190-269's derived (C,A)/(C,B)
tables are the inputs to that weighting).  Here the whole allocation
is one Catalyst plan over the overlay DataFrame:

    target_share(src -> tgt) = value(src) * measure(src ∩ tgt)
                                          / Σ_t measure(src ∩ t)

i.e. each source's value is distributed over the targets it
intersects, normalized by its total intersected measure (the
`calculate_remaining` operator covers the un-intersected residue).

Float-determinism contract (COVERAGE.md policy): measures are rounded
to integer m² first, the per-pair share is computed with one fixed
left-associated expression ``value*MICRO * m2 / tot_m2`` (each step
IEEE-correctly-rounded, so bit-identical on any engine), rounded to
integer micro-units, and per-target totals are int64 sums — order-free
under any partitioning.

Scale shape: one window shuffle on the source label (the overlay is
already cell-partitioned; at 10^12 rows this is a partial-agg-free
window, but source labels are far fewer than overlay rows so the
shuffle is the natural key), one shuffle for the per-target rollup,
and the values table joins on the source key (broadcast when small,
AQE otherwise).  No driver-side loops, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

MICRO = 1_000_000


def areal_interpolate(intersections: DataFrame, values: DataFrame,
                      source_col: str = "to_label",
                      target_col: str = "from_label",
                      measure_col: str = "measure",
                      value_col: str = "value") -> DataFrame:
    """Distribute ``values[value_col]`` (keyed by ``source_col``) over
    targets proportionally to intersected measure.

    Returns one row per target: ``(target_col, n_sources,
    recv_micro)`` where ``recv_micro`` is the received total in
    integer micro-units of the value's unit (int64 — exact, order-free
    under any partitioning/parallelism).
    """
    for c in (source_col, target_col, measure_col):
        if c not in intersections.columns:
            raise ValueError(f"intersections missing column {c!r}")
    if source_col not in values.columns or value_col not in values.columns:
        raise ValueError(f"values must carry ({source_col!r}, {value_col!r})")

    m2 = F.round(F.col(measure_col), 0).cast("long")
    d = intersections.select(F.col(source_col), F.col(target_col),
                             m2.alias("_m2"))
    tot = F.sum("_m2").over(Window.partitionBy(source_col))
    d = d.withColumn("_tot", tot)
    d = d.join(values.select(source_col, value_col), source_col)
    # fixed association: ((value * MICRO) * m2) / tot — every step is a
    # single correctly-rounded IEEE op, so any engine that evaluates
    # the same left-associated expression reproduces the bits.
    share = (F.col(value_col).cast("double") * F.lit(float(MICRO))
             * F.col("_m2").cast("double") / F.col("_tot").cast("double"))
    contrib = F.round(share, 0).cast("long")
    return (d.select(F.col(target_col), contrib.alias("_c"))
             .groupBy(target_col)
             .agg(F.count("*").alias("n_sources"),
                  F.sum("_c").alias("recv_micro")))


def areal_interpolate_sql(pairs_rel: str, values_rel: str,
                          source_col: str = "to_label",
                          target_col: str = "from_label",
                          measure_col: str = "measure_m2",
                          value_col: str = "value") -> str:
    """DuckDB rendering of :func:`areal_interpolate` over a relation of
    already-rounded integer measures — the identical left-associated
    share expression and integer micro-unit rounding."""
    return f"""
SELECT {target_col}, count(*) AS n_sources,
       CAST(SUM(CAST(ROUND(CAST({value_col} AS DOUBLE) * {float(MICRO)!r}
                     * CAST({measure_col} AS DOUBLE)
                     / CAST(tot AS DOUBLE)) AS BIGINT)) AS BIGINT) AS recv_micro
FROM (
  SELECT p.{target_col}, p.{measure_col}, v.{value_col},
         SUM(p.{measure_col}) OVER (PARTITION BY p.{source_col}) AS tot
  FROM ({pairs_rel}) p JOIN ({values_rel}) v USING ({source_col})
) s
GROUP BY {target_col}"""
