"""Mergeable distributed sketches, engine-exact (graft addition).

HyperLogLog is the workhorse of corpus accounting at 10^12 rows
(distinct URLs, vocabulary size, per-domain cardinalities) — but the
textbook implementation is float-laden (harmonic mean, ln, bias
constants), which breaks this repo's bit-identical-oracle contract.
This variant is INTEGER-EXACT end to end:

* registers come from the shared md5 lanes (``dedup.hash60``): bucket
  = top ``p`` bits, rho = leading-zero count of the remaining
  ``60-p`` bits + 1 — pure integer ops, identical in both engines;
* the harmonic sum ``sum(2^-reg)`` is carried as the exact integer
  ``sum(2^(W-reg))`` over denominator ``2^W`` (W = 60-p+1) — an
  order-free int64 sum;
* the HLL alpha is REPLACED by its defining rational:
  ``alpha_m = 7213*m / (10000*m + 10790)`` (the usual 0.7213/(1 +
  1.079/m) written exactly), so the raw estimate is a ratio of exact
  integers evaluated in DECIMAL(38,0)/HUGEINT with the explicit
  round-half-up integer tie-break;
* the small-range linear-counting branch ``m*ln(m/V)`` uses
  ``detmath.det_ln_micro`` (correctly-rounded arithmetic only), and
  the branch CONDITION ``E <= 2.5*m`` is evaluated as the integer
  inequality ``2*num <= 5*m*den`` — no float anywhere in the
  operator, so two engines cannot disagree even on the branch.

Mergeability: registers merge by MAX — union of shards = max of
register tables, the property that makes the sketch one partial-agg
shuffle at any scale (and lets per-partition sketches roll up the
checkpoint ledger without a second pass).

No reference counterpart: pandarus has no sketch/cardinality layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import hash60, hash60_sql

# quotients of the estimate DIV land in int64 (Spark's DIV returns
# LONG): estimate_micro ~ cardinality * 1e6, fine through ~9e12 keys
_DEC = "DECIMAL(38,0)"


def hll_registers(df: DataFrame, key, p: int = 8) -> DataFrame:
    """(bucket, reg) register table of the HLL sketch over ``key``
    (a column name or Column).  Empty buckets are materialized with
    reg = 0 so the table always has exactly ``2**p`` rows and merges
    by plain max.  One partial-agg shuffle of <= 2^p rows per
    partition; NULL keys are skipped (SQL count-distinct convention)."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p
    w_bits = 60 - p
    col = F.col(key) if isinstance(key, str) else key
    h = hash60(col.cast("string"))
    bucket = F.shiftright(h, w_bits)
    w = h.bitwiseAND(F.lit((1 << w_bits) - 1).cast("long"))
    rho = (F.when(w == 0, F.lit(w_bits + 1))
            .otherwise(F.lit(w_bits + 1) - F.length(F.bin(w)))).cast("int")
    regs = (df.filter(col.isNotNull())
              .select(bucket.alias("bucket"), rho.alias("rho"))
              .groupBy("bucket").agg(F.max("rho").alias("reg")))
    full = df.sparkSession.range(m).select(F.col("id").alias("bucket"))
    return (full.join(regs, "bucket", "left")
                .na.fill({"reg": 0})
                .select("bucket", F.col("reg").cast("int").alias("reg")))


def hll_estimate(df: DataFrame, key, p: int = 8) -> DataFrame:
    """One-row cardinality estimate: (m, n_zero, int_sum,
    estimate_micro BIGINT) — estimate_micro is the HLL estimate in
    integer MICRO-counts (round-half-up, explicit integer tie-break).
    See the module docstring for why every step is integer-exact.

    Range: ``p <= 15`` (the DECIMAL(38,0) intermediate
    ``2*num*1e6`` crosses 38 digits at p=16) and estimates up to
    ~9e12 (Spark's DIV quotient is int64; estimate_micro = E*1e6)."""
    if p > 15:
        raise ValueError("hll_estimate supports p <= 15 "
                         "(DECIMAL(38,0) intermediate bound)")
    m = 1 << p
    w1 = 60 - p + 1                     # max rho; harmonic denominator 2^w1
    regs = hll_registers(df, key, p)
    s = regs.agg(
        F.sum((F.col("reg") == 0).cast("long")).alias("n_zero"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {w1} - reg)"))
         .alias("int_sum"))
    # raw estimate num/den = alpha_m * m^2 * 2^w1 / int_sum with
    # alpha_m = 7213*m/(10000*m + 10790):
    #   num = 7213 * m^3 * 2^w1          (constant)
    #   den = (10000*m + 10790) * int_sum
    num_c = 7213 * (m ** 3) * (1 << w1)
    den_c = 10000 * m + 10790
    from ..functions.detmath import det_ln_micro_sql
    lin = f"{m} * {det_ln_micro_sql(str(m), 'n_zero', 'spark')}"
    raw = (f"(2 * CAST({num_c} AS {_DEC}) * 1000000 "
           f"+ CAST({den_c} AS {_DEC}) * int_sum) "
           f"DIV (2 * CAST({den_c} AS {_DEC}) * int_sum)")
    # branch: E <= 2.5*m  <=>  2*num <= 5*m*den   (exact integers)
    cond = (f"n_zero > 0 AND 2 * CAST({num_c} AS {_DEC}) "
            f"<= 5 * {m} * CAST({den_c} AS {_DEC}) * int_sum")
    return s.select(
        F.lit(m).cast("long").alias("m"), "n_zero", "int_sum",
        F.expr(f"CASE WHEN {cond} THEN {lin} ELSE {raw} END")
         .cast("long").alias("estimate_micro"))


def hll_registers_sql(key_expr: str, p: int = 8,
                      source: str = "documents") -> str:
    """DuckDB rendering of :func:`hll_registers`."""
    m = 1 << p
    w_bits = 60 - p
    h = hash60_sql(f"CAST({key_expr} AS VARCHAR)")
    return f"""
WITH h AS (SELECT {h} AS h FROM {source} WHERE {key_expr} IS NOT NULL),
r AS (
  SELECT h >> {w_bits} AS bucket,
         CASE WHEN (h & {(1 << w_bits) - 1}) = 0 THEN {w_bits + 1}
              ELSE {w_bits + 1} - length(bin(h & {(1 << w_bits) - 1}))
         END AS rho
  FROM h),
regs AS (SELECT bucket, max(rho) AS reg FROM r GROUP BY bucket)
SELECT b.range AS bucket, CAST(coalesce(regs.reg, 0) AS INT) AS reg
FROM range({m}) b LEFT JOIN regs ON b.range = regs.bucket"""


def hll_estimate_sql(key_expr: str, p: int = 8,
                     source: str = "documents") -> str:
    """DuckDB rendering of :func:`hll_estimate` (HUGEINT arithmetic,
    the same rational alpha, the same detmath linear-counting ln)."""
    from ..functions.detmath import det_ln_micro_sql
    m = 1 << p
    w1 = 60 - p + 1
    num_c = 7213 * (m ** 3) * (1 << w1)
    den_c = 10000 * m + 10790
    lin = f"{m} * {det_ln_micro_sql(str(m), 'n_zero', 'duckdb')}"
    raw = (f"(2 * CAST({num_c} AS HUGEINT) * 1000000 "
           f"+ CAST({den_c} AS HUGEINT) * int_sum) "
           f"// (2 * CAST({den_c} AS HUGEINT) * int_sum)")
    cond = (f"n_zero > 0 AND 2 * CAST({num_c} AS HUGEINT) "
            f"<= 5 * {m} * CAST({den_c} AS HUGEINT) * int_sum")
    return f"""
WITH regs AS ({hll_registers_sql(key_expr, p, source)}),
s AS (
  SELECT sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS n_zero,
         sum(CAST(1 AS BIGINT) << ({w1} - reg)) AS int_sum
  FROM regs)
SELECT CAST({m} AS BIGINT) AS m, CAST(n_zero AS BIGINT) AS n_zero,
       CAST(int_sum AS BIGINT) AS int_sum,
       CAST(CASE WHEN {cond} THEN {lin} ELSE {raw} END AS BIGINT)
         AS estimate_micro
FROM s"""
