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

from .dedup import MINHASH_P, hash60, hash60_sql, minhash_coeffs

# quotients of the estimate DIV land in int64 (Spark's DIV returns
# LONG): estimate_micro ~ cardinality * 1e6, fine through ~9e12 keys
_DEC = "DECIMAL(38,0)"


def _hll_estimate_exprs(m: int, dialect: str) -> tuple[str, str, str]:
    """(linear_counting, raw_estimate, branch_condition) SQL over the
    columns ``n_zero`` / ``int_sum`` — ONE definition of the rational
    alpha, the integer tie-break, and the integer branch inequality,
    rendered per dialect so the grouped/global/SQL variants cannot
    drift (review finding, late r5)."""
    from ..functions.detmath import det_ln_micro_sql
    w1 = 60 - (m.bit_length() - 1) + 1          # m = 2^p  =>  w1 = 60-p+1
    num_c = 7213 * (m ** 3) * (1 << w1)
    den_c = 10000 * m + 10790
    big = _DEC if dialect == "spark" else "HUGEINT"
    div = "DIV" if dialect == "spark" else "//"
    lin = f"{m} * {det_ln_micro_sql(str(m), 'n_zero', dialect)}"
    raw = (f"(2 * CAST({num_c} AS {big}) * 1000000 "
           f"+ CAST({den_c} AS {big}) * int_sum) "
           f"{div} (2 * CAST({den_c} AS {big}) * int_sum)")
    cond = (f"n_zero > 0 AND 2 * CAST({num_c} AS {big}) "
            f"<= 5 * {m} * CAST({den_c} AS {big}) * int_sum")
    return lin, raw, cond


def _hll_bucket_rho(kcol, p: int):
    """(bucket, rho) Columns of the register derivation — shared by the
    global and grouped paths."""
    w_bits = 60 - p
    h = hash60(kcol.cast("string"))
    bucket = F.shiftright(h, w_bits)
    w = h.bitwiseAND(F.lit((1 << w_bits) - 1).cast("long"))
    rho = (F.when(w == 0, F.lit(w_bits + 1))
            .otherwise(F.lit(w_bits + 1) - F.length(F.bin(w)))).cast("int")
    return bucket, rho


def hll_registers(df: DataFrame, key, p: int = 8) -> DataFrame:
    """(bucket, reg) register table of the HLL sketch over ``key``
    (a column name or Column).  Empty buckets are materialized with
    reg = 0 so the table always has exactly ``2**p`` rows and merges
    by plain max.  One partial-agg shuffle of <= 2^p rows per
    partition; NULL keys are skipped (SQL count-distinct convention)."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p
    col = F.col(key) if isinstance(key, str) else key
    bucket, rho = _hll_bucket_rho(col, p)
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
    # alpha_m = 7213*m/(10000*m + 10790); branch E <= 2.5*m is the
    # integer inequality 2*num <= 5*m*den — see _hll_estimate_exprs
    lin, raw, cond = _hll_estimate_exprs(m, "spark")
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
    m = 1 << p
    w1 = 60 - p + 1
    lin, raw, cond = _hll_estimate_exprs(m, "duckdb")
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


def hll_estimate_by(df: DataFrame, key, group, p: int = 8) -> DataFrame:
    """Per-group HLL cardinality estimate: one row per ``group`` value
    with the same (m, n_zero, int_sum, estimate_micro) contract as
    :func:`hll_estimate` — the "distinct URLs per domain / vocabulary
    per language" shape of corpus accounting.

    Scale: registers never materialize a per-group 2^p grid.  The
    partial agg collapses each task to <= groups * 2^p (group, bucket,
    max-rho) rows; empty buckets are algebra, not rows —
    ``n_zero = m - count(buckets present)`` and each absent bucket
    contributes exactly ``2^(w1)`` to the harmonic integer sum, so
    ``int_sum = present_sum + n_zero * 2^w1``.  Two narrow shuffles
    (group+bucket, then group), both on integer keys."""
    if not 4 <= p <= 15:
        raise ValueError("hll_estimate_by supports 4 <= p <= 15 "
                         "(register sanity / DECIMAL(38,0) bound)")
    m = 1 << p
    w1 = 60 - p + 1
    kcol = F.col(key) if isinstance(key, str) else key
    gcol = F.col(group) if isinstance(group, str) else group
    bucket, rho = _hll_bucket_rho(kcol, p)
    regs = (df.filter(kcol.isNotNull())
              .select(gcol.alias("grp"), bucket.alias("bucket"),
                      rho.alias("rho"))
              .groupBy("grp", "bucket").agg(F.max("rho").alias("reg")))
    s = regs.groupBy("grp").agg(
        (F.lit(m) - F.count("*")).cast("long").alias("n_zero"),
        (F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {w1} - reg)"))
         + (F.lit(m) - F.count("*")) * F.lit(1 << w1)).alias("int_sum"))
    lin, raw, cond = _hll_estimate_exprs(m, "spark")
    return s.select(
        F.col("grp"), F.lit(m).cast("long").alias("m"), "n_zero", "int_sum",
        F.expr(f"CASE WHEN {cond} THEN {lin} ELSE {raw} END")
         .cast("long").alias("estimate_micro"))


def hll_estimate_by_sql(key_expr: str, group_expr: str, p: int = 8,
                        source: str = "documents") -> str:
    """DuckDB rendering of :func:`hll_estimate_by`."""
    m = 1 << p
    w_bits = 60 - p
    w1 = w_bits + 1
    h = hash60_sql(f"CAST({key_expr} AS VARCHAR)")
    lin, raw, cond = _hll_estimate_exprs(m, "duckdb")
    return f"""
WITH h AS (SELECT {group_expr} AS grp, {h} AS h FROM {source}
           WHERE {key_expr} IS NOT NULL),
r AS (
  SELECT grp, h >> {w_bits} AS bucket,
         CASE WHEN (h & {(1 << w_bits) - 1}) = 0 THEN {w1}
              ELSE {w1} - length(bin(h & {(1 << w_bits) - 1}))
         END AS rho
  FROM h),
regs AS (SELECT grp, bucket, max(rho) AS reg FROM r GROUP BY grp, bucket),
s AS (
  SELECT grp, {m} - count(*) AS n_zero,
         sum(CAST(1 AS BIGINT) << ({w1} - reg))
           + ({m} - count(*)) * (CAST(1 AS BIGINT) << {w1}) AS int_sum
  FROM regs GROUP BY grp)
SELECT grp, CAST({m} AS BIGINT) AS m, CAST(n_zero AS BIGINT) AS n_zero,
       CAST(int_sum AS BIGINT) AS int_sum,
       CAST(CASE WHEN {cond} THEN {lin} ELSE {raw} END AS BIGINT)
         AS estimate_micro
FROM s"""


# --------------------------------------------------------------------------
# Count-min sketch: heavy-hitter frequency estimation in bounded memory
# --------------------------------------------------------------------------

def _cms_check(d: int, w: int) -> None:
    if d < 1 or w < 2:
        raise ValueError("need d >= 1 hash rows and w >= 2 columns")
    if d * w > (1 << 22):
        raise ValueError("d*w cells must stay <= 2^22 (~4M) — the grid "
                         "is broadcast on the probe side and zero-filled "
                         "on the build side; larger sketches defeat both")


def _cms_cols(kcol, d: int, w: int):
    """array<int> of the d column indices for one key: affine
    permutations (shared ``minhash_coeffs`` literals) of ONE md5 base
    hash — one md5 per input row, not d (the md5 dominated the first
    cut: 18.8 -> 6.5 s on the 200k-doc bench leg)."""
    base = F.pmod(hash60(kcol.cast("string")), F.lit(MINHASH_P))
    return F.array(*[
        F.pmod(F.pmod(F.lit(a) * base + F.lit(b), F.lit(MINHASH_P)),
               F.lit(w)).cast("int")
        for a, b in minhash_coeffs(d)])


def cms_counters(df: DataFrame, key, d: int = 4, w: int = 1024,
                 weight=None) -> DataFrame:
    """Count-min sketch counter grid over ``key``: d hash rows x w
    columns of int64 counters as (row, col, cnt), all d*w cells
    materialized (zero-filled) so sketches merge by plain SUM — the
    bounded-memory token-frequency structure for a 10^12-row corpus
    where the exact vocabulary count table itself is too hot to keep.

    Engine-exact: ONE shared md5 base hash per key; row r's column is
    the affine permutation ``((a_r*base + b_r) mod P) mod w`` over the
    shared ``minhash_coeffs`` literals — integer ops only, identical
    in DuckDB, and the expensive md5 runs once per row, not d times.
    Scale: the explode is d narrow integer rows per input row and the
    partial agg collapses each task to <= d*w cells before the ONE
    shuffle, so shuffle volume is tasks * d * w regardless of input
    size (same contract as the HLL registers).  ``weight`` (optional
    integer Column) turns it into a weighted-frequency sketch."""
    _cms_check(d, w)
    kcol = F.col(key) if isinstance(key, str) else key
    wcol = F.lit(1).cast("long") if weight is None else weight.cast("long")
    e = (df.filter(kcol.isNotNull())
           .select(_cms_cols(kcol, d, w).alias("_cols"), wcol.alias("wt"))
           .select(F.posexplode("_cols").alias("row", "col"), "wt"))
    cells = e.groupBy("row", "col").agg(F.sum("wt").alias("cnt"))
    spark = df.sparkSession
    grid = (spark.range(d * w)
            .select((F.col("id") / w).cast("int").alias("row"),
                    F.pmod(F.col("id"), F.lit(w)).cast("int").alias("col")))
    return (grid.join(cells, ["row", "col"], "left")
                .na.fill({"cnt": 0})
                .select("row", "col", F.col("cnt").cast("long").alias("cnt")))


def cms_lookup(counters: DataFrame, probes: DataFrame, key,
               d: int = 4, w: int = 1024) -> DataFrame:
    """Point-frequency estimates from a :func:`cms_counters` grid:
    one row per probe key with ``est = min over rows of
    cnt[r][h_r(key)]`` — the classic CMS upper bound (est >= true
    count always; overestimate probability bounded by the grid size).

    The counter grid is d*w rows — broadcast by construction — so the
    probe side never shuffles for the join; the only exchange is the
    per-key min over d rows."""
    _cms_check(d, w)
    kcol = F.col(key) if isinstance(key, str) else key
    probed = (probes.select(kcol.cast("string").alias("k"))
                    .distinct()
                    .select("k", _cms_cols(F.col("k"), d, w).alias("_cols"))
                    .select("k", F.posexplode("_cols").alias("row", "col")))
    return (probed.join(F.broadcast(counters), ["row", "col"], "left")
                  .na.fill({"cnt": 0})
                  .groupBy("k").agg(F.min("cnt").alias("est"))
                  .select(F.col("k").alias(key if isinstance(key, str)
                                           else "key"), "est"))


def _cms_coeffs(d: int) -> tuple[str, str]:
    """(list_a, list_b) DuckDB list literals of the shared affine
    coefficients for ``d`` hash rows."""
    from .dedup import minhash_coeffs
    cs = minhash_coeffs(d)
    return ("[" + ",".join(str(a) for a, _ in cs) + "]",
            "[" + ",".join(str(b) for _, b in cs) + "]")


def _cms_col_sql(d: int, w: int) -> str:
    """col expression over (base, r.range) — affine permutation of the
    shared base hash, mirroring :func:`_cms_cols`."""
    la, lb = _cms_coeffs(d)
    return (f"(({la}[r.range + 1] * base + {lb}[r.range + 1])"
            f" % {MINHASH_P}) % {w}")


def _cms_cells_sql(key_expr: str, d: int, w: int, source: str,
                   weight_expr: str = "1") -> str:
    h = hash60_sql(f"CAST({key_expr} AS VARCHAR)")
    return f"""
  SELECT r.range AS row, {_cms_col_sql(d, w)} AS col, sum(wt) AS cnt
  FROM (SELECT {h} % {MINHASH_P} AS base,
               CAST({weight_expr} AS BIGINT) AS wt
        FROM {source} WHERE {key_expr} IS NOT NULL) t
  CROSS JOIN range({d}) r
  GROUP BY 1, 2"""


def cms_counters_sql(key_expr: str, d: int = 4, w: int = 1024,
                     source: str = "documents",
                     weight_expr: str = "1") -> str:
    """DuckDB rendering of :func:`cms_counters`."""
    return f"""
WITH cells AS ({_cms_cells_sql(key_expr, d, w, source, weight_expr)})
SELECT CAST(g.range // {w} AS INT) AS row,
       CAST(g.range % {w} AS INT) AS col,
       CAST(coalesce(cells.cnt, 0) AS BIGINT) AS cnt
FROM range({d * w}) g
LEFT JOIN cells ON g.range // {w} = cells.row AND g.range % {w} = cells.col"""


def cms_lookup_sql(key_expr: str, probe_sql: str, d: int = 4,
                   w: int = 1024, source: str = "documents",
                   weight_expr: str = "1") -> str:
    """DuckDB rendering of the build+probe pipeline: ``probe_sql``
    must yield one column ``k`` of probe keys."""
    h = hash60_sql("CAST(p.k AS VARCHAR)")
    return f"""
WITH cells AS ({_cms_cells_sql(key_expr, d, w, source, weight_expr)}),
pb AS (SELECT DISTINCT k, {h} % {MINHASH_P} AS base FROM ({probe_sql}) p),
probes AS (SELECT k, r.range AS row, {_cms_col_sql(d, w)} AS col
           FROM pb CROSS JOIN range({d}) r)
SELECT probes.k, CAST(min(coalesce(cells.cnt, 0)) AS BIGINT) AS est
FROM probes LEFT JOIN cells ON probes.row = cells.row AND probes.col = cells.col
GROUP BY probes.k"""
