"""Cross-engine bit-identity for functions/detmath.py — the
libm-independence layer the round-3 driver red (unigram_logprob_docs,
VERDICT.md r3 "What's wrong" #1) made necessary.  The same generator
emits both dialects, and this suite proves Spark and DuckDB agree on
EVERY BIT over a stress set: hapax-to-head ratios, totals to 2^62-1,
and values adjacent to powers of two (the range-reduction boundaries).
"""

import math

import duckdb
import pytest

from pandarus_spark.functions.detmath import (
    det_ln_micro_sql, det_ln_sql)


def _stress_pairs():
    pairs = []
    for t in (1, 2, 3, 7, 1000, 999983, 10**9 + 7, 10**12, 2**52, 2**62 - 1):
        for c in (1, 2, 3, max(t // 2, 1), max(t - 1, 1), t):
            if 1 <= c <= t:
                pairs.append((t, c))
    for k in range(1, 51):
        for d in (-1, 0, 1):
            pairs.append((3 * (1 << k) + d, 3))
            pairs.append(((1 << k) + d, 1))
    return sorted(set(pairs))


def test_det_ln_bit_identity_spark_vs_duckdb(spark):
    pairs = _stress_pairs()
    sdf = spark.createDataFrame(pairs, "t long, c long")
    expr = det_ln_sql("t", "c", "spark")
    micro = det_ln_micro_sql("t", "c", "spark")
    srows = {(r.t, r.c): (r.v, r.m) for r in
             sdf.selectExpr("t", "c", f"{expr} AS v", f"{micro} AS m").collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE p(t BIGINT, c BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
    dexpr = det_ln_sql("t", "c", "duckdb")
    dmicro = det_ln_micro_sql("t", "c", "duckdb")
    drows = {(t, c): (v, m) for t, c, v, m in
             con.execute(f"SELECT t, c, {dexpr}, {dmicro} FROM p").fetchall()}

    for key in pairs:
        sv, sm = srows[key]
        dv, dm = drows[key]
        assert sv == dv and sv.hex() == dv.hex(), (key, sv.hex(), dv.hex())
        assert sm == dm, (key, sm, dm)


def test_det_ln_accuracy_vs_math_log(spark):
    """Semantic check: the arithmetic-only ln IS ln (abs error < 1e-9,
    far below the 5e-7 micro-nat rounding half-step consumers rely on)."""
    pairs = _stress_pairs()
    sdf = spark.createDataFrame(pairs, "t long, c long")
    expr = det_ln_sql("t", "c", "spark")
    for r in sdf.selectExpr("t", "c", f"{expr} AS v").collect():
        true = math.log(r.t / r.c)
        assert abs(r.v - true) <= 1e-9 * max(1.0, abs(true)) + 1e-11, \
            (r.t, r.c, r.v, true)


def test_det_ln_rejects_unknown_dialect():
    with pytest.raises(ValueError):
        det_ln_sql("t", "c", "postgres")


def test_det_ln_property_random_ratios(spark):
    """Property sweep beyond the fixed stress set: random integer
    ratios across magnitudes, Spark vs DuckDB bit-identity AND
    micro-nat agreement (hypothesis strategy, fixed seed via its
    deterministic default derandomization in CI mode)."""
    from hypothesis import given, settings, strategies as st

    cases = []

    @settings(max_examples=300, deadline=None)
    @given(st.integers(min_value=1, max_value=2**62 - 1), st.data())
    def collect(t, data):
        c = data.draw(st.integers(min_value=1, max_value=t))
        cases.append((t, c))

    collect()
    pairs = sorted(set(cases))
    sdf = spark.createDataFrame(pairs, "t long, c long")
    expr = det_ln_sql("t", "c", "spark")
    micro = det_ln_micro_sql("t", "c", "spark")
    srows = {(r.t, r.c): (r.v, r.m) for r in
             sdf.selectExpr("t", "c", f"{expr} AS v", f"{micro} AS m").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE p(t BIGINT, c BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
    drows = {(t, c): (v, m) for t, c, v, m in con.execute(
        f"SELECT t, c, {det_ln_sql('t', 'c', 'duckdb')}, "
        f"{det_ln_micro_sql('t', 'c', 'duckdb')} FROM p").fetchall()}
    for key in pairs:
        sv, sm = srows[key]
        dv, dm = drows[key]
        assert sv.hex() == dv.hex() and sm == dm, (key, sv.hex(), dv.hex())
        true = math.log(key[0] / key[1])
        assert abs(sv - true) <= 1e-9 * max(1.0, abs(true)) + 1e-11
