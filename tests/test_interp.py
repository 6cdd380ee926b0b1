"""areal_interpolate (area-weighted attribute transfer) and
lineage_metrics (distributed per-partition metrics) — round-4
additions over the overlay output."""

import random

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from pandarus_spark.operators.interp import (
    MICRO, areal_interpolate, areal_interpolate_sql)
from pandarus_spark.plans.checkpoint import lineage_metrics


def test_areal_interpolate_hand_case(spark):
    # S1 (value 10) intersects T1 with 300 m2 and T2 with 100 m2
    # -> T1 receives 7.5, T2 receives 2.5; S2 (value 4) only T2 -> 4.0
    inter = spark.createDataFrame(
        [("T1", "S1", 300.0), ("T2", "S1", 100.0), ("T2", "S2", 50.0)],
        "from_label string, to_label string, measure double")
    vals = spark.createDataFrame([("S1", 10), ("S2", 4)],
                                 "to_label string, value long")
    got = {r["from_label"]: (r["n_sources"], r["recv_micro"])
           for r in areal_interpolate(inter, vals).collect()}
    assert got["T1"] == (1, 7_500_000)
    assert got["T2"] == (2, 2_500_000 + 4_000_000)


def _random_overlay(seed=7, n_sources=40, n_targets=60):
    rng = random.Random(seed)
    rows = []
    for s in range(n_sources):
        for t in rng.sample(range(n_targets), rng.randint(1, 6)):
            rows.append((f"T{t}", f"S{s}",
                         rng.randint(1, 10_000) + rng.random()))
    vals = [(f"S{s}", s % 13 + 1) for s in range(n_sources)]
    return rows, vals


def test_areal_interpolate_mass_conservation_and_invariance(spark):
    rows, vals = _random_overlay()
    inter = spark.createDataFrame(
        rows, "from_label string, to_label string, measure double")
    values = spark.createDataFrame(vals, "to_label string, value long")
    out = areal_interpolate(inter, values)
    got = {r["from_label"]: r["recv_micro"] for r in out.collect()}
    # every source is fully distributed over its targets, so the total
    # received mass equals the total source mass up to one half
    # micro-unit of rounding per overlay pair
    total = sum(got.values())
    mass = sum(v * MICRO for _, v in vals)
    assert abs(total - mass) <= len(rows)
    # int64 micro-units: identical under any partitioning
    re = areal_interpolate(inter.repartition(7, "from_label"), values)
    assert {r["from_label"]: r["recv_micro"] for r in re.collect()} == got


def test_areal_interpolate_duckdb_parity(spark):
    rows, vals = _random_overlay(seed=11)
    inter = spark.createDataFrame(
        rows, "from_label string, to_label string, measure double")
    values = spark.createDataFrame(vals, "to_label string, value long")
    got = sorted(tuple(r) for r in areal_interpolate(inter, values).collect())
    con = duckdb.connect()
    con.register("pairs", pd.DataFrame(
        rows, columns=["from_label", "to_label", "measure"]))
    con.register("vals", pd.DataFrame(vals, columns=["to_label", "value"]))
    sql = areal_interpolate_sql(
        "SELECT from_label, to_label, "
        "CAST(ROUND(measure) AS BIGINT) AS measure_m2 FROM pairs",
        "SELECT to_label, value FROM vals")
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def test_lineage_metrics_matches_manual_agg(spark):
    rows = [(f"T{i % 5}", f"S{i % 3}", (i * 37) % 1000) for i in range(200)]
    df = spark.createDataFrame(
        rows, "from_label string, to_label string, measure_m2 long")
    pid = F.pmod(F.length("to_label") + F.ascii("to_label"), F.lit(4))
    out = {r["partition_id"]: (r["n_rows"], r["area_sum_m2"], r["n_targets"])
           for r in lineage_metrics(df, pid).collect()}
    manual = {}
    for fl, tl, m in rows:
        p = (len(tl) + ord(tl[0])) % 4
        c, s, tg = manual.get(p, (0, 0, set()))
        tg = tg | {fl}
        manual[p] = (c + 1, s + m, tg)
    want = {p: (c, s, len(tg)) for p, (c, s, tg) in manual.items()}
    assert out == want
    # order-free int sums: identical under repartitioning
    out2 = {r["partition_id"]: (r["n_rows"], r["area_sum_m2"], r["n_targets"])
            for r in lineage_metrics(df.repartition(13), pid).collect()}
    assert out2 == want


def test_areal_interpolate_missing_column_raises(spark):
    inter = spark.createDataFrame([("T", "S", 1.0)],
                                  "from_label string, to_label string, measure double")
    vals = spark.createDataFrame([("S", 1)], "to_label string, value long")
    import pytest
    with pytest.raises(ValueError, match="measure"):
        from pandarus_spark.operators.interp import areal_interpolate as ai
        ai(inter.drop("measure"), vals)
    with pytest.raises(ValueError, match="value"):
        from pandarus_spark.operators.interp import areal_interpolate as ai
        ai(inter, vals.drop("value"))


def test_areal_interpolate_empty_overlay(spark):
    inter = spark.createDataFrame(
        [], "from_label string, to_label string, measure double")
    vals = spark.createDataFrame([("S", 1)], "to_label string, value long")
    assert areal_interpolate(inter, vals).count() == 0


def test_areal_interpolate_randomized_mass_conservation(spark):
    """Property sweep across seeds: received micro-mass equals source
    mass within half a micro-unit per overlay pair, at any fan-out."""
    for seed in (1, 2, 3):
        rows, vals = _random_overlay(seed=seed, n_sources=25, n_targets=40)
        inter = spark.createDataFrame(
            rows, "from_label string, to_label string, measure double")
        values = spark.createDataFrame(vals, "to_label string, value long")
        got = areal_interpolate(inter, values).agg(
            F.sum("recv_micro")).collect()[0][0]
        mass = sum(v * MICRO for _, v in vals)
        assert abs(got - mass) <= len(rows)
