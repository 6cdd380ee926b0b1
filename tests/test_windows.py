"""Event-time windowing + sessionization (operators/windows.py) and
simhash near-dup banding (operators/dedup.py)."""

import datetime as dt

from pyspark.sql import functions as F

from pandarus_spark.operators import dedup as D
from pandarus_spark.operators.windows import (
    asof_join, hourly_rollup, interval_join, sessionize,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark):
    rows = [
        # user 1: two sessions (gap 45 min between e2 and e3)
        (1, T0, 1, "view", 1.0),
        (2, T0 + dt.timedelta(minutes=10), 1, "click", 2.0),
        (3, T0 + dt.timedelta(minutes=55), 1, "view", 3.0),
        # user 2: one session, crosses the hour boundary
        (4, T0 + dt.timedelta(minutes=50), 2, "view", 4.0),
        (5, T0 + dt.timedelta(minutes=70), 2, "view", 5.0),
        # exact 30-min gap is NOT a new session (strict >)
        (6, T0 + dt.timedelta(minutes=100), 2, "view", 6.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double")


def test_sessionize(spark):
    out = {r["user_id"]: (r["n_events"], r["n_sessions"])
           for r in sessionize(_events(spark), gap_seconds=1800.0).collect()}
    assert out == {1: (3, 2), 2: (3, 1)}


def test_session_rows_hand_corpus(spark):
    from pandarus_spark.operators.windows import session_rows
    got = {(r["user_id"], r["session_start"], r["session_end"], r["n_events"])
           for r in session_rows(_events(spark), gap_seconds=1800.0).collect()}
    assert got == {
        (1, T0, T0 + dt.timedelta(minutes=10), 2),
        (1, T0 + dt.timedelta(minutes=55), T0 + dt.timedelta(minutes=55), 1),
        (2, T0 + dt.timedelta(minutes=50), T0 + dt.timedelta(minutes=100), 3),
    }


def test_session_rows_consistent_with_sessionize(spark):
    """Per-user session count and event totals of the row-level view
    must agree with the aggregate operator on real testdata."""
    from pandarus_spark.operators.windows import session_rows
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .select("user_id", "ts")
    rows = session_rows(ev, gap_seconds=1800.0) \
        .groupBy("user_id").agg(F.count("*").alias("n_sessions"),
                                F.sum("n_events").alias("n_events"))
    agg = sessionize(spark.read.parquet("/root/testdata/sf0.001/events.parquet"),
                     gap_seconds=1800.0)
    a = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in rows.collect()}
    b = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in agg.collect()}
    assert a == b


def test_session_rows_matches_duckdb_oracle(spark):
    import duckdb

    from pandarus_spark.operators.windows import session_rows, session_rows_sql
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .select("user_id", "ts")
    got = sorted(map(tuple, session_rows(ev, gap_seconds=1800.0).collect()))
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                "'/root/testdata/sf0.001/events.parquet'")
    want = sorted(map(tuple, con.execute(session_rows_sql("events")).fetchall()))
    assert got == want


def test_hourly_rollup(spark):
    out = {(r["window_start"].minute == 0 and r["window_start"].hour, r["event_type"]):
           (r["n_events"], r["sum_value"])
           for r in hourly_rollup(_events(spark)).collect()}
    # hour 0: events 1,2,3 (user1) + 4 (user2); hour 1: events 5,6
    assert out[(0, "view")] == (3, 8.0)
    assert out[(0, "click")] == (1, 2.0)
    assert out[(1, "view")] == (2, 11.0)


def test_interval_join_salting_invariant(spark):
    """Hot-bucket salting must not change the result set (r3 verdict
    #8): every pair survives exactly once because the point row keeps
    one salt while the interval replicates."""
    import random
    rng = random.Random(5)
    # one hot bucket (all points in [0, 1800)) + background
    points = [(i, float(rng.randrange(0, 1800)) + rng.random()) for i in range(400)]
    points += [(1000 + i, 40000.0 + i * 10) for i in range(50)]
    ivs = [(j, float(j * 100), float(j * 100 + 500)) for j in range(30)]
    p = spark.createDataFrame(points, "pid long, ts double")
    iv = spark.createDataFrame(ivs, "iid long, start double, end double")
    base = sorted((r["pid"], r["iid"]) for r in
                  interval_join(p, iv, bucket_seconds=1800.0).collect())
    salted = sorted((r["pid"], r["iid"]) for r in
                    interval_join(p, iv, bucket_seconds=1800.0,
                                  salt_buckets=8, salt_threshold=100).collect())
    assert base == salted and len(base) > 0


def test_distance_join_salting_invariant(spark):
    import random

    from pandarus_spark.operators.distance import distance_join
    rng = random.Random(9)
    # dense cluster (hot cell) + scattered background
    left = [(i, 2.0 + rng.random() * 0.01, 48.0 + rng.random() * 0.01)
            for i in range(300)]
    right = [(i, 2.0 + rng.random() * 0.02, 48.0 + rng.random() * 0.02)
             for i in range(120)]
    l = spark.createDataFrame(left, "lid long, lon double, lat double")
    r = spark.createDataFrame(right, "rid long, lon double, lat double")
    base = sorted((x["lid"], x["rid"], x["dist_m"]) for x in
                  distance_join(l, r, radius_m=2000.0).collect())
    salted = sorted((x["lid"], x["rid"], x["dist_m"]) for x in
                    distance_join(l, r, radius_m=2000.0, salt_buckets=8,
                                  salt_threshold=50).collect())
    assert base == salted and len(base) > 0


def test_simhash_neardup_matches_bruteforce(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta token{i % 3} epsilon zeta") for i in range(24)],
        "doc_id long, text string")
    hashes = {r["doc_id"]: r["simhash"] for r in D.simhash(docs).collect()}
    brute = {(a, b): bin(hashes[a] ^ hashes[b]).count("1")
             for a in hashes for b in hashes if a < b
             if bin(hashes[a] ^ hashes[b]).count("1") <= 3}
    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in D.simhash_neardup_pairs(docs, max_hamming=3, bands=4).collect()}
    assert got == brute  # recall exact by pigeonhole (max_hamming < bands)
    assert brute  # fixture actually produces near-dups (same token{i%3} classes)


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


def test_asof_join_semantics(spark):
    # mirrors the DuckDB ASOF LEFT JOIN reference case: greatest right
    # ts <= left ts per key, equal ts matches, unmatched keeps NULL
    left = spark.createDataFrame(
        [(1, 10.0, "a"), (1, 5.0, "b"), (1, 2.0, "c"), (2, 7.0, "d")],
        "k long, ts double, lid string")
    right = spark.createDataFrame(
        [(1, 5.0, 100.0), (1, 9.0, 200.0), (3, 1.0, 300.0)],
        "k long, ts double, v double")
    got = {r["lid"]: r["v"] for r in
           asof_join(left, right, key_col="k", ts_col="ts").collect()}
    assert got == {"a": 200.0, "b": 100.0, "c": None, "d": None}


def test_asof_join_multiple_payload_columns_and_collision(spark):
    import pytest
    left = spark.createDataFrame([(1, 3.0)], "k long, ts double")
    right = spark.createDataFrame([(1, 1.0, 10.0, "x")],
                                  "k long, ts double, v double, tag string")
    row = asof_join(left, right, key_col="k", ts_col="ts").first()
    assert (row["v"], row["tag"]) == (10.0, "x")
    clash = spark.createDataFrame([(1, 1.0, 5.0)], "k long, ts double, k2 double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left.withColumn("k2", F.lit(0.0)), clash,
                  key_col="k", ts_col="ts")


def test_asof_join_matches_bruteforce(spark):
    import random
    rng = random.Random(7)
    left = spark.createDataFrame(
        [(rng.randrange(5), float(rng.randrange(100)), i) for i in range(200)],
        "k long, ts double, lid long")
    rrows = sorted({(rng.randrange(5), float(rng.randrange(100)))
                    for _ in range(120)})
    right = spark.createDataFrame(
        [(k, t, k * 1000 + t) for k, t in rrows], "k long, ts double, v double")
    got = {r["lid"]: r["v"] for r in
           asof_join(left, right, key_col="k", ts_col="ts").collect()}
    by_key = {}
    for k, t in rrows:
        by_key.setdefault(k, []).append(t)
    for k, ts, lid in [tuple(r) for r in left.collect()]:
        cand = [t for t in by_key.get(k, []) if t <= ts]
        expected = (k * 1000 + max(cand)) if cand else None
        assert got[lid] == expected, (k, ts, lid)


def test_asof_join_single_shuffle_plan(spark):
    left = spark.createDataFrame([(1, 1.0, 1)], "k long, ts double, lid long")
    right = spark.createDataFrame([(1, 1.0, 2.0)], "k long, ts double, v double")
    plan = asof_join(left, right, key_col="k", ts_col="ts") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan  # no join operator at all


# ---------------------------------------------------------------------------
# interval join
# ---------------------------------------------------------------------------


def test_interval_join_matches_bruteforce(spark):
    import random
    rng = random.Random(11)
    pts = [(i, float(rng.randrange(0, 10000))) for i in range(300)]
    ivs = []
    for j in range(80):
        s = float(rng.randrange(0, 10000))
        ivs.append((j, s, s + float(rng.randrange(0, 2000))))
    points = spark.createDataFrame(pts, "pid long, ts double")
    intervals = spark.createDataFrame(ivs, "iid long, start double, end double")
    for bucket in (100.0, 1000.0, 7.0):
        got = {(r["pid"], r["iid"]) for r in
               interval_join(points, intervals, bucket_seconds=bucket).collect()}
        expected = {(p, i) for p, t in pts for i, s, e in ivs if s <= t < e}
        assert got == expected, bucket


def test_interval_join_boundaries(spark):
    points = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 19.999999)], "pid long, ts double")
    intervals = spark.createDataFrame(
        [(1, 10.0, 20.0), (2, 15.0, 15.0)], "iid long, start double, end double")
    got = {(r["pid"], r["iid"]) for r in
           interval_join(points, intervals, bucket_seconds=10.0).collect()}
    # start inclusive, end exclusive, empty interval matches nothing
    assert got == {(1, 1), (3, 1)}


def test_interval_join_rejects_bad_bucket(spark):
    import pytest
    df = spark.createDataFrame([(1, 1.0)], "pid long, ts double")
    iv = spark.createDataFrame([(1, 0.0, 2.0)], "iid long, start double, end double")
    with pytest.raises(ValueError):
        interval_join(df, iv, bucket_seconds=0.0)


def test_asof_join_null_payload_not_resurrected(spark):
    # DuckDB ASOF semantics: the MATCHED row's values, including its
    # NULLs — a NULL payload must not resurrect an older row's value,
    # and multi-column payloads must never stitch fields from
    # different right rows (regression: per-column carry-forward did both)
    left = spark.createDataFrame([(1, 6.0)], "k long, ts double")
    right = spark.createDataFrame(
        [(1, 1.0, 10.0, "old"), (1, 5.0, None, None)],
        "k long, ts double, v double, tag string")
    row = asof_join(left, right, key_col="k", ts_col="ts").first()
    assert (row["v"], row["tag"]) == (None, None)


def test_interval_join_numeric_exactness(spark):
    # numeric columns must be used exactly — the old blanket
    # double->timestamp->double cast quantized to microseconds and
    # flipped boundary membership for sub-microsecond values
    points = spark.createDataFrame([(1, 9.9999995)], "pid long, ts double")
    intervals = spark.createDataFrame([(1, 9.9999999, 20.0)],
                                      "iid long, start double, end double")
    assert interval_join(points, intervals, bucket_seconds=10.0).count() == 0
    # and a genuinely-contained sub-microsecond point still matches
    points2 = spark.createDataFrame([(1, 10.0000001)], "pid long, ts double")
    assert interval_join(points2, intervals, bucket_seconds=10.0).count() == 1


def test_interval_join_timestamp_columns(spark):
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    points = spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=5)), (2, t0 + dt.timedelta(minutes=90))],
        "pid long, ts timestamp")
    intervals = spark.createDataFrame(
        [(1, t0, t0 + dt.timedelta(hours=1))], "iid long, start timestamp, end timestamp")
    got = {r["pid"] for r in
           interval_join(points, intervals, bucket_seconds=600.0).collect()}
    assert got == {1}


def test_interval_join_rejects_column_collisions(spark):
    import pytest
    points = spark.createDataFrame([(1, 1.0, 2.0)], "pid long, ts double, start double")
    intervals = spark.createDataFrame([(1, 0.0, 2.0)], "iid long, start double, end double")
    with pytest.raises(ValueError, match="collide"):
        interval_join(points, intervals)


def test_chunk_tokens_rejects_gapping_stride(spark):
    import pytest
    from pandarus_spark.operators import curation as C
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="stride"):
        C.chunk_tokens(df, size=4, stride=6)


def test_asof_join_matches_duckdb_asof_randomized(spark):
    # cross-engine differential: DuckDB's native ASOF LEFT JOIN is the
    # independent semantics oracle (the driver gate runs it on real
    # events; this fuzzes edge structure — sparse keys, equal ts,
    # NULL-value right rows, unmatched keys)
    import random

    import duckdb
    rng = random.Random(42)
    lrows = [(rng.randrange(8), float(rng.randrange(50)), i) for i in range(250)]
    rseen = set()
    rrows = []
    for j in range(150):
        k, t = rng.randrange(10), float(rng.randrange(50))
        if (k, t) in rseen:     # right unique per (key, ts) contract
            continue
        rseen.add((k, t))
        rrows.append((k, t, None if j % 11 == 0 else k * 100.0 + t))
    left = spark.createDataFrame(lrows, "k long, ts double, lid long")
    right = spark.createDataFrame(rrows, "k long, ts double, v double")
    got = {r["lid"]: r["v"] for r in
           asof_join(left, right, key_col="k", ts_col="ts").collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE l(k BIGINT, ts DOUBLE, lid BIGINT)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", lrows)
    con.execute("CREATE TABLE r(k BIGINT, ts DOUBLE, v DOUBLE)")
    con.executemany("INSERT INTO r VALUES (?,?,?)", rrows)
    want = {lid: v for lid, v in con.execute(
        "SELECT l.lid, r.v FROM l ASOF LEFT JOIN r "
        "ON l.k = r.k AND l.ts >= r.ts").fetchall()}
    assert got == want and len(got) == 250


def test_session_numeric_ts_submicrosecond_exact(spark):
    """Numeric epoch ts columns pass through EXACTLY (r4 advice): a gap
    a fraction of a microsecond above/below gap_seconds must break /
    not break the session — the old blanket timestamp round-trip
    quantized to microseconds and flipped the decision."""
    from pandarus_spark.operators.windows import session_rows, sessionize
    rows = [
        (1, 0.0, 10), (1, 1800.0000004, 11),   # gap > 1800 -> break
        (2, 0.0, 20), (2, 1799.9999996, 21),   # gap < 1800 -> no break
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts double, event_id long")
    ns = {r["user_id"]: r["n_sessions"] for r in
          sessionize(ev, gap_seconds=1800.0).collect()}
    assert ns == {1: 2, 2: 1}
    sr = {}
    for r in session_rows(ev, gap_seconds=1800.0).collect():
        sr.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(sr[1]) == [1, 1] and sr[2] == [2]


def test_sessionize_string_ts_parses_not_nulls(spark):
    """ISO-8601 string ts columns must go through the timestamp parse:
    a direct double cast NULLs every row and silently makes every
    event its own session (round-5 review regression)."""
    from pandarus_spark.operators.windows import session_rows
    ev = _events(spark).withColumn(
        "ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
    out = {r["user_id"]: (r["n_events"], r["n_sessions"])
           for r in sessionize(ev, gap_seconds=1800.0).collect()}
    assert out == {1: (3, 2), 2: (3, 1)}
    assert session_rows(ev, gap_seconds=1800.0).count() == 3
