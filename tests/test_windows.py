"""Event-time windowing + sessionization (operators/windows.py) and
simhash near-dup banding (operators/dedup.py)."""

import datetime as dt

from pyspark.sql import functions as F

from pandarus_spark.operators import dedup as D
from pandarus_spark.operators.windows import hourly_rollup, sessionize

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


def test_hourly_rollup(spark):
    out = {(r["window_start"].minute == 0 and r["window_start"].hour, r["event_type"]):
           (r["n_events"], r["sum_value"])
           for r in hourly_rollup(_events(spark)).collect()}
    # hour 0: events 1,2,3 (user1) + 4 (user2); hour 1: events 5,6
    assert out[(0, "view")] == (3, 8.0)
    assert out[(0, "click")] == (1, 2.0)
    assert out[(1, "view")] == (2, 11.0)


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
