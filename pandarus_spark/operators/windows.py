"""Event-time windowing + sessionization (graft additions).

The reference has no window functions, sorts, or event-time semantics
(SURVEY.md §2.3); a web-scale ingest pipeline needs both.  Everything
here is pure Catalyst (built-in window/agg expressions — whole-stage
codegen, one shuffle each) and reproducible in ANSI SQL for the DuckDB
oracle.

* :func:`hourly_rollup` — tumbling event-time windows via ``F.window``
  (the batch twin of streaming/stream.py's windowed cell counts; epoch-
  aligned 1-hour tumbling windows coincide with ``date_trunc('hour')``).
* :func:`sessionize` — gap-based sessions per key with ``lag`` over an
  ordered window; the batch twin of ``session_window`` in Structured
  Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def hourly_rollup(events: DataFrame, ts_col: str = "ts",
                  key_col: str = "event_type", value_col: str = "value",
                  window: str = "1 hour") -> DataFrame:
    """(window_start, key, n_events, sum_value) per tumbling window."""
    return (events
            .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum(value_col), 6).alias("sum_value"))
            .select(F.col("win.start").alias("window_start"), key_col,
                    "n_events", "sum_value"))


def sessionize(events: DataFrame, gap_seconds: float = 1800.0,
               key_col: str = "user_id", ts_col: str = "ts",
               order_col: str = "event_id") -> DataFrame:
    """(key, n_events, n_sessions): a new session starts when the gap to
    the previous event of the same key exceeds ``gap_seconds``.

    The order key breaks timestamp ties deterministically so the result
    is engine-independent (the oracle orders identically)."""
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col(order_col).asc())
    prev = F.lag(F.col(ts_col)).over(w)
    # NTZ can't cast straight to double; via timestamp the (identical)
    # zone shift cancels in the difference
    secs = F.col(ts_col).cast("timestamp").cast("double")
    prev_secs = prev.cast("timestamp").cast("double")
    new_session = F.when(prev.isNull() | ((secs - prev_secs) > gap_seconds),
                         1).otherwise(0)
    return (events
            .select(key_col, new_session.alias("new_session"))
            .groupBy(key_col)
            .agg(F.count("*").alias("n_events"),
                 F.sum("new_session").alias("n_sessions")))
