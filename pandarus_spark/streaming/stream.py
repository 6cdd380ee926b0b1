"""Structured-Streaming ingestion: pages stream → live tile assignments.

The reference has no streaming surface (SURVEY.md §2.3); this is the
graft's incremental-ingest path: a stream of crawled pages is extracted
and tiled as it arrives, so the cell index stays current without
re-running the batch job.  ``mapInPandas`` extraction and the cell
cover work unchanged on streaming DataFrames; stateful aggregation uses
event-time windows + watermark for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TILED_SCHEMA = "feature_id bigint, label string, warc_ts timestamp, cell bigint"


def stream_tile_assignments(pages_stream: DataFrame, res: int = 12,
                            max_cells: int = 64) -> DataFrame:
    """Streaming pages → (feature_id, label, warc_ts, cell), one row per
    covering cell. Stateless (append-mode safe); extraction + tiling in
    one Arrow pass, no shuffle."""

    def gen(batches):
        import pandas as pd

        from ..geometry import geom as G
        from ..sources.pages import _stable_id, extract_text, parse_feature_text
        from ..tiling import cells as C
        for pdf in batches:
            out = {"feature_id": [], "label": [], "warc_ts": [], "cell": []}
            for url, ts, html in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
                label, geometry = parse_feature_text(extract_text(bytes(html)))
                mnx, mny, mxx, mxy = G.bounds(geometry)
                r = C.pick_resolution(mnx, mny, mxx, mxy, target_res=res, max_cells=max_cells)
                fid = _stable_id(url)
                for c in C.cover_bbox(mnx, mny, mxx, mxy, r):
                    out["feature_id"].append(fid)
                    out["label"].append(label if isinstance(label, str) else str(label))
                    out["warc_ts"].append(ts)
                    out["cell"].append(int(c))
            yield pd.DataFrame(out)

    return pages_stream.select("url", "warc_ts", "html").mapInPandas(gen, schema=TILED_SCHEMA)


def stream_exact_dedup(docs_stream: DataFrame, text_col: str = "text",
                       ts_col: str | None = None,
                       watermark: str = "1 hour") -> DataFrame:
    """Streaming exact deduplication — the incremental twin of
    ``dedup.exact_dedup``: only the first-seen document per distinct
    text hash survives.

    With an event-time column, uses ``dropDuplicatesWithinWatermark``
    so the dedup state is bounded: a key's state is dropped once the
    watermark passes it (at 100 TB/day the state store would otherwise
    grow without limit — this is the standard trade: exact dedup inside
    the watermark horizon, pass-through beyond it).  Without ``ts_col``
    the state is unbounded (exact forever) — only for bounded backfills.
    """
    hashed = docs_stream.withColumn("text_md5",
                                    F.md5(F.encode(F.col(text_col), "utf-8")))
    if ts_col is not None:
        return (hashed.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
                .withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(["text_md5"]))
    return hashed.dropDuplicates(["text_md5"])


SESSION_OUT_SCHEMA = ("user_id bigint, session_start timestamp, "
                      "session_end timestamp, n_events bigint")
SESSION_STATE_SCHEMA = "start double, last double, n bigint"


def stream_sessionize(events_stream: DataFrame, gap_seconds: float = 1800.0,
                      key_col: str = "user_id", ts_col: str = "ts",
                      watermark: str = "10 minutes") -> DataFrame:
    """Streaming gap-based sessionization — the custom stateful
    operator the batch :func:`~pandarus_spark.operators.windows.sessionize`
    twins: per-key session state lives in the state store via
    ``applyInPandasWithState`` (Arrow-batched; one state row per live
    key, so state size is O(active users), not O(events)).

    A session CLOSES (and is emitted, append-mode) when a later event
    arrives more than ``gap_seconds`` after its last event, or when the
    event-time timeout fires (watermark passed session_end + gap) — so
    late data inside the watermark still extends the right session.
    Output: (user_id, session_start, session_end, n_events).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap = float(gap_seconds)

    def fn(key, pdfs, state):
        import datetime as _dt

        import pandas as pd

        def emit(rows):
            return pd.DataFrame({
                "user_id": pd.Series([key[0]] * len(rows), dtype="int64"),
                "session_start": [_dt.datetime.fromtimestamp(s, _dt.timezone.utc)
                                  .replace(tzinfo=None) for s, _, _ in rows],
                "session_end": [_dt.datetime.fromtimestamp(e, _dt.timezone.utc)
                                .replace(tzinfo=None) for _, e, _ in rows],
                "n_events": pd.Series([n for _, _, n in rows], dtype="int64"),
            })

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield emit([(start, last, n)])
            return

        epochs = []
        for pdf in pdfs:
            epochs.extend(float(t.timestamp()) for t in pdf[ts_col])
        epochs.sort()
        start = last = None
        n = 0
        if state.exists:
            start, last, n = state.get
        closed = []
        for t in epochs:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = max(last, t), n + 1
        if start is not None:
            state.update((start, last, n))
            state.setTimeoutTimestamp(int((last + gap) * 1000))
        if closed:
            yield emit(closed)

    ev = events_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (ev.withWatermark(ts_col, watermark)
            .groupBy(key_col)
            .applyInPandasWithState(fn, SESSION_OUT_SCHEMA, SESSION_STATE_SCHEMA,
                                    "append", GroupStateTimeout.EventTimeTimeout))


def stream_cell_counts(pages_stream: DataFrame, res: int = 12,
                       window: str = "1 minute", watermark: str = "2 minutes") -> DataFrame:
    """Windowed cell activity with late-data tolerance: count features
    per (cell, event-time window), watermarked on warc_ts. Emits in
    update/append mode depending on the sink."""
    tiled = stream_tile_assignments(pages_stream, res=res)
    return (tiled
            .withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("win"), "cell")
            .agg(F.count("*").alias("n_features"))
            .select(F.col("win.start").alias("window_start"), "cell", "n_features"))
