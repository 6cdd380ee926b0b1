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
