"""Bucketed persistence for co-located cell joins (graft addition).

At 100 TB the overlay's candidate generation is a shuffle join on the
cell key (BASELINE.md: the 3.2M-page run crosses the broadcast
threshold into shuffled-hash joins).  When the SAME feature table
feeds many overlay runs — the common shape for a reference basemap
(country polygons, a land-cover grid) joined against every new crawl —
that shuffle re-partitions the identical data every run.  Spark's
answer is bucketing: persist the cover table hash-partitioned by
``cell`` into N buckets ONCE, and every subsequent equi-join on
``cell`` between bucketed tables (or one bucketed side and one shuffled
side) reads the partitioning from the table metadata instead of
exchanging — ``tests/test_plans.py::test_bucketed_cover_join_no_shuffle``
pins the zero-Exchange plan.

Buckets must be sized for the target cluster: N should be a multiple
of the executor-core count at read time, and each bucket should land
in the 100-200 MB range after compression (so ``n_buckets ≈
table_bytes / 128 MB``).  Too few buckets caps read parallelism; too
many makes small files.

Spark requires ``saveAsTable`` (catalog metadata carries the bucket
spec — plain ``.parquet(path)`` writes lose it).  The in-memory /
derby-less default catalog works; no Hive metastore needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_col: str = "cell",
                   n_buckets: int = 32, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` hash-bucketed by ``bucket_col`` into the session
    catalog as ``table``.  ``sort=True`` additionally sorts within each
    bucket file — the sorted runs make the downstream shuffled-hash /
    sort-merge join's build side cheaper and enable min-max row-group
    skipping on the bucket column."""
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; the catalog restores the bucket spec
    so joins on the bucket column skip their Exchange."""
    return spark.table(table)


def write_bucketed_covers(covers: DataFrame, table: str,
                          n_buckets: int = 32) -> None:
    """Persist a ``cover_features`` output (feature_id, cell, ...) for
    repeated cell joins — the reference-basemap pattern above."""
    write_bucketed(covers, table, bucket_col="cell", n_buckets=n_buckets)
