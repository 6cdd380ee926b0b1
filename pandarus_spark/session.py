"""SparkSession helpers with the engine's recommended configuration.

No module-level SparkSession (spark-submit --py-files friendly)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(app: str = "pandarus-spark", master: str | None = None,
                  shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus if str(cpus).isdigit() else 32)
    return (
        SparkSession.builder.master(master).appName(app)
        # AQE: runtime re-plan, skew-join splitting, partition coalescing
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for every pandas UDF exchange
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .getOrCreate()
    )
