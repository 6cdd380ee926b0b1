"""SparkSession helpers with the engine's recommended configuration.

No module-level SparkSession (spark-submit --py-files friendly)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(app: str = "pandarus-spark", master: str | None = None,
                  shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    ncpu = int(cpus if str(cpus).isdigit() else 32)
    # default one wave per shuffle (best latency for small/medium jobs);
    # long straggler-prone jobs can ask for more waves via the env knob
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", ncpu))
    # local[N] runs executors inside the driver JVM; the 1g default heap
    # OOMs real workloads — size it from the env (128 GiB box here)
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
    return (
        SparkSession.builder.master(master).appName(app)
        .config("spark.driver.memory", driver_mem)
        .config("spark.driver.maxResultSize", "4g")
        # dim-sized tables (feature covers, label maps) should broadcast:
        # the 10MB default forces sort-merge exchanges for tables that fit
        # executor memory easily; truly big sides still fall back to SMJ
        .config("spark.sql.autoBroadcastJoinThreshold", "256m")
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
