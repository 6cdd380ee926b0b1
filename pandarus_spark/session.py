"""SparkSession helpers with the engine's recommended configuration.

No module-level SparkSession (spark-submit --py-files friendly)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(app: str = "pandarus-spark", master: str | None = None,
                  shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"
    ncpu = int(cpus if str(cpus).isdigit() else 32)
    # default one wave per shuffle (best latency for small/medium jobs);
    # long straggler-prone jobs can ask for more waves via the env knob
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", ncpu))
    cluster = master.startswith("spark://")
    # local[N] runs executors inside the driver JVM; the 1g default heap
    # OOMs real workloads — size it from the env (128 GiB box here).
    # Against a standalone cluster the executors hold the data instead.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g" if cluster else "48g")
    builder = (
        SparkSession.builder.master(master).appName(app)
        .config("spark.driver.memory", driver_mem)
        .config("spark.driver.maxResultSize", "4g"))
    if cluster:
        builder = (builder
                   # AQE's size-based coalescing targets 64MB reduce
                   # partitions — sized for JVM-only stages.  The
                   # engine's refine stages run Arrow/pandas kernels
                   # whose per-byte cost is several times higher, and
                   # on a real cluster the overlay's 646MB candidate
                   # shuffle coalesced to 12 tasks: 1.5 ragged waves on
                   # 8 cores, intersect phase 54.3 s.  16MB advisory →
                   # ~40 tasks → 20.4 s (measured, BASELINE.md round-5
                   # standalone sweep; whole job 77.7 → 42.6 s).  Local
                   # mode keeps the stock advisory: its feature tables
                   # broadcast (1g threshold), so the refine stays
                   # map-side at scan width and never hits this.
                   .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                           os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION",
                                          "16m"))
                   .config("spark.executor.cores",
                           os.environ.get("SPARK_GRAFT_EXECUTOR_CORES", "2"))
                   .config("spark.executor.memory",
                           os.environ.get("SPARK_GRAFT_EXECUTOR_MEM", "10g"))
                   # total cores cap -> executor count = cores.max / executor.cores
                   .config("spark.cores.max", str(ncpu))
                   .config("spark.executorEnv.PYTHONPATH",
                           os.environ.get("SPARK_GRAFT_PYTHONPATH", os.getcwd())))
    return (
        builder
        # dim-sized tables (feature covers, label maps) should broadcast:
        # the 10MB default forces sort-merge exchanges for tables that fit
        # executor memory easily.  In local mode a broadcast is an
        # in-process reference (no copy at all), so the threshold can be
        # GENEROUS — 1g keeps multi-million-row cached feature tables on
        # the broadcast plan the round-1 bench measured (3.2M/side ≈
        # 480 MB: broadcast 77 s vs shuffled 132 s under identical load).
        # On a real cluster each executor pays a network copy, so 64m.
        .config("spark.sql.autoBroadcastJoinThreshold",
                os.environ.get("SPARK_GRAFT_BROADCAST_THRESHOLD",
                               "64m" if cluster else "1g"))
        # prefer shuffled-HASH joins over sort-merge when the planner's
        # per-partition build-side bound allows: the overlay's geometry
        # join-backs past the broadcast threshold then skip sorting the
        # multi-10M-row candidate stream twice (measured 83 s → 62 s on
        # the 3.2M-pages-per-side overlay, identical rows). AQE still
        # re-plans and splits skewed partitions either way.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # AQE: runtime re-plan, skew-join splitting, partition coalescing
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # big text shuffles (83M exploded token rows at 3.2M docs on 8
        # cores) SPILL when the one-wave partition count is also the
        # sort width: measured 103.9 s -> 34.6 s (postings) and 271.5 s
        # -> 77.4 s (span removal) just by widening to 8 waves.  Let
        # AQE own the tradeoff instead of the static knob: shuffles
        # START at 8 waves and coalesce back toward one wave when
        # partitions are small (parallelismFirst keeps reduce-side
        # parallelism >= default parallelism for medium jobs, so the
        # headline suite is unchanged — pinned-8 A/B in BASELINE.md)
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
                os.environ.get("SPARK_GRAFT_INITIAL_PARTITIONS",
                               str(shuffle_partitions * 8)))
        # one time basis everywhere: Arrow renders timestamps as naive
        # wall times in this zone, and the stateful streaming operators
        # convert them back to epoch through it — UTC makes that exact
        # and keeps outputs byte-stable across differently-zoned hosts
        .config("spark.sql.session.timeZone",
                os.environ.get("SPARK_GRAFT_TIMEZONE", "UTC"))
        # Arrow for every pandas UDF exchange
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .getOrCreate()
    )
