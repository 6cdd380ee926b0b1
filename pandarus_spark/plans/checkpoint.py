"""Per-partition checkpoint/resume + lineage metrics (north_rule).

The reference caches whole outputs under content-addressed names
(sha256-based, core.py:140; convert_to_vector returns early when the
output exists, core.py:566-568).  The distributed analogue: process an
input table one *partition* at a time, write an idempotent marker —
keyed by (dataset_id, partition) — containing lineage metrics
(row count, sum(measure), input row count) after each partition
commits, and skip marked partitions on restart.

The marker store is a plain directory of JSON files so it works on any
shared filesystem; on a real cluster the same ledger shape lives in an
Iceberg metadata table keyed by (snapshot_id, partition).
"""

from __future__ import annotations

import json
import os
import tempfile


class CheckpointLedger:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _marker(self, dataset_id: str, partition: str) -> str:
        safe = partition.replace("/", "_").replace("=", "-")
        d = os.path.join(self.path, dataset_id)
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"{safe}.json")

    def done(self, dataset_id: str, partition: str) -> bool:
        return os.path.exists(self._marker(dataset_id, partition))

    def mark(self, dataset_id: str, partition: str, metrics: dict) -> None:
        """Atomic write (tmp + rename) so a crash mid-write never leaves
        a partial marker that would be mistaken for a completed one."""
        marker = self._marker(dataset_id, partition)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(marker))
        with os.fdopen(fd, "w") as f:
            json.dump({"dataset": dataset_id, "partition": partition, "metrics": metrics}, f)
        os.replace(tmp, marker)

    def metrics(self, dataset_id: str, partition: str) -> dict | None:
        marker = self._marker(dataset_id, partition)
        if not os.path.exists(marker):
            return None
        with open(marker) as f:
            return json.load(f)["metrics"]

    def pending(self, dataset_id: str, partitions: list[str]) -> list[str]:
        return [p for p in partitions if not self.done(dataset_id, p)]


def run_partitioned(ledger: CheckpointLedger, dataset_id: str, partitions: list[str],
                    run_one, out_collector: dict | None = None) -> dict:
    """Drive ``run_one(partition) -> metrics_dict`` over the partition
    list, skipping completed ones. Returns {partition: metrics} for the
    full list (resumed partitions read back from the ledger)."""
    results = {}
    for part in partitions:
        if ledger.done(dataset_id, part):
            results[part] = ledger.metrics(dataset_id, part)
            continue
        metrics = run_one(part)
        ledger.mark(dataset_id, part, metrics)
        results[part] = metrics
        if out_collector is not None:
            out_collector[part] = metrics
    return results


def intersect_partitioned(spark, pages, features2, ledger: CheckpointLedger,
                          dataset_id: str, partition_col: str = "lang",
                          out_dir: str | None = None, **intersect_kwargs) -> dict:
    """Checkpoint-resumable overlay join: one unit of work per distinct
    value of ``partition_col`` in the pages table. Each completed unit
    writes its output parquet (when ``out_dir``) and a lineage marker
    with row-count + measure-sum metrics."""
    from pyspark.sql import functions as F

    from ..operators.intersect import intersect
    from ..sources.pages import extract_features

    parts = [r[0] for r in pages.select(partition_col).distinct().collect()]

    def run_one(part):
        subset = pages.filter(F.col(partition_col) == part)
        feats = extract_features(subset, validate_unique=False)
        out = intersect(feats, features2, **intersect_kwargs)
        if out_dir:
            # Collect the lineage metrics DURING the write pass via an
            # Observation instead of a second agg job: the overlay's
            # Arrow-refine stage is the expensive part of the plan, and
            # a separate .agg() recomputes it end to end (measured 2x
            # the whole job at 800k pages/side on a standalone cluster,
            # BASELINE.md round-5 sweep).
            from pyspark.sql import Observation
            obs = Observation(f"lineage_{part}")
            out.observe(obs, F.count(F.lit(1)).alias("rows"),
                        F.sum("measure").alias("sum_measure")) \
               .drop("geom_wkb").write.mode("overwrite").parquet(
                os.path.join(out_dir, f"{partition_col}={part}"))
            agg = obs.get
        else:
            agg = out.agg(F.count("*").alias("rows"),
                          F.sum("measure").alias("sum_measure")).collect()[0]
        return {"rows": int(agg["rows"]),
                "sum_measure": float(agg["sum_measure"]) if agg["sum_measure"] is not None else 0.0,
                "input_rows": subset.count()}

    return run_partitioned(ledger, dataset_id, sorted(str(p) for p in parts),
                           lambda p: run_one(p))


def lineage_metrics(df, partition_expr, measure_col: str = "measure_m2",
                    target_col: str | None = "from_label"):
    """One-pass distributed lineage-metrics table: per partition, the
    row count, the measure sum, and the distinct-target count — the
    same numbers `intersect_partitioned` writes into its per-partition
    markers, computed for EVERY partition in a single grouped
    aggregation instead of one job per partition (the audit/monitoring
    read path of the ledger; north_rule "per-partition lineage +
    row-count/area-sum metrics").

    ``measure_col`` must be integer (round the overlay measure first):
    int64 sums are exact and order-free, so the metrics are identical
    under any partitioning/executor count — a resumed or re-sharded
    run reproduces them bit-for-bit.
    """
    from pyspark.sql import functions as F

    aggs = [F.count("*").alias("n_rows"),
            F.sum(measure_col).alias("area_sum_m2")]
    if target_col is not None:
        aggs.append(F.countDistinct(target_col).alias("n_targets"))
    return df.groupBy(partition_expr.alias("partition_id")).agg(*aggs)
