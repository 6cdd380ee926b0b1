"""Vector × vector spatial overlay join (the reference's flagship).

Reference: ``pandarus.intersect`` (core.py:31-187) — for every feature
pair (first × second) that spatially intersects, emit the intersection
geometry (as Multi*) plus its Mollweide measure (m² / m / point count).
The reference runs an R-tree nested loop per multiprocessing worker
(utils/multiprocess.py:47-187); here the same semantics become a
declarative Spark plan:

    features1 ─ cover(cells) ─ explode ─┐
                                        ├─ equi-join on cell ─ pair dedup
    features2 ─ cover(cells) ─ explode ─┘        │
                                                 ▼
                     join back WKBs (broadcast small side)
                                                 ▼
                 mapInPandas refine: exact intersection + measure
                                                 ▼
                        join labels → output rows

Scale design (north_rule):

* candidate generation is a **hash join on cell id** — Catalyst picks
  shuffled-hash/sort-merge/broadcast; AQE rebalances.
* **adaptive resolution**: per-feature cover capped at ``max_cells``
  cells; features forced coarser emit their cover at a coarser level
  and the opposite side emits the ancestor chain so the pair still
  collides (tiling/cells.py:cover_with_parents rationale).
* **hot-cell salting**: cells whose build-side row count exceeds
  ``salt_threshold`` are split across ``salt_buckets`` shuffle keys
  (deterministic hash salt on one side, explode on the other); pair
  dedup afterwards makes salting result-invariant.
* geometry bytes do NOT travel through the cell shuffle — only ids do;
  WKB is joined back after pair dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..geometry import geom as G
from ..tiling import cells as C

PAIR_REFINE_SCHEMA = "from_id bigint, to_id bigint, measure double, geom_wkb binary"

DEFAULT_TARGET_RES = 12
DEFAULT_MAX_CELLS = 64


def cover_features(features: DataFrame, res: int, max_cells: int = DEFAULT_MAX_CELLS,
                   with_parents_to: int | None = None) -> DataFrame:
    """(feature_id, cell) tile-assignment relation for one side.

    Cover at ``res`` (per-feature coarser when the bbox would exceed
    ``max_cells``); optionally also emit the ancestor chain down to
    ``with_parents_to`` so mixed-resolution sides still collide."""

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            ids, cids = [], []
            for fid, mnx, mny, mxx, mxy in zip(pdf["feature_id"], pdf["minx"], pdf["miny"],
                                               pdf["maxx"], pdf["maxy"]):
                r = C.pick_resolution(mnx, mny, mxx, mxy, target_res=res, max_cells=max_cells)
                cover = C.cover_bbox(mnx, mny, mxx, mxy, r)
                if with_parents_to is not None and with_parents_to < r:
                    cover = C.cover_with_parents(mnx, mny, mxx, mxy, r, min_res=with_parents_to)
                ids.extend([fid] * len(cover))
                cids.extend(int(c) for c in cover)
            yield pd.DataFrame({"feature_id": pd.Series(ids, dtype="int64"),
                                "cell": pd.Series(cids, dtype="int64")})

    return features.select("feature_id", "minx", "miny", "maxx", "maxy") \
                   .mapInPandas(gen, schema="feature_id bigint, cell bigint")


def _min_emit_res(features: DataFrame, res: int, max_cells: int) -> int:
    """Coarsest per-feature emission resolution on this side (tiny agg)."""

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            rs = [C.pick_resolution(a, b, c, d, target_res=res, max_cells=max_cells)
                  for a, b, c, d in zip(pdf["minx"], pdf["miny"], pdf["maxx"], pdf["maxy"])]
            yield pd.DataFrame({"r": pd.Series(rs or [res], dtype="int32")})

    row = (features.select("minx", "miny", "maxx", "maxy")
           .mapInPandas(gen, schema="r int").agg(F.min("r").alias("r")).collect())
    return int(row[0]["r"]) if row and row[0]["r"] is not None else res


def candidate_pairs(features1: DataFrame, features2: DataFrame,
                    res: int = DEFAULT_TARGET_RES, max_cells: int = DEFAULT_MAX_CELLS,
                    salt_buckets: int = 0, salt_threshold: int = 50_000) -> DataFrame:
    """Distinct (from_id, to_id) candidate pairs via the cell-key join."""
    lo1 = _min_emit_res(features1, res, max_cells)
    lo2 = _min_emit_res(features2, res, max_cells)
    # each side emits ancestors down to the other side's coarsest level,
    # guaranteeing a shared key for any bbox overlap without emitting the
    # root cell globally (tiling/cells.py docstring).
    c1 = cover_features(features1, res, max_cells, with_parents_to=min(lo2, res)).withColumnRenamed("feature_id", "from_id")
    c2 = cover_features(features2, res, max_cells, with_parents_to=min(lo1, res)).withColumnRenamed("feature_id", "to_id")

    if salt_buckets > 1:
        hot = (c1.groupBy("cell").count().filter(F.col("count") >= salt_threshold)
               .select("cell").withColumn("hot", F.lit(True)))
        c1 = (c1.join(F.broadcast(hot), "cell", "left")
              .withColumn("salt", F.when(F.col("hot").isNotNull(),
                                         F.pmod(F.xxhash64("from_id"), F.lit(salt_buckets)))
                          .otherwise(F.lit(0)))
              .drop("hot"))
        c2 = (c2.join(F.broadcast(hot), "cell", "left")
              .withColumn("salt", F.explode(
                  F.when(F.col("hot").isNotNull(),
                         F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
                  .otherwise(F.array(F.lit(0)))))
              .drop("hot"))
        pairs = c1.join(c2, ["cell", "salt"]).select("from_id", "to_id")
    else:
        pairs = c1.join(c2, "cell").select("from_id", "to_id")
    return pairs.dropDuplicates(["from_id", "to_id"])


def refine_pairs(pairs_with_geoms: DataFrame) -> DataFrame:
    """Exact refine in Arrow batches: decode WKB, clip, Mollweide measure.

    Input columns: from_id, to_id, from_wkb, from_kind, to_wkb.
    Topology errors are skipped per row, like the reference
    (utils/multiprocess.py:102-104)."""

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            out = {"from_id": [], "to_id": [], "measure": [], "geom_wkb": []}
            for fid, tid, fwkb, kind, twkb in zip(pdf["from_id"], pdf["to_id"], pdf["from_wkb"],
                                                  pdf["from_kind"], pdf["to_wkb"]):
                try:
                    fg = G.wkb_loads(bytes(fwkb))
                    tg = G.wkb_loads(bytes(twkb))
                    inter = G.intersection(fg, kind, tg)
                except Exception:
                    continue  # reference skips TopologicalError rows
                if inter is None:
                    continue
                m = G.measure(inter, kind)
                if m <= 0 and kind != "point":
                    continue
                out["from_id"].append(fid)
                out["to_id"].append(tid)
                out["measure"].append(m)
                out["geom_wkb"].append(G.wkb_dumps(inter))
            yield pd.DataFrame({"from_id": pd.Series(out["from_id"], dtype="int64"),
                                "to_id": pd.Series(out["to_id"], dtype="int64"),
                                "measure": pd.Series(out["measure"], dtype="float64"),
                                "geom_wkb": out["geom_wkb"]})

    return pairs_with_geoms.mapInPandas(gen, schema=PAIR_REFINE_SCHEMA)


def _ensure_persisted(df: DataFrame) -> DataFrame:
    """Persist a feature table that the plan references several times
    (cover, geometry join-back, label join).  Without this, a feature
    side derived from an expensive ingest (pages → extract) would be
    recomputed once per plan occurrence.  MEMORY_AND_DISK: at cluster
    scale the normalized feature table is the thing you'd materialize
    to parquet/Iceberg between ingest and join anyway."""
    from pyspark import StorageLevel
    if df.storageLevel == StorageLevel.NONE:
        df.persist(StorageLevel.MEMORY_AND_DISK)
    return df


def intersect(features1: DataFrame, features2: DataFrame,
              res: int = DEFAULT_TARGET_RES, max_cells: int = DEFAULT_MAX_CELLS,
              salt_buckets: int = 0, salt_threshold: int = 50_000,
              broadcast_features: bool | None = None,
              ids: str = "sorted", refine_partitions: int | None = None) -> DataFrame:
    """The overlay join. Returns
    ``(id, from_label, to_label, measure, geom_wkb)`` matching the
    reference's fixed output schema (core.py:153-161).

    The second side must be polygonal (core.py:51-53) — enforced here
    with a distributed assert, non-overlap stays a documented
    precondition.

    ``ids="sorted"`` reproduces the reference's enumeration-order ids
    via a global window (single-partition sort — fixture/report scale);
    ``ids="fast"`` uses ``monotonically_increasing_id`` (unique, not
    dense/ordered) and keeps the plan fully parallel for big outputs."""
    features1 = _ensure_persisted(features1)
    features2 = _ensure_persisted(features2)
    bad = features2.filter(F.col("kind") != "polygon").limit(1).collect()
    if bad:
        raise ValueError("second dataset must contain only polygons "
                         "(reference core.py:51-53)")

    pairs = candidate_pairs(features1, features2, res, max_cells, salt_buckets, salt_threshold)

    f1 = features1.select(F.col("feature_id").alias("from_id"),
                          F.col("geom_wkb").alias("from_wkb"),
                          F.col("kind").alias("from_kind"),
                          F.col("label").alias("from_label"))
    f2 = features2.select(F.col("feature_id").alias("to_id"),
                          F.col("geom_wkb").alias("to_wkb"),
                          F.col("label").alias("to_label"))
    if broadcast_features is None:
        broadcast_features = True  # fixture/dim-table scale; flip off for big-big
    if broadcast_features:
        f1b, f2b = F.broadcast(f1), F.broadcast(f2)
    else:
        f1b, f2b = f1, f2

    # the refine is CPU-bound Python — partition by task-count, not bytes
    # (AQE would coalesce these tiny-by-bytes partitions onto few cores)
    nparts = refine_partitions or features1.sparkSession.sparkContext.defaultParallelism * 2
    enriched = pairs.join(f1b, "from_id").join(f2b, "to_id").repartition(nparts)
    refined = refine_pairs(enriched)

    labels = (refined
              .join(f1b.select("from_id", "from_label"), "from_id")
              .join(f2b.select("to_id", "to_label"), "to_id"))
    if ids == "fast":
        id_col = F.monotonically_increasing_id().alias("id")
    else:
        id_col = F.row_number().over(_det_window()).cast("long").alias("id")
    return labels.select(id_col, "from_label", "to_label", "measure", "geom_wkb")


def _det_window():
    """Deterministic output ids: reference assigns ids by enumeration
    order (utils/conversion.py:14-28); we order by labels for
    reproducibility across partitionings."""
    from pyspark.sql import Window
    return Window.orderBy("from_label", "to_label")


def intersections_from_intersection(intersections: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Reference core.py:190-269 — re-project the overlay output C=A⋈B
    into the two derived join tables (C,A) and (C,B). Pure column
    projection, no geometry work."""
    fp1 = intersections.select("id", F.col("from_label").alias("label"), "measure")
    fp2 = intersections.select("id", F.col("to_label").alias("label"), "measure")
    return fp1, fp2
