"""pandarus_spark — a from-scratch PySpark-native spatial-join + tiling
engine with the query capabilities of cmutel/pandarus (reference at
/root/reference, BSD), re-architected for Spark's execution model:
cell-index hash joins for candidate generation, Arrow-batched pandas
UDFs for exact geometric refinement, Catalyst/AQE for physical planning.

Public API mirrors the reference's (pandarus/__init__.py:2-12):

* :func:`intersect` — vector×vector overlay join with Mollweide measures
* :func:`intersections_from_intersection` — derived join tables
* :func:`calculate_remaining` — measure outside all intersections
* :func:`raster_statistics` — zonal min/max/mean/count (both engines)
* :func:`convert_to_vector` — raster polygonization
* :func:`clean_raster` / :func:`round_raster` — raster normalization

plus graft additions: kNN nearest-feature matching, dedup suite
(exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding similarity
search, text analysis, multimodal column plumbing.
"""

from .operators.intersect import (
    intersect,
    intersections_from_intersection,
    candidate_pairs,
    cover_features,
)
from .operators.remaining import calculate_remaining
from .operators.raster_stats import raster_statistics
from .operators.raster_transform import clean_raster, round_raster, convert_to_vector
from .operators.knn import knn_nearest_feature
from .operators.interp import areal_interpolate
from .plans.checkpoint import lineage_metrics
from .sources.bucketed import read_bucketed, write_bucketed, write_bucketed_covers
from .sources.geojson import intersect_files, read_geojson, read_vector, write_geojson
from .sources.gpkg import read_gpkg, write_gpkg
from .sources.gtiff import write_gtiff, write_gtiff_cells
from .sources.shapefile import read_shapefile
from .geometry.projection import project_geom

__all__ = [
    "intersect", "intersections_from_intersection", "candidate_pairs",
    "cover_features", "calculate_remaining", "raster_statistics",
    "clean_raster", "round_raster", "convert_to_vector",
    "knn_nearest_feature", "intersect_files", "read_geojson", "read_vector",
    "write_geojson", "read_gpkg", "write_gpkg", "read_shapefile",
    "write_gtiff", "write_gtiff_cells", "project_geom",
    "read_bucketed", "write_bucketed", "write_bucketed_covers",
    "areal_interpolate", "lineage_metrics",
]

__version__ = "0.1.0"
