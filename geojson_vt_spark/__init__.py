"""Public API — mirrors the reference's export surface (src/index.ts:10-16:
GeoJSONVT, Supercluster, geoJSONToTile, clip constants) so a reference user
can switch imports 1:1, plus the option dataclasses Spark users configure.

Heavy submodules (analytics, training, streaming) are imported explicitly by
path; this module stays import-light so `from geojson_vt_spark import ...`
never drags pandas/numpy kernels into a driver that only serves tiles.
"""

from .config import ClusterOptions, Options
from .functions.tile import GEOJSONVT_CLIP_END, GEOJSONVT_CLIP_START
from .operators.engine import GeoJSONVTSpark
from .operators.geojson_to_tile import geojson_to_tile
from .cluster.index import ClusterTileIndexSpark

# reference naming alias (index.ts exports ClusterTileIndex as Supercluster)
SuperclusterSpark = ClusterTileIndexSpark

__all__ = [
    "GeoJSONVTSpark",
    "ClusterTileIndexSpark",
    "SuperclusterSpark",
    "geojson_to_tile",
    "GEOJSONVT_CLIP_START",
    "GEOJSONVT_CLIP_END",
    "Options",
    "ClusterOptions",
]
