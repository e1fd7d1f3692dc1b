"""GeoJSONVTSpark — the user-facing engine facade.

API parity with the reference GeoJSONVT class (/root/reference/src/geojsonvt.ts):
construct from GeoJSON (or a documents DataFrame), get_tile(z, x, y) with lazy
drill-down, all_tiles() for pyramid-wide export (the genTiles shape used by the
reference golden tests, /root/reference/test/full.test.ts:52-72).
"""

from __future__ import annotations

import json
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..cluster.index import ClusterTileIndexSpark
from ..config import Options
from ..functions.convert import convert_geojson
from ..functions.wrap import wrap_features
from ..model import FEATURE_SCHEMA, feature_to_row, tile_feature_from_row
from ..plans.pyramid import PyramidStore, build_pyramid


def geojson_to_feature_rows(data: dict, options: Options) -> list:
    """Driver-side convert (O1-O6) + wrap (O7) for in-memory GeoJSON inputs.
    Large corpora go through sources/documents.py which runs the same kernels
    inside mapInPandas."""
    feats = convert_geojson(data, options)
    wrapped = wrap_features(feats, options)
    rows = []
    for fid, (wcopy, f) in enumerate(wrapped):
        row = feature_to_row(f, 0, 0, 0, [wcopy, fid])
        # createDataFrame verification rejects numpy arrays; mapInPandas doesn't
        rows.append(
            {k: (v.tolist() if hasattr(v, "tolist") else v) for k, v in row.items()}
        )
    return rows


class GeoJSONVTSpark:
    def __init__(
        self,
        spark: SparkSession,
        data: Optional[dict] = None,
        options: Optional[Options] = None,
        features_df: Optional[DataFrame] = None,
        workdir: Optional[str] = None,
        resume: bool = False,
    ):
        self.spark = spark
        self.options = (options or Options()).validate()
        self.workdir = workdir

        if features_df is None:
            if data is None:
                raise ValueError("provide GeoJSON data or a features_df")
            rows = geojson_to_feature_rows(data, self.options)
            features_df = spark.createDataFrame(rows, FEATURE_SCHEMA) if rows else None

        if features_df is not None and features_df.isEmpty():
            features_df = None

        self.cluster_index: Optional[ClusterTileIndexSpark] = None
        if self.options.cluster:
            # cluster mode (geojsonvt.ts:64-68): ClusterTileIndex over the
            # wrapped point features instead of the tile pyramid
            self.store = PyramidStore(spark, self.options, workdir)
            self.cluster_index = ClusterTileIndexSpark(
                spark, self.options.cluster_options
            )
            if features_df is not None:
                self.cluster_index.initialize_df(features_df)
            return

        self.store: PyramidStore
        if features_df is None:
            # empty input -> empty index (geojsonvt.ts:64-67 skips initialize)
            self.store = PyramidStore(spark, self.options, workdir)
        else:
            self.store = build_pyramid(
                features_df, self.options, workdir=workdir, resume=resume
            )

    # -- queries ------------------------------------------------------------

    def registry(self) -> DataFrame:
        return self.store.registry_df()

    def tiles(self) -> DataFrame:
        return self.store.tiles_df()

    def all_tiles(self) -> dict:
        """Collect the whole pyramid keyed 'z{z}-{x}-{y}' -> [tile features]
        (the reference genTiles shape). One Spark job."""
        rows = self.tiles().collect()
        reg = self.registry().select("z", "x", "y").collect()
        out: dict = {}
        for r in reg:
            out[f"z{r.z}-{r.x}-{r.y}"] = []
        buckets: dict = {}
        for r in rows:
            buckets.setdefault((r.z, r.x, r.y), []).append(r)
        for (z, x, y), rs in buckets.items():
            rs.sort(key=lambda r: tuple(r.okey))
            out[f"z{z}-{x}-{y}"] = [tile_feature_from_row(r.asDict()) for r in rs]
        return out

    def get_tile(self, z, x, y) -> Optional[list]:
        """Point lookup with lazy drill-down (tile-index.ts:82-120)."""
        z, x, y = int(z), int(x), int(y)
        if z < 0 or z > 24:  # geojsonvt.ts:82
            return None
        if self.cluster_index is not None:
            return self.cluster_index.get_tile(z, x, y)
        z2 = 1 << z
        x = (x + z2) & (z2 - 1)  # wrap x

        tf = self._fetch(z, x, y)
        if tf is not None:
            return tf

        # walk up to the nearest ancestor that retained source features
        reg = {(r.z, r.x, r.y): r.has_source for r in self.registry().collect()}
        z0, x0, y0 = z, x, y
        found = None
        while z0 > 0:
            z0 -= 1
            x0 >>= 1
            y0 >>= 1
            if (z0, x0, y0) in reg:
                found = (z0, x0, y0)
                break
        if found is None or not reg[found]:
            return None

        src = self.store.sources_df().filter(
            (F.col("z") == found[0]) & (F.col("x") == found[1]) & (F.col("y") == found[2])
        )
        if src.isEmpty():
            return None
        build_pyramid(
            src,
            self.options,
            store=self.store,
            workdir=None,
            start=found,
            target=(z, x, y),
        )
        return self._fetch(z, x, y)

    # -- cluster surfaces (geojsonvt.ts:160-183) ----------------------------

    def get_clusters(self, bbox, zoom):
        return self.cluster_index.get_clusters(bbox, zoom)

    def get_cluster_expansion_zoom(self, cluster_id):
        if self.cluster_index is None:
            return None
        return self.cluster_index.get_cluster_expansion_zoom(cluster_id)

    def get_cluster_children(self, cluster_id):
        if self.cluster_index is None:
            return None
        return self.cluster_index.get_children(cluster_id)

    def get_cluster_leaves(self, cluster_id, limit=10, offset=0):
        if self.cluster_index is None:
            return None
        return self.cluster_index.get_leaves(cluster_id, limit, offset)

    def _fetch(self, z: int, x: int, y: int) -> Optional[list]:
        reg = (
            self.registry()
            .filter((F.col("z") == z) & (F.col("x") == x) & (F.col("y") == y))
            .count()
        )
        if not reg:
            return None
        rows = (
            self.tiles()
            .filter((F.col("z") == z) & (F.col("x") == x) & (F.col("y") == y))
            .collect()
        )
        rows.sort(key=lambda r: tuple(r.okey))
        return [tile_feature_from_row(r.asDict()) for r in rows]
