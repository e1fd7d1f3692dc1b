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
from ..config import ClusterOptions, Options
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

        # updateable source snapshot (geojsonvt.ts:57-59)
        self.source_df: Optional[DataFrame] = None
        self._batch = 3  # okey batch prefix for appended diffs (init uses 0-2)
        if self.options.updateable:
            self.source_df = (
                features_df.localCheckpoint(eager=True)
                if features_df is not None
                else spark.createDataFrame([], FEATURE_SCHEMA)
            )
            features_df = self.source_df if features_df is not None else None

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

    def stats(self) -> dict:
        """Per-zoom created-tile counters, 'z{z}' keys — the reference's
        debug stats object (tile-index.ts:14,56-59,166-169; invalidation
        decrements at :293-294 are reflected because invalidated tiles leave
        the registry). One small aggregate job over the registry."""
        rows = self.registry().groupBy("z").count().collect()
        return {f"z{r.z}": r["count"] for r in sorted(rows, key=lambda r: r.z)}

    @property
    def total(self) -> int:
        """Total registered tiles (tile-index.ts:9 `total` counter)."""
        return self.registry().count()

    def all_tiles(self) -> dict:
        """Collect the whole pyramid keyed 'z{z}-{x}-{y}' -> [tile features]
        (the reference genTiles shape). One Spark job.

        TEST SURFACE, NOT SERVING: this materializes every tile on the
        driver — reference-parity and fixture comparisons only. Serving
        reads go through DiskTileServer.get_tile/get_tiles
        (sources/tile_store.py), which scan only the pruned partitions."""
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

    @staticmethod
    def _ancestor_chain(z: int, x: int, y: int) -> list:
        anc = []
        while z > 0:
            z -= 1
            x >>= 1
            y >>= 1
            anc.append((z, x, y))
        return anc

    def _ancestor_lookup_df(self, anc: list):
        """Pruned registry lookup for an ancestor chain (<= 24 keys): one
        isin filter over the packed tile key, no full-registry collect
        (plan-asserted in tests/test_plans.py)."""
        packed = (
            F.col("z").cast("long") * F.lit(1 << 50)
            + F.col("x").cast("long") * F.lit(1 << 25)
            + F.col("y").cast("long")
        )
        wanted = [(az << 50) + (ax << 25) + ay for az, ax, ay in anc]
        return (
            self.registry()
            .filter(packed.isin(wanted))
            .select("z", "x", "y", "has_source")
        )

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

        # walk up to the nearest ancestor that retained source features.
        # The ancestor chain is <= 24 keys, so the lookup is one pruned
        # filter over the registry (isin on a packed key) — never a full
        # registry collect (at z14 full-earth the registry is ~10^8 rows).
        anc = self._ancestor_chain(z, x, y)
        reg = {
            (r.z, r.x, r.y): r.has_source
            for r in self._ancestor_lookup_df(anc).collect()
        }
        found = next((k for k in anc if k in reg), None)
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
        if len(self.store.tiles) > 24:
            self.store.compact()
        return self._fetch(z, x, y)

    # -- incremental maintenance (O22-O24, geojsonvt.ts:87-157) -------------

    def update_data(self, diff: Optional[dict] = None, filter=None) -> None:
        """Apply a source diff + optional predicate filter, invalidate the
        affected tiles, rebuild the root eagerly; deeper tiles regenerate
        lazily on get_tile (tile-index.ts:36-61)."""
        if not self.options.updateable:
            raise ValueError(
                "to update tile geojson `updateable` option must be set to true"
            )
        from .updates import apply_source_diff, filter_update

        affected, source, self._batch = apply_source_diff(
            self.spark, self.source_df, diff, self.options, self._batch
        )
        if filter is not None:
            affected, source = filter_update(source, affected, filter)
        affected = affected.localCheckpoint(eager=True)
        if affected.isEmpty():
            return
        self.source_df = source.localCheckpoint(eager=True)

        if self.cluster_index is not None:
            # cluster mode: full rebuild (cluster-tile-index.ts:104-107)
            self.cluster_index = ClusterTileIndexSpark(
                self.spark, self.options.cluster_options
            ).initialize_df(self.source_df)
            return

        self._invalidate_tiles(affected)
        self._rebuild_root()
        if len(self.store.tiles) > 24:
            self.store.compact()

    def _invalidate_tiles(self, affected: DataFrame) -> None:
        """Interval/bbox join between affected-feature bboxes and buffered
        tile bounds -> delete intersecting tiles (tile-index.ts:235-305).
        The root is always rebuilt, so it is always invalidated here."""
        k1 = self.options.buffer / self.options.extent  # NOT halved (:254)
        boxes = affected.select("minx", "miny", "maxx", "maxy")
        reg = self.store.registry_df()
        z2 = F.pow(F.lit(2.0), F.col("z").cast("double"))
        tminx = (F.col("x") - k1) / z2
        tmaxx = (F.col("x") + 1 + k1) / z2
        tminy = (F.col("y") - k1) / z2
        tmaxy = (F.col("y") + 1 + k1) / z2
        intersects = (
            (F.col("maxx") >= tminx)
            & (F.col("minx") < tmaxx)
            & (F.col("maxy") >= tminy)
            & (F.col("miny") < tmaxy)
        )
        inv = (
            reg.join(F.broadcast(boxes), intersects, "leftsemi")
            .select("z", "x", "y")
            .union(self.spark.createDataFrame([(0, 0, 0)], ["z", "x", "y"]))
            .distinct()
            .localCheckpoint(eager=True)
        )
        store = self.store
        for attr in ("tiles", "registry", "sources"):
            kept = [
                df.join(F.broadcast(inv), ["z", "x", "y"], "left_anti")
                for df in getattr(store, attr)
            ]
            setattr(store, attr, kept)

    def _rebuild_root(self) -> None:
        # eager root regen with retained source (tile-index.ts:47-54)
        if self.source_df is None or self.source_df.isEmpty():
            # the reference still creates an (empty) root tile
            from ..model import REGISTRY_SCHEMA

            self.store.registry.append(
                self.spark.createDataFrame(
                    [(0, 0, 0, 0, 0, 0, False)], REGISTRY_SCHEMA
                )
            )
            return
        build_pyramid(
            self.source_df,
            self.options,
            store=self.store,
            workdir=None,
            start=(0, 0, 0),
            target=(0, 0, 0),
            register_start=True,
        )

    def get_data(self) -> dict:
        """Source export as GeoJSON (O25; geojsonvt.ts:133-136).

        TEST SURFACE, NOT SERVING: collects the whole source to the driver
        (the reference API contract). Pipelines that need the corpus back
        out keep it distributed via deconvert.features_to_geojson over the
        sources DataFrame instead."""
        if not self.options.updateable:
            raise ValueError(
                "to retrieve data the `updateable` option must be set to true"
            )
        from ..functions.deconvert import features_to_geojson
        from ..model import row_to_feature

        rows = self.source_df.orderBy("okey").collect()
        return features_to_geojson([row_to_feature(r.asDict()) for r in rows])

    def update_cluster_options(self, cluster: bool, cluster_options) -> None:
        """Toggle/retune clustering, rebuilding from the stored source
        (geojsonvt.ts:142-157)."""
        if self.source_df is None:
            raise ValueError("updateClusterOptions requires the `updateable` option")
        if isinstance(cluster_options, dict):
            cluster_options = ClusterOptions(**cluster_options)
        self.options = self.options.with_(
            cluster=cluster, cluster_options=cluster_options
        )
        src = None if self.source_df.isEmpty() else self.source_df
        if cluster:
            self.cluster_index = ClusterTileIndexSpark(
                self.spark, self.options.cluster_options
            )
            if src is not None:
                self.cluster_index.initialize_df(src)
            self.store = PyramidStore(self.spark, self.options, self.workdir)
        else:
            self.cluster_index = None
            self.store = (
                build_pyramid(src, self.options, workdir=None)
                if src is not None
                else PyramidStore(self.spark, self.options, self.workdir)
            )

    # -- cluster surfaces (geojsonvt.ts:160-183) ----------------------------

    def get_clusters(self, bbox, zoom):
        if self.cluster_index is None:
            return None
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
