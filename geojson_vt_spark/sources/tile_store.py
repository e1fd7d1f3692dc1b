"""On-disk tile pyramid store: build once with spark-submit, serve get_tile
from the written layout with pruned reads.

The live engine (operators/engine.py) serves get_tile from checkpointed
in-session DataFrames — right for interactive build+query, wrong for the
deployment the north rule describes, where one cluster job materializes the
pyramid over the 10^12-document corpus and many downstream consumers then
read single tiles. This module is that serving layout:

  * tiles are written `partitionBy("z")` and sorted within each zoom by
    (x, y) — a get_tile(z, x, y) read prunes to ONE zoom directory at file-
    listing time (Catalyst PartitionFilters, the same mechanism as
    training.ivf_index_write's inverted lists) and pushes the x/y equality
    into the parquet row-group stats (PushedFilters), so a point lookup
    over a full-earth z14 pyramid (~10^8 tiles) touches one partition dir
    and the few row groups whose sorted x-range covers the key;
  * the registry (tile existence + drill-down metadata) rides beside it,
    also z-partitioned — the "does this tile exist" probe is pruned the
    same way.

Semantics: `DiskTileServer.get_tile` returns exactly what the engine's
`get_tile` returns for every tile the build materialized (parity-tested
over whole fixture pyramids in tests/test_tile_store.py). What it does NOT
do is lazy drill-down below the indexed zoom — the store is a read-only
artifact; tiles not materialized return None. A deployment wanting
drill-down keeps a live engine over the retained sources (the registry's
has_source column says which ancestors can drill) — reference semantics:
tile-index.ts:82-120 (lookup), geojsonvt.ts:62-80 (index vs on-demand).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..model import REGISTRY_SCHEMA, TILE_FEATURE_SCHEMA, tile_feature_from_row


def write_tile_store(tiles: DataFrame, registry: DataFrame, path: str) -> None:
    """Materialize a built pyramid as the serving layout. `tiles`/`registry`
    are the engine's tiles()/registry() frames (or the pyramid job's
    equivalents). One shuffle each (repartition by z) so every zoom becomes
    one sorted file set; at 100 TB widen the repartition to (z, x-range)
    buckets — the layout contract (z dirs, xy-sorted files) is unchanged."""
    (
        tiles.repartition(F.col("z"))
        .sortWithinPartitions("z", "x", "y", "okey")
        .write.mode("overwrite")
        .partitionBy("z")
        .parquet(f"{path}/tiles")
    )
    (
        registry.repartition(F.col("z"))
        .sortWithinPartitions("z", "x", "y")
        .write.mode("overwrite")
        .partitionBy("z")
        .parquet(f"{path}/registry")
    )


class DiskTileServer:
    """Point get_tile lookups against a written tile store."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        # explicit schemas: an empty store (no tiles at all) still reads
        self.tiles = spark.read.schema(TILE_FEATURE_SCHEMA).parquet(
            f"{path}/tiles"
        )
        self.registry = spark.read.schema(REGISTRY_SCHEMA).parquet(
            f"{path}/registry"
        )

    def _key_filter(self, df: DataFrame, z: int, x: int, y: int) -> DataFrame:
        return df.filter(
            (F.col("z") == z) & (F.col("x") == x) & (F.col("y") == y)
        )

    def get_tile(self, z, x, y) -> Optional[list]:
        """Same contract as the engine's materialized-tile path
        (operators/engine.py:_fetch): None for unknown/never-built tiles,
        the reference tile-feature list otherwise.

        One Spark job on the hot path: collect the tile rows first; only a
        ZERO-row result needs the registry consulted (to distinguish a
        materialized-but-empty tile, [] — rare: the builds register empty
        children without tile rows — from a never-built key, None). Known-
        present tiles — the overwhelming serving case — pay exactly one
        pruned scan instead of the previous probe+scan pair."""
        z, x, y = int(z), int(x), int(y)
        if z < 0 or z > 24:
            return None
        z2 = 1 << z
        x = (x + z2) & (z2 - 1)  # wrap x, reference geojsonvt.ts:94
        rows = self._key_filter(self.tiles, z, x, y).collect()
        if not rows:
            if not self._key_filter(self.registry, z, x, y).count():
                return None
            return []
        rows.sort(key=lambda r: tuple(r.okey))
        return [tile_feature_from_row(r.asDict()) for r in rows]

    def all_tile_keys(self) -> list:
        """Registry enumeration, for parity sweeps and consumers that shard
        the pyramid: [(z, x, y), ...]."""
        return [
            (r.z, r.x, r.y)
            for r in self.registry.select("z", "x", "y").collect()
        ]

    def get_tiles(self, keys) -> dict:
        """Batch point lookups: ONE registry probe + ONE tile scan for the
        whole key list (vs one pair of jobs per key with get_tile), keyed
        'z{z}-{x}-{y}'. Keys absent from the registry are omitted; keys the
        registry knows but whose tile is empty map to []. The batch's z
        values prune the file listing to exactly those zoom directories
        (attribute-level isin -> PartitionFilters) and the x/y isin sets
        push into the xy-sorted row-group stats; the exact packed-key
        conjunct then runs post-scan (Catalyst cannot push arithmetic).
        This is the serving shape for a renderer fetching a viewport (a few
        dozen keys) or a shard sweep (thousands) — driver cost stays
        O(returned features)."""
        norm = set()
        for z, x, y in keys:
            z, x, y = int(z), int(x), int(y)
            if z < 0 or z > 24:
                continue
            z2 = 1 << z
            if y < 0 or y >= z2:  # no y-wrap in the reference; also keeps
                continue  # the packed key collision-free
            norm.add((z, (x + z2) & (z2 - 1), y))
        if not norm:
            return {}
        # Filter = pushable attribute conjuncts (z -> PartitionFilters, so
        # only the requested zoom dirs are LISTED; x/y isin -> PushedFilters
        # against the xy-sorted row-group stats) AND the exact packed key
        # (arithmetic, evaluated post-scan — Catalyst cannot push it, the
        # attribute conjuncts do that part). Gated in test_tile_store.py:
        # the batch scan's numPartitions == number of distinct requested z.
        zs = sorted({z for z, _x, _y in norm})
        xs = sorted({x for _z, x, _y in norm})
        ys = sorted({y for _z, _x, y in norm})
        packed = [(z << 50) | (x << 25) | y for z, x, y in norm]
        key_col = (
            F.shiftleft(F.col("z").cast("long"), 50)
            + F.shiftleft(F.col("x").cast("long"), 25)
            + F.col("y").cast("long")
        )
        flt = (
            F.col("z").isin(zs)
            & F.col("x").isin(xs)
            & F.col("y").isin(ys)
            & key_col.isin(packed)
        )
        known = {
            (r.z, r.x, r.y)
            for r in self.registry.where(flt).select("z", "x", "y").collect()
        }
        out = {f"z{z}-{x}-{y}": [] for z, x, y in norm if (z, x, y) in known}
        if not out:
            return {}
        rows = self.tiles.where(flt).collect()
        buckets: dict = {}
        for r in rows:
            buckets.setdefault((r.z, r.x, r.y), []).append(r)
        for (z, x, y), rs in buckets.items():
            key = f"z{z}-{x}-{y}"
            if key not in out:
                continue
            rs.sort(key=lambda r: tuple(r.okey))
            out[key] = [tile_feature_from_row(r.asDict()) for r in rs]
        return out
