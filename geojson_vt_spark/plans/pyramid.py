"""Top-down tile pyramid build (O12) as an iterative per-zoom DataFrame plan.

Reference semantics: /root/reference/src/tile-index.ts:138-228 (splitTile BFS:
create tile -> stop-rule check -> 4-way buffered quadrant clip -> recurse) and
:82-120 (getTile drill-down with ancestor pruning).

Spark-first design (NOT a translation of the single-threaded BFS):

  * one loop iteration per zoom level; the per-tile stack becomes a *frontier*
    DataFrame of (z, x, y, feature) rows;
  * tile assembly (O13+O14) is a row-wise mapInPandas — tile-level counters are
    SUM aggregates, so no tile ever has to fit in a single task (a z0 tile over
    the full corpus stays distributed);
  * the stop rule (z == indexMaxZoom or numPoints <= indexMaxPoints,
    tile-index.ts:177-179) needs only per-tile vertex-count sums: a cheap
    partial-aggregated groupBy — the only shuffle in the level;
  * quadrant clipping is row-wise mapInPandas; feature-level bbox trivial
    accept/reject happens inside the kernel (equivalent to the reference's
    batch check, see functions/clip.py);
  * each level is checkpointed (parquet under `workdir`, or localCheckpoint)
    -> per-partition lineage: a killed job resumes at the first missing level
    without recomputing finished zooms;
  * empty child tiles are registered from the split-decision table (the
    reference pushes all 4 children even when a quadrant clip is empty,
    tile-index.ts:223-226) — no data rows needed;
  * drill-down (getTile miss) is the same loop in target mode: stop at
    z == cz/maxZoom, split only ancestors of the target (tile-index.ts:184-187
    -> partition-pruning-style filter on the frontier).
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import Options
from ..functions.clip import AXIS_X, AXIS_Y, clip_one
from ..model import (
    FEATURE_SCHEMA,
    TILE_FEATURE_SCHEMA,
    feature_to_row,
    row_to_feature,
    tile_feature_to_json,
)
from ..functions.tile import assemble_feature, transform_tile_feature

# broadcast-join the per-level split decision back onto the frontier only while
# the tile list is comfortably below the driver/executor broadcast limit
_BROADCAST_TILE_LIMIT = 200_000

# subtree phase: once a splitting tile's vertex count fits one task, its whole
# sub-pyramid is finished inside a single applyInPandas group (no further
# per-level jobs/shuffles for that subtree). The per-level BFS keeps running
# only for tiles too big for a task — exactly the two-phase shape a large
# cluster wants: distributed clipping while single tiles hold huge data,
# per-subtree parallelism as soon as fan-out provides it.
_SUBTREE_MAX_POINTS = 200_000
_SUBTREE_MIN_TILES = 48


def _stop_rule(z, x, y, num_points, options: Options, target) -> bool:
    """tile-index.ts:177-188: index cutoff, or drill-down target/ancestor
    pruning."""
    if target is None:
        return z == min(options.index_max_zoom, options.max_zoom) or (
            num_points <= options.index_max_points
        )
    cz, cx, cy = target
    steps = cz - z
    is_anc = z == cz or (
        x == (cx >> steps if steps > 0 else cx)
        and y == (cy >> steps if steps > 0 else cy)
    )
    return z == options.max_zoom or z == cz or not is_anc


def _assemble_fn(options: Options):
    """mapInPandas kernel: frontier feature rows -> tile feature rows."""

    cols = [f.name for f in FEATURE_SCHEMA.fields]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in TILE_FEATURE_SCHEMA.fields}
            for row in pdf[cols].to_dict("records"):
                feat = row_to_feature(row)
                z, x, y = int(row["z"]), int(row["x"]), int(row["y"])
                tf, npts, nsimp = assemble_feature(feat, z, options)
                out["z"].append(z)
                out["x"].append(x)
                out["y"].append(y)
                out["okey"].append(row["okey"])
                out["npoints"].append(npts)
                out["nsimplified"].append(nsimp)
                out["minx"].append(row["minx"])
                out["miny"].append(row["miny"])
                out["maxx"].append(row["maxx"])
                out["maxy"].append(row["maxy"])
                if tf is None:
                    out["tf_type"].append(None)
                    out["tf_id"].append(None)
                    out["tf_tags"].append(None)
                    out["tf_geom"].append(None)
                else:
                    tft = transform_tile_feature(tf, z, x, y, options.extent)
                    out["tf_type"].append(tft["type"])
                    out["tf_id"].append(row["id"])
                    out["tf_tags"].append(
                        None if tft["tags"] is None else json.dumps(tft["tags"])
                    )
                    out["tf_geom"].append(tile_feature_to_json(tft))
            if out["z"]:
                yield pd.DataFrame(out)

    return fn


def _split_fn(options: Options):
    """mapInPandas kernel: features of splitting tiles -> child-tile features.

    Clip order matches tile-index.ts:208-219 (x bands first, then y), and the
    okey gains (x-slice, y-slice) indexes so multi-slice lineMetrics output
    keeps reference ordering.
    """
    k1 = 0.5 * options.buffer / options.extent
    k2 = 0.5 - k1
    k3 = 0.5 + k1
    k4 = 1 + k1
    cols = [f.name for f in FEATURE_SCHEMA.fields]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf[cols].to_dict("records"):
                feat = row_to_feature(row)
                z, x, y = int(row["z"]), int(row["x"]), int(row["y"])
                okey = list(row["okey"])
                z2 = 1 << z
                for qx, (sx, ex) in ((0, (x - k1, x + k3)), (1, (x + k2, x + k4))):
                    xa: list = []
                    clip_one(feat, sx / z2, ex / z2, AXIS_X, options, xa)
                    for jx, fx in enumerate(xa):
                        for qy, (sy, ey) in (
                            (0, (y - k1, y + k3)),
                            (1, (y + k2, y + k4)),
                        ):
                            ya: list = []
                            clip_one(fx, sy / z2, ey / z2, AXIS_Y, options, ya)
                            for jy, fy in enumerate(ya):
                                rows.append(
                                    feature_to_row(
                                        fy,
                                        z + 1,
                                        x * 2 + qx,
                                        y * 2 + qy,
                                        okey + [jx, jy],
                                    )
                                )
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return fn


# unified output of the subtree kernel: one applyInPandas pass emits tile
# features (kind=1), retained sources (kind=2) and registry rows (kind=3)
def _unified_schema():
    from pyspark.sql import types as T

    fields = {}
    for f in TILE_FEATURE_SCHEMA.fields:
        fields[f.name] = f.dataType
    for f in FEATURE_SCHEMA.fields:
        fields.setdefault(f.name, f.dataType)
    fields["num_features"] = T.LongType()
    fields["num_points"] = T.LongType()
    fields["num_simplified"] = T.LongType()
    fields["has_source"] = T.BooleanType()
    fields["kind"] = T.IntegerType()
    return T.StructType([T.StructField(n, t, True) for n, t in fields.items()])


UNIFIED_SCHEMA = _unified_schema()


def _subtree_fn(options: Options, target):
    """applyInPandas kernel: all feature rows of ONE splitting tile ->
    the tile's entire sub-pyramid (children assembled/registered/split
    recursively, reference splitTile semantics, tile-index.ts:138-228)."""
    k1 = 0.5 * options.buffer / options.extent
    k2 = 0.5 - k1
    k3 = 0.5 + k1
    k4 = 1 + k1
    cols = [f.name for f in FEATURE_SCHEMA.fields]
    ucols = [f.name for f in UNIFIED_SCHEMA.fields]
    blank = {c: None for c in ucols}

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = pdf[cols].to_dict("records")
        rows.sort(key=lambda r: tuple(r["okey"]))
        z0, x0, y0 = int(rows[0]["z"]), int(rows[0]["x"]), int(rows[0]["y"])
        feats = [(list(r["okey"]), row_to_feature(r)) for r in rows]
        out: list = []

        def emit(**kw):
            d = dict(blank)
            d.update(kw)
            out.append(d)

        stack = [(z0, x0, y0, feats, True)]
        while stack:
            z, x, y, tile_feats, is_root = stack.pop()
            if not is_root:
                nf = len(tile_feats)
                npts_total = 0
                nsimp_total = 0
                for okey, f in tile_feats:
                    tf, npts, nsimp = assemble_feature(f, z, options)
                    npts_total += npts
                    nsimp_total += nsimp
                    if tf is not None:
                        tft = transform_tile_feature(tf, z, x, y, options.extent)
                        emit(
                            kind=1,
                            z=z,
                            x=x,
                            y=y,
                            okey=okey,
                            tf_type=tft["type"],
                            tf_id=None
                            if f["id"] is None
                            else json.dumps(f["id"]),
                            tf_tags=None
                            if tft["tags"] is None
                            else json.dumps(tft["tags"]),
                            tf_geom=tile_feature_to_json(tft),
                            npoints=npts,
                            nsimplified=nsimp,
                            minx=f["minx"],
                            miny=f["miny"],
                            maxx=f["maxx"],
                            maxy=f["maxy"],
                        )
                stopped = _stop_rule(z, x, y, npts_total, options, target)
                emit(
                    kind=3,
                    z=z,
                    x=x,
                    y=y,
                    okey=[],
                    num_features=nf,
                    num_points=npts_total,
                    num_simplified=nsimp_total,
                    has_source=bool(stopped and nf > 0),
                )
                if stopped:
                    for okey, f in tile_feats:
                        row = feature_to_row(f, z, x, y, okey)
                        emit(kind=2, **row)
                    continue
                if not tile_feats:  # empty tiles never split (tile-index.ts:193)
                    continue
            # 4-way buffered quadrant clip (tile-index.ts:198-219)
            z2 = 1 << z
            children = {(0, 0): [], (0, 1): [], (1, 0): [], (1, 1): []}
            for okey, f in tile_feats:
                for qx, (sx, ex) in ((0, (x - k1, x + k3)), (1, (x + k2, x + k4))):
                    xa: list = []
                    clip_one(f, sx / z2, ex / z2, AXIS_X, options, xa)
                    for jx, fx in enumerate(xa):
                        for qy, (sy, ey) in (
                            (0, (y - k1, y + k3)),
                            (1, (y + k2, y + k4)),
                        ):
                            ya: list = []
                            clip_one(fx, sy / z2, ey / z2, AXIS_Y, options, ya)
                            for jy, fy in enumerate(ya):
                                children[(qx, qy)].append((okey + [jx, jy], fy))
            for (qx, qy), cfeats in children.items():
                stack.append((z + 1, x * 2 + qx, y * 2 + qy, cfeats, False))

        res = pd.DataFrame(out, columns=ucols)
        for c in ("coords", "rsize", "rstart", "rend"):
            res[c] = res[c].map(
                lambda v: v.tolist() if hasattr(v, "tolist") else v
            )
        for c in ("rlens", "rpoly"):
            res[c] = res[c].map(
                lambda v: v.tolist() if hasattr(v, "tolist") else v
            )
        return res

    return fn


class PyramidStore:
    """Accumulated pyramid state: tile features, tile registry, retained
    sources (the drill-down frontier, tile-index.ts:174)."""

    def __init__(self, spark: SparkSession, options: Options, workdir: Optional[str]):
        self.spark = spark
        self.options = options
        self.workdir = workdir
        self.tiles: list[DataFrame] = []
        self.registry: list[DataFrame] = []
        self.sources: list[DataFrame] = []

    def tiles_df(self) -> DataFrame:
        return self._union(self.tiles, TILE_FEATURE_SCHEMA)

    def registry_df(self) -> DataFrame:
        from ..model import REGISTRY_SCHEMA

        return self._union(self.registry, REGISTRY_SCHEMA)

    def sources_df(self) -> DataFrame:
        return self._union(self.sources, FEATURE_SCHEMA)

    def _union(self, dfs: list[DataFrame], schema) -> DataFrame:
        if not dfs:
            return self.spark.createDataFrame([], schema)
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return out

    def compact(self) -> None:
        """Fold each accumulated frame list into one materialized frame.

        Incremental updates and repeated drill-downs append (and anti-join)
        per-level frames; left unchecked the union plans grow linearly with
        the number of operations and every tile lookup re-plans them all.
        Compacting is the Iceberg-snapshot analog: one localCheckpoint per
        table, after which lookups scan a single cached relation."""
        self.tiles = [self.tiles_df().localCheckpoint(eager=True)]
        self.registry = [self.registry_df().localCheckpoint(eager=True)]
        self.sources = [self.sources_df().localCheckpoint(eager=True)]


def _checkpoint(df: DataFrame, workdir: Optional[str], name: str, resume: bool) -> DataFrame:
    """Per-level lineage checkpoint. With a workdir each level is a parquet
    snapshot (resumable); without, localCheckpoint truncates lineage."""
    if workdir:
        path = os.path.join(workdir, name)
        if not (resume and os.path.exists(os.path.join(path, "_SUCCESS"))):
            df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.schema(df.schema).parquet(path)
    return df.localCheckpoint(eager=True)


def build_pyramid(
    features_df: DataFrame,
    options: Options,
    store: Optional[PyramidStore] = None,
    workdir: Optional[str] = None,
    resume: bool = False,
    start: tuple = (0, 0, 0),
    target: Optional[tuple] = None,
    register_start: bool = False,
) -> PyramidStore:
    """Run the per-zoom split loop.

    features_df: FEATURE_SCHEMA rows already assigned to the `start` tile.
    target: (cz, cx, cy) for drill-down mode (getTile miss), else None for the
            first-pass indexing run.
    """
    spark = features_df.sparkSession
    if store is None:
        store = PyramidStore(spark, options, workdir)

    z0, _, _ = start
    cz = cx = cy = None
    if target is not None:
        cz, cx, cy = target

    frontier = features_df
    expected: Optional[DataFrame] = None  # child keys owed a registry entry
    expected_keys: Optional[list] = [start]  # driver mode; None once too large
    z = z0
    first_level = True

    def _stop_rule_py(tz, tx, ty, num_points):
        if target is None:
            return tz == min(options.index_max_zoom, options.max_zoom) or (
                num_points <= options.index_max_points
            )
        steps = cz - tz
        is_anc = tz == cz or (
            tx == (cx >> steps if steps > 0 else cx)
            and ty == (cy >> steps if steps > 0 else cy)
        )
        return tz == options.max_zoom or tz == cz or not is_anc

    while True:
        frontier = _checkpoint(frontier, workdir, f"frontier/z={z:02d}", resume)

        asm = frontier.mapInPandas(_assemble_fn(options), TILE_FEATURE_SCHEMA)
        asm = _checkpoint(asm, workdir, f"tiles/z={z:02d}", resume)
        stats = asm.groupBy("z", "x", "y").agg(
            F.count(F.lit(1)).alias("num_features"),
            F.sum("npoints").alias("num_points"),
            F.sum("nsimplified").alias("num_simplified"),
        )

        driver_mode = expected_keys is not None and len(expected_keys) <= _BROADCAST_TILE_LIMIT

        if driver_mode:
            # ---- driver-side decision path: the per-level tile-count is
            # bounded (<= 4 x previous splits), so the split/stop decision
            # table fits the driver; one job per level instead of four.
            # Tile DATA stays distributed; only per-tile counters come back.
            got = {(r.z, r.x, r.y): r for r in stats.collect()}
            reg_rows = []
            split_list: list = []
            stop_list: list = []
            for key in expected_keys:
                r = got.get(key)
                nf = r.num_features if r else 0
                npts = r.num_points if r else 0
                nsimp = r.num_simplified if r else 0
                stopped = _stop_rule_py(key[0], key[1], key[2], npts)
                if (not stopped) and nf > 0:
                    split_list.append(key)
                else:
                    stop_list.append(key)
                reg_rows.append(
                    (key[0], key[1], key[2], nf, npts, nsimp, bool(stopped and nf > 0))
                )
            from ..model import REGISTRY_SCHEMA

            registry_df = spark.createDataFrame(reg_rows, REGISTRY_SCHEMA)

            # ---- subtree phase: route task-sized splitting tiles to a
            # one-shot per-subtree kernel; keep oversized tiles in the loop
            subtree_list: list = []
            if split_list and (
                target is not None or len(split_list) >= _SUBTREE_MIN_TILES
            ):
                subtree_list = [
                    k
                    for k in split_list
                    if got.get(k) is not None
                    and got[k].num_points <= _SUBTREE_MAX_POINTS
                ]
                if subtree_list:
                    sub_set = set(subtree_list)
                    split_list = [k for k in split_list if k not in sub_set]
                    sub_keys = spark.createDataFrame(subtree_list, ["z", "x", "y"])
                    sub_frontier = frontier.join(
                        F.broadcast(sub_keys), ["z", "x", "y"], "leftsemi"
                    )
                    # optional cap on concurrent subtree tasks (= python
                    # workers with high-throughput Arrow streams). This
                    # sandbox's guest kernel burns 45-75% system time when
                    # ~32 Arrow streams run at once (virtualized loopback);
                    # real clusters run ~5 streams per executor host.
                    # repartition on the group keys satisfies the groupBy's
                    # ClusteredDistribution, so no second shuffle happens.
                    npart = int(os.environ.get("SPARK_GRAFT_SUBTREE_PARTITIONS", "0"))
                    if npart > 0:
                        sub_frontier = sub_frontier.repartition(npart, "z", "x", "y")
                    unified = sub_frontier.groupBy("z", "x", "y").applyInPandas(
                        _subtree_fn(options, target), UNIFIED_SCHEMA
                    )
                    unified = _checkpoint(
                        unified, workdir, f"subtree/z={z:02d}", resume
                    )
                    store.tiles.append(
                        unified.filter(F.col("kind") == 1).select(
                            *[f.name for f in TILE_FEATURE_SCHEMA.fields]
                        )
                    )
                    store.sources.append(
                        unified.filter(F.col("kind") == 2).select(
                            *[f.name for f in FEATURE_SCHEMA.fields]
                        )
                    )
                    from ..model import REGISTRY_SCHEMA as _RS

                    store.registry.append(
                        unified.filter(F.col("kind") == 3).select(
                            *[f.name for f in _RS.fields]
                        )
                    )

            n_split = len(split_list)
            split_keys = spark.createDataFrame(
                split_list or [(0, 0, 0)], ["z", "x", "y"]
            )
            if not split_list:
                split_keys = split_keys.limit(0)
            stop_keys_df = spark.createDataFrame(
                stop_list or [(0, 0, 0)], ["z", "x", "y"]
            )
            if not stop_list:
                stop_keys_df = stop_keys_df.limit(0)
            sources = frontier.join(
                F.broadcast(stop_keys_df), ["z", "x", "y"], "leftsemi"
            ).cache()  # lazy — materialized only if a drill-down reads it
            decision = None
        else:
            # ---- distributed decision path (web-scale levels) ----
            if expected is None and expected_keys is not None:
                # first level after leaving driver mode: the child-key list
                # outgrew the broadcast limit but still owes registry entries
                # for empty children (tile-index.ts:223-226) — seed `expected`
                # from it before dropping the driver-side list.
                expected = spark.createDataFrame(expected_keys, ["z", "x", "y"])
                expected_keys = None
            if expected is not None:
                stats = (
                    expected.join(stats, ["z", "x", "y"], "left")
                    .fillna(0, ["num_features", "num_points", "num_simplified"])
                )
            if target is None:
                stop = (
                    F.col("z") == F.lit(min(options.index_max_zoom, options.max_zoom))
                ) | (F.col("num_points") <= F.lit(options.index_max_points))
            else:
                steps = cz - z
                is_anc = (
                    (F.lit(z) == F.lit(cz))
                    | ((F.col("x") == F.lit(cx >> steps if steps > 0 else cx))
                       & (F.col("y") == F.lit(cy >> steps if steps > 0 else cy)))
                )
                stop = (
                    (F.lit(z) == F.lit(options.max_zoom))
                    | (F.lit(z) == F.lit(cz))
                    | (~is_anc)
                )
            decision = stats.withColumn(
                "split", (~stop) & (F.col("num_features") > 0)
            ).withColumn("stopped", stop)
            decision = decision.cache()
            registry_df = decision.select(
                "z",
                "x",
                "y",
                "num_features",
                "num_points",
                "num_simplified",
                (F.col("stopped") & (F.col("num_features") > 0)).alias("has_source"),
            )
            split_keys = decision.filter("split").select("z", "x", "y")
            n_split = split_keys.count()
            stop_keys = decision.filter("stopped").select("z", "x", "y")
            if n_split < _BROADCAST_TILE_LIMIT:
                stop_keys = F.broadcast(stop_keys)
            sources = frontier.join(stop_keys, ["z", "x", "y"], "leftsemi")
            sources = _checkpoint(sources, workdir, f"sources/z={z:02d}", resume)

        # registry entries for this level (tiles kept forever; source retained
        # only where we stopped — tile-index.ts:174,191)
        store.registry.append(registry_df)
        store.tiles.append(asm.filter(F.col("tf_type").isNotNull()))
        store.sources.append(sources)

        if first_level and target is not None and not register_start:
            # drill-down re-entry: the start tile itself is already registered
            # by the first pass; drop the duplicate entry
            start_df = spark.createDataFrame([start], ["z", "x", "y"])
            for attr in ("registry", "tiles", "sources"):
                lst = getattr(store, attr)
                lst[-1] = lst[-1].join(start_df, ["z", "x", "y"], "left_anti")
        first_level = False

        if n_split == 0:
            if decision is not None:
                decision.unpersist()
            break

        sk = F.broadcast(split_keys) if n_split < _BROADCAST_TILE_LIMIT else split_keys
        to_split = frontier.join(sk, ["z", "x", "y"], "leftsemi")
        frontier = to_split.mapInPandas(_split_fn(options), FEATURE_SCHEMA)

        # all 4 children of every split tile get a tile entry, even if empty
        # (tile-index.ts:223-226)
        if driver_mode:
            expected_keys = [
                (kz + 1, kx * 2 + dx, ky * 2 + dy)
                for kz, kx, ky in split_list
                for dx in (0, 1)
                for dy in (0, 1)
            ]
            expected = None
        else:
            expected_keys = None
            expected = (
                split_keys.select(
                    (F.col("z") + 1).alias("z"),
                    F.explode(
                        F.array(
                            F.struct((F.col("x") * 2).alias("cx"), (F.col("y") * 2).alias("cy")),
                            F.struct((F.col("x") * 2).alias("cx"), (F.col("y") * 2 + 1).alias("cy")),
                            F.struct((F.col("x") * 2 + 1).alias("cx"), (F.col("y") * 2).alias("cy")),
                            F.struct(
                                (F.col("x") * 2 + 1).alias("cx"), (F.col("y") * 2 + 1).alias("cy")
                            ),
                        )
                    ).alias("c"),
                )
                .select("z", F.col("c.cx").alias("x"), F.col("c.cy").alias("y"))
            )
            expected = _checkpoint(expected, workdir, f"expected/z={z + 1:02d}", resume)
        if decision is not None:
            decision.unpersist()
        z += 1

    return store
