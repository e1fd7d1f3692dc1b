"""Spatial joins over cell keys (north-rule operators).

The reference has no relational joins — its spatial analogs are the quadtree
assignment (tile-index.ts:208-219) and the kd-tree radius query
(cluster-tile-index.ts). At cluster scale both become *cell-binned equi-joins*:

  * cells are quadkeys over the mercator unit square at a fixed resolution —
    pure Column math (JVM-side, codegen), no Python;
  * point-in-polygon: coarse cell/bbox prefilter (broadcastable) + exact
    refine — range predicates for boxes, vectorized ray-casting (pandas UDF)
    for general polygons;
  * kNN: 3x3-neighborhood candidate join with driver-side ring doubling until
    every point's kth-neighbor distance is certified by the ring bound — each
    round joins only unsettled points, so hot cells don't force a global
    blow-up. AQE skew-join handles dense-cell imbalance.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T


def cell_col(x, y, res: int):
    """Quadkey cell id at resolution `res` (2^res x 2^res grid over [0,1]²).
    Clamps to the grid so buffered coords stay addressable. Thin wrapper over
    the default scheme of the pluggable cell seam (operators/cells.py)."""
    from .cells import QuadkeyCells

    return QuadkeyCells(res).point_cell(x, y).alias("cell")


def point_in_box_join(
    points: DataFrame,
    boxes: DataFrame,
    px: str = "x",
    py: str = "y",
    res: int = 8,
    scheme=None,
) -> DataFrame:
    """points(id-ish cols, x, y) ⋈ boxes(box cols, minx, miny, maxx, maxy).

    Coarse pass: boxes explode to covered cells (cheap — boxes are few),
    points map to one cell, equi-join on cell (broadcast when boxes are
    small); exact refine = closed-range containment predicate. Semantics:
    minx <= x <= maxx AND miny <= y <= maxy.

    `scheme` is any operators/cells.py CellScheme (default: tile-aligned
    quadkeys at `res`; H3 where the native lib exists)."""
    if scheme is None:
        from .cells import QuadkeyCells

        scheme = QuadkeyCells(res)

    boxes_cells = boxes.withColumn(
        "cell",
        F.explode(
            scheme.bbox_cells(
                F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy")
            )
        ),
    )

    pts = points.withColumn(
        "cell", scheme.point_cell(F.col(px), F.col(py))
    )
    joined = pts.join(F.broadcast(boxes_cells), "cell").where(
        (F.col(px) >= F.col("minx"))
        & (F.col(px) <= F.col("maxx"))
        & (F.col(py) >= F.col("miny"))
        & (F.col(py) <= F.col("maxy"))
    )
    return joined.drop("cell")


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    px: str = "x",
    py: str = "y",
    res: int = 8,
) -> DataFrame:
    """points ⋈ polygons(poly_id, xs array<double>, ys array<double>,
    minx, miny, maxx, maxy) — bbox-cell prefilter + exact even-odd
    ray-casting refine (vectorized numpy over Arrow batches).

    Boundary semantics: even-odd rule with half-open edges (points exactly on
    a horizontal-crossing vertex count once) — matches the classic PNPOLY
    algorithm.
    """
    candidates = point_in_box_join(points, polygons, px, py, res)

    out_schema = T.StructType(
        [f for f in candidates.schema.fields if f.name not in ("xs", "ys")]
    )
    cols = [f.name for f in out_schema.fields]

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            for i, (x, y, xs, ys) in enumerate(
                zip(pdf[px], pdf[py], pdf["xs"], pdf["ys"])
            ):
                xs = np.asarray(xs, dtype=np.float64)
                ys = np.asarray(ys, dtype=np.float64)
                x1, y1 = np.roll(xs, 1), np.roll(ys, 1)
                cond = (ys > y) != (y1 > y)
                with np.errstate(divide="ignore", invalid="ignore"):
                    xin = (x1 - xs) * (y - ys) / (y1 - ys) + xs
                keep[i] = bool(np.logical_and(cond, x < xin).sum() % 2)
            out = pdf.loc[keep, cols]
            if len(out):
                yield out

    return candidates.mapInPandas(refine, out_schema)


def knn_join(
    a: DataFrame,
    b: DataFrame,
    k: int,
    a_id: str = "a_id",
    b_id: str = "b_id",
    res: int = 6,
    max_rounds: int = 12,
) -> DataFrame:
    """Exact k-nearest-neighbors of each a-point among b-points (planar,
    squared euclidean), as cell joins with ring-doubling certification.

    a: (a_id, x, y); b: (b_id, x, y). Returns (a_id, b_id, rank) with
    deterministic (dist, b_id) tie-breaking — oracle-comparable.

    Round r joins each unsettled a-point to b-points within Chebyshev ring
    `ring` of its cell; a point is settled once its kth distance is within the
    certified radius ((ring) * cell_size minus the in-cell offset bound), so
    no farther cell can hold a closer neighbor.
    """
    n = 1 << res
    cell_size = 1.0 / n

    ax = a.select(
        F.col(a_id),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        F.floor(F.least(F.greatest(F.col("x") * n, F.lit(0.0)), F.lit(float(n) - 1e-9))).cast("long").alias("acx"),
        F.floor(F.least(F.greatest(F.col("y") * n, F.lit(0.0)), F.lit(float(n) - 1e-9))).cast("long").alias("acy"),
    )
    bx = b.select(
        F.col(b_id),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.floor(F.least(F.greatest(F.col("x") * n, F.lit(0.0)), F.lit(float(n) - 1e-9))).cast("long").alias("bcx"),
        F.floor(F.least(F.greatest(F.col("y") * n, F.lit(0.0)), F.lit(float(n) - 1e-9))).cast("long").alias("bcy"),
    ).cache()

    unsettled = ax
    results = []
    ring = 1
    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        # candidate cells: all b-cells within Chebyshev distance `ring`
        cand = (
            unsettled.join(
                bx,
                (F.abs(F.col("acx") - F.col("bcx")) <= ring)
                & (F.abs(F.col("acy") - F.col("bcy")) <= ring),
            )
            if ring >= n
            else unsettled.withColumn(
                "ncell",
                F.explode(
                    F.flatten(
                        F.transform(
                            F.sequence(
                                F.greatest(F.col("acx") - ring, F.lit(0)),
                                F.least(F.col("acx") + ring, F.lit(n - 1)),
                            ),
                            lambda cx: F.transform(
                                F.sequence(
                                    F.greatest(F.col("acy") - ring, F.lit(0)),
                                    F.least(F.col("acy") + ring, F.lit(n - 1)),
                                ),
                                lambda cy: F.shiftleft(cx, res) + cy,
                            ),
                        )
                    )
                ),
            ).join(
                bx.withColumn("ncell", F.shiftleft(F.col("bcx"), res) + F.col("bcy")),
                "ncell",
            )
        )
        # explicit multiplication (not pow) so floats match SQL oracles bitwise
        dist = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
            F.col("ay") - F.col("by")
        ) * (F.col("ay") - F.col("by"))
        w = Window.partitionBy(a_id).orderBy(F.col("dist").asc(), F.col(b_id).asc())
        ranked = (
            cand.withColumn("dist", dist)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
        )
        # certification: kth distance must beat the worst-case uncovered cell
        guarantee = (ring * cell_size) ** 2
        per_a = ranked.groupBy(a_id).agg(
            F.count(F.lit(1)).alias("found"), F.max("dist").alias("kth")
        )
        settled_ids = per_a.where(
            (F.col("found") >= k) & (F.col("kth") <= F.lit(guarantee))
        ).select(a_id)
        covered_all = ring >= n  # ring covers the whole grid: everything settles
        if covered_all:
            results.append(ranked.select(a_id, b_id, "rank"))
            break
        results.append(
            ranked.join(F.broadcast(settled_ids), a_id, "leftsemi").select(
                a_id, b_id, "rank"
            )
        )
        unsettled = unsettled.join(settled_ids, a_id, "left_anti").localCheckpoint(
            eager=True
        )
        if unsettled.isEmpty():
            break
        ring *= 2

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out
