"""Distributed, order-free clustering — the scale path for O17.

The reference greedy pass is input-order-dependent and therefore sequential
(/root/reference/src/cluster-tile-index.ts:386-388). At 10^12 points that
algorithm cannot scale out, so the engine's scale mode re-expresses per-zoom
clustering as grid binning: snap rows to cells of side r = radius/(extent*2^z)
and merge each cell's rows into a weighted-centroid cluster when the cell
holds >= 2 rows totalling >= minPoints.

Properties vs the reference semantics (documented, invariant-tested):
  * every cluster's members lie within one cell (diameter r*sqrt(2) <= the
    reference's 2r merge reach) — clusters are *finer*, never coarser;
  * point counts are conserved per zoom; centroids are the exact weighted
    means of members; minPoints is respected;
  * ids keep the reference encoding (id - n) % 32 == origin zoom, with the
    packed cell index in place of the array position.

Execution shape (default, `_batched_levels`): cells nest across zooms, so
after ONE repartition by the batch's coarsest-zoom anchor cell a numpy
kernel finishes every zoom of the batch partition-locally; the two-tier
`batch_plan` (k=4 levels for the raw-point head batch, k_tail=8 for the
cell-collapsed tail batches, each anchored at its own coarsest zoom) gives
1 + ceil((levels-k)/k_tail) serial barriers with per-anchor row counts
bounded at ~4^k_tail * min_points after the first batch — skew-safe on
dense-city corpora where a single coarse anchor would otherwise hold most
of the data.
A per-zoom pure-Column engine (`_column_levels`, one
partial-agg shuffle + one checkpoint per zoom, AQE-skew-friendly) remains
selectable via SPARK_GRAFT_CLUSTER_LEVEL_MODE=column and is structurally
equality-tested against the batched one. Pass a workdir for parquet
snapshots (resumable lineage, same contract as plans/pyramid.py).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, functions as F

from ..config import ClusterOptions

# Cells can be negative for antimeridian copies, and cx grows like
# extent*2^z/radius (~5.4e7 at extent=512, radius=40, z=22). The packed cell
# feeds cid = packed*32 + zoom + n_points (supercluster.js:153 id encoding),
# so packed must stay under 2^57 for the cid to fit a signed long: a 2^27
# offset with a 2^28 multiplier packs |cx|,|cy| < 2^27 (every max_zoom <= 23
# at default extent/radius) into < 2^56, leaving 5 bits for the zoom slot.
_CELL_OFF = 1 << 27


def _packed_cell(cx, cy):
    return (cx + F.lit(_CELL_OFF)).cast("long") * F.lit(1 << 28) + (
        cy + F.lit(_CELL_OFF)
    ).cast("long")


def _validate_cell_range(options: ClusterOptions) -> None:
    max_cx = options.extent * (2.0 ** options.max_zoom) / options.radius
    if max_cx >= _CELL_OFF:
        raise ValueError(
            f"grid cluster cell ids overflow at max_zoom={options.max_zoom} "
            f"(extent={options.extent}, radius={options.radius}): |cx| can "
            f"reach {max_cx:.3g} >= 2^27; lower max_zoom or raise radius"
        )


def _checkpoint(df: DataFrame, workdir: Optional[str], name: str) -> DataFrame:
    if workdir:
        from ..sources.table_format import resolve_format

        store = resolve_format(df.sparkSession, workdir)
        if not store.exists(name):
            store.write(df, name)
        return store.read(df.sparkSession, name, df.schema)
    return df.localCheckpoint(eager=True)


def _widen(df: DataFrame, n_points: int) -> DataFrame:
    """Narrow level frame (x,y,src,parent,num,props) -> index.TREE_SCHEMA.

    Every dropped column is a pure function of the stored ones in grid mode,
    so reconstruction is lazy Column math over the checkpoint (no extra job):
      * pos/vrank: original points carry src=idx=pos; clusters carry
        src = packed*32 + (zorig + n_points) (supercluster.js:153 encoding),
        so packed = (src - n_points) >> 5 exactly (zorig < 32);
      * qx/qy are the JS-fround quantizations of x/y (f32∘f32 = f32);
      * props: reduce-folded JSON on cluster rows (batched kernel fold,
        reference cluster-tile-index.ts:416-437); point rows carry their raw
        tags in the narrow frame (the kernel's fold input) which is masked
        here — the TREE_SCHEMA contract is props only on clusters, singleton
        tags join in at query time.
    """
    f32 = lambda c: c.cast("float").cast("double")  # noqa: E731 — JS fround
    is_pt = F.col("src") < F.lit(n_points)
    pos = F.when(is_pt, F.col("src")).otherwise(
        F.shiftright(F.col("src") - F.lit(n_points), 5)
    )
    return df.select(
        pos.alias("pos"),
        pos.alias("vrank"),
        "x",
        "y",
        f32(F.col("x")).alias("qx"),
        f32(F.col("y")).alias("qy"),
        "src",
        "parent",
        "num",
        F.when(F.col("num") > 1, F.col("props")).alias("props"),
    )


def build_grid_trees(
    points_df: DataFrame,
    options: ClusterOptions,
    n_points: int,
    workdir: Optional[str] = None,
) -> dict[int, DataFrame]:
    """points_df: (idx long, px double, py double, id string, tags string) ->
    {zoom: tree DataFrame (index.TREE_SCHEMA columns)}.

    Two level engines (env ``SPARK_GRAFT_CLUSTER_LEVEL_MODE``):

    * ``batched`` (default) — ``_batched_levels``: one exchange + one
      materialization per GROUP of levels (anchor-cell partitioning + a
      partition-local numpy kernel), cutting the loop's serial shuffle
      count by the batch factor;
    * ``column`` — ``_column_levels``: the pure-Column per-level loop
      (one hash exchange + one checkpoint per zoom).

    Both shuffle and checkpoint a NARROW frame — (x, y, src, parent, num,
    props) — about half the bytes of the full tree schema (props is NULL
    unless a reduce fold is configured); `_widen` reconstructs the derived
    columns lazily at the dict boundary. In a bandwidth-bound loop the byte
    cut is wall-clock and scaling, not cosmetics."""
    o = options
    _validate_cell_range(o)
    f32 = lambda c: c.cast("float").cast("double")  # noqa: E731 — JS fround

    # With a reduce fold, point rows carry their raw tags JSON into the
    # narrow frame (the kernel maps+folds them per merged cell); without one
    # the column is NULL and costs nothing on the shuffle wire.
    props0 = (
        F.col("tags") if o.reduce_fn is not None else F.lit(None).cast("string")
    )
    level = points_df.select(
        f32(F.col("px")).alias("x"),
        f32(F.col("py")).alias("y"),
        F.col("idx").alias("src"),
        F.lit(-1).cast("long").alias("parent"),
        F.lit(1).cast("long").alias("num"),
        props0.alias("props"),
    )
    trees: dict[int, DataFrame] = {}
    mode = os.environ.get("SPARK_GRAFT_CLUSTER_LEVEL_MODE", "batched")
    if o.reduce_fn is not None:
        # map/reduce property folds run in the batched kernel only — the
        # pure-Column engine cannot evaluate a user Python reduce without
        # giving up its no-Python property, so it stays the no-props path.
        mode = "batched"
    if mode == "batched" and o.max_zoom >= o.min_zoom:
        # no eager materialization of the raw points: the first batch's own
        # checkpoint is the first barrier (its exchange re-shuffles the rows
        # anyway, and batch 1 overwrites trees[max_zoom+1] with the
        # parent-finalized frame). Callers hand in a deterministic/pinned
        # points_df (index.py localCheckpoints it), so lazy re-read is safe.
        trees[o.max_zoom + 1] = _widen(level, n_points)
        _batched_levels(level, trees, o, n_points, workdir)
    else:
        frontier = _checkpoint(level, workdir, f"ctree/z={o.max_zoom + 1:02d}")
        trees[o.max_zoom + 1] = _widen(frontier, n_points)
        if mode == "batched":
            _batched_levels(frontier, trees, o, n_points, workdir)
        else:
            _column_levels(frontier, trees, o, n_points, workdir)
    return trees


def _column_levels(
    frontier: DataFrame,
    trees: dict[int, DataFrame],
    o: ClusterOptions,
    n_points: int,
    workdir: Optional[str],
) -> None:
    """Per-level Column-only engine: one exchange + one checkpoint per zoom."""
    f32 = lambda c: c.cast("float").cast("double")  # noqa: E731 — JS fround

    # Each level's COMBINED frame is localCheckpoint(eager)-ed: all three
    # level products (parent-pointer rewrite, pass-through rows, new cluster
    # rows) are filters over it, so one materialization per level replaces
    # the diamond that previously re-executed the cells join per reference
    # (measured 8x SLOWER with a 4-level lazy window). The knob stays for
    # experimentation.
    ckpt_every = int(os.environ.get("SPARK_GRAFT_CLUSTER_CKPT_EVERY", "1"))

    def _window_ckpt(df: DataFrame, name: str, steps_done: int) -> DataFrame:
        if workdir:
            return _checkpoint(df, workdir, name)
        if steps_done % ckpt_every == 0:
            return df.localCheckpoint(eager=True)
        return df.cache()

    narrow_cols = ["x", "y", "src", "parent", "num", "props"]
    for z in range(o.max_zoom, o.min_zoom - 1, -1):
        r = o.radius / (o.extent * (2.0 ** z))
        cur = frontier
        # bin on the JS-fround quantization of the row coordinate (qx in the
        # wide schema) — recomputed lazily, identical float math
        binned = cur.withColumn(
            "cx", F.floor(f32(F.col("x")) / F.lit(r))
        ).withColumn("cy", F.floor(f32(F.col("y")) / F.lit(r)))
        # the level's ONLY exchange: hash-place rows by cell ONCE; the cell
        # aggregate below then needs no exchange of its own (partial+final
        # agg over the already-clustered input) and the cells->rows join is
        # co-partitioned on both sides. Catalyst's ReuseExchange dedupes the
        # repartition across the union branches.
        binned = binned.repartition("cx", "cy")
        cells = binned.groupBy("cx", "cy").agg(
            F.count(F.lit(1)).alias("cell_rows"),
            F.sum("num").alias("cell_num"),
            (F.sum(F.col("x") * F.col("num")) / F.sum("num")).alias("wx"),
            (F.sum(F.col("y") * F.col("num")) / F.sum("num")).alias("wy"),
        )
        merged = (F.col("cell_rows") > 1) & (F.col("cell_num") >= F.lit(o.min_points))
        cid = _packed_cell(F.col("cx"), F.col("cy")) * F.lit(32) + F.lit(
            z + 1 + n_points
        )
        cells = cells.select(
            "cx", "cy", merged.alias("merged"), cid.alias("cid"), "cell_num", "wx", "wy"
        )

        joined = binned.join(cells, ["cx", "cy"], "left")

        # ONE materialization per level carries all three products — the
        # parent-pointer update of level z+1, the pass-through rows, and the
        # new cluster rows — discriminated by `rk`; the products are cheap
        # filters over the checkpointed frame (no re-execution, no extra job)
        rows_part = joined.select(
            "x",
            "y",
            "src",
            F.when(F.col("merged"), F.col("cid")).otherwise(F.col("parent")).alias(
                "parent"
            ),
            "num",
            "props",
            F.coalesce(F.col("merged"), F.lit(False)).alias("merged"),
            F.lit(0).alias("rk"),
        )
        clusters_part = (
            cells.filter("merged")
            .select(
                F.col("wx").alias("x"),
                F.col("wy").alias("y"),
                F.col("cid").alias("src"),
                F.lit(-1).cast("long").alias("parent"),
                F.col("cell_num").alias("num"),
                F.lit(None).cast("string").alias("props"),
                F.lit(True).alias("merged"),
                F.lit(1).alias("rk"),
            )
        )
        combined = _window_ckpt(
            rows_part.unionByName(clusters_part), f"ctree/z={z:02d}",
            o.max_zoom - z + 1,
        )
        # level z+1 with parent pointers filled in (children drill-down)
        trees[z + 1] = _widen(
            combined.filter(F.col("rk") == 0).select(*narrow_cols), n_points
        )
        # level z frontier: non-merged rows keep their original parent (the
        # when() above only rewrites merged rows) + the new cluster rows
        frontier = combined.filter(
            (F.col("rk") == 1) | (~F.col("merged"))
        ).select(*narrow_cols)
        trees[z] = _widen(frontier, n_points)


_NARROW_COLS = ["x", "y", "src", "parent", "num", "props"]
_BATCH_SCHEMA = (
    "level int, fr boolean, x double, y double, src long, parent long, "
    "num long, props string"
)


def _make_level_kernel(levels: list, o: ClusterOptions, n_points: int):
    """Partition-local kernel running `levels` (descending zooms) of grid
    clustering over one anchor-partition's rows.

    Safe because cells nest: floor(q/(2^m*r)) == floor(floor(q/r)/2^m), so
    every cell of every level in the batch lies inside one anchor cell at
    the batch's coarsest zoom, and a cluster's weighted centroid stays
    inside the cell it merged in — no cell ever spans two partitions. (An
    ulp-edge centroid can land on a cell boundary and split a cell into two
    finer clusters — within grid mode's documented 'finer, never coarser'
    contract.)

    Property map/reduce (reference cluster-tile-index.ts:416-437): when
    reduce_fn is set, each merged cell folds its members' mapped properties
    — point rows map their raw tags JSON (carried in `props`), cluster rows
    contribute their already-folded props. The fold touches only rows that
    merge this level (pure numpy otherwise). Grid mode is order-free, so
    the fold order within a cell is unspecified: reduce must be commutative
    and associative — the same algebraic contract that makes any
    distributed fold (and this engine's 'finer, never coarser' clustering)
    well-defined. The reference folds in kdbush visit order instead; for
    non-commutative reduces only exact mode reproduces it."""
    radius, extent, min_points = o.radius, o.extent, o.min_points
    map_fn, reduce_fn = o.map_fn, o.reduce_fn

    def kern(it):
        import numpy as np
        import pandas as pd

        parts = [p for p in it]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        cap = int(os.environ.get("SPARK_GRAFT_CLUSTER_MAX_PARTITION_ROWS", "100000000"))
        if len(pdf) > cap:
            raise RuntimeError(
                f"grid-cluster anchor partition holds {len(pdf)} rows "
                f"(> {cap}); the batched kernel buffers whole partitions and "
                "hash repartitioning cannot split one hot anchor cell — "
                "lower SPARK_GRAFT_CLUSTER_LEVEL_BATCH / "
                "SPARK_GRAFT_CLUSTER_LEVEL_BATCH_TAIL (finer anchors per "
                "batch) or set SPARK_GRAFT_CLUSTER_LEVEL_MODE=column (the "
                "partial-agg engine, which never buffers a partition); raise "
                "SPARK_GRAFT_CLUSTER_MAX_PARTITION_ROWS only if the executor "
                "heap genuinely fits the batch"
            )
        x = pdf["x"].to_numpy(np.float64)
        y = pdf["y"].to_numpy(np.float64)
        src = pdf["src"].to_numpy(np.int64)
        parent = pdf["parent"].to_numpy(np.int64)
        num = pdf["num"].to_numpy(np.int64)
        props = pdf["props"].to_numpy(dtype=object)
        props[pd.isna(props)] = None

        def _mapped(k):
            import json

            if num[k] > 1:  # cluster: already-folded props (fresh dict)
                return None if props[k] is None else json.loads(props[k])
            raw = None if props[k] is None else json.loads(props[k])
            return map_fn(raw) if map_fn is not None else raw

        for z in levels:
            r = radius / (extent * (2.0 ** z))
            # identical float math to the Column path: fround then bin
            cx = np.floor(x.astype(np.float32).astype(np.float64) / r)
            cy = np.floor(y.astype(np.float32).astype(np.float64) / r)
            key = (cx.astype(np.int64) + _CELL_OFF) * np.int64(1 << 28) + (
                cy.astype(np.int64) + _CELL_OFF
            )
            uniq, inv, counts = np.unique(
                key, return_inverse=True, return_counts=True
            )
            cell_num = np.bincount(inv, weights=num.astype(np.float64)).astype(
                np.int64
            )
            merged_cell = (counts > 1) & (cell_num >= min_points)
            row_merged = merged_cell[inv]
            cid_cell = uniq * np.int64(32) + np.int64(z + 1 + n_points)
            # finalized level z+1: parent filled in for rows that merge
            # (yielded piecewise — no whole-output pd.concat copy)
            yield pd.DataFrame(
                {
                    "level": np.full(x.size, z + 1, np.int32),
                    "fr": np.zeros(x.size, bool),
                    "x": x,
                    "y": y,
                    "src": src,
                    "parent": np.where(row_merged, cid_cell[inv], parent),
                    "num": num,
                    "props": props,
                }
            )
            # next frontier: pass-through rows + new weighted-centroid clusters
            m = merged_cell
            n_new = int(m.sum())
            cprops = np.full(n_new, None, dtype=object)
            if reduce_fn is not None and n_new:
                import json

                order = np.argsort(inv, kind="stable")
                groups = np.split(order, np.cumsum(counts)[:-1])
                for out_i, ci in enumerate(np.flatnonzero(m)):
                    acc = None
                    for k in groups[ci]:
                        mv = _mapped(k)
                        if acc is None:
                            # clone before folding in place (the reference
                            # clones the first mapped value the same way)
                            acc = dict(mv) if isinstance(mv, dict) else mv
                        else:
                            reduce_fn(acc, mv)
                    cprops[out_i] = None if acc is None else json.dumps(acc)
            wx = np.bincount(inv, weights=x * num)[m] / cell_num[m]
            wy = np.bincount(inv, weights=y * num)[m] / cell_num[m]
            keep = ~row_merged
            x = np.concatenate([x[keep], wx])
            y = np.concatenate([y[keep], wy])
            src = np.concatenate([src[keep], cid_cell[m]])
            parent = np.concatenate(
                [parent[keep], np.full(n_new, -1, np.int64)]
            )
            num = np.concatenate([num[keep], cell_num[m]])
            props = np.concatenate([props[keep], cprops])
        yield pd.DataFrame(
            {
                "level": np.full(x.size, levels[-1], np.int32),
                "fr": np.ones(x.size, bool),
                "x": x,
                "y": y,
                "src": src,
                "parent": parent,
                "num": num,
                "props": props,
            }
        )

    return kern


def _batched_levels(
    frontier: DataFrame,
    trees: dict[int, DataFrame],
    o: ClusterOptions,
    n_points: int,
    workdir: Optional[str],
) -> None:
    """Batched engine: ONE anchor-cell exchange + ONE materialization per
    level batch (two-tier plan: k-level head, k_tail-level tail batches,
    see `batch_plan`) instead of per zoom — the serial barrier count is
    what a bandwidth-bound 100 TB loop actually pays for.

    Skew stays bounded without AQE help: a partition's work is linear in its
    rows; batch 1 anchors only k-1 levels below max_zoom (dense corpora
    still span many anchors there), and every later batch's per-anchor row
    count is capped at ~4^k_tail * min_points by the previous batch's
    frontier collapse (see batch_plan)."""
    spark = frontier.sparkSession
    # the kernel buffers whole partitions anyway, so cross Arrow in big
    # batches: fewer JVM->pandas conversions and concat pieces per task
    batch_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old_batch = spark.conf.get(batch_key, None)
    spark.conf.set(
        batch_key, os.environ.get("SPARK_GRAFT_CLUSTER_ARROW_BATCH", "262144")
    )
    try:
        parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        _run_batches(frontier, trees, o, n_points, workdir, batch_plan(o, parts))
    finally:
        if old_batch is None:
            spark.conf.unset(batch_key)
        else:
            spark.conf.set(batch_key, old_batch)


def batch_plan(o: ClusterOptions, shuffle_partitions: int) -> list:
    """Group the zoom levels (descending) into GEOMETRIC exchange batches:
    fixed chunks of k levels, each batch anchored (by `_run_batches`) at its
    OWN coarsest zoom.

    Why not one deep batch anchored at a coarse z_floor (the round-2 plan):
    a single z_floor anchor cell is ~10^2 km wide at default options, so a
    dense-city corpus lands most raw points in ONE anchor partition and one
    task then runs every level of the batch over most of the data — hash
    partitioning by anchor key cannot split that hot cell. The two-tier
    plan bounds skew structurally instead:

    * batch 1 spans k levels (default 4), anchoring at max_zoom-k+1 — fine
      enough that even a dense city spans many anchor cells (the data-heavy
      top of the pyramid keeps its parallelism). Only this batch ever sees
      RAW points, so only its depth is skew-sensitive;
    * every later batch's incoming frontier is already collapsed to at most
      ~min_points rows per cell of the PREVIOUS batch's coarsest zoom, so a
      tail batch spanning d levels holds at most ~4^d * min_points rows per
      anchor NO MATTER how skewed the corpus is — the bound is the cell
      nesting itself, not a data property. That lets tail batches run
      deeper: k_tail levels each (default 8 → ≤ 4^8*min_points ≈ 1.3e5 rows
      per anchor at min_points=2, still a sub-second partition-local numpy
      workload).

    Barriers: 1 + ceil((levels-k)/k_tail) — 3 at the default z16 pyramid
    (vs 2 for the skew-unsafe round-2 plan and 5 for uniform k=4 chunks);
    all barriers after the first shuffle a collapsed (cell-bounded)
    frontier, so added wall-clock is per-barrier fixed cost, not volume.

    ``SPARK_GRAFT_CLUSTER_LEVEL_BATCH`` overrides k (and, when set without
    the tail var, k_tail too — the round-2 escape hatch stays one knob);
    ``SPARK_GRAFT_CLUSTER_LEVEL_BATCH_TAIL`` overrides k_tail alone.
    """
    zs = list(range(o.max_zoom, o.min_zoom - 1, -1))
    k_env = os.environ.get("SPARK_GRAFT_CLUSTER_LEVEL_BATCH")
    k = max(1, int(k_env)) if k_env else 4
    k_tail = max(
        1, int(os.environ.get("SPARK_GRAFT_CLUSTER_LEVEL_BATCH_TAIL", k_env or "8"))
    )
    head, tail = zs[:k], zs[k:]
    return [head] + [tail[i : i + k_tail] for i in range(0, len(tail), k_tail)]


def _run_batches(
    frontier: DataFrame,
    trees: dict[int, DataFrame],
    o: ClusterOptions,
    n_points: int,
    workdir: Optional[str],
    batches: list,
) -> None:
    f32 = lambda c: c.cast("float").cast("double")  # noqa: E731 — JS fround
    for batch in batches:
        z_hi, z_lo = batch[0], batch[-1]
        r_lo = o.radius / (o.extent * (2.0 ** z_lo))
        anchored = frontier.withColumn(
            "acx", F.floor(f32(F.col("x")) / F.lit(r_lo))
        ).withColumn("acy", F.floor(f32(F.col("y")) / F.lit(r_lo)))
        out = (
            anchored.repartition("acx", "acy")
            .drop("acx", "acy")
            .mapInPandas(_make_level_kernel(batch, o, n_points), _BATCH_SCHEMA)
        )
        out = _checkpoint(out, workdir, f"ctree/zb={z_hi:02d}-{z_lo:02d}")
        for z in batch:
            trees[z + 1] = _widen(
                out.filter((F.col("level") == z + 1) & (~F.col("fr"))).select(
                    *_NARROW_COLS
                ),
                n_points,
            )
        frontier = out.filter(F.col("fr")).select(*_NARROW_COLS)
        trees[z_lo] = _widen(frontier, n_points)
