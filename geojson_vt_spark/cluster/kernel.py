"""Exact per-zoom greedy clustering kernel (reference parity path).

Mirrors /root/reference/src/cluster-tile-index.ts:378-458 ``cluster(tree, zoom)``:
scan rows in array order; each unvisited row absorbs its unvisited neighbors
within r; enough points -> weighted-centroid cluster row with positional id
encoding ``(pos << 5) + (zoom + 1) + numPointsTotal`` (:415); otherwise the row
(and, when it had neighbors, those neighbors) are copied through in neighbor
order. Property map/reduce folds in neighbor order (:416-437).

The greedy scan is inherently sequential (order-dependent by design,
:386-388) so this kernel runs on gathered numpy arrays; the distributed,
order-free scale path is cluster/grid.py. Neighbor queries here use a uniform
grid hash (cell side r, 3x3 probe) + the kdbush visit-rank ordering from
cluster/kdbush.py instead of a kd-tree: within(q, r) == distance mask sorted
by vrank.

Float semantics preserved: tree coords are float32-rounded
(cluster-tile-index.ts:127-128, :323 Float32Array) while the flat data keeps
full float64 (weighted centroids :440); distances compare f32-quantized
candidates against f64 query points in f64 arithmetic, exactly like JS.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

from .kdbush import visit_ranks


@dataclass
class Level:
    """One zoom level of the cluster hierarchy (reference: trees[z] flatData,
    stride 6/7). Arrays are parallel; ``props`` only populated with reduce."""

    x: np.ndarray  # f64 "flatData" coords (full precision centroids)
    y: np.ndarray
    qx: np.ndarray  # f64 values of the f32-rounded tree coords (query space)
    qy: np.ndarray
    src: np.ndarray  # i64: source point index (singletons) / cluster id
    parent: np.ndarray  # i64, -1 = none
    num: np.ndarray  # i64 point counts
    props: list = field(default_factory=list)  # per-row dict|None (reduce mode)
    vrank: Optional[np.ndarray] = None  # kdbush visit order (lazily computed)

    def __len__(self) -> int:
        return len(self.x)

    def ensure_vrank(self, node_size: int) -> np.ndarray:
        if self.vrank is None:
            self.vrank = visit_ranks(self.qx, self.qy, node_size)
        return self.vrank

    def copy(self) -> "Level":
        return Level(
            self.x.copy(),
            self.y.copy(),
            self.qx.copy(),
            self.qy.copy(),
            self.src.copy(),
            self.parent.copy(),
            self.num.copy(),
            list(self.props),
            None if self.vrank is None else self.vrank.copy(),
        )


def initial_level(px: np.ndarray, py: np.ndarray) -> Level:
    """Reference createIndex: initial rows are the points with coords
    fround-ed (cluster-tile-index.ts:122-139)."""
    n = len(px)
    q = np.asarray(px, dtype=np.float32).astype(np.float64)
    qy = np.asarray(py, dtype=np.float32).astype(np.float64)
    return Level(
        x=q.copy(),
        y=qy.copy(),
        qx=q,
        qy=qy,
        src=np.arange(n, dtype=np.int64),
        parent=np.full(n, -1, dtype=np.int64),
        num=np.ones(n, dtype=np.int64),
        props=[None] * n,
    )


class _Grid:
    """Uniform grid hash over the level's f32 tree coords, cell side r."""

    def __init__(self, level: Level, r: float):
        self.r = r
        self.qx = level.qx
        self.qy = level.qy
        cx = np.floor(self.qx / r).astype(np.int64)
        cy = np.floor(self.qy / r).astype(np.int64)
        self.cells: dict = {}
        for i in range(len(cx)):
            self.cells.setdefault((cx[i], cy[i]), []).append(i)
        self.cells = {k: np.asarray(v, dtype=np.int64) for k, v in self.cells.items()}

    def candidates(self, xq: float, yq: float) -> np.ndarray:
        cx = int(np.floor(xq / self.r))
        cy = int(np.floor(yq / self.r))
        found = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                got = self.cells.get((cx + dx, cy + dy))
                if got is not None:
                    found.append(got)
        if not found:
            return np.empty(0, dtype=np.int64)
        return np.concatenate(found)

    def within_sorted(self, xq: float, yq: float, vrank: np.ndarray) -> np.ndarray:
        """Indices with dist(tree_coord, q) <= r, in kdbush visit order."""
        cand = self.candidates(xq, yq)
        if len(cand) == 0:
            return cand
        dx = self.qx[cand] - xq
        dy = self.qy[cand] - yq
        hit = cand[dx * dx + dy * dy <= self.r * self.r]
        return hit[np.argsort(vrank[hit], kind="stable")]

    def any_pair_within(self) -> bool:
        for (cx, cy), idxs in self.cells.items():
            if len(idxs) > 1:
                return True
            for dx, dy in ((1, -1), (1, 0), (1, 1), (0, 1)):  # forward half-probe
                other = self.cells.get((cx + dx, cy + dy))
                if other is None:
                    continue
                ddx = self.qx[other] - self.qx[idxs[0]]
                ddy = self.qy[other] - self.qy[idxs[0]]
                if np.any(ddx * ddx + ddy * ddy <= self.r * self.r):
                    return True
        return False


def cluster_pass(
    level: Level,
    zoom: int,
    radius: float,
    extent: int,
    min_points: int,
    n_points: int,
    node_size: int,
    points_tags: list,
    map_fn: Optional[Callable],
    reduce_fn: Optional[Callable],
) -> Level:
    """One zoom step: consume ``level`` (= trees[zoom+1]); return trees[zoom].
    Mutates ``level.parent`` in place (the reference writes parent pointers
    into the input tree's flat data, cluster-tile-index.ts:427)."""
    r = radius / (extent * (2.0 ** zoom))
    n = len(level)
    grid = _Grid(level, r)

    if not grid.any_pair_within():
        # nothing can merge or reorder: the pass is the identity
        return level.copy()

    vrank = level.ensure_vrank(node_size)
    x, y, qx, qy = level.x, level.y, level.qx, level.qy
    src, parent, num, props = level.src, level.parent, level.num, level.props
    last = np.full(n, np.inf)

    def map_row(k: int, clone: bool = False):
        if num[k] > 1:
            p = props[k]
            return dict(p) if clone and p is not None else p
        original = points_tags[src[k]]
        result = map_fn(original) if map_fn is not None else original
        if clone and result is original and result is not None:
            return dict(result)
        return result

    ox: list = []
    oy: list = []
    osrc: list = []
    oparent: list = []
    onum: list = []
    oprops: list = []

    def emit_copy(k: int) -> None:
        ox.append(x[k])
        oy.append(y[k])
        osrc.append(src[k])
        oparent.append(parent[k])
        onum.append(num[k])
        oprops.append(props[k])

    for i in range(n):
        if last[i] <= zoom:
            continue
        last[i] = zoom

        neigh = grid.within_sorted(x[i], y[i], vrank)
        num_origin = int(num[i])
        numpts = num_origin
        for k in neigh:
            if last[k] > zoom:
                numpts += int(num[k])

        if numpts > num_origin and numpts >= min_points:
            wx = x[i] * num_origin
            wy = y[i] * num_origin
            cid = (i << 5) + (zoom + 1) + n_points
            cprops = None
            for k in neigh:
                if last[k] <= zoom:
                    continue
                last[k] = zoom
                wx += x[k] * num[k]
                wy += y[k] * num[k]
                parent[k] = cid
                if reduce_fn is not None:
                    if cprops is None:
                        cprops = map_row(i, clone=True)
                    reduce_fn(cprops, map_row(k))
            parent[i] = cid
            ox.append(wx / numpts)
            oy.append(wy / numpts)
            osrc.append(cid)
            oparent.append(-1)
            onum.append(numpts)
            oprops.append(cprops)
        else:
            emit_copy(i)
            if numpts > 1:
                for k in neigh:
                    if last[k] <= zoom:
                        continue
                    last[k] = zoom
                    emit_copy(k)

    nx = np.asarray(ox, dtype=np.float64)
    ny = np.asarray(oy, dtype=np.float64)
    return Level(
        x=nx,
        y=ny,
        qx=nx.astype(np.float32).astype(np.float64),
        qy=ny.astype(np.float32).astype(np.float64),
        src=np.asarray(osrc, dtype=np.int64),
        parent=np.asarray(oparent, dtype=np.int64),
        num=np.asarray(onum, dtype=np.int64),
        props=oprops,
    )
