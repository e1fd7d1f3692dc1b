"""KDBush-compatible arrangement + visit-rank ordering.

The reference clusters with a static kd-tree (kdbush, the public ISC-licensed
flat kd-tree used by /root/reference/src/cluster-tile-index.ts:323
``createTree``: Float32Array coords, nodeSize leaves, Floyd-Rivest selection).
Result ORDER of its `within`/`range` queries is semantic in the reference:

  * cluster property `reduce` folds in neighbor order
    (/root/reference/src/cluster-tile-index.ts:416-437),
  * below-minPoints neighbors are appended to the next zoom's array in
    neighbor order (:448-455), which feeds the positional cluster-id encoding
    (:415), which appears verbatim in the golden fixtures,
  * `getTile`/`getClusters` emit features in range-query order.

Key observation that lets a DataFrame engine reproduce this WITHOUT a tree:
kdbush's stack-based traversal (node, then right subtree, then left subtree;
leaf blocks in ascending array position) visits candidates in a FIXED,
query-independent permutation of the arrangement. Pruning only removes whole
subtrees, never reorders survivors. So:

    within(q, r)  ==  {p : dist(p, q) <= r}   sorted by visit-rank
    range(bbox)   ==  {p : p inside bbox}      sorted by visit-rank

We therefore (1) reproduce the kdbush *arrangement* (the array permutation
after Floyd-Rivest median partitioning - sequential, but only run per
already-partitioned group), (2) compute each element's visit rank, and
(3) materialize the rank as an ordinary column. Every query surface then
becomes a Catalyst-friendly range predicate + ORDER BY vrank - the kd-tree's
only semantic contribution at query time is an ordering key.
"""

from __future__ import annotations

import math

import numpy as np


def _select(ids: np.ndarray, coords: np.ndarray, k: int, left: int, right: int, axis: int) -> None:
    """Floyd-Rivest selection: partially sort ids/coords so coords[2*k+axis]
    is the k-th value in [left, right]. Mirrors kdbush's select() exactly
    (same swap sequence => same arrangement of ties and leaf-block order)."""
    while right > left:
        if right - left > 600:
            n = right - left + 1
            m = k - left + 1
            z = math.log(n)
            s = 0.5 * math.exp(2 * z / 3)
            sd = 0.5 * math.sqrt(z * s * (n - s) / n) * (-1.0 if m - n / 2 < 0 else 1.0)
            new_left = max(left, int(math.floor(k - m * s / n + sd)))
            new_right = min(right, int(math.floor(k + (n - m) * s / n + sd)))
            _select(ids, coords, k, new_left, new_right, axis)

        t = coords[2 * k + axis]
        i = left
        j = right

        _swap(ids, coords, left, k)
        if coords[2 * right + axis] > t:
            _swap(ids, coords, left, right)

        while i < j:
            _swap(ids, coords, i, j)
            i += 1
            j -= 1
            while coords[2 * i + axis] < t:
                i += 1
            while coords[2 * j + axis] > t:
                j -= 1

        if coords[2 * left + axis] == t:
            _swap(ids, coords, left, j)
        else:
            j += 1
            _swap(ids, coords, j, right)

        if j <= k:
            left = j + 1
        if k <= j:
            right = j - 1


def _swap(ids: np.ndarray, coords: np.ndarray, i: int, j: int) -> None:
    ids[i], ids[j] = ids[j], ids[i]
    coords[2 * i], coords[2 * j] = coords[2 * j], coords[2 * i]
    coords[2 * i + 1], coords[2 * j + 1] = coords[2 * j + 1], coords[2 * i + 1]


def _sort(ids: np.ndarray, coords: np.ndarray, node_size: int, left: int, right: int, axis: int) -> None:
    if right - left <= node_size:
        return
    m = (left + right) >> 1
    _select(ids, coords, m, left, right, axis)
    _sort(ids, coords, node_size, left, m - 1, 1 - axis)
    _sort(ids, coords, node_size, m + 1, right, 1 - axis)


def arrangement(x32: np.ndarray, y32: np.ndarray, node_size: int = 64) -> np.ndarray:
    """Return ids[pos] = original index stored at kd-array position pos,
    for float32 coords (kdbush is constructed with Float32Array in the
    reference, cluster-tile-index.ts:323)."""
    n = len(x32)
    ids = np.arange(n, dtype=np.int64)
    coords = np.empty(2 * n, dtype=np.float32)
    coords[0::2] = x32
    coords[1::2] = y32
    if n > 0:
        import sys

        old = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old, 64 + 2 * int(math.log2(n + 1)) * 4 + 1000))
        try:
            _sort(ids, coords, node_size, 0, n - 1, 0)
        finally:
            sys.setrecursionlimit(old)
    return ids


def visit_ranks_for_positions(n: int, node_size: int = 64) -> np.ndarray:
    """vrank_by_pos[pos] = visit order of kd-array position pos under the
    reference's stack traversal (node m, then right subtree, then left
    subtree; leaf blocks ascending)."""
    vrank = np.empty(n, dtype=np.int64)
    if n == 0:
        return vrank
    counter = 0
    stack = [(0, n - 1, 0)]
    while stack:
        left, right, axis = stack.pop()
        if right - left <= node_size:
            vrank[left : right + 1] = np.arange(counter, counter + right - left + 1)
            counter += right - left + 1
            continue
        m = (left + right) >> 1
        vrank[m] = counter
        counter += 1
        # push left first -> right popped (visited) first, like the reference
        if m - 1 >= left:
            stack.append((left, m - 1, 1 - axis))
        if m + 1 <= right:
            stack.append((m + 1, right, 1 - axis))
    return vrank


def visit_ranks(x: np.ndarray, y: np.ndarray, node_size: int = 64) -> np.ndarray:
    """vrank[i] for each ORIGINAL index i: query-result ordering key.

    Composition: ids = arrangement(...) maps position->original index;
    vrank_by_pos maps position->visit order; so vrank[ids[pos]] =
    vrank_by_pos[pos]."""
    x32 = np.asarray(x, dtype=np.float32)
    y32 = np.asarray(y, dtype=np.float32)
    ids = arrangement(x32, y32, node_size)
    by_pos = visit_ranks_for_positions(len(ids), node_size)
    vrank = np.empty(len(ids), dtype=np.int64)
    vrank[ids] = by_pos
    return vrank
