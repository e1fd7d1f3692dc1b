"""Douglas-Peucker square-distance annotation.

Semantics: /root/reference/src/simplify.ts:8-78. The algorithm does NOT drop
vertices — it writes each vertex's maximum square segment distance into the
third slot of the flat [x, y, m] array; per-zoom filtering later keeps only
vertices with m > sqTolerance (src/tile.ts:154). Run once at convert time —
this is the reference's key optimization (annotate once, threshold per zoom).

Implementation notes (fresh numpy design, not a transliteration):
  * recursion -> explicit worklist (the reference also de-recursed the
    degenerate case via the mid-pivot tie-break, src/simplify.ts:28-37);
  * per-range segment distances are computed vectorized;
  * the pivot choice must match the reference bit-for-bit, including the
    `d === maxSqDist` tie-break toward the middle. Positions that can affect
    the scan state are exactly those where d >= running-max; we extract that
    (usually tiny) candidate set vectorized and replay only it sequentially.
"""

from __future__ import annotations

import numpy as np


def _sq_seg_dist_vec(px, py, ax, ay, bx, by):
    """Square distance of points (px,py) to segment (a,b).
    Same operation order as src/simplify.ts:57-78."""
    dx = bx - ax
    dy = by - ay
    if dx != 0.0 or dy != 0.0:
        t = ((px - ax) * dx + (py - ay) * dy) / (dx * dx + dy * dy)
        x = np.where(t > 1.0, bx, np.where(t > 0.0, ax + dx * t, ax))
        y = np.where(t > 1.0, by, np.where(t > 0.0, ay + dy * t, ay))
    else:
        x = np.full_like(px, ax)
        y = np.full_like(py, ay)
    ddx = px - x
    ddy = py - y
    return ddx * ddx + ddy * ddy


def simplify(coords: np.ndarray, first: int, last: int, sq_tolerance: float) -> None:
    """Annotate coords[first..last] (flat stride-3, modified in place)."""
    stack = [(first, last)]
    while stack:
        first, last = stack.pop()
        if last - first <= 3:
            continue
        idxs = np.arange(first + 3, last, 3)
        px = coords[idxs]
        py = coords[idxs + 1]
        d = _sq_seg_dist_vec(
            px, py, coords[first], coords[first + 1], coords[last], coords[last + 1]
        )
        mx = d.max()
        if mx <= sq_tolerance:
            continue

        # exact replay of the reference scan over state-changing positions only
        runmax = np.maximum.accumulate(
            np.concatenate((np.array([sq_tolerance]), d))
        )[:-1]
        cand = np.nonzero(d >= runmax)[0]

        mid = first + ((last - first) >> 1)
        min_pos_to_mid = last - first
        max_sq_dist = sq_tolerance
        index = -1
        for c in cand:
            i = int(idxs[c])
            dc = d[c]
            if dc > max_sq_dist:
                index = i
                max_sq_dist = dc
            elif dc == max_sq_dist:
                pos_to_mid = abs(i - mid)
                if pos_to_mid < min_pos_to_mid:
                    index = i
                    min_pos_to_mid = pos_to_mid

        coords[index + 2] = max_sq_dist
        if index - first > 3:
            stack.append((first, index))
        if last - index > 3:
            stack.append((index, last))
