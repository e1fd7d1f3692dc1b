"""Internal feature representation used inside vectorized UDF kernels.

A feature is a plain dict (cheap to build inside Arrow batches):

    {
      "id":    str | int | float | None,
      "type":  int,            # 1..6, see constants below
      "rings": [Ring, ...],    # geometry as a list of rings
      "tags":  dict | None,
      "minx"/"miny"/"maxx"/"maxy": float,
    }

    Ring = {
      "pts":  np.ndarray float64, flat stride-3 [x, y, m, ...]
              (m = Douglas-Peucker square distance; 1.0 marks forced points),
      "poly": int,              # polygon index (MultiPolygon grouping), else 0
      "size": float,            # ring area (polygons) or length (lines); 0 for points
      "start": float | None,    # cumulative-length metrics (lineMetrics)
      "end":   float | None,
    }

This mirrors what the reference stores per feature
(/root/reference/src/definitions.ts:85-130 — flat stride-3 coordinate arrays with a
shoelace/length `size` per ring), but flattened so each feature round-trips to one
Arrow row of primitive arrays (see model.py) instead of nested JS objects.

Point/MultiPoint features hold exactly one ring whose pts are all points.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

POINT = 1
MULTIPOINT = 2
LINESTRING = 3
MULTILINESTRING = 4
POLYGON = 5
MULTIPOLYGON = 6

TYPE_NAMES = {
    POINT: "Point",
    MULTIPOINT: "MultiPoint",
    LINESTRING: "LineString",
    MULTILINESTRING: "MultiLineString",
    POLYGON: "Polygon",
    MULTIPOLYGON: "MultiPolygon",
}
TYPE_CODES = {v: k for k, v in TYPE_NAMES.items()}

# MVT-ish tile feature type emitted by tile assembly (src/definitions.ts:154-167)
TILE_POINT = 1
TILE_LINE = 2
TILE_POLYGON = 3


def make_ring(
    pts: Any,
    poly: int = 0,
    size: float = 0.0,
    start: Optional[float] = None,
    end: Optional[float] = None,
) -> dict:
    arr = np.asarray(pts, dtype=np.float64)
    return {"pts": arr, "poly": poly, "size": size, "start": start, "end": end}


def make_feature(fid: Any, ftype: int, rings: list, tags: Optional[dict]) -> dict:
    """Build a feature and compute its bbox.

    Matches the reference bbox rule (/root/reference/src/feature.ts:35-62):
    polygons contribute only their *outer* ring (first ring of each polygon)
    because inner rings are contained in it; everything else contributes all
    rings.
    """
    minx = miny = np.inf
    maxx = maxy = -np.inf
    outer_only = ftype in (POLYGON, MULTIPOLYGON)
    seen_poly: set = set()
    for i, ring in enumerate(rings):
        if outer_only:
            p = ring["poly"]
            if p in seen_poly:
                continue
            seen_poly.add(p)
        pts = ring["pts"]
        if pts.size:
            xs = pts[0::3]
            ys = pts[1::3]
            minx = min(minx, xs.min())
            miny = min(miny, ys.min())
            maxx = max(maxx, xs.max())
            maxy = max(maxy, ys.max())
    return {
        "id": fid,
        "type": ftype,
        "rings": rings,
        "tags": tags,
        "minx": float(minx),
        "miny": float(miny),
        "maxx": float(maxx),
        "maxy": float(maxy),
    }


def n_vertices(feature: dict) -> int:
    """Total vertex count of a feature (the tile numPoints signal,
    src/tile.ts:146-158 counts every source vertex)."""
    return sum(len(r["pts"]) // 3 for r in feature["rings"])
