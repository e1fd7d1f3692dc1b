"""GeoJSON -> internal projected features (O1-O6).

Semantics: /root/reference/src/convert.ts — projection to the Web-Mercator unit
square, per-ring shoelace-area / length metrics, Douglas-Peucker annotation at
the base (maxZoom) tolerance, GeometryCollection flattening (depth <= 1024),
id promotion/generation, null/empty-geometry drops.

These are plain-python kernels that run *inside* Arrow-batched UDFs
(sources/documents.py feeds batches of GeoJSON payload strings); they are also
used directly by the driver for small fixture inputs.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

from ..config import Options
from .feature import (
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    make_feature,
    make_ring,
)
from .projection import project_x_np, project_y_np
from .simplify import simplify

MAX_GEOMETRY_COLLECTION_DEPTH = 1024

_VALID_TYPES = {
    "Point",
    "MultiPoint",
    "LineString",
    "MultiLineString",
    "Polygon",
    "MultiPolygon",
}


def convert_geojson(data: dict, options: Options) -> list:
    """Root dispatch (src/convert.ts:14-31): FeatureCollection | Feature |
    bare geometry."""
    features: list = []
    t = data.get("type")
    if t == "FeatureCollection":
        for i, f in enumerate(data.get("features", [])):
            _feature_to_internal(features, f, options, i)
    elif t == "Feature":
        _feature_to_internal(features, data, options, None)
    else:
        _feature_to_internal(
            features, {"type": "Feature", "geometry": data, "properties": None}, options, None
        )
    return features


def _feature_to_internal(
    features: list, geojson: dict, options: Options, index: Optional[int], depth: int = 0
) -> None:
    # GeometryCollection flattening is de-recursed (Python's recursion limit is
    # below the reference's 1024-depth guard); order preserved via LIFO with
    # reversed pushes.
    work = [(geojson, depth)]
    while work:
        geojson, depth = work.pop()
        geometry = geojson.get("geometry")
        if not geometry:
            continue
        if depth > MAX_GEOMETRY_COLLECTION_DEPTH:
            raise ValueError(
                "GeometryCollection nesting exceeds supported depth: "
                f"{MAX_GEOMETRY_COLLECTION_DEPTH}"
            )
        gtype = geometry.get("type")
        props = geojson.get("properties")

        if gtype == "GeometryCollection":
            work.extend(
                (
                    {
                        "id": geojson.get("id"),
                        "type": "Feature",
                        "geometry": geom,
                        "properties": props,
                    },
                    depth + 1,
                )
                for geom in reversed(geometry.get("geometries", []))
            )
            continue
        _convert_single(features, geojson, gtype, props, options, index)


def _convert_single(
    features: list,
    geojson: dict,
    gtype: str,
    props: Optional[dict],
    options: Options,
    index: Optional[int],
) -> None:
    coords = geojson["geometry"].get("coordinates")
    if not coords:
        return

    fid = _get_feature_id(geojson, options, index)
    tolerance = options.base_sq_tolerance

    if gtype == "Point":
        ring = _project_points([coords])
        features.append(make_feature(fid, POINT, [ring], props))
    elif gtype == "MultiPoint":
        ring = _project_points(coords)
        features.append(make_feature(fid, MULTIPOINT, [ring], props))
    elif gtype == "LineString":
        ring = _convert_ring(coords, tolerance, is_polygon=False)
        features.append(make_feature(fid, LINESTRING, [ring], props))
    elif gtype == "MultiLineString":
        if options.line_metrics:
            # explode so per-line metrics can be tracked (src/convert.ts:123-129)
            for line in coords:
                ring = _convert_ring(line, tolerance, is_polygon=False)
                features.append(make_feature(fid, LINESTRING, [ring], props))
        else:
            rings = [_convert_ring(line, tolerance, False) for line in coords]
            features.append(make_feature(fid, MULTILINESTRING, rings, props))
    elif gtype == "Polygon":
        rings = [_convert_ring(r, tolerance, True) for r in coords]
        features.append(make_feature(fid, POLYGON, rings, props))
    elif gtype == "MultiPolygon":
        rings = []
        for pi, polygon in enumerate(coords):
            rings.extend(
                _convert_ring(r, tolerance, True, poly=pi) for r in polygon
            )
        features.append(make_feature(fid, MULTIPOLYGON, rings, props))
    else:
        raise ValueError("Input data is not a valid GeoJSON object.")


def _get_feature_id(geojson: dict, options: Options, index: Optional[int]) -> Any:
    # src/convert.ts:81-89
    if options.promote_id:
        props = geojson.get("properties")
        return props.get(options.promote_id) if props else None
    if options.generate_id:
        return index or 0
    return geojson.get("id")


def _xy(coords: list) -> np.ndarray:
    # robust to [x,y] / [x,y,alt] mixes (GeoJSON allows altitude)
    return np.array([(c[0], c[1]) for c in coords], dtype=np.float64)


def _project_points(coords: list) -> dict:
    arr = _xy(coords)
    out = np.zeros(arr.shape[0] * 3, dtype=np.float64)
    out[0::3] = project_x_np(arr[:, 0])
    out[1::3] = project_y_np(arr[:, 1])
    return make_ring(out)


def _convert_ring(coords: list, tolerance: float, is_polygon: bool, poly: int = 0) -> dict:
    """Project one ring/line, accumulate size, DP-annotate (src/convert.ts:153-183).

    `size` accumulation is kept *sequential* (cumsum) so float rounding matches
    the reference's `size +=` loop exactly — it feeds the tiny-feature cull
    threshold and lineMetrics ratios.
    """
    arr = _xy(coords)
    n = arr.shape[0]
    xs = project_x_np(arr[:, 0])
    ys = project_y_np(arr[:, 1])
    pts = np.zeros(n * 3, dtype=np.float64)
    pts[0::3] = xs
    pts[1::3] = ys

    if n > 1:
        if is_polygon:
            terms = (xs[:-1] * ys[1:] - xs[1:] * ys[:-1]) / 2.0  # shoelace
        else:
            dx = xs[1:] - xs[:-1]
            dy = ys[1:] - ys[:-1]
            terms = np.sqrt(dx * dx + dy * dy)
        size = float(np.cumsum(terms)[-1])
    else:
        size = 0.0

    last = len(pts) - 3
    pts[2] = 1.0
    if tolerance > 0:
        simplify(pts, 0, last, tolerance)
    pts[last + 2] = 1.0

    size = abs(size)
    return make_ring(pts, poly=poly, size=size, start=0.0, end=size)
