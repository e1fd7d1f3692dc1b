"""Internal features -> GeoJSON export (O25).

Semantics: /root/reference/src/deconvert.ts:6-67 — inverse Web-Mercator
projection, id/properties preserved, geometry rebuilt per type (MultiPolygon
rings regrouped by polygon index).
"""

from __future__ import annotations

from .feature import (
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    TYPE_NAMES,
)
from .projection import unproject_x, unproject_y


def _unproject_pts(pts) -> list:
    return [
        [unproject_x(float(pts[i])), unproject_y(float(pts[i + 1]))]
        for i in range(0, len(pts), 3)
    ]


def geometry_to_geojson(feature: dict) -> dict:
    ftype = feature["type"]
    rings = feature["rings"]
    name = TYPE_NAMES[ftype]
    if ftype == POINT:
        return {"type": name, "coordinates": _unproject_pts(rings[0]["pts"])[0]}
    if ftype == MULTIPOINT:
        return {"type": name, "coordinates": _unproject_pts(rings[0]["pts"])}
    if ftype == LINESTRING:
        return {"type": name, "coordinates": _unproject_pts(rings[0]["pts"])}
    if ftype in (MULTILINESTRING, POLYGON):
        return {"type": name, "coordinates": [_unproject_pts(r["pts"]) for r in rings]}
    if ftype == MULTIPOLYGON:
        polys: dict = {}
        for r in rings:
            polys.setdefault(r["poly"], []).append(_unproject_pts(r["pts"]))
        return {"type": name, "coordinates": [polys[k] for k in sorted(polys)]}
    raise ValueError(f"unknown feature type {ftype}")


def feature_to_geojson(feature: dict) -> dict:
    out = {
        "type": "Feature",
        "geometry": geometry_to_geojson(feature),
        "properties": feature["tags"],
    }
    if feature["id"] is not None:
        out["id"] = feature["id"]
    return out


def features_to_geojson(features: list) -> dict:
    return {
        "type": "FeatureCollection",
        "features": [feature_to_geojson(f) for f in features],
    }
