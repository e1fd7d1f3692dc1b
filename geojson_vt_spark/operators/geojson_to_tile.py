"""Single-tile fast path (O16).

Semantics: /root/reference/src/geojson-to-tile.ts:42-58 — convert, optional
wrap, optional clip to the tile bbox (+buffer), assemble + transform one tile,
no index.

Two surfaces:
  * ``geojson_to_tile`` — driver-side, exact reference parity (incl. the JS
    ``1 << z`` int32-shift semantics for out-of-range zooms, which the
    reference's weird-z tests rely on);
  * ``tile_from_features_df`` — the Spark shape: Catalyst bbox predicate on
    the plain bbox columns prunes rows *before* the Arrow clip/assemble
    kernel ever sees them (the scan reads only straddling candidates), then a
    single mapInPandas emits the tile's features. This is the
    "minimum slice" query used when the source is already a (huge) feature
    table: predicate pushdown + column pruning happen for free.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..config import Options
from ..functions.clip import AXIS_X, AXIS_Y, clip_features
from ..functions.convert import convert_geojson
from ..functions.tile import assemble_feature, transform_tile_feature
from ..functions.wrap import wrap_features
from ..model import FEATURE_SCHEMA, TILE_FEATURE_SCHEMA, row_to_feature, tile_feature_to_json


def _js_shl1(z) -> int:
    # JS `1 << z`: operand coerced to int32, shift count taken mod 32
    return 1 << (int(z) & 31)


def _transformed_features(features: list, z, x, y, options: Options) -> list:
    out = []
    for f in features:
        tf, _np, _ns = assemble_feature(f, z, options)
        if tf is None:
            continue
        tft = transform_tile_feature(tf, z, x, y, options.extent)
        tft["geometry"] = (
            tft["geometry"].tolist()
            if hasattr(tft["geometry"], "tolist")
            else [r.tolist() for r in tft["geometry"]]
        )
        out.append(tft)
    return out


def geojson_to_tile(
    data: dict,
    z,
    x,
    y,
    options: Optional[Options] = None,
    wrap: bool = False,
    clip: bool = False,
) -> dict:
    options = options or Options()
    features = convert_geojson(data, options)
    if wrap:
        features = [f for _w, f in wrap_features(features, options)]
    if clip or options.line_metrics:
        pow2 = _js_shl1(z)
        buffer = options.buffer / options.extent
        left = clip_features(features, pow2, x - buffer, x + 1 + buffer, AXIS_X, options)
        features = clip_features(left, pow2, y - buffer, y + 1 + buffer, AXIS_Y, options)
    if not features or not (0 <= int(z) <= 24 and float(z) == int(z)):
        return {"z": z, "x": x, "y": y, "features": []}
    return {
        "z": z,
        "x": x,
        "y": y,
        "features": _transformed_features(features, int(z), x, y, options),
    }


def tile_from_features_df(
    features_df: DataFrame, z: int, x: int, y: int, options: Optional[Options] = None
) -> DataFrame:
    """Distributed single-tile slice over a FEATURE_SCHEMA table.

    The bbox trivial accept/reject (clip.ts:29-35) is expressed as a Column
    predicate so Catalyst pushes it into the scan; the Arrow kernel only
    clips straddling rows.
    """
    options = options or Options()
    z2 = 1 << z
    buffer = options.buffer / options.extent
    k1x, k2x = (x - buffer) / z2, (x + 1 + buffer) / z2
    k1y, k2y = (y - buffer) / z2, (y + 1 + buffer) / z2

    pruned = features_df.filter(
        (F.col("maxx") >= F.lit(k1x))
        & (F.col("minx") <= F.lit(k2x))
        & (F.col("maxy") >= F.lit(k1y))
        & (F.col("miny") <= F.lit(k2y))
    )

    cols = [f.name for f in FEATURE_SCHEMA.fields]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json

        for pdf in batches:
            out = {f.name: [] for f in TILE_FEATURE_SCHEMA.fields}
            for row in pdf[cols].to_dict("records"):
                feat = row_to_feature(row)
                xs = clip_features([feat], z2, x - buffer, x + 1 + buffer, AXIS_X, options)
                ys = clip_features(xs, z2, y - buffer, y + 1 + buffer, AXIS_Y, options)
                for i, f in enumerate(ys):
                    tf, npts, nsimp = assemble_feature(f, z, options)
                    if tf is None:
                        continue
                    tft = transform_tile_feature(tf, z, x, y, options.extent)
                    out["z"].append(z)
                    out["x"].append(x)
                    out["y"].append(y)
                    out["okey"].append(list(row["okey"]) + [i])
                    out["tf_type"].append(tft["type"])
                    out["tf_id"].append(row["id"])
                    out["tf_tags"].append(
                        None if tft["tags"] is None else json.dumps(tft["tags"])
                    )
                    out["tf_geom"].append(tile_feature_to_json(tft))
                    out["npoints"].append(npts)
                    out["nsimplified"].append(nsimp)
                    out["minx"].append(row["minx"])
                    out["miny"].append(row["miny"])
                    out["maxx"].append(row["maxx"])
                    out["maxy"].append(row["maxy"])
            if out["z"]:
                yield pd.DataFrame(out)

    return pruned.mapInPandas(kernel, TILE_FEATURE_SCHEMA)
