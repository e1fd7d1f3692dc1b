"""Spark row model for internal features and tile features.

A feature row is flat + Arrow-friendly: one `coords` array<double> (stride-3
[x,y,m] across all rings — the reference's flat-typed-array trick,
/root/reference/src/definitions.ts:81-83, mapped to columnar form), ring
offsets/metadata as parallel primitive arrays, and bbox as plain double
columns so Catalyst can push trivial accept/reject predicates down to the
scan without touching Python.

`okey` is the stable ordering key: [wcopy, fid, slice_idx...]. Tile feature
order in the reference is input order through wrap -> clip -> assembly; every
stage here preserves/extends okey and consumers sort by it.
"""

from __future__ import annotations

import json
from typing import Any, Iterable, Optional

import numpy as np
from pyspark.sql import types as T

from .functions.feature import make_feature, make_ring

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType(), False),
        T.StructField("x", T.IntegerType(), False),
        T.StructField("y", T.IntegerType(), False),
        T.StructField("okey", T.ArrayType(T.LongType(), False), False),
        T.StructField("id", T.StringType(), True),  # JSON-encoded (keeps str/num type)
        T.StructField("ftype", T.IntegerType(), False),
        T.StructField("tags", T.StringType(), True),  # JSON dict or null
        T.StructField("coords", T.ArrayType(T.DoubleType(), False), False),
        T.StructField("rlens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("rpoly", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("rsize", T.ArrayType(T.DoubleType(), False), False),
        T.StructField("rstart", T.ArrayType(T.DoubleType(), False), False),
        T.StructField("rend", T.ArrayType(T.DoubleType(), False), False),
        T.StructField("minx", T.DoubleType(), False),
        T.StructField("miny", T.DoubleType(), False),
        T.StructField("maxx", T.DoubleType(), False),
        T.StructField("maxy", T.DoubleType(), False),
    ]
)

TILE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType(), False),
        T.StructField("x", T.IntegerType(), False),
        T.StructField("y", T.IntegerType(), False),
        T.StructField("okey", T.ArrayType(T.LongType(), False), False),
        T.StructField("tf_type", T.IntegerType(), True),  # null = feature dropped
        T.StructField("tf_id", T.StringType(), True),  # JSON-encoded
        T.StructField("tf_tags", T.StringType(), True),  # JSON; null vs "{}" distinct
        T.StructField("tf_geom", T.StringType(), True),  # JSON int coords
        T.StructField("npoints", T.LongType(), False),
        T.StructField("nsimplified", T.LongType(), False),
        T.StructField("minx", T.DoubleType(), False),
        T.StructField("miny", T.DoubleType(), False),
        T.StructField("maxx", T.DoubleType(), False),
        T.StructField("maxy", T.DoubleType(), False),
    ]
)

REGISTRY_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType(), False),
        T.StructField("x", T.IntegerType(), False),
        T.StructField("y", T.IntegerType(), False),
        T.StructField("num_features", T.LongType(), False),
        T.StructField("num_points", T.LongType(), False),
        T.StructField("num_simplified", T.LongType(), False),
        T.StructField("has_source", T.BooleanType(), False),
    ]
)


def feature_to_row(feature: dict, z: int, x: int, y: int, okey: list) -> dict:
    rings = feature["rings"]
    coords = (
        np.concatenate([r["pts"] for r in rings]) if rings else np.empty(0, np.float64)
    )
    return {
        "z": z,
        "x": x,
        "y": y,
        "okey": list(okey),
        "id": None if feature["id"] is None else json.dumps(feature["id"]),
        "ftype": feature["type"],
        "tags": None if feature["tags"] is None else json.dumps(feature["tags"]),
        "coords": coords,
        "rlens": np.array([len(r["pts"]) // 3 for r in rings], dtype=np.int32),
        "rpoly": np.array([r["poly"] for r in rings], dtype=np.int32),
        # absent start/end (point rings) encode as 0.0 — nothing downstream
        # reads them for points, and NaN would become Arrow null in list cols
        "rsize": np.array([r["size"] for r in rings], dtype=np.float64),
        "rstart": np.array(
            [0.0 if r["start"] is None else r["start"] for r in rings], np.float64
        ),
        "rend": np.array(
            [0.0 if r["end"] is None else r["end"] for r in rings], np.float64
        ),
        "minx": feature["minx"],
        "miny": feature["miny"],
        "maxx": feature["maxx"],
        "maxy": feature["maxy"],
    }


def row_to_feature(row: dict) -> dict:
    """Inverse of feature_to_row; `row` is a plain dict of column values."""
    coords = np.asarray(row["coords"], dtype=np.float64)
    rlens = np.asarray(row["rlens"], dtype=np.int64)
    rpoly = row["rpoly"]
    rsize = row["rsize"]
    rstart = row["rstart"]
    rend = row["rend"]
    rings = []
    off = 0
    for i, ln in enumerate(rlens):
        n = int(ln) * 3
        rings.append(
            make_ring(
                coords[off : off + n],
                int(rpoly[i]),
                float(rsize[i]),
                float(rstart[i]),
                float(rend[i]),
            )
        )
        off += n
    fid = row["id"]
    tags = row["tags"]
    # bbox comes straight from the row (computed at feature creation and
    # carried as plain columns) — no recompute on the hot path
    return {
        "id": None if fid is None else json.loads(fid),
        "type": int(row["ftype"]),
        "rings": rings,
        "tags": None if tags is None else json.loads(tags),
        "minx": row["minx"],
        "miny": row["miny"],
        "maxx": row["maxx"],
        "maxy": row["maxy"],
    }


class _JsonEncoder(json.JSONEncoder):
    def default(self, o: Any):
        if isinstance(o, np.ndarray):
            return o.tolist()
        if isinstance(o, (np.integer,)):
            return int(o)
        if isinstance(o, (np.floating,)):
            return float(o)
        return super().default(o)


def tile_feature_to_json(tf: dict) -> str:
    return json.dumps(tf["geometry"], cls=_JsonEncoder, separators=(",", ":"))


def tile_feature_from_row(row: dict) -> dict:
    tf = {
        "geometry": json.loads(row["tf_geom"]),
        "type": int(row["tf_type"]),
        "tags": None if row["tf_tags"] is None else json.loads(row["tf_tags"]),
    }
    if row["tf_id"] is not None:
        tf["id"] = json.loads(row["tf_id"])
    return tf
