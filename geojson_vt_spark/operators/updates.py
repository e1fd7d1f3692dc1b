"""Incremental source maintenance (O22 diff apply, O24 predicate filter).

Semantics: /root/reference/src/difference.ts:75-221 — removeAll / remove-by-id
/ add (replaces same id) / per-feature update (newGeometry -> reconvert+wrap;
property add/remove/removeAll), applied to ALL antimeridian copies of an id;
returns the affected feature set (old + new rows) used for tile invalidation.

Spark shape (MERGE INTO semantics, not a list rewrite):
  * remove/replace  -> broadcast semi/anti-join on the id column;
  * add             -> driver-side convert+wrap of the (small, driver-provided)
                       diff payload, unioned in;
  * update          -> semi-join collect of the touched rows (bounded by the
                       diff size x wrap copies), recomputed driver-side,
                       unioned back;
  * ordering        -> the reference appends adds/updates to the END of the
                       source array (difference.ts:104-131); we reproduce
                       source order with a monotonically increasing batch
                       prefix on `okey` so every downstream sort-by-okey sees
                       the same sequence.

The user predicate filter (O24, geojsonvt.ts:115-127) runs as an Arrow-batched
mapInPandas over the full source — the one place a user-supplied Python
callable touches every row — emitting only failing rows; removal is then an
id anti-join (all antimeridian copies of a failing id go together).
"""

from __future__ import annotations

import json
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import Options
from ..functions.convert import convert_geojson
from ..functions.deconvert import feature_to_geojson
from ..functions.wrap import wrap_features
from ..model import FEATURE_SCHEMA, feature_to_row, row_to_feature


def _convert_batch(
    spark: SparkSession, features: list, options: Options, batch: int
) -> Optional[DataFrame]:
    """convert+wrap a FeatureCollection of diff features into source rows with
    okey = [batch, position] (appended after every existing row)."""
    feats = convert_geojson({"type": "FeatureCollection", "features": features}, options)
    wrapped = wrap_features(feats, options)
    rows = []
    for i, (_wcopy, f) in enumerate(wrapped):
        row = feature_to_row(f, 0, 0, 0, [batch, i])
        rows.append({k: (v.tolist() if hasattr(v, "tolist") else v) for k, v in row.items()})
    if not rows:
        return None
    return spark.createDataFrame(rows, FEATURE_SCHEMA)


def _id_lit(v) -> str:
    return json.dumps(v)


def _apply_property_updates(tags: Optional[dict], update: dict) -> dict:
    # difference.ts:181-201
    if update.get("removeAllProperties"):
        return {}
    props = dict(tags or {})
    for key in update.get("removeProperties") or []:
        props.pop(key, None)
    for kv in update.get("addOrUpdateProperties") or []:
        props[kv["key"]] = kv["value"]
    return props


def apply_source_diff(
    spark: SparkSession,
    source: DataFrame,
    diff: Optional[dict],
    options: Options,
    batch: int,
) -> tuple:
    """Returns (affected_df, new_source_df, next_batch)."""
    diff = diff or {}
    remove_ids = set(diff.get("remove") or [])
    add_map: dict = {}
    for f in diff.get("add") or []:
        if options.promote_id:
            key = (f.get("properties") or {}).get(options.promote_id)
        else:
            key = f.get("id")
        add_map[json.dumps(key)] = f  # JSON key: keeps str/num distinct, None allowed
    update_map: dict = {}
    for u in diff.get("update") or []:
        update_map[json.dumps(u["id"])] = u

    empty = spark.createDataFrame([], FEATURE_SCHEMA)
    affected_parts: list = []

    if diff.get("removeAll"):
        affected_parts.append(source)
        source = empty

    if remove_ids or add_map:
        keys = {_id_lit(k) for k in remove_ids} | set(add_map.keys())
        key_df = F.broadcast(
            spark.createDataFrame([(k,) for k in keys], "id_key string")
        )
        match = F.coalesce(F.col("id"), F.lit("null")) == F.col("id_key")
        removed = source.join(key_df, match, "leftsemi")
        if not removed.isEmpty():
            affected_parts.append(removed)
            source = source.join(key_df, match, "left_anti")
        if add_map:
            added = _convert_batch(spark, list(add_map.values()), options, batch)
            batch += 1
            if added is not None:
                affected_parts.append(added)
                source = source.unionByName(added)

    if update_map:
        ukeys = F.broadcast(
            spark.createDataFrame([(k,) for k in update_map], "id_key string")
        )
        umatch = F.col("id") == F.col("id_key")
        old_rows = source.join(ukeys, umatch, "leftsemi").orderBy("okey").collect()
        by_id: dict = {}
        for r in old_rows:
            by_id.setdefault(r.id, []).append(r)

        touched_ids = []
        new_rows = []
        old_affected = []
        for id_key, update in update_map.items():  # diff order (difference.ts:119)
            olds = by_id.get(id_key)
            if not olds:
                continue  # wrong id: no-op (difference.ts:121)
            touched_ids.append(id_key)
            old_feats = [row_to_feature(r.asDict()) for r in olds]
            old_affected.extend(old_feats)
            change_geometry = bool(update.get("newGeometry"))
            change_props = bool(
                update.get("removeAllProperties")
                or update.get("removeProperties")
                or update.get("addOrUpdateProperties")
            )
            if change_geometry:
                f0 = old_feats[0]
                gj = {
                    "type": "Feature",
                    "id": f0["id"],
                    "geometry": update["newGeometry"],
                    "properties": _apply_property_updates(f0["tags"], update)
                    if change_props
                    else f0["tags"],
                }
                feats = convert_geojson(
                    {"type": "FeatureCollection", "features": [gj]}, options
                )
                new_rows.extend(f for _w, f in wrap_features(feats, options))
            elif change_props:
                for f in old_feats:
                    nf = dict(f)
                    nf["tags"] = _apply_property_updates(f["tags"], update)
                    new_rows.append(nf)
            else:
                new_rows.extend(old_feats)

        if touched_ids:
            source = source.join(
                F.broadcast(
                    spark.createDataFrame([(k,) for k in touched_ids], "id_key string")
                ),
                umatch,
                "left_anti",
            )
            rows = [
                {
                    k: (v.tolist() if hasattr(v, "tolist") else v)
                    for k, v in feature_to_row(f, 0, 0, 0, [batch, i]).items()
                }
                for i, f in enumerate(new_rows)
            ]
            batch += 1
            updated_df = (
                spark.createDataFrame(rows, FEATURE_SCHEMA) if rows else None
            )
            old_rows_df = spark.createDataFrame(
                [r.asDict() for r in old_rows], FEATURE_SCHEMA
            )
            affected_parts.append(old_rows_df)
            if updated_df is not None:
                affected_parts.append(updated_df)
                source = source.unionByName(updated_df)

    affected = empty
    for p in affected_parts:
        affected = affected.unionByName(p)
    return affected, source, batch


def filter_update(
    source: DataFrame, affected: DataFrame, predicate
) -> tuple:
    """O24 (geojsonvt.ts:115-127): drop id-bearing features failing a user
    GeoJSON predicate; failing rows join the affected set."""
    cols = [f.name for f in FEATURE_SCHEMA.fields]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep_mask = []
            for row in pdf[cols].to_dict("records"):
                if row["id"] is None:
                    keep_mask.append(True)
                    continue
                keep_mask.append(bool(predicate(feature_to_geojson(row_to_feature(row)))))
            out = pdf[~pd.Series(keep_mask, index=pdf.index)]
            if len(out):
                yield out

    removed = source.mapInPandas(kernel, FEATURE_SCHEMA)
    removed = removed.localCheckpoint(eager=True)
    if removed.isEmpty():
        return affected, source
    removed_ids = removed.select("id").distinct()
    source = source.join(
        F.broadcast(removed_ids), ["id"], "left_anti"
    )
    return affected.unionByName(removed), source
