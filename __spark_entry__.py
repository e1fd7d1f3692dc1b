"""Driver contract for the spark-graft builder (PySpark target).

entry()    — flagship: interleaved-documents corpus (input_hint shape) with
             the us-states GeoJSON fixture riding in geojson spans -> full
             tile pyramid (O1-O14) -> per-tile registry DataFrame.
queries()  — SQL-expressible operators from SURVEY.md §2 + training-data
             pipeline ops, each paired with a DuckDB oracle in oracle_sql().
Geometry-kernel operators (clip/simplify/assemble/wrap) are validated against
the reference golden fixtures in tests/ instead (byte-exact tile parity).
"""

from __future__ import annotations

import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: documents-with-geojson-spans -> z-pyramid tile registry."""
    from pyspark.sql import functions as F

    from geojson_vt_spark.config import Options
    from geojson_vt_spark.operators.engine import GeoJSONVTSpark
    from geojson_vt_spark.sources.documents import (
        features_from_documents,
        synthesize_documents,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    texts = [
        r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .limit(16)
        .collect()
    ]
    with open(os.path.join(_REPO, "tests", "fixtures", "us-states.json")) as f:
        payload = f.read()

    docs = synthesize_documents(spark, [payload], n_docs=16, texts=texts)
    options = Options(index_max_zoom=7, index_max_points=200)
    feats = features_from_documents(docs, options)
    eng = GeoJSONVTSpark(spark, features_df=feats, options=options)
    return eng.registry().orderBy("z", "x", "y").select(
        "z", "x", "y", "num_features", "num_points", "num_simplified",
        F.col("has_source").cast("int").alias("has_source"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from geojson_vt_spark.analytics import QUERIES
    from geojson_vt_spark.hygiene import QUERIES as HYGIENE_QUERIES
    from geojson_vt_spark.sources.bucketed import QUERIES as BUCKETED_QUERIES
    from geojson_vt_spark.sources.documents import QUERIES as DOCUMENTS_QUERIES
    from geojson_vt_spark.sources.media import QUERIES as MEDIA_QUERIES
    from geojson_vt_spark.training import QUERIES as TRAINING_QUERIES

    return {
        **QUERIES,
        **TRAINING_QUERIES,
        **HYGIENE_QUERIES,
        **MEDIA_QUERIES,
        **BUCKETED_QUERIES,
        **DOCUMENTS_QUERIES,
    }


def oracle_sql() -> dict[str, str]:
    from geojson_vt_spark.analytics import ORACLES
    from geojson_vt_spark.hygiene import ORACLES as HYGIENE_ORACLES
    from geojson_vt_spark.sources.bucketed import ORACLES as BUCKETED_ORACLES
    from geojson_vt_spark.sources.documents import ORACLES as DOCUMENTS_ORACLES
    from geojson_vt_spark.sources.media import ORACLES as MEDIA_ORACLES
    from geojson_vt_spark.training import ORACLES as TRAINING_ORACLES

    return {
        **ORACLES,
        **TRAINING_ORACLES,
        **HYGIENE_ORACLES,
        **MEDIA_ORACLES,
        **BUCKETED_ORACLES,
        **DOCUMENTS_ORACLES,
    }
