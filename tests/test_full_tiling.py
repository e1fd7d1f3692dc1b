"""Golden end-to-end tiling parity (reference: test/full.test.ts) over the
Spark pipeline — every tile of every pyramid compared against the committed
reference fixtures."""

import pytest

from geojson_vt_spark.config import Options
from geojson_vt_spark.operators.engine import GeoJSONVTSpark

from .conftest import load_fixture
from .util import assert_tiles_equal

CASES = [
    # (input, golden, options) — mirrors test/full.test.ts:11-18
    (
        "us-states.json",
        "us-states-tiles.json",
        Options(index_max_zoom=7, index_max_points=200),
    ),
    (
        "dateline.json",
        "dateline-tiles.json",
        Options(index_max_zoom=0, index_max_points=10000),
    ),
    (
        "dateline.json",
        "dateline-metrics-tiles.json",
        Options(index_max_zoom=0, index_max_points=10000, line_metrics=True),
    ),
    (
        "feature.json",
        "feature-tiles.json",
        Options(index_max_zoom=0, index_max_points=10000),
    ),
    (
        "collection.json",
        "collection-tiles.json",
        Options(index_max_zoom=0, index_max_points=10000),
    ),
    (
        "single-geom.json",
        "single-geom-tiles.json",
        Options(index_max_zoom=0, index_max_points=10000),
    ),
    (
        "ids.json",
        "ids-promote-id-tiles.json",
        Options(index_max_zoom=0, promote_id="prop0"),
    ),
    (
        "ids.json",
        "ids-generate-id-tiles.json",
        Options(index_max_zoom=0, generate_id=True),
    ),
]


@pytest.mark.parametrize(
    "input_file,golden_file,options",
    CASES,
    ids=[c[1].replace("-tiles.json", "") for c in CASES],
)
def test_full_tiling(spark, input_file, golden_file, options):
    eng = GeoJSONVTSpark(spark, data=load_fixture(input_file), options=options)
    assert_tiles_equal(eng.all_tiles(), load_fixture(golden_file))


@pytest.mark.parametrize(
    "input_file",
    ["empty.json", "feature-null-geometry.json", "empty-coords.json"],
)
def test_empty_inputs(spark, input_file):
    eng = GeoJSONVTSpark(spark, data=load_fixture(input_file))
    assert eng.all_tiles() == {}
    assert eng.get_tile(0, 0, 0) is None
