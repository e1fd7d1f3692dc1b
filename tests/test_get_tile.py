"""getTile + lazy drill-down parity (reference: test/get-tile.test.ts)."""

from geojson_vt_spark.config import Options
from geojson_vt_spark.operators.engine import GeoJSONVTSpark

from .conftest import load_fixture
from .util import deep_equal

SQUARE = [
    {
        "geometry": [[[-64, 4160], [-64, -64], [4160, -64], [4160, 4160], [-64, 4160]]],
        "type": 3,
        "tags": {"name": "Pennsylvania", "density": 284.3},
        "id": "42",
    }
]


def test_get_tile_us_states_drilldown(spark):
    # default options: index stops at z0 (numPoints < 100k); getTile(7,37,48)
    # exercises the drill-down split with ancestor pruning
    eng = GeoJSONVTSpark(spark, data=load_fixture("us-states.json"), options=Options())

    tile = eng.get_tile(7, 37, 48)
    ok, p = deep_equal(tile, load_fixture("us-states-z7-37-48.json"))
    assert ok, f"z7-37-48 differs at {p}"

    sq = eng.get_tile(9, 148, 192)
    ok, p = deep_equal(sq, SQUARE)
    assert ok, f"z9-148-192 differs at {p}"

    # string coordinates are accepted (get-tile.test.ts:36 — '7','37','48')
    tile_s = eng.get_tile("7", "37", "48")
    ok, p = deep_equal(tile_s, load_fixture("us-states-z7-37-48.json"))
    assert ok, f"string-coords z7-37-48 differs at {p}"

    assert eng.get_tile(11, 800, 400) is None
    assert eng.get_tile(-5, 123, 400) is None
    assert eng.get_tile(25, 200, 200) is None


def test_get_tile_fractional_coords_guard(spark):
    # get-tile.test.ts:41 — negative z with fractional x/y returns null
    eng = GeoJSONVTSpark(spark, data=load_fixture("us-states.json"), options=Options())
    assert eng.get_tile(-5, 123.25, 400.25) is None


def test_get_tile_empty_index_returns_none(spark):
    # get-tile.test.ts:15-31 — empty plain index and empty cluster index
    empty = {"type": "FeatureCollection", "features": []}
    eng = GeoJSONVTSpark(spark, data=empty, options=Options())
    assert eng.get_tile(0, 0, 0) is None
    ceng = GeoJSONVTSpark(spark, data=empty, options=Options(cluster=True))
    assert ceng.get_tile(0, 0, 0) is None


def test_get_tile_unbuffered_lr_edges(spark):
    eng = GeoJSONVTSpark(
        spark,
        data={"type": "LineString", "coordinates": [[0, 90], [0, -90]]},
        options=Options(buffer=0),
    )
    assert eng.get_tile(2, 1, 1) is None
    got = eng.get_tile(2, 2, 1)
    ok, p = deep_equal(
        got, [{"geometry": [[[0, 0], [0, 4096]]], "type": 2, "tags": None}]
    )
    assert ok, f"differs at {p}: {got}"


def test_get_tile_unbuffered_tb_edges(spark):
    eng = GeoJSONVTSpark(
        spark,
        data={
            "type": "LineString",
            "coordinates": [[-90, 66.51326044311188], [90, 66.51326044311188]],
        },
        options=Options(buffer=0),
    )
    got = eng.get_tile(2, 1, 0)
    ok, p = deep_equal(
        got, [{"geometry": [[[0, 4096], [4096, 4096]]], "type": 2, "tags": None}]
    )
    assert ok, f"differs at {p}: {got}"
    assert eng.get_tile(2, 1, 1) == []


def test_get_tile_polygon_boundary_clip(spark):
    eng = GeoJSONVTSpark(
        spark,
        data={
            "type": "Polygon",
            "coordinates": [
                [
                    [42.1875, 57.32652122521708],
                    [47.8125, 57.32652122521708],
                    [47.8125, 54.16243396806781],
                    [42.1875, 54.16243396806781],
                    [42.1875, 57.32652122521708],
                ]
            ],
        },
        options=Options(buffer=1024),
    )
    got = eng.get_tile(5, 19, 9)
    expected = [
        {
            "geometry": [
                [[3072, 3072], [5120, 3072], [5120, 5120], [3072, 5120], [3072, 3072]]
            ],
            "type": 3,
            "tags": None,
        }
    ]
    ok, p = deep_equal(got, expected)
    assert ok, f"differs at {p}: {got}"


def test_get_tile_x_wrap(spark):
    eng = GeoJSONVTSpark(
        spark,
        data={"type": "Point", "coordinates": [0.0, 0.0]},
        options=Options(index_max_zoom=0, index_max_points=1),
    )
    t = eng.get_tile(1, 0, 0)
    # x=-2 wraps to x=0 at z1 (tile-index.ts:86)
    assert eng.get_tile(1, -2, 0) == t
