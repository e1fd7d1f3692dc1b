"""Pure-kernel unit tests (no Spark) mirroring the reference unit suites:
clip (src/clip.test.ts), simplify (src/simplify.test.ts), convert edge cases
(src/convert.test.ts), projection round-trip (src/deconvert.test.ts)."""

import json

import numpy as np
import pytest

from geojson_vt_spark.config import Options
from geojson_vt_spark.functions import feature as FT
from geojson_vt_spark.functions.clip import AXIS_X, clip_features
from geojson_vt_spark.functions.convert import convert_geojson
from geojson_vt_spark.functions.projection import (
    project_x,
    project_y,
    unproject_x,
    unproject_y,
)
from geojson_vt_spark.functions.simplify import simplify
from geojson_vt_spark.functions.tile import assemble_feature, js_round
from geojson_vt_spark.functions.wrap import wrap_features

OPTS = Options()


def _line_feature(coords, fid=None, tags=None):
    """Unprojected tile-space style feature: build rings directly (the clip
    unit tests in the reference operate on raw internal geometry)."""
    pts = np.zeros(len(coords) * 3)
    pts[0::3] = [c[0] for c in coords]
    pts[1::3] = [c[1] for c in coords]
    pts[2::3] = [c[2] if len(c) > 2 else 0 for c in coords]
    dx = np.diff(pts[0::3])
    dy = np.diff(pts[1::3])
    size = float(np.sqrt(dx * dx + dy * dy).sum())
    ring = FT.make_ring(pts, size=size, start=0.0, end=size)
    return FT.make_feature(fid, FT.LINESTRING, [ring], tags)


class TestClip:
    # geometry from /root/reference/src/clip.test.ts:9-28
    GEOM1 = [
        (0, 0), (50, 0), (50, 10), (20, 10), (20, 20), (30, 20), (30, 30),
        (50, 30), (50, 40), (25, 40), (25, 50), (0, 50), (0, 60), (25, 60),
    ]
    GEOM2 = [(0, 0), (50, 0), (50, 10), (0, 10)]

    def test_clips_polylines(self):
        f1 = _line_feature(self.GEOM1)
        f2 = _line_feature(self.GEOM2)
        clipped = clip_features([f1, f2], 1, 10, 40, AXIS_X, OPTS)

        def rings(f):
            return [
                [(p[0], p[1]) for p in r["pts"].reshape(-1, 3)[:, :2].tolist()]
                for r in f["rings"]
            ]

        # expected slices from clip.test.ts:33-77
        assert rings(clipped[0]) == [
            [(10, 0), (40, 0)],
            [(40, 10), (20, 10), (20, 20), (30, 20), (30, 30), (40, 30)],
            [(40, 40), (25, 40), (25, 50), (10, 50)],
            [(10, 60), (25, 60)],
        ]
        assert clipped[0]["type"] == FT.MULTILINESTRING
        assert rings(clipped[1]) == [[(10, 0), (40, 0)], [(40, 10), (10, 10)]]

    def test_clip_metrics_slices(self):
        opts = Options(line_metrics=True)
        f = _line_feature([(0, 0), (10, 0)])
        out = clip_features([f], 1, 2, 8, AXIS_X, opts)
        assert len(out) == 1
        r = out[0]["rings"][0]
        assert r["start"] == pytest.approx(2.0)
        assert r["end"] == pytest.approx(8.0)
        assert r["size"] == pytest.approx(10.0)

    def test_clips_points(self):
        pts = np.array([5.0, 5.0, 0, 15.0, 5.0, 0, 25.0, 5.0, 0])
        f = FT.make_feature(None, FT.MULTIPOINT, [FT.make_ring(pts)], None)
        out = clip_features([f], 1, 10, 20, AXIS_X, OPTS)
        assert len(out) == 1
        assert out[0]["type"] == FT.POINT  # single survivor retypes
        assert out[0]["rings"][0]["pts"].tolist() == [15.0, 5.0, 0.0]


class TestSimplify:
    def test_annotates_endpoints(self):
        pts = np.array([0.0, 0, 0, 1, 1, 0, 2, 0, 0], dtype=float)
        pts[2] = 1
        simplify(pts, 0, 6, 1e-12)
        pts[8] = 1
        # middle point deviates -> annotated with its square distance
        assert pts[5] > 1e-12

    def test_straight_line_collapses(self):
        n = 10
        pts = np.zeros(n * 3)
        pts[0::3] = np.linspace(0, 1, n)
        pts[1::3] = 0.0
        pts[2] = 1
        simplify(pts, 0, (n - 1) * 3, 1e-12)
        pts[(n - 1) * 3 + 2] = 1
        # all interior m values stay 0 (below tolerance)
        assert (pts[5:-3:3] == 0).all()

    def test_degenerate_same_points_no_blowup(self):
        # reference issue #104 degenerate input: many identical points
        n = 2000
        pts = np.zeros(n * 3)
        pts[0::3] = 1.0
        pts[1::3] = 1.0
        pts[0] = 0.0  # distinct first point
        pts[2] = 1
        simplify(pts, 0, (n - 1) * 3, 1e-9)  # must terminate quickly


class TestConvert:
    def test_point(self):
        feats = convert_geojson(
            {"type": "Point", "coordinates": [-75.0, 40.0]}, OPTS
        )
        assert len(feats) == 1
        f = feats[0]
        assert f["type"] == FT.POINT
        assert f["rings"][0]["pts"][0] == pytest.approx(project_x(-75.0))
        assert f["rings"][0]["pts"][1] == pytest.approx(project_y(40.0))

    def test_geometry_collection_flattened(self):
        gc = {
            "type": "Feature",
            "properties": {"a": 1},
            "geometry": {
                "type": "GeometryCollection",
                "geometries": [
                    {"type": "Point", "coordinates": [0, 0]},
                    {"type": "LineString", "coordinates": [[0, 0], [1, 1]]},
                ],
            },
        }
        feats = convert_geojson(gc, OPTS)
        assert [f["type"] for f in feats] == [FT.POINT, FT.LINESTRING]
        assert all(f["tags"] == {"a": 1} for f in feats)

    def test_nesting_depth_guard(self):
        g = {"type": "Point", "coordinates": [0, 0]}
        for _ in range(1026):
            g = {"type": "GeometryCollection", "geometries": [g]}
        with pytest.raises(ValueError, match="depth"):
            convert_geojson({"type": "Feature", "geometry": g, "properties": None}, OPTS)

    def test_invalid_type_raises(self):
        with pytest.raises(ValueError, match="not a valid GeoJSON"):
            convert_geojson(
                {"type": "Pologon", "coordinates": [[-0.26, 51.45], [-0.26, 51.45]]},
                OPTS,
            )

    def test_null_geometry_and_empty_coords_dropped(self):
        assert convert_geojson(
            {"type": "Feature", "geometry": None, "properties": {}}, OPTS
        ) == []
        assert convert_geojson(
            {"type": "Polygon", "coordinates": []}, OPTS
        ) == []

    def test_promote_and_generate_id(self):
        fc = {
            "type": "FeatureCollection",
            "features": [
                {
                    "type": "Feature",
                    "id": 7,
                    "properties": {"pid": "a"},
                    "geometry": {"type": "Point", "coordinates": [1, 2]},
                },
                {
                    "type": "Feature",
                    "properties": {"pid": "b"},
                    "geometry": {"type": "Point", "coordinates": [3, 4]},
                },
            ],
        }
        assert [f["id"] for f in convert_geojson(fc, OPTS)] == [7, None]
        assert [
            f["id"] for f in convert_geojson(fc, Options(promote_id="pid"))
        ] == ["a", "b"]
        assert [
            f["id"] for f in convert_geojson(fc, Options(generate_id=True))
        ] == [0, 1]

    def test_promote_with_generate_raises(self):
        with pytest.raises(ValueError):
            Options(promote_id="x", generate_id=True).validate()


class TestProjection:
    def test_round_trip(self):
        for lon, lat in [(-122.4, 37.8), (0, 0), (179.9, -85.0), (-179.9, 85.0)]:
            assert unproject_x(project_x(lon)) == pytest.approx(lon, abs=1e-10)
            assert unproject_y(project_y(lat)) == pytest.approx(lat, abs=1e-10)

    def test_poles_clamped(self):
        assert project_y(90.0) == 0.0
        assert project_y(-90.0) == 1.0
        assert project_y(89.9999) >= 0.0


class TestJsRound:
    def test_half_toward_plus_inf(self):
        v = np.array([-1.5, -0.5, 0.5, 1.5, 2.5, -2.5, 2.4999999999999996])
        assert js_round(v).tolist() == [-1, 0, 1, 2, 3, -2, 2]

    def test_not_floor_plus_half(self):
        # 0.49999999999999994 + 0.5 rounds to 1.0 in float; spec says 0
        assert js_round(np.array([0.49999999999999994])).tolist() == [0]


class TestWrap:
    def test_no_wrap_needed(self):
        feats = convert_geojson({"type": "Point", "coordinates": [0, 0]}, OPTS)
        wrapped = wrap_features(feats, OPTS)
        assert len(wrapped) == 1
        assert wrapped[0][0] == 1  # center copy
        assert wrapped[0][1] is feats[0]  # untouched passthrough

    def test_dateline_point_duplicated(self):
        feats = convert_geojson({"type": "Point", "coordinates": [179.999, 0]}, OPTS)
        wrapped = wrap_features(feats, OPTS)
        # point inside right buffer -> center + shifted right copy
        assert [w for w, _ in wrapped] == [1, 2]
        xs = [f["rings"][0]["pts"][0] for _, f in wrapped]
        assert xs[1] == pytest.approx(xs[0] - 1.0)


class TestAssembly:
    def test_counts_match_fixture_stats(self):
        opts = Options(index_max_zoom=7, index_max_points=200)
        data = json.load(open("tests/fixtures/us-states.json"))
        wrapped = wrap_features(convert_geojson(data, opts), opts)
        np_tot = 0
        feats_out = 0
        for _, f in wrapped:
            tf, npts, _ = assemble_feature(f, 0, opts)
            np_tot += npts
            feats_out += tf is not None
        assert feats_out == 52
        assert np_tot == sum(FT.n_vertices(f) for _, f in wrapped)
