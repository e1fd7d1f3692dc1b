"""Property-based hardening of the pure-Python kernels (hypothesis).

The fixture/golden suites pin the reference's exact cases; these properties
attack the kernels with adversarial generated input — coordinates exactly ON
band edges, duplicate vertices, degenerate rings, negative/half-way rounding
values — where off-by-one and open/closed-interval bugs live. All pure
numpy, no SparkSession: the whole module runs in seconds.

Settings: derandomize=True so CI runs are reproducible and no .hypothesis
example database is written into the repo.
"""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from geojson_vt_spark.config import Options
from geojson_vt_spark.functions.clip import AXIS_X, AXIS_Y, clip_one
from geojson_vt_spark.functions.feature import (
    LINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    make_feature,
    make_ring,
)
from geojson_vt_spark.functions.flat import (
    clip_flat,
    flat_from_features,
    flat_to_features,
    js_round_arr,
)
from geojson_vt_spark.functions.projection import (
    project_x,
    project_y,
    unproject_x,
    unproject_y,
)

SETTINGS = dict(max_examples=60, deadline=None, derandomize=True)

# Coordinates biased toward band-edge collisions: exact eighths (the band
# strategy draws from the same grid) mixed with arbitrary floats in [0, 1].
_grid = st.sampled_from([i / 8.0 for i in range(9)])
_coord = st.one_of(_grid, st.floats(0.0, 1.0, allow_nan=False, width=64))
_band_edge = st.one_of(
    _grid, st.floats(-0.5, 1.5, allow_nan=False, width=64)
)


@st.composite
def _feature(draw, i):
    kind = draw(st.integers(0, 4))
    if kind == 0:
        pts = np.array([draw(_coord), draw(_coord), 0.0])
        return make_feature(i, POINT, [make_ring(pts)], {"k": i})
    if kind == 1:
        m = draw(st.integers(1, 5))
        pts = np.empty(3 * m)
        pts[0::3] = [draw(_coord) for _ in range(m)]
        pts[1::3] = [draw(_coord) for _ in range(m)]
        pts[2::3] = 0.0
        return make_feature(i, MULTIPOINT, [make_ring(pts)], None)
    if kind == 2:
        m = draw(st.integers(2, 8))
        pts = np.empty(3 * m)
        pts[0::3] = [draw(_coord) for _ in range(m)]
        pts[1::3] = [draw(_coord) for _ in range(m)]
        pts[2::3] = [draw(_coord) for _ in range(m)]
        return make_feature(
            i, LINESTRING,
            [make_ring(pts, 0, draw(_coord) * 3, 0.0, draw(_coord) * 3)],
            {"t": "l"},
        )
    rings = []
    npoly = draw(st.integers(1, 2))
    for p in range(npoly):
        for _ in range(draw(st.integers(1, 2))):
            m = draw(st.integers(3, 6))
            pts = np.empty(3 * (m + 1))
            pts[0:3 * m:3] = [draw(_coord) for _ in range(m)]
            pts[1:3 * m:3] = [draw(_coord) for _ in range(m)]
            pts[2:3 * m:3] = [draw(_coord) for _ in range(m)]
            pts[-3:] = pts[:3]
            rings.append(make_ring(pts, p, draw(_coord)))
    ftype = POLYGON if npoly == 1 else MULTIPOLYGON
    return make_feature(i, ftype, rings, None)


@st.composite
def _features(draw, max_n=8):
    n = draw(st.integers(1, max_n))
    return [draw(_feature(i)) for i in range(n)]


def _assert_clip_parity(features, start, end, axis, options):
    sc, sc_src = [], []
    for i, f in enumerate(features):
        before = len(sc)
        clip_one(f, start, end, axis, options, sc)
        sc_src.extend([i] * (len(sc) - before))
    fl = flat_from_features(features)
    nfe = len(features)
    out_fl, src, _ = clip_flat(
        fl, np.full(nfe, start), np.full(nfe, end), axis, options.line_metrics
    )
    got = flat_to_features(out_fl)
    assert len(got) == len(sc)
    assert list(src) == sc_src
    for a, b in zip(sc, got):
        assert a["type"] == b["type"]
        assert len(a["rings"]) == len(b["rings"])
        assert a["minx"] == b["minx"] and a["maxx"] == b["maxx"]
        assert a["miny"] == b["miny"] and a["maxy"] == b["maxy"]
        for ra, rb in zip(a["rings"], b["rings"]):
            assert np.array_equal(ra["pts"], rb["pts"])
            assert ra["poly"] == rb["poly"] and ra["size"] == rb["size"]


@given(feats=_features(), s=_band_edge, w=st.floats(0.0, 1.0), ax=st.booleans())
@settings(**SETTINGS)
def test_clip_batch_matches_scalar(feats, s, w, ax):
    """Batched clip == scalar walker bit-for-bit on generated geometry,
    including bands whose edges coincide exactly with vertex coordinates
    and zero-width bands."""
    _assert_clip_parity(feats, s, s + w, AXIS_X if ax else AXIS_Y, Options())


@given(feats=_features(), s=_band_edge, w=st.floats(0.0, 1.0), ax=st.booleans())
@settings(**SETTINGS)
def test_clip_batch_matches_scalar_line_metrics(feats, s, w, ax):
    _assert_clip_parity(
        feats, s, s + w, AXIS_X if ax else AXIS_Y, Options(line_metrics=True)
    )


@given(
    lng=st.one_of(
        st.floats(-180.0, 180.0, allow_nan=False),
        st.sampled_from([-180.0, -179.999999999, 0.0, 179.999999999, 180.0]),
    ),
    lat=st.floats(-85.0, 85.0, allow_nan=False),
)
@settings(**SETTINGS)
def test_projection_roundtrip(lng, lat):
    """unproject(project(p)) returns the point within float tolerance over
    the whole mercator-valid domain including the antimeridian edges."""
    x, y = project_x(lng), project_y(lat)
    assert 0.0 <= x <= 1.0
    assert math.isclose(unproject_x(x), lng, rel_tol=0, abs_tol=1e-9)
    assert math.isclose(unproject_y(y), lat, rel_tol=0, abs_tol=1e-9)


@given(
    v=st.one_of(
        st.floats(-1e12, 1e12, allow_nan=False),
        # exact halves and the classic double that floor(v+0.5) mis-rounds
        st.sampled_from(
            [-2.5, -1.5, -0.5, 0.5, 1.5, 2.5, 0.49999999999999994,
             -0.49999999999999994, 4095.5, -4095.5]
        ),
    )
)
@settings(**SETTINGS)
def test_js_round_matches_ecma(v):
    """js_round_arr == ECMA Math.round: nearest int, exact halves toward
    +infinity (so -0.5 -> 0, not -1), and 0.49999999999999994 -> 0."""
    got = int(js_round_arr(np.array([v]))[0])
    f = math.floor(v)
    expect = f + (1 if (v - f) >= 0.5 else 0)
    assert got == expect


@given(feats=_features(max_n=6))
@settings(**SETTINGS)
def test_flat_roundtrip(feats):
    """flat_from_features -> flat_to_features is the identity on geometry,
    ring metadata, and bboxes."""
    got = flat_to_features(flat_from_features(feats))
    assert len(got) == len(feats)
    for a, b in zip(feats, got):
        assert a["type"] == b["type"]
        assert len(a["rings"]) == len(b["rings"])
        for ra, rb in zip(a["rings"], b["rings"]):
            assert np.array_equal(ra["pts"], rb["pts"])
