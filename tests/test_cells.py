"""Pluggable cell-scheme seam (operators/cells.py)."""

import pytest
from pyspark.sql import functions as F

from geojson_vt_spark.operators.cells import CellScheme, H3Cells, QuadkeyCells
from geojson_vt_spark.operators.spatial_join import point_in_box_join


def test_quadkey_point_cell(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (0.999, 0.999), (-0.5, 1.5), (0.5, 0.25)], ["x", "y"]
    )
    res = 4
    got = [
        r.c for r in df.select(
            QuadkeyCells(res).point_cell(F.col("x"), F.col("y")).alias("c")
        ).collect()
    ]
    n = 1 << res
    # clamped to the grid; pack = (cx << res) | cy
    assert got == [0, ((n - 1) << res) + (n - 1), 0 + (n - 1), (8 << res) + 4]


def test_quadkey_bbox_cover(spark):
    df = spark.createDataFrame([(0.10, 0.20, 0.35, 0.30)],
                               ["minx", "miny", "maxx", "maxy"])
    res = 3  # cells of 1/8: x in {0,1,2}, y in {1,2}
    cells = df.select(
        QuadkeyCells(res).bbox_cells(
            F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy")
        ).alias("cells")
    ).collect()[0].cells
    expect = sorted((cx << res) + cy for cx in (0, 1, 2) for cy in (1, 2))
    assert sorted(cells) == expect


class ShiftedQuadkey(CellScheme):
    """Deterministic fake scheme: quadkey with every id offset by 1000 —
    exercises the seam end-to-end without native libs; results must be
    identical (the cell layer is only a candidate prefilter)."""

    def __init__(self, res):
        self.inner = QuadkeyCells(res)

    def point_cell(self, x, y):
        return self.inner.point_cell(x, y) + F.lit(1000)

    def bbox_cells(self, minx, miny, maxx, maxy):
        return F.transform(
            self.inner.bbox_cells(minx, miny, maxx, maxy), lambda c: c + 1000
        )


def test_join_is_scheme_agnostic(spark):
    pts = spark.createDataFrame(
        [(i, (i * 37 % 100) / 100.0, (i * 53 % 100) / 100.0) for i in range(200)],
        ["pid", "x", "y"],
    )
    boxes = spark.createDataFrame(
        [(1, 0.1, 0.1, 0.4, 0.5), (2, 0.55, 0.2, 0.9, 0.8)],
        ["bid", "minx", "miny", "maxx", "maxy"],
    )
    base = {
        (r.pid, r.bid)
        for r in point_in_box_join(pts, boxes, res=5).collect()
    }
    alt = {
        (r.pid, r.bid)
        for r in point_in_box_join(
            pts, boxes, scheme=ShiftedQuadkey(5)
        ).collect()
    }
    assert base and base == alt


def test_h3_requires_native_lib():
    try:
        import h3  # noqa: F401

        pytest.skip("h3 installed: the guard path does not apply")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="h3"):
        H3Cells(7)


def test_hilbert_column_matches_numpy_twin(spark):
    """The pure-Column Hilbert fold equals the numpy oracle on a coordinate
    sweep (which itself matches the canonical scalar loop — verified in the
    scheme's authoring tests) — bijection and range included."""
    import numpy as np
    from pyspark.sql import functions as F

    from geojson_vt_spark.operators.cells import HilbertCells, hilbert_d_numpy

    res = 6
    sch = HilbertCells(res)
    n = 1 << res
    df = (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("cx"),
            (F.col("id") / n).cast("long").alias("cy"),
        )
        .select(
            "cx",
            "cy",
            sch._d(F.col("cx"), F.col("cy")).alias("d"),
        )
    )
    rows = df.collect()
    got = np.array([r.d for r in rows])
    want = hilbert_d_numpy(
        res, np.array([r.cx for r in rows]), np.array([r.cy for r in rows])
    )
    assert (got == want).all()
    assert len(set(got.tolist())) == n * n and got.min() == 0


def test_hilbert_point_cell_locality(spark):
    """The reason the scheme exists: sorting by Hilbert id makes consecutive
    cells GRID-ADJACENT (|dx|+|dy| == 1), which quadkey packing does not."""
    import numpy as np

    from geojson_vt_spark.operators.cells import hilbert_d_numpy

    res = 7
    n = 1 << res
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    d = hilbert_d_numpy(res, xs.ravel(), ys.ravel())
    order = np.argsort(d)
    dx = np.abs(np.diff(xs.ravel()[order]))
    dy = np.abs(np.diff(ys.ravel()[order]))
    assert ((dx + dy) == 1).all()
    # quadkey packing breaks adjacency at every row boundary
    qk = (xs.ravel() << res) | ys.ravel()
    oq = np.argsort(qk)
    dq = np.abs(np.diff(xs.ravel()[oq])) + np.abs(np.diff(ys.ravel()[oq]))
    assert (dq > 1).any()


def test_join_identical_under_hilbert_scheme(spark):
    """Cell ids are join keys only — the Hilbert bijection must give
    row-identical spatial-join output to the default quadkeys."""
    from pyspark.sql import functions as F

    from geojson_vt_spark.operators.cells import HilbertCells
    from geojson_vt_spark.operators.spatial_join import point_in_box_join

    pts = spark.range(400).select(
        F.col("id").alias("pid"),
        (F.pmod(F.col("id") * 7919, F.lit(1000)) / 1000.0).alias("px"),
        (F.pmod(F.col("id") * 104729 + 3, F.lit(1000)) / 1000.0).alias("py"),
    )
    boxes = spark.range(25).select(
        F.col("id").alias("bid"),
        (F.pmod(F.col("id") * 131, F.lit(100)) / 100.0).alias("minx"),
        (F.pmod(F.col("id") * 131, F.lit(100)) / 100.0 + 0.15).alias("maxx"),
        (F.pmod(F.col("id") * 37, F.lit(100)) / 100.0).alias("miny"),
        (F.pmod(F.col("id") * 37, F.lit(100)) / 100.0 + 0.2).alias("maxy"),
    )
    base = {
        tuple(r) for r in point_in_box_join(pts, boxes, px="px", py="py").select("pid", "bid").collect()
    }
    hil = {
        tuple(r)
        for r in point_in_box_join(pts, boxes, px="px", py="py", scheme=HilbertCells(5))
        .select("pid", "bid")
        .collect()
    }
    assert base == hil and base


# ---------------------------------------------------------------------------
# SphereCells: the geodesically honest, dependency-free member of the seam
# ---------------------------------------------------------------------------

def _merc(lat, lng):
    """lat/lng degrees -> mercator unit square (tests' ground-truth twin of
    functions/projection.py)."""
    import math

    x = (lng + 180.0) / 360.0
    s = math.sin(lat * math.pi / 180.0)
    y = 0.5 - 0.25 * math.log((1 + s) / (1 - s)) / math.pi
    return x, y


def test_sphere_point_cell_matches_numpy_twin(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from geojson_vt_spark.operators.cells import SphereCells, sphere_cell_numpy

    res = 6
    sch = SphereCells(res)
    pts = [
        _merc(lat, lng)
        for lat in (-84.0, -60.0, -10.0, 0.0, 15.5, 45.0, 70.0, 84.0)
        for lng in (-179.9, -120.0, -1.0, 0.0, 33.3, 120.0, 179.9)
    ]
    df = spark.createDataFrame(pts, ["x", "y"])
    rows = df.select(
        "x", "y", sch.point_cell(F.col("x"), F.col("y")).alias("c")
    ).collect()
    got = np.array([r.c for r in rows])
    want = sphere_cell_numpy(
        res, np.array([r.x for r in rows]), np.array([r.y for r in rows])
    )
    assert (got == want).all()


def test_sphere_scheme_pip_join_agnostic_high_latitude(spark):
    """point_in_box_join under SphereCells returns exactly the QuadkeyCells
    rows (and the brute-force predicate) on a corpus concentrated at
    latitude 75-84, where mercator distortion is strongest."""
    from pyspark.sql import functions as F

    from geojson_vt_spark.operators.cells import QuadkeyCells, SphereCells
    from geojson_vt_spark.operators.spatial_join import point_in_box_join

    pts = [
        (i,) + _merc(75.0 + (i * 7 % 90) / 10.0, -179.0 + (i * 13 % 3580) / 10.0)
        for i in range(500)
    ]
    pdf = spark.createDataFrame(pts, ["pid", "x", "y"])
    boxes = []
    for bid, (lat0, lat1, lng0, lng1) in enumerate(
        [(75, 84, -180, -170), (76, 80, 10, 40), (82, 84, 150, 180)]
    ):
        x0, y1 = _merc(lat0, lng0)  # southern edge -> larger mercator y
        x1, y0 = _merc(lat1, lng1)
        boxes.append((bid, x0, y0, x1, y1))
    bdf = spark.createDataFrame(boxes, ["bid", "minx", "miny", "maxx", "maxy"])

    base = {
        (r.pid, r.bid)
        for r in point_in_box_join(pdf, bdf, scheme=QuadkeyCells(6)).collect()
    }
    sph = {
        (r.pid, r.bid)
        for r in point_in_box_join(pdf, bdf, scheme=SphereCells(6)).collect()
    }
    brute = {
        (r.pid, r.bid)
        for r in pdf.crossJoin(bdf)
        .where(
            (F.col("x") >= F.col("minx")) & (F.col("x") <= F.col("maxx"))
            & (F.col("y") >= F.col("miny")) & (F.col("y") <= F.col("maxy"))
        )
        .collect()
    }
    assert base and base == sph == brute


def test_sphere_cells_ground_area_honesty(spark):
    """A fixed 200x200 km ground box covers O(1) SphereCells at any latitude,
    while the planar mercator grid inflates by ~1/cos(lat)^2 toward the
    poles — the concrete distortion the scheme exists to fix."""
    import math

    from pyspark.sql import functions as F

    from geojson_vt_spark.operators.cells import QuadkeyCells, SphereCells

    res = 8
    km = 200.0
    rows = []
    for lat in (0.0, 80.0):
        dlat = km / 111.195
        dlng = km / (111.195 * math.cos(lat * math.pi / 180.0))
        x0, y1 = _merc(lat, 10.0)
        x1, y0 = _merc(lat + dlat, 10.0 + dlng)
        rows.append((lat, x0, y0, x1, y1))
    df = spark.createDataFrame(rows, ["lat", "minx", "miny", "maxx", "maxy"])

    def counts(scheme):
        out = {
            r.lat: r.n
            for r in df.select(
                "lat",
                F.size(
                    scheme.bbox_cells(
                        F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy")
                    )
                ).alias("n"),
            ).collect()
        }
        return out[0.0], out[80.0]

    q_eq, q_hi = counts(QuadkeyCells(res))
    s_eq, s_hi = counts(SphereCells(res))
    assert q_hi / q_eq > 8.0      # planar: blows up toward the pole
    assert s_hi <= 3 * max(s_eq, 1)  # sphere-aware: stays O(1)


def test_geo_radius_join_exact_vs_brute(spark):
    """geo_radius_join == brute-force haversine on a set spanning the
    equator, latitude 83, the antimeridian, and a near-polar band."""
    import math

    from pyspark.sql import functions as F

    from geojson_vt_spark.operators.spatial_join import geo_radius_join

    b = [
        (i, -83.0 + (i * 11 % 1660) / 10.0, -180.0 + (i * 17 % 3600) / 10.0)
        for i in range(800)
    ]
    b.append((8000, 0.0, -179.9))  # ~33 km from anchor 9000 ACROSS the wrap
    # anchors near the wrap and the pole
    a = [
        (9000, 0.0, 179.8),
        (9001, 83.0, -179.5),
        (9002, 82.5, 0.0),
        (9003, -40.0, 10.0),
    ]
    adf = spark.createDataFrame(a, ["a_id", "lat", "lng"])
    bdf = spark.createDataFrame(b, ["b_id", "lat", "lng"])
    got = {
        (r.a_id, r.b_id) for r in geo_radius_join(adf, bdf, 700.0).collect()
    }

    def hav(p, q):
        la1, lo1, la2, lo2 = map(math.radians, (p[1], p[2], q[1], q[2]))
        h = (
            math.sin((la2 - la1) / 2) ** 2
            + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
        )
        return 2 * 6371.0088 * math.asin(math.sqrt(h))

    brute = {(p[0], q[0]) for p in a for q in b if hav(p, q) <= 700.0}
    assert got == brute
    assert len(brute) > 0
    # the antimeridian wrap is exercised: anchor at lng 179.8 finds the
    # planted b-point at lng -179.9 (a planar lng-grid without modular
    # column wrap would miss it)
    assert (9000, 8000) in got


def test_geo_radius_join_large_radius_superset(spark):
    """Large radii regression (review finding): the per-band longitude span
    must come from inverting the haversine law, not the planar radius/cos
    widening — the planar bound under-covers once R is a meaningful
    fraction of Earth and silently DROPS true pairs. Pinned cases:
      * (lat 80, lng 0) vs (lat 42.8, lng 101) at R=5600 km — true distance
        5542.9 km; the planar bound spanned cols 26..66 of 93 while the
        pair sits at col 72 (the review's numeric repro);
      * both points at lat 60, R=6680 km — needs dlng 180 deg, planar bound
        gave 120;
    plus randomized brute-force parity at 5600/12000/20100 km (the last is
    past the half-circumference: hav(R) clamps to 1 and every band covers
    fully — geo_knn_join's final doubling operates there)."""
    import math
    import random

    from geojson_vt_spark.operators.spatial_join import geo_radius_join

    rng = random.Random(7)
    a = [(0, 80.0, 0.0), (1, 60.0, 10.0)] + [
        (i, rng.uniform(-85, 85), rng.uniform(-180, 180)) for i in range(2, 30)
    ]
    b = [(0, 42.8, 101.0), (1, 60.0, -170.0)] + [
        (i, rng.uniform(-85, 85), rng.uniform(-180, 180)) for i in range(2, 250)
    ]
    adf = spark.createDataFrame(a, ["a_id", "lat", "lng"])
    bdf = spark.createDataFrame(b, ["b_id", "lat", "lng"])

    def hav(p, q):
        la1, lo1, la2, lo2 = map(math.radians, (p[1], p[2], q[1], q[2]))
        h = (
            math.sin((la2 - la1) / 2) ** 2
            + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
        )
        return 2 * 6371.0088 * math.asin(math.sqrt(h))

    assert hav(a[0], b[0]) <= 5600.0  # the pinned counterexample pair
    assert hav(a[1], b[1]) <= 6680.0  # the same-latitude second-order case
    for radius in (5600.0, 6680.0, 12000.0, 20100.0):
        got = {
            (r.a_id, r.b_id)
            for r in geo_radius_join(adf, bdf, radius).collect()
        }
        brute = {(p[0], q[0]) for p in a for q in b if hav(p, q) <= radius}
        assert got == brute, (radius, brute - got, got - brute)
    assert (0, 0) in got and (1, 1) in got


@pytest.mark.parametrize("scheme", ["sphere", "hilbert"])
def test_pip_join_oracle_green_under_scheme(spark, monkeypatch, scheme):
    """The DRIVER oracle row for pip_join stays green with the sphere-aware
    (and Hilbert) scheme swapped in via SPARK_GRAFT_CELL_SCHEME — the
    round-4 verdict #4 done-criterion, checked literally."""
    monkeypatch.setenv("SPARK_GRAFT_CELL_SCHEME", scheme)
    from .oracle_harness import run_all

    res = run_all(spark, "/root/testdata/sf0.001", names={"pip_join"})
    assert res["pip_join"].get("hash_match"), res["pip_join"]


def test_geo_knn_join_exact_vs_brute(spark):
    """geo_knn_join == brute-force haversine kNN, including an anchor whose
    5 nearest sit across the antimeridian and one needing several radius
    doublings (isolated near the pole)."""
    import math

    from pyspark.sql import functions as F

    from geojson_vt_spark.operators.spatial_join import geo_knn_join

    b = [
        (i, -83.0 + (i * 11 % 1660) / 10.0, -180.0 + (i * 17 % 3600) / 10.0)
        for i in range(400)
    ]
    a = [
        (9000, 0.0, 179.8),   # wrap
        (9001, 83.0, -179.5),  # high-lat wrap
        (9002, -82.9, 5.0),    # near-polar: sparse neighborhood
        (9003, 10.0, 10.0),
    ]
    adf = spark.createDataFrame(a, ["a_id", "lat", "lng"])
    bdf = spark.createDataFrame(b, ["b_id", "lat", "lng"])
    k = 5
    got = {
        (r.a_id, r.rank): r.b_id
        for r in geo_knn_join(adf, bdf, k=k, init_radius_km=50.0).collect()
    }

    def hav(p, q):
        la1, lo1, la2, lo2 = map(math.radians, (p[1], p[2], q[1], q[2]))
        h = (
            math.sin((la2 - la1) / 2) ** 2
            + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
        )
        return round(2 * 6371.0088 * math.asin(math.sqrt(h)), 6)

    want = {}
    for p in a:
        ranked = sorted(((hav(p, q), q[0]) for q in b))[:k]
        for rk, (_d, bid) in enumerate(ranked, 1):
            want[(p[0], rk)] = bid
    assert got == want
    assert len(got) == len(a) * k


def test_geo_knn_oracle_green(spark):
    from .oracle_harness import run_all

    res = run_all(spark, "/root/testdata/sf0.001", names={"geo_knn_join"})
    assert res["geo_knn_join"].get("hash_match"), res["geo_knn_join"]


def test_geo_knn_result_reads_checkpoints_not_recompute(spark):
    """Each settled round's top-k is localCheckpoint'ed, so the RETURNED
    DataFrame's plan must not contain the ranking Window or the band-cover
    explode (Generate) — evaluating the result twice used to re-run every
    round's banded radius join + window from scratch (measured 16 s -> 0.4 s
    on the bench corpus after the fix). Only the final half-circumference
    round stays lazy, and it is absent when every point settles early."""
    from geojson_vt_spark.operators.spatial_join import geo_knn_join

    b = [(i, float(i % 7), float(i % 11)) for i in range(40)]
    a = [(0, 1.0, 2.0), (1, 3.0, 4.0)]
    adf = spark.createDataFrame(a, ["a_id", "lat", "lng"])
    bdf = spark.createDataFrame(b, ["b_id", "lat", "lng"])
    # init radius 5000 km: everything settles in round 1, loop exits via
    # isEmpty — every emitted row comes from a checkpointed frame
    out = geo_knn_join(adf, bdf, k=3, init_radius_km=5000.0)
    assert out.count() == 6
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "Generate" not in plan, plan
