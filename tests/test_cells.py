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
