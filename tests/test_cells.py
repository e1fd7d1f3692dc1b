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
