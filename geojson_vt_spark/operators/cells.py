"""Pluggable spatial cell schemes (north rule: H3/S2-style cell index).

Every cell-binned join in the engine (point-in-box / point-in-polygon /
raster↔vector bridge) needs exactly two primitives from a scheme:

    point_cell(x, y)                    -> Column[long]  one cell per point
    bbox_cells(minx, miny, maxx, maxy)  -> Column[array<long>] covering cells

The default scheme is tile-aligned QUADKEYS over the mercator unit square:
pure Column math (JVM codegen, zero dependencies) with an exact cell↔tile
bit correspondence (cell at res r == tile (z=r, x=cell>>r, y=cell&mask)),
which is why the engine favors it — tile pyramids, heatmaps and joins all
share one key space (SURVEY §8.3 records the rationale).

H3 drops in through the same seam where the native lib exists (it is NOT in
this container, so H3Cells raises a clear error at construction and its
tests skip): cells come from Arrow-batched pandas UDFs converting mercator
coords to lat/lng and calling h3-py. An S2 scheme would follow the same
shape. The seam is exercised end-to-end by tests/test_cells.py with a fake
scheme, proving the joins are scheme-agnostic.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F


class CellScheme:
    """Minimal cell interface the joins depend on."""

    def point_cell(self, x, y) -> Column:
        raise NotImplementedError

    def bbox_cells(self, minx, miny, maxx, maxy) -> Column:
        raise NotImplementedError


class QuadkeyCells(CellScheme):
    """2^res x 2^res grid over the mercator unit square, packed (cx<<res)|cy.

    Clamps to the grid so buffered coords stay addressable. Cell ids are
    tile ids: z=res, x=cell>>res, y=cell & ((1<<res)-1)."""

    def __init__(self, res: int = 8):
        self.res = res
        self.n = 1 << res

    def _axis(self, v):
        return (
            F.least(F.greatest(F.floor(v * self.n), F.lit(0)), F.lit(self.n - 1))
            .cast("long")
        )

    def point_cell(self, x, y) -> Column:
        return F.shiftleft(self._axis(x), self.res) + self._axis(y)

    def bbox_cells(self, minx, miny, maxx, maxy) -> Column:
        res = self.res
        x0, x1 = self._axis(minx), self._axis(maxx)
        y0, y1 = self._axis(miny), self._axis(maxy)
        return F.flatten(
            F.transform(
                F.sequence(x0, x1),
                lambda cx: F.transform(
                    F.sequence(y0, y1),
                    lambda cy: F.shiftleft(cx, res) + cy,
                ),
            )
        )


class H3Cells(CellScheme):
    """H3 cells at a fixed resolution via Arrow-batched pandas UDFs.

    Requires the h3 native lib (absent in this container — construction
    raises so callers fail fast instead of at executor time). Mercator unit
    coords are unprojected to lat/lng (functions/projection.py formulas)
    before hashing; bbox covering uses h3.polygon_to_cells over the bbox
    ring plus the 4 corner cells (polygon_to_cells is centroid-based)."""

    def __init__(self, res: int = 7):
        try:
            import h3  # noqa: F401
        except ImportError as e:  # pragma: no cover - lib absent here
            raise RuntimeError(
                "H3Cells needs the 'h3' package (h3-py with native libh3); "
                "it is not installed in this environment — use QuadkeyCells "
                "or install h3"
            ) from e
        self.res = res

    @staticmethod
    def _unproject(xs, ys):
        import numpy as np

        lng = xs * 360.0 - 180.0
        y2 = 180.0 - ys * 360.0
        lat = 360.0 / math.pi * np.arctan(np.exp(y2 * math.pi / 180.0)) - 90.0
        return lat, lng

    def point_cell(self, x, y) -> Column:  # pragma: no cover - lib absent
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        res = self.res

        @pandas_udf("long")
        def to_cell(xs: pd.Series, ys: pd.Series) -> pd.Series:
            import h3

            lat, lng = H3Cells._unproject(xs.to_numpy(), ys.to_numpy())
            return pd.Series(
                [h3.str_to_int(h3.latlng_to_cell(a, o, res)) for a, o in zip(lat, lng)]
            )

        return to_cell(x, y)

    def bbox_cells(self, minx, miny, maxx, maxy) -> Column:  # pragma: no cover
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        res = self.res

        @pandas_udf("array<long>")
        def cover(mnx: pd.Series, mny: pd.Series, mxx: pd.Series, mxy: pd.Series) -> pd.Series:
            import h3

            out = []
            for a, b, c, d in zip(mnx, mny, mxx, mxy):
                lat0, lng0 = H3Cells._unproject(a, d)  # note: y grows south
                lat1, lng1 = H3Cells._unproject(c, b)
                poly = h3.LatLngPoly(
                    [(lat0, lng0), (lat0, lng1), (lat1, lng1), (lat1, lng0)]
                )
                cells = set(h3.polygon_to_cells(poly, res))
                for la, ln in (
                    (lat0, lng0), (lat0, lng1), (lat1, lng0), (lat1, lng1),
                ):
                    cells.add(h3.latlng_to_cell(la, ln, res))
                out.append([h3.str_to_int(cc) for cc in sorted(cells)])
            return pd.Series(out)

        return cover(minx, miny, maxx, maxy)
