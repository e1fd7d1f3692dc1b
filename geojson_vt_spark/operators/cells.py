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


class HilbertCells(CellScheme):
    """S2-style space-filling-curve cells: the same 2^res x 2^res mercator
    grid as QuadkeyCells, addressed by HILBERT index instead of
    (cx << res) | cy packing.

    Why a curve id at scale (the property S2 is built on): Hilbert ids are
    locality-preserving — grid neighbors get nearby ids — so sorting or
    range-partitioning by cell id co-locates spatial neighbors, parquet
    row-group min/max stats prune spatial RANGES (a bbox becomes a handful
    of contiguous id runs instead of 2^res scattered stripes), and shuffle
    keys for dense regions land in adjacent partitions. Join SEMANTICS are
    unchanged: any bijection of the grid is a valid cell key (the
    scheme-agnostic contract tests/test_cells.py proves), so QuadkeyCells
    results are identical row-for-row.

    Pure Column math, zero Python: the standard per-bit rotate/reflect fold
    (public-domain xy2d bit-twiddling, e.g. Wikipedia "Hilbert curve";
    same recursion S2's CellId uses per face). Expression size roughly
    doubles per resolution step (the rotation references both axes), so
    construction is capped at res <= 10 — beyond that use a Pandas-UDF
    scheme like H3Cells' shape. The numpy twin `hilbert_d_numpy` is the
    test oracle."""

    def __init__(self, res: int = 8):
        if res > 10:
            raise ValueError(
                "HilbertCells caps res at 10: the pure-Column bit fold "
                "doubles expression size per step (use an Arrow-batched "
                "scheme beyond that)"
            )
        self.res = res
        self.n = 1 << res

    def _axis(self, v):
        return (
            F.least(F.greatest(F.floor(v * self.n), F.lit(0)), F.lit(self.n - 1))
            .cast("long")
        )

    def _d(self, cx, cy) -> Column:
        """Hilbert index of grid cell (cx, cy) — Column fold of the scalar
        loop, one rotate/reflect step per resolution bit."""
        x, y = cx, cy
        d = F.lit(0).cast("long")
        s = self.n >> 1
        while s > 0:
            rx = F.when(x.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(0)
            ry = F.when(y.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(0)
            d = d + (
                (rx * 3).bitwiseXOR(ry).cast("long") * F.lit(int(s) * int(s))
            )
            nx = (
                F.when(
                    ry == 0,
                    F.when(rx == 1, F.lit(s - 1) - y).otherwise(y),
                )
                .otherwise(x)
            )
            ny = (
                F.when(
                    ry == 0,
                    F.when(rx == 1, F.lit(s - 1) - x).otherwise(x),
                )
                .otherwise(y)
            )
            x, y = nx, ny
            s >>= 1
        return d

    def point_cell(self, x, y) -> Column:
        return self._d(self._axis(x), self._axis(y))

    def bbox_cells(self, minx, miny, maxx, maxy) -> Column:
        x0, x1 = self._axis(minx), self._axis(maxx)
        y0, y1 = self._axis(miny), self._axis(maxy)
        return F.flatten(
            F.transform(
                F.sequence(x0, x1),
                lambda cx: F.transform(
                    F.sequence(y0, y1), lambda cy: self._d(cx, cy)
                ),
            )
        )


def hilbert_d_numpy(res: int, cx, cy):
    """Vectorized numpy twin of HilbertCells._d (the test oracle)."""
    import numpy as np

    x = np.asarray(cx, dtype=np.int64).copy()
    y = np.asarray(cy, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = (1 << res) >> 1
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += ((3 * rx) ^ ry) * (s * s)
        # rotate/reflect the sub-square
        swap = ry == 0
        refl = swap & (rx == 1)
        x2 = np.where(refl, s - 1 - x, x)
        y2 = np.where(refl, s - 1 - y, y)
        x_new = np.where(swap, y2, x2)
        y_new = np.where(swap, x2, y2)
        x, y = x_new, y_new
        s >>= 1
    return d


class SphereCells(CellScheme):
    """Sphere-aware cells WITHOUT a native dependency (round-4 verdict #4):
    a latitude-corrected "reduced grid" over lat/lng — the classic
    reduced-Gaussian-grid construction (uniform latitude bands; per-band
    longitude column count shrunk by cos(latitude)), the same
    equal-ground-area goal H3/S2 serve.

    Why the planar schemes above are geodesically dishonest at high
    latitude: mercator stretches by 1/cos(lat), so a FIXED GROUND radius
    covers ~(1/cos(lat))^2 more quadkey cells at lat 80 than at the equator
    (~33x) — candidate rings blow up toward the poles. Here a latitude band
    is a constant ~111 km of ground per degree everywhere, and a band at
    latitude phi holds ~cos(phi) x fewer columns, so every cell is roughly
    the same ground size and a ground-radius query touches O(1) cells at
    any latitude (asserted by tests/test_cells.py::test_sphere_cells_ground_
    area_honesty).

    Input coordinates stay mercator-unit (the engine's common currency);
    the inverse mercator unprojection (functions/projection.py formulas)
    runs inline in Column math — pure JVM codegen, zero Python, zero native
    deps. Cell ids pack (band << 32) | column: band count = 2^res, columns
    per band = max(1, ceil(2^(res+1) * cos(lat_mid))).

    H3Cells stays as the optional native fast path; this is the always-on
    geodesic member of the seam."""

    def __init__(self, res: int = 8):
        self.res = res
        self.nrows = 1 << res
        self.max_cols = 1 << (res + 1)

    # --- mercator-unit -> sphere, Column math ---
    @staticmethod
    def _lat(y):
        y2 = (F.lit(180.0) - y * 360.0) * (math.pi / 180.0)
        return F.atan(F.exp(y2)) * (360.0 / math.pi) - 90.0

    @staticmethod
    def _lng(x):
        return x * 360.0 - 180.0

    # --- lat/lng-degree grid primitives: the ONE source of truth for the
    # reduced-grid geometry (geo_radius_join keys its covers through these
    # same methods, so an edit here cannot desynchronize join sides) ---
    def row_of_lat(self, lat):
        """Band index of a latitude in degrees."""
        return (
            F.least(
                F.greatest(F.floor((lat + 90.0) / 180.0 * self.nrows), F.lit(0)),
                F.lit(self.nrows - 1),
            ).cast("long")
        )

    def ncols_of_row(self, row):
        """Column count of a band (cos-reduced, never below 1)."""
        lat_mid = (row.cast("double") + 0.5) * (180.0 / self.nrows) - 90.0
        return F.greatest(
            F.lit(1),
            F.ceil(F.cos(lat_mid * (math.pi / 180.0)) * self.max_cols),
        ).cast("long")

    def col_of_lng(self, lng, ncols):
        """Column index of a longitude in degrees within a band."""
        return (
            F.least(
                F.greatest(
                    F.floor((lng + 180.0) / 360.0 * ncols.cast("double")),
                    F.lit(0),
                ),
                ncols - 1,
            ).cast("long")
        )

    def _row(self, y):
        return self.row_of_lat(self._lat(y))

    def _ncols(self, row):
        return self.ncols_of_row(row)

    def _col(self, x, ncols):
        return self.col_of_lng(self._lng(x), ncols)

    def point_cell(self, x, y) -> Column:
        row = self._row(y)
        col = self._col(x, self._ncols(row))
        return F.shiftleft(row, 32) + col

    def bbox_cells(self, minx, miny, maxx, maxy) -> Column:
        # mercator y grows SOUTH: miny is the northern edge (higher band)
        row0, row1 = self._row(maxy), self._row(miny)
        return F.flatten(
            F.transform(
                F.sequence(row0, row1),
                lambda r: F.transform(
                    F.sequence(
                        self._col(minx, self._ncols(r)),
                        self._col(maxx, self._ncols(r)),
                    ),
                    lambda c: F.shiftleft(r, 32) + c,
                ),
            )
        )


def sphere_cell_numpy(res: int, x, y):
    """Vectorized numpy twin of SphereCells.point_cell (the test oracle)."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    nrows = 1 << res
    max_cols = 1 << (res + 1)
    lat = np.arctan(np.exp((180.0 - y * 360.0) * math.pi / 180.0)) * (
        360.0 / math.pi
    ) - 90.0
    lng = x * 360.0 - 180.0
    row = np.clip(np.floor((lat + 90.0) / 180.0 * nrows), 0, nrows - 1).astype(
        np.int64
    )
    lat_mid = (row + 0.5) * (180.0 / nrows) - 90.0
    ncols = np.maximum(
        1, np.ceil(np.cos(lat_mid * math.pi / 180.0) * max_cols)
    ).astype(np.int64)
    col = np.clip(np.floor((lng + 180.0) / 360.0 * ncols), 0, ncols - 1).astype(
        np.int64
    )
    return (row << 32) + col


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
