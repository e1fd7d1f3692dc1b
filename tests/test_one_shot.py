"""One-shot small-corpus pyramid mode (plans/pyramid.py): when the single
z0 root splits and its vertex total fits SPARK_GRAFT_ONE_SHOT_MAX_POINTS,
the whole pyramid runs as ONE applyInPandas subtree group
(_subtree_fn(emit_root=True)) — zero per-level crossings. The mode must be
row-identical to the per-level loop across all three outputs (registry,
tiles, sources), engage/stand down exactly on the gate, and resume from
its snapshot."""

import os

import pytest

import bench
from geojson_vt_spark.config import Options
from geojson_vt_spark.plans.pyramid import build_pyramid


@pytest.fixture(scope="module")
def rects(spark):
    options = Options(max_zoom=14, index_max_zoom=14, index_max_points=128)
    feats = bench.synth_rect_features(spark, 3000, options).localCheckpoint(
        eager=True
    )
    return feats, options


def _collect(store):
    reg = sorted(tuple(r) for r in store.registry_df().collect())
    tiles = sorted(
        (
            r.z, r.x, r.y, tuple(r.okey), r.tf_type, r.tf_id,
            r.tf_tags, r.tf_geom, r.npoints, r.nsimplified,
        )
        for r in store.tiles_df().collect()
    )
    src = sorted(
        (r.z, r.x, r.y, tuple(r.okey), r.id, r.ftype, tuple(r.coords))
        for r in store.sources_df().collect()
    )
    return reg, tiles, src


def _run(feats, options, cap, **kw):
    old = os.environ.get("SPARK_GRAFT_ONE_SHOT_MAX_POINTS")
    os.environ["SPARK_GRAFT_ONE_SHOT_MAX_POINTS"] = str(cap)
    try:
        return build_pyramid(feats, options, **kw)
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_ONE_SHOT_MAX_POINTS", None)
        else:
            os.environ["SPARK_GRAFT_ONE_SHOT_MAX_POINTS"] = old


def test_one_shot_equals_loop_full_rows(rects):
    """Registry, tile, and retained-source row sets are IDENTICAL between
    the one-shot kernel and the per-level loop (head fusion + subtree
    routing included) — the strongest engine check after golden parity."""
    feats, options = rects
    s_loop = _run(feats, options, 0)
    s_os = _run(feats, options, 200_000)
    assert not s_loop.one_shot
    assert s_os.one_shot
    loop_out = _collect(s_loop)
    os_out = _collect(s_os)
    assert loop_out[0] == os_out[0]  # registry
    assert loop_out[1] == os_out[1]  # tiles
    assert loop_out[2] == os_out[2]  # sources
    assert len(loop_out[1]) > 1000  # non-vacuous corpus


def test_one_shot_stands_down_above_cap(rects):
    """A corpus whose root exceeds the cap must take the distributed loop —
    the one task's work is bounded by construction."""
    feats, options = rects
    s = _run(feats, options, 10)
    assert not s.one_shot


def test_one_shot_stands_down_when_root_stops(spark):
    """A root the stop rule retains never enters one-shot mode (the level
    loop finishes it in a single crossing anyway)."""
    options = Options(max_zoom=14, index_max_zoom=5, index_max_points=100_000)
    feats = bench.synth_rect_features(spark, 50, options).localCheckpoint(
        eager=True
    )
    s = _run(feats, options, 200_000)
    assert not s.one_shot
    assert s.registry_df().count() == 1  # just the stopped root


def test_one_shot_resume_reuses_snapshot(rects, tmp_path):
    """Killed-and-resubmitted one-shot build reuses the oneshot/z=00
    snapshot and returns identical rows."""
    feats, options = rects
    wd = str(tmp_path / "wd")
    s1 = _run(feats, options, 200_000, workdir=wd, resume=True)
    assert s1.one_shot
    reg1 = sorted(tuple(r) for r in s1.registry_df().collect())
    assert os.path.isdir(os.path.join(wd, "oneshot"))
    s2 = _run(feats, options, 200_000, workdir=wd, resume=True)
    assert s2.one_shot
    reg2 = sorted(tuple(r) for r in s2.registry_df().collect())
    assert reg1 == reg2


def test_one_shot_drill_down_serves_from_retained_sources(spark):
    """getTile below the indexed zoom must drill down correctly from a
    one-shot first pass (sources retained by the kernel's stop rule)."""
    from geojson_vt_spark.operators.engine import GeoJSONVTSpark

    from .conftest import load_fixture

    old = os.environ.get("SPARK_GRAFT_ONE_SHOT_MAX_POINTS")
    os.environ["SPARK_GRAFT_ONE_SHOT_MAX_POINTS"] = "200000"
    try:
        eng = GeoJSONVTSpark(
            spark,
            data=load_fixture("us-states.json"),
            options=Options(index_max_zoom=4, index_max_points=64),
        )
        t = eng.get_tile(9, 148, 192)  # below indexed depth: drill-down path
        assert t is not None and len(t) > 0
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_ONE_SHOT_MAX_POINTS", None)
        else:
            os.environ["SPARK_GRAFT_ONE_SHOT_MAX_POINTS"] = old


def test_tile_counters_oracle_matches_duckdb(spark):
    """r4 verdict item 8: O13's registry counters get a driver-visible
    oracle row — the REAL pyramid (convert -> wrap -> split -> assembly)
    over deterministic event points vs a DuckDB recursive-CTE replay of
    buffered membership, wrap copies, and the stop rule."""
    from .oracle_harness import run_all

    res = run_all(spark, "/root/testdata/sf0.001", names={"tile_counters"})
    r = res["tile_counters"]
    assert r.get("hash_match"), r


def test_one_shot_plan_no_shuffle(rects):
    """The one-shot pass must reach the kernel through a NARROW coalesce —
    no shuffle Exchange anywhere between the materialized frontier and the
    single mapInPandas task."""
    from pyspark.sql import functions as F

    from geojson_vt_spark.plans.pyramid import UNIFIED_SCHEMA, _subtree_fn

    feats, options = rects
    import pandas as pd

    sub = _subtree_fn(options, None, emit_root=True)

    def fn(batches):
        pdfs = [p for p in batches if len(p)]
        if pdfs:
            yield sub(pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0])

    df = feats.coalesce(1).mapInPandas(fn, UNIFIED_SCHEMA)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Coalesce" in plan


def test_tile_counters_replay_parameter_sweep(spark):
    """Harden the recursive-CTE replay beyond the driver instance: depth
    and stop-cap sweeps must stay hash-equal (exercises deeper recursion,
    near-universal splitting at tiny caps, and early stops at big ones)."""
    import duckdb

    from geojson_vt_spark.analytics import sql_tile_counters, tile_counters

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    from .oracle_harness import compare

    for zmax, cap in [(2, 10), (4, 500), (1, 1)]:
        res = compare(
            tile_counters(spark, sf, zmax=zmax, cap=cap),
            con.sql(sql_tile_counters(zmax, cap)),
        )
        assert res["hash_match"], (zmax, cap, res)


def _random_geojson_corpus(seed, n):
    """Seeded mixed-geometry FeatureCollection: points, linestrings, and
    polygons with random sizes/positions, including dateline-adjacent
    longitudes to exercise the wrap copies."""
    import numpy as np

    rng = np.random.RandomState(seed)
    feats = []
    for i in range(n):
        kind = rng.randint(3)
        lon = float(rng.uniform(-179.9, 179.9))
        lat = float(rng.uniform(-79, 79))
        if rng.rand() < 0.1:  # park some near the antimeridian
            lon = float(rng.choice([-1, 1]) * rng.uniform(175, 179.9))
        if kind == 0:
            geom = {"type": "Point", "coordinates": [lon, lat]}
        elif kind == 1:
            k = int(rng.randint(2, 8))
            pts = [
                [lon + float(rng.uniform(-2, 2)), lat + float(rng.uniform(-2, 2))]
                for _ in range(k)
            ]
            geom = {"type": "LineString", "coordinates": pts}
        else:
            w = float(rng.uniform(0.05, 3.0))
            h = float(rng.uniform(0.05, 3.0))
            geom = {
                "type": "Polygon",
                "coordinates": [[
                    [lon, lat], [lon + w, lat], [lon + w, lat + h],
                    [lon, lat + h], [lon, lat],
                ]],
            }
        feats.append(
            {"type": "Feature", "id": i, "properties": {"i": i},
             "geometry": geom}
        )
    return {"type": "FeatureCollection", "features": feats}


def test_one_shot_equals_loop_random_mixed_geometry(spark):
    """Randomized corpora of mixed points/lines/polygons (dateline
    included): the one-shot kernel and the per-level loop must stay
    row-identical across registry, tiles, and sources — the rect-corpus
    equality test generalized to every geometry family the engine
    ingests."""
    from geojson_vt_spark.model import FEATURE_SCHEMA, feature_to_row
    from geojson_vt_spark.functions.convert import convert_geojson
    from geojson_vt_spark.functions.wrap import wrap_features

    for seed in (7, 21):
        options = Options(max_zoom=9, index_max_zoom=9, index_max_points=64)
        data = _random_geojson_corpus(seed, 400)
        rows = []
        for f in data["features"]:
            feats = convert_geojson(f, options)
            for fidx, (wcopy, conv) in enumerate(
                wrap_features(feats, options)
            ):
                rows.append(
                    feature_to_row(conv, 0, 0, 0, [wcopy, f["id"], fidx])
                )
        import pandas as pd

        pdf = pd.DataFrame(
            rows, columns=[f.name for f in FEATURE_SCHEMA.fields]
        )
        feats_df = spark.createDataFrame(pdf, schema=FEATURE_SCHEMA).localCheckpoint(
            eager=True
        )
        s_loop = _run(feats_df, options, 0)
        s_os = _run(feats_df, options, 200_000)
        assert not s_loop.one_shot and s_os.one_shot, seed
        assert _collect(s_loop) == _collect(s_os), seed
