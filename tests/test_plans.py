"""Physical-plan quality gates: the properties that make the engine viable at
100 TB must be visible in `explain` output, not just assumed — filter/column
pushdown into the parquet scan, broadcast joins for dim tables, whole-stage
codegen around the Column-only queries, and no cartesian products."""

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def feature_table(spark, tmp_path_factory):
    """A parquet-backed FEATURE_SCHEMA table (what the 100 TB corpus looks
    like after O1) for scan-pushdown checks."""
    import json

    from geojson_vt_spark.config import Options
    from geojson_vt_spark.model import FEATURE_SCHEMA
    from geojson_vt_spark.operators.engine import geojson_to_feature_rows

    from .conftest import load_fixture

    path = str(tmp_path_factory.mktemp("plans") / "features.parquet")
    rows = geojson_to_feature_rows(load_fixture("us-states.json"), Options())
    spark.createDataFrame(rows, FEATURE_SCHEMA).write.parquet(path)
    return spark.read.parquet(path)


def test_single_tile_bbox_pushdown(feature_table):
    """O16: the tile bbox predicate must reach the parquet scan as
    PushedFilters — the Arrow clip kernel only ever sees straddling rows."""
    from geojson_vt_spark.operators.geojson_to_tile import tile_from_features_df

    plan = _plan(tile_from_features_df(feature_table, 7, 37, 48))
    assert "PushedFilters: [IsNotNull(maxx)" in plan
    assert "GreaterThanOrEqual(maxx" in plan
    # the full filter (both axes) runs before the Python kernel
    assert plan.index("Filter") > plan.index("MapInPandas") or "minx" in plan.split("Filter", 1)[1].split("+-")[0]


def test_pip_join_broadcasts_dim(spark):
    """Point-in-polygon: the polygon/bbox side is a dim table and must be
    broadcast, never shuffled or crossed."""
    from geojson_vt_spark.analytics import q_pip_join

    plan = _plan(q_pip_join(spark, "/root/testdata/sf0.001"))
    assert "Broadcast" in plan
    assert "CartesianProduct" not in plan


def test_knn_join_no_cartesian(spark):
    from geojson_vt_spark.analytics import q_knn_join

    plan = _plan(q_knn_join(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in plan


def test_connected_components_round_is_equi_join(spark):
    """Each CC label-propagation round must be an equi-join on the vertex
    key + a partial-aggregated min — never a cartesian."""
    from pyspark.sql import functions as F

    from geojson_vt_spark.training import cc_round

    edges = spark.range(200).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    labels = edges.select(F.col("src").alias("doc_id")).withColumn(
        "label", F.col("doc_id")
    )
    plan = _plan(cc_round(edges, labels))
    assert "CartesianProduct" not in plan
    assert "partial_min" in plan or "HashAggregate" in plan


def test_dedup_keep_broadcasts_drop_list(spark):
    """Corpus dedup must anti-join a broadcast drop-list against the big
    table — one scan, no shuffle of the corpus."""
    from geojson_vt_spark.training import q_dedup_keep

    plan = _plan(q_dedup_keep(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_heatmap_partial_aggregation(spark):
    """The heatmap must map-side combine (partial_count/sum before the
    exchange) — at 10^12 events the shuffle carries cells, not rows."""
    from geojson_vt_spark.training import q_events_tile_heatmap

    plan = _plan(q_events_tile_heatmap(spark, "/root/testdata/sf0.001"))
    # tree prints top-down: final agg, then the exchange, then the partial
    # agg below it — i.e. map-side combine BEFORE the shuffle at runtime
    assert "partial_count" in plan
    assert "Exchange hashpartitioning" in plan
    assert plan.index("Exchange") < plan.index("partial_count")


def test_heatmap_whole_stage_codegen(spark):
    from geojson_vt_spark.training import q_events_tile_heatmap

    # AQE prints a placeholder until the final plan; disable it to see the
    # codegen spans statically
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _plan(q_events_tile_heatmap(spark, "/root/testdata/sf0.001"))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # '*(n)' prefixes mark WholeStageCodegen spans in the compact plan form
    assert "*(1)" in plan and "*(2)" in plan
    assert "Python" not in plan  # Column-only: no Python in the plan


def test_documents_span_filter_before_arrow(spark):
    """O1: the geojson-kind filter must run before the Arrow boundary so
    text/media spans never cross into Python."""
    from geojson_vt_spark.config import Options
    from geojson_vt_spark.sources.documents import (
        features_from_documents,
        synthesize_documents,
    )

    docs = synthesize_documents(spark, ['{"type":"FeatureCollection","features":[]}'], n_docs=4)
    df = features_from_documents(docs, Options())
    opt = _optimized(df)
    # the filter sits below the Python evaluation node in the optimized plan
    assert opt.index("geojson") > opt.index("MapInPandas")


def test_minhash_bands_shuffle_on_band_keys(spark):
    """MinHash-LSH: the candidate join must be an equi-join on the band keys
    (hash-partitioned), not a nested-loop over pairs."""
    from geojson_vt_spark.training import q_minhash_lsh_dedup

    plan = _plan(q_minhash_lsh_dedup(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the candidate join keys include the band columns (equi-join; hash or
    # broadcast by size, sort-merge at scale — all fine, nested-loop is not)
    import re

    assert re.search(r"Join \[source\S*, band", plan), plan[:2000]


def test_ann_exact_is_single_pass(spark):
    """Brute-force ANN: one broadcast of the query vector, no shuffle of the
    embeddings until the final top-k."""
    from geojson_vt_spark.analytics import q_ann_cosine_topk

    plan = _plan(q_ann_cosine_topk(spark, "/root/testdata/sf0.001"))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_get_tile_ancestor_lookup_is_pruned(spark):
    """Serving path: the drill-down ancestor walk must be one isin-filtered
    registry lookup (<= 24 keys), never a full-registry collect."""
    import json

    from geojson_vt_spark.config import Options
    from geojson_vt_spark.operators.engine import GeoJSONVTSpark

    from .conftest import load_fixture

    eng = GeoJSONVTSpark(
        spark, data=load_fixture("single-geom.json"), options=Options()
    )
    anc = eng._ancestor_chain(14, 3000, 5000)
    assert len(anc) == 14
    df = eng._ancestor_lookup_df(anc)
    opt = _optimized(df)
    # the packed-key IN list sits in a Filter over the registry relation
    # (Catalyst renders large literal lists as INSET)
    assert " INSET " in opt or " IN (" in opt, opt[:1500]
    rows = df.collect()
    assert len(rows) <= len(anc)


def test_cluster_tree_rows_broadcasts_window_not_points(spark):
    """Cluster range queries: the broadcast build sides are the FILTERED
    tree window and the window-pruned points — the full points table is
    never the build side, and no nested-loop join appears."""
    import json

    from geojson_vt_spark.config import Options
    from geojson_vt_spark.operators.engine import GeoJSONVTSpark

    from .conftest import load_fixture

    eng = GeoJSONVTSpark(
        spark,
        data=load_fixture("places.json"),
        options=Options(cluster=True),
    )
    idx = eng.cluster_index
    from pyspark.sql import functions as F

    df = idx._tree_rows_df(2, (F.col("qx") >= 0.2) & (F.col("qx") <= 0.8))
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # two broadcast hash joins: the leftsemi points-pruning and the final
    # left join against the pruned points
    assert plan.count("BroadcastHashJoin") >= 2 or (
        "BroadcastHashJoin" in plan and "BroadcastExchange" in plan
    ), plan[:2000]


def test_grid_cluster_batched_materialization_count(spark):
    """The batched grid-cluster engine's reason to exist: the serial
    barrier count is ceil(levels / batch) + 0 eager point materializations,
    not one per zoom. Gate it structurally by counting _checkpoint calls."""
    import math
    import os

    from pyspark.sql import functions as F

    import geojson_vt_spark.cluster.grid as grid
    from geojson_vt_spark.config import ClusterOptions

    n = 2000
    pts = spark.range(n).select(
        F.col("id").alias("idx"),
        (F.pmod(F.col("id") * 7919 + 1, F.lit(4999)) / 4999.0).alias("px"),
        (F.pmod(F.col("id") * 104729 + 5, F.lit(4999)) / 4999.0).alias("py"),
        F.lit(None).cast("string").alias("id"),
        F.lit(None).cast("string").alias("tags"),
    ).localCheckpoint(eager=True)
    opts = ClusterOptions(max_zoom=8)  # 9 levels -> 2 barriers (4+8 tiers)

    calls = []
    orig = grid._checkpoint

    def counting(df, workdir, name):
        calls.append(name)
        return orig(df, workdir, name)

    old_mode = os.environ.get("SPARK_GRAFT_CLUSTER_LEVEL_MODE")
    os.environ["SPARK_GRAFT_CLUSTER_LEVEL_MODE"] = "batched"
    grid._checkpoint = counting
    try:
        grid.build_grid_trees(pts, opts, n)
    finally:
        grid._checkpoint = orig
        if old_mode is None:
            del os.environ["SPARK_GRAFT_CLUSTER_LEVEL_MODE"]
        else:
            os.environ["SPARK_GRAFT_CLUSTER_LEVEL_MODE"] = old_mode

    from geojson_vt_spark.cluster.grid import batch_plan

    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    expected = len(batch_plan(opts, parts))
    assert len(calls) == expected, calls
    # two-tier plan: 1 head batch (k=4, raw-point skew safety) +
    # ceil((levels-4)/8) tail batches (cell-collapsed frontiers run deeper);
    # 9 levels -> 2 barriers. Bounded per-anchor skew is what the extra
    # barrier over the round-2 single-anchor plan buys (batch_plan doc).
    import math as _math

    levels = opts.max_zoom - opts.min_zoom + 1
    assert expected == 1 + _math.ceil((levels - 4) / 8)
    assert all(name.startswith("ctree/zb=") for name in calls), calls


def test_ann_topk_bounded_heap(spark, tmp_path):
    """Round-5 gate (VERDICT r4 wrong #1): every single-query ANN variant's
    global top-k must plan TakeOrderedAndProject — a per-partition bounded
    heap + driver merge, the `vocab_topk` plan — so no single task ever
    sorts the full candidate set. The rank window must run strictly ABOVE
    the bounded heap (over <= k rows only), never as a global row_number
    over the candidates."""
    from geojson_vt_spark.analytics import q_ann_cosine_topk
    from geojson_vt_spark.training import (
        ann_topk_ivf_indexed,
        ann_topk_ivf_matmul,
        ivf_index_write,
        q_ann_cosine_topk_ivf,
        q_ann_cosine_topk_lsh,
    )

    sf = "/root/testdata/sf0.001"
    e = spark.read.parquet(f"{sf}/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    ivf_index_write(e, idx)
    qvec = [float(v) for v in e.where(F.col("vec_id") == 0).head()["embedding"]]
    dfs = {
        "brute": q_ann_cosine_topk(spark, sf),
        "lsh": q_ann_cosine_topk_lsh(spark, sf),
        "ivf": q_ann_cosine_topk_ivf(spark, sf),
        "matmul": ann_topk_ivf_matmul(e),
        "indexed": ann_topk_ivf_indexed(spark, idx, qvec, exclude_id=0),
    }
    for name, df in dfs.items():
        plan = _plan(df)
        assert "TakeOrderedAndProject" in plan, (name, plan)
        assert plan.index("Window") < plan.index("TakeOrderedAndProject"), name
