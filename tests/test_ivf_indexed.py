"""On-disk IVF index (ivf_index_write / ann_topk_ivf_indexed): the stored
layout must answer queries identically to the scan-time IVF variants, and —
the point of the layout — the probe filter must prune at the PARTITION
level, so non-probed inverted lists are never read."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def index_path(spark, tmp_path_factory):
    from geojson_vt_spark.training import ivf_index_write

    p = str(tmp_path_factory.mktemp("ivf") / "index")
    ivf_index_write(_emb(spark), p, nlist=16)
    return p


def _qvec(spark):
    return [
        float(v)
        for v in _emb(spark).where(F.col("vec_id") == 0).collect()[0].embedding
    ]


def test_indexed_equals_codegen_ivf(spark, index_path):
    from geojson_vt_spark.training import (
        ann_topk_ivf_indexed,
        q_ann_cosine_topk_ivf,
    )

    code = q_ann_cosine_topk_ivf(spark, SF, nlist=16, nprobe=4, k=10).collect()
    idx = ann_topk_ivf_indexed(
        spark, index_path, _qvec(spark), exclude_id=0, nprobe=4, k=10
    ).collect()
    key = lambda r: r.rank
    assert [(r.vec_id, r.cos, r.rank) for r in sorted(idx, key=key)] == [
        (r.vec_id, r.cos, r.rank) for r in sorted(code, key=key)
    ]


def test_indexed_full_probe_equals_exact(spark, index_path):
    from geojson_vt_spark.analytics import q_ann_cosine_topk
    from geojson_vt_spark.training import ann_topk_ivf_indexed

    exact = q_ann_cosine_topk(spark, SF).orderBy("rank").collect()
    idx = (
        ann_topk_ivf_indexed(
            spark, index_path, _qvec(spark), exclude_id=0, nprobe=16, k=10
        )
        .orderBy("rank")
        .collect()
    )
    assert [r.vec_id for r in idx] == [r.vec_id for r in exact]


def test_probe_filter_is_partition_pruning(spark, index_path):
    """list_id must appear in the scan's PartitionFilters (pruned file
    listing), NOT as a post-scan data filter — and the pruned plan must
    read strictly fewer partition directories than the index holds."""
    from geojson_vt_spark.training import ann_topk_ivf_indexed

    df = ann_topk_ivf_indexed(
        spark, index_path, _qvec(spark), exclude_id=0, nprobe=4, k=10
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan and "list_id" in scan[0], plan

    # Functional proof of pruning on the exact scan shape the query uses
    # (isin over the partition column): after execution the scan's own
    # metrics report how many partition directories were actually read.
    # (inputFiles() can't show this — it lists the relation's files before
    # pruning; the full query wraps the scan in AQE stages, so assert on
    # the bare scan, whose PartitionFilters line above ties it to the query.)
    probed = spark.read.parquet(f"{index_path}/lists").where(
        F.col("list_id").isin([1, 2, 3, 4])
    )
    probed.collect()
    leaves = probed._jdf.queryExecution().executedPlan().collectLeaves()
    scans = [
        leaves.apply(i)
        for i in range(leaves.length())
        if "parquet" in leaves.apply(i).nodeName().lower()
    ]
    assert scans
    read_parts = int(scans[0].metrics().apply("numPartitions").value())
    assert read_parts == 4, read_parts  # 4 of 16 lists


def test_index_write_assignment_matches_scan_time(spark, index_path):
    """Stored list_id per vector == the scan-time codegen assignment."""
    from geojson_vt_spark.training import _ivf_centroids, _ivf_rank_structs

    e = _emb(spark)
    ranked = _ivf_rank_structs(_ivf_centroids(e, 16))
    live = {
        r.vec_id: r.lid
        for r in e.select("vec_id", ranked[0]["rk"].alias("lid")).collect()
    }
    stored = {
        r.vec_id: int(r.list_id)
        for r in spark.read.parquet(f"{index_path}/lists")
        .select("vec_id", "list_id")
        .collect()
    }
    assert stored == live
