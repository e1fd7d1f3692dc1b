"""ann_topk_ivf_matmul — the fused Arrow-matmul IVF scan — against its two
contracts: id/rank equality with the codegen IVF query (same centroid pick,
assignment argmax, probe set), and, at full probe, with the brute-force
exact top-k. Plus the plan property that makes it the 100 TB shape: one
scan, one Arrow eval, zero joins."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_matmul_matches_codegen_ivf(spark):
    from geojson_vt_spark.training import (
        ann_topk_ivf_matmul,
        q_ann_cosine_topk_ivf,
    )

    code = q_ann_cosine_topk_ivf(spark, SF, nlist=16, nprobe=4, k=10).collect()
    mat = ann_topk_ivf_matmul(_emb(spark), nlist=16, nprobe=4, k=10).collect()
    assert [(r.vec_id, r.rank) for r in sorted(mat, key=lambda r: r.rank)] == [
        (r.vec_id, r.rank) for r in sorted(code, key=lambda r: r.rank)
    ]
    # BLAS pairwise summation vs sequential fold: last-ulp drift only, and
    # both sides round to 6 so agreement is to the rounded decimal
    cm = {r.vec_id: r.cos for r in mat}
    for r in code:
        assert abs(cm[r.vec_id] - r.cos) <= 1e-6


def test_matmul_full_probe_equals_exact_bruteforce(spark):
    from geojson_vt_spark.analytics import q_ann_cosine_topk
    from geojson_vt_spark.training import ann_topk_ivf_matmul

    exact = q_ann_cosine_topk(spark, SF).orderBy("rank").collect()
    mat = (
        ann_topk_ivf_matmul(_emb(spark), nlist=16, nprobe=16, k=10)
        .orderBy("rank")
        .collect()
    )
    assert [r.vec_id for r in mat] == [r.vec_id for r in exact]


def test_matmul_plan_is_single_scan_no_join(spark):
    from geojson_vt_spark.training import ann_topk_ivf_matmul

    df = ann_topk_ivf_matmul(_emb(spark), nlist=16, nprobe=4, k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    # exactly one corpus scan feeds the Arrow kernel
    assert plan.count("Scan parquet") == 1, plan
    assert "MapInPandas" in plan or "ArrowEval" in plan, plan


def test_matmul_prunes_non_probed_rows(spark):
    """nprobe=1 must emit only rows assigned to the query's own list — i.e.
    strictly fewer refined candidates than the corpus (the pruning is real,
    not a full refine with a post-filter)."""
    from geojson_vt_spark.training import ann_topk_ivf_matmul

    emb = _emb(spark)
    n = emb.count()
    # k large enough to surface every candidate the single probed list holds
    cand = ann_topk_ivf_matmul(emb, nlist=16, nprobe=1, k=n).count()
    assert 0 < cand < n
