"""Bucketed storage (sources/bucketed.py): the layout must remove the
exchange from co-located joins and keyed aggregations — visible in the
physical plan, not assumed — and must not change any result values."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    from geojson_vt_spark.sources.bucketed import write_bucketed

    root = tmp_path_factory.mktemp("bucketed")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    write_bucketed(
        docs.select("doc_id", "source", "n_chars"),
        "t_docs_b",
        "doc_id",
        n_buckets=8,
        path=str(root / "docs"),
    )
    write_bucketed(
        embs.select("vec_id", "label"),
        "t_emb_b",
        "vec_id",
        n_buckets=8,
        path=str(root / "embs"),
    )
    yield "t_docs_b", "t_emb_b"
    spark.sql("DROP TABLE IF EXISTS t_docs_b")
    spark.sql("DROP TABLE IF EXISTS t_emb_b")


def _no_broadcast(spark):
    """Force the join strategy decision: with broadcast off, only bucket
    co-location can remove the exchange."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    return old


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    docs_t, emb_t = bucketed_tables
    old = _no_broadcast(spark)
    try:
        d = spark.table(docs_t)
        e = spark.table(emb_t)
        joined = d.join(e, d["doc_id"] == e["vec_id"], "inner")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_does_exchange(spark, bucketed_tables):
    """Control: the same join over plain parquet reads shuffles — proving
    the gate above is the bucketing, not some other plan feature."""
    old = _no_broadcast(spark)
    try:
        d = spark.read.parquet(f"{SF}/documents.parquet").select(
            "doc_id", "source", "n_chars"
        )
        e = spark.read.parquet(f"{SF}/embeddings.parquet").select(
            "vec_id", "label"
        )
        plan = _plan(d.join(e, d["doc_id"] == e["vec_id"], "inner"))
        assert "Exchange" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_reuses_partitioning(spark, bucketed_tables):
    """The stored hash-partitioning serves aggregation too: groupBy on the
    bucket key plans with zero Exchange (one-phase aggregate)."""
    docs_t, _ = bucketed_tables
    agg = spark.table(docs_t).groupBy("doc_id").agg(
        F.sum("n_chars").alias("c")
    )
    plan = _plan(agg)
    assert "Exchange" not in plan, plan


def test_bucketed_join_values_equal_plain_join(spark, bucketed_tables):
    docs_t, emb_t = bucketed_tables
    d = spark.table(docs_t)
    e = spark.table(emb_t)
    got = sorted(
        (r.doc_id, r.source, r.n_chars, r.label)
        for r in d.join(e, d["doc_id"] == e["vec_id"], "inner").collect()
    )
    dp = spark.read.parquet(f"{SF}/documents.parquet")
    ep = spark.read.parquet(f"{SF}/embeddings.parquet")
    want = sorted(
        (r.doc_id, r.source, r.n_chars, r.label)
        for r in dp.join(ep, dp["doc_id"] == ep["vec_id"], "inner").collect()
    )
    assert got == want and len(got) == 500


def test_driver_query_shape(spark):
    from geojson_vt_spark.sources.bucketed import (
        colocated_doc_embedding_join,
    )

    res = colocated_doc_embedding_join(spark, SF)
    rows = res.collect()
    assert res.columns == ["source", "label", "n_docs", "total_chars"]
    assert sum(r.n_docs for r in rows) == 500


def test_driver_query_oracle(spark):
    from .oracle_harness import run_all

    res = run_all(spark, SF, names={"colocated_doc_embedding_join"})
    r = res["colocated_doc_embedding_join"]
    assert r.get("hash_match") and r.get("cols_match"), r
