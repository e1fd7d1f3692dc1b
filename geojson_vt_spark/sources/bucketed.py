"""Bucketed corpus storage: co-located joins and aggregations with NO
shuffle on the stored side.

At 100 TB the dominant cost of every per-document join (documents ×
embeddings, documents × signatures, corpus × keep-list refinement) is the
exchange of the big side. Bucketing removes it from the plan entirely:
`bucketBy(n, key)` writes each table pre-hash-partitioned into n physical
buckets, so a join of two tables bucketed on their join keys (same n) is a
SortMergeJoin over already-co-located buckets — Catalyst's
EnsureRequirements sees the scan's HashPartitioning satisfies the join's
requirement and inserts no Exchange on either side. The same stored
partitioning is reused by every downstream `groupBy(key)`: the partial/
final aggregate pair collapses to a single exchange-free aggregate.

This is the storage-layout counterpart of `training.ivf_index_write`
(partition pruning for selective reads) — bucketing is for co-location of
full-table joins/aggs, partitionBy for pruning of selective scans; a real
lakehouse deployment uses both (and on Iceberg the same layout is a
bucket-transform partition spec — see sources/table_format.py for the
catalog seam).

Tests: tests/test_bucketed.py gates the plans (zero Exchange operators in
the bucketed join and the bucketed groupBy with broadcast disabled) and
asserts row-set equality with the plain parquet join. The driver query
`colocated_doc_embedding_join` is oracle-checked against the equivalent
DuckDB join at sf0.01.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str,
    n_buckets: int = 32,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist `df` as a parquet table hash-bucketed (and per-file sorted)
    by `key`. `path` makes it an external table — always pass it in
    environments without a configured warehouse dir (this sandbox). Joins
    between tables written with the SAME n_buckets on their join keys plan
    with no Exchange; `sort=True` additionally lets single-file-per-bucket
    scans skip the SortMergeJoin's sort."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def colocated_doc_embedding_join(
    spark: SparkSession,
    sf_dir: str,
    workdir: str | None = None,
    n_buckets: int = 8,
) -> DataFrame:
    """Driver query: enrich every document with its embedding's label via
    the bucketed layout — both tables are first materialized bucketed on
    their ids, then joined co-located (zero Exchange, plan-gated in
    tests/test_bucketed.py). Result values are layout-independent, so the
    DuckDB oracle is the plain join.

    Idempotent by construction: the default workdir and the table names are
    keyed to sf_dir, so repeated invocations (bench reps, oracle harness)
    overwrite one fixed location instead of leaking temp dirs; the returned
    DataFrame stays readable because the backing files persist. Concurrent
    sessions sharing one metastore should pass distinct workdirs."""
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    if workdir is None:
        workdir = os.path.join(tempfile.gettempdir(), f"gvt_bucketed_{key}")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dt, et = f"gvt_docs_b_{key}", f"gvt_emb_b_{key}"
    write_bucketed(
        docs.select("doc_id", "source", "n_chars"),
        dt,
        "doc_id",
        n_buckets,
        path=os.path.join(workdir, "docs"),
    )
    write_bucketed(
        embs.select("vec_id", "label"),
        et,
        "vec_id",
        n_buckets,
        path=os.path.join(workdir, "embs"),
    )
    d = spark.table(dt)
    e = spark.table(et)
    return (
        d.join(e, d["doc_id"] == e["vec_id"], "inner")
        .groupBy("source", "label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


SQL_COLOCATED_JOIN = """
SELECT d.source AS source,
       e.label AS label,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(d.n_chars) AS BIGINT) AS total_chars
FROM documents d
JOIN embeddings e ON d.doc_id = e.vec_id
GROUP BY d.source, e.label
"""

QUERIES = {"colocated_doc_embedding_join": colocated_doc_embedding_join}
ORACLES = {"colocated_doc_embedding_join": SQL_COLOCATED_JOIN}
