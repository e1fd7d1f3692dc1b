"""Custom stateful streaming operator: first-seen exact dedup.

A training-data ingest stream must admit each document content exactly once
across micro-batches — Spark's built-in dropDuplicates keeps unbounded state
keyed by the full row; this operator keeps ONE boolean per content hash via
applyInPandasWithState (GroupState), the custom-stateful-operator pattern
the north rule calls for.

Shape: documents stream -> content hash (xxhash64, JVM-side) -> groupBy(hash)
-> stateful kernel emits only rows whose hash has no state yet, then marks
the state. Within one micro-batch, ties break deterministically by doc_id
(lowest wins) so replays are stable. At 100 TB the state store is
hash-partitioned by the same key as the shuffle — one stateful exchange,
state size = one tombstone per distinct content.

Batch/stream parity: the batch twin is a min(doc_id)-per-hash semi-join.
The equality holds for ORDERED ingest (micro-batches arrive in doc_id
order, as the test fixtures do): within one micro-batch ties break by
lowest doc_id, but ACROSS micro-batches the operator keeps the first
ARRIVAL — by design, since "first seen" is the ingest-dedup contract — so
out-of-order file arrival can elect a different (equally valid) surviving
representative than the batch twin's global min. Tests drain the stream
with availableNow (multiple micro-batches via maxFilesPerTrigger, ordered
fixtures) and assert equality under that scope.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("content_hash", T.LongType(), True),
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType(), True)])


def stream_documents(spark: SparkSession, path: str, max_files: int = 1) -> DataFrame:
    """File-source stream over a documents parquet directory; maxFilesPerTrigger
    forces multiple micro-batches so the cross-batch state path is exercised."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def first_seen_dedup_stream(docs: DataFrame) -> DataFrame:
    """Stateful first-seen filter keyed on the content hash."""
    hashed = docs.withColumn("content_hash", F.xxhash64("text"))

    def emit_first(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return  # content already admitted in an earlier micro-batch
        best_id = None
        best_src = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            i = pdf["doc_id"].idxmin()  # deterministic within-batch tie-break
            did = int(pdf["doc_id"][i])
            if best_id is None or did < best_id:
                best_id = did
                best_src = pdf["source"][i]
        if best_id is None:
            return
        state.update((True,))
        yield pd.DataFrame(
            {"content_hash": [key[0]], "doc_id": [best_id], "source": [best_src]}
        )

    return hashed.groupBy("content_hash").applyInPandasWithState(
        emit_first,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def first_seen_dedup_batch(docs: DataFrame) -> DataFrame:
    """Batch twin: lowest doc_id per content hash (same tie-break)."""
    hashed = docs.withColumn("content_hash", F.xxhash64("text"))
    w = hashed.groupBy("content_hash").agg(F.min("doc_id").alias("doc_id"))
    return (
        hashed.join(w, ["content_hash", "doc_id"], "leftsemi")
        .select("content_hash", "doc_id", "source")
    )


def run_dedup_to_memory(
    spark: SparkSession, path: str, table: str = "first_seen", max_files: int = 1
):
    """Drain `path` through the stateful dedup into a memory sink."""
    q = (
        first_seen_dedup_stream(stream_documents(spark, path, max_files))
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
