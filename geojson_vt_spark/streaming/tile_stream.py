"""Structured Streaming surface: the event->tile heatmap as a stream.

The reference has no streaming operators (its `updateData` is micro-batch
incremental maintenance, correctly modeled as batch MERGE — SURVEY.md §2).
This module adds the streaming twin a live tile service needs: the SAME
logical plan as training.q_events_tile_heatmap (deterministic point synth ->
mercator cell binning -> hourly window aggregate), expressed over
`readStream` with a watermark for late events. Batch/stream parity is
asserted in tests (availableNow drain == batch result), which is exactly
Spark's unified-engine guarantee put under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..training import _event_points, heatmap_cells

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over the events parquet (new files under `path`
    keep flowing; in tests the existing file is drained with availableNow)."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def tile_heatmap_stream(
    events: DataFrame, z: int = 6, watermark: str = "2 hours"
) -> DataFrame:
    """Hourly z-tile heatmap with late-data handling: watermark bounds state,
    window+cell grouping keys partition the shuffle exactly like the batch
    twin."""
    cells = heatmap_cells(_event_points(events), z)
    return (
        cells.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "cx", "cy")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("hour_start"),
            "cx",
            "cy",
            "n_events",
            "sum_value",
        )
    )


def run_to_memory(
    spark: SparkSession, path: str, table: str = "tile_heatmap", z: int = 6
):
    """Drain everything currently in `path` into an in-memory sink table;
    returns the finished StreamingQuery. Complete mode: the aggregate is the
    whole point, and the memory sink is test-sized."""
    q = (
        tile_heatmap_stream(stream_events(spark, path), z)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
