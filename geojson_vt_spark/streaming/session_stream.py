"""Streaming sessionization: Spark's native session windows over the
events stream — the gap-closed session aggregation `training.
sessionize_events` computes in batch, expressed as a stateful streaming
aggregation with `F.session_window` + a watermark bounding state.

Semantics note (the one boundary where the two differ, documented rather
than papered over): the batch operator keeps an event in-session when its
gap is <= gap_us (strictly-greater opens a session); a Spark session
window spans [first_ts, last_ts + gap) and merges an event only when it
lands strictly BEFORE the current end, so an event at exactly last_ts +
gap opens a new session. On continuous-timestamp data an exact-to-the-
microsecond tie never occurs — the parity test over the synthetic events
table proves the full result sets equal, which certifies its data holds
no such tie. Producers with quantized timestamps (whole-second logs)
should pick a gap between the quanta.

State/scale shape: the aggregation state is one open session per entity
(merged in the state store, hash-partitioned by user_id); the watermark
closes sessions whose end precedes it, so state is bounded by entity
cardinality x late-data horizon, not stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..training import SESSION_GAP_US

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampNTZType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def stream_events(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def session_aggregate(
    events: DataFrame,
    gap_us: int = SESSION_GAP_US,
    watermark: str = "1 hour",
) -> DataFrame:
    """The session aggregation, streaming or batch (same plan text): group
    by (user_id, session_window(ts, gap)) and emit the per-session stats in
    `sessionize_events`' column shape — start_us/end_us reconstructed from
    the window bounds (window end = last event + gap, so last_event_us =
    end_us_of_window - gap_us)."""
    gap_str = f"{gap_us} microseconds"
    # watermarks/session windows require TIMESTAMP (not NTZ): cast for the
    # windowing, then convert the window bounds BACK to NTZ wall-clock
    # before the epoch diff — NTZ -> TZ -> NTZ round-trips to the same
    # wall-clock under any fixed session time zone, so the output matches
    # the pure-NTZ batch operator bit-for-bit. (A session tz whose DST
    # transition falls inside the data range could alias wall-clocks; the
    # parity test pins the invariant on this corpus.)
    df = events.withColumn("_ts", F.col("ts").cast("timestamp"))
    if df.isStreaming:
        df = df.withWatermark("_ts", watermark)
    us = lambda c: F.expr(  # noqa: E731
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"CAST({c} AS TIMESTAMP_NTZ))"
    )
    return (
        df.groupBy("user_id", F.session_window("_ts", gap_str).alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 9).alias("total_value"),
        )
        .select(
            "user_id",
            us("w.start").alias("start_us"),
            (us("w.end") - F.lit(gap_us)).alias("end_us"),
            "n_events",
            "total_value",
        )
    )


def run_sessions_to_memory(
    spark: SparkSession,
    stream_dir: str,
    table: str = "t_sessions",
    gap_us: int = SESSION_GAP_US,
    max_files_per_trigger: int | None = None,
):
    """Drain the events directory with availableNow through the streaming
    session aggregation into memory-sink `table`. Complete output mode:
    the final trigger's watermark sits behind the trailing sessions (a
    session's end is last_event + gap, always ahead of the last data), so
    append mode would hold them back forever on a bounded drain — complete
    emits the full session set, which is also what the parity test wants."""
    q = (
        session_aggregate(
            stream_events(spark, stream_dir, max_files_per_trigger),
            gap_us=gap_us,
        )
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", stream_dir.rstrip("/") + "_sessions_ckpt"
        )
        .start()
    )
    q.awaitTermination()
    return q
