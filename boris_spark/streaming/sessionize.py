"""Structured-Streaming sessionization: the streaming counterpart of the
batch ``events_sessionize`` query (ops/queries.py).

A continuously-arriving event log (file source here; Kafka at deploy) is
grouped into per-user activity sessions with ``session_window`` — Spark's
native stateful session operator — under an event-time watermark so late
events merge into (or extend) their session until the watermark passes, then
state is evicted. All aggregation is built-in (no Python in the stream).

At 100 TB the shape holds: state is partitioned by user_id (the groupBy
key), watermark bounds state size, and the sink is an append-only table of
closed sessions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "url string, dwell_ms bigint"
)


def stream_sessionize(
    spark: SparkSession,
    source_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    schema: str = EVENTS_SCHEMA,
    glob: str | None = None,
) -> DataFrame:
    """Streaming DataFrame of closed sessions:
    (user_id, session_start, session_end, n_events). *glob* restricts the
    file source to matching files (the file stream source requires a
    directory path)."""
    reader = spark.readStream.schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    events = reader.parquet(source_dir).withWatermark("ts", watermark)
    return (
        events.groupBy(
            F.col("user_id"), F.session_window("ts", gap).alias("w")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def run_available_now(stream_df: DataFrame, checkpoint: str, table_name: str):
    """Drain everything currently available (Trigger.AvailableNow) into an
    in-memory sink; returns the finished query. The same writeStream with a
    parquet/Iceberg sink + trigger(processingTime=...) is the deploy form."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return q
