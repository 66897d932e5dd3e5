"""Structured-Streaming per-host fetch-rate monitoring: tumbling-window
event counts under an event-time watermark — the crawl-operations dashboard
aggregation (fetches/minute per host) that, at deploy, reads the fetch-log
Kafka topic and feeds politeness autoscaling (a host whose measured rate
nears its Crawl-delay budget gets its frontier dequeue throttled next
round).

``session_window`` (sessionize.py) covers Spark's dynamic-window stateful
operator; this module covers the FIXED tumbling window + watermark form —
the canonical streaming aggregation. Append mode: each (host, window) row
is emitted exactly once when the watermark passes the window end, then its
state is evicted, so state is bounded by (hosts active within the watermark
horizon) — the 100 TB form. Finite sources drain with Trigger.AvailableNow
behind the shared sentinel-staging helper (sessionize.stage_with_sentinel).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sessionize import stage_with_sentinel

RATE_HOSTS = 20  # synthetic host derivation: host = 'h' || (user_id % 20)


def stream_host_rates(
    spark: SparkSession,
    source_dir: str,
    window: str = "60 seconds",
    watermark: str = "2 hours",
    schema: str = "",
    glob: str | None = None,
) -> DataFrame:
    """Streaming DataFrame of (host, window_start, n_events): tumbling
    event-time windows per host. The host key derives from user_id
    closed-form (the events table stands in for a fetch log)."""
    reader = spark.readStream.schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    events = reader.parquet(source_dir).withWatermark("ts", watermark)
    host = F.concat(
        F.lit("h"), F.pmod("user_id", F.lit(RATE_HOSTS)).cast("string")
    )
    # No sentinel filter needed (and none is safe pre-watermark: a filter
    # pushed below the EventTimeWatermark operator would hide the sentinel
    # from watermark tracking): the sentinel's own window sits 30 days past
    # every real event, the watermark never passes it, so it stays in state
    # and never reaches the sink.
    return (
        events.groupBy(host.alias("host"), F.window("ts", window).alias("w"))
        .agg(F.count("*").cast("long").alias("n_events"))
        .select("host", F.col("w.start").alias("window_start"), "n_events")
    )


def run_host_rates_append(
    spark: SparkSession,
    source_dir: str,
    workdir: str,
    glob: str = "*.parquet",
    schema: str = "",
    window: str = "60 seconds",
    watermark: str = "2 hours",
) -> DataFrame:
    """Append-mode AvailableNow drain of a finite fetch log; returns the
    closed (host, window_start, n_events) table read back from the parquet
    sink (the sentinel's far-future window never closes, so it never
    lands in the sink)."""
    src = stage_with_sentinel(spark, source_dir, workdir, glob, schema)
    sdf = stream_host_rates(
        spark, src, window=window, watermark=watermark, schema=schema
    )
    out = os.path.join(workdir, "out")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            sdf.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", os.path.join(workdir, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError(
            "host-rates drain did not terminate within 600s; parquet sink "
            f"at {out} is incomplete"
        )
    return spark.read.parquet(out)
