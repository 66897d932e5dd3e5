"""Streaming frontier ingest: discovered links arrive continuously (e.g.
from fetcher executors at deploy) and must merge into the frontier exactly
once per canonical URL — the streaming form of the round job's
frontier-merge + seen-dedup stages (crawler.py).

``dropDuplicates`` on the canonical-url hash under a watermark is Spark's
built-in streaming dedup state store: the first arrival of each URL within
the watermark horizon passes, duplicates are dropped, and state is evicted
as event time advances — the Bloom-shard seen filter's role, played by the
state store. Priority is the lexicographic-min path_key per URL in each
trigger window (the DFS-priority recompute).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DISCOVERY_SCHEMA = (
    "url_canon string, url_hash bigint, host string, path_key string, "
    "discovered_ts timestamp"
)


def stream_frontier_dedup(
    spark: SparkSession,
    source_dir: str,
    watermark: str = "1 hour",
    schema: str = DISCOVERY_SCHEMA,
) -> DataFrame:
    disc = (
        spark.readStream.schema(schema).parquet(source_dir)
        .withWatermark("discovered_ts", watermark)
    )
    return disc.dropDuplicates(["url_hash", "url_canon"]).select(
        "url_canon", "url_hash", "host", "path_key", "discovered_ts"
    )


def run_append_available_now(stream_df: DataFrame, checkpoint: str, out_dir: str):
    q = (
        stream_df.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "availableNow drain did not finish within 300s; "
            "sink is incomplete — refusing to read it"
        )
    return q
