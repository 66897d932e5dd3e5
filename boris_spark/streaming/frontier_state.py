"""Custom stateful streaming operator: first-discovery frontier dedup with
``applyInPandasWithState``.

The built-in ``dropDuplicates`` form (frontier_feed.py) drops re-discovered
URLs but cannot express the engine's DFS-priority rule — the FIRST emission
must carry the lexicographically-minimal ``path_key`` seen within the
micro-batch, and later batches must stay silent for that URL. This operator
keeps one tiny state row per canonical URL (its min path so far + an
emitted flag) under the event-time watermark, exactly the per-key state
shape the round-based engine keeps in the seen sink.

State is partitioned by the group key (url hash), bounded by the watermark
(GroupStateTimeout.EventTimeTimeout evicts idle URLs), and each micro-batch
touches only the groups present in it — the 100 TB shape for a
continuously-fed frontier."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DISCOVERY_SCHEMA = (
    "url_canon string, url_hash bigint, host string, path_key string, "
    "discovered_ts timestamp"
)

OUT_SCHEMA = (
    "url_canon string, url_hash bigint, host string, path_key string, "
    "discovered_ts timestamp"
)

STATE_SCHEMA = "emitted boolean, min_path string"


def _dedup_fn(key, pdfs, state: GroupState):
    """One group = one canonical URL. Emit its min-path discovery row the
    first time the URL is seen; afterwards only the (tiny) state row lives
    on, until the watermark-based timeout evicts it."""
    import pandas as pd

    if state.hasTimedOut:
        state.remove()
    else:
        best = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            # vectorized min-path row (groups are per-URL, but batches can
            # still carry many rediscovery rows for a hot URL)
            cand = pdf.loc[pdf["path_key"].fillna("").idxmin()]
            if best is None or (cand["path_key"] or "") < (best["path_key"] or ""):
                best = cand
        emitted = state.get[0] if state.exists else False
        if best is not None and not emitted:
            state.update((True, best["path_key"]))
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 3600 * 1000)
            yield pd.DataFrame([{
                "url_canon": best["url_canon"],
                "url_hash": best["url_hash"],
                "host": best["host"],
                "path_key": best["path_key"],
                "discovered_ts": best["discovered_ts"],
            }])


def stream_frontier_dedup_stateful(
    spark: SparkSession,
    source_dir: str,
    watermark: str = "1 hour",
    schema: str = DISCOVERY_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    disc = reader.parquet(source_dir).withWatermark("discovered_ts", watermark)
    return disc.groupBy("url_canon").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
