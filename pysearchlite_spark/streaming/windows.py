"""Streaming windowed aggregation + stateful operators.

The reference is batch-only; these are the Structured Streaming operators a
continuous web-crawl ingest pipeline needs alongside segment append
(streaming/ingest.py):

  * windowed_event_stats — tumbling event-time windows WITH WATERMARK:
    late data within the watermark still lands in its window; data later
    than the watermark is dropped and finalized windows are emitted
    exactly once (append mode) — the scale-correct shape, since unbounded
    window state is the streaming OOM at 10^12 events.
  * streaming_exact_dedup — applyInPandasWithState: keyed first-seen state
    over content hashes, so a continuously ingested corpus is deduped
    ACROSS micro-batches (the streaming analogue of operators/dedup.
    exact_dedup); state per key is one long, bounded by distinct-hash
    count.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_event_stats(events: DataFrame, ts_col: str = "ts",
                         key_col: str = "event_type",
                         value_col: str = "value",
                         window: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window count/sum per key with late-data watermark. Works on
    both streaming and batch frames (batch ignores the watermark)."""
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, window).alias("w"), key_col)
            .agg(F.count("*").alias("cnt"),
                 F.sum(value_col).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    key_col, "cnt", "sum_value"))


DEDUP_OUTPUT_SCHEMA = "doc_id long, keep_id long, is_dup boolean"
DEDUP_STATE_SCHEMA = "keep_id long"


def streaming_exact_dedup(stream: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Cross-micro-batch exact dedup: (doc_id, keep_id, is_dup) where
    keep_id is the FIRST doc ever seen (across all batches) with this
    text's sha256. State per hash group: one long."""

    def dedup_fn(key, pdfs, state: GroupState):
        seen = state.get[0] if state.exists else None
        out = []
        for pdf in pdfs:
            ids = sorted(int(i) for i in pdf["doc_id"])
            for i in ids:
                if seen is None:
                    seen = i
                    out.append((i, i, False))
                else:
                    out.append((i, seen, i != seen))
        state.update((seen,))
        yield pd.DataFrame(out, columns=["doc_id", "keep_id", "is_dup"])

    hashed = stream.select(
        F.col(id_col).alias("doc_id"),
        F.sha2(F.col(text_col), 256).alias("h"))
    return (hashed.groupBy("h")
            .applyInPandasWithState(dedup_fn, DEDUP_OUTPUT_SCHEMA,
                                    DEDUP_STATE_SCHEMA, "append",
                                    GroupStateTimeout.NoTimeout))
