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
        # A group may arrive as MULTIPLE Arrow chunks within one micro-batch
        # (group larger than maxRecordsPerBatch): decide keep_id from the
        # min across ALL chunks + prior state BEFORE emitting, so the
        # result matches batch exact_dedup's min-doc_id semantics and is
        # partitioning-independent. Buffers only the int64 ids (8B each).
        chunks = [pdf["doc_id"].to_numpy() for pdf in pdfs]
        prior = state.get[0] if state.exists else None
        batch_min = min(int(c.min()) for c in chunks if c.size)
        # first-seen-batch wins across batches (append mode cannot rewrite
        # already-emitted rows); min doc_id within the first batch
        keep = batch_min if prior is None else prior
        out = []
        for c in chunks:
            for i in sorted(int(x) for x in c):
                out.append((i, keep, i != keep))
        state.update((keep,))
        yield pd.DataFrame(out, columns=["doc_id", "keep_id", "is_dup"])

    hashed = stream.select(
        F.col(id_col).alias("doc_id"),
        F.sha2(F.col(text_col), 256).alias("h"))
    return (hashed.groupBy("h")
            .applyInPandasWithState(dedup_fn, DEDUP_OUTPUT_SCHEMA,
                                    DEDUP_STATE_SCHEMA, "append",
                                    GroupStateTimeout.NoTimeout))
