"""Streaming windowed aggregation (watermark, append-mode finalization) +
cross-batch stateful dedup (applyInPandasWithState)."""

import datetime as dt
import time

import pytest

from pysearchlite_spark.streaming.windows import (streaming_exact_dedup,
                                                  windowed_event_stats)

UTC = dt.timezone.utc


def _ts(h, m=0):
    return dt.datetime(2026, 1, 1, h, m, tzinfo=UTC)


def test_windowed_stats_batch_parity(spark):
    """On a batch frame the operator equals a plain windowed groupBy."""
    rows = [(_ts(10, 5), "click", 1.0), (_ts(10, 40), "click", 2.0),
            (_ts(11, 10), "view", 5.0), (_ts(10, 59), "view", 3.0)]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, "
                                     "value double")
    got = {(r["window_start"], r["event_type"]): (r["cnt"], r["sum_value"])
           for r in windowed_event_stats(df).collect()}
    assert got[(_ts(10).replace(tzinfo=None), "click")] == (2, 3.0)
    assert got[(_ts(10).replace(tzinfo=None), "view")] == (1, 3.0)
    assert got[(_ts(11).replace(tzinfo=None), "view")] == (1, 5.0)


@pytest.mark.timeout(300)
def test_windowed_stats_stream_watermark(spark, tmp_path):
    """Append-mode streaming: a window is emitted exactly once, only after
    the watermark passes its end; the not-yet-final window is withheld."""
    src = tmp_path / "ev"
    src.mkdir()
    schema = "ts timestamp, event_type string, value double"
    f1 = [(_ts(10, 5), "click", 1.0), (_ts(10, 45), "click", 2.0),
          (_ts(11, 20), "view", 4.0)]
    spark.createDataFrame(f1, schema).coalesce(1).write.parquet(
        str(src / "f1"))
    time.sleep(1.1)  # file mtime order == batch order
    # 14:30 advances the watermark (2h) to 12:30 → windows 10:00 and 11:00
    # finalize; the 14:00 window itself stays pending
    f2 = [(_ts(14, 30), "click", 9.0)]
    spark.createDataFrame(f2, schema).coalesce(1).write.parquet(
        str(src / "f2"))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
    q = (windowed_event_stats(stream)
         .writeStream.format("memory").queryName("winstats")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(240)
    got = {(r["window_start"], r["event_type"]): (r["cnt"], r["sum_value"])
           for r in spark.table("winstats").collect()}
    assert got[(_ts(10).replace(tzinfo=None), "click")] == (2, 3.0)
    assert got[(_ts(11).replace(tzinfo=None), "view")] == (1, 4.0)
    # pending window (14:00) not emitted — watermark has not passed it
    assert (_ts(14).replace(tzinfo=None), "click") not in got


@pytest.mark.timeout(300)
def test_streaming_exact_dedup_cross_batch(spark, tmp_path):
    """A doc whose text already appeared in an EARLIER micro-batch is
    flagged dup against the original keep_id (state survives batches)."""
    src = tmp_path / "docs"
    src.mkdir()
    schema = "doc_id long, text string"
    spark.createDataFrame([(1, "alpha beta"), (2, "gamma")], schema) \
        .coalesce(1).write.parquet(str(src / "f1"))
    time.sleep(1.1)
    spark.createDataFrame([(3, "alpha beta"), (4, "delta"), (5, "gamma")],
                          schema).coalesce(1).write.parquet(str(src / "f2"))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
    q = (streaming_exact_dedup(stream)
         .writeStream.format("memory").queryName("sdedup")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(240)
    got = {r["doc_id"]: (r["keep_id"], r["is_dup"])
           for r in spark.table("sdedup").collect()}
    assert got == {1: (1, False), 2: (2, False),
                   3: (1, True), 4: (4, False), 5: (2, True)}
