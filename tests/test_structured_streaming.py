"""True Structured Streaming ingest: readStream file source → stream_ingest
(foreachBatch segment append) → queries match a batch-built oracle index."""

import glob
import os
import time

import pytest

from pysearchlite_spark.engine import SearchIndex
from pysearchlite_spark.plans.builder import build_index
from pysearchlite_spark.streaming.ingest import stream_ingest


@pytest.mark.timeout(300)
def test_stream_ingest_file_source(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    idx_dir = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")

    rows1 = [(f"a{i:03d}", f"alpha beta t{i % 5}") for i in range(40)]
    rows2 = [(f"b{i:03d}", f"beta gamma t{i % 3}") for i in range(30)]
    schema = "url string, text string"

    # first file present before the stream starts
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "overwrite").parquet(str(src / "f1"))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src) + "/*"))
    q = stream_ingest(spark, stream, idx_dir, ckpt, segment_docs=32,
                      trigger_seconds=1)
    try:
        _wait_for_snapshot(idx_dir, want_docs=40)
        # second file arrives while the stream runs
        spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
            "overwrite").parquet(str(src / "f2"))
        _wait_for_snapshot(idx_dir, want_docs=70)
    finally:
        q.stop()

    idx = SearchIndex(spark, idx_dir)
    assert idx.n_docs == 70
    assert idx.count("beta") == 70
    assert idx.count("alpha") == 40
    assert idx.count("gamma") == 30
    assert idx.count("alpha gamma") == 0

    # ranking matches a batch build over the same two batches in order
    d2 = str(tmp_path / "idx_batch")
    from pysearchlite_spark.streaming.ingest import append_batch
    append_batch(spark, spark.createDataFrame(rows1, schema), d2,
                 segment_docs=32, batch_id=0)
    append_batch(spark, spark.createDataFrame(rows2, schema), d2,
                 segment_docs=32, batch_id=1)
    batch_idx = SearchIndex(spark, d2)
    for query in ["beta", "alpha t1", "gamma beta t2"]:
        assert idx.topk(query, k=10) == batch_idx.topk(query, k=10), query


def _wait_for_snapshot(idx_dir: str, want_docs: int, timeout: int = 120):
    from pysearchlite_spark.sources.catalog import IndexCatalog
    cat = IndexCatalog(idx_dir)
    deadline = time.time() + timeout
    while time.time() < deadline:
        snap = cat.current_snapshot()
        if snap and int(snap["stats"]["n_docs"]) >= want_docs:
            return
        time.sleep(1.0)
    raise AssertionError(
        f"no snapshot with >= {want_docs} docs within {timeout}s")


@pytest.mark.timeout(300)
def test_stream_ingest_custom_column_names(spark, tmp_path):
    """A stream whose columns are not literally (url, text) must be
    ingestable — stream_ingest forwards url_col/text_col to the batch
    sink (a foreachBatch failure kills the StreamingQuery silently from
    the index's point of view)."""
    src = tmp_path / "incoming"
    src.mkdir()
    idx_dir = str(tmp_path / "idx")
    schema = "page_url string, body string"
    rows = [(f"u{i:02d}", f"delta echo t{i % 4}") for i in range(20)]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite").parquet(str(src / "f1"))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
    q = stream_ingest(spark, stream, idx_dir, str(tmp_path / "ckpt"),
                      text_col="body", url_col="page_url",
                      segment_docs=16, trigger_seconds=1)
    try:
        _wait_for_snapshot(idx_dir, want_docs=20)
    finally:
        q.stop()
    idx = SearchIndex(spark, idx_dir)
    assert idx.count("delta echo") == 20
    assert sorted(idx.search("t3")) == [f"u{i:02d}" for i in range(20)
                                        if i % 4 == 3]


@pytest.mark.timeout(300)
def test_stream_ingest_neardup_filter(spark, tmp_path):
    """Continuous ingestion with cross-batch near-dedup: intra-batch
    near-dups collapse to one representative, batch-2 near-dups of
    batch-1 docs are dropped before indexing, fresh docs pass."""
    src = tmp_path / "incoming"
    src.mkdir()
    idx_dir = str(tmp_path / "idx")
    nd_dir = str(tmp_path / "nd")
    ckpt = str(tmp_path / "ckpt")

    base = ("the quick brown fox jumps over the lazy dog while seventeen "
            "sailors watch from the harbor wall at dawn")
    other = ("completely unrelated second story about spark structured "
             "streaming micro batches and watermark semantics tonight")
    rows1 = [("u1", base),
             ("u2", base + " extra"),          # intra near-dup of u1
             ("u3", other)]
    rows2 = [("u4", base + " tail"),           # cross near-dup of batch 1
             ("u5", "an entirely fresh third document mentioning "
                    "gardens rivers mountains and forty two lanterns")]
    schema = "url string, text string"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "overwrite").parquet(str(src / "f1"))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src) + "/*"))
    q = stream_ingest(spark, stream, idx_dir, ckpt, segment_docs=32,
                      trigger_seconds=1, neardup_dir=nd_dir,
                      neardup_threshold=0.6)
    try:
        _wait_for_snapshot(idx_dir, want_docs=2)   # u1 + u3 survive
        spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
            "overwrite").parquet(str(src / "f2"))
        _wait_for_snapshot(idx_dir, want_docs=3)   # + u5 only
        time.sleep(2)                              # no late arrivals
    finally:
        q.stop()

    idx = SearchIndex(spark, idx_dir)
    urls = {r["url"] for r in idx.docmap_df().collect()}
    # exactly ONE of the intra-batch near-dup pair survives (the min by
    # xxhash64(url) — the dedup id, not the url string); the cross-batch
    # near-dup u4 is dropped; the fresh docs pass
    assert len(urls & {"u1", "u2"}) == 1
    assert "u3" in urls and "u5" in urls and "u4" not in urls
    assert len(urls) == 3
    # the dedup index recorded exactly the admitted docs, batch-keyed
    from pysearchlite_spark.operators.neardup import NearDupIndex
    nd = NearDupIndex(spark, nd_dir)
    assert nd.meta["n_docs"] == 3
    assert len(nd.meta["batches"]) == 2
    spark.catalog.clearCache()
