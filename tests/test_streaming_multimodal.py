"""Incremental ingest (append_batch) + multimodal plumbing tests."""

import numpy as np
import pytest

from pysearchlite_spark.engine import SearchIndex
from pysearchlite_spark.oracle import OracleEngine
from pysearchlite_spark.streaming.ingest import append_batch


def _df(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_append_batches_match_full_oracle(spark, tmp_path):
    d = str(tmp_path / "idx")
    b1 = [(f"a{i:03d}", f"alpha beta t{i % 7}") for i in range(60)]
    b2 = [(f"b{i:03d}", f"beta gamma t{i % 5}") for i in range(50)]
    b3 = [(f"c{i:03d}", f"alpha gamma delta t{i % 3}") for i in range(40)]

    sid1 = append_batch(spark, _df(spark, b1), d, segment_docs=32, batch_id=0)
    assert sid1 == 1
    sid2 = append_batch(spark, _df(spark, b2), d, segment_docs=32, batch_id=1)
    sid3 = append_batch(spark, _df(spark, b3), d, segment_docs=32, batch_id=2)
    assert (sid2, sid3) == (2, 3)

    # idempotent replay of an already-ingested batch id
    sid_again = append_batch(spark, _df(spark, b2), d, segment_docs=32,
                             batch_id=1)
    assert sid_again == 3

    idx = SearchIndex(spark, d)
    # oracle over batches in the same order, each batch url-sorted, docIDs
    # continuing on segment boundaries — replicate by indexing in batch/url
    # order and checking SET-level results (ids differ by the segment gaps,
    # so compare via names)
    from pysearchlite_spark.plans.builder import doc_sort_key
    oracle = OracleEngine()
    names = []
    for batch in (b1, b2, b3):
        for url, text in sorted(batch, key=lambda x: doc_sort_key(x[0])):
            oracle.index(url, text)
            names.append(url)

    for q in ["alpha", "beta gamma", "alpha delta", "t1", "nope"]:
        assert idx.search(q) == oracle.search(q), q
        assert idx.count(q) == oracle.count(q), q

    # BM25 over the merged corpus: compare by NAME since ids differ
    for q in ["alpha beta", "gamma t1"]:
        got = idx.topk(q, k=10)
        rows = {r["doc_id"]: r["url"] for r in idx._docmap.collect()}
        got_named = [(rows[d], round(s, 9)) for d, s in got]
        want_named = [(oracle.doc_names[d], round(s, 9))
                      for d, s in oracle.topk(q, k=10)]
        assert [n for n, _ in got_named] == [n for n, _ in want_named], q
        np.testing.assert_allclose([s for _, s in got_named],
                                   [s for _, s in want_named], rtol=1e-9)


def test_ingest_then_compact(spark, tmp_path):
    from pysearchlite_spark.plans.compaction import compact_segments
    d = str(tmp_path / "idx")
    append_batch(spark, _df(spark, [(f"a{i}", f"x y t{i % 3}")
                                    for i in range(30)]), d,
                 segment_docs=16, batch_id=0)
    append_batch(spark, _df(spark, [(f"b{i}", f"y z t{i % 4}")
                                    for i in range(30)]), d,
                 segment_docs=16, batch_id=1)
    idx = SearchIndex(spark, d)
    before = {q: (idx.search_and_ids(q).tolist(), idx.topk(q, k=5))
              for q in ["y", "x z", "t1 y"]}
    compact_segments(spark, d)
    idx2 = SearchIndex(spark, d)
    assert len(idx2.snapshot["posting_segments"]) == 1
    for q, want in before.items():
        assert (idx2.search_and_ids(q).tolist(), idx2.topk(q, k=5)) == want


def test_multimodal_plumbing(spark):
    from pysearchlite_spark.functions.multimodal import (frame_sample,
                                                         image_features,
                                                         media_stats)
    rows = [(i, bytes([i % 256]) * (100 + i)) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, media binary")

    feats = image_features(df, deterministic=True).collect()
    assert len(feats) == 20
    assert all(len(r["feature"]) == 64 for r in feats)
    assert all(r["meta"]["channels"] == 3 for r in feats)
    # deterministic across runs
    feats2 = image_features(df, deterministic=True).collect()
    assert [r["feature"] for r in sorted(feats, key=lambda r: r["doc_id"])] \
        == [r["feature"] for r in sorted(feats2, key=lambda r: r["doc_id"])]

    frames = frame_sample(df, deterministic=True).collect()
    assert len(frames) >= 20
    assert all(len(r["frame"]) == 32 for r in frames)

    stats = {r["doc_id"]: r for r in media_stats(df).collect()}
    assert stats[0]["n_bytes"] == 100
    assert len(stats[0]["sha256"]) == 64

    # non-deterministic mode raises the documented stub error
    with pytest.raises(Exception) as ei:
        image_features(df, deterministic=False).collect()
    assert "NotImplementedError" in str(ei.value) or \
        "Pillow" in str(ei.value)
