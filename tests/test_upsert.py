"""upsert_batch (streaming/ingest.py): re-crawl semantics — a url seen
again replaces its earlier capture (tombstone + append), unseen urls
append. Oracle: an index built from scratch over the LATEST capture of
every url must agree on ids' urls, counts, and BM25 scores after
compaction."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pysearchlite_spark.engine import SearchIndex
from pysearchlite_spark.plans.builder import build_index
from pysearchlite_spark.plans.compaction import compact_segments
from pysearchlite_spark.streaming.ingest import upsert_batch


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


@pytest.fixture()
def seeded(spark, tmp_path):
    idx_dir = str(tmp_path / "idx")
    gen0 = [(f"u{i:03d}", f"alpha common w{i % 7}") for i in range(40)]
    build_index(spark, _pages(spark, gen0), idx_dir, id_col=None,
                url_col="url", segment_docs=16)
    return idx_dir, gen0


def test_upsert_replaces_and_appends(spark, seeded):
    idx_dir, gen0 = seeded
    idx0 = SearchIndex(spark, idx_dir)
    assert idx0.count("alpha") == 40

    # re-crawl 10 urls with NEW text (alpha -> beta) + 5 brand-new urls
    recrawl = [(f"u{i:03d}", f"beta common w{i % 7}") for i in range(10)]
    fresh = [(f"new{i}", f"alpha common fresh{i}") for i in range(5)]
    upsert_batch(spark, _pages(spark, recrawl + fresh), idx_dir)

    idx = SearchIndex(spark, idx_dir)
    # old captures gone from retrieval, new ones present
    assert idx.count("alpha") == 30 + 5
    assert idx.count("beta") == 10
    assert idx.count("common") == 45
    assert idx.count("common", distributed=True) == 45
    # each re-crawled url resolves to exactly ONE live doc (the new one)
    live = idx.docmap_df().filter(F.col("url") == "u003").collect()
    assert len(live) == 1
    beta_ids = idx.search_and_ids("beta")
    urls = set(idx.search("beta"))
    assert urls == {f"u{i:03d}" for i in range(10)}
    assert beta_ids.size == 10


def test_upsert_unseen_is_plain_append(spark, seeded):
    idx_dir, _ = seeded
    upsert_batch(spark, _pages(
        spark, [("only-new", "gamma common")]), idx_dir)
    idx = SearchIndex(spark, idx_dir)
    assert idx.count("gamma") == 1
    assert idx.delete_files == []  # no tombstones were needed


def test_upsert_idempotent_replay(spark, seeded):
    idx_dir, _ = seeded
    batch = _pages(spark, [("u000", "delta common")])
    sid1 = upsert_batch(spark, batch, idx_dir, batch_id=7)
    sid2 = upsert_batch(spark, batch, idx_dir, batch_id=7)  # replay
    assert sid1 == sid2
    idx = SearchIndex(spark, idx_dir)
    assert idx.count("delta") == 1
    assert len(idx.search("delta")) == 1


def test_upsert_then_compact_matches_fresh_build(spark, seeded, tmp_path):
    idx_dir, gen0 = seeded
    recrawl = [(f"u{i:03d}", f"beta common w{i % 7}") for i in range(10)]
    upsert_batch(spark, _pages(spark, recrawl), idx_dir)
    compact_segments(spark, idx_dir)
    idx = SearchIndex(spark, idx_dir)

    latest = {u: t for u, t in gen0}
    latest.update({u: t for u, t in recrawl})
    b_dir = str(tmp_path / "oracle")
    build_index(spark, _pages(spark, sorted(latest.items())), b_dir,
                id_col=None, url_col="url", segment_docs=16)
    orc = SearchIndex(spark, b_dir)

    assert idx.n_docs == orc.n_docs
    assert idx.avgdl == pytest.approx(orc.avgdl)
    for q in ("alpha", "beta", "common", "alpha common"):
        assert idx.count(q) == orc.count(q)
        # docIDs differ (ingest order assigns different ids) — compare
        # the score PROFILE and the matched url sets instead
        sa = sorted(round(s, 9) for _, s in idx.topk(q, k=5))
        sb = sorted(round(s, 9) for _, s in orc.topk(q, k=5))
        assert sa == sb
        assert sorted(idx.search(q)) == sorted(orc.search(q))


def test_concurrent_upserts_same_url_single_live(spark, seeded):
    """Two upserts carrying the same url racing: the writer lock must
    cover the whole read->tombstone->append sequence. If it covered only
    the append half, both would read the original capture live, both
    would tombstone only it, and BOTH replacements would stay live —
    duplicate docs for one url."""
    import threading

    idx_dir, _ = seeded
    errs = []

    def run(tag):
        try:
            upsert_batch(spark, _pages(
                spark, [("u001", f"delta {tag} common")]), idx_dir)
        except Exception as e:  # noqa: BLE001 - surfaced after join
            errs.append(e)

    ts = [threading.Thread(target=run, args=(t,)) for t in ("one", "two")]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs

    idx = SearchIndex(spark, idx_dir)
    live = idx.docmap_df().filter(F.col("url") == "u001").collect()
    assert len(live) == 1, [r["doc_id"] for r in live]
    assert idx.count("delta") == 1
    assert idx.count("delta", distributed=True) == 1
