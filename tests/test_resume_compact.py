"""Resumable build (kill/rerun) + segment compaction correctness."""

import numpy as np
import pytest

from pysearchlite_spark.engine import SearchIndex
from pysearchlite_spark.plans.builder import build_index
from pysearchlite_spark.plans.compaction import compact_segments
from pysearchlite_spark.sources.catalog import IndexCatalog


@pytest.fixture(scope="module")
def corpus(spark):
    import random
    rng = random.Random(77)
    vocab = [f"v{i}" for i in range(80)] + ["the", "hot"]
    rows = [(i, f"d{i:04d}", " ".join(
        rng.choices(vocab, k=rng.randint(5, 50)) + ["the"]))
        for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


QUERIES = ["the", "hot the", "v1 v2", "v10", "missing"]


def test_partial_build_then_resume(spark, corpus, tmp_path):
    d = str(tmp_path / "idx")
    # simulate a killed run: build only 2 of the segments, no commit
    r1 = build_index(spark, corpus, d, id_col="doc_id", url_col="url",
                     segment_docs=100, max_segments=2)
    assert r1.snapshot_id == -1  # incomplete → NOT committed
    cat = IndexCatalog(d)
    assert cat.current_snapshot() is None
    staged = cat.staged_segments("postings")
    assert len(staged) == 2

    # resume: builds ONLY the remaining segments, then commits
    r2 = build_index(spark, corpus, d, id_col="doc_id", url_col="url",
                     segment_docs=100)
    assert r2.snapshot_id == 1
    assert r2.segments == [0, 1, 2, 3]
    assert r2.n_docs == 400

    # result identical to a from-scratch build
    d2 = str(tmp_path / "idx2")
    build_index(spark, corpus, d2, id_col="doc_id", url_col="url",
                segment_docs=100)
    a, b = SearchIndex(spark, d), SearchIndex(spark, d2)
    for q in QUERIES:
        assert a.search_and_ids(q).tolist() == b.search_and_ids(q).tolist()
        assert a.topk(q, k=10) == b.topk(q, k=10)


def test_partial_segment_dir_is_dropped_and_rebuilt(spark, corpus, tmp_path):
    import os
    d = str(tmp_path / "idx")
    build_index(spark, corpus, d, id_col="doc_id", url_col="url",
                segment_docs=100, max_segments=2)
    # corrupt: fake a partially-written (unstaged) segment dir
    bad = os.path.join(d, "postings", "seg=3")
    os.makedirs(bad, exist_ok=True)
    with open(os.path.join(bad, "part-corrupt.parquet"), "w") as f:
        f.write("not parquet")
    r = build_index(spark, corpus, d, id_col="doc_id", url_col="url",
                    segment_docs=100)
    assert r.snapshot_id == 1
    idx = SearchIndex(spark, d)
    assert idx.count("the") == 400


def test_compaction_preserves_results(spark, corpus, tmp_path):
    d = str(tmp_path / "idx")
    build_index(spark, corpus, d, id_col="doc_id", url_col="url",
                segment_docs=50)  # 8 segments
    before = SearchIndex(spark, d)
    results_before = {q: (before.search_and_ids(q).tolist(),
                          before.search_or_ids(q).tolist(),
                          before.topk(q, k=10)) for q in QUERIES}
    n_segs_before = len(before.snapshot["posting_segments"])
    assert n_segs_before == 8

    sid = compact_segments(spark, d, group_size=4)  # 8 → 2
    assert sid == 2
    mid = SearchIndex(spark, d)
    assert len(mid.snapshot["posting_segments"]) == 2
    for q in QUERIES:
        assert (mid.search_and_ids(q).tolist(),
                mid.search_or_ids(q).tolist(),
                mid.topk(q, k=10)) == results_before[q], q

    sid = compact_segments(spark, d)  # 2 → 1
    assert sid == 3
    after = SearchIndex(spark, d)
    assert len(after.snapshot["posting_segments"]) == 1
    for q in QUERIES:
        got = (after.search_and_ids(q).tolist(),
               after.search_or_ids(q).tolist(), after.topk(q, k=10))
        assert got == results_before[q], q
    # scores identical bit-for-bit? block boundaries changed, so partials
    # regroup — assert rank + 1e-9 closeness is covered above by equality;
    # spot-check distributed path on the compacted index too
    assert after.topk("hot the", k=10, distributed=True) == \
        results_before["hot the"][2]


def test_resume_with_changed_params_invalidates_checkpoint(spark, corpus,
                                                           tmp_path):
    """Regression: the stage-0 checkpoint bakes (segment_docs, n_buckets)
    into its seg/tb values. A killed build resumed with DIFFERENT params
    must rebuild from scratch — reusing the stale runs routed ~half the
    vocabulary to term buckets the query side never searches (silent empty
    results)."""
    d = str(tmp_path / "idx")
    r1 = build_index(spark, corpus, d, id_col="doc_id", url_col="url",
                     segment_docs=100, n_buckets=16, max_segments=2)
    assert r1.snapshot_id == -1  # killed mid-build, staged only
    # resume with different n_buckets → checkpoint + staged segs discarded
    r2 = build_index(spark, corpus, d, id_col="doc_id", url_col="url",
                     segment_docs=100, n_buckets=8)
    assert r2.snapshot_id == 1
    idx = SearchIndex(spark, d)
    assert idx.n_buckets == 8
    oracle_counts = {"the": 400}
    for q, want in oracle_counts.items():
        assert idx.count(q) == want, q
    # every vocabulary term resolves (no half-empty bucket routing)
    assert idx.count("v1") > 0 and idx.count("v42") > 0

    # rebuilding OVER a committed snapshot with different params must refuse
    with pytest.raises(ValueError, match="committed with n_buckets"):
        build_index(spark, corpus, d, id_col="doc_id", url_col="url",
                    segment_docs=100, n_buckets=4)


def test_compaction_rerun_drops_stale_attempt_files(spark, corpus, tmp_path):
    """Regression: a compaction attempt that crashed after writing part
    files (but before the manifest commit) leaves files under the NEW seg
    ids; a rerun reuses those ids and must drop the stale files first —
    otherwise they become duplicate posting rows after commit, corrupting
    df/counts/scores."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "idx")
    build_index(spark, corpus, d, id_col="doc_id", url_col="url",
                segment_docs=100)  # 4 segments, next seg id = 4
    before = SearchIndex(spark, d)
    want = {q: (before.count(q), before.topk(q, k=10)) for q in QUERIES}

    # simulate the crashed attempt: plant a stale part file with REAL posting
    # rows (duplicating term 'the' postings from seg 0) in the dir the rerun
    # will reuse
    cat = IndexCatalog(d)
    src = before._postings.filter("seg = 0 AND term = 'the'").toPandas()
    assert len(src) > 0
    stale_dir = os.path.join(cat.postings_dir(), "seg=4",
                             f"tb={int(src['tb'].iloc[0])}")
    os.makedirs(stale_dir, exist_ok=True)
    body = src.drop(columns=["seg", "tb"])
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(body),
                                        preserve_index=False),
                   os.path.join(stale_dir, "part-99998.parquet"))

    sid = compact_segments(spark, d)  # rerun: all → seg 4
    assert sid == 2
    # the rerun REUSED the crashed attempt's seg id (4) after dropping its
    # stale files — ids must not drift upward across crash/rerun cycles
    assert IndexCatalog(d).current_snapshot()["posting_segments"] == [4]
    assert not os.path.exists(os.path.join(stale_dir, "part-99998.parquet"))
    after = SearchIndex(spark, d)
    for q in QUERIES:
        assert (after.count(q), after.topk(q, k=10)) == want[q], q
    # the planted duplicate rows are gone from the committed segment
    dup = (after._postings.filter("term = 'the'")
           .groupBy("seg", "tb", "term").count().filter("count > 1").count())
    assert dup == 0


def test_append_batch_refuses_suspended_build_dir(spark, corpus, tmp_path):
    """A streaming append into an index dir holding a SUSPENDED
    build_index(max_segments=...) run must refuse loudly (the suspended
    build's remaining segment ids derive from docID ranges and WOULD
    collide with an appended segment) and must not discard the staged
    resumable work; the resumed build then completes from the checkpoint
    exactly as if the append was never attempted."""
    import os

    from pysearchlite_spark.streaming.ingest import append_batch

    d = str(tmp_path / "idx")
    build_index(spark, corpus, d, id_col="doc_id", url_col="url",
                segment_docs=100, max_segments=2)  # suspended: segs 0,1
    cat = IndexCatalog(d)
    staged_before = cat.staged_segments("postings")
    assert staged_before == [0, 1]

    batch = spark.createDataFrame(
        [(f"u{i}", f"appended fresh tokens {i}") for i in range(10)],
        "url string, text string")
    with pytest.raises(RuntimeError, match="stage checkpoint"):
        append_batch(spark, batch, d, segment_docs=100, batch_id=1)

    # staged work untouched by the refused append
    assert cat.staged_segments("postings") == staged_before
    for s in staged_before:
        assert os.path.isdir(os.path.join(d, "postings", f"seg={s}"))

    # resume completes; appends work once the checkpoint is gone
    r = build_index(spark, corpus, d, id_col="doc_id", url_col="url",
                    segment_docs=100)
    assert r.segments == [0, 1, 2, 3]
    sid = append_batch(spark, batch, d, batch_id=1)
    snap = cat.snapshot(sid)
    assert min(snap["posting_segments"]) >= 0 and snap["stats"][
        "n_docs"] == 410


def test_time_travel_snapshots(spark, corpus, tmp_path):
    d = str(tmp_path / "idx")
    build_index(spark, corpus, d, id_col="doc_id", url_col="url",
                segment_docs=100)
    compact_segments(spark, d)
    cat = IndexCatalog(d)
    m = cat.load_manifest()
    assert [s["snapshot_id"] for s in m["snapshots"]] == [1, 2]
    assert m["snapshots"][1]["parent_id"] == 1
    # old segment files still on disk (snapshot 1 remains readable)
    assert set(m["snapshots"][0]["posting_segments"]) == {0, 1, 2, 3}

    # time-travel READ: snapshot 1 (pre-compaction) answers identically to
    # the current snapshot, from the original 4 segments
    cur = SearchIndex(spark, d)
    old = SearchIndex(spark, d, snapshot_id=1)
    assert len(old.snapshot["posting_segments"]) == 4
    assert len(cur.snapshot["posting_segments"]) == 1
    for q in QUERIES:
        assert old.search_and_ids(q).tolist() == \
            cur.search_and_ids(q).tolist(), q
        assert old.topk(q, k=10) == cur.topk(q, k=10), q
    with pytest.raises(ValueError, match="snapshot 99 not found"):
        SearchIndex(spark, d, snapshot_id=99)
