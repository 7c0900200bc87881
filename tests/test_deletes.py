"""Document deletion (plans/deletes.py): snapshot-scoped tombstones,
query-time masking on every path, physical apply at compaction, time
travel. The oracle is a rebuild-from-scratch index over the surviving
docs — deletes must be indistinguishable from never having indexed the
docs, except the documented pre-compaction BM25 stats semantics."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from pysearchlite_spark.engine import SearchIndex
from pysearchlite_spark.plans.builder import build_index
from pysearchlite_spark.plans.compaction import compact_segments
from pysearchlite_spark.plans.deletes import delete_docs

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
Q = "table part"
QTERMS = ("table", "part")


@pytest.fixture(scope="module")
def docs_df(spark):  # noqa: F811
    return spark.read.parquet(os.path.join(SF, "documents.parquet"))


@pytest.fixture(scope="module")
def built(spark, docs_df, tmp_path_factory):  # noqa: F811
    idx_dir = str(tmp_path_factory.mktemp("del_idx") / "idx")
    build_index(spark, docs_df, idx_dir, id_col="doc_id", segment_docs=128)
    idx = SearchIndex(spark, idx_dir)
    base_ids = idx.search_and_ids(Q)
    assert base_ids.size > 4, "need a few matches to delete"
    # delete half the matching docs plus some non-matching ids
    victims = [int(x) for x in base_ids[::2]]
    extra = [int(docs_df.agg(F.max("doc_id")).collect()[0][0]) + 1000]
    sid = delete_docs(spark, idx_dir, victims + extra)
    return idx_dir, set(victims), base_ids, sid


def test_masked_everywhere(spark, built):  # noqa: F811
    idx_dir, victims, base_ids, _ = built
    idx = SearchIndex(spark, idx_dir)
    want = np.asarray(sorted(set(int(x) for x in base_ids) - victims),
                      dtype=np.int64)

    assert np.array_equal(idx.search_and_ids(Q), want)
    assert np.array_equal(idx.search_and_ids(Q, distributed=True), want)
    assert idx.count(Q) == want.size
    assert idx.count(Q, distributed=True) == want.size

    or_ids = idx.search_or_ids(Q)
    assert not (set(or_ids.tolist()) & victims)
    assert np.array_equal(or_ids, idx.search_or_ids(Q, distributed=True))

    got_df = set(r["doc_id"] for r in
                 idx.search_df(Q).select("doc_id").collect())
    assert got_df == set(want.tolist())

    live = set(r["doc_id"] for r in
               idx.docmap_df().select("doc_id").collect())
    assert not (live & victims)


def test_topk_excludes_and_keeps_k(spark, built):  # noqa: F811
    idx_dir, victims, _, _ = built
    idx = SearchIndex(spark, idx_dir)
    n_and = idx.count(Q)
    n_or = int(idx.search_or_ids(Q).size)
    for mode, n_match in (("or", n_or), ("and", n_and)):
        top = idx.topk(Q, k=5, mode=mode)
        assert not ({d for d, _ in top} & victims)
        # deleted docs must not consume result slots
        assert len(top) == min(5, n_match)
        dist = idx.topk(Q, k=5, mode=mode, distributed=True)
        assert [d for d, _ in top] == [d for d, _ in dist]
        assert [s for _, s in top] == pytest.approx(
            [s for _, s in dist])


def test_time_travel_sees_pre_delete(spark, built):  # noqa: F811
    idx_dir, victims, base_ids, sid = built
    old = SearchIndex(spark, idx_dir, snapshot_id=sid - 1)
    assert np.array_equal(old.search_and_ids(Q), base_ids)


def test_delete_is_idempotent(spark, built):  # noqa: F811
    idx_dir, victims, _, _ = built
    pre = SearchIndex(spark, idx_dir)
    before = pre.count(Q)
    sid = delete_docs(spark, idx_dir, sorted(victims))  # same ids again
    idx = SearchIndex(spark, idx_dir)
    assert idx.count(Q) == before
    # a fully-validated-away delete is a NO-OP: no new snapshot, no new
    # pending file for every future query to scan
    assert sid == pre.snapshot["snapshot_id"]
    assert idx.delete_files == pre.delete_files


def test_compaction_applies_physically(spark, docs_df,  # noqa: F811
                                       tmp_path_factory):
    idx_dir = str(tmp_path_factory.mktemp("del_apply") / "idx")
    build_index(spark, docs_df, idx_dir, id_col="doc_id", segment_docs=128)
    idx0 = SearchIndex(spark, idx_dir)
    base_ids = idx0.search_and_ids(Q)
    victims = [int(x) for x in base_ids[1::2]]
    delete_docs(spark, idx_dir, victims)
    pre = SearchIndex(spark, idx_dir)
    pre_ids = pre.search_and_ids(Q)
    pre_or = pre.search_or_ids(Q)

    compact_segments(spark, idx_dir, group_size=2)
    idx = SearchIndex(spark, idx_dir)
    assert idx.delete_files == [] and idx.applied_delete_files
    # postings physically exclude the victims: raw scan, no masking
    assert np.array_equal(idx.search_and_ids(Q), pre_ids)
    assert np.array_equal(idx.search_or_ids(Q), pre_or)
    raw = idx.postings_df(list(QTERMS)).select("df").agg(
        F.sum("df")).collect()[0][0]
    # sum of dfs == sum of live postings for the two terms
    oracle_df = sum(int(idx.count(t)) for t in QTERMS)
    assert int(raw) == oracle_df

    # stats describe the live corpus now
    n_live = idx0.n_docs - len(victims)
    assert idx.n_docs == n_live
    # docmap stays masked through the applied files
    live = set(r["doc_id"] for r in
               idx.docmap_df().select("doc_id").collect())
    assert not (live & set(victims)) and len(live) == n_live


def test_post_compaction_scores_match_fresh_build(spark, docs_df,  # noqa: F811
                                                  tmp_path_factory):
    """After compaction the index must be indistinguishable from one built
    on the surviving docs — same top-k ids AND scores (stats refreshed)."""
    root = tmp_path_factory.mktemp("del_oracle")
    a_dir, b_dir = str(root / "a"), str(root / "b")
    build_index(spark, docs_df, a_dir, id_col="doc_id", segment_docs=128)
    ia = SearchIndex(spark, a_dir)
    base_ids = ia.search_and_ids(Q)
    victims = [int(x) for x in base_ids[::3]]
    delete_docs(spark, a_dir, victims)
    compact_segments(spark, a_dir)

    survivors = docs_df.filter(~F.col("doc_id").isin(victims))
    build_index(spark, survivors, b_dir, id_col="doc_id", segment_docs=128)

    ia, ib = SearchIndex(spark, a_dir), SearchIndex(spark, b_dir)
    assert ia.n_docs == ib.n_docs
    assert ia.avgdl == pytest.approx(ib.avgdl)
    for mode in ("or", "and"):
        ta = ia.topk(Q, k=10, mode=mode)
        tb = ib.topk(Q, k=10, mode=mode)
        assert [d for d, _ in ta] == [d for d, _ in tb]
        assert [s for _, s in ta] == pytest.approx([s for _, s in tb])


def test_delete_after_compact_then_append(spark, docs_df,  # noqa: F811
                                          tmp_path_factory):
    """Regression: append_batch must PRESERVE stats['pseg_of'] — rebuilding
    stats from scratch dropped the routing map, so a delete issued after
    compact→append landed under the pre-compaction pseg and the distributed
    kernels (which cogroup by pseg) never saw the tombstone."""
    from pysearchlite_spark.streaming.ingest import append_batch

    idx_dir = str(tmp_path_factory.mktemp("del_ca") / "idx")
    half = docs_df.filter(F.col("doc_id") % 2 == 0)
    build_index(spark, half.select(
        F.col("doc_id").cast("string").alias("url"), "text"),
        idx_dir, id_col=None, url_col="url", segment_docs=128)
    compact_segments(spark, idx_dir, group_size=2)
    snap_mid = SearchIndex(spark, idx_dir)
    assert snap_mid.stats.get("pseg_of"), "compaction records the map"
    append_batch(spark, docs_df.filter(F.col("doc_id") % 2 == 1).select(
        F.concat(F.lit("b-"), F.col("doc_id")).alias("url"), "text"),
        idx_dir, segment_docs=128)
    idx = SearchIndex(spark, idx_dir)
    assert idx.stats.get("pseg_of") == snap_mid.stats.get("pseg_of"), \
        "append must carry the delete-routing map forward"

    base = idx.search_and_ids(Q)
    assert base.size > 2
    victims = [int(base[0]), int(base[-1])]
    delete_docs(spark, idx_dir, victims)
    idx2 = SearchIndex(spark, idx_dir)
    want = np.asarray([x for x in base if int(x) not in set(victims)],
                      dtype=np.int64)
    # the distributed path is the one that depends on correct pseg routing
    assert np.array_equal(idx2.search_and_ids(Q, distributed=True), want)
    assert np.array_equal(idx2.search_and_ids(Q), want)


def test_delete_after_compaction_routes_by_pseg(spark, docs_df,  # noqa: F811
                                                tmp_path_factory):
    """pseg_of composition: deletes issued AFTER a compaction must route
    to the merged posting segments and still mask distributed kernels."""
    idx_dir = str(tmp_path_factory.mktemp("del_pseg") / "idx")
    build_index(spark, docs_df, idx_dir, id_col="doc_id", segment_docs=128)
    compact_segments(spark, idx_dir, group_size=2)
    idx = SearchIndex(spark, idx_dir)
    base_ids = idx.search_and_ids(Q)
    victims = [int(x) for x in base_ids[::2]]
    delete_docs(spark, idx_dir, victims)

    idx = SearchIndex(spark, idx_dir)
    want = np.asarray([x for x in base_ids if int(x) not in set(victims)],
                      dtype=np.int64)
    assert np.array_equal(idx.search_and_ids(Q, distributed=True), want)
    assert idx.count(Q, distributed=True) == want.size
    # the delete file's pseg partition keys are merged segment ids
    psegs = set()
    droot = os.path.join(idx_dir, "deletes")
    for d in os.listdir(droot):
        for p in os.listdir(os.path.join(droot, d)):
            if p.startswith("pseg="):
                psegs.add(int(p.split("=", 1)[1]))
    assert psegs <= set(int(s) for s in
                        idx.snapshot["posting_segments"])


def test_expire_snapshots_frees_dropped_segments(spark, docs_df,  # noqa: F811
                                                 tmp_path_factory):
    """Snapshot expiration: after delete+compact, expiring to keep_last=1
    removes the pre-merge POSTING segment dirs. Docmap dirs and APPLIED
    delete files stay — the current snapshot still references both (docmap
    untouched by compaction; applied files mask it). The current snapshot
    answers identically; time travel to an expired snapshot raises."""
    import os

    from pysearchlite_spark.sources.catalog import IndexCatalog

    idx_dir = str(tmp_path_factory.mktemp("expire") / "idx")
    build_index(spark, docs_df, idx_dir, id_col="doc_id", segment_docs=128)
    base = SearchIndex(spark, idx_dir)
    ids = base.search_and_ids(Q)
    delete_docs(spark, idx_dir, [int(x) for x in ids[:3]])
    compact_segments(spark, idx_dir)
    idx = SearchIndex(spark, idx_dir)
    want = idx.search_and_ids(Q)
    old_sid = base.snapshot["snapshot_id"]
    old_segs = set(int(s) for s in base.snapshot["posting_segments"])
    new_segs = set(int(s) for s in idx.snapshot["posting_segments"])

    cat = IndexCatalog(idx_dir)
    res = cat.expire_snapshots(keep_last=1)
    assert res["dropped_snapshots"] == 2  # build, delete (compact kept)
    # pre-merge POSTING dirs go; docmap segs stay (current snapshot's
    # doc_segments still reference them — compaction leaves docmap alone)
    assert res["dropped_posting_segments"] == len(old_segs - new_segs)
    assert res["dropped_doc_segments"] == 0
    # applied delete file survives (current snapshot masks docmap with it)
    assert res["dropped_delete_files"] == 0
    assert os.path.isdir(os.path.join(idx_dir, "deletes", "del=0"))
    for s in old_segs - new_segs:
        assert not os.path.isdir(
            os.path.join(idx_dir, "postings", f"seg={s}"))
        assert os.path.isdir(
            os.path.join(idx_dir, "docmap", f"seg={s}"))

    cur = SearchIndex(spark, idx_dir)
    assert np.array_equal(cur.search_and_ids(Q), want)
    assert cur.count(Q, distributed=True) == want.size
    with pytest.raises(ValueError):
        SearchIndex(spark, idx_dir, snapshot_id=old_sid)
    # idempotent: nothing further to drop
    assert cat.expire_snapshots(1)["dropped_snapshots"] == 0


def test_prevalidated_contract_raises(spark, built):  # noqa: F811
    """prevalidated=True demands a (doc_id, dseg) DataFrame — a plain id
    list (or a frame missing dseg) must fail loudly, not downstream."""
    idx_dir = built[0]
    with pytest.raises(ValueError, match="prevalidated"):
        delete_docs(spark, idx_dir, [1, 2, 3], prevalidated=True)
    no_dseg = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="prevalidated"):
        delete_docs(spark, idx_dir, no_dseg, prevalidated=True)


def test_expire_sweep_tmp_staging_dirs(spark, built):  # noqa: F811
    """A fresh del.tmp-* staging dir (an in-flight delete_docs write)
    must survive the expire orphan sweep; a stale one (>1 day — crash
    debris) must be reaped. Committed del= dirs are untouched either
    way. Pins the allocate-under-lock + rename protocol of
    deletes.py/delete_docs."""
    from pysearchlite_spark.sources.catalog import IndexCatalog
    idx_dir = built[0]
    cat = IndexCatalog(idx_dir)
    droot = cat.deletes_dir()
    committed_before = sorted(d for d in os.listdir(droot)
                              if d.startswith("del="))
    assert committed_before, "fixture committed at least one delete file"

    fresh = os.path.join(droot, "del.tmp-deadbeef")
    stale = os.path.join(droot, "del.tmp-cafebabe")
    for d in (fresh, stale):
        os.makedirs(d)
    two_days_ago = __import__("time").time() - 2 * 86400
    os.utime(stale, (two_days_ago, two_days_ago))

    cat.expire_snapshots(keep_last=10_000)  # sweep only, drop nothing
    assert os.path.isdir(fresh), "in-flight staging dir was swept"
    assert not os.path.isdir(stale), "stale crash debris survived"
    assert sorted(d for d in os.listdir(droot)
                  if d.startswith("del=")) == committed_before
    os.rmdir(fresh)


def test_expire_sweep_del_dirs_age_guarded(spark, built):  # noqa: F811
    """The del= orphan sweep must never reclaim a FRESH unreferenced dir
    below the watermark — that is exactly the on-disk state a delete_docs
    shows between its rename and its commit (now one critical section,
    but the sweep stays safe by age regardless). Stale unreferenced dirs
    (crash debris) below the watermark are reaped; referenced dirs and
    above-watermark dirs survive at any age."""
    import shutil
    import time as _time

    from pysearchlite_spark.sources.catalog import IndexCatalog
    idx_dir = built[0]
    cat = IndexCatalog(idx_dir)
    droot = cat.deletes_dir()
    committed = sorted(d for d in os.listdir(droot) if d.startswith("del="))
    assert committed, "fixture committed at least one delete file"

    # give the watermark headroom: commit a second (referenced) delete
    # with a high id by planting dirs around it
    mx = cat.max_delete_file_id()
    fresh_orphan = os.path.join(droot, f"del={mx + 1}")   # below future wm
    stale_orphan = os.path.join(droot, f"del={mx + 2}")
    above_wm = os.path.join(droot, f"del={mx + 50}")      # above watermark
    for d in (fresh_orphan, stale_orphan, above_wm):
        os.makedirs(d)
    # raise the referenced watermark ABOVE the two orphans: reference
    # mx+10 in a committed snapshot via a real delete of a known doc
    snap = cat.current_snapshot()
    ref_dir = os.path.join(droot, f"del={mx + 10}")
    os.rename(os.path.join(droot, committed[0]), ref_dir)

    def patch(lst):
        return [mx + 10 if int(i) == int(committed[0].split("=")[1])
                else int(i) for i in (lst or [])]

    cat.commit_snapshot(
        snap["segments"], snap["stats"], {"op": "test_rewire"},
        posting_segments=snap.get("posting_segments"),
        doc_segments=snap.get("doc_segments"),
        delete_files=patch(snap.get("delete_files")),
        applied_delete_files=patch(snap.get("applied_delete_files")))

    two_days = _time.time() - 2 * 86400
    os.utime(stale_orphan, (two_days, two_days))

    cat.expire_snapshots(keep_last=10_000)  # sweep only, drop nothing
    assert os.path.isdir(fresh_orphan), \
        "fresh below-watermark orphan was swept (in-flight delete lost)"
    assert not os.path.isdir(stale_orphan), "stale crash debris survived"
    assert os.path.isdir(above_wm)
    assert os.path.isdir(ref_dir), "referenced delete file was swept"
    for d in (fresh_orphan, above_wm):
        shutil.rmtree(d)


def test_concurrent_delete_commits_rebase_not_lost(spark, docs_df,  # noqa: F811
                                                   tmp_path_factory):
    """Two deletes racing: the one that commits second must rebase onto
    the snapshot that is current AT COMMIT TIME, so BOTH delete files end
    up referenced (a carry-forward from the pre-write snapshot would drop
    the other's file — lost update — and expire would then physically
    remove it)."""
    from pysearchlite_spark.sources.catalog import IndexCatalog

    idx_dir = str(tmp_path_factory.mktemp("race_del") / "idx")
    build_index(spark, docs_df, idx_dir, id_col="doc_id", segment_docs=128)
    ids = SearchIndex(spark, idx_dir).search_and_ids(Q)
    assert ids.size >= 4
    a_ids = [int(x) for x in ids[:2]]
    b_ids = [int(x) for x in ids[2:4]]

    def concurrent_commit():
        delete_docs(spark, idx_dir, b_ids)  # lands inside A's window

    delete_docs(spark, idx_dir, a_ids, _pre_commit_hook=concurrent_commit)

    snap = IndexCatalog(idx_dir).current_snapshot()
    assert len(snap["delete_files"]) == 2, snap["delete_files"]
    assert snap["stats"]["n_deleted_pending"] == 4
    idx = SearchIndex(spark, idx_dir)
    got = set(int(x) for x in idx.search_and_ids(Q))
    assert got == set(int(x) for x in ids) - set(a_ids) - set(b_ids)
    assert set(int(x) for x in
               idx.search_and_ids(Q, distributed=True)) == got


def test_delete_during_compaction_carried_and_rerouted(spark, docs_df,  # noqa: F811
                                                       tmp_path_factory):
    """A delete committed while a compaction merges must survive the
    compaction commit as STILL-PENDING, re-routed to the merged posting
    segments (it was invisible to the decode stage). Without the rebase,
    compaction's delete_files=[] would drop it (docs resurface); without
    the re-route, distributed reads would join its tombstones against the
    dead pre-merge segments."""
    from pysearchlite_spark.plans.deletes import deletes_df
    from pysearchlite_spark.sources.catalog import IndexCatalog

    idx_dir = str(tmp_path_factory.mktemp("race_cmp") / "idx")
    build_index(spark, docs_df, idx_dir, id_col="doc_id", segment_docs=128)
    cat = IndexCatalog(idx_dir)
    ids = SearchIndex(spark, idx_dir).search_and_ids(Q)
    assert ids.size >= 4
    pre_ids = [int(x) for x in ids[:2]]    # pending BEFORE the merge
    mid_ids = [int(x) for x in ids[2:4]]   # lands DURING the merge
    delete_docs(spark, idx_dir, pre_ids)

    def mid_merge_delete():
        delete_docs(spark, idx_dir, mid_ids)

    compact_segments(spark, idx_dir, _pre_commit_hook=mid_merge_delete)

    snap = cat.current_snapshot()
    # pre-merge file applied; mid-merge file carried as pending (rerouted
    # under a NEW id)
    assert len(snap["applied_delete_files"]) == 1
    assert len(snap["delete_files"]) == 1
    assert snap["stats"]["n_deleted_pending"] == 2
    assert snap["stats"]["n_deleted_applied"] == 2
    # the carried file's psegs all point at CURRENT posting segments
    carried = deletes_df(spark, cat, snap["delete_files"])
    psegs = set(r["pseg"] for r in carried.select("pseg")
                .distinct().collect())
    assert psegs <= set(int(s) for s in snap["posting_segments"]), (
        psegs, snap["posting_segments"])
    got_rows = set(r["doc_id"] for r in carried.select("doc_id").collect())
    assert got_rows == set(mid_ids)

    idx = SearchIndex(spark, idx_dir)
    want = set(int(x) for x in ids) - set(pre_ids) - set(mid_ids)
    assert set(int(x) for x in idx.search_and_ids(Q)) == want
    assert set(int(x) for x in
               idx.search_and_ids(Q, distributed=True)) == want
    assert idx.count(Q, distributed=True) == len(want)

    # a second compaction applies the carried file for real
    compact_segments(spark, idx_dir)
    snap2 = cat.current_snapshot()
    assert snap2["delete_files"] == []
    assert snap2["stats"].get("n_deleted_pending", 0) == 0
    idx2 = SearchIndex(spark, idx_dir)
    assert set(int(x) for x in idx2.search_and_ids(Q)) == want


def test_compaction_during_delete_reroutes(spark, docs_df,  # noqa: F811
                                           tmp_path_factory):
    """The mirror race: a compaction commits while a delete is between
    its staging write and its commit. The delete's staged pseg routing
    now targets dead segments — it must detect the pseg_of change and
    re-route from the materialized staging rows before committing."""
    from pysearchlite_spark.plans.deletes import deletes_df
    from pysearchlite_spark.sources.catalog import IndexCatalog

    idx_dir = str(tmp_path_factory.mktemp("race_dc") / "idx")
    build_index(spark, docs_df, idx_dir, id_col="doc_id", segment_docs=128)
    cat = IndexCatalog(idx_dir)
    n_segs_before = len(cat.current_snapshot()["posting_segments"])
    assert n_segs_before > 1, "need a multi-segment index to merge"
    ids = SearchIndex(spark, idx_dir).search_and_ids(Q)
    victims = [int(x) for x in ids[:3]]

    def mid_delete_compact():
        compact_segments(spark, idx_dir)

    delete_docs(spark, idx_dir, victims,
                _pre_commit_hook=mid_delete_compact)

    snap = cat.current_snapshot()
    assert len(snap["delete_files"]) == 1
    carried = deletes_df(spark, cat, snap["delete_files"])
    psegs = set(r["pseg"] for r in carried.select("pseg")
                .distinct().collect())
    assert psegs <= set(int(s) for s in snap["posting_segments"]), (
        psegs, snap["posting_segments"])

    idx = SearchIndex(spark, idx_dir)
    want = set(int(x) for x in ids) - set(victims)
    assert set(int(x) for x in idx.search_and_ids(Q)) == want
    assert set(int(x) for x in
               idx.search_and_ids(Q, distributed=True)) == want

def test_delete_during_append_not_lost(spark, docs_df,  # noqa: F811
                                       tmp_path_factory):
    """A delete_docs that commits while an append's segment writes run
    must survive the append's snapshot commit: append rebases its
    tombstone state onto the commit-time snapshot instead of carrying the
    pre-write snapshot's lists (which would drop the delete file — docs
    resurface, and expire physically reclaims the file once the delete's
    own snapshot ages out)."""
    from pysearchlite_spark.sources.catalog import IndexCatalog
    from pysearchlite_spark.streaming.ingest import append_batch

    idx_dir = str(tmp_path_factory.mktemp("race_app") / "idx")
    build_index(spark, docs_df, idx_dir, id_col="doc_id", segment_docs=128)
    ids = SearchIndex(spark, idx_dir).search_and_ids(Q)
    assert ids.size >= 2
    victims = [int(x) for x in ids[:2]]

    def mid_append_delete():
        delete_docs(spark, idx_dir, victims)

    pages = spark.createDataFrame(
        [(f"app{i}", "entirely fresh appended page") for i in range(8)],
        "url string, text string")
    append_batch(spark, pages, idx_dir, _pre_commit_hook=mid_append_delete)

    snap = IndexCatalog(idx_dir).current_snapshot()
    assert len(snap["delete_files"]) == 1, snap["delete_files"]
    assert snap["stats"]["n_deleted_pending"] == 2
    idx = SearchIndex(spark, idx_dir)
    want = set(int(x) for x in ids) - set(victims)
    assert set(int(x) for x in idx.search_and_ids(Q)) == want
    assert set(int(x) for x in
               idx.search_and_ids(Q, distributed=True)) == want
    # the appended docs are searchable too (the append itself committed)
    assert idx.count("appended") == 8


def test_build_rerun_over_committed_keeps_tombstones(spark, docs_df,  # noqa: F811
                                                     tmp_path_factory):
    """Replaying a build job over an already-committed identical index
    (the supported kill/rerun flow taken one step further) must carry the
    committed tombstone state forward — a fresh delete_files=[] commit
    would resurface the deleted docs and orphan the delete file."""
    from pysearchlite_spark.sources.catalog import IndexCatalog

    idx_dir = str(tmp_path_factory.mktemp("rerun_del") / "idx")
    build_index(spark, docs_df, idx_dir, id_col="doc_id", segment_docs=128)
    ids = SearchIndex(spark, idx_dir).search_and_ids(Q)
    victims = [int(x) for x in ids[:2]]
    delete_docs(spark, idx_dir, victims)

    r = build_index(spark, docs_df, idx_dir, id_col="doc_id",
                    segment_docs=128)
    assert r.snapshot_id > 0  # replay recommitted

    snap = IndexCatalog(idx_dir).current_snapshot()
    assert len(snap["delete_files"]) == 1
    assert snap["stats"]["n_deleted_pending"] == 2
    idx = SearchIndex(spark, idx_dir)
    want = set(int(x) for x in ids) - set(victims)
    assert set(int(x) for x in idx.search_and_ids(Q)) == want
    assert set(int(x) for x in
               idx.search_and_ids(Q, distributed=True)) == want


def test_build_rerun_over_diverged_index_refuses(spark, docs_df,  # noqa: F811
                                                 tmp_path_factory):
    """Rebuilding over an index that gained appended segments since its
    build must refuse loudly: the replayed build's stats (n_docs, avgdl,
    pack_avgdl) describe only the original corpus, and committing them
    over the appended snapshot would silently corrupt scoring."""
    import pytest as _pytest

    from pysearchlite_spark.streaming.ingest import append_batch

    idx_dir = str(tmp_path_factory.mktemp("rerun_div") / "idx")
    build_index(spark, docs_df, idx_dir, id_col="doc_id", segment_docs=128)
    pages = spark.createDataFrame(
        [(f"div{i}", "appended divergence page") for i in range(4)],
        "url string, text string")
    append_batch(spark, pages, idx_dir)

    with _pytest.raises(RuntimeError, match="diverged"):
        build_index(spark, docs_df, idx_dir, id_col="doc_id",
                    segment_docs=128)


def test_append_detects_writer_lock_bypass(spark, docs_df,  # noqa: F811
                                           tmp_path_factory):
    """If a concurrent SEGMENT writer slips past an inert flock (locks.py
    fallback, FUSE mounts) and commits while an append's Spark writes run,
    the append's commit-time rebase must refuse instead of silently
    re-committing the pre-merge segment lists (which would un-commit the
    other writer's merge and resurface its applied deletes)."""
    from pysearchlite_spark.sources.catalog import IndexCatalog
    from pysearchlite_spark.streaming.ingest import append_batch

    idx_dir = str(tmp_path_factory.mktemp("bypass_app") / "idx")
    build_index(spark, docs_df, idx_dir, id_col="doc_id", segment_docs=128)
    cat = IndexCatalog(idx_dir)

    def rogue_segment_commit():
        # simulate a compaction that bypassed the writer lock: current
        # posting segments replaced by a merged id
        cur = cat.current_snapshot()
        cat.commit_snapshot(
            cur["segments"], cur["stats"], {"job": "rogue"},
            posting_segments=[9999],
            doc_segments=cur.get("doc_segments", cur["segments"]),
            delete_files=cur.get("delete_files") or [],
            applied_delete_files=cur.get("applied_delete_files") or [])

    pages = spark.createDataFrame(
        [(f"byp{i}", "bypass detection page") for i in range(4)],
        "url string, text string")
    with pytest.raises(RuntimeError, match="bypassed the writer lock"):
        append_batch(spark, pages, idx_dir,
                     _pre_commit_hook=rogue_segment_commit)


def test_expire_tmp_sweep_uses_newest_inner_mtime(spark, built):  # noqa: F811
    """A del.tmp-* staging dir whose TOP-LEVEL mtime is days old (Spark
    sets it at _temporary creation, job start) but whose inner files are
    fresh is an IN-FLIGHT long-running delete write — the sweep must key
    age off the newest mtime in the tree and leave it alone. The same dir
    with stale inner files is crash debris and is reaped."""
    import shutil
    import time as _time

    from pysearchlite_spark.sources.catalog import IndexCatalog
    idx_dir = built[0]
    cat = IndexCatalog(idx_dir)
    droot = cat.deletes_dir()
    old = _time.time() - 2 * 86400

    inflight = os.path.join(droot, "del.tmp-slowjob", "pseg=0")
    os.makedirs(inflight)
    with open(os.path.join(inflight, "part-0.parquet"), "w") as f:
        f.write("x")  # fresh inner write
    top = os.path.dirname(inflight)
    os.utime(top, (old, old))
    os.utime(inflight, (old, old))  # only the FILE is fresh

    dead = os.path.join(droot, "del.tmp-deadjob", "pseg=0")
    os.makedirs(dead)
    with open(os.path.join(dead, "part-0.parquet"), "w") as f:
        f.write("x")
    for p in (dead, os.path.join(dead, "part-0.parquet"),
              os.path.dirname(dead)):
        os.utime(p, (old, old))

    cat.expire_snapshots(keep_last=10_000)
    assert os.path.isdir(top), "in-flight staging dir was swept"
    assert not os.path.isdir(os.path.dirname(dead)), "debris survived"
    shutil.rmtree(top, ignore_errors=True)


def test_compaction_driver_collect_fallback(spark, docs_df,  # noqa: F811
                                            tmp_path_factory, monkeypatch):
    """PSL_DELETES_DRIVER_COLLECT=1 forces the closure-shipped tombstone
    path (the last-resort fallback for stores pyarrow.fs can't resolve) —
    it must apply deletes identically to the default worker-direct read."""
    monkeypatch.setenv("PSL_DELETES_DRIVER_COLLECT", "1")
    idx_dir = str(tmp_path_factory.mktemp("del_collect") / "idx")
    build_index(spark, docs_df, idx_dir, id_col="doc_id", segment_docs=128)
    base_ids = SearchIndex(spark, idx_dir).search_and_ids(Q)
    victims = [int(x) for x in base_ids[1::2]]
    delete_docs(spark, idx_dir, victims)
    pre_ids = SearchIndex(spark, idx_dir).search_and_ids(Q)

    compact_segments(spark, idx_dir, group_size=2)
    idx = SearchIndex(spark, idx_dir)
    assert idx.delete_files == [] and idx.applied_delete_files
    assert np.array_equal(idx.search_and_ids(Q), pre_ids)
    raw = idx.postings_df(list(QTERMS)).select("df").agg(
        F.sum("df")).collect()[0][0]
    assert int(raw) == sum(int(idx.count(t)) for t in QTERMS)


def test_concurrent_maintenance_stress(spark, docs_df,  # noqa: F811
                                       tmp_path_factory):
    """The whole concurrency model under real thread interleaving: three
    appends, three disjoint bulk deletes, and two compactions race on one
    index from separate threads (segment writers serialize on the writer
    flock; delete_docs stays concurrent and rebases at commit). The final
    state must be exactly the set algebra of the operations — original
    docs minus victims plus appends — independent of interleaving, on
    both query paths."""
    from concurrent.futures import ThreadPoolExecutor

    from pysearchlite_spark.streaming.ingest import append_batch

    idx_dir = str(tmp_path_factory.mktemp("stress") / "idx")
    build_index(spark, docs_df, idx_dir, id_col="doc_id", segment_docs=128)
    base_ids = SearchIndex(spark, idx_dir).search_and_ids(Q)
    n_orig = int(docs_df.count())

    all_ids = sorted(int(r["doc_id"]) for r in
                     docs_df.select("doc_id").collect())
    victims = all_ids[::7]
    slices = [victims[0::3], victims[1::3], victims[2::3]]
    batches = [
        spark.createDataFrame(
            [(f"stress{j}-{i}", f"stress page zzbatch{j} filler words")
             for i in range(8)], "url string, text string")
        for j in range(3)]

    def do_appends():
        for j, b in enumerate(batches):
            append_batch(spark, b, idx_dir, batch_id=100 + j)

    def do_deletes():
        for s in slices:
            delete_docs(spark, idx_dir, s)

    def do_compacts():
        for _ in range(2):
            compact_segments(spark, idx_dir, group_size=2)

    with ThreadPoolExecutor(3) as ex:
        futs = [ex.submit(f) for f in (do_appends, do_deletes, do_compacts)]
        for f in futs:
            f.result()  # surfaces any thread's exception

    idx = SearchIndex(spark, idx_dir)
    want = np.asarray(sorted(set(int(x) for x in base_ids) - set(victims)),
                      dtype=np.int64)
    assert np.array_equal(idx.search_and_ids(Q), want)
    assert np.array_equal(idx.search_and_ids(Q, distributed=True), want)
    for j, b in enumerate(batches):
        assert idx.count(f"zzbatch{j}") == 8
    live = idx.docmap_df().count()
    assert live == n_orig - len(victims) + 24
    # a final compaction folds any still-pending deletes in; nothing moves
    compact_segments(spark, idx_dir)
    idx = SearchIndex(spark, idx_dir)
    assert idx.delete_files == []
    assert np.array_equal(idx.search_and_ids(Q), want)
    assert idx.n_docs == live


def test_tombstones_sliced_by_posting_segment(spark, docs_df,
                                              tmp_path_factory):
    """Driver top-k attributes tombstones to their OWN posting segment
    (via the delete files' pseg), so a segment with no deletes keeps
    deleted=None (and block-max pruning) even when a neighbouring
    segment is heavily deleted — including when that neighbour carries
    none of the query's terms."""
    idx_dir = str(tmp_path_factory.mktemp("del_slice") / "idx")
    build_index(spark, docs_df, idx_dir, id_col="doc_id", segment_docs=128)
    idx = SearchIndex(spark, idx_dir)
    segs = {r["seg"]: r["ids"] for r in
            idx._docmap.groupBy("seg")
            .agg(F.collect_list("doc_id").alias("ids")).collect()}
    assert len(segs) >= 3, "need multiple segments"
    mid = sorted(segs)[1]
    victims = sorted(int(x) for x in segs[mid])[:40]
    delete_docs(spark, idx_dir, victims)

    idx2 = SearchIndex(spark, idx_dir)
    by_seg = idx2._deleted_by_seg()
    assert set(by_seg) == {int(mid)}  # ONLY the deleted segment has entries
    assert sorted(by_seg[int(mid)].tolist()) == victims

    # results still exclude the victims on the driver top-k path
    top = idx2.topk(Q, k=50)
    assert not (set(d for d, _ in top) & set(victims))
    # and match the distributed path
    top_d = idx2.topk(Q, k=50, distributed=True)
    assert [(d, round(s, 9)) for d, s in top] == \
           [(d, round(s, 9)) for d, s in top_d]
