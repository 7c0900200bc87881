"""Segment compaction — the distributed multi-way posting-list merge.

Re-expresses the reference's pairwise run-merge tree
(/root/reference/pysearchlite/inverted_index_skip_list.py:73-109 merge_index,
:132-140 merge loop) as ONE shuffle: because segments partition the docID
space into disjoint ascending ranges, merging per-term posting lists across
segments is ordered concatenation (the same invariant the reference exploits
when concatenating id lists of equal tokens across runs, merge_ids,
gamma_codecs.py:204-211). So an R-way merge is
    decode old packed rows → RUNS-shaped array rows (new_seg, tb, term)
    → the SAME exchange+merge-pack pipeline the build uses (_pack_runs):
      hash-partition by (seg, tb), sortWithinPartitions, streaming
      merge-pack with term-boundary carry, worker-direct parquet sink
— no k-way heap needed, and Spark's shuffle replaces the log2(R) pass tree.
(The previous groupBy(collect_list(struct(binary...))) plan shuffled packed
binaries as JVM objects and wrote 128MB JVM row groups whose poor term
pruning made post-compaction term fetches 10x slower.)

Old segment files stay on disk; visibility flips atomically at the manifest
commit (new snapshot's posting_segments), preserving time travel. Query
results before/after compaction are identical (tested).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pysearchlite_spark import codec
from pysearchlite_spark.plans.builder import (RUNS_SCHEMA, _pack_runs,
                                              _write_build_log_rows)
from pysearchlite_spark.sources.catalog import POSTINGS_SCHEMA, IndexCatalog


def _make_decode_stage(group_map: dict, deletes_root: Optional[str] = None,
                       delete_file_ids: tuple = (),
                       deleted_global=None):
    """Factory: packed posting rows → RUNS-shaped array rows, with the seg
    remapped via group_map INSIDE the UDF (the pre-remap seg is needed to
    locate the segment's tombstone files) and pending deletes dropped from
    the decoded streams. Output built as ListArrays over flat decoded
    arrays (no per-row Python objects on the output path).

    Tombstone source, in order: `deleted_global` (a pre-collected sorted
    numpy array — the forced/unresolvable-scheme fallback), else
    worker-direct parquet reads of deletes/del=<f>/pseg=<old seg> per
    segment (partition-pruned, loaded once per task via a cache). Plain
    paths read through the local filesystem (the deletes dir lives in the
    same tree as the postings this very job scans, so task visibility is
    guaranteed); scheme'd paths (s3://, hdfs://, …) read through
    pyarrow.fs so no tombstone set ever materializes on the driver."""
    def decode(batches):
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq
        out_schema = pa.schema([
            ("seg", pa.int64()), ("tb", pa.int32()), ("term", pa.string()),
            ("doc_ids", pa.list_(pa.int64())), ("tfs", pa.list_(pa.int64())),
            ("dls", pa.list_(pa.int64())), ("url", pa.string()),
            ("poss", pa.list_(pa.int64()))])
        tomb_cache: dict = {}
        fs_cache: list = []  # [(filesystem, base_path)] once resolved

        def _read_part(fid: int, old_seg: int):
            if "://" not in deletes_root:
                d = os.path.join(deletes_root, f"del={fid}",
                                 f"pseg={old_seg}")
                if not os.path.isdir(d):
                    return None
                return pq.read_table(d, columns=["doc_id"])
            if not fs_cache:
                from pyarrow import fs as pafs
                fs_cache.append(pafs.FileSystem.from_uri(deletes_root))
            fs, base = fs_cache[0]
            d = f"{base.rstrip('/')}/del={fid}/pseg={old_seg}"
            try:
                return pq.read_table(d, columns=["doc_id"], filesystem=fs)
            except (FileNotFoundError, OSError):
                return None  # this segment has no rows in this file

        def tombs(old_seg: int) -> np.ndarray:
            if deleted_global is not None:
                return deleted_global
            if old_seg not in tomb_cache:
                parts = []
                for fid in delete_file_ids:
                    t = _read_part(fid, old_seg)
                    if t is not None:
                        parts.append(t.column("doc_id").to_numpy())
                tomb_cache[old_seg] = (np.unique(np.concatenate(parts))
                                       if parts else
                                       np.empty(0, dtype=np.int64))
            return tomb_cache[old_seg]

        masking = bool(delete_file_ids) or deleted_global is not None
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            cols = {name: batch.column(i)
                    for i, name in enumerate(batch.schema.names)}
            segs = cols["seg"].to_numpy()
            dfs = cols["df"].to_numpy()
            pos_bufs = (cols["pos"].to_pylist() if "pos" in cols
                        else [None] * n)
            doc_parts, tf_parts, dl_parts, pos_parts = [], [], [], []
            sizes = np.empty(n, dtype=np.int64)
            for i, (docs_b, tfs_b, dls_b, df) in enumerate(zip(
                    cols["docs"].to_pylist(), cols["tfs"].to_pylist(),
                    cols["dls"].to_pylist(), dfs)):
                df = int(df)
                docs = codec.unpack_docs(docs_b, df)
                tfs = codec.unpack_stream(tfs_b, df).astype(np.int64)
                dls = codec.unpack_stream(dls_b, df).astype(np.int64)
                pvals = None
                if pos_bufs[i] is not None:
                    # per-doc runs are delimited by the PRE-mask tfs
                    pvals = codec.unpack_positions(pos_bufs[i], tfs)
                if masking:
                    t = tombs(int(segs[i]))
                    if t.size and docs.size:
                        keep = codec.tombstone_keep_mask(docs, t)
                        if pvals is not None and not keep.all():
                            occ = np.zeros(tfs.size + 1, dtype=np.int64)
                            np.cumsum(tfs, out=occ[1:])
                            kidx = np.flatnonzero(keep)
                            kt = tfs[kidx]
                            oocc = np.zeros(kidx.size + 1, dtype=np.int64)
                            np.cumsum(kt, out=oocc[1:])
                            take = (np.repeat(occ[kidx], kt)
                                    + np.arange(int(oocc[-1]),
                                                dtype=np.int64)
                                    - np.repeat(oocc[:-1], kt))
                            pvals = pvals[take]
                        docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
                sizes[i] = docs.size
                doc_parts.append(docs)
                tf_parts.append(tfs)
                dl_parts.append(dls)
                pos_parts.append(pvals)
            # rows whose postings were deleted away vanish (df would be 0)
            rkeep = sizes > 0
            if not rkeep.all():
                idx = np.flatnonzero(rkeep)
                segs = segs[idx]
                doc_parts = [doc_parts[i] for i in idx]
                tf_parts = [tf_parts[i] for i in idx]
                dl_parts = [dl_parts[i] for i in idx]
                pos_parts = [pos_parts[i] for i in idx]
                sizes = sizes[idx]
                tb_arr = cols["tb"].take(pa.array(idx))
                term_arr = cols["term"].take(pa.array(idx))
            else:
                tb_arr, term_arr = cols["tb"], cols["term"]
            m = len(sizes)
            if m == 0:
                continue
            new_segs = np.asarray(
                [group_map[int(s)] for s in segs], dtype=np.int64)
            offs = np.zeros(m + 1, dtype=np.int64)
            np.cumsum(sizes, out=offs[1:])
            # list offsets are int32: a decode Arrow batch must stay under
            # 2^31 postings/occurrences (guaranteed by maxRecordsPerBatch
            # in practice — guard loudly rather than wrap silently)
            if offs[-1] > np.iinfo(np.int32).max:
                raise OverflowError(
                    f"decode batch holds {int(offs[-1])} postings, over "
                    "the int32 list-offset limit — lower "
                    "spark.sql.execution.arrow.maxRecordsPerBatch")
            offs32 = pa.array(offs.astype(np.int32))
            with_pos = [pv is not None for pv in pos_parts]
            if any(with_pos):
                if not all(with_pos):
                    raise ValueError("mixed positional and non-positional "
                                     "posting rows in one compaction batch")
                pocc = np.zeros(m + 1, dtype=np.int64)
                np.cumsum(np.fromiter((p.size for p in pos_parts),
                                      dtype=np.int64, count=m),
                          out=pocc[1:])
                if pocc[-1] > np.iinfo(np.int32).max:
                    raise OverflowError(
                        f"decode batch holds {int(pocc[-1])} positions, "
                        "over the int32 list-offset limit — lower "
                        "spark.sql.execution.arrow.maxRecordsPerBatch")
                poss_arr = pa.ListArray.from_arrays(
                    pa.array(pocc.astype(np.int32)),
                    pa.array(np.concatenate(pos_parts)))
            else:
                poss_arr = pa.nulls(m, pa.list_(pa.int64()))
            yield pa.RecordBatch.from_arrays([
                pa.array(new_segs), tb_arr, term_arr,
                pa.ListArray.from_arrays(
                    offs32, pa.array(np.concatenate(doc_parts))),
                pa.ListArray.from_arrays(
                    offs32, pa.array(np.concatenate(tf_parts))),
                pa.ListArray.from_arrays(
                    offs32, pa.array(np.concatenate(dl_parts))),
                pa.nulls(m, pa.string()),
                poss_arr,
            ], schema=out_schema)

    return decode


def compact_segments(spark: SparkSession, index_dir: str,
                     group_size: Optional[int] = None,
                     _pre_commit_hook=None) -> int:
    """Merge the current snapshot's posting segments into groups of
    `group_size` consecutive segments (default: all into one). Returns the
    new snapshot id. Hot-term row growth is bounded by group_size ×
    segment_docs postings per merged row — choose group_size so that bound
    fits executor memory at the target scale.

    Holds the catalog writer lock for the whole merge (appends and other
    compactions are excluded — their housekeeping would reclaim this run's
    staged dirs). delete_docs stays CONCURRENT: tombstones committed while
    the merge runs are re-routed to the merged posting segments and carried
    forward as still-pending at commit time (they were not visible to the
    decode stage, so their docs exist in the new postings and keep being
    masked until the next compaction applies them).

    _pre_commit_hook: test seam, called once after the merge write but
    before the commit loop — lets tests deterministically inject a
    concurrent delete_docs commit into the rebase window."""
    cat = IndexCatalog(index_dir)
    with cat.writer_lock():
        return _compact_segments_locked(spark, index_dir, cat, group_size,
                                        _pre_commit_hook)


def _compact_segments_locked(spark: SparkSession, index_dir: str,
                             cat: IndexCatalog,
                             group_size: Optional[int],
                             _pre_commit_hook=None) -> int:
    snap = cat.current_snapshot()
    if snap is None:
        raise ValueError(f"no committed snapshot in {index_dir}")
    stats = snap["stats"]
    avgdl = float(stats["avgdl"])
    old_segs = sorted(snap.get("posting_segments", snap["segments"]))
    has_pending = bool(snap.get("delete_files"))
    if len(old_segs) <= 1 and not has_pending:
        return int(snap["snapshot_id"])  # nothing to merge or apply
    group_size = group_size or len(old_segs)

    # Crash-safety: a previous compaction attempt over this snapshot may
    # have died after writing part files but before the manifest commit.
    # Those dirs are invisible (snapshot isolation) but would leak forever
    # AND, if this rerun reused their ids with a different n_out_parts,
    # become duplicate posting rows at commit. Drop them first (suspended-
    # build staged segments are protected inside the call), THEN allocate —
    # so reruns reuse the cleaned ids instead of drifting upward.
    cat.drop_uncommitted_segments()
    # allocate from above EVERY id ever used (any snapshot, doc or posting,
    # or staged) — base = max(current posting segs)+1 could collide with a
    # doc segment id a later append derives, or with time-travel segments
    base = cat.max_seg_id() + 1
    group_of = {s: base + i // group_size for i, s in enumerate(old_segs)}

    # ---- pending tombstones: applied physically by this merge ------------
    pending = [int(x) for x in (snap.get("delete_files") or [])]
    deleted_global = None
    worker_direct_deletes = bool(pending) and (
        os.environ.get("PSL_DELETES_DRIVER_COLLECT") != "1")
    if worker_direct_deletes and "://" in cat.deletes_dir():
        # scheme'd (object-store/HDFS) index: tasks stream tombstones via
        # pyarrow.fs straight from the store — probe from the driver that
        # the scheme resolves before committing to that plan
        try:
            from pyarrow import fs as pafs
            pafs.FileSystem.from_uri(cat.deletes_dir())
        except Exception:
            worker_direct_deletes = False
    if pending and not worker_direct_deletes:
        # LAST-resort fallback (pyarrow can't resolve the store's scheme,
        # or PSL_DELETES_DRIVER_COLLECT=1 forces it): ship the collected
        # sorted id set in the closure. This materializes the whole
        # pending tombstone set on the driver — a 10^9-id delete is ~8 GB
        # there — which is exactly why it is no longer the default: the
        # deletes dir lives in the same tree as the postings dir this job
        # already reads, so any filesystem the executors can scan postings
        # from can serve per-segment worker-direct tombstone reads too.
        from pysearchlite_spark.plans.deletes import deletes_df
        pdf = deletes_df(spark, cat, pending).select("doc_id").toPandas()
        deleted_global = np.unique(pdf["doc_id"].to_numpy(np.int64))
    if pending:
        # stats refresh BEFORE packing: repacked block-max bounds and the
        # recorded avgdl must describe the post-delete corpus
        from pysearchlite_spark.plans.deletes import deletes_df
        from pysearchlite_spark.sources.catalog import DOCMAP_SCHEMA
        doc_segs = [int(s) for s in snap.get("doc_segments",
                                             snap["segments"])]
        all_files = pending + [int(x) for x in
                               (snap.get("applied_delete_files") or [])]
        live = (spark.read.schema(DOCMAP_SCHEMA)
                .parquet(cat.docmap_dir())
                .filter(F.col("seg").isin(doc_segs))
                .join(deletes_df(spark, cat, all_files).select("doc_id"),
                      "doc_id", "left_anti")
                .agg(F.count("*").alias("n"),
                     F.sum("doc_len").alias("sdl")).collect()[0])
        n_docs_live = int(live["n"] or 0)
        sum_dl_live = int(live["sdl"] or 0)
        avgdl = (sum_dl_live / n_docs_live) if n_docs_live else 0.0

    t0 = time.time()
    postings = (spark.read.schema(POSTINGS_SCHEMA)
                .parquet(cat.postings_dir())
                .filter(F.col("seg").isin(old_segs)))
    decode = _make_decode_stage(
        {int(s): int(g) for s, g in group_of.items()},
        deletes_root=cat.deletes_dir(),
        delete_file_ids=tuple(pending) if deleted_global is None else (),
        deleted_global=deleted_global)
    runs_like = (postings
                 .select("seg", "tb", "term", "df", "docs", "tfs", "dls",
                         "pos")
                 .mapInArrow(decode, RUNS_SCHEMA))

    par = spark.sparkContext.defaultParallelism
    n_out_parts = max(1, min(len(set(group_of.values()))
                             * int(stats["n_buckets"]), 4 * par))
    new_segs = sorted(set(group_of.values()))
    if "://" not in cat.postings_dir():
        metric_rows = _pack_runs(runs_like.drop("url"), avgdl=avgdl,
                                 n_out_parts=n_out_parts,
                                 sink_dir=cat.postings_dir()).collect()
        for s in new_segs:
            cat.mark_staged("postings", s)
        _write_build_log_rows(spark, cat, metric_rows, time.time() - t0,
                              {"source": "compaction"})
    else:
        packed = _pack_runs(runs_like.drop("url"), avgdl=avgdl,
                            n_out_parts=n_out_parts)
        (packed.write.partitionBy("seg", "tb").mode("append")
         .parquet(cat.postings_dir()))
        for s in new_segs:
            cat.mark_staged("postings", s)

    lineage = dict(snap.get("lineage") or {})
    lineage.update({"compaction_of": old_segs, "compacted_at": time.time(),
                    "group_size": group_size})
    # repacked segments bake the CURRENT avgdl into their block-max bounds
    stats = dict(stats)
    stats["pack_avgdl"] = {str(s): avgdl for s in new_segs}
    doc_segs_out = snap.get("doc_segments", snap["segments"])
    # doc-seg → posting-seg routing for FUTURE delete_docs calls: compose
    # the previous map with this merge's grouping (identity where absent)
    old_pseg_of = {int(k): int(v)
                   for k, v in (stats.get("pseg_of") or {}).items()}
    new_pseg_of = {}
    for d in doc_segs_out:
        p = old_pseg_of.get(int(d), int(d))
        new_pseg_of[int(d)] = int(group_of.get(p, p))
    stats["pseg_of"] = {str(k): v for k, v in new_pseg_of.items()}
    applied = [int(x) for x in (snap.get("applied_delete_files") or [])]
    snap_pending_n = int(snap["stats"].get("n_deleted_pending", 0))
    if pending:
        # deletes are now physically absent from the postings: stats
        # describe the live corpus, and the files move to applied (docmap
        # rows still exist on disk, so docmap-level reads keep masking)
        stats["n_docs"] = n_docs_live
        stats["sum_dl"] = sum_dl_live
        stats["avgdl"] = avgdl
        stats["n_deleted_applied"] = int(
            stats.get("n_deleted_applied", 0)) + int(
            stats.pop("n_deleted_pending", 0))
        applied = sorted(applied + pending)
        lineage["applied_delete_files"] = pending

    if _pre_commit_hook is not None:
        _pre_commit_hook()

    # Commit-time rebase: delete_docs runs CONCURRENTLY with this merge
    # (it takes only the manifest lock), so the current snapshot may have
    # gained delete files since `snap`. Those tombstones were invisible to
    # the decode stage (their docs live on in the new postings) and their
    # pseg routing targets the pre-merge posting segments — carry each one
    # forward as still-pending, re-routed through this merge's group map,
    # or distributed reads would join them against dead segments and the
    # deleted docs would silently resurface. The re-route job runs OUTSIDE
    # the manifest lock; the loop re-checks for yet-newer files each pass.
    snap_pending_set = set(int(x) for x in pending)
    group_map = {int(s): int(g) for s, g in group_of.items()}
    rerouted: dict = {}
    while True:
        with cat._manifest_lock():
            cur = cat.current_snapshot()
            for key, want in (("doc_segments", doc_segs_out),
                              ("posting_segments", old_segs),
                              ("applied_delete_files",
                               snap.get("applied_delete_files") or [])):
                got = cur.get(key, cur["segments"]
                              if key.endswith("segments") else [])
                if sorted(int(x) for x in (got or [])) != sorted(
                        int(x) for x in (want or [])):
                    raise RuntimeError(
                        f"concurrent segment writer bypassed the writer "
                        f"lock ({key} changed mid-compaction)")
            extra = [int(f) for f in (cur.get("delete_files") or [])
                     if int(f) not in snap_pending_set]
            missing = [f for f in extra if f not in rerouted]
            if not missing:
                final_pending = []
                for f in extra:
                    did = cat.max_delete_file_id() + 1
                    os.rename(rerouted[f], os.path.join(
                        cat.deletes_dir(), f"del={did}"))
                    final_pending.append(did)
                carried = max(0, int(cur["stats"].get(
                    "n_deleted_pending", 0)) - snap_pending_n)
                if carried or extra:
                    stats["n_deleted_pending"] = carried
                    lineage["carried_delete_files"] = {
                        str(f): d for f, d in zip(extra, final_pending)}
                return cat._commit_snapshot_locked(
                    doc_segs_out, stats, lineage,
                    posting_segments=new_segs,
                    doc_segments=doc_segs_out,
                    delete_files=final_pending,
                    applied_delete_files=applied)
        for f in missing:
            rerouted[f] = _reroute_delete_file(spark, cat, f, group_map)


def _reroute_delete_file(spark: SparkSession, cat: IndexCatalog,
                         file_id: int, group_map: dict) -> str:
    """Rewrite one delete file's pseg partitioning through a compaction's
    old-posting-seg → merged-seg map (identity where unmapped); returns
    the routed del.tmp-* staging dir (the caller renames it to its final
    del=<id> name under the manifest lock). The original file stays on
    disk — intermediate snapshots reference it for time travel; expire
    reclaims it once they drop."""
    from pysearchlite_spark.plans.deletes import (deletes_df,
                                                  stage_routed_delete_file)
    path, _n = stage_routed_delete_file(
        deletes_df(spark, cat, [int(file_id)]), cat, group_map, "pseg",
        len(set(group_map.values())))
    return path
