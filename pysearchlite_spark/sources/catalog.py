"""Iceberg-shaped index catalog over partitioned Parquet.

The sandbox has no Iceberg runtime jar (SURVEY.md §7.1), so this implements
the Iceberg shape we rely on — snapshot ids, atomic commit, partitioned
append, segment manifests, time-travelable metadata — as partitioned Parquet
plus a JSON manifest committed by atomic rename. The API is narrow enough
that a real-Iceberg backend (`df.writeTo(...).append()` + snapshot API) can
replace it behind the same calls when the jar is present.

Layout under <root>/:
  manifest.json                      — atomic-rename committed catalog state
  docmap/seg=<s>/*.parquet           — (doc_id, url, doc_len)
  postings/seg=<s>/tb=<b>/*.parquet  — packed posting rows (codec.py schema)
  build_log/*.parquet                — per-partition build metrics + lineage
Staging (resumability): segments are built into the same directories but only
become visible when their ids are committed into manifest.json; a re-run
lists staged-but-uncommitted segment dirs and skips rebuilding them.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from dataclasses import dataclass, field
from typing import List, Optional

from pysearchlite_spark.locks import staging_age

MANIFEST = "manifest.json"

POSTINGS_SCHEMA = (
    "term string, seg long, tb int, df long, "
    "docs binary, tfs binary, dls binary, "
    "first_docs array<long>, doc_offs array<int>, tf_offs array<int>, "
    "dl_offs array<int>, max_partial array<double>, "
    # positional sidecar (NULL on non-positional indexes; parquet files
    # written before positions existed simply lack the columns and read
    # as NULL under this explicit schema). Kept in the same row so one
    # pruned scan serves phrase queries; column pruning means boolean /
    # top-k queries never read the (heavier) position pages.
    "pos binary, pos_offs array<int>"
)

DOCMAP_SCHEMA = "doc_id long, url string, doc_len long, seg long"

BUILD_LOG_SCHEMA = (
    "seg long, tb int, n_terms long, n_postings long, bytes_packed long, "
    "elapsed_sec double, terms_per_sec double, postings_per_sec double, "
    "source string, built_at double"
)


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: Optional[int]
    segments: List[int]
    stats: dict
    lineage: dict
    ts: float = field(default_factory=time.time)


class IndexCatalog:
    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ---------------------------------------------------------- manifest --
    def _manifest_path(self) -> str:
        return os.path.join(self.root, MANIFEST)

    def _manifest_lock(self):
        """Exclusive flock over manifest mutations — the ONE lock every
        committer (commit_snapshot, expire_snapshots, delete-file id
        allocation) must hold; atomic rename alone prevents torn writes
        but not lost updates. NOT re-entrant (flock on a second fd of the
        same file blocks) — never nest it."""
        from pysearchlite_spark.locks import flock_ctx
        return flock_ctx(os.path.join(self.root, ".manifest.lock"))

    def writer_lock(self):
        """Exclusive flock serializing SEGMENT-WRITING maintenance ops
        (build_index resume, append/upsert ingest, compaction) for the
        whole job, not just the commit: these ops are mutually destructive
        mid-flight — each one's crash-recovery housekeeping
        (drop_uncommitted_segments) reclaims the other's staged-but-
        uncommitted seg dirs, and both allocate ids from max_seg_id().
        delete_docs and expire_snapshots do NOT take it (tombstone-only —
        they stay concurrent with any writer via commit-time rebase).
        Lock order is writer → manifest, never the reverse; like
        _manifest_lock it is NOT re-entrant."""
        from pysearchlite_spark.locks import flock_ctx
        return flock_ctx(os.path.join(self.root, ".writer.lock"))

    def _write_manifest(self, m: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path())

    def load_manifest(self) -> dict:
        p = self._manifest_path()
        if not os.path.exists(p):
            return {"snapshots": [], "current": None}
        with open(p) as f:
            return json.load(f)

    def current_snapshot(self) -> Optional[dict]:
        m = self.load_manifest()
        if m["current"] is None:
            return None
        return next(s for s in m["snapshots"] if s["snapshot_id"] == m["current"])

    def committed_seg_ids(self) -> set:
        """Every segment id referenced by ANY snapshot (doc or posting) —
        ids whose on-disk dirs must never be dropped (time travel)."""
        out: set = set()
        for s in self.load_manifest()["snapshots"]:
            for key in ("segments", "posting_segments", "doc_segments"):
                out.update(int(x) for x in (s.get(key) or []))
        return out

    def drop_uncommitted_segments(self) -> List[int]:
        """Remove every seg= dir (staged or partial) not referenced by any
        snapshot — crash-recovery housekeeping for append-mode writers and
        compaction (orphaned attempt dirs never collide with new ids, since
        max_seg_id counts them, but they'd leak disk forever).

        EXCEPTION: while a live batch-build stage-0 checkpoint exists
        (_stage/runs/_STAGED), seg dirs carrying a _STAGED marker are a
        suspended build_index(max_segments=...) run's resumable work, not
        crash debris — they are kept so compaction housekeeping doesn't
        silently discard the suspended build (streaming append refuses
        outright in that state — see ingest.append_batch — because the
        suspended build's remaining ids derive from docID ranges, not
        max_seg_id). Returns the dropped ids."""
        committed = self.committed_seg_ids()
        protect_staged = os.path.exists(os.path.join(
            self.root, "_stage", "runs", "_STAGED"))
        dropped = []
        for table in ("docmap", "postings"):
            d = os.path.join(self.root, table)
            if not os.path.isdir(d):
                continue
            for name in os.listdir(d):
                if name.startswith("seg="):
                    seg = int(name.split("=", 1)[1])
                    if seg in committed:
                        continue
                    if protect_staged and os.path.exists(
                            os.path.join(d, name, "_STAGED")):
                        continue
                    shutil.rmtree(os.path.join(d, name))
                    dropped.append(seg)
        return sorted(set(dropped))

    def max_seg_id(self) -> int:
        """Largest segment id EVER allocated — across every snapshot's doc
        and posting segments AND staged-but-uncommitted dirs. New segment
        ids must come from above this: compaction and append each allocate
        ids, and deriving from only the current snapshot's own list let a
        post-compaction append collide with the compacted posting segment
        (overwriting committed files and its pack_avgdl). Returns -1 when
        nothing exists."""
        m = self.load_manifest()
        mx = -1
        for s in m["snapshots"]:
            for key in ("segments", "posting_segments", "doc_segments"):
                for seg in s.get(key) or []:
                    mx = max(mx, int(seg))
        for table in ("docmap", "postings"):
            d = os.path.join(self.root, table)
            if os.path.isdir(d):
                for name in os.listdir(d):
                    if name.startswith("seg="):
                        mx = max(mx, int(name.split("=", 1)[1]))
        return mx

    def snapshot(self, snapshot_id: int) -> Optional[dict]:
        """Time travel: any committed snapshot by id (old segment files are
        never deleted by commits/compaction, so every snapshot in the
        manifest stays readable)."""
        m = self.load_manifest()
        return next((s for s in m["snapshots"]
                     if s["snapshot_id"] == snapshot_id), None)

    def commit_snapshot(self, segments: List[int], stats: dict,
                        lineage: dict,
                        posting_segments: Optional[List[int]] = None,
                        doc_segments: Optional[List[int]] = None,
                        delete_files: Optional[List[int]] = None,
                        applied_delete_files: Optional[List[int]] = None
                        ) -> int:
        """Atomic commit: write manifest to a temp file, rename over, under
        an exclusive flock — atomic rename alone prevents torn writes but
        NOT lost updates (two committers, e.g. a streaming append racing a
        compaction, would both read current=N and the second rename would
        erase the first's snapshot; real Iceberg does CAS-with-retry here).
        posting_segments / doc_segments may diverge from `segments` after
        compaction (postings rewritten, docmap untouched).

        delete_files: PENDING delete-file ids (Iceberg equality-delete
        shape) — their doc_ids must be masked out of every postings AND
        docmap read. applied_delete_files: ids a compaction has already
        applied to the postings (rewritten without those docs) but whose
        docmap rows still exist on disk — masked on docmap reads only.
        Callers carry both lists forward explicitly; omitting them means
        the snapshot has none (build from scratch)."""
        with self._manifest_lock():
            return self._commit_snapshot_locked(
                segments, stats, lineage, posting_segments, doc_segments,
                delete_files, applied_delete_files)

    def _commit_snapshot_locked(self, segments: List[int], stats: dict,
                                lineage: dict,
                                posting_segments: Optional[List[int]] = None,
                                doc_segments: Optional[List[int]] = None,
                                delete_files: Optional[List[int]] = None,
                                applied_delete_files: Optional[List[int]]
                                = None) -> int:
        """commit_snapshot's body for callers ALREADY holding
        _manifest_lock (it is not re-entrant). delete_docs needs this to
        make its id-allocate + del= rename + snapshot commit one atomic
        critical section — in a two-acquisition version, a concurrent
        delete committing a higher id in the window between this writer's
        rename and its commit would raise the expire sweep's
        max-referenced-id watermark above the renamed-but-uncommitted dir
        and the sweep would reclaim it as crash debris."""
        m = self.load_manifest()  # re-read UNDER the lock
        sid = (m["current"] or 0) + 1
        snap = Snapshot(sid, m["current"], sorted(segments), stats,
                        lineage)
        d = snap.__dict__
        d["posting_segments"] = sorted(posting_segments
                                       if posting_segments is not None
                                       else segments)
        d["doc_segments"] = sorted(doc_segments
                                   if doc_segments is not None
                                   else segments)
        d["delete_files"] = sorted(delete_files or [])
        d["applied_delete_files"] = sorted(applied_delete_files or [])
        m["snapshots"].append(d)
        m["current"] = sid
        self._write_manifest(m)
        return sid

    # ------------------------------------------------------------- paths --
    def docmap_dir(self) -> str:
        return os.path.join(self.root, "docmap")

    def postings_dir(self) -> str:
        return os.path.join(self.root, "postings")

    def build_log_dir(self) -> str:
        return os.path.join(self.root, "build_log")

    def deletes_dir(self) -> str:
        return os.path.join(self.root, "deletes")

    def max_delete_file_id(self) -> int:
        """Largest delete-file id ever allocated — across every snapshot
        (pending or applied) and on-disk del= dirs (a crashed delete_docs
        may have written files without committing). -1 when none."""
        mx = -1
        for s in self.load_manifest()["snapshots"]:
            for key in ("delete_files", "applied_delete_files"):
                for i in s.get(key) or []:
                    mx = max(mx, int(i))
        d = self.deletes_dir()
        if os.path.isdir(d):
            for name in os.listdir(d):
                if name.startswith("del="):
                    mx = max(mx, int(name.split("=", 1)[1]))
        return mx

    # -------------------------------------------------------- resumability --
    def staged_segments(self, table: str) -> List[int]:
        """Segment ids already written (staged) for `table`, committed or not.
        A staged segment dir counts only if it contains a _STAGED marker
        (written after the segment's files are fully flushed)."""
        d = os.path.join(self.root, table)
        if not os.path.isdir(d):
            return []
        out = []
        for name in os.listdir(d):
            if name.startswith("seg=") and os.path.exists(
                    os.path.join(d, name, "_STAGED")):
                out.append(int(name.split("=", 1)[1]))
        return sorted(out)

    def mark_staged(self, table: str, seg: int) -> None:
        d = os.path.join(self.root, table, f"seg={seg}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "_STAGED"), "w") as f:
            f.write(str(time.time()))

    def drop_segment(self, table: str, seg: int) -> None:
        d = os.path.join(self.root, table, f"seg={seg}")
        if os.path.isdir(d):
            shutil.rmtree(d)

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Iceberg-style snapshot expiration: keep the newest `keep_last`
        snapshots (the current one always survives), drop the rest from
        the manifest, and delete every segment dir and delete-file dir
        referenced ONLY by dropped snapshots. This is the op that frees
        the disk time travel pins — without it every compaction's
        pre-merge segments live forever.

        The manifest rewrite runs under the manifest flock (same
        lost-update protection as commit_snapshot) but the physical
        rmtrees run AFTER the lock is released: bulk deletion of
        terabytes of pre-merge segment dirs must not stall every
        concurrent delete_docs / append / compaction commit for its
        duration. Deferral is safe because the doomed paths can never
        become referenced again — segment and delete-file ids are
        allocated strictly above every id ever seen on disk or in any
        snapshot, so a dir unreferenced under the lock stays
        unreferenced forever; concurrent removals of the same orphan
        (drop_uncommitted_segments) are tolerated via ignore_errors. A
        crash mid-way leaves at worst orphaned-but-unreferenced dirs:
        seg= orphans are reclaimed by drop_uncommitted_segments, and
        del= orphans by the sweep at the START of the next expire run.
        The sweep is safe against in-flight delete_docs writes because
        those stage under a del.tmp-* name and take a del=<id> name via
        allocate+rename+COMMIT in ONE critical section of this same lock
        — a visible del= dir is therefore either already referenced by a
        snapshot or crash debris; it can never be about-to-be-referenced.
        Unreferenced del= dirs below the max referenced id are
        additionally age-guarded (like Iceberg's remove-orphan-files
        convention and the stale del.tmp-* reaping) so even a future
        two-phase writer can't lose data to this sweep. Returns counts."""
        to_rm: list = []  # physical deletion deferred past the lock
        with self._manifest_lock():
            m = self.load_manifest()
            snaps = sorted(m["snapshots"], key=lambda s: s["snapshot_id"])
            keep_last = max(1, int(keep_last))
            kept, dropped = snaps[-keep_last:], snaps[:-keep_last]

            # orphan sweep: del= dirs no snapshot references, left by a
            # crash between a previous expire's manifest rewrite and its
            # rmtree loop (or a crashed delete_docs before its commit).
            # Only ids strictly below the max referenced id are swept —
            # an id above it may be an in-flight delete_docs write.
            all_ref = set()
            for s in snaps:
                for key in ("delete_files", "applied_delete_files"):
                    all_ref.update(int(x) for x in (s.get(key) or []))
            swept = 0
            droot = self.deletes_dir()
            if os.path.isdir(droot):
                mx = max(all_ref) if all_ref else None

                # staging_age (locks.py): deep newest-mtime lease shared
                # with the ANN add.tmp-* sweep — in-flight writes keep
                # refreshing their lease; a dir vanished to a concurrent
                # rmtree reads as -1.0 (not sweepable, never a failure)
                for name in os.listdir(droot):
                    p = os.path.join(droot, name)
                    if name.startswith("del.tmp-"):
                        # a crashed delete_docs' staging dir — but an
                        # IN-FLIGHT one looks identical (its write runs
                        # outside the lock), so only reap stale ones
                        if staging_age(p, deep=True) > 86400:
                            to_rm.append(p)
                            swept += 1
                        continue
                    if not name.startswith("del=") or mx is None:
                        continue
                    i = int(name.split("=", 1)[1])
                    if (i < mx and i not in all_ref
                            and staging_age(p, deep=False) > 86400):
                        to_rm.append(p)
                        swept += 1

            if not dropped:
                result = {"dropped_snapshots": 0,
                          "dropped_posting_segments": 0,
                          "dropped_doc_segments": 0,
                          "dropped_delete_files": 0,
                          "swept_orphan_delete_files": swept}
            else:
                result = None  # computed below, still under the lock

            def segs(ss, kind):
                # per-TABLE references: after a compaction the current
                # snapshot's doc_segments still point at the pre-merge seg
                # ids (docmap untouched) while its posting_segments moved
                # on — the old POSTINGS dirs are dead but the docmap dirs
                # are live, so the two tables expire independently. The
                # legacy `segments` key is only a FALLBACK for snapshots
                # written before the split (it equals doc_segments after a
                # compaction and would wrongly pin dead postings dirs).
                out = set()
                for s in ss:
                    v = s.get(kind)
                    if v is None:
                        v = s.get("segments") or []
                    out.update(int(x) for x in v)
                return out

            def dels(ss):
                out = set()
                for s in ss:
                    for key in ("delete_files", "applied_delete_files"):
                        out.update(int(x) for x in (s.get(key) or []))
                return out

            if dropped:
                post_rm = (segs(dropped, "posting_segments")
                           - segs(kept, "posting_segments"))
                doc_rm = (segs(dropped, "doc_segments")
                          - segs(kept, "doc_segments"))
                del_rm = dels(dropped) - dels(kept)
                m["snapshots"] = kept
                self._write_manifest(m)
                to_rm.extend(os.path.join(self.root, "postings",
                                          f"seg={seg}") for seg in post_rm)
                to_rm.extend(os.path.join(self.root, "docmap",
                                          f"seg={seg}") for seg in doc_rm)
                to_rm.extend(os.path.join(self.deletes_dir(), f"del={i}")
                             for i in del_rm)
                result = {"dropped_snapshots": len(dropped),
                          "dropped_posting_segments": len(post_rm),
                          "dropped_doc_segments": len(doc_rm),
                          "dropped_delete_files": len(del_rm),
                          "swept_orphan_delete_files": swept}
        # lock released: bulk physical deletion no longer blocks committers
        for p in to_rm:
            shutil.rmtree(p, ignore_errors=True)
        return result

    def destroy(self) -> None:
        if os.path.isdir(self.root):
            shutil.rmtree(self.root)
