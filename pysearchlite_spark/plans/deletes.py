"""Document deletion — Iceberg-style equality-delete files over the index.

The reference engine is append-only (no delete anywhere in
/root/reference/pysearchlite — verified in SURVEY.md §2); a 100-TB
training-data pipeline is not: dedup/quality passes produce doc-id lists
that must disappear from retrieval without rewriting a petabyte index.
This module adds the Lucene/Iceberg shape for that:

  * `delete_docs(...)` commits a DELETE FILE — parquet rows
    (doc_id, dseg), hive-partitioned by the POSTING segment (`pseg`) that
    currently holds each doc — plus a new snapshot whose `delete_files`
    list includes it. Nothing else is touched: O(deletes), not O(index).
  * Query time (engine.SearchIndex): pending delete files are masked out
    of every result — numpy searchsorted mask on the driver paths, a
    per-segment cogroup on the distributed paths (the 10^12-doc route:
    delete rows are keyed by posting segment, so each segment kernel sees
    only its own tombstones — no broadcast of a global delete set).
  * Compaction (plans.compaction) APPLIES pending deletes physically:
    the decode stage drops tombstoned doc_ids before repacking, global
    BM25 stats (n_docs, avgdl) are recomputed over the live docmap, and
    the files move to `applied_delete_files` (docmap rows still exist on
    disk, so docmap-level reads keep masking them; postings no longer
    need to).

BM25 semantics (documented, Lucene-identical): PENDING deletes hide
documents from results but do NOT change n_docs/avgdl/df — scores of the
surviving docs are unchanged until a compaction folds the deletes in and
refreshes the stats. Time travel: a snapshot taken before the delete
still returns the deleted docs (delete files are snapshot-scoped).
"""

from __future__ import annotations

import time
from typing import Iterable, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pysearchlite_spark.sources.catalog import IndexCatalog

DELETES_SCHEMA = "doc_id long, dseg long"


def deletes_df(spark: SparkSession, cat: IndexCatalog,
               file_ids: Iterable[int]) -> DataFrame:
    """(doc_id, dseg, pseg, del) rows of the given delete files; empty
    frame when there are none. pseg/del come back as hive partition
    columns — partition pruning applies when a caller filters pseg."""
    import os
    ids = [int(i) for i in file_ids]
    if not ids or not os.path.isdir(cat.deletes_dir()):
        return spark.createDataFrame(
            [], DELETES_SCHEMA + ", pseg long, del long")
    return (spark.read.option("basePath", cat.deletes_dir())
            .schema(DELETES_SCHEMA + ", pseg long, del long")
            .parquet(*[os.path.join(cat.deletes_dir(), f"del={i}")
                       for i in ids]))


def stage_routed_delete_file(rows: DataFrame, cat: IndexCatalog,
                             seg_map: dict, map_col: str,
                             n_targets: int) -> tuple:
    """THE one producer of the delete-file layout: route `rows`
    (doc_id, dseg[, pseg]) to their posting segment via pseg =
    seg_map[map_col] (identity where unmapped) and write them to a
    del.tmp-<uuid> staging dir under the deletes root, hive-partitioned by
    pseg with ≤1 writer task per partition dir. Returns (path, n_rows) —
    the count comes from an Observation on the staging write itself
    (result-stage placement after the exchange is exactly-once under task
    retries), so callers never rescan the file they just wrote. Callers
    rename the dir to its final del=<id> name under the manifest lock.
    Two routings share this: delete_docs maps dseg→pseg through the
    snapshot's pseg_of; compaction re-routes an existing pseg through its
    merge group map — any layout change (naming, schema, partitioning)
    must stay in ONE place or the decode stage's del=<f>/pseg=<seg>
    pruning silently diverges between fresh and carried files."""
    import os
    import uuid

    from pyspark.sql import Observation
    if seg_map:
        mapping = F.create_map(*[x for k, v in seg_map.items()
                                 for x in (F.lit(int(k)), F.lit(int(v)))])
        pseg = F.coalesce(mapping[F.col(map_col)], F.col(map_col))
    else:
        pseg = F.col(map_col)
    out = os.path.join(cat.deletes_dir(), f"del.tmp-{uuid.uuid4().hex}")
    obs = Observation()
    (rows.select("doc_id", "dseg", pseg.cast("long").alias("pseg"))
     .repartition(max(1, n_targets), F.col("pseg"))
     .observe(obs, F.count(F.lit(1)).alias("n"))
     .write.partitionBy("pseg").mode("overwrite").parquet(out))
    return out, int(obs.get["n"])


def delete_docs(spark: SparkSession, index_dir: str,
                ids: Union[DataFrame, Iterable[int]],
                id_col: str = "doc_id",
                prevalidated: bool = False,
                _pre_commit_hook=None) -> int:
    """Commit a delete of the given doc_ids against the CURRENT snapshot.
    Returns the new snapshot id.

    ids: a DataFrame with an id column (the scale path — e.g. the output
    of a dedup pass) or a plain iterable of ints. Ids are validated
    against the live docmap (unknown or already-deleted ids are ignored,
    making repeated deletes idempotent); each surviving row is routed to
    the posting segment that currently holds it via the snapshot's
    `pseg_of` map (identity until a compaction diverges doc segments
    from posting segments).

    prevalidated=True: `ids` is a DataFrame of (doc_id, dseg) rows the
    caller already derived from the LIVE docmap (e.g. upsert_batch's url
    semi-join) — skips the validating docmap scan and prior-tombstone
    anti-join instead of repeating them."""
    cat = IndexCatalog(index_dir)
    snap = cat.current_snapshot()
    if snap is None:
        raise ValueError(f"no committed snapshot in {index_dir}")
    doc_segs = [int(s) for s in snap.get("doc_segments", snap["segments"])]

    if prevalidated:
        if not (isinstance(ids, DataFrame) and "dseg" in ids.columns):
            raise ValueError(
                "prevalidated=True requires a DataFrame of "
                "(doc_id, dseg) rows derived from the live docmap")
        rows = ids.select(F.col(id_col).cast("long").alias("doc_id"),
                          F.col("dseg").cast("long")).distinct()
    else:
        if isinstance(ids, DataFrame):
            ids_df = ids.select(F.col(id_col).cast("long").alias("doc_id"))
        else:
            import pandas as pd
            ids_df = spark.createDataFrame(
                pd.DataFrame({"doc_id": [int(i) for i in ids]}),
                "doc_id long")
        ids_df = ids_df.distinct()

        from pysearchlite_spark.sources.catalog import DOCMAP_SCHEMA
        docmap = (spark.read.schema(DOCMAP_SCHEMA)
                  .parquet(cat.docmap_dir())
                  .filter(F.col("seg").isin(doc_segs)))
        already = [int(i) for i in (snap.get("delete_files") or [])] + \
                  [int(i) for i in (snap.get("applied_delete_files")
                                    or [])]
        prior = deletes_df(spark, cat, already).select("doc_id")
        rows = (docmap.join(ids_df, "doc_id", "left_semi")
                .join(prior, "doc_id", "left_anti")
                .select("doc_id", F.col("seg").alias("dseg")))

    # Write to a TEMP name first, then allocate the id and rename UNDER
    # the manifest lock: allocating before the (long) Spark write would
    # let a concurrently-committed later id raise the expire sweep's
    # "max referenced" watermark above this in-flight dir and sweep it
    # mid-write. The rename makes the dir appear with an id ABOVE every
    # referenced/on-disk id, which the sweep never touches; crashed tmp
    # dirs (del.tmp-*) are invisible to readers/allocation and reclaimed
    # by expire_snapshots' sweep.
    import os
    import shutil

    def _pseg_map(s: dict) -> dict:
        return {int(k): int(v)
                for k, v in (s["stats"].get("pseg_of") or {}).items()}

    def _route_and_write(src: DataFrame, pseg_of: dict) -> tuple:
        # ≤1 writer task per pseg partition dir, like the docmap writer
        n_pseg = max(1, len(set(pseg_of.values()) or doc_segs))
        return stage_routed_delete_file(src, cat, pseg_of, "dseg", n_pseg)

    routing_snap = snap
    # row count observed on the staging write itself — no post-write rescan
    tmp_out, n_new = _route_and_write(rows, _pseg_map(routing_snap))
    if n_new == 0:
        # fully idempotent no-op: registering an empty delete file would
        # permanently grow the pending list (every distributed query scans
        # it, every compaction carries it) for zero information
        shutil.rmtree(tmp_out, ignore_errors=True)
        return int(snap["snapshot_id"])

    # Allocate + rename + COMMIT under ONE lock acquisition, REBASED onto
    # the snapshot that is current AT COMMIT TIME — the validating scan and
    # the Spark write above take seconds, and carrying forward the lists of
    # the pre-write snapshot would silently drop whatever a concurrent
    # committer (another delete, an append) added in between (lost update;
    # its delete file would then be physically expired while still wanted).
    # If a concurrent COMPACTION changed pseg_of, the staged file's pseg
    # routing is stale — re-route from the already-materialized tmp rows
    # (never from `rows`: its lineage reads delete files of the original
    # snapshot, which a concurrent expire may have removed) and retry.
    if _pre_commit_hook is not None:  # test seam: inject a concurrent
        _pre_commit_hook()            # commit into the rebase window
    while True:
        with cat._manifest_lock():
            cur = cat.current_snapshot()
            if _pseg_map(cur) == _pseg_map(routing_snap):
                did = cat.max_delete_file_id() + 1
                os.rename(tmp_out,
                          os.path.join(cat.deletes_dir(), f"del={did}"))
                # n_deleted_pending may overcount if a concurrent delete
                # tombstoned overlapping ids (masking is a set union, so
                # results stay correct); compaction recomputes exact counts
                stats = dict(cur["stats"])
                stats["n_deleted_pending"] = int(
                    stats.get("n_deleted_pending", 0)) + int(n_new)
                lineage = dict(cur.get("lineage") or {})
                lineage.update({"op": "delete_docs", "delete_file": did,
                                "n_deleted": int(n_new),
                                "deleted_at": time.time()})
                return cat._commit_snapshot_locked(
                    cur["segments"], stats, lineage,
                    posting_segments=cur.get("posting_segments",
                                             cur["segments"]),
                    doc_segments=cur.get("doc_segments", cur["segments"]),
                    delete_files=(cur.get("delete_files") or []) + [did],
                    applied_delete_files=cur.get("applied_delete_files")
                    or [])
        staged = (spark.read.option("basePath", tmp_out)
                  .schema(DELETES_SCHEMA + ", pseg long").parquet(tmp_out)
                  .select("doc_id", "dseg"))
        retry_out, n_new = _route_and_write(staged, _pseg_map(cur))
        shutil.rmtree(tmp_out, ignore_errors=True)
        tmp_out, routing_snap = retry_out, cur
