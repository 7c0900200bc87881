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

import time
from typing import Optional

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pysearchlite_spark import codec
from pysearchlite_spark.plans.builder import (RUNS_SCHEMA, _pack_runs,
                                              _write_build_log_rows)
from pysearchlite_spark.sources.catalog import POSTINGS_SCHEMA, IndexCatalog


def _decode_stage(batches):
    """Packed posting rows → RUNS-shaped array rows (seg already remapped).
    Output built as ListArrays over flat decoded arrays (no per-row Python
    objects on the output path)."""
    import pyarrow as pa
    out_schema = pa.schema([
        ("seg", pa.int64()), ("tb", pa.int32()), ("term", pa.string()),
        ("doc_ids", pa.list_(pa.int64())), ("tfs", pa.list_(pa.int64())),
        ("dls", pa.list_(pa.int64())), ("url", pa.string())])
    for batch in batches:
        n = batch.num_rows
        if n == 0:
            continue
        cols = {name: batch.column(i)
                for i, name in enumerate(batch.schema.names)}
        dfs = cols["df"].to_numpy()
        doc_parts, tf_parts, dl_parts = [], [], []
        for docs_b, tfs_b, dls_b, df in zip(
                cols["docs"].to_pylist(), cols["tfs"].to_pylist(),
                cols["dls"].to_pylist(), dfs):
            df = int(df)
            doc_parts.append(codec.unpack_docs(docs_b, df))
            tf_parts.append(codec.unpack_stream(tfs_b, df).astype(np.int64))
            dl_parts.append(codec.unpack_stream(dls_b, df).astype(np.int64))
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(dfs, out=offs[1:])
        offs32 = pa.array(offs.astype(np.int32))
        yield pa.RecordBatch.from_arrays([
            cols["seg"], cols["tb"], cols["term"],
            pa.ListArray.from_arrays(
                offs32, pa.array(np.concatenate(doc_parts))),
            pa.ListArray.from_arrays(
                offs32, pa.array(np.concatenate(tf_parts))),
            pa.ListArray.from_arrays(
                offs32, pa.array(np.concatenate(dl_parts))),
            pa.nulls(n, pa.string()),
        ], schema=out_schema)


def compact_segments(spark: SparkSession, index_dir: str,
                     group_size: Optional[int] = None) -> int:
    """Merge the current snapshot's posting segments into groups of
    `group_size` consecutive segments (default: all into one). Returns the
    new snapshot id. Hot-term row growth is bounded by group_size ×
    segment_docs postings per merged row — choose group_size so that bound
    fits executor memory at the target scale."""
    cat = IndexCatalog(index_dir)
    snap = cat.current_snapshot()
    if snap is None:
        raise ValueError(f"no committed snapshot in {index_dir}")
    stats = snap["stats"]
    avgdl = float(stats["avgdl"])
    old_segs = sorted(snap.get("posting_segments", snap["segments"]))
    if len(old_segs) <= 1:
        return int(snap["snapshot_id"])  # nothing to merge
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
    mapping = F.create_map(
        *[x for s, g in group_of.items() for x in (F.lit(s), F.lit(g))])

    t0 = time.time()
    postings = (spark.read.schema(POSTINGS_SCHEMA)
                .parquet(cat.postings_dir())
                .filter(F.col("seg").isin(old_segs)))
    runs_like = (postings
                 .withColumn("seg", mapping[F.col("seg")].cast("long"))
                 .select("seg", "tb", "term", "df", "docs", "tfs", "dls")
                 .mapInArrow(_decode_stage, RUNS_SCHEMA))

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
    return cat.commit_snapshot(
        snap.get("doc_segments", snap["segments"]), stats, lineage,
        posting_segments=new_segs,
        doc_segments=snap.get("doc_segments", snap["segments"]))
