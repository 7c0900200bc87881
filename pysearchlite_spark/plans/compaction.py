"""Segment compaction — the distributed multi-way posting-list merge.

Re-expresses the reference's pairwise run-merge tree
(/root/reference/pysearchlite/inverted_index_skip_list.py:73-109 merge_index,
:132-140 merge loop) as ONE shuffle: because segments partition the docID
space into disjoint ascending ranges, merging per-term posting lists across
segments is ordered concatenation (the same invariant the reference exploits
when concatenating id lists of equal tokens across runs, merge_ids,
gamma_codecs.py:204-211). So an R-way merge is
    groupBy(term) . sort_by(seg) . concat-decode . repack
— no k-way heap needed, and Spark's shuffle replaces the log2(R) pass tree.

Old segment files stay on disk; visibility flips atomically at the manifest
commit (new snapshot's posting_segments), preserving time travel. Query
results before/after compaction are identical (tested).
"""

from __future__ import annotations

import time
from typing import Iterator, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pysearchlite_spark import codec
from pysearchlite_spark.plans.builder import term_bucket
from pysearchlite_spark.sources.catalog import (POSTINGS_SCHEMA,
                                                IndexCatalog)


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
    n_buckets = int(stats["n_buckets"])
    old_segs = sorted(snap.get("posting_segments", snap["segments"]))
    if len(old_segs) <= 1:
        return int(snap["snapshot_id"])  # nothing to merge
    group_size = group_size or len(old_segs)

    base = max(old_segs) + 1
    group_of = {s: base + i // group_size for i, s in enumerate(old_segs)}
    mapping = F.create_map(
        *[x for s, g in group_of.items() for x in (F.lit(s), F.lit(g))])

    postings = (spark.read.schema(POSTINGS_SCHEMA)
                .parquet(cat.postings_dir())
                .filter(F.col("seg").isin(old_segs)))
    # one shuffle: (new_seg, term) → ordered slices
    grouped = (postings
               .withColumn("new_seg", mapping[F.col("seg")])
               .groupBy("new_seg", "term")
               .agg(F.sort_array(F.collect_list(F.struct(
                   "seg", "df", "docs", "tfs", "dls"))).alias("parts")))

    def repack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            doc_lists, tf_lists, dl_lists = [], [], []
            for parts in b["parts"]:
                docs_l, tfs_l, dls_l = [], [], []
                for p in parts:  # already ascending by seg (sort_array)
                    df = int(p["df"])
                    docs_l.append(codec.unpack_docs(p["docs"], df))
                    tfs_l.append(codec.unpack_stream(p["tfs"], df)
                                 .astype(np.int64))
                    dls_l.append(codec.unpack_stream(p["dls"], df)
                                 .astype(np.int64))
                doc_lists.append(np.concatenate(docs_l))  # disjoint asc ranges
                tf_lists.append(np.concatenate(tfs_l))
                dl_lists.append(np.concatenate(dls_l))
            packed = codec.pack_rows(doc_lists, tf_lists, dl_lists, avgdl)
            yield pd.DataFrame({
                "term": b["term"].values,
                "seg": b["new_seg"].astype("int64").values,
                "tb": [term_bucket(t, n_buckets) for t in b["term"]],
                "df": [p.df for p in packed],
                "docs": [p.docs for p in packed],
                "tfs": [p.tfs for p in packed],
                "dls": [p.dls for p in packed],
                "first_docs": [p.first_docs for p in packed],
                "doc_offs": [p.doc_offs for p in packed],
                "tf_offs": [p.tf_offs for p in packed],
                "dl_offs": [p.dl_offs for p in packed],
                "max_partial": [p.max_partial for p in packed],
            })

    new_segs = sorted(set(group_of.values()))
    (grouped.mapInPandas(repack, POSTINGS_SCHEMA)
     .write.partitionBy("seg", "tb").mode("append")
     .parquet(cat.postings_dir()))
    for s in new_segs:
        cat.mark_staged("postings", s)

    lineage = dict(snap.get("lineage") or {})
    lineage.update({"compaction_of": old_segs, "compacted_at": time.time(),
                    "group_size": group_size})
    return cat.commit_snapshot(
        snap.get("doc_segments", snap["segments"]), stats, lineage,
        posting_segments=new_segs,
        doc_segments=snap.get("doc_segments", snap["segments"]))
