"""Distributed inverted-index build (the Spark re-expression of the
reference's SPIMI pipeline, /root/reference/pysearchlite/inverted_index_skip_list.py:48-145).

Reference dataflow            →  Spark plan here
----------------------------------------------------------------------------
docID = arrival order            deterministic global row_number over url
  (doc_list.py:42-45)            (repartitionByRange + per-partition offsets —
                                 no single-task global sort; §7.3)
tokenize per doc                 vectorized pandas UDF (tokenizer.tokens_series)
dict[token].append(docID)        explode → groupBy(seg, term, doc_id) partial
  (inverted_index_skip_list.py     count (map-side combine) → groupBy(seg,
   :48-57)                         term) sorted collect — ONE logical shuffle
                                   tree, Catalyst/AQE-planned
spill sorted runs + pairwise     Spark sort-based shuffle spills natively;
  merge (:62-71,126-145)           our explicit analogue is docID-range
                                   SEGMENTS (seg = doc_id // segment_docs)
convert_to_skip_list (:111-124)  per-term numpy pack (codec.pack_postings):
                                   delta+varbyte + skip blocks + block-max

Skew (north rule, Zipfian terms): the segment id is an ORDER-PRESERVING SALT —
a hot term's postings land in one row per segment, each bounded by
segment_docs entries, spread across reducers by hash(seg, term). Map-side
partial aggregation of (seg, term, doc_id) tf counts is the two-phase
combine. No single row/task ever holds more than segment_docs postings, so
the plan survives df ≈ N at 10^12 docs. AQE skew-join/coalesce stays on.

Resumability (north rule): segments are staged with _STAGED markers and only
become visible at the atomic manifest commit; a re-run drops partial
(unmarked) segment dirs, rebuilds ONLY missing segments (filter pushed before
the shuffles), and commits the union. Per-partition metrics land in
build_log/ with lineage.
"""

from __future__ import annotations

import os
import time
import zlib
from dataclasses import dataclass
from typing import Iterator, List, Optional

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.accumulators import AccumulatorParam
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pysearchlite_spark import codec
from pysearchlite_spark.extract import make_extract_udf
from pysearchlite_spark.sources.catalog import (BUILD_LOG_SCHEMA,
                                                DOCMAP_SCHEMA,
                                                POSTINGS_SCHEMA, IndexCatalog)
from pysearchlite_spark.tokenizer import tokens_series

DEFAULT_SEGMENT_DOCS = 1 << 20  # 1M docs per segment (Lucene-ish)
DEFAULT_TERM_BUCKETS = 16


def term_bucket(term: str, n_buckets: int) -> int:
    """Partition-pruning bucket; computed in Python on BOTH build and query
    side (zlib.crc32) so there is no cross-engine hash-parity question."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets


@dataclass
class BuildResult:
    snapshot_id: int
    n_docs: int
    avgdl: float
    segments: List[int]
    elapsed_sec: float


def make_tokens_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def tokens_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for b in batches:
            yield tokens_series(b)

    return tokens_udf


def assign_doc_ids(df: DataFrame, order_col: str = "url",
                   num_partitions: Optional[int] = None) -> DataFrame:
    """Deterministic dense docIDs: row_number over a global sort of
    `order_col`, computed scalably — repartitionByRange + sortWithinPartitions
    + per-partition base offsets (two light jobs over a persisted
    partitioning), never a single-task global window. At cluster scale the
    persist becomes a staging-table write; the plan shape is identical.

    Replaces the reference's arrival-order docID (doc_list.py:42-45) with an
    order that is reproducible under any parallelism.
    """
    spark = df.sparkSession
    num_partitions = num_partitions or spark.conf.get(
        "spark.sql.shuffle.partitions", "32")
    num_partitions = int(num_partitions)
    parted = (df.repartitionByRange(num_partitions, F.col(order_col))
                .sortWithinPartitions(order_col)
                .withColumn("_pid", F.spark_partition_id()))
    parted.persist(StorageLevel.MEMORY_AND_DISK)
    counts = {r["_pid"]: r["cnt"] for r in
              parted.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    boff = spark.sparkContext.broadcast(offsets)
    fields = df.schema.fieldNames()
    out_schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                           for f in df.schema.fields) + ", doc_id long"

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        for b in batches:
            if len(b) == 0:
                continue
            base = boff.value[int(b["_pid"].iloc[0])]
            b = b[fields].copy()
            b["doc_id"] = np.arange(seen + base, seen + base + len(b),
                                    dtype=np.int64)
            seen += len(b)
            yield b

    return parted.mapInPandas(add_ids, out_schema), parted


def _prepare_docs(spark: SparkSession, df: DataFrame, *, text_col: str,
                  id_col: Optional[str], url_col: Optional[str],
                  html_col: Optional[str], lang_filter: Optional[str]
                  ) -> tuple[DataFrame, Optional[DataFrame]]:
    """Normalize any input into (doc_id long, url string, text string)."""
    if lang_filter and "lang" in df.columns:
        df = df.filter(F.col("lang") == lang_filter)
    if html_col is not None:
        df = df.withColumn(text_col, make_extract_udf()(F.col(html_col)))
    persisted = None
    if id_col is not None:
        # caller supplies dense monotone ids (e.g. documents.doc_id)
        docs = df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            (F.col(url_col).cast("string") if url_col else
             F.col(id_col).cast("string")).alias("url"),
            F.col(text_col).alias("text"))
    else:
        base = df.select(F.col(url_col or "url").alias("url"),
                         F.col(text_col).alias("text"))
        with_ids, persisted = assign_doc_ids(base, "url")
        docs = with_ids.select("doc_id", "url", "text")
    return docs, persisted


def build_index(spark: SparkSession, df: DataFrame, index_dir: str, *,
                text_col: str = "text", html_col: Optional[str] = None,
                id_col: Optional[str] = None, url_col: Optional[str] = None,
                lang_filter: Optional[str] = None,
                segment_docs: int = DEFAULT_SEGMENT_DOCS,
                n_buckets: int = DEFAULT_TERM_BUCKETS,
                lineage: Optional[dict] = None,
                max_segments: Optional[int] = None) -> BuildResult:
    """Full pages→segments build. See module docstring for the plan.

    max_segments limits how many missing segments are built this run (used by
    the kill/rerun resumability test)."""
    t0 = time.time()
    cat = IndexCatalog(index_dir)
    docs, persisted = _prepare_docs(
        spark, df, text_col=text_col, id_col=id_col, url_col=url_col,
        html_col=html_col, lang_filter=lang_filter)

    tokens_udf = make_tokens_udf()
    toks = (docs
            .withColumn("tokens", tokens_udf(F.col("text")))
            .withColumn("doc_len", F.size("tokens"))
            .withColumn("seg", (F.col("doc_id") / F.lit(segment_docs))
                        .cast("long")))
    toks.persist(StorageLevel.MEMORY_AND_DISK)

    # ---- which segments still need building? (resumability) --------------
    all_segs = sorted(r["seg"] for r in
                      toks.select("seg").distinct().collect())
    for table in ("docmap", "postings"):
        staged = set(cat.staged_segments(table))
        d = os.path.join(index_dir, table)
        if os.path.isdir(d):
            for name in os.listdir(d):
                if name.startswith("seg="):
                    s = int(name.split("=", 1)[1])
                    if s not in staged:
                        cat.drop_segment(table, s)  # partial → rebuild

    done_doc = set(cat.staged_segments("docmap"))
    done_post = set(cat.staged_segments("postings"))
    todo = [s for s in all_segs if s not in done_doc or s not in done_post]
    if max_segments is not None:
        todo = todo[:max_segments]
    todo_set = set(todo)
    build_toks = toks.filter(F.col("seg").isin(todo)) if todo else None

    # ---- docmap ------------------------------------------------------------
    doc_todo = [s for s in todo if s not in done_doc]
    if doc_todo:
        (build_toks.filter(F.col("seg").isin(doc_todo))
         .select("doc_id", "url", "doc_len", "seg")
         .write.partitionBy("seg").mode("append").parquet(cat.docmap_dir()))
        for s in doc_todo:
            cat.mark_staged("docmap", s)

    # ---- global stats (over ALL staged docmap segments) --------------------
    docmap = spark.read.schema(DOCMAP_SCHEMA).parquet(cat.docmap_dir())
    stat = docmap.agg(F.count("*").alias("n"),
                      F.sum("doc_len").alias("sdl")).collect()[0]
    n_docs, sum_dl = int(stat["n"]), int(stat["sdl"] or 0)
    avgdl = (sum_dl / n_docs) if n_docs else 0.0

    # ---- postings ----------------------------------------------------------
    post_todo = [s for s in todo if s not in done_post]
    if post_todo:
        metrics_acc = spark.sparkContext.accumulator(
            {}, _DictAccumulator())
        packed = _build_postings(
            build_toks.filter(F.col("seg").isin(post_todo)),
            avgdl=avgdl, n_buckets=n_buckets, metrics_acc=metrics_acc)
        (packed.write.partitionBy("seg", "tb").mode("append")
         .parquet(cat.postings_dir()))
        for s in post_todo:
            cat.mark_staged("postings", s)
        _write_build_log(spark, cat, metrics_acc.value)

    if persisted is not None:
        persisted.unpersist()
    toks.unpersist()

    # ---- commit (only when every segment is staged) -------------------------
    staged_all = (set(cat.staged_segments("postings"))
                  & set(cat.staged_segments("docmap")))
    snapshot_id = -1
    if set(all_segs) <= staged_all:
        stats = {"n_docs": n_docs, "avgdl": avgdl, "sum_dl": sum_dl,
                 "segment_docs": segment_docs, "n_buckets": n_buckets}
        snapshot_id = cat.commit_snapshot(
            sorted(staged_all), stats,
            lineage or {"source": "unknown", "built_at": time.time()})
    return BuildResult(snapshot_id, n_docs, avgdl, sorted(staged_all),
                       time.time() - t0)


def _build_postings(toks: DataFrame, *, avgdl: float, n_buckets: int,
                    metrics_acc) -> DataFrame:
    """tokens → packed posting rows. One shuffle tree:
       explode → partial-agg tf → groupBy(seg, term) sorted collect → pack."""
    tf = (toks.select("seg", "doc_id", "doc_len",
                      F.explode("tokens").alias("term"))
          .groupBy("seg", "term", "doc_id", "doc_len")
          .agg(F.count("*").alias("tf")))
    grouped = (tf.groupBy("seg", "term")
               .agg(F.sort_array(F.collect_list(
                   F.struct("doc_id", "tf", "doc_len"))).alias("pl"))
               .select("seg", "term",
                       F.col("pl.doc_id").alias("doc_ids"),
                       F.col("pl.tf").alias("tfs"),
                       F.col("pl.doc_len").alias("dls")))

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        t_start = time.time()
        n_terms = n_postings = n_bytes = 0
        segs_seen = set()
        for b in batches:
            out = {k: [] for k in ("term", "seg", "tb", "df", "docs", "tfs",
                                   "dls", "first_docs", "doc_offs", "tf_offs",
                                   "dl_offs", "max_partial")}
            for term, seg, dids, tfs_, dls_ in zip(
                    b["term"], b["seg"], b["doc_ids"], b["tfs"], b["dls"]):
                p = codec.pack_postings(
                    np.asarray(dids, dtype=np.int64),
                    np.asarray(tfs_, dtype=np.int64),
                    np.asarray(dls_, dtype=np.int64), avgdl)
                out["term"].append(term)
                out["seg"].append(seg)
                out["tb"].append(term_bucket(term, n_buckets))
                out["df"].append(p.df)
                out["docs"].append(p.docs)
                out["tfs"].append(p.tfs)
                out["dls"].append(p.dls)
                out["first_docs"].append(p.first_docs.tolist())
                out["doc_offs"].append(p.doc_offs.tolist())
                out["tf_offs"].append(p.tf_offs.tolist())
                out["dl_offs"].append(p.dl_offs.tolist())
                out["max_partial"].append(p.max_partial.tolist())
                n_terms += 1
                n_postings += p.df
                n_bytes += len(p.docs) + len(p.tfs) + len(p.dls)
                segs_seen.add(int(seg))
            yield pd.DataFrame(out)
        elapsed = time.time() - t_start
        if n_terms and metrics_acc is not None:
            metrics_acc.add({pid: {
                "seg": min(segs_seen) if segs_seen else -1,
                "n_terms": n_terms, "n_postings": n_postings,
                "bytes_packed": n_bytes, "elapsed_sec": elapsed}})

    return grouped.mapInPandas(pack, POSTINGS_SCHEMA)


def _write_build_log(spark: SparkSession, cat: IndexCatalog,
                     metrics: dict) -> None:
    if not metrics:
        return
    rows = []
    for pid, m in sorted(metrics.items()):
        el = max(m["elapsed_sec"], 1e-9)
        rows.append((int(pid), int(m["seg"]), int(m["n_terms"]),
                     int(m["n_postings"]), int(m["bytes_packed"]),
                     float(m["elapsed_sec"]),
                     m["n_terms"] / el, m["n_postings"] / el))
    (spark.createDataFrame(rows, BUILD_LOG_SCHEMA)
     .coalesce(1).write.mode("append").parquet(cat.build_log_dir()))


class _DictAccumulator(AccumulatorParam):
    """AccumulatorParam merging {partition_id: metrics} dicts. Task retries
    can overwrite a partition's entry — last writer wins, which is the
    correct semantics for per-partition metrics."""

    def zero(self, value):
        return {}

    def addInPlace(self, v1, v2):
        v1.update(v2)
        return v1
