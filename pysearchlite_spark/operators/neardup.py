"""Incremental near-dedup: a PERSISTED MinHash-LSH index so a NEW crawl
batch can be near-dedup-checked against an EXISTING corpus without
recomputing (or reshuffling) the corpus side — the production shape for
"does today's crawl duplicate anything in the 100-TB lake?".

`minhash_lsh_pairs` (operators/dedup.py) answers the one-shot
whole-corpus question; this module persists its intermediate state —
banded LSH bucket assignments plus exact shingle-hash sets — as
parquet generations, so each new batch costs only:

  1. signatures/buckets for the BATCH (vectorized Arrow UDFs, batch-
     sized),
  2. one join of the corpus bucket table against the BROADCAST batch
     buckets — the corpus is streamed map-side, never shuffled and
     never re-hashed (plan-asserted in tests),
  3. exact-Jaccard verification of the candidates: corpus shingle sets
     are fetched by a candidate semi-join (row-group pushdown on the
     stored parquet), batch shingle sets recomputed in-flight.

Candidate volume is LINEAR in bucket occupancy (each batch doc meets
each corpus bucket it lands in once) — the quadratic degenerate case of
the one-shot self-join cannot arise here; a boilerplate-degenerate
corpus bucket costs one scan of its members per matching batch doc,
bounded by `max_bucket` at check time exactly like the one-shot path.

Index layout under <root>/ (AnnIndex conventions — ann.py:356):
  meta.json                    — atomic-rename committed params
                                 {n_perm, bands, shingle_k, seed, adds,
                                  n_docs}
  buckets/add=<g>/*.parquet    — (doc_id, band, bh) per committed
                                 generation g (build = g0; each
                                 add_batch a new one; only generations
                                 listed in meta are visible — crash
                                 debris stays invisible)
  bucket_sizes/add=<g>/*.parquet — (band, bh, cnt) pre-aggregated at
                                 write time: check()'s oversize cap
                                 sums these tiny tables instead of
                                 re-aggregating the raw bucket table
  shingles/add=<g>/*.parquet   — (doc_id, sh array<long>) same
                                 generations

Determinism: identical config + corpus ⇒ identical index content;
check() output is a pure function of (index docs, batch, threshold) —
the same blake2b shingle/minhash machinery as minhash_lsh_pairs, so at
equal config the pair (a=corpus, b=batch) appears here with exactly the
jaccard the one-shot operator reports (test-enforced equivalence).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["NearDupIndex"]


def _commit_meta(root: str, meta: dict) -> None:
    fd, tmp = tempfile.mkstemp(dir=root, suffix=".meta")
    with os.fdopen(fd, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(root, "meta.json"))  # atomic commit


def _meta_locked(root: str):
    from pysearchlite_spark.locks import flock_ctx
    return flock_ctx(os.path.join(root, ".meta.lock"))


class NearDupIndex:
    """Persisted banded-MinHash near-dup index: build once over the
    corpus, `add_batch` per ingested crawl, `check` a new batch for
    near-duplicates against everything committed so far."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        with open(os.path.join(root, "meta.json")) as f:
            self.meta = json.load(f)
        self.n_perm = int(self.meta["n_perm"])
        self.bands = int(self.meta["bands"])
        self.shingle_k = int(self.meta["shingle_k"])
        self.seed = int(self.meta["seed"])

    # ------------------------------------------------------------ build --
    @staticmethod
    def build(spark: SparkSession, df: DataFrame, root: str,
              id_col: str = "doc_id", text_col: str = "text",
              n_perm: int = 64, bands: int = 16, shingle_k: int = 3,
              seed: int = 7,
              batch_key: str | None = None) -> "NearDupIndex":
        """batch_key: optional idempotency token (e.g. a streaming
        micro-batch id) recorded in meta — a later add_batch with the
        same key is a no-op, so crash-replayed batches never
        double-commit."""
        os.makedirs(root, exist_ok=True)
        with _meta_locked(root):
            n = NearDupIndex._write_generation(
                spark, df, root, 0, id_col, text_col, n_perm, bands,
                shingle_k, seed)
            _commit_meta(root, {
                "n_perm": n_perm, "bands": bands, "shingle_k": shingle_k,
                "seed": seed, "adds": [0], "n_docs": n,
                "batches": [batch_key] if batch_key is not None else []})
        return NearDupIndex(spark, root)

    @staticmethod
    def _write_generation(spark, df, root, gen, id_col, text_col,
                          n_perm, bands, shingle_k, seed) -> int:
        from pysearchlite_spark.operators.dedup import (_band_explode,
                                                        minhash_signatures)
        sigs = minhash_signatures(df, id_col, text_col, n_perm,
                                  shingle_k, seed)
        bpath = os.path.join(root, "buckets", f"add={gen}")
        (_band_explode(sigs, n_perm, bands)
         .write.mode("overwrite").parquet(bpath))
        # per-generation bucket sizes, pre-aggregated at WRITE time so
        # check()'s oversize cap never re-aggregates the raw bucket
        # table (a corpus-scale groupBy per check otherwise)
        (spark.read.parquet(bpath)
         .groupBy("band", "bh").agg(F.count("*").alias("cnt"))
         .write.mode("overwrite")
         .parquet(os.path.join(root, "bucket_sizes", f"add={gen}")))
        # shingles land RANGE-partitioned and sorted by doc_id: tight
        # per-file/row-group min-max stats, so check()'s bounded id-list
        # fetch prunes files instead of scanning the whole corpus side
        (NearDupIndex._shingles_df(df, id_col, text_col, shingle_k)
         .repartitionByRange("doc_id").sortWithinPartitions("doc_id")
         .write.mode("overwrite")
         .parquet(os.path.join(root, "shingles", f"add={gen}")))
        return spark.read.parquet(
            os.path.join(root, "shingles", f"add={gen}")).count()

    @staticmethod
    def _shingles_df(df: DataFrame, id_col: str, text_col: str,
                     shingle_k: int) -> DataFrame:
        from pysearchlite_spark.operators.dedup import _shingle_hashes_batch
        import numpy as np

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                sh = _shingle_hashes_batch(pdf[text_col], shingle_k)
                yield pd.DataFrame({
                    "doc_id": pdf[id_col],
                    "sh": [s.astype(np.int64).tolist() for s in sh]})

        return df.select(F.col(id_col).alias(id_col),
                         F.col(text_col).alias(text_col)) \
                 .mapInPandas(run, "doc_id long, sh array<long>")

    # ------------------------------------------------------------- adds --
    def add_batch(self, df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  batch_key: str | None = None) -> int:
        """Commit a new generation of corpus docs (e.g. yesterday's
        accepted crawl) — subsequent check() calls see them. Returns the
        number of docs added. With a `batch_key` already recorded in
        meta the call is an idempotent no-op returning 0 (streaming
        replay safety)."""
        with _meta_locked(self.root):
            with open(os.path.join(self.root, "meta.json")) as f:
                fresh = json.load(f)
            if batch_key is not None and batch_key in fresh.get(
                    "batches", []):
                self.meta = fresh
                return 0
            gen = max(fresh["adds"]) + 1
            n = self._write_generation(
                self.spark, df, self.root, gen, id_col, text_col,
                self.n_perm, self.bands, self.shingle_k, self.seed)
            fresh["adds"] = fresh["adds"] + [gen]
            fresh["n_docs"] = int(fresh["n_docs"]) + n
            if batch_key is not None:
                fresh["batches"] = fresh.get("batches", []) + [batch_key]
            _commit_meta(self.root, fresh)
            self.meta = fresh
        return n

    def compact(self) -> dict:
        """Merge every committed generation into ONE. Streaming ingest
        commits a generation per micro-batch, so a long-lived stream
        accumulates thousands of tiny parquet dirs whose listing/open
        cost grows per check — the same wart AnnIndex/segment
        compaction solve. The merged generation is written ALONGSIDE
        the old ones, meta flips atomically (readers of the old
        snapshot are never broken mid-write), then the superseded dirs
        are MOVED to <root>/_trash and only physically removed by the
        NEXT compact's sweep — a reader mid-check() on the previous
        snapshot (readers take no lock) keeps its parquet files for a
        full compaction cycle instead of hitting FileNotFound the
        instant the meta flips. batch_key history survives, so replay
        idempotence outlives compaction."""
        import shutil
        import uuid

        with _meta_locked(self.root):
            with open(os.path.join(self.root, "meta.json")) as f:
                fresh = json.load(f)
            gens = list(fresh["adds"])
            if len(gens) <= 1:
                return {"generations": len(gens), "compacted": False}
            gen = max(gens) + 1
            paths = {sub: [os.path.join(self.root, sub, f"add={g}")
                           for g in gens]
                     for sub in ("buckets", "bucket_sizes", "shingles")}
            (self.spark.read.parquet(*paths["buckets"])
             .write.mode("overwrite")
             .parquet(os.path.join(self.root, "buckets", f"add={gen}")))
            (self.spark.read.parquet(*paths["bucket_sizes"])
             .groupBy("band", "bh").agg(F.sum("cnt").alias("cnt"))
             .write.mode("overwrite")
             .parquet(os.path.join(self.root, "bucket_sizes",
                                   f"add={gen}")))
            (self.spark.read.parquet(*paths["shingles"])
             .repartitionByRange("doc_id").sortWithinPartitions("doc_id")
             .write.mode("overwrite")
             .parquet(os.path.join(self.root, "shingles", f"add={gen}")))
            n = self.spark.read.parquet(
                os.path.join(self.root, "shingles", f"add={gen}")).count()
            assert n == int(fresh["n_docs"]), (n, fresh["n_docs"])
            fresh["adds"] = [gen]
            _commit_meta(self.root, fresh)
            self.meta = fresh
            # sweep LAST compact's trash (grace period = one compaction
            # cycle), then retire this compact's superseded generations
            # into a fresh trash dir instead of deleting them under a
            # concurrent lock-free reader
            trash = os.path.join(self.root, "_trash")
            shutil.rmtree(trash, ignore_errors=True)
            os.makedirs(trash, exist_ok=True)
            for sub, ps in paths.items():
                for p in ps:
                    if os.path.isdir(p):
                        os.replace(p, os.path.join(
                            trash, f"{sub}-{os.path.basename(p)}-"
                                   f"{uuid.uuid4().hex[:8]}"))
        return {"generations": len(gens), "compacted": True,
                "n_docs": n, "generation": gen}

    # ------------------------------------------------------ stored sides --
    def _gen_paths(self, sub: str) -> list:
        return [os.path.join(self.root, sub, f"add={g}")
                for g in self.meta["adds"]]

    def buckets_df(self) -> DataFrame:
        return self.spark.read.parquet(*self._gen_paths("buckets"))

    def shingles_df(self) -> DataFrame:
        return self.spark.read.parquet(*self._gen_paths("shingles"))

    # ------------------------------------------------------------- check --
    def check(self, df: DataFrame, threshold: float = 0.8,
              id_col: str = "doc_id", text_col: str = "text",
              max_bucket: int = 100_000,
              _registry: list | None = None) -> DataFrame:
        """(corpus_id, batch_id, jaccard) for every (corpus doc, batch
        doc) pair that shares >= 1 LSH band bucket AND has exact shingle
        Jaccard >= threshold. `filter(~batch.isin(check(...)["batch_id"]))`
        — or a left-anti join — is the batch's near-dedup keep-list.

        A SMALL batch side (the daily-crawl shape: batch_rows x bands <=
        PSL_NEARDUP_BCAST_MAX_ROWS, default 5M bucket rows) is BROADCAST;
        the corpus bucket table then streams through a map-side join — no
        corpus shuffle, no corpus re-hash. A LARGER batch (a backfill
        caller passing millions of docs) falls back to a plain shuffle
        join of the same shape: the corpus-no-shuffle property degrades
        gracefully to sort-merge on (band, bh) instead of OOMing the
        executors on an unbounded broadcast. Both paths produce identical
        results (test-enforced). Corpus buckets larger than `max_bucket`
        are skipped for candidate generation (same audit story as
        minhash_lsh_pairs' cap; count them with
        lsh_oversize_stats(index.buckets_df(), ["band", "bh"], cap)).
        CAP CAVEAT: unlike minhash_lsh_pairs — whose capped buckets fall
        back to identical-signature star pairs — a skipped corpus bucket
        here contributes NO candidates, so byte-identical copies of
        boilerplate heavy enough to blow every one of its band buckets
        past the cap would be admitted; at the 100k default that regime
        is strictly boilerplate-degenerate corpora, and the equivalence
        to the one-shot path holds whenever no bucket exceeds the cap.

        _registry: optional list; every frame this call persist()s is
        appended so a long-lived caller (the streaming sink) can
        unpersist exactly these instead of clearing the whole session
        cache."""
        import os as _os

        from pysearchlite_spark.operators.dedup import (_band_explode,
                                                        minhash_signatures)
        sigs = minhash_signatures(df, id_col, text_col, self.n_perm,
                                  self.shingle_k, self.seed)
        new_buckets = (_band_explode(sigs, self.n_perm, self.bands)
                       .withColumnRenamed("doc_id", "batch_id"))
        bcast_max = int(_os.environ.get("PSL_NEARDUP_BCAST_MAX_ROWS",
                                        "5000000"))
        # the guard counts the BATCH input (one cheap action on the
        # caller's batch frame), not the exploded bucket table — the
        # latter would pay the signature UDF twice
        small_batch = df.count() * self.bands <= bcast_max

        corpus = self.buckets_df()
        if max_bucket is not None:
            # oversize keys from the write-time pre-aggregated sizes
            # (cross-generation sum) — never the raw bucket table
            sz = (self.spark.read
                  .parquet(*self._gen_paths("bucket_sizes"))
                  .groupBy("band", "bh").agg(F.sum("cnt").alias("_bsz")))
            corpus = (corpus.join(F.broadcast(
                sz.filter(F.col("_bsz") > max_bucket)), ["band", "bh"],
                "left_anti"))
        batch_side = (F.broadcast(new_buckets) if small_batch
                      else new_buckets)
        cand = (corpus.join(batch_side, ["band", "bh"])
                .select(F.col("doc_id").alias("corpus_id"), "batch_id")
                .filter(F.col("corpus_id") != F.col("batch_id"))
                .distinct()
                # consumed twice (the corpus-shingle semi-join and the
                # final verification join) — without persist the corpus
                # bucket scan + batch signature UDF execute twice
                .persist())
        if _registry is not None:
            _registry.append(cand)

        # exact verification: corpus shingles by candidate semi-join
        # (AQE broadcasts the candidate side — the shingle table streams
        # map-side, one pass, no shuffle), batch shingles recomputed
        # in-flight (batch-sized). An IN-list pushdown was measured
        # SLOWER here and prunes nothing at scale anyway: full-range
        # hash ids give candidate min/max spanning every file, and
        # parquet In-pushdown degrades to that range above a ~10-element
        # threshold. Per check the corpus-side cost is therefore one
        # streamed pass over the bucket + shingle tables — amortize it
        # by batching crawls, not by shrinking batches.
        csh = (self.shingles_df()
               .join(cand.select(F.col("corpus_id").alias("doc_id"))
                     .distinct(), "doc_id")
               .select(F.col("doc_id").alias("corpus_id"),
                       F.col("sh").alias("sh_c")))
        bsh = (self._shingles_df(df, id_col, text_col, self.shingle_k)
               .select(F.col("doc_id").alias("batch_id"),
                       F.col("sh").alias("sh_b")))
        joined = cand.join(csh, "corpus_id").join(
            F.broadcast(bsh) if small_batch else bsh, "batch_id")
        inter = F.size(F.array_intersect("sh_c", "sh_b"))
        union = F.size(F.array_union("sh_c", "sh_b"))
        return (joined
                .withColumn("jaccard",
                            F.when(union > 0,
                                   inter.cast("double") / union)
                            .otherwise(0.0))
                .filter(F.col("jaccard") >= threshold)
                .select("corpus_id", "batch_id",
                        F.round("jaccard", 6).alias("jaccard")))
