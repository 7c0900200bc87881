"""Round-4 retrieval-composition surfaces at scale: 1M deterministic
synthetic pages, unpinned local[32]. Measures (best-of-3):

* search_collapse — field collapsing by SITE (a 256-way key parsed from
  the url host): scored match set + map-side max_by +
  TakeOrderedAndProject;
* scores_df — the full scored match set materialized to a count+sum (the
  export shape Catalyst can't prune);
* unordered NEAR vs ordered NEAR at slop 3 (positional index);
* hybrid BM25+ANN RRF top-10 — lexical leg against the 1M-doc index,
  vector leg against a bucket-pruned AnnIndex over 1M 32-dim embeddings.

Sanity asserted inline: collapse groups unique + scores descending +
equal to a pandas best-per-group over the (independently verified)
scores_df output; ordered NEAR ⊆ unordered NEAR; hybrid ids ⊆ union of
the two legs' ids and RRF scores recompute from the legs' ranks.

Usage: python BENCH/hybrid_scale.py [n_docs] → one JSON line + writes
BENCH/hybrid_scale.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pysearchlite_spark.session import get_spark  # noqa: E402

Q = "high school"       # Zipf-head AND/OR query
Q_NEAR = "high school"  # proximity pair
SLOP = 3


def main() -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from pysearchlite_spark.datagen import generate_pages
    from pysearchlite_spark.engine import SearchIndex
    from pysearchlite_spark.operators.ann import AnnIndex
    from pysearchlite_spark.operators.hybrid import hybrid_topk, rrf_fuse
    from pysearchlite_spark.plans.builder import build_index

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("hybrid_scale", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_docs": n, "cpus": 32, "pinned": False, "query": Q}

    pages_dir = tempfile.mkdtemp(prefix="hyb_pages_")
    emb_dir = tempfile.mkdtemp(prefix="hyb_emb_")
    idx_dir = tempfile.mkdtemp(prefix="hyb_idx_")
    pos_dir = tempfile.mkdtemp(prefix="hyb_posidx_")
    ann_dir = tempfile.mkdtemp(prefix="hyb_ann_")
    try:
        pages = generate_pages(spark, n, seed=42).select("url", "text")
        # site = first 2 hex chars of the synthetic host (each generated
        # url has a unique host, so the full host would make every group a
        # singleton) → 256 sites, ~n/256 docs each: a real grouping load
        pages = pages.withColumn(
            "site", F.regexp_extract("url", r"https?://example-(..)", 1))
        pages.write.mode("overwrite").parquet(pages_dir)
        docs = spark.read.parquet(pages_dir)

        t0 = time.monotonic()
        build_index(spark, docs, idx_dir, url_col="url",
                    segment_docs=1 << 18)
        out["build_sec"] = round(time.monotonic() - t0, 2)
        idx = SearchIndex(spark, idx_dir)
        # docmap doc_id -> the docs table join key for collapse: re-read
        # the docmap (doc_id, url) and join once to attach site
        dm = idx.docmap_df().select("doc_id", "url")
        docs_keyed = (docs.join(dm, "url")
                      .select("doc_id", "site").persist())
        out["n_sites"] = docs_keyed.select("site").distinct().count()

        # deterministic 32-dim embeddings keyed by doc_id (seeded hash →
        # uniform floats; cheap, reproducible, id space == doc ids)
        dim = 32
        cols = [(F.hash(F.col("doc_id").cast("string"), F.lit(i))
                 .cast("double") / F.lit(float(1 << 31))).alias(f"c{i}")
                for i in range(dim)]
        (dm.select("doc_id", *cols)
         .select("doc_id", F.array(*[f"c{i}" for i in range(dim)])
                 .cast("array<float>").alias("embedding"))
         .withColumnRenamed("doc_id", "vec_id")
         .write.mode("overwrite").parquet(emb_dir))
        emb = spark.read.parquet(emb_dir)
        t0 = time.monotonic()
        ann = AnnIndex.build(spark, emb, ann_dir, n_planes=12, seed=9)
        out["ann_build_sec"] = round(time.monotonic() - t0, 2)
        qv = list(emb.orderBy("vec_id").first()["embedding"])

        best: dict = {}

        def probe(key, fn):
            t0 = time.monotonic()
            r = fn()
            dt = time.monotonic() - t0
            best[key] = min(best.get(key, dt), dt)
            return r

        for _ in range(3):
            col10 = probe("collapse_top10",
                          lambda: idx.search_collapse(
                              Q, docs_keyed, "site", k=10,
                              id_col="doc_id").collect())
            probe("scores_df_agg",
                  lambda: idx.scores_df(Q).agg(
                      F.count(F.lit(1)), F.sum("score")).collect())
            hyb = probe("hybrid_rrf_top10",
                        lambda: hybrid_topk(idx, ann, Q, qv, k=10))
        # --- sanity: collapse == pandas best-per-group over scores_df ---
        sc = idx.scores_df(Q).toPandas()
        out["match_set"] = int(len(sc))
        sites = docs_keyed.toPandas()
        m = sc.merge(sites, on="doc_id")
        m = m.sort_values(["score", "doc_id"], ascending=[False, True],
                          kind="stable")
        want = m.groupby("site", sort=False).head(1).head(10)
        got_ids = [r["doc_id"] for r in col10]
        assert got_ids == want["doc_id"].tolist(), "collapse mismatch"
        assert len({r["collapse"] for r in col10}) == len(col10)
        # --- sanity: hybrid recomputes from the two legs' ranks ---
        bm_ids = [d for d, _ in idx.topk(Q, k=50)]
        nn_ids = [int(r["vec_id"]) for r in ann.topk(qv, k=50).collect()]
        assert hyb == rrf_fuse([bm_ids, nn_ids], k=10), "hybrid mismatch"
        assert set(d for d, _ in hyb) <= set(bm_ids) | set(nn_ids)

        # --- positional: ordered vs unordered NEAR ---
        t0 = time.monotonic()
        build_index(spark, docs, pos_dir, url_col="url",
                    segment_docs=1 << 18, with_positions=True)
        out["positional_build_sec"] = round(time.monotonic() - t0, 2)
        pidx = SearchIndex(spark, pos_dir)
        for _ in range(3):
            near = probe("near_ordered",
                         lambda: pidx.search_near_ids(Q_NEAR, SLOP))
            unear = probe("near_unordered",
                          lambda: pidx.search_near_ids(Q_NEAR, SLOP,
                                                       in_order=False))
            # distributed path: per-segment kernels, only counts collected
            # — the shape a 1000-executor cluster runs (driver-path numbers
            # above are the single-core kernel cost on a Zipf-head match
            # set; this is the same scan fanned across executors)
            n_dist = probe("near_ordered_dist",
                           lambda: pidx.count_near(Q_NEAR, SLOP,
                                                   distributed=True))
            u_dist = probe("near_unordered_dist",
                           lambda: pidx.count_near(Q_NEAR, SLOP,
                                                   distributed=True,
                                                   in_order=False))
        out["near_ordered_hits"] = int(near.size)
        out["near_unordered_hits"] = int(unear.size)
        assert set(near.tolist()) <= set(unear.tolist())
        assert n_dist == near.size and u_dist == unear.size, \
            "distributed NEAR counts diverged from the driver path"

        docs_keyed.unpersist()
        for k, v in best.items():
            out[f"{k}_sec"] = round(v, 4)
    finally:
        for d in (pages_dir, emb_dir, idx_dir, pos_dir, ann_dir):
            shutil.rmtree(d, ignore_errors=True)
    spark.stop()

    line = json.dumps(out)
    print(line)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "hybrid_scale.json"), "w") as fh:
        fh.write(line + "\n")


if __name__ == "__main__":
    main()
