"""Benchmark harness — one JSON line on stdout.

Runs the headline operators at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]:
  * full inverted-index build over `documents` (docs/sec recorded),
  * boolean COUNT / AND / OR and BM25 top-10 (block-max) query latency,
  * distributed BM25 path,
  * dedup (exact, MinHash-LSH), corpus sampling (domain cap + weighted
    draw), ANN cosine top-k + persisted index,
  * batch-query ANN, text-quality + repetition scans, cross-doc repeated
    spans, events hourly window.

Protocol: the WHOLE suite runs $SPARK_GRAFT_BENCH_TRIALS times (default 3)
interleaved in one process, and the reported per-key number is the BEST of
the trials — this host is co-tenant-noisy (BENCH/BASELINE.md documents 2.5x
single-run variance) and single-shot runs are not comparable across rounds.
All trials are preserved in BENCH/trials_last.json (side artifact): the
driver that consumes this script keeps only the last ~2KB of stdout and
parses the final line as JSON, so the stdout line must stay compact —
per-trial breakdowns would blow past that window (this is exactly what
made round 3's driver record unparseable).

Output (ONE compact line, stdout):
        {"metric": "e2e_bench_sec", "value": <sum of per-key best sec>,
         "unit": "sec", "queries": {name: best sec, ...}, "sf": <dir>,
         "trials": N, ...extras}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

QSET = ["table part", "query value", "spark merge",
        "key scan filter", "window group order"]
WARM_REPS = 10  # preloaded-path repetitions per query


def run_trial(spark, docs, emb, events, n_docs: int) -> tuple[dict, dict]:
    from pyspark.sql import functions as F

    from pysearchlite_spark.engine import SearchIndex
    from pysearchlite_spark.functions.text import (quality_stats,
                                                   repetition_stats)
    from pysearchlite_spark.operators.ann import (AnnIndex,
                                                  brute_cosine_topk)
    from pysearchlite_spark.operators.dedup import (exact_dedup,
                                                    minhash_lsh_pairs,
                                                    repeated_spans)
    from pysearchlite_spark.plans.builder import build_index

    timings: dict[str, float] = {}
    extras: dict = {}

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.monotonic()

            def __exit__(self, *a):
                timings[name] = round(time.monotonic() - self.t0, 4)

        return _T()

    idx_dir = tempfile.mkdtemp(prefix="bench_idx_")
    try:
        with timed("index_build"):
            build_index(spark, docs, idx_dir, id_col="doc_id",
                        segment_docs=1024)
        extras["index_docs_per_sec"] = round(
            n_docs / timings["index_build"], 2)

        idx = SearchIndex(spark, idx_dir)
        qset = QSET
        with timed("count_and"):
            for q in qset:
                idx.count(q)
        with timed("search_and"):
            for q in qset:
                idx.search_and_ids(q)
        with timed("search_or"):
            for q in qset:
                idx.search_or_ids(q)
        with timed("bm25_top10"):
            for q in qset:
                idx.topk(q, k=10)
        with timed("bm25_top10_distributed"):
            idx.topk(qset[0], k=10, distributed=True)
        # all 5 queries through ONE distributed job (raw wall-clock for
        # the batch, like bm25_top10 is raw for its 5 sequential queries;
        # the per-query amortized figure is derived in extras)
        with timed("bm25_top10_batch5"):
            idx.topk_batch(qset, k=10)
        extras["batch_query_latency_ms"] = round(
            1000 * timings["bm25_top10_batch5"] / len(qset), 2)
        extras["query_latency_ms"] = round(
            1000 * timings["bm25_top10"] / len(qset), 2)
        # filtered retrieval (Lucene filter-clause shape): allow-list =
        # docs with n_chars >= 300 (~half the corpus), resolved per query
        # — measures the full filter path (docmap semi-join + pseg
        # routing + masked scoring), not a cached id set
        with timed("bm25_filtered_top10"):
            for q in qset:
                idx.topk(q, k=10, filter_ids=docs.filter(
                    F.col("n_chars") >= 300).select("doc_id"))
        extras["filtered_query_latency_ms"] = round(
            1000 * timings["bm25_filtered_top10"] / len(qset), 2)
        # same workload through a REUSABLE resolved-filter handle: the
        # allow-list is resolved once (inside the timing — the handle's
        # amortized cost is part of the honest number) and reused by all
        # 5 queries
        with timed("bm25_filtered_top10_handle"):
            fh = idx.prepare_filter(filter_ids=docs.filter(
                F.col("n_chars") >= 300).select("doc_id"))
            for q in qset:
                idx.topk(q, k=10, filter_ids=fh)
        # synonym-group scoring (SynonymQuery semantics) and explicit
        # OR-groups with boosts — both ride the group kernel with
        # round-4 group-aware block-max in auto mode
        with timed("bm25_syn_top10"):
            for q in qset:
                idx.topk_synonyms(q, {"table": ["key"], "value": ["order"]},
                                  k=10)
        with timed("bm25_boosted_top10"):
            idx.topk_groups([["table", "key"], ["part"]],
                            boosts=[2.0, 1.0], k=10)
        # fuzzy term query: banded-Levenshtein dictionary expansion + OR
        with timed("search_fuzzy"):
            idx.search_fuzzy_ids("tabel", max_edits=1)
        # spell suggestions: ranked dictionary neighbours (scan path —
        # one 2-column dictionary job)
        with timed("suggest"):
            idx.suggest("tabel", k=5, max_edits=1)
        # more-like-this: tf*idf term selection + disjunctive BM25
        with timed("more_like_this_top10"):
            idx.more_like_this("table part value spark query", k=10,
                               max_query_terms=4, min_df=2)
        # significant terms: full postings scan cogrouped with the
        # routed foreground — the batch aggregation shape
        with timed("significant_terms"):
            idx.significant_terms("table part", k=10, min_fg=2)
        # warm path: preloaded term cache (the reference's mmap-residency
        # analogue) — no Spark dispatch per query
        idx.preload()
        with timed("bm25_top10_preloaded"):
            for _ in range(WARM_REPS):
                for q in qset:
                    idx.topk(q, k=10)
        extras["query_latency_warm_ms"] = round(
            1000 * timings["bm25_top10_preloaded"]
            / (WARM_REPS * len(qset)), 3)
        # warm suggest: candidate-vectorized numpy DP over the cached
        # dictionary, no Spark dispatch
        with timed("suggest_preloaded"):
            for _ in range(WARM_REPS):
                idx.suggest("tabel", k=5, max_edits=1)
        qv0 = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
        # field collapsing: best doc per source over the scored match set
        # (scores_df kernel + groupBy/max_by + TakeOrderedAndProject)
        with timed("bm25_collapse_top10"):
            idx.search_collapse(qset[0], docs, "source", k=10).collect()
        # hybrid BM25+ANN via RRF: both legs' top-50 fused driver-side
        with timed("hybrid_rrf_top10"):
            from pysearchlite_spark.operators.hybrid import hybrid_topk
            hybrid_topk(idx, emb.filter(F.col("vec_id") != 0),
                        qset[0], list(qv0), k=10)

        # positional variant: separate key so index_build stays comparable
        # across rounds; the delta IS the cost of carrying positions
        pos_dir = tempfile.mkdtemp(prefix="bench_posidx_")
        try:
            with timed("index_build_positional"):
                build_index(spark, docs, pos_dir, id_col="doc_id",
                            segment_docs=1024, with_positions=True)
            pidx = SearchIndex(spark, pos_dir)
            with timed("search_phrase"):
                for q in qset:
                    pidx.search_phrase_ids(q)
            # unordered proximity (SpanNearQuery inOrder=false)
            with timed("search_unear"):
                for q in qset:
                    pidx.search_near_ids(q, 3, in_order=False)
        finally:
            shutil.rmtree(pos_dir, ignore_errors=True)

        with timed("exact_dedup"):
            exact_dedup(docs).count()
        # corpus sampling: stratified domain cap (native WindowGroupLimit
        # path) + deterministic weighted draw (TakeOrderedAndProject)
        with timed("corpus_sample"):
            from pysearchlite_spark.operators.sample import (
                cap_per_key, weighted_sample_n)
            cap_per_key(docs.select("doc_id", "source"),
                        "source", 100).count()
            weighted_sample_n(
                docs.select("doc_id", (F.length("text") + 1).cast("double")
                            .alias("w")), 1000, "w").count()
        with timed("minhash_lsh_pairs"):
            minhash_lsh_pairs(docs, threshold=0.5).count()
        # pairs → transitive-closure groups (the keep-list step); sum the
        # computed columns so Catalyst can't prune the closure itself
        with timed("dedup_clusters"):
            from pysearchlite_spark.operators.cluster import dedup_clusters
            dedup_clusters(docs, threshold=0.8, max_df=100).agg(
                F.sum("cluster_id"), F.sum(F.col("is_dup").cast("long"))
            ).collect()
        qv = qv0
        with timed("ann_cosine_top10"):
            brute_cosine_topk(emb, list(qv), k=10).collect()
        ann_dir = tempfile.mkdtemp(prefix="bench_ann_")
        try:
            with timed("ann_index_build"):
                ann = AnnIndex.build(spark, emb, ann_dir)
            with timed("ann_lsh_top10"):
                for _ in range(3):
                    ann.topk(list(qv), k=10).collect()
            timings["ann_lsh_top10"] = round(
                timings["ann_lsh_top10"] / 3, 4)
            # 20-query batch through ONE job; per-query amortized time
            qvs = [r["embedding"] for r in
                   emb.orderBy("vec_id").limit(20).collect()]
            with timed("ann_lsh_top10_batch20"):
                ann.topk_batch(qvs, k=10).collect()
            timings["ann_lsh_top10_batch20"] = round(
                timings["ann_lsh_top10_batch20"] / len(qvs), 4)
        finally:
            shutil.rmtree(ann_dir, ignore_errors=True)
        # .agg over computed columns, NOT .count(): count() lets Catalyst
        # prune the whole stat computation and time only the parquet scan.
        # Sum EVERY output column — summing a subset lets Catalyst prune
        # the others (avg_token_len's F.aggregate is real per-row work).
        with timed("quality_stats"):
            quality_stats(docs).agg(
                F.sum("n_chars"), F.sum("n_tokens"), F.sum("distinct_ratio"),
                F.sum("avg_token_len"), F.sum("punct_ratio"),
                F.sum("stopword_ratio")).collect()
        with timed("repetition_stats"):
            repetition_stats(docs).agg(
                F.sum("top2gram_frac"), F.sum("dup5gram_frac")).collect()
        with timed("repeated_spans"):
            repeated_spans(docs, n=8).agg(F.sum("dup_spans")).collect()
        # the composed cleaning pipeline (quality + repetition + exact
        # dedup + cleaned parquet): measures the stage-chaining overhead
        # on top of the operators benched individually above; near-dedup
        # is excluded here because its components already have their own
        # keys (minhash_lsh_pairs, dedup_clusters) and its
        # connected-components rounds are job-dispatch-bound at bench SF
        from pysearchlite_spark.pipeline import prepare_corpus
        clean_dir = tempfile.mkdtemp(prefix="bench_clean_")
        try:
            with timed("prepare_corpus"):
                rep = prepare_corpus(
                    spark, docs, os.path.join(clean_dir, "out"),
                    quality={"min_n_tokens": 10, "max_punct_ratio": 0.3},
                    repetition={"max_top2gram_frac": 0.5})
            extras["prepare_corpus_kept"] = rep["n_out"]
        finally:
            shutil.rmtree(clean_dir, ignore_errors=True)
        with timed("events_hourly"):
            (events.groupBy(F.window("ts", "1 hour"), "event_type")
             .agg(F.count("*"), F.sum("value")).count())
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)

    return timings, extras


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    trials = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3")))
    # keep \r progress bars out of the captured output (see module docstring)
    os.environ.setdefault("SPARK_GRAFT_CONSOLE_PROGRESS", "false")

    from pysearchlite_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, int(cpus)))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")

    all_trials: list[dict] = []
    extras_last: dict = {}
    try:
        for _ in range(trials):
            t, extras_last = run_trial(spark, docs, emb, events, n_docs)
            all_trials.append(t)
            # dedup/ANN operators persist() intermediates their returned
            # frames consume lazily; drop them between trials so cached
            # blocks from trial N don't occupy executor storage (or skew
            # timings) in trial N+1
            spark.catalog.clearCache()
    finally:
        spark.stop()

    best = {k: min(t[k] for t in all_trials) for k in all_trials[0]}
    total = round(sum(best.values()), 4)
    # derived rates recomputed from the best-of keys
    extras = dict(extras_last)
    extras["index_docs_per_sec"] = round(n_docs / best["index_build"], 2)
    extras["query_latency_ms"] = round(
        1000 * best["bm25_top10"] / len(QSET), 2)
    extras["query_latency_warm_ms"] = round(
        1000 * best["bm25_top10_preloaded"] / (WARM_REPS * len(QSET)), 3)
    extras["batch_query_latency_ms"] = round(
        1000 * best["bm25_top10_batch5"] / len(QSET), 2)
    # Per-trial detail goes to a side file, NOT stdout: the driver keeps
    # only the tail of stdout and must be able to parse the final line.
    trials_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH", "trials_last.json")
    try:
        with open(trials_path, "w") as f:
            json.dump({"sf": sf_dir, "cpus": int(cpus), "trials": trials,
                       "trials_all": all_trials}, f, indent=1)
    except OSError as e:  # read-only checkout — detail is best-effort
        sys.stderr.write(f"bench: could not write {trials_path}: {e}\n")
    line = json.dumps({"metric": "e2e_bench_sec", "value": total,
                       "unit": "sec", "queries": best, "sf": sf_dir,
                       "n_docs": n_docs, "cpus": int(cpus),
                       "trials": trials, **extras})
    if len(line) > 1900:  # hard guard: never exceed the driver's window
        sys.stderr.write(f"bench: full line {len(line)}B > 1900, "
                         "dropping per-query detail to 'queries_top'\n")
        top = dict(sorted(best.items(), key=lambda kv: -kv[1])[:10])
        line = json.dumps({"metric": "e2e_bench_sec", "value": total,
                           "unit": "sec", "queries": top, "sf": sf_dir,
                           "n_docs": n_docs, "cpus": int(cpus),
                           "trials": trials, **extras})
    print(line)


if __name__ == "__main__":
    sys.stderr.write(
        f"bench: starting ({os.environ.get('SPARK_GRAFT_BENCH_TRIALS', '3')}"
        " interleaved trials, best-of reported)\n")
    main()
