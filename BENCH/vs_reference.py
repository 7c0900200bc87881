"""Head-to-head vs the actual reference (stn/pysearchlite) on identical data:
single-node indexing throughput and query latency.

The reference is imported read-only from /root/reference (run, not copied).
Both engines index the SAME deterministic text corpus, each from its natural
on-disk input — the reference parses JSONL exactly as its CLI does
(commands/build_index.py:7-12: json.loads per line -> psl.index), ours reads
a parquet table (url, text) and derives deterministic docIDs. Queries run
against warm indexes (reference: mmap restore; ours: SearchIndex.preload —
the equivalent residency mode). Output: one JSON line.

Usage: python BENCH/vs_reference.py [--n-docs 50000] [--cpus 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, "/root/reference")

QUERIES = ["st petersburg high school", "united states constitution",
           "search", "los angeles", "the national football league",
           "the book of life", "care a lot", "usb hub"]


def run_reference(jsonl_path: str, n_docs: int) -> dict:
    import pysearchlite as psl
    idx_dir = tempfile.mkdtemp(prefix="ref_idx_")
    try:
        # the reference's own ingest loop (commands/build_index.py:7-12)
        t0 = time.monotonic()
        psl.init(idx_dir)
        with open(jsonl_path, "r") as fh:
            for line in fh:
                d = json.loads(line)
                psl.index(d["id"], d["text"])
        psl.save_index()
        t_index = time.monotonic() - t0
        psl.clear_index()
        psl.restore_index()
        # warm-up
        for q in QUERIES:
            psl.search(q)
        reps = 20
        t0 = time.monotonic()
        for _ in range(reps):
            for q in QUERIES:
                psl.search(q)
        t_q = (time.monotonic() - t0) / (reps * len(QUERIES))
        counts = {q: psl.count(q) for q in QUERIES}
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
    return {"index_sec": round(t_index, 3),
            "docs_per_sec": round(n_docs / t_index, 1),
            "query_ms": round(t_q * 1000, 3), "counts": counts}


def run_spark(parquet_dir: str, n_docs: int, cpus: int) -> dict:
    from pysearchlite_spark.engine import SearchIndex
    from pysearchlite_spark.plans.builder import build_index
    from pysearchlite_spark.session import get_spark

    spark = get_spark("vsref", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, cpus * 2))
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(parquet_dir)
    df.limit(10).count()  # warm scheduler
    idx_dir = tempfile.mkdtemp(prefix="psl_idx_")
    try:
        t0 = time.monotonic()
        build_index(spark, df, idx_dir, segment_docs=1 << 17)
        t_index = time.monotonic() - t0
        idx = SearchIndex(spark, idx_dir)
        idx.preload()  # residency mode == reference's mmap restore
        for q in QUERIES:
            idx.search(q)
        reps = 20
        t0 = time.monotonic()
        for _ in range(reps):
            for q in QUERIES:
                # kernel latency: ids only (name lookup measured separately —
                # the reference's DocList is a resident python list)
                idx.search_and_ids(q)
        t_q = (time.monotonic() - t0) / (reps * len(QUERIES))
        t0 = time.monotonic()
        for _ in range(reps):
            for q in QUERIES:
                idx.topk(q, k=10)
        t_topk = (time.monotonic() - t0) / (reps * len(QUERIES))
        counts = {q: idx.count(q) for q in QUERIES}
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
        spark.stop()
    return {"index_sec": round(t_index, 3),
            "docs_per_sec": round(n_docs / t_index, 1),
            "query_ms": round(t_q * 1000, 3),
            "bm25_topk_ms": round(t_topk * 1000, 3), "counts": counts}


def _run_role(role: str, path: str, n_docs: int, cpus: int,
              out_path: str) -> None:
    res = (run_reference(path, n_docs) if role == "ref"
           else run_spark(path, n_docs, cpus))
    with open(out_path, "w") as fh:
        json.dump(res, fh)


def _in_subprocess(role: str, path: str, n_docs: int, cpus: int) -> dict:
    """Each engine in a FRESH process: the loser of a shared-process run
    inherits the winner's memory churn (allocator + host balloon state) and
    measures up to 2.5x slower for identical work."""
    import subprocess
    out = tempfile.mktemp(suffix=".json")
    subprocess.run([sys.executable, os.path.abspath(__file__),
                    "--role", role, "--path", path, "--out", out,
                    "--n-docs", str(n_docs), "--cpus", str(cpus)],
                   check=True)
    with open(out) as fh:
        res = json.load(fh)
    os.unlink(out)
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=50_000)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--role", choices=["ref", "spark"], default=None)
    ap.add_argument("--path", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.role:
        _run_role(args.role, args.path, args.n_docs, args.cpus, args.out)
        return

    from pysearchlite_spark.datagen import page_text
    from pysearchlite_spark.plans.builder import doc_sort_key

    # stage the corpus on disk in each engine's natural input format
    data_dir = tempfile.mkdtemp(prefix="vsref_data_")
    jsonl_path = os.path.join(data_dir, "corpus.jsonl")
    parquet_dir = os.path.join(data_dir, "corpus.parquet")
    docs = [(f"doc{i:07d}", page_text(42, i)) for i in range(args.n_docs)]
    # feed the reference in OUR docID order so result docIDs/names align
    docs_sorted = sorted(docs, key=lambda d: doc_sort_key(d[0]))
    with open(jsonl_path, "w") as fh:
        for name, text in docs_sorted:
            fh.write(json.dumps({"id": name, "text": text}) + "\n")
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(parquet_dir)
    pq.write_table(
        pa.table({"url": [d[0] for d in docs], "text": [d[1] for d in docs]}),
        os.path.join(parquet_dir, "part-0.parquet"),
        row_group_size=8192)  # splittable scan: >=1 row group per task

    try:
        ref = _in_subprocess("ref", jsonl_path, args.n_docs, args.cpus)
        spk = _in_subprocess("spark", parquet_dir, args.n_docs, args.cpus)
    finally:
        shutil.rmtree(data_dir, ignore_errors=True)
    assert ref["counts"] == spk["counts"], (ref["counts"], spk["counts"])
    out = {
        "n_docs": args.n_docs, "cpus_spark": args.cpus,
        "reference": {k: v for k, v in ref.items() if k != "counts"},
        "pysearchlite_spark": {k: v for k, v in spk.items()
                               if k != "counts"},
        "counts_match": True,
        "index_speedup": round(spk["docs_per_sec"] / ref["docs_per_sec"], 2),
        "query_speedup": round(ref["query_ms"] / spk["query_ms"], 2),
    }
    # accumulate one result per corpus size (the crossover story needs both)
    path = os.path.join(REPO, "BENCH", "vs_reference.json")
    acc = {}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        acc = prev if "by_n_docs" in prev else {}
    acc.setdefault("by_n_docs", {})[str(args.n_docs)] = out
    with open(path, "w") as f:
        json.dump(acc, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
