"""Focused follow-up to BENCH/ab_r3_r5.py: the four keys the full-suite A/B
flagged above the 1.15x noise bar (count_and 1.31, bm25_filtered_top10 1.19,
filtered_query_latency 1.19, repetition_stats 1.18) get a tighter paired
read. Code audit says none of their code paths changed since r3 (`count()`
diffs only in an unrelated default arg; the filter_ids=DataFrame resolution
is byte-identical modulo an isinstance dispatch; repetition_stats untouched),
so the hypothesis is per-key best-of-3 noise on a host with ~2x single-run
spread. This script raises N and shrinks the unit of work:

  * one subprocess per (pass, side), strict interleave (r3, r5, r3, r5...);
  * each subprocess builds the sf0.1 index once (untimed), then measures
    each key best-of-3 IN-PROCESS (warm JVM, so first-touch codegen noise
    lands on the warmup, not the measurement — unlike the full suite where
    count_and is the first query after the build and absorbs it);
  * search_and rides along as an unflagged control key.

Verdict rule: a key is NOISE if its focused best-of-N ratio lands within
[1/1.15, 1.15]; anything still above gets escalated to a code cause.

Usage: python BENCH/ab_focus.py [passes_per_side] → one JSON line +
writes BENCH/ab_focus.json.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

R3_COMMIT = "7ebe88d"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# runs inside EACH tree (both expose the same API surface for these keys)
CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, os.getcwd())
from pyspark.sql import functions as F
from pysearchlite_spark.session import get_spark
from pysearchlite_spark.engine import SearchIndex
from pysearchlite_spark.functions.text import repetition_stats
from pysearchlite_spark.plans.builder import build_index

QSET = ["table part", "query value", "spark merge",
        "key scan filter", "window group order"]
spark = get_spark("ab_focus", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
idx_dir = tempfile.mkdtemp(prefix="ab_focus_idx_")
try:
    build_index(spark, docs, idx_dir, id_col="doc_id", segment_docs=1024)
    idx = SearchIndex(spark, idx_dir)
    idx.count(QSET[0])  # warm the query path once, untimed
    best = {}
    for _ in range(3):
        t0 = time.monotonic()
        for q in QSET:
            idx.count(q)
        best["count_and"] = min(best.get("count_and", 9e9),
                                time.monotonic() - t0)
        t0 = time.monotonic()
        for q in QSET:
            idx.search_and_ids(q)
        best["search_and"] = min(best.get("search_and", 9e9),
                                 time.monotonic() - t0)
        t0 = time.monotonic()
        for q in QSET:
            idx.topk(q, k=10, filter_ids=docs.filter(
                F.col("n_chars") >= 300).select("doc_id"))
        best["bm25_filtered_top10"] = min(
            best.get("bm25_filtered_top10", 9e9), time.monotonic() - t0)
        t0 = time.monotonic()
        repetition_stats(docs).agg(
            F.sum("top2gram_frac"), F.sum("dup5gram_frac")).collect()
        best["repetition_stats"] = min(best.get("repetition_stats", 9e9),
                                       time.monotonic() - t0)
    print("ABFOCUS " + json.dumps(best))
finally:
    shutil.rmtree(idx_dir, ignore_errors=True)
"""


def run_child(cwd: str) -> dict:
    p = subprocess.run([sys.executable, "-c", CHILD], cwd=cwd,
                       capture_output=True, text=True, timeout=900,
                       env=dict(os.environ))
    if p.returncode != 0:
        raise RuntimeError(f"child in {cwd}: {p.stderr[-2000:]}")
    line = [ln for ln in p.stdout.splitlines()
            if ln.startswith("ABFOCUS ")][-1]
    return json.loads(line[len("ABFOCUS "):])


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    wt = "/tmp/ab_focus_worktree"
    if os.path.exists(wt):
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=REPO, capture_output=True)
        shutil.rmtree(wt, ignore_errors=True)
    subprocess.run(["git", "worktree", "add", "--detach", wt, R3_COMMIT],
                   cwd=REPO, check=True, capture_output=True)
    trials = {"r3": [], "r5": []}
    try:
        for i in range(passes):
            for side, cwd in (("r3", wt), ("r5", REPO)):
                t0 = time.monotonic()
                res = run_child(cwd)
                trials[side].append(res)
                print(f"pass {i + 1} {side}: {res} "
                      f"(wall {time.monotonic() - t0:.0f}s)",
                      file=sys.stderr)
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=REPO, capture_output=True)
        shutil.rmtree(wt, ignore_errors=True)
    keys = sorted(trials["r3"][0])
    best = {s: {k: min(t[k] for t in trials[s]) for k in keys}
            for s in trials}
    ratios = {k: round(best["r5"][k] / best["r3"][k], 3) for k in keys}
    out = {"r3_commit": R3_COMMIT, "passes_per_side": passes,
           "interleaved": True, "in_process_best_of": 3,
           "best_r3": {k: round(v, 4) for k, v in best["r3"].items()},
           "best_r5": {k: round(v, 4) for k, v in best["r5"].items()},
           "ratio_r5_over_r3": ratios,
           "noise_band": [round(1 / 1.15, 3), 1.15],
           "all_trials": trials}
    with open(os.path.join(REPO, "BENCH", "ab_focus.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": "ab_focus", "ratios": ratios}))


if __name__ == "__main__":
    main()
