"""jobs/dedup_check.py smoke: the spark-submit incremental near-dedup
surface (build / check / add) drives NearDupIndex end-to-end from a
fresh process — the daily-crawl loop: check, drop matches, add
survivors."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli(*argv) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "dedup_check.py"),
         *argv],
        capture_output=True, text=True, env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_build_check_add_loop(spark, tmp_path):
    corpus = [(i, f"corpus document number {i} about topic {i % 5} "
                  f"with several more deterministic filler words")
              for i in range(40)]
    batch = [(100, corpus[3][1]),                     # exact dup of 3
             (101, corpus[7][1] + " extra tail"),     # near dup of 7
             (102, "fresh text that matches no corpus document at all")]
    cpath, bpath = str(tmp_path / "c.parquet"), str(tmp_path / "b.parquet")
    spark.createDataFrame(corpus, "doc_id long, text string") \
         .write.parquet(cpath)
    spark.createDataFrame(batch, "doc_id long, text string") \
         .write.parquet(bpath)
    nd = str(tmp_path / "nd")

    rep = _cli("--index-dir", nd, "build", "--input", cpath)
    assert rep["n_docs"] == 40 and rep["adds"] == [0]

    pairs_out = str(tmp_path / "pairs.parquet")
    rep2 = _cli("--index-dir", nd, "check", "--input", bpath,
                "--out", pairs_out, "--threshold", "0.5")
    assert rep2["dup_batch_docs"] == 2
    got = {(r["corpus_id"], r["batch_id"]): r["jaccard"]
           for r in spark.read.parquet(pairs_out).collect()}
    assert got[(3, 100)] == 1.0
    assert 0.5 <= got[(7, 101)] < 1.0
    assert not any(b == 102 for _, b in got)

    # survivors (the fresh doc) committed; a re-crawl of it now matches
    surv = spark.createDataFrame([batch[2]], "doc_id long, text string")
    spath = str(tmp_path / "s.parquet")
    surv.write.parquet(spath)
    rep3 = _cli("--index-dir", nd, "add", "--input", spath)
    assert rep3["added"] == 1 and rep3["n_docs"] == 41

    recrawl = spark.createDataFrame([(200, batch[2][1])],
                                    "doc_id long, text string")
    rpath = str(tmp_path / "r.parquet")
    recrawl.write.parquet(rpath)
    rep4 = _cli("--index-dir", nd, "check", "--input", rpath,
                "--out", str(tmp_path / "p2.parquet"),
                "--threshold", "0.9")
    assert rep4["dup_batch_docs"] == 1

    # compact the two generations; the re-crawl is still caught
    rep5 = _cli("--index-dir", nd, "compact")
    assert rep5["compacted"] and rep5["generations"] == 2
    rep6 = _cli("--index-dir", nd, "check", "--input", rpath,
                "--out", str(tmp_path / "p3.parquet"),
                "--threshold", "0.9")
    assert rep6["dup_batch_docs"] == 1
    spark.catalog.clearCache()
