"""jobs/maintain.py smoke: the spark-submit maintenance surface (delete /
compact) drives the same library paths end-to-end from a fresh process."""

import json
import os
import subprocess
import sys

import pandas as pd

from pysearchlite_spark.engine import SearchIndex
from pysearchlite_spark.plans.builder import build_index

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli(*argv) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "maintain.py"), *argv],
        capture_output=True, text=True, env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_delete_then_compact_cli(spark, tmp_path):
    idx_dir = str(tmp_path / "idx")
    docs = spark.read.parquet(
        os.path.join(os.environ.get("SPARK_GRAFT_SF_DIR",
                                    "/root/testdata/sf0.001"),
                     "documents.parquet"))
    build_index(spark, docs, idx_dir, id_col="doc_id", segment_docs=200)
    base = SearchIndex(spark, idx_dir)
    ids = base.search_and_ids("table part")
    victims = [int(x) for x in ids[:5]]
    ids_path = str(tmp_path / "ids.parquet")
    pd.DataFrame({"doc_id": victims}).to_parquet(ids_path)

    res = _cli("--index-dir", idx_dir, "delete", "--ids", ids_path)
    assert res["cmd"] == "delete" and res["delete_files"]
    after = SearchIndex(spark, idx_dir)
    assert after.count("table part") == ids.size - 5

    res2 = _cli("--index-dir", idx_dir, "compact")
    assert res2["delete_files"] == []
    assert res2["n_docs"] == base.n_docs - 5
    final = SearchIndex(spark, idx_dir)
    assert final.count("table part") == ids.size - 5

    res3 = _cli("--index-dir", idx_dir, "expire", "--keep-last", "1")
    assert res3["dropped_snapshots"] == 2
    assert res3["dropped_posting_segments"] > 0
    assert SearchIndex(spark, idx_dir).count("table part") == ids.size - 5
