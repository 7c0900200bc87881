"""jobs/export_sequences.py smoke: the spark-submit sequence-export
surface drives chunk_tokens / pack_tokens end-to-end from a fresh
process and writes dataloader-ready parquet shards."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _cli(*argv) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "export_sequences.py"),
         *argv],
        capture_output=True, text=True, env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.fixture(scope="module")
def corpus_tokens(spark):
    from pyspark.sql import functions as F

    from pysearchlite_spark.functions.text import token_counts
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    n = token_counts(docs).agg(F.sum("n_tokens")).collect()[0][0]
    return int(n)


def test_pack_export_cli(tmp_path, spark, corpus_tokens):
    out_dir = str(tmp_path / "seqs")
    rep = _cli("--input", os.path.join(SF, "documents.parquet"),
               "--out-dir", out_dir, "--seq-len", "128",
               "--mode", "pack", "--rows-per-shard", "40")
    # conservation vs the independent token_counts operator
    assert rep["n_tokens"] == corpus_tokens
    assert rep["n_seqs"] == -(-corpus_tokens // 128)
    assert rep["n_full"] >= rep["n_seqs"] - 1
    # shards honour the rows-per-shard bound
    assert rep["n_shards"] >= rep["n_seqs"] // 40
    seqs = spark.read.parquet(out_dir)
    assert seqs.count() == rep["n_seqs"]
    assert {f.name for f in seqs.schema.fields} == {
        "seq_id", "n_tokens", "token_ids"}
    spark.catalog.clearCache()


def test_pack_export_cli_eod(tmp_path, corpus_tokens, spark):
    out_dir = str(tmp_path / "seqs_eod")
    rep = _cli("--input", os.path.join(SF, "documents.parquet"),
               "--out-dir", out_dir, "--seq-len", "128",
               "--eod-id", "0")
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    from pyspark.sql import functions as F

    from pysearchlite_spark.functions.text import token_counts
    n_with = (token_counts(docs).filter(F.col("n_tokens") > 0).count())
    assert rep["n_tokens"] == corpus_tokens + n_with
    spark.catalog.clearCache()


def test_chunk_export_cli(tmp_path, spark, corpus_tokens):
    out_dir = str(tmp_path / "chunks")
    rep = _cli("--input", os.path.join(SF, "documents.parquet"),
               "--out-dir", out_dir, "--seq-len", "64", "--mode", "chunk")
    assert rep["n_tokens"] == corpus_tokens
    seqs = spark.read.parquet(out_dir)
    assert {f.name for f in seqs.schema.fields} == {
        "doc_id", "chunk_id", "n_tokens", "token_ids"}
    spark.catalog.clearCache()


def test_chunk_mode_rejects_eod():
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "export_sequences.py"),
         "--input", "x", "--out-dir", "y", "--seq-len", "8",
         "--mode", "chunk", "--eod-id", "0"],
        capture_output=True, text=True, env=env, timeout=120)
    assert out.returncode != 0
    assert "--eod-id only applies" in out.stderr
