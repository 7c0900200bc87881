"""NearDupIndex: incremental near-dedup of a new batch against a
persisted corpus index — equivalence with the one-shot
minhash_lsh_pairs operator, brute-force Jaccard parity, generation
commits, restore-from-disk, and the no-corpus-shuffle plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pysearchlite_spark.operators.dedup import minhash_lsh_pairs
from pysearchlite_spark.operators.neardup import NearDupIndex

BASE = [
    (0, "the quick brown fox jumps over the lazy dog near the river"),
    (1, "completely different article about spark dataframe joins"),
    (2, "a third document discussing minhash banding and lsh buckets"),
    (3, "weather report sunny with a chance of afternoon thunderstorms"),
    (4, "the quick brown fox jumps over the lazy dog near the creek"),
]
# batch: 10 = near-dup of 0, 11 = exact dup of 1, 12 = fresh, 13 = empty
BATCH = [
    (10, "the quick brown fox jumps over the lazy dog near the river bank"),
    (11, "completely different article about spark dataframe joins"),
    (12, "entirely novel content that matches nothing in the corpus"),
    (13, ""),
]
CFG = dict(n_perm=64, bands=16, shingle_k=3, seed=7)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nd") / "idx")
    base = spark.createDataFrame(BASE, "doc_id long, text string")
    return NearDupIndex.build(spark, base, root, **CFG)


@pytest.fixture(scope="module")
def batch_df(spark):
    return spark.createDataFrame(BATCH, "doc_id long, text string")


def brute_jaccard(ta: str, tb: str, k: int = 3) -> float:
    import hashlib

    def sh(t):
        toks = [x.lower() for x in __import__("re").findall(
            "[A-Za-z0-9]+", t or "")]
        if not toks:
            return set()
        if len(toks) < k:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}
    a, b = sh(ta), sh(tb)
    return len(a & b) / len(a | b) if (a | b) else 0.0


def test_check_matches_oneshot_operator(idx, batch_df, spark):
    """At identical config, check() == the cross-pair subset of the
    one-shot minhash_lsh_pairs over (corpus ∪ batch)."""
    both = spark.createDataFrame(BASE + BATCH, "doc_id long, text string")
    ones = {(r["a"], r["b"]): r["jaccard"]
            for r in minhash_lsh_pairs(both, threshold=0.5, **CFG).collect()}
    cross = {k: v for k, v in ones.items() if k[0] < 10 and k[1] >= 10}
    got = {(r["corpus_id"], r["batch_id"]): r["jaccard"]
           for r in idx.check(batch_df, threshold=0.5).collect()}
    assert got == cross
    spark.catalog.clearCache()


def test_planted_dups_found_with_exact_jaccard(idx, batch_df, spark):
    got = {(r["corpus_id"], r["batch_id"]): r["jaccard"]
           for r in idx.check(batch_df, threshold=0.5).collect()}
    texts = dict(BASE)
    btexts = dict(BATCH)
    # the near-dup and the exact dup are both found
    assert (0, 10) in got and (1, 11) in got
    assert got[(1, 11)] == 1.0
    # every reported jaccard is the brute-force exact value
    for (c, b), j in got.items():
        assert j == round(brute_jaccard(texts[c], btexts[b]), 6), (c, b)
    # novel and empty batch docs match nothing
    assert not any(b in (12, 13) for _, b in got)
    spark.catalog.clearCache()


def test_add_batch_becomes_visible(idx, spark):
    n0 = idx.meta["n_docs"]
    add = [(20, "brand new corpus member about tokenizer parity traps")]
    assert idx.add_batch(
        spark.createDataFrame(add, "doc_id long, text string")) == 1
    assert idx.meta["n_docs"] == n0 + 1 and idx.meta["adds"][-1] >= 1
    probe = spark.createDataFrame(
        [(30, "brand new corpus member about tokenizer parity traps")],
        "doc_id long, text string")
    got = idx.check(probe, threshold=0.9).collect()
    assert [(r["corpus_id"], r["batch_id"], r["jaccard"])
            for r in got] == [(20, 30, 1.0)]
    spark.catalog.clearCache()


def test_restore_from_disk(idx, batch_df, spark):
    again = NearDupIndex(spark, idx.root)
    got = {(r["corpus_id"], r["batch_id"])
           for r in again.check(batch_df, threshold=0.5).collect()}
    assert (0, 10) in got and (1, 11) in got
    spark.catalog.clearCache()


def test_corpus_never_shuffles_or_rehashes(idx, batch_df):
    """The candidate join must broadcast the BATCH side: the corpus
    bucket scan feeds a BroadcastHashJoin stream side with no Exchange
    (and no Python eval) between scan and join."""
    plan = (idx.check(batch_df, threshold=0.5, max_bucket=None)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    lines = plan.splitlines()
    scan_i = [i for i, l in enumerate(lines)
              if "Scan parquet" in l and "buckets" in l]
    assert scan_i, plan
    join_i = max(i for i, l in enumerate(lines)
                 if "BroadcastHashJoin" in l and i < scan_i[0])
    seg = "\n".join(lines[join_i:scan_i[0]])
    assert "Exchange" not in seg and "EvalPython" not in seg, seg


def test_oversized_bucket_cap(idx, spark):
    """max_bucket=0 suppresses every candidate (all corpus buckets are
    'oversized') — the cap path is live."""
    probe = spark.createDataFrame(
        [(40, BASE[0][1])], "doc_id long, text string")
    assert idx.check(probe, threshold=0.1, max_bucket=0).count() == 0
    assert idx.check(probe, threshold=0.9).count() >= 1
    spark.catalog.clearCache()


def test_concurrent_adds_serialize(spark, tmp_path):
    """Three threads add_batch distinct batches concurrently: the meta
    flock serializes read-modify-write, so every generation commits (no
    lost update), n_docs sums exactly, and check() sees all of them."""
    from concurrent.futures import ThreadPoolExecutor
    root = str(tmp_path / "nd")
    base = spark.createDataFrame(
        [(0, "seed corpus document with plenty of distinct filler words")],
        "doc_id long, text string")
    idx = NearDupIndex.build(spark, base, root, **CFG)

    texts = {j: (f"thread batch number {j} its own unique sentence "
                 f"about subject {j} and more padding tokens")
             for j in range(3)}

    def add(j):
        df = spark.createDataFrame([(100 + j, texts[j])],
                                   "doc_id long, text string")
        return NearDupIndex(spark, root).add_batch(
            df, batch_key=f"t{j}")

    with ThreadPoolExecutor(3) as ex:
        futs = [ex.submit(add, j) for j in range(3)]
        assert [f.result() for f in futs] == [1, 1, 1]

    fresh = NearDupIndex(spark, root)
    assert fresh.meta["n_docs"] == 4
    assert len(fresh.meta["adds"]) == 4
    assert sorted(fresh.meta["batches"]) == ["t0", "t1", "t2"]
    # replayed batch_key is a no-op
    dup = spark.createDataFrame([(200, texts[0])],
                                "doc_id long, text string")
    assert fresh.add_batch(dup, batch_key="t0") == 0
    assert fresh.meta["n_docs"] == 4
    # every committed generation answers
    for j in range(3):
        probe = spark.createDataFrame([(300 + j, texts[j])],
                                      "doc_id long, text string")
        got = fresh.check(probe, threshold=0.9).collect()
        assert [(r["corpus_id"], r["jaccard"]) for r in got] == \
            [(100 + j, 1.0)], j
    spark.catalog.clearCache()


def test_compact_generations(spark, tmp_path):
    """compact() folds every committed generation (one per streaming
    micro-batch) into one: check() answers identically, n_docs and the
    batch_key replay guard survive, superseded dirs are removed."""
    import os
    root = str(tmp_path / "nd")
    base = spark.createDataFrame(BASE, "doc_id long, text string")
    idx = NearDupIndex.build(spark, base, root, **CFG)
    idx.add_batch(spark.createDataFrame(
        [(50, "first added generation about lunar calendars")],
        "doc_id long, text string"), batch_key="g1")
    idx.add_batch(spark.createDataFrame(
        [(51, "second added generation about tidal harmonics")],
        "doc_id long, text string"), batch_key="g2")
    probe = spark.createDataFrame(
        BATCH + [(60, "first added generation about lunar calendars")],
        "doc_id long, text string")
    before = sorted((r["corpus_id"], r["batch_id"], r["jaccard"])
                    for r in idx.check(probe, threshold=0.5).collect())

    rep = idx.compact()
    assert rep["compacted"] and rep["generations"] == 3
    assert idx.meta["adds"] == [rep["generation"]]
    assert idx.meta["n_docs"] == 7
    assert sorted(idx.meta["batches"]) == ["g1", "g2"]
    # superseded generation dirs are gone; exactly one remains per table
    for sub in ("buckets", "bucket_sizes", "shingles"):
        assert os.listdir(os.path.join(root, sub)) == [
            f"add={rep['generation']}"], sub
    after = sorted((r["corpus_id"], r["batch_id"], r["jaccard"])
                   for r in idx.check(probe, threshold=0.5).collect())
    assert after == before and any(c == 50 for c, _, _ in after)
    # replay guard intact post-compaction
    assert idx.add_batch(spark.createDataFrame(
        [(99, "whatever")], "doc_id long, text string"),
        batch_key="g1") == 0
    # single-generation compact is a no-op
    assert idx.compact()["compacted"] is False
    spark.catalog.clearCache()


def test_check_broadcast_and_shuffle_paths_agree(spark, tmp_path,
                                                 monkeypatch):
    """The batch-size guard (broadcast vs shuffle join) must be invisible
    in check() results."""
    from pysearchlite_spark.operators.neardup import NearDupIndex
    corpus = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta {i}") for i in range(40)],
        "doc_id long, text string")
    idx = NearDupIndex.build(spark, corpus, str(tmp_path / "nd"))
    batch = spark.createDataFrame(
        [(1000 + i, f"alpha beta gamma delta epsilon zeta {i}")
         for i in range(10)],
        "doc_id long, text string")
    want = sorted(tuple(r) for r in
                  idx.check(batch, threshold=0.5).collect())
    monkeypatch.setenv("PSL_NEARDUP_BCAST_MAX_ROWS", "0")  # force shuffle
    got = sorted(tuple(r) for r in
                 idx.check(batch, threshold=0.5).collect())
    assert got == want and len(want) >= 10


def test_compact_defers_deletion_to_next_compact(spark, tmp_path):
    """compact() retires superseded generations into _trash (readers of
    the previous snapshot keep their files for one compaction cycle) and
    sweeps the previous trash on the next compact."""
    import os

    from pysearchlite_spark.operators.neardup import NearDupIndex
    docs = lambda lo: spark.createDataFrame(
        [(lo + i, f"one two three four five six {lo + i}")
         for i in range(5)], "doc_id long, text string")
    root = str(tmp_path / "nd")
    idx = NearDupIndex.build(spark, docs(0), root)
    idx.add_batch(docs(100))
    rep = idx.compact()
    assert rep["compacted"]
    trash = os.path.join(root, "_trash")
    assert os.path.isdir(trash) and len(os.listdir(trash)) == 6  # 3 subdirs x 2 gens
    idx.add_batch(docs(200))
    idx.compact()
    # previous trash swept; this compact's retirees now occupy it
    names = os.listdir(trash)
    assert len(names) == 6 and all("add=" in n for n in names)
