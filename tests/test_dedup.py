"""Dedup operators vs brute-force single-node oracles."""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from pysearchlite_spark.operators.dedup import (exact_dedup,
                                                minhash_lsh_pairs,
                                                simhash_pairs,
                                                token_jaccard_pairs)
from pysearchlite_spark.tokenizer import normalized_tokens


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(200)]
    docs = []
    for i in range(60):
        docs.append((i, " ".join(rng.choices(vocab, k=rng.randint(10, 40)))))
    # planted exact dups
    docs.append((60, docs[3][1]))
    docs.append((61, docs[3][1]))
    docs.append((62, docs[10][1]))
    # planted near-dups (one token changed)
    toks = docs[5][1].split()
    toks[0] = "CHANGED"
    docs.append((63, " ".join(toks)))
    return docs


@pytest.fixture(scope="module")
def docs_df(spark, corpus):
    return spark.createDataFrame(corpus, "doc_id long, text string")


def test_exact_dedup(docs_df, corpus):
    got = {r["doc_id"]: (r["keep_id"], r["is_dup"])
           for r in exact_dedup(docs_df).collect()}
    text_min = {}
    for i, t in corpus:
        text_min.setdefault(t, i)
    for i, t in corpus:
        assert got[i] == (text_min[t], i != text_min[t])


def _jaccard(a, b):
    sa, sb = set(normalized_tokens(a)), set(normalized_tokens(b))
    if not sa | sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def test_token_jaccard_pairs_exact(docs_df, corpus):
    got = {(r["a"], r["b"]): r["jaccard"]
           for r in token_jaccard_pairs(docs_df, threshold=0.5,
                                        max_df=10**9).collect()}
    want = {}
    for (i, ti), (j, tj) in itertools.combinations(corpus, 2):
        jac = _jaccard(ti, tj)
        if jac >= 0.5:
            want[(min(i, j), max(i, j))] = jac
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-6)


def test_minhash_lsh_finds_near_dups(docs_df, corpus):
    got = {(r["a"], r["b"]) for r in
           minhash_lsh_pairs(docs_df, threshold=0.5).collect()}
    # exact dups must be found (jaccard 1.0 → identical signatures)
    assert (3, 60) in got and (3, 61) in got and (60, 61) in got
    assert (10, 62) in got
    # the one-token-changed near-dup has jaccard >~0.95
    assert (5, 63) in got
    # no false positives below threshold: verify against brute force
    for a, b in got:
        ta = dict(corpus)[a]
        tb = dict(corpus)[b]
        assert _jaccard(ta, tb) >= 0.5


def test_simhash_pairs_find_exact_dups(docs_df):
    got = {(r["a"], r["b"]): r["hamming"]
           for r in simhash_pairs(docs_df, max_hamming=3).collect()}
    assert got.get((3, 60)) == 0
    assert got.get((3, 61)) == 0
    assert got.get((60, 61)) == 0
    assert got.get((10, 62)) == 0
    # all reported pairs honor the distance bound
    assert all(h <= 3 for h in got.values())
    # (the one-token-changed near-dup (5, 63) may legitimately exceed
    # hamming 3 — simhash flips several bits per token change)
