"""Hybrid BM25+ANN retrieval via reciprocal-rank fusion
(operators/hybrid.py). rrf_fuse is checked as a pure function; hybrid_topk
against an independent numpy recomputation of both legs + RRF.
"""

import numpy as np
import pytest

from pysearchlite_spark.engine import SearchIndex
from pysearchlite_spark.operators.hybrid import hybrid_topk, rrf_fuse
from pysearchlite_spark.plans.builder import build_index


def test_rrf_fuse_basic_and_ties():
    # doc 1: ranks (1, 2); doc 2: ranks (2, 1) — exact tie, id breaks it
    got = rrf_fuse([[1, 2, 3], [2, 1]], k=3)
    s12 = 1 / 61 + 1 / 62
    assert got[0] == (1, pytest.approx(s12))
    assert got[1] == (2, pytest.approx(s12))
    assert got[2] == (3, pytest.approx(1 / 63))
    # k truncates; missing-from-one-list docs still rank
    assert rrf_fuse([[1, 2, 3], [2, 1]], k=1) == [(1, pytest.approx(s12))]
    assert rrf_fuse([[7], []], k=5) == [(7, pytest.approx(1 / 61))]
    assert rrf_fuse([], k=5) == []
    assert rrf_fuse([[1, 2]], k=0) == []


def test_rrf_fuse_duplicates_and_validation():
    # duplicate id in one list keeps its FIRST (best) rank
    assert rrf_fuse([[5, 5, 6]], k=2) == [
        (5, pytest.approx(1 / 61)), (6, pytest.approx(1 / 63))]
    with pytest.raises(ValueError, match="rrf_k"):
        rrf_fuse([[1]], k=1, rrf_k=-1)


def test_rrf_fuse_rrf_k_weighting():
    # rrf_k scales the rank falloff: with rrf_k=0, rank r contributes 1/r
    got = rrf_fuse([[2, 1], [2, 1]], k=2, rrf_k=0)
    assert got == [(2, pytest.approx(2.0)), (1, pytest.approx(1.0))]
    # and a rank-1 hit outweighs two rank-2 hits (1/1 > 1/2 + 1/2 is
    # false — they tie; but 1/1 > 1/2 + 1/3)
    got = rrf_fuse([[1, 2], [3, 4, 2]], k=4, rrf_k=0)
    assert got[0] == (1, pytest.approx(1.0))
    assert got[1] == (3, pytest.approx(1.0))  # tie with 1 -> id asc
    assert got[2] == (2, pytest.approx(1 / 2 + 1 / 3))


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    rng = np.random.default_rng(7)
    vocab = ["spark", "query", "engine", "table", "merge", "scan"]
    corpus = [(i, " ".join(rng.choice(vocab, size=rng.integers(3, 12))))
              for i in range(40)]
    docs = spark.createDataFrame(
        [(i, f"d{i}", t) for i, t in corpus],
        "doc_id long, url string, text string")
    d = str(tmp_path_factory.mktemp("hybrid_idx"))
    build_index(spark, docs, d, id_col="doc_id", url_col="url",
                segment_docs=16)
    vecs = rng.standard_normal((40, 8)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(40)],
        "vec_id long, embedding array<float>")
    return SearchIndex(spark, d), emb, vecs


def test_hybrid_topk_matches_numpy_rrf(setup):
    idx, emb, vecs = setup
    rng = np.random.default_rng(11)
    qv = rng.standard_normal(8).astype(np.float32)
    k, fk = 5, 20
    got = hybrid_topk(idx, emb, "spark query", qv, k=k, fetch_k=fk)
    # independent recomputation: BM25 leg from the (oracle-backed) topk,
    # cosine leg in numpy float64, RRF by hand
    bm_ids = [d for d, _ in idx.topk("spark query", k=fk)]
    v64, q64 = vecs.astype(np.float64), qv.astype(np.float64)
    cos = (v64 @ q64) / (np.linalg.norm(v64, axis=1) * np.linalg.norm(q64))
    nn_ids = sorted(range(40), key=lambda i: (-cos[i], i))[:fk]
    want: dict[int, float] = {}
    for lst in (bm_ids, nn_ids):
        for r, d in enumerate(lst, start=1):
            want[d] = want.get(d, 0.0) + 1.0 / (60 + r)
    want_top = sorted(want.items(), key=lambda it: (-it[1], it[0]))[:k]
    assert [d for d, _ in got] == [d for d, _ in want_top]
    assert np.allclose([s for _, s in got], [s for _, s in want_top])


def test_hybrid_topk_with_ann_index(setup, tmp_path_factory):
    from pysearchlite_spark.operators.ann import AnnIndex
    idx, emb, vecs = setup
    qv = vecs[3]  # a corpus vector: its own id must fuse to the top region
    d = str(tmp_path_factory.mktemp("hybrid_ann"))
    ann = AnnIndex.build(emb.sparkSession, emb, d, n_planes=4, seed=5)
    got = hybrid_topk(idx, ann, "spark query", qv, k=10)
    assert got and all(isinstance(x, tuple) and len(x) == 2 for x in got)
    assert 3 in [d_ for d_, _ in got]  # exact-match vector surfaces
    with pytest.raises(ValueError, match="fetch_k"):
        hybrid_topk(idx, emb, "spark", qv, k=10, fetch_k=5)
