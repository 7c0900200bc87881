"""Oracle engine reproduces the reference's e2e goldens
(test_search_engine.py:4-27) and naive set-oracle properties
(reference style: test_skip_list.py:69-81)."""

import random

import pytest

from pysearchlite_spark.datagen import micro_corpus
from pysearchlite_spark.oracle import OracleEngine


@pytest.fixture()
def eng():
    e = OracleEngine()
    e.index_corpus(micro_corpus())
    return e


def test_reference_search_goldens(eng):
    # exact expected outputs from /root/reference/pysearchlite/test_search_engine.py:12-14,25-27
    assert eng.search("hello") == ["id1"]
    assert eng.search("this test") == ["id2", "id3"]
    assert eng.search("that") == []
    assert eng.count("this test") == 2
    assert eng.count("that") == 0


def test_posting_goldens():
    # from test_inverted_index_skip_list.py:120-143: docs 1:[c,b], 2:[a,c]
    e = OracleEngine()
    e.index("1", "c b")
    e.index("2", "a c")
    assert e.search_and_ids("a c") == [1]
    assert e.search_and_ids("b c") == [0]
    assert e.search_and_ids("a b") == []
    assert e.search_and_ids("a b c") == []


def test_or_union(eng):
    assert eng.search_or_ids("hello another") == [0, 2]
    assert eng.search_or_ids("that hello") == [0]  # missing term: no short-circuit
    assert eng.search_or_ids("zzz") == []


def test_bm25_topk_ordering(eng):
    top = eng.topk("this test", k=10)
    ids = [d for d, _ in top]
    # docs 1 and 2 match both terms; doc with shorter dl scores higher
    assert set(ids) == {1, 2}
    scores = [s for _, s in top]
    assert scores == sorted(scores, reverse=True)
    # id2 ("this is a test", dl=4) beats id3 (dl=4)... equal dl & tf → tie →
    # ascending doc_id
    if scores[0] == pytest.approx(scores[1]):
        assert ids == [1, 2]


def test_random_vs_set_oracle():
    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(30)]
    docs = [(f"d{i}", " ".join(rng.choices(vocab, k=rng.randint(1, 40))))
            for i in range(80)]
    e = OracleEngine()
    e.index_corpus(docs)
    doc_sets = [set(t.lower() for t in txt.split()) for _, txt in docs]
    for _ in range(50):
        q = " ".join(rng.sample(vocab, k=rng.randint(1, 3)))
        terms = q.split()
        want_and = sorted(i for i, s in enumerate(doc_sets)
                          if all(t in s for t in terms))
        want_or = sorted(i for i, s in enumerate(doc_sets)
                         if any(t in s for t in terms))
        assert e.search_and_ids(q) == want_and
        assert e.search_or_ids(q) == want_or
        assert e.count(q) == len(want_and)
