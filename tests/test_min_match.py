"""minimum_should_match (Lucene BooleanQuery minimumNumberShouldMatch):
docs matching at least m of the query's distinct terms. The reference is
AND-only (do_query.py:9-24); msm is the standard recall/precision dial
between OR (m=1) and AND (m=n). Brute-force oracle throughout: tokenize
with the reference tokenizer and count distinct matched terms."""

import random
import re

import pytest

from pysearchlite_spark.engine import SearchIndex
from pysearchlite_spark.plans.builder import build_index
from pysearchlite_spark.plans.deletes import delete_docs


def _toks(text):
    return {t.lower() for t in re.findall(r"[a-zA-Z0-9]+", text)}


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(4242)
    vocab = [f"w{i}" for i in range(30)] + ["alpha", "beta", "gamma",
                                            "delta", "epsilon"]
    return [(i, f"doc{i:03d}",
             " ".join(rng.choices(vocab, k=rng.randint(1, 40))))
            for i in range(180)]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory, corpus):
    df = spark.createDataFrame(
        corpus, "doc_id long, url string, text string")
    d = str(tmp_path_factory.mktemp("msm_idx"))
    # segment_docs=48 → 4 segments: per-segment counting must still give
    # the global matched-term counts
    build_index(spark, df, d, id_col="doc_id", url_col="url",
                segment_docs=48)
    return SearchIndex(spark, d)


def _brute(corpus, query, m):
    qs = set(query.split())
    return [i for i, _, text in corpus if len(qs & _toks(text)) >= m]


QUERY = "alpha beta gamma delta epsilon"


@pytest.mark.parametrize("m", [1, 2, 3, 4, 5])
def test_min_match_matches_brute_force(idx, corpus, m):
    want = _brute(corpus, QUERY, m)
    assert idx.search_min_match_ids(QUERY, m).tolist() == want
    assert idx.search_min_match_ids(
        QUERY, m, distributed=True).tolist() == want
    assert idx.count_min_match(QUERY, m) == len(want)


def test_min_match_degenerates_to_or_and(idx):
    q = "alpha beta gamma"
    assert (idx.search_min_match_ids(q, 1).tolist()
            == idx.search_or_ids(q).tolist())
    assert (idx.search_min_match_ids(q, 3).tolist()
            == idx.search_and_ids(q).tolist())


def test_min_match_dead_term_does_not_short_circuit(idx, corpus):
    # one unknown term: AND would return [], msm just can't count it
    q = QUERY + " zzzunknown"
    want = _brute(corpus, QUERY, 2)
    assert idx.search_min_match_ids(q, 2).tolist() == want
    assert idx.search_min_match_ids(q, 2, distributed=True).tolist() == want
    # m larger than the live term count is unreachable
    assert idx.search_min_match_ids("zzzunknown yyunknown", 1).size == 0


def test_min_match_m_above_n_terms_is_empty(idx):
    assert idx.search_min_match_ids("alpha beta", 3).size == 0
    assert idx.search_min_match_ids("alpha beta", 3,
                                    distributed=True).size == 0


def test_min_match_repeated_query_terms_count_once(idx, corpus):
    want = _brute(corpus, "alpha beta", 2)
    assert idx.search_min_match_ids("alpha alpha beta", 2).tolist() == want


def test_min_match_respects_tombstones(spark, tmp_path_factory, corpus):
    d = str(tmp_path_factory.mktemp("msm_del"))
    df = spark.createDataFrame(
        corpus, "doc_id long, url string, text string")
    build_index(spark, df, d, id_col="doc_id", url_col="url",
                segment_docs=48)
    idx = SearchIndex(spark, d)
    base = idx.search_min_match_ids(QUERY, 2).tolist()
    victims = base[:3]
    delete_docs(spark, d, victims)
    idx = SearchIndex(spark, d)
    want = [i for i in base if i not in set(victims)]
    assert idx.search_min_match_ids(QUERY, 2).tolist() == want
    assert idx.search_min_match_ids(
        QUERY, 2, distributed=True).tolist() == want


def test_min_match_with_filter(idx, corpus):
    want = [i for i in _brute(corpus, QUERY, 2) if i % 2 == 0]
    got = idx.search_min_match_ids(QUERY, 2, filter_sql="doc_id % 2 = 0")
    assert got.tolist() == want
    got_d = idx.search_min_match_ids(QUERY, 2, distributed=True,
                                     filter_sql="doc_id % 2 = 0")
    assert got_d.tolist() == want


def test_topk_min_match_matches_exhaustive(idx, corpus):
    """Filtered-ranking property: scores are the full disjunctive scores,
    candidates restricted to the msm set — so exhaustive-OR topk over all
    docs, keep msm members, truncate."""
    for m in (2, 3):
        full = idx.topk(QUERY, k=idx.n_docs + 10, use_blockmax=False)
        members = set(_brute(corpus, QUERY, m))
        want = [(d, s) for d, s in full if d in members][:10]
        assert idx.topk(QUERY, k=10, min_match=m) == want
        assert idx.topk(QUERY, k=10, min_match=m, distributed=True) == want
    # min_match=1 with blockmax auto must equal plain OR exactly
    assert idx.topk(QUERY, k=10, min_match=1) == idx.topk(QUERY, k=10)


def test_topk_batch_min_match(idx, corpus):
    queries = [QUERY, "alpha beta w1", "w2 w3 gamma"]
    got = idx.topk_batch(queries, k=5, min_match=2)
    for q, res in zip(queries, got):
        full = idx.topk(q, k=idx.n_docs + 10, use_blockmax=False)
        members = set(_brute(corpus, q, 2))
        assert res == [(d, s) for d, s in full if d in members][:5], q


def test_search_df_min_mode(idx, corpus):
    want = _brute(corpus, QUERY, 3)
    out = idx.search_df(QUERY, mode="min", min_match=3).orderBy("doc_id")
    assert [r["doc_id"] for r in out.collect()] == want
    # or-mode with min_match>1 is honored (routed to the msm kernel),
    # never silently dropped
    out2 = idx.search_df(QUERY, mode="or", min_match=3).orderBy("doc_id")
    assert [r["doc_id"] for r in out2.collect()] == want


def test_min_match_rejected_where_meaningless(idx):
    with pytest.raises(ValueError):
        idx.search_df(QUERY, mode="and", min_match=2)
    with pytest.raises(ValueError):
        idx.topk(QUERY, k=5, mode="and", min_match=2)
    with pytest.raises(ValueError):
        idx.topk_batch([QUERY], k=5, mode="and", min_match=2)


def test_min_match_count_and_urls_forward_filters(idx, corpus):
    want = [i for i in _brute(corpus, QUERY, 2) if i % 2 == 0]
    assert idx.count_min_match(QUERY, 2,
                               filter_sql="doc_id % 2 = 0") == len(want)
    assert (idx.search_min_match(QUERY, 2, filter_sql="doc_id % 2 = 0")
            == [f"doc{i:03d}" for i in want])
