"""Spell suggestions (Lucene DirectSpellChecker shape) and more-like-this
(Lucene MoreLikeThis): suggest ranks dictionary terms by (levenshtein asc,
df desc, term asc); MLT selects the text's most characteristic terms by
tf·idf and runs ordinary disjunctive BM25 over them. The reference is
exact-term only (do_query.py:9-24) — both are beyond-reference extensions
reusing the fuzzy dictionary machinery. Oracles here are pure-python
(independent DP + hand BM25), mirroring tests/test_fuzzy.py."""

import math
import re

import pytest

from pysearchlite_spark.engine import SearchIndex, bm25_idf
from pysearchlite_spark.plans.builder import build_index


def _toks(text):
    return [t.lower() for t in re.findall(r"[a-zA-Z0-9]+", text)]


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


CORPUS = [
    (0, "the testing table holds ten tested tests"),
    (1, "a test of the tabel harness and the table"),
    (2, "no relevant words here at all"),
    (3, "TEST in caps and Tea for ten"),
    (4, "tensor tensors ten; unrelated trailer taste"),
    (5, "completely different vocabulary toast cable"),
    (6, "t1 t2 t42 numbered tokens fable table"),
]

_DF = {}
for _, _text in CORPUS:
    for _t in set(_toks(_text)):
        _DF[_t] = _DF.get(_t, 0) + 1


def _brute_suggest(term, k=5, max_edits=2, prefix_len=0):
    p = term[:prefix_len]
    cands = [(t, _lev(t, term), df) for t, df in _DF.items()
             if t != term and t.startswith(p)
             and _lev(t, term) <= max_edits]
    cands.sort(key=lambda x: (x[1], -x[2], x[0]))
    return cands[:k]


def _brute_mlt_terms(text, max_query_terms=25, min_tf=1, min_df=1):
    tfs = {}
    for w in _toks(text):
        tfs[w] = tfs.get(w, 0) + 1
    scored = [(round(c * bm25_idf(len(CORPUS), _DF.get(w, 0)), 6), w)
              for w, c in tfs.items()
              if c >= min_tf and _DF.get(w, 0) >= max(1, min_df)]
    scored.sort(key=lambda x: (-x[0], x[1]))
    return [w for _, w in scored[:max_query_terms]]


def _brute_bm25_topk(terms, k):
    dls = {i: len(_toks(t)) for i, t in CORPUS}
    avgdl = sum(dls.values()) / len(CORPUS)
    n = len(CORPUS)
    scores = {}
    for i, text in CORPUS:
        s = 0.0
        tf_doc = {}
        for w in _toks(text):
            tf_doc[w] = tf_doc.get(w, 0) + 1
        for w in set(terms):
            tf = tf_doc.get(w, 0)
            if tf == 0:
                continue
            idf = math.log(1 + (n - _DF[w] + 0.5) / (_DF[w] + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dls[i] / avgdl))
        if s > 0:
            scores[i] = s
    top = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
    return [d for d, _ in top]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(i, f"doc{i}", text) for i, text in CORPUS],
        "doc_id long, url string, text string")
    d = str(tmp_path_factory.mktemp("mlt_idx"))
    build_index(spark, df, d, id_col="doc_id", url_col="url",
                segment_docs=3)
    return SearchIndex(spark, d)


# ------------------------------------------------------------- suggest ---

@pytest.mark.parametrize("term,edits", [
    ("tabel", 2), ("teble", 1), ("test", 1), ("test", 2),
    ("ten", 2), ("zzz", 2), ("cable", 2),
])
def test_suggest_matches_brute_force(idx, term, edits):
    assert idx.suggest(term, k=10, max_edits=edits) == \
        _brute_suggest(term, k=10, max_edits=edits)


def test_suggest_excludes_exact_term(idx):
    got = [t for t, _, _ in idx.suggest("table", k=10, max_edits=2)]
    assert "table" not in got and "cable" in got and "fable" in got


def test_suggest_ranks_distance_then_df(idx):
    # 'tes' → 'test'(d1,df3) then 'ten'(d1,df3)... check full ordering
    got = idx.suggest("tes", k=10, max_edits=2)
    assert got == _brute_suggest("tes", k=10, max_edits=2)
    dists = [d for _, d, _ in got]
    assert dists == sorted(dists)


def test_suggest_prefix_len(idx):
    got = idx.suggest("teble", k=10, max_edits=2, prefix_len=2)
    assert got == _brute_suggest("teble", k=10, max_edits=2, prefix_len=2)
    assert all(t.startswith("te") for t, _, _ in got)


def test_suggest_k_truncates(idx):
    full = idx.suggest("tes", k=10, max_edits=2)
    assert idx.suggest("tes", k=2, max_edits=2) == full[:2]


def test_suggest_validates(idx):
    with pytest.raises(ValueError):
        idx.suggest("table", max_edits=3)
    assert idx.suggest("", max_edits=1) == []
    assert idx.suggest("not a token", max_edits=1) == []
    assert idx.suggest("table", k=0) == []


def test_suggest_warm_path_agrees(idx):
    cold = {t: idx.suggest(t, k=10, max_edits=2)
            for t in ["tabel", "tes", "ten", "zzz"]}
    idx.preload()
    try:
        for t, want in cold.items():
            assert idx.suggest(t, k=10, max_edits=2) == want
    finally:
        idx._cache_pdf = None
        idx._cache_pos = None
        idx._term_cache.clear()
        idx._cache_complete = False


# ------------------------------------------------------ more-like-this ---

def test_mlt_terms_matches_brute_force(idx):
    text = "the table test harness holds ten tests"
    assert idx.mlt_terms(text) == _brute_mlt_terms(text)
    assert idx.mlt_terms(text, max_query_terms=3) == \
        _brute_mlt_terms(text, max_query_terms=3)


def test_mlt_terms_min_tf_min_df(idx):
    text = "table table cable zzunknown the"
    # min_tf=2 keeps only 'table' (tf 2); zzunknown has df 0 → dropped
    assert idx.mlt_terms(text, min_tf=2) == ["table"]
    # min_df=3 keeps terms in ≥3 docs only
    assert idx.mlt_terms(text, min_df=3) == \
        _brute_mlt_terms(text, min_df=3)


def test_mlt_terms_empty(idx):
    assert idx.mlt_terms("") == []
    assert idx.mlt_terms("zzunknown qqmissing") == []


@pytest.mark.parametrize("distributed", [False, True])
def test_more_like_this_matches_brute_force(idx, distributed):
    text = "the table test harness holds ten tests"
    terms = _brute_mlt_terms(text)
    want = _brute_bm25_topk(terms, 5)
    got = idx.more_like_this(text, k=5, distributed=distributed)
    assert [d for d, _ in got] == want
    assert all(s > 0 for _, s in got)


def test_more_like_this_exclude_doc(idx):
    text = CORPUS[0][1]  # doc 0's own text → doc 0 ranks first
    base = idx.more_like_this(text, k=3)
    assert base[0][0] == 0
    got = idx.more_like_this(text, k=3, exclude_doc=0)
    assert 0 not in [d for d, _ in got]
    # the rest of the ranking is the untouched tail of top-(k+1)
    assert [d for d, _ in got] == [d for d, _ in
                                   idx.more_like_this(text, k=4)[1:]]


def test_more_like_this_empty(idx):
    assert idx.more_like_this("zzunknown qqmissing") == []
    assert idx.more_like_this("table", k=0) == []
