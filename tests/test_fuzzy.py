"""Fuzzy term queries (Lucene FuzzyQuery, transpositions=false): all
dictionary terms within plain Levenshtein distance ≤ max_edits of the
query term, expanded + OR-unioned like prefix/wildcard. The reference is
exact-term only (do_query.py:9-24). Brute-force oracle: reference
tokenizer + a pure-python Levenshtein DP (independent of the engine's
vectorized numpy DP and of Spark's levenshtein())."""

import re

import pytest

from pysearchlite_spark.engine import SearchIndex
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
    (1, "a test of the tabel harness"),          # 'tabel' ~1 of 'table'
    (2, "no relevant words here at all"),
    (3, "TEST in caps and Tea for ten"),
    (4, "tensor tensors ten; unrelated trailer taste"),
    (5, "completely different vocabulary toast cable"),
    (6, "t1 t2 t42 numbered tokens fable"),
]

_DICT = sorted({t for _, text in CORPUS for t in _toks(text)})


def _brute_terms(term, k, prefix_len=0):
    p = term[:prefix_len]
    return sorted(t for t in _DICT
                  if t.startswith(p) and _lev(t, term) <= k)


def _brute_ids(term, k, prefix_len=0):
    want = set(_brute_terms(term, k, prefix_len))
    return [i for i, text in CORPUS if want & set(_toks(text))]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(i, f"doc{i}", text) for i, text in CORPUS],
        "doc_id long, url string, text string")
    d = str(tmp_path_factory.mktemp("fuzzy_idx"))
    build_index(spark, df, d, id_col="doc_id", url_col="url",
                segment_docs=2)
    return SearchIndex(spark, d)


def test_expand_fuzzy_lists_dictionary_terms(idx):
    # table~1: tabel is distance 2 (two substitutions — NO transposition
    # credit), cable/fable are 1
    assert idx.expand_fuzzy("table", 1) == ["cable", "fable", "table"]
    assert idx.expand_fuzzy("table", 2) == _brute_terms("table", 2)
    assert "tabel" in idx.expand_fuzzy("table", 2)
    assert idx.expand_fuzzy("test", 1) == _brute_terms("test", 1)
    # k=0 degenerates to an existence probe
    assert idx.expand_fuzzy("ten", 0) == ["ten"]
    assert idx.expand_fuzzy("tenn", 0) == []
    # far from everything
    assert idx.expand_fuzzy("zzzzzzzz", 2) == []


def test_expand_fuzzy_validates_inputs(idx):
    assert idx.expand_fuzzy("", 2) == []
    assert idx.expand_fuzzy("  ", 1) == []
    assert idx.expand_fuzzy("two words", 1) == []
    assert idx.expand_fuzzy("té", 1) == []
    with pytest.raises(ValueError):
        idx.expand_fuzzy("test", 3)
    with pytest.raises(ValueError):
        idx.expand_fuzzy("test", -1)


def test_expand_fuzzy_case_normalizes(idx):
    assert idx.expand_fuzzy("TABLE", 1) == idx.expand_fuzzy("table", 1)


def test_expand_fuzzy_prefix_len(idx):
    # prefix_len=1 keeps only t-initial candidates
    assert idx.expand_fuzzy("table", 1, prefix_len=1) == \
        _brute_terms("table", 1, prefix_len=1) == ["table"]
    assert idx.expand_fuzzy("test", 2, prefix_len=2) == \
        _brute_terms("test", 2, prefix_len=2)


def test_expand_fuzzy_max_terms_picks_highest_df(idx):
    full = idx.expand_fuzzy("test", 2)
    assert len(full) > 2
    top = idx.expand_fuzzy("test", 2, max_terms=2)
    assert len(top) == 2 and set(top) <= set(full)
    # 'ten' (dist 2: drop s, s→n) appears in docs 0,3,4 → df 3, the max
    # among the expansions; 'test' (dist 0) is df 2 → second
    assert top == ["ten", "test"]


@pytest.mark.parametrize("term,k", [
    ("table", 1), ("table", 2), ("test", 1), ("test", 2),
    ("ten", 1), ("tensor", 1), ("toast", 2), ("zzzz", 2), ("t2", 1),
])
def test_search_fuzzy_matches_brute_force(idx, term, k):
    want = _brute_ids(term, k)
    assert idx.search_fuzzy_ids(term, k).tolist() == want
    assert idx.search_fuzzy_ids(term, k, distributed=True).tolist() == want
    assert idx.count_fuzzy(term, k) == len(want)


def test_search_fuzzy_urls(idx):
    want = [f"doc{i}" for i in _brute_ids("table", 1)]
    assert idx.search_fuzzy("table", 1) == want


def test_query_parser_fuzzy_clause(idx):
    from pysearchlite_spark.query_parser import evaluate, evaluate_df, parse

    pq = parse("tabel~1")
    assert pq.must[0].kind == "fuzzy" and pq.must[0].edits == 1
    assert parse("tabel~").must[0].edits == 2      # bare ~ = Lucene default
    assert parse("tabel~2 -toast").must_not[0].kind == "term"
    with pytest.raises(ValueError):
        parse("tabel~3")

    want = _brute_ids("tabel", 1)
    assert evaluate(idx, "tabel~1").tolist() == want
    got = evaluate_df(idx, "tabel~1").orderBy("doc_id").collect()
    assert [r["doc_id"] for r in got] == want
    # composed: fuzzy gates, term intersects
    both = [i for i in _brute_ids("table", 1)
            if "ten" in _toks(CORPUS[i][1])]
    assert evaluate(idx, "table~1 ten").tolist() == both


def test_fuzzy_cli_roundtrip(idx, spark):
    import io

    from jobs.query import run

    out, err = io.StringIO(), io.StringIO()
    run(spark, idx.cat.root, [
        "FUZZY\ttable~1",
        "FUZZY\ttable",          # bare term → ~2
        "FUZZY_COUNT\ttest~1",
        "FUZZY\tzzzzzzzz~2",
    ], out=out, err=err)
    lines = out.getvalue().splitlines()
    assert lines[0] == " ".join(map(str, _brute_ids("table", 1)))
    assert lines[1] == " ".join(map(str, _brute_ids("table", 2)))
    assert lines[2] == str(len(_brute_ids("test", 1)))
    assert lines[3] == ""


def test_expand_fuzzy_cache_path_agrees(idx):
    cold = {(t, k): idx.expand_fuzzy(t, k)
            for t, k in (("table", 1), ("table", 2), ("test", 1),
                         ("ten", 0), ("zzzz", 2))}
    idx.preload()  # complete dictionary cache → driver-side numpy DP
    for (t, k), want in cold.items():
        assert idx.expand_fuzzy(t, k) == want, (t, k)
