"""Wildcard term queries (Lucene WildcardQuery): `*` = any [a-z0-9] run
(including empty), `?` = exactly one character; dictionary expansion +
OR union, generalizing the prefix surface. The reference is exact-term
only (do_query.py:9-24). Brute-force oracle: reference tokenizer +
fnmatch-style regex over the tokens."""

import re

import pytest

from pysearchlite_spark.engine import SearchIndex
from pysearchlite_spark.plans.builder import build_index


def _toks(text):
    return [t.lower() for t in re.findall(r"[a-zA-Z0-9]+", text)]


CORPUS = [
    (0, "the testing table holds ten tested tests"),
    (1, "a test of the testing harness"),
    (2, "no relevant words here at all"),
    (3, "TEST in caps and Tea for ten"),
    (4, "tensor tensors ten; unrelated trailer taste"),
    (5, "completely different vocabulary toast"),
    (6, "t1 t2 t42 numbered tokens"),
]


def _rx(pattern):
    p = pattern.strip().lower()
    return re.compile("".join(
        "[a-z0-9]*" if c == "*" else ("[a-z0-9]" if c == "?" else c)
        for c in p))


def _brute(pattern):
    rx = _rx(pattern)
    return [i for i, text in CORPUS
            if any(rx.fullmatch(t) for t in _toks(text))]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(i, f"doc{i}", text) for i, text in CORPUS],
        "doc_id long, url string, text string")
    d = str(tmp_path_factory.mktemp("wild_idx"))
    build_index(spark, df, d, id_col="doc_id", url_col="url",
                segment_docs=2)
    return SearchIndex(spark, d)


def test_expand_wildcard_lists_dictionary_terms(idx):
    assert idx.expand_wildcard("tes*") == ["test", "tested", "testing",
                                           "tests"]
    assert idx.expand_wildcard("t*st") == ["test", "toast"]
    assert idx.expand_wildcard("te?t") == ["test"]
    assert idx.expand_wildcard("t?") == ["t1", "t2"]
    assert idx.expand_wildcard("*ensor*") == ["tensor", "tensors"]
    assert idx.expand_wildcard("zzz*") == []
    # no wildcard → exact-term existence probe
    assert idx.expand_wildcard("ten") == ["ten"]
    assert idx.expand_wildcard("tenn") == []


def test_expand_wildcard_rejects_non_token_patterns(idx):
    assert idx.expand_wildcard("") == []
    assert idx.expand_wildcard("  ") == []
    assert idx.expand_wildcard("a b*") == []
    assert idx.expand_wildcard("té*") == []


def test_expand_wildcard_case_normalizes(idx):
    assert idx.expand_wildcard("TES*") == idx.expand_wildcard("tes*")


def test_expand_wildcard_max_terms_picks_highest_df(idx):
    full = idx.expand_wildcard("t*")
    assert len(full) > 3
    top = idx.expand_wildcard("t*", max_terms=2)
    assert len(top) == 2 and set(top) <= set(full)
    # ten appears in docs 0,3,4 → df 3, the max among t* terms
    assert top[0] == "ten"


@pytest.mark.parametrize("pattern", ["tes*", "t*st", "te?t", "t?",
                                     "*ensor*", "t*", "*1", "zzz*", "ten"])
def test_search_wildcard_matches_brute_force(idx, pattern):
    want = _brute(pattern)
    assert idx.search_wildcard_ids(pattern).tolist() == want
    assert idx.search_wildcard_ids(
        pattern, distributed=True).tolist() == want
    assert idx.count_wildcard(pattern) == len(want)


def test_search_wildcard_urls_and_df(idx):
    want = [f"doc{i}" for i in _brute("tes*")]
    assert idx.search_wildcard("tes*") == want
    out = idx.search_df("tes*", mode="wildcard").orderBy("doc_id")
    assert [r["url"] for r in out.collect()] == want


def test_expand_wildcard_cache_path_agrees(idx):
    cold = {p: idx.expand_wildcard(p)
            for p in ("tes*", "t*st", "te?t", "*ensor*", "ten")}
    idx.preload()  # complete dictionary cache → driver-side expansion
    for p, want in cold.items():
        assert idx.expand_wildcard(p) == want, p
