"""AND-NOT queries and facet counts.

Oracle: brute force over the reference tokenizer. The reference engine is
AND-only (do_query.py:9-24); NOT and facets are the standard boolean /
search-engine extensions over the same postings.
"""

import re

import pytest

from pysearchlite_spark.engine import SearchIndex
from pysearchlite_spark.plans.builder import build_index


def _toks(text):
    return set(t.lower() for t in re.findall(r"[a-zA-Z0-9]+", text))


CORPUS = [
    (0, "alpha beta gamma", "en"),
    (1, "alpha beta noise", "en"),
    (2, "alpha beta", "de"),
    (3, "alpha noise", "de"),
    (4, "beta noise", "en"),
    (5, "alpha beta gamma noise", "fr"),
    (6, "unrelated words only", "en"),
]


def _brute_and_not(inc, exc):
    return [i for i, text, _ in CORPUS
            if all(t in _toks(text) for t in inc)
            and not any(t in _toks(text) for t in exc)]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(i, f"doc{i}", t) for i, t, _ in CORPUS],
        "doc_id long, url string, text string")
    d = str(tmp_path_factory.mktemp("not_idx"))
    build_index(spark, df, d, id_col="doc_id", url_col="url",
                segment_docs=3)
    return SearchIndex(spark, d)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS,
                                 "doc_id long, text string, lang string")


QUERIES = [("alpha beta", "noise"), ("alpha", "beta gamma"),
           ("alpha", "zzmissing"), ("alpha beta", "alpha"),
           ("zzmissing", "noise"), ("alpha beta gamma", "noise")]


@pytest.mark.parametrize("inc,exc", QUERIES)
def test_and_not_vs_brute_force(idx, inc, exc):
    want = _brute_and_not(inc.split(), exc.split())
    assert idx.search_and_not_ids(inc, exc).tolist() == want
    assert idx.search_and_not_ids(inc, exc,
                                  distributed=True).tolist() == want
    assert idx.count_and_not(inc, exc) == len(want)
    assert idx.count_and_not(inc, exc, distributed=True) == len(want)


def test_and_not_empty_exclude_is_and(idx):
    assert idx.search_and_not_ids("alpha beta", "").tolist() == \
        idx.search_and_ids("alpha beta").tolist()


def test_search_df_exclude(idx):
    want = _brute_and_not(["alpha", "beta"], ["noise"])
    got = sorted(r["doc_id"] for r in
                 idx.search_df("alpha beta", exclude="noise").collect())
    assert got == want
    # or-mode exclude: (alpha OR gamma) AND NOT noise
    want_or = [i for i, text, _ in CORPUS
               if ({"alpha", "gamma"} & _toks(text))
               and "noise" not in _toks(text)]
    got_or = sorted(r["doc_id"] for r in
                    idx.search_df("alpha gamma", mode="or",
                                  exclude="noise").collect())
    assert got_or == want_or
    with pytest.raises(ValueError, match="exclude"):
        idx.search_df("alpha beta", mode="phrase", exclude="noise")


def test_and_not_masks_deleted(spark, tmp_path_factory):
    from pysearchlite_spark.plans.deletes import delete_docs
    df = spark.createDataFrame(
        [(i, f"doc{i}", t) for i, t, _ in CORPUS],
        "doc_id long, url string, text string")
    d = str(tmp_path_factory.mktemp("not_del_idx"))
    build_index(spark, df, d, id_col="doc_id", url_col="url",
                segment_docs=3)
    delete_docs(spark, d, [0])
    idx = SearchIndex(spark, d)
    want = [i for i in _brute_and_not(["alpha", "beta"], ["noise"])
            if i != 0]
    assert idx.search_and_not_ids("alpha beta", "noise").tolist() == want
    assert idx.search_and_not_ids(
        "alpha beta", "noise", distributed=True).tolist() == want


def test_facet_counts(idx, docs):
    got = {r["facet"]: r["n"] for r in
           idx.facet_counts("alpha beta", docs, "lang").collect()}
    want = {}
    for i, text, lang in CORPUS:
        if {"alpha", "beta"} <= _toks(text):
            want[lang] = want.get(lang, 0) + 1
    assert got == want
    # with exclusion
    got_x = {r["facet"]: r["n"] for r in
             idx.facet_counts("alpha beta", docs, "lang",
                              exclude="noise").collect()}
    want_x = {}
    for i, text, lang in CORPUS:
        if {"alpha", "beta"} <= _toks(text) and "noise" not in _toks(text):
            want_x[lang] = want_x.get(lang, 0) + 1
    assert got_x == want_x


def test_not_cli_commands(spark, idx):
    import io
    from jobs.query import run
    out, err = io.StringIO(), io.StringIO()
    run(spark, idx.cat.root, ["NOT\talpha beta -- noise\n",
                              "NOT_COUNT\talpha -- beta gamma\n",
                              "NOT\talpha --\n"], out, err)
    w1 = _brute_and_not(["alpha", "beta"], ["noise"])
    n2 = len(_brute_and_not(["alpha"], ["beta", "gamma"]))
    # a payload with no " -- " separator degrades to plain AND
    w3 = _brute_and_not(["alpha"], [])
    assert out.getvalue().splitlines() == [
        " ".join(map(str, w1)), str(n2), " ".join(map(str, w3))]
    assert err.getvalue() == ""
