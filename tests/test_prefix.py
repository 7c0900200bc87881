"""Prefix (term-range) queries — dictionary expansion + OR union.

The reference has no prefix operator (do_query.py:9-24 is exact-term
boolean AND) — this is the standard fulltext wildcard-prefix extension
(Lucene PrefixQuery, with max_terms ≙ maxExpansions). The oracle here is
brute force: tokenize with the reference tokenizer and test startswith.
"""

import re

import numpy as np
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
    (4, "tensor tensors ten; unrelated trailer"),
    (5, "completely different vocabulary"),
]


def _brute_prefix(prefix):
    p = prefix.strip().lower()
    return [i for i, text in CORPUS
            if any(t.startswith(p) for t in _toks(text))]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(i, f"doc{i}", text) for i, text in CORPUS],
        "doc_id long, url string, text string")
    d = str(tmp_path_factory.mktemp("prefix_idx"))
    build_index(spark, df, d, id_col="doc_id", url_col="url",
                segment_docs=2)
    return SearchIndex(spark, d)


def test_expand_prefix_lists_dictionary_terms(idx):
    assert idx.expand_prefix("tes") == ["test", "tested", "testing",
                                        "tests"]
    assert idx.expand_prefix("te") == ["tea", "ten", "tensor", "tensors",
                                       "test", "tested", "testing",
                                       "tests"]
    assert idx.expand_prefix("zzz") == []


def test_expand_prefix_rejects_non_token_prefixes(idx):
    assert idx.expand_prefix("") == []
    assert idx.expand_prefix("  ") == []
    assert idx.expand_prefix("a b") == []
    assert idx.expand_prefix("té") == []


def test_expand_prefix_case_normalizes(idx):
    assert idx.expand_prefix("TES") == idx.expand_prefix("tes")


def test_expand_prefix_max_terms_picks_highest_df(idx):
    # df(test)=2 (docs 1,3) ties df(testing)=2 (docs 0,1); ties break by
    # term, so the cap keeps 'test' first
    top = idx.expand_prefix("tes", max_terms=1)
    assert top == ["test"]
    top2 = idx.expand_prefix("tes", max_terms=2)
    assert top2 == ["test", "testing"]


@pytest.mark.parametrize("prefix", ["tes", "te", "t", "ten", "zzz",
                                    "TABLE", "a"])
def test_search_prefix_matches_brute_force(idx, prefix):
    want = _brute_prefix(prefix)
    got = idx.search_prefix_ids(prefix).tolist()
    assert got == want
    got_d = idx.search_prefix_ids(prefix, distributed=True).tolist()
    assert got_d == want
    assert idx.count_prefix(prefix) == len(want)


def test_search_prefix_urls(idx):
    assert idx.search_prefix("tenso") == ["doc4"]


def test_search_prefix_masks_deleted(spark, tmp_path_factory):
    from pysearchlite_spark.plans.deletes import delete_docs
    df = spark.createDataFrame(
        [(i, f"doc{i}", text) for i, text in CORPUS],
        "doc_id long, url string, text string")
    d = str(tmp_path_factory.mktemp("prefix_del_idx"))
    build_index(spark, df, d, id_col="doc_id", url_col="url",
                segment_docs=2)
    delete_docs(spark, d, [0, 4])
    idx = SearchIndex(spark, d)
    want = [i for i in _brute_prefix("te") if i not in (0, 4)]
    assert idx.search_prefix_ids("te").tolist() == want
    assert idx.search_prefix_ids("te", distributed=True).tolist() == want


def test_expand_prefix_warm_matches_scan(idx, spark, tmp_path_factory):
    # a fully-preloaded handle expands driver-side; results must be
    # identical to the scan path (fresh handle, no cache)
    df = spark.createDataFrame(
        [(i, f"doc{i}", text) for i, text in CORPUS],
        "doc_id long, url string, text string")
    d = str(tmp_path_factory.mktemp("prefix_warm_idx"))
    build_index(spark, df, d, id_col="doc_id", url_col="url",
                segment_docs=2)
    warm = SearchIndex(spark, d)
    warm.preload()
    for p in ("tes", "te", "zzz"):
        assert warm.expand_prefix(p) == idx.expand_prefix(p)
        assert warm.expand_prefix(p, max_terms=2) == \
            idx.expand_prefix(p, max_terms=2)
        assert warm.search_prefix_ids(p).tolist() == \
            idx.search_prefix_ids(p).tolist()


def test_prefix_cli_commands(spark, idx, tmp_path_factory):
    import io
    from jobs.query import run
    out, err = io.StringIO(), io.StringIO()
    run(spark, idx.cat.root, ["PREFIX_COUNT\ttes\n", "PREFIX\tzzz\n",
                               "PREFIX\ttenso\n"], out, err)
    assert out.getvalue().splitlines() == [
        str(len(_brute_prefix("tes"))), "", "4"]
    assert err.getvalue() == ""


def test_search_df_prefix_mode(idx):
    got = sorted(r["doc_id"] for r in
                 idx.search_df("tes", mode="prefix").collect())
    assert got == _brute_prefix("tes")
    assert idx.search_df("zzz", mode="prefix").count() == 0


def test_prefix_cli_max_terms(spark, idx):
    # --prefix-max-terms caps expansion to the N highest-df terms; with
    # N=1 on "tes" the cap keeps only the most frequent term, so the
    # result set can shrink vs the unbounded expansion
    import io
    from jobs.query import run
    out, err = io.StringIO(), io.StringIO()
    run(spark, idx.cat.root, ["PREFIX_COUNT\ttes\n"], out, err,
        prefix_max_terms=1)
    top = idx.expand_prefix("tes", max_terms=1)
    want = idx.count_prefix("tes", max_terms=1)
    assert out.getvalue().splitlines() == [str(want)]
    assert len(top) == 1 and err.getvalue() == ""


def test_large_expansion_uses_broadcast_join(idx, monkeypatch):
    # past IN_LIST_MAX terms the postings scan must switch from a literal
    # In() filter (quadratic to plan) to a broadcast semi-join; force the
    # threshold down and check both the plan shape and the result parity
    from pysearchlite_spark import engine as E
    monkeypatch.setattr(E, "IN_LIST_MAX", 2)
    terms = idx.expand_prefix("te")  # 8 terms > 2
    plan = idx.postings_df(terms)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    got = idx.search_prefix_ids("te").tolist()
    monkeypatch.setattr(E, "IN_LIST_MAX", 10_000)
    assert got == idx.search_prefix_ids("te").tolist() == _brute_prefix("te")
