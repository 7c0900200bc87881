"""Keyword-in-context snippets (SearchIndex.search_snippets).

Oracle: brute-force Python over the reference tokenizer — first hit
position of any query term, ±window token slice.
"""

import re

import pytest

from pysearchlite_spark.engine import SearchIndex
from pysearchlite_spark.plans.builder import build_index


def _toks(text):
    return [t.lower() for t in re.findall(r"[a-zA-Z0-9]+", text)]


CORPUS = [
    (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (1, "x1 x2 x3 x4 x5 x6 x7 alpha x8 beta x9"),
    (2, "beta then much later in this doc comes alpha at the end"),
    (3, "no relevant words in this one at all"),
    (4, "alpha immediately"),
]


def _brute(query_terms, window):
    out = {}
    for i, text in CORPUS:
        ts = _toks(text)
        pos = [ts.index(t) + 1 for t in query_terms if t in ts]
        if len(pos) < len(set(query_terms)):
            continue  # AND semantics
        p = min(pos)
        lo = max(1, p - window)
        out[i] = (p, " ".join(ts[lo - 1:p + window]))
    return out


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(i, f"doc{i}", t) for i, t in CORPUS],
        "doc_id long, url string, text string")
    d = str(tmp_path_factory.mktemp("snip_idx"))
    build_index(spark, df, d, id_col="doc_id", url_col="url",
                segment_docs=2)
    return SearchIndex(spark, d)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([(i, t) for i, t in CORPUS],
                                 "doc_id long, text string")


@pytest.mark.parametrize("q,w", [("alpha beta", 3), ("alpha beta", 1),
                                 ("alpha", 2), ("beta", 5),
                                 ("alpha beta zzmissing", 3)])
def test_snippets_vs_brute_force(idx, docs, q, w):
    got = {r["doc_id"]: (r["first_pos"], r["snippet"])
           for r in idx.search_snippets(q, docs, window=w).collect()}
    assert got == _brute(q.split(), w), (q, w)


def test_snippet_window_clips_at_doc_start(idx, docs):
    got = {r["doc_id"]: r["snippet"]
           for r in idx.search_snippets("alpha", docs, window=4).collect()}
    # doc 0: hit at position 1 — window must clip, not wrap or error
    assert got[0] == "alpha beta gamma delta epsilon"
    assert got[4] == "alpha immediately"


def test_snippets_stay_jvm_side(idx, docs):
    # the highlight stage must be pure JVM expressions — no Python eval
    # nodes in the plan (the per-segment match kernels run upstream in
    # applyInPandas; the snippet projection itself adds none)
    plan = (idx.search_snippets("alpha beta", docs, window=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert plan.count("FlatMapGroupsInPandas") <= 1  # the match kernel only


def test_snippets_empty_query(idx, docs):
    assert idx.search_snippets("", docs).count() == 0


def test_snippet_tokenizer_parity_on_unicode(spark, tmp_path):
    # findall-THEN-lower, like the index tokenizer: lowering first would
    # manufacture an ASCII 'i' out of 'İ' (U+0130 → 'i' + U+0307) and
    # shift every position by one (tokenizer.py documents this pitfall)
    text = "İstanbul alpha beta gamma"
    df = spark.createDataFrame([(0, "d0", text)],
                               "doc_id long, url string, text string")
    d = str(tmp_path / "uni_idx")
    build_index(spark, df, d, id_col="doc_id", url_col="url")
    idx = SearchIndex(spark, d)
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    row = idx.search_snippets("alpha", docs, window=1).collect()[0]
    assert row["first_pos"] == 2  # ['stanbul','alpha',...] — NOT 3
    assert row["snippet"] == "stanbul alpha beta"
