"""Regex term queries (Lucene RegexpQuery: dictionary expansion + OR)
and the per-term BM25 score explanation surface (Lucene Explanation)."""

import re

import pytest

from pysearchlite_spark.engine import SearchIndex
from pysearchlite_spark.plans.builder import build_index
from pysearchlite_spark.plans.deletes import delete_docs


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


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(i, f"doc{i}", text) for i, text in CORPUS],
        "doc_id long, url string, text string")
    d = str(tmp_path_factory.mktemp("regex_idx"))
    build_index(spark, df, d, id_col="doc_id", url_col="url",
                segment_docs=2)
    return SearchIndex(spark, d)


def _brute(pattern):
    rx = re.compile(pattern)
    return [i for i, text in CORPUS
            if any(rx.fullmatch(t) for t in _toks(text))]


@pytest.mark.parametrize("pattern", [
    "tes.*",            # prefix-reducible
    "t[0-9]+",          # class + quantifier
    "test(s|ing)?",     # group alternation AFTER the literal head
    "tea|toast",        # top-level alternation (prefix must be dropped)
    "te?a",             # quantifier on the literal head's last char
    ".*sors?",          # leading wildcard
    "zzz.*",            # no matches
])
def test_regex_matches_brute_force(idx, pattern):
    want_terms = sorted({t for _, text in CORPUS for t in _toks(text)
                         if re.fullmatch(pattern, t)})
    assert idx.expand_regex(pattern) == want_terms
    want = _brute(pattern)
    assert idx.search_regex_ids(pattern).tolist() == want
    assert idx.search_regex_ids(pattern, distributed=True).tolist() == want
    assert idx.count_regex(pattern) == len(want)


def test_regex_rejects_garbage(idx):
    assert idx.expand_regex("") == []
    assert idx.expand_regex("te[st") == []   # invalid regex → no matches
    assert idx.search_regex_ids("te[st").size == 0
    # Python-valid but Java-invalid: must degrade to no-matches, never
    # crash the rlike scan mid-job
    assert idx.expand_regex("ab{") == []
    assert idx.expand_regex("(?P<x>test)") == []
    assert idx.search_regex_ids("ab{").size == 0


def test_regex_is_not_case_folded(idx):
    """Lowercasing a pattern would invert escape classes (\\D→\\d):
    t\\D+ means t + non-digits and must match word terms, not t1/t42."""
    got = idx.expand_regex(r"t\D+")
    assert "test" in got and "tea" in got
    assert not any(t in got for t in ("t1", "t2", "t42"))
    assert idx.expand_regex(r"t\d+") == ["t1", "t2", "t42"]


def test_regex_max_terms_keeps_highest_df(idx):
    full = idx.expand_regex("te.*")
    assert len(full) > 2
    top = idx.expand_regex("te.*", max_terms=2)
    assert len(top) == 2 and set(top) <= set(full)


def test_explain_matches_topk_score_exactly(idx):
    # 'the ten table' puts all THREE terms in doc 0 — float addition is
    # order-sensitive, so a 3-term doc actually exercises the claim that
    # explain sums in the scorers' accumulation order
    for q in ("test testing ten", "the ten table"):
        assert any(len(idx.explain_score(q, d)["terms"]) >= 3
                   for d, _ in idx.topk(q, k=7)) == (q == "the ten table")
        _check_explain(idx, q)


def _check_explain(idx, q):
    for d, s in idx.topk(q, k=idx.n_docs + 5, use_blockmax=False):
        ex = idx.explain_score(q, d)
        assert ex["score"] == s, d  # bit-identical accumulation
        assert not ex["deleted"]
        toks = _toks(CORPUS[d][1])
        for t, e in ex["terms"].items():
            assert e["tf"] == toks.count(t)
            assert e["dl"] == len(toks)
            assert e["partial"] > 0
        assert ex["score"] == sum(e["partial"] for e in
                                  ex["terms"].values())


def test_explain_edge_cases(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(i, f"doc{i}", text) for i, text in CORPUS],
        "doc_id long, url string, text string")
    d = str(tmp_path_factory.mktemp("explain_del"))
    build_index(spark, df, d, id_col="doc_id", url_col="url",
                segment_docs=2)
    idx = SearchIndex(spark, d)
    # doc without the terms → empty breakdown, zero score
    ex = idx.explain_score("test", 2)
    assert ex["terms"] == {} and ex["score"] == 0.0
    # unknown term contributes nothing
    ex = idx.explain_score("test zzmissing", 1)
    assert set(ex["terms"]) == {"test"}
    # tombstoned doc reports deleted, scores nothing
    delete_docs(spark, d, [1])
    idx = SearchIndex(spark, d)
    ex = idx.explain_score("test", 1)
    assert ex["deleted"] and ex["score"] == 0.0


def test_describe_reports_the_handle_state(spark, tmp_path_factory):
    from pysearchlite_spark.plans.deletes import delete_docs
    df = spark.createDataFrame(
        [(i, f"doc{i}", text) for i, text in CORPUS],
        "doc_id long, url string, text string")
    d = str(tmp_path_factory.mktemp("describe_idx"))
    build_index(spark, df, d, id_col="doc_id", url_col="url",
                segment_docs=2)
    idx = SearchIndex(spark, d)
    desc = idx.describe()
    assert desc["n_docs"] == len(CORPUS)
    assert desc["pending_delete_files"] == 0
    assert not desc["has_positions"]
    assert desc["postings_bytes"] > 0 and desc["docmap_bytes"] > 0
    assert desc["doc_segments"] == desc["posting_segments"]
    delete_docs(spark, d, [0])
    desc2 = SearchIndex(spark, d).describe()
    assert desc2["pending_delete_files"] == 1
    assert desc2["snapshot_id"] != desc["snapshot_id"]
    assert desc2["n_snapshots"] == desc["n_snapshots"] + 1
