"""Ordered proximity (NEAR) queries over positional postings.

The reference has no proximity operator (do_query.py:9-24 is boolean
AND) — this is the Lucene SpanNearQuery(inOrder=True) extension of the
positional index: query tokens must occur at strictly increasing
positions spanning ≤ len(terms)-1+slop. The oracle here is brute force
over the reference tokenizer; slop=0 must equal the exact-phrase kernel.
"""

import random
import re

import numpy as np
import pytest

from pysearchlite_spark.engine import SearchIndex
from pysearchlite_spark.operators import phrase as P
from pysearchlite_spark.plans.builder import build_index


def _toks(text):
    return [t.lower() for t in re.findall(r"[a-zA-Z0-9]+", text)]


def _near_matches(toks, terms, slop):
    """Brute-force ordered-proximity check: some strictly increasing
    position chain p1<..<pn with toks[pi]==terms[i] and pn-p1 ≤ n-1+slop.
    Greedy from every start is exact (minimal pn per start)."""
    n = len(terms)
    if n == 0:
        return False
    pos = {t: [i for i, x in enumerate(toks) if x == t]
           for t in set(terms)}
    if any(not pos[t] for t in terms):
        return False
    if n == 1:
        return True
    for p1 in pos[terms[0]]:
        cur = p1
        ok = True
        for t in terms[1:]:
            nxt = [p for p in pos[t] if p > cur]
            if not nxt:
                ok = False
                break
            cur = nxt[0]
        if ok and cur - p1 <= n - 1 + slop:
            return True
    return False


CORPUS = [
    (0, "alpha beta gamma delta epsilon"),
    (1, "alpha x beta y gamma"),
    (2, "beta alpha gamma"),          # out of order for (alpha, beta)
    (3, "alpha x x x beta"),          # gap of 4
    (4, "gamma gamma alpha gamma beta gamma"),
    (5, "nothing relevant here"),
    (6, "alpha beta alpha x x beta"),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(i, f"doc{i}", text) for i, text in CORPUS],
        "doc_id long, url string, text string")
    d = str(tmp_path_factory.mktemp("near_idx"))
    build_index(spark, df, d, id_col="doc_id", url_col="url",
                segment_docs=3, with_positions=True)
    return SearchIndex(spark, d)


QUERIES = [("alpha beta", 0), ("alpha beta", 1), ("alpha beta", 3),
           ("alpha beta", 4), ("beta alpha", 0), ("beta alpha", 1),
           ("alpha gamma", 1), ("alpha beta gamma", 0),
           ("alpha beta gamma", 2), ("gamma gamma", 0),
           ("gamma gamma", 2), ("alpha", 0), ("alpha zz", 5)]


@pytest.mark.parametrize("q,slop", QUERIES)
def test_near_matches_brute_force(idx, q, slop):
    terms = q.split()
    want = [i for i, text in CORPUS
            if _near_matches(_toks(text), terms, slop)]
    assert idx.search_near_ids(q, slop).tolist() == want
    assert idx.search_near_ids(q, slop, distributed=True).tolist() == want
    assert idx.count_near(q, slop) == len(want)
    assert idx.count_near(q, slop, distributed=True) == len(want)


def test_near_slop0_equals_phrase(idx):
    for q in ("alpha beta", "alpha beta gamma", "gamma gamma",
              "beta alpha", "alpha"):
        assert idx.search_near_ids(q, 0).tolist() == \
            idx.search_phrase_ids(q).tolist()


def test_near_slop0_equals_phrase_randomized(spark, tmp_path_factory):
    rng = random.Random(1234)
    vocab = ["a", "b", "c", "d"]
    corpus = [(i, " ".join(rng.choices(vocab, k=rng.randint(3, 30))))
              for i in range(120)]
    df = spark.createDataFrame(
        [(i, f"d{i}", t) for i, t in corpus],
        "doc_id long, url string, text string")
    d = str(tmp_path_factory.mktemp("near_rand_idx"))
    build_index(spark, df, d, id_col="doc_id", url_col="url",
                segment_docs=40, with_positions=True)
    idx = SearchIndex(spark, d)
    for _ in range(25):
        n = rng.randint(2, 4)
        terms = rng.choices(vocab, k=n)
        q = " ".join(terms)
        slop = rng.randint(0, 4)
        want = [i for i, text in corpus
                if _near_matches(_toks(text), terms, slop)]
        assert idx.search_near_ids(q, slop).tolist() == want, (q, slop)
        assert idx.search_near_ids(q, 0).tolist() == \
            idx.search_phrase_ids(q).tolist(), q


def test_near_rejects_negative_slop_and_plain_index(idx, spark,
                                                    tmp_path_factory):
    with pytest.raises(ValueError):
        idx.search_near_ids("alpha beta", -1)
    df = spark.createDataFrame([(0, "u", "alpha beta")],
                               "doc_id long, url string, text string")
    d = str(tmp_path_factory.mktemp("near_plain_idx"))
    build_index(spark, df, d, id_col="doc_id", url_col="url")
    plain = SearchIndex(spark, d)
    with pytest.raises(ValueError):
        plain.search_near_ids("alpha beta", 1)


def test_near_masks_deleted(spark, tmp_path_factory):
    from pysearchlite_spark.plans.deletes import delete_docs
    df = spark.createDataFrame(
        [(i, f"doc{i}", text) for i, text in CORPUS],
        "doc_id long, url string, text string")
    d = str(tmp_path_factory.mktemp("near_del_idx"))
    build_index(spark, df, d, id_col="doc_id", url_col="url",
                segment_docs=3, with_positions=True)
    delete_docs(spark, d, [0, 1])
    idx = SearchIndex(spark, d)
    want = [i for i, text in CORPUS
            if i not in (0, 1) and _near_matches(_toks(text),
                                                 ["alpha", "beta"], 4)]
    assert idx.search_near_ids("alpha beta", 4).tolist() == want
    assert idx.search_near_ids("alpha beta", 4,
                               distributed=True).tolist() == want


def test_search_df_near_mode(idx):
    want = [i for i, text in CORPUS
            if _near_matches(_toks(text), ["alpha", "beta"], 3)]
    got = sorted(r["doc_id"] for r in
                 idx.search_df("alpha beta", mode="near", slop=3).collect())
    assert got == want


def test_near_cli_commands(spark, idx):
    import io
    from jobs.query import run
    out, err = io.StringIO(), io.StringIO()
    run(spark, idx.cat.root, ["NEAR_COUNT\t0 alpha beta\n",
                              "NEAR_COUNT\t4 alpha beta\n",
                              "NEAR\tbogus alpha beta\n",
                              "NEAR\t1 alpha gamma\n"], out, err)
    n0 = len([i for i, t in CORPUS
              if _near_matches(_toks(t), ["alpha", "beta"], 0)])
    n4 = len([i for i, t in CORPUS
              if _near_matches(_toks(t), ["alpha", "beta"], 4)])
    w1 = [i for i, t in CORPUS
          if _near_matches(_toks(t), ["alpha", "gamma"], 1)]
    assert out.getvalue().splitlines() == [
        str(n0), str(n4), "", " ".join(map(str, w1))]
    assert len(err.getvalue().splitlines()) == 1


def test_near_kernel_wide_spans_single_segment(spark, tmp_path):
    # pin the greedy-chain optimality of the REAL kernel on a crafted doc
    # where chain choice matters: for "b a b" the only viable chain is
    # b(1)->a(2)->b(5), span 4 (= n-1+slop at slop 2), while a non-greedy
    # continuation (or one that reuses position 1's b) would mis-span
    toks = ["a", "b", "a", "x", "x", "b"]
    # chain a(0)->b(1): span 1; chain b(1)->a(2)->b(5): span 4
    df = spark.createDataFrame([(0, "d0", " ".join(toks))],
                               "doc_id long, url string, text string")
    d = str(tmp_path / "wide_span_idx")
    build_index(spark, df, d, id_col="doc_id", url_col="url",
                with_positions=True)
    idx = SearchIndex(spark, d)
    for terms, slop, want in ((["a", "b"], 0, True),
                              (["b", "a", "b"], 1, False),
                              (["b", "a", "b"], 2, True)):
        assert _near_matches(toks, terms, slop) is want  # oracle agrees
        got = idx.search_near_ids(" ".join(terms), slop).tolist()
        assert got == ([0] if want else []), (terms, slop)


def test_negative_slop_rejected_on_every_path(idx):
    # validation lives in ONE place (_near_kernel) so the local,
    # distributed, count, and search_df entries agree — a negative slop
    # must raise everywhere, never silently return empty/0
    for call in (lambda: idx.search_near_ids("alpha beta", -1),
                 lambda: idx.search_near_ids("alpha beta", -1,
                                             distributed=True),
                 lambda: idx.count_near("alpha beta", -1),
                 lambda: idx.count_near("alpha beta", -1,
                                        distributed=True),
                 lambda: idx.search_df("alpha beta", mode="near",
                                       slop=-1)):
        with pytest.raises(ValueError, match="slop"):
            call()


# ---------------------------------------------------------------- unordered --

def _unear_matches(toks, terms, slop):
    """Brute-force unordered-proximity check (SpanNearQuery inOrder=False
    over distinct terms): some window [a, a+n-1+slop] holds at least one
    occurrence of every distinct term; anchoring at the minimum of a
    satisfying set shows scanning anchors over all occurrences is exact."""
    distinct = list(dict.fromkeys(terms))
    n = len(distinct)
    if n == 0:
        return False
    pos = {t: [i for i, x in enumerate(toks) if x == t] for t in distinct}
    if any(not pos[t] for t in distinct):
        return False
    if n == 1:
        return True
    w = n - 1 + slop
    anchors = sorted(p for t in distinct for p in pos[t])
    return any(all(any(a <= p <= a + w for p in pos[t]) for t in distinct)
               for a in anchors)


UQUERIES = [("alpha beta", 0), ("beta alpha", 0), ("alpha beta", 1),
            ("beta alpha", 1), ("alpha beta", 3), ("alpha gamma", 1),
            ("alpha beta gamma", 0), ("alpha beta gamma", 2),
            ("gamma beta alpha", 0), ("alpha", 0), ("alpha zz", 5)]


@pytest.mark.parametrize("q,slop", UQUERIES)
def test_unordered_near_brute_force(idx, q, slop):
    terms = q.split()
    want = [i for i, text in CORPUS
            if _unear_matches(_toks(text), terms, slop)]
    got = idx.search_near_ids(q, slop, in_order=False)
    assert got.tolist() == want
    assert idx.search_near_ids(q, slop, distributed=True,
                               in_order=False).tolist() == want
    assert idx.count_near(q, slop, in_order=False) == len(want)
    assert idx.count_near(q, slop, distributed=True,
                          in_order=False) == len(want)


def test_unordered_near_is_symmetric_and_dedups(idx):
    # term order can't matter, and duplicate terms collapse to the set
    for slop in (0, 1, 3):
        ab = idx.search_near_ids("alpha beta", slop, in_order=False)
        ba = idx.search_near_ids("beta alpha", slop, in_order=False)
        aba = idx.search_near_ids("alpha beta alpha", slop, in_order=False)
        assert ab.tolist() == ba.tolist() == aba.tolist()


def test_unordered_near_randomized(spark, tmp_path_factory):
    rng = random.Random(77)
    vocab = ["a", "b", "c", "d"]
    corpus = [(i, " ".join(rng.choices(vocab, k=rng.randint(3, 30))))
              for i in range(120)]
    df = spark.createDataFrame(
        [(i, f"d{i}", t) for i, t in corpus],
        "doc_id long, url string, text string")
    d = str(tmp_path_factory.mktemp("unear_rand_idx"))
    build_index(spark, df, d, id_col="doc_id", url_col="url",
                segment_docs=40, with_positions=True)
    idx2 = SearchIndex(spark, d)
    for _ in range(25):
        terms = rng.sample(vocab, rng.randint(2, 4))  # distinct terms
        q = " ".join(terms)
        slop = rng.randint(0, 4)
        want = [i for i, text in corpus
                if _unear_matches(_toks(text), terms, slop)]
        got = idx2.search_near_ids(q, slop, in_order=False)
        assert got.tolist() == want, (q, slop)
        # every ordered match fits the same window out of order
        ordered = set(idx2.search_near_ids(q, slop).tolist())
        assert ordered <= set(got.tolist()), (q, slop)


def test_unordered_near_search_df_and_cli(spark, idx):
    import io

    from jobs.query import run
    want = [i for i, text in CORPUS
            if _unear_matches(_toks(text), ["beta", "alpha"], 1)]
    got = sorted(r["doc_id"] for r in
                 idx.search_df("beta alpha", mode="near", slop=1,
                               in_order=False).collect())
    assert got == want
    out, err = io.StringIO(), io.StringIO()
    run(spark, idx.cat.root, ["UNEAR\t1 beta alpha\n",
                              "UNEAR_COUNT\t1 beta alpha\n",
                              "UNEAR\tbogus beta alpha\n"], out, err)
    assert out.getvalue().splitlines() == [
        " ".join(map(str, want)), str(len(want)), ""]
    assert len(err.getvalue().splitlines()) == 1
