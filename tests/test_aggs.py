"""Search-result aggregations beyond facet_counts: range facets (ES range
aggregation), collection term statistics (Lucene CollectionStatistics /
TermStatistics: df + totalTermFreq), and significant-terms (ES JLH).
Brute-force pure-python oracles, independent of the engine kernels."""

import re

import pytest

from pysearchlite_spark.engine import SearchIndex
from pysearchlite_spark.plans.builder import build_index


def _toks(text):
    return [t.lower() for t in re.findall(r"[a-zA-Z0-9]+", text)]


CORPUS = [
    (0, "alpha beta gamma alpha delta word"),
    (1, "alpha beta epsilon zeta word word"),
    (2, "beta gamma something else entirely here"),
    (3, "alpha alpha alpha beta unique marker word"),
    (4, "totally unrelated content goes right here"),
    (5, "alpha beta gamma delta epsilon zeta eta theta"),
    (6, "word salad with beta and gamma and more word"),
]
N_CHARS = {i: len(t) for i, t in CORPUS}


def _and_ids(terms):
    return [i for i, t in CORPUS if all(w in _toks(t) for w in terms)]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"doc{i}", text, len(text)) for i, text in CORPUS],
        "doc_id long, url string, text string, n_chars long")


@pytest.fixture(scope="module")
def idx(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("aggs_idx"))
    build_index(spark, docs.select("doc_id", "url", "text"), d,
                id_col="doc_id", url_col="url", segment_docs=3)
    return SearchIndex(spark, d)


# --------------------------------------------------------- facet_range ---

def _brute_range(terms, edges):
    out = {}
    for i in _and_ids(terms):
        v = N_CHARS[i]
        for b in range(len(edges) - 1):
            if edges[b] <= v < edges[b + 1]:
                out[b] = out.get(b, 0) + 1
    return out


def test_facet_range_matches_brute_force(idx, docs):
    edges = [0, 35, 40, 45, 1000]
    got = {r["bin"]: (r["lo"], r["hi"], r["n"]) for r in
           idx.facet_range("alpha beta", docs, "n_chars", edges).collect()}
    want = _brute_range(["alpha", "beta"], edges)
    assert {b: n for b, (_, _, n) in got.items()} == want
    for b, (lo, hi, _) in got.items():
        assert (lo, hi) == (float(edges[b]), float(edges[b + 1]))


def test_facet_range_excludes_out_of_range(idx, docs):
    # nothing below 0 or above the last edge is counted
    rows = idx.facet_range("word", docs, "n_chars", [0, 10]).collect()
    assert rows == []  # every doc is longer than 10 chars


def test_facet_range_validates_edges(idx, docs):
    with pytest.raises(ValueError):
        idx.facet_range("alpha", docs, "n_chars", [10])
    with pytest.raises(ValueError):
        idx.facet_range("alpha", docs, "n_chars", [10, 10])
    with pytest.raises(ValueError):
        idx.facet_range("alpha", docs, "n_chars", [20, 10, 30])


# ---------------------------------------------------------- term_stats ---

def _brute_stats(terms):
    out = []
    for t in sorted(set(terms)):
        df = sum(1 for _, text in CORPUS if t in _toks(text))
        cf = sum(_toks(text).count(t) for _, text in CORPUS)
        if df:
            out.append((t, df, cf))
    return out


@pytest.mark.parametrize("distributed", [False, True])
def test_term_stats_matches_brute_force(idx, distributed):
    terms = ["alpha", "beta", "word", "unique", "zzmissing"]
    assert idx.term_stats(terms, distributed=distributed) == \
        _brute_stats(terms)


def test_term_stats_normalizes_and_dedups(idx):
    assert idx.term_stats(["ALPHA", "alpha", ""]) == _brute_stats(["alpha"])
    assert idx.term_stats([]) == []
    assert idx.term_stats(["not a token"]) == []


def test_term_stats_warm_path_agrees(idx):
    want = idx.term_stats(["alpha", "beta", "word"])
    idx.preload()
    try:
        assert idx.term_stats(["alpha", "beta", "word"]) == want
    finally:
        idx._cache_pdf = None
        idx._cache_pos = None
        idx._term_cache.clear()
        idx._cache_complete = False


# --------------------------------------------------- significant_terms ---

def _brute_significant(fg_ids, k=10, min_fg=1):
    n, fn = len(CORPUS), len(fg_ids)
    df, fdf = {}, {}
    for i, text in CORPUS:
        for t in set(_toks(text)):
            df[t] = df.get(t, 0) + 1
            if i in fg_ids:
                fdf[t] = fdf.get(t, 0) + 1
    out = []
    for t, f in fdf.items():
        if f < min_fg:
            continue
        fgp, bgp = f / fn, df[t] / n
        out.append((t, f, df[t], round((fgp - bgp) * (fgp / bgp), 6)))
    out.sort(key=lambda x: (-x[3], x[0]))
    return out[:k]


def test_significant_terms_matches_brute_force(idx):
    fg = set(_and_ids(["alpha", "beta"]))
    got = idx.significant_terms("alpha beta", k=10)
    assert got == _brute_significant(fg, k=10)
    # alpha has fg% = 1 and the rarest background of the query terms →
    # top JLH; beta (6/7 background docs) ranks LOW despite fg% = 1
    assert got[0][0] == "alpha"
    assert [t for t, _, _, _ in got].index("beta") > 4


def test_significant_terms_k_and_min_fg(idx):
    fg = set(_and_ids(["alpha", "beta"]))
    assert idx.significant_terms("alpha beta", k=3) == \
        _brute_significant(fg, k=3)
    assert idx.significant_terms("alpha beta", k=10, min_fg=2) == \
        _brute_significant(fg, k=10, min_fg=2)


def test_significant_terms_filter_foreground(idx):
    # explicit allow-list foreground (the quality-pass shape)
    fg = [0, 3]
    got = idx.significant_terms(filter_ids=fg, k=10)
    assert got == _brute_significant(set(fg), k=10)


def test_significant_terms_validates(idx):
    with pytest.raises(ValueError):
        idx.significant_terms()  # no foreground
    with pytest.raises(ValueError):
        idx.significant_terms("alpha", filter_ids=[1])  # both
    assert idx.significant_terms("zzmissing") == []
    assert idx.significant_terms("alpha", k=0) == []


# --------------------------------------------------------- search_sorted ---

def _brute_sorted(terms, k, ascending=False):
    rows = [(i, N_CHARS[i]) for i in _and_ids(terms)]
    rows.sort(key=lambda x: (x[1] if ascending else -x[1], x[0]))
    return rows[:k]


def test_search_sorted_matches_brute_force(idx, docs):
    got = [(r["doc_id"], r["n_chars"]) for r in
           idx.search_sorted("alpha beta", by="n_chars", docs=docs,
                             k=3).collect()]
    assert got == [(i, float(v)) for i, v in
                   _brute_sorted(["alpha", "beta"], 3)]


def test_search_sorted_ascending(idx, docs):
    got = [(r["doc_id"], r["n_chars"]) for r in
           idx.search_sorted("alpha beta", by="n_chars", docs=docs, k=2,
                             ascending=True).collect()]
    assert got == [(i, float(v)) for i, v in
                   _brute_sorted(["alpha", "beta"], 2, ascending=True)]


def test_search_sorted_default_docmap_doc_len(idx):
    # by="doc_len" against the index's own docmap — no docs table needed
    want = sorted(((i, len(_toks(t))) for i, t in CORPUS
                   if i in _and_ids(["alpha", "beta"])),
                  key=lambda x: (-x[1], x[0]))[:3]
    got = [(r["doc_id"], r["doc_len"]) for r in
           idx.search_sorted("alpha beta", k=3).collect()]
    assert got == want


def test_significant_terms_broadcast_and_cogroup_paths_agree(idx,
                                                             monkeypatch):
    """The adaptive foreground attachment (broadcast allow-list for small
    foregrounds vs (seg, tb) cogroup for huge ones) must be invisible in
    the results — both paths run the same decode kernel."""
    small = idx.significant_terms("alpha beta", k=10)  # fn << default max
    monkeypatch.setenv("PSL_SIGTERMS_BCAST_MAX", "0")  # force cogroup
    assert idx.significant_terms("alpha beta", k=10) == small
