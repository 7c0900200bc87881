"""MultiFieldIndex — per-field term spaces + cross-field operations.

Ground truth: per-field brute tokenization for boolean; for dismax, the
definition itself over exhaustive per-field BM25 scores (each field's
scores come from the already-oracle-tested single-field topk, so this
test pins the cross-field combination logic)."""

import random
import re

import pytest

from pysearchlite_spark.fields import MultiFieldIndex, build_multi_field


def _toks(text):
    return [t.lower() for t in re.findall(r"[a-zA-Z0-9]+", text)]


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(99)
    vocab = [f"v{i}" for i in range(25)] + ["spark", "index", "search"]
    rows = []
    for i in range(150):
        title = " ".join(rng.choices(vocab, k=rng.randint(1, 4)))
        body = " ".join(rng.choices(vocab, k=rng.randint(5, 60)))
        rows.append((i, f"doc{i:03d}", title, body))
    return rows


@pytest.fixture(scope="module")
def mfi(spark, tmp_path_factory, corpus):
    df = spark.createDataFrame(
        corpus, "doc_id long, url string, title string, body string")
    root = str(tmp_path_factory.mktemp("mf_idx"))
    return build_multi_field(spark, df, root,
                             fields={"title": "title", "body": "body"},
                             id_col="doc_id", url_col="url",
                             segment_docs=64)


def _brute_and(corpus, col, query):
    qs = set(query.split())
    return [r[0] for r in corpus if qs <= set(_toks(r[2 if col == "title"
                                                     else 3]))]


def test_field_scoped_queries_are_independent_term_spaces(mfi, corpus):
    want_t = _brute_and(corpus, "title", "spark")
    want_b = _brute_and(corpus, "body", "spark")
    assert mfi.field("title").search_and_ids("spark").tolist() == want_t
    assert mfi.field("body").search_and_ids("spark").tolist() == want_b
    assert want_t != want_b  # the corpus actually separates the fields
    # df/avgdl are per-field: same term, different idf inputs
    assert (mfi.field("title").global_dfs(
        mfi.field("title")._fetch(["spark"]), ["spark"])["spark"]
        == len(want_t))


def test_cross_field_and(mfi, corpus):
    by = {"title": "spark", "body": "index search"}
    want = sorted(set(_brute_and(corpus, "title", "spark"))
                  & set(_brute_and(corpus, "body", "index search")))
    assert mfi.search_and_ids(by).tolist() == want
    assert mfi.search_and_ids(by, distributed=True).tolist() == want
    assert mfi.count_and(by) == len(want)
    got_df = mfi.search_df(by).orderBy("doc_id")
    assert [r["doc_id"] for r in got_df.collect()] == want
    assert mfi.search_and_ids({"title": "zzmissing", "body": "index"}
                              ).size == 0


def _brute_dismax(mfi, query, weights, tie):
    full = {}
    for f in mfi.fields:
        idx = mfi.field(f)
        w = weights.get(f, 1.0)
        for d, s in idx.topk(query, k=idx.n_docs + 10, use_blockmax=False):
            full.setdefault(d, {})[f] = w * s
    out = []
    for d, ss in full.items():
        vals = sorted(ss.values(), reverse=True)
        out.append((d, vals[0] + tie * sum(vals[1:])))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out


def test_dismax_exact_at_tie_zero(mfi):
    want = _brute_dismax(mfi, "spark index", {}, 0.0)[:10]
    got = mfi.topk_dismax("spark index", k=10)
    assert got == pytest.approx(want)


def test_dismax_weights_and_tiebreaker(mfi):
    w = {"title": 2.5, "body": 1.0}
    for tie in (0.0, 0.3, 1.0):
        want = _brute_dismax(mfi, "spark index search", w, tie)[:10]
        got = mfi.topk_dismax("spark index search", k=10, weights=w,
                              tie_breaker=tie, expand=50)
        assert [d for d, _ in got] == [d for d, _ in want], tie
        for (d1, s1), (d2, s2) in zip(got, want):
            assert abs(s1 - s2) < 1e-9


def test_dismax_empty_and_unknown(mfi):
    assert mfi.topk_dismax("zzmissing") == []
    with pytest.raises(KeyError):
        mfi.field("anchor")


def test_delete_applies_to_every_field(mfi_mutable):
    mfi, corpus = mfi_mutable
    victims = mfi.field("body").search_and_ids("spark")[:2].tolist()
    assert victims
    mfi.delete_docs(victims)
    for f in mfi.fields:
        got = set(mfi.field(f).search_and_ids("spark").tolist())
        assert not (got & set(victims))
    top = mfi.topk_dismax("spark", k=10)
    assert not ({d for d, _ in top} & set(victims))


@pytest.fixture()
def mfi_mutable(spark, tmp_path_factory, corpus):
    df = spark.createDataFrame(
        corpus, "doc_id long, url string, title string, body string")
    root = str(tmp_path_factory.mktemp("mf_del"))
    return (build_multi_field(spark, df, root,
                              fields={"title": "title", "body": "body"},
                              id_col="doc_id", url_col="url",
                              segment_docs=64), corpus)


def test_build_rejects_bad_args(spark, tmp_path_factory, corpus):
    df = spark.createDataFrame(
        corpus, "doc_id long, url string, title string, body string")
    with pytest.raises(ValueError):
        build_multi_field(spark, df, str(tmp_path_factory.mktemp("mf_bad")),
                          fields={}, id_col="doc_id")
    with pytest.raises(ValueError):
        build_multi_field(spark, df, str(tmp_path_factory.mktemp("mf_bad2")),
                          fields={"a": "title"}, id_col="doc_id",
                          text_col="body")
    # id_col is required: per-field builds must agree on docIDs
    with pytest.raises(ValueError):
        build_multi_field(spark, df, str(tmp_path_factory.mktemp("mf_bad3")),
                          fields={"a": "title"}, url_col="url")
    # field names become directories — path separators must be rejected
    with pytest.raises(ValueError):
        build_multi_field(spark, df, str(tmp_path_factory.mktemp("mf_bad4")),
                          fields={"../escape": "title"}, id_col="doc_id")


def test_query_input_validation(mfi):
    with pytest.raises(ValueError):
        mfi.search_and_ids({})
    with pytest.raises(ValueError):
        mfi.search_df({})
    with pytest.raises(KeyError):
        mfi.topk_dismax("spark", weights={"titel": 5.0})


def test_field_expression_columns(spark, tmp_path_factory, corpus):
    """fields values are SQL expressions — a derived field (first-2-token
    head) indexes exactly its derived content."""
    df = spark.createDataFrame(
        corpus, "doc_id long, url string, title string, body string")
    root = str(tmp_path_factory.mktemp("mf_expr"))
    head_expr = ("concat_ws(' ', slice(filter(split(lower(body), "
                 "'[^a-z0-9]+'), x -> x != ''), 1, 2))")
    mfi = build_multi_field(spark, df, root,
                            fields={"head": head_expr, "body": "body"},
                            id_col="doc_id", url_col="url",
                            segment_docs=64)
    want = [r[0] for r in corpus if "spark" in _toks(r[3])[:2]]
    assert mfi.field("head").search_and_ids("spark").tolist() == want
