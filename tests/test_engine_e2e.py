"""End-to-end: Spark build → SearchIndex queries == oracle / reference
goldens (mirrors /root/reference/pysearchlite/test_search_engine.py:4-27 and
the random-corpus property layer, SURVEY.md §5)."""

import random

import numpy as np
import pytest

from pysearchlite_spark.datagen import micro_corpus
from pysearchlite_spark.engine import SearchIndex
from pysearchlite_spark.oracle import OracleEngine
from pysearchlite_spark.plans.builder import build_index


def _build(spark, docs, tmpdir, **kw):
    """docs: list[(name, text)]; name order == docID order (ids passed
    explicitly so Spark and oracle agree by construction)."""
    df = spark.createDataFrame(
        [(i, name, text) for i, (name, text) in enumerate(docs)],
        "doc_id long, url string, text string")
    res = build_index(spark, df, str(tmpdir), id_col="doc_id",
                      url_col="url", segment_docs=kw.pop("segment_docs", 100),
                      **kw)
    assert res.snapshot_id >= 1
    return SearchIndex(spark, str(tmpdir))


@pytest.fixture(scope="module")
def micro_idx(spark, tmp_path_factory):
    return _build(spark, micro_corpus(),
                  tmp_path_factory.mktemp("micro_idx"), segment_docs=2)


def test_reference_goldens(micro_idx):
    # exact outputs from test_search_engine.py:12-14,25-27
    assert micro_idx.search("hello") == ["id1"]
    assert micro_idx.search("this test") == ["id2", "id3"]
    assert micro_idx.search("that") == []
    assert micro_idx.count("this test") == 2
    assert micro_idx.count("that") == 0
    assert micro_idx.count("hello") == 1


def test_or_and_topk_vs_oracle_micro(micro_idx):
    oracle = OracleEngine()
    oracle.index_corpus(micro_corpus())
    for q in ["hello", "this test", "that", "hello another", "world test"]:
        assert micro_idx.search_or_ids(q).tolist() == oracle.search_or_ids(q)
        assert micro_idx.search_and_ids(q).tolist() == oracle.search_and_ids(q)
        got = micro_idx.topk(q, k=10)
        want = oracle.topk(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want]
        np.testing.assert_allclose([s for _, s in got],
                                   [s for _, s in want], rtol=1e-9)


@pytest.fixture(scope="module")
def random_corpus():
    rng = random.Random(1234)
    vocab = [f"t{i}" for i in range(50)] + ["the", "of", "hello", "test"]
    docs = [(f"doc{i:04d}",
             " ".join(rng.choices(vocab, k=rng.randint(1, 60))))
            for i in range(300)]
    return docs


@pytest.fixture(scope="module")
def random_idx(spark, tmp_path_factory, random_corpus):
    # segment_docs=64 → multiple segments; exercises cross-segment merge
    return _build(spark, random_corpus,
                  tmp_path_factory.mktemp("rand_idx"), segment_docs=64)


def _oracle_for(corpus):
    e = OracleEngine()
    e.index_corpus(corpus)
    return e


QUERIES = ["the", "the of", "hello test", "t0 t1 t2", "t49 the",
           "missing term", "t10", "the the the", "t3 t1 of the"]


def test_random_corpus_and_or_count(random_idx, random_corpus):
    oracle = _oracle_for(random_corpus)
    for q in QUERIES:
        assert random_idx.search_and_ids(q).tolist() == \
            oracle.search_and_ids(q), q
        assert random_idx.search_or_ids(q).tolist() == \
            oracle.search_or_ids(q), q
        assert random_idx.count(q) == oracle.count(q), q


def test_random_corpus_bm25_rank_identity(random_idx, random_corpus):
    oracle = _oracle_for(random_corpus)
    for q in QUERIES:
        for mode in ("or", "and"):
            got = random_idx.topk(q, k=10, mode=mode)
            want = oracle.topk(q, 10) if mode == "or" else oracle.topk_and(q, 10)
            assert [d for d, _ in got] == [d for d, _ in want], (q, mode)
            np.testing.assert_allclose([s for _, s in got],
                                       [s for _, s in want], rtol=1e-9)


def test_blockmax_equals_exhaustive(random_idx):
    for q in QUERIES:
        a = random_idx.topk(q, k=10, use_blockmax=True)
        b = random_idx.topk(q, k=10, use_blockmax=False)
        assert a == b or (
            [d for d, _ in a] == [d for d, _ in b]
            and np.allclose([s for _, s in a], [s for _, s in b])), q


def test_distributed_paths_match_driver(random_idx):
    for q in ["the of", "hello test", "t10", "missing term"]:
        assert random_idx.search_and_ids(q, distributed=True).tolist() == \
            random_idx.search_and_ids(q).tolist(), q
        assert random_idx.search_or_ids(q, distributed=True).tolist() == \
            random_idx.search_or_ids(q).tolist(), q
        got = random_idx.topk(q, k=10, distributed=True)
        want = random_idx.topk(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q


def test_search_df_lazy_surface(random_idx, random_corpus):
    """search_df: the no-collect result surface must agree with search()
    and the oracle for both modes, including the missing-term short-circuit
    and empty query."""
    oracle = _oracle_for(random_corpus)
    for q in ["the of", "hello test", "missing term"]:
        got = sorted((r["doc_id"], r["url"])
                     for r in random_idx.search_df(q).collect())
        want_ids = oracle.search_and_ids(q)
        want = sorted((i, oracle.doc_names[i]) for i in want_ids)
        assert got == want, q
    got_or = sorted(r["doc_id"] for r in
                    random_idx.search_df("hello test", mode="or").collect())
    assert got_or == oracle.search_or_ids("hello test")
    assert random_idx.search_df("").count() == 0


def test_topk_batch_matches_single_query(random_idx):
    """topk_batch: ONE job for N queries == per-query topk(), both modes,
    including all-missing and empty queries (empty results, aligned)."""
    batch = QUERIES + ["", "zz1 zz2"]
    for mode in ("or", "and"):
        got = random_idx.topk_batch(batch, k=10, mode=mode)
        assert len(got) == len(batch)
        for q, res in zip(batch, got):
            want = random_idx.topk(q, k=10, mode=mode)
            assert [d for d, _ in res] == [d for d, _ in want], (mode, q)
            np.testing.assert_allclose([s for _, s in res],
                                       [s for _, s in want], rtol=1e-9)


def test_topk_batch_with_deletes(spark, tmp_path_factory, random_corpus):
    from pysearchlite_spark.plans.deletes import delete_docs
    d = tmp_path_factory.mktemp("batch_del_idx")
    idx = _build(spark, random_corpus, d, segment_docs=64)
    delete_docs(spark, str(d), list(range(0, 300, 5)))
    idx = SearchIndex(spark, str(d))
    for mode in ("or", "and"):
        got = idx.topk_batch(QUERIES, k=10, mode=mode)
        for q, res in zip(QUERIES, got):
            want = idx.topk(q, k=10, mode=mode)
            assert [d_ for d_, _ in res] == [d_ for d_, _ in want], (mode, q)


def test_preload_merge_not_replace(spark, tmp_path_factory, random_corpus):
    """Regression: a partial preload() after a full preload() must MERGE into
    the cache, not replace it — previously the second preload swapped in a
    partial frame while _cache_complete stayed True, so any term outside it
    silently returned no results."""
    idx = _build(spark, random_corpus,
                 tmp_path_factory.mktemp("preload_merge"), segment_docs=64)
    oracle = _oracle_for(random_corpus)
    idx.preload()                       # full cache
    idx.preload(["hello"])              # partial refresh must not orphan
    for q in ["the of", "t10", "hello test"]:
        assert idx.search_and_ids(q).tolist() == oracle.search_and_ids(q), q
    # repeated partial preloads accumulate warmed terms
    idx2 = _build(spark, random_corpus,
                  tmp_path_factory.mktemp("preload_acc"), segment_docs=64)
    idx2.preload(["the"])
    idx2.preload(["of"])
    assert not idx2._cache_complete
    assert "the" in idx2._cache_pos and "of" in idx2._cache_pos
    assert idx2.search_and_ids("the of").tolist() == \
        oracle.search_and_ids("the of")


def test_reference_query_set_on_zipf_pages(spark, tmp_path_factory):
    """Rank-identity on the 8 reference queries (commands/main.py:17-24)
    over a Zipfian pages corpus with url-sorted docID assignment, html
    extraction path included."""
    from pysearchlite_spark.datagen import generate_pages
    from pysearchlite_spark.extract import extract_text

    pages = generate_pages(spark, 400, seed=7)
    out = tmp_path_factory.mktemp("pages_idx")
    res = build_index(spark, pages, str(out), html_col="html",
                      lang_filter="en", segment_docs=128)
    idx = SearchIndex(spark, str(out))

    # oracle over the SAME docs in url order with extracted text
    rows = (pages.filter("lang = 'en'").select("url", "html").collect())
    from pysearchlite_spark.plans.builder import doc_sort_key
    rows.sort(key=lambda r: doc_sort_key(r["url"]))
    oracle = OracleEngine()
    for r in rows:
        oracle.index(r["url"], extract_text(bytes(r["html"])))
    assert res.n_docs == oracle.n_docs

    ref_queries = ["st petersburg high school", "united states constitution",
                   "search", "los angeles", "the national football league",
                   "the book of life", "care a lot", "usb hub"]
    for q in ref_queries:
        assert idx.search(q) == oracle.search(q), q
        assert idx.count(q) == oracle.count(q), q
        got = idx.topk(q, k=10)
        want = oracle.topk(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        np.testing.assert_allclose([s for _, s in got],
                                   [s for _, s in want], rtol=1e-9)


def test_blockmax_disjoint_term_ranges(spark, tmp_path):
    """Regression: when query terms occupy disjoint docID ranges (e.g. after
    compacting segments that each contained only some terms), the block-max
    zone grid must cover the union of ranges — docs below the largest term's
    first block start were silently skipped."""
    docs = ([(i, f"a{i}", "alpha common") for i in range(50)]
            + [(i + 50, f"b{i}", "beta common") for i in range(50)])
    df = spark.createDataFrame(docs, "doc_id long, url string, text string")
    out = str(tmp_path / "idx")
    build_index(spark, df, out, id_col="doc_id", url_col="url",
                segment_docs=1000)
    idx = SearchIndex(spark, out)
    # 'alpha beta': alpha docs 0-49, beta docs 50-99, all scores tie →
    # tie-break must pick the LOWEST doc ids
    for q in ["alpha beta", "common", "beta alpha common"]:
        got = idx.topk(q, k=5, use_blockmax=True)
        want = idx.topk(q, k=5, use_blockmax=False)
        assert got == want, q
        assert [d for d, _ in got] == sorted(d for d, _ in got), q
    assert [d for d, _ in idx.topk("alpha beta", k=5)] == [0, 1, 2, 3, 4]


def test_blockmax_auto_adaptive(spark, tmp_path_factory):
    """Adaptive auto mode: a selective query (rare high-idf term clustered
    in docID space) must choose the pruned path; a tie-heavy head query must
    choose exhaustive — and all three modes stay rank-identical."""
    from pysearchlite_spark.engine import bm25_idf
    from pysearchlite_spark.operators import wand as W

    n = 20_000
    docs = []
    for i in range(n):
        parts = ["common"] * (1 + i % 3) + [f"filler{i % 7}", "filler"]
        if n // 2 <= i < n // 2 + 60:
            parts.append("rare")
        docs.append((f"u{i:06d}", " ".join(parts)))
    idx = _build(spark, docs, tmp_path_factory.mktemp("bmx_auto"),
                 segment_docs=1 << 20)
    idx.preload()

    def decision(q):
        terms = q.split()
        rows = idx._fetch(terms)
        dfs = idx.global_dfs(rows, terms)
        idfs = {t: bm25_idf(idx.n_docs, d) for t, d in dfs.items() if d > 0}
        return W.decide_blockmax(rows, idfs, 10)

    assert decision("common rare") is True
    assert decision("common filler") is False
    for q in ("common rare", "common filler", "rare"):
        a = idx.topk(q, k=10, use_blockmax="auto")
        e = idx.topk(q, k=10, use_blockmax=False)
        b = idx.topk(q, k=10, use_blockmax=True)
        assert [d for d, _ in a] == [d for d, _ in e] == [d for d, _ in b], q
        np.testing.assert_allclose([s for _, s in a], [s for _, s in e],
                                   rtol=1e-9)


def test_large_result_name_lookup_and_lazy_preload(spark, tmp_path_factory):
    """search() switches to a broadcast join above 10k result ids, and
    preload's lazy row materialization returns the same results as the scan
    path — both over a corpus where one term matches EVERY doc."""
    n = 12_000
    docs = [(f"u{i:06d}", f"common w{i % 7}") for i in range(n)]
    idx = _build(spark, docs, tmp_path_factory.mktemp("big_names"),
                 segment_docs=4096)
    cold = idx.search_and_ids("common")
    assert cold.size == n
    names = idx.search("common")            # join path (> 10k ids)
    assert len(names) == n
    assert names[0] == "u000000" and names[-1] == f"u{n-1:06d}"
    idx.preload()                           # lazy cache
    warm = idx.search_and_ids("common")
    assert np.array_equal(cold, warm)
    assert idx.count("common w3") == len([d for d in docs
                                          if d[1].endswith("w3")])
    assert idx.topk("common", k=5) == idx.topk("common", k=5)


def test_truncate_topk_caps_ties_exactly_k():
    """A tie-heavy segment must contribute O(k) rows, not its whole match
    set: all-equal scores → exactly the k smallest doc_ids survive (the
    global order is score desc, doc_id asc, so nothing beyond a segment's
    own top-k by that order can reach the global top-k)."""
    import numpy as np
    from pysearchlite_spark.engine import _truncate_topk
    docs = np.arange(100_000, dtype=np.int64)
    scores = np.full(docs.size, 3.25)
    d, s = _truncate_topk(docs, scores, 10)
    assert d.size == 10 and np.array_equal(d, np.arange(10))
    # mixed: 5 strictly-better docs + a 50k-way tie at the boundary
    scores2 = scores.copy()
    scores2[50_000:50_005] = 9.0
    d2, _ = _truncate_topk(docs, scores2, 10)
    assert d2.size == 10
    assert set(range(50_000, 50_005)) <= set(d2.tolist())
    assert set(range(5)) <= set(d2.tolist())  # lowest ids win the tie


def test_tie_heavy_corpus_topk_paths_agree(spark, tmp_path):
    """150k-identical-cluster shape in miniature: EVERY doc has the same
    score; driver, distributed, and blockmax paths must return the k
    lowest doc_ids with equal scores."""
    from pysearchlite_spark.plans.builder import build_index
    from pysearchlite_spark.engine import SearchIndex
    n = 600
    docs = spark.createDataFrame(
        [(f"u{i:04d}", "same text every time") for i in range(n)],
        "url string, text string")
    d = str(tmp_path / "tie_idx")
    build_index(spark, docs, d, segment_docs=100)
    idx = SearchIndex(spark, d)
    want = idx.topk("same text", k=7, use_blockmax=False)
    assert [doc for doc, _ in want] == list(range(7))
    assert idx.topk("same text", k=7, use_blockmax=True) == want
    assert idx.topk("same text", k=7, distributed=True) == want
