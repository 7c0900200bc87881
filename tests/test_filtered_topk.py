"""Filtered BM25 top-k (the Lucene filter-query shape): an allow-list —
doc_id set, DataFrame, or SQL predicate over the docmap — restricts the
candidates while scores stay corpus-wide (idf/avgdl/n_docs unchanged).
The reference engine has no filter surface (its top-k is the §2.6
north-rule extension); semantics here follow Lucene's BooleanQuery FILTER
clause: applied before top-k truncation, never post-filtering.

Ground truth throughout: exhaustive unfiltered topk(k=n_docs) → keep
allow-list members → truncate, which is the definition of filtered
retrieval under unchanged scoring."""

import random

import pytest

from pysearchlite_spark.engine import SearchIndex
from pysearchlite_spark.plans.builder import build_index
from pysearchlite_spark.plans.compaction import compact_segments
from pysearchlite_spark.plans.deletes import delete_docs


def _build(spark, docs, tmpdir, **kw):
    df = spark.createDataFrame(
        [(i, name, text) for i, (name, text) in enumerate(docs)],
        "doc_id long, url string, text string")
    build_index(spark, df, str(tmpdir), id_col="doc_id", url_col="url",
                segment_docs=kw.pop("segment_docs", 64), **kw)
    return SearchIndex(spark, str(tmpdir))


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(777)
    vocab = [f"t{i}" for i in range(40)] + ["hello", "test", "of"]
    return [(f"doc{i:04d}",
             " ".join(rng.choices(vocab, k=rng.randint(2, 50))))
            for i in range(260)]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory, corpus):
    # segment_docs=64 → 5 segments: the allow-list must route per segment
    return _build(spark, corpus, tmp_path_factory.mktemp("filt_idx"))


def _expected(idx, query, k, allow, mode="or"):
    full = idx.topk(query, k=idx.n_docs + 10, mode=mode, use_blockmax=False)
    aset = set(allow)
    return [(d, s) for d, s in full if d in aset][:k]


QUERIES = ["hello test", "t1 t2 t3", "of", "t39 hello"]


def test_filtered_matches_exhaustive_reference(idx):
    rng = random.Random(42)
    for q in QUERIES:
        for mode in ("or", "and"):
            allow = sorted(rng.sample(range(idx.n_docs), idx.n_docs // 3))
            want = _expected(idx, q, 10, allow, mode=mode)
            got = idx.topk(q, k=10, mode=mode, filter_ids=allow)
            assert got == want, (q, mode)
            # distributed path: identical ranks AND scores
            got_d = idx.topk(q, k=10, mode=mode, filter_ids=allow,
                             distributed=True)
            assert got_d == want, (q, mode)


def test_filter_is_not_post_filtering(idx):
    """A doc OUTSIDE the unfiltered top-k must surface once the filter
    excludes everything above it — the property post-filtering the
    unfiltered top-k would get wrong."""
    q = "hello test"
    k = 5
    full = idx.topk(q, k=idx.n_docs + 10, use_blockmax=False)
    assert len(full) > 2 * k
    top_unfiltered = {d for d, _ in full[:k]}
    allow = [d for d, _ in full if d not in top_unfiltered]
    got = idx.topk(q, k=k, filter_ids=allow)
    assert len(got) == k
    assert not (set(d for d, _ in got) & top_unfiltered)
    assert got == [(d, s) for d, s in full if d not in top_unfiltered][:k]
    # scores are unchanged by the filter (Lucene semantics): the
    # surviving docs carry exactly their unfiltered scores
    by_id = dict(full)
    for d, s in got:
        assert s == by_id[d]


def test_filter_sql_and_dataframe_forms(idx, spark):
    """The three filter spellings agree: iterable of ids, doc_id
    DataFrame, SQL predicate over the docmap."""
    q = "t1 t2 t3"
    allow = [d for d in range(idx.n_docs) if d % 3 == 0]
    want = _expected(idx, q, 10, allow)
    assert idx.topk(q, k=10, filter_ids=allow) == want
    ids_df = spark.createDataFrame([(d,) for d in allow], "doc_id long")
    assert idx.topk(q, k=10, filter_ids=ids_df) == want
    assert idx.topk(q, k=10, filter_sql="doc_id % 3 = 0") == want
    # predicate over a non-id docmap column (doc_len)
    lens = {r["doc_id"]: r["doc_len"]
            for r in idx.docmap_df().select("doc_id", "doc_len").collect()}
    long_docs = [d for d, n in lens.items() if n >= 25]
    assert (idx.topk(q, k=10, filter_sql="doc_len >= 25")
            == _expected(idx, q, 10, long_docs))


def test_filter_edge_cases(idx):
    q = "hello test"
    assert idx.topk(q, k=10, filter_ids=[]) == []
    assert idx.topk(q, k=10, filter_ids=[], distributed=True) == []
    # unknown ids are ignored (validated against the live docmap)
    ghost = [idx.n_docs + 1000, idx.n_docs + 2000]
    assert idx.topk(q, k=10, filter_ids=ghost) == []
    one = [d for d, _ in idx.topk(q, k=3)][-1]
    got = idx.topk(q, k=10, filter_ids=[one, ghost[0]])
    assert [d for d, _ in got] == [one]
    # allow-everything == unfiltered (including blockmax-auto parity:
    # the filtered path forces exhaustive scoring, ranks must not move)
    assert (idx.topk(q, k=10, filter_ids=range(idx.n_docs))
            == idx.topk(q, k=10))


def test_filter_batch_shares_one_job(idx):
    allow = [d for d in range(idx.n_docs) if d % 2 == 1]
    got = idx.topk_batch(QUERIES, k=7, filter_ids=allow)
    for q, res in zip(QUERIES, got):
        assert res == _expected(idx, q, 7, allow), q


def test_filter_respects_tombstones(spark, tmp_path_factory, corpus):
    """An allow-list can never resurrect a deleted doc, and deletes keep
    masking inside filtered scoring on both paths."""
    idx = _build(spark, corpus, tmp_path_factory.mktemp("filt_del"))
    q = "hello test"
    full = idx.topk(q, k=idx.n_docs + 10, use_blockmax=False)
    victims = [d for d, _ in full[:2]]
    delete_docs(spark, idx.cat.root, victims)
    idx = SearchIndex(spark, idx.cat.root)
    allow = [d for d, _ in full[:20]]  # includes the victims
    want = [(d, s) for d, s in full if d in set(allow) - set(victims)][:10]
    assert idx.topk(q, k=10, filter_ids=allow) == want
    assert idx.topk(q, k=10, filter_ids=allow, distributed=True) == want
    assert idx.topk(q, k=10, filter_ids=victims) == []


def test_filter_routing_survives_compaction(spark, tmp_path_factory, corpus):
    """After compaction the docmap's doc segments diverge from the posting
    segments; the allow-list must follow the snapshot's pseg_of map (the
    same routing delete files use) or every filtered query silently drops
    to empty."""
    idx = _build(spark, corpus, tmp_path_factory.mktemp("filt_comp"),
                 segment_docs=32)
    q = "t1 t2 t3"
    allow = [d for d in range(idx.n_docs) if d % 4 == 0]
    want = _expected(idx, q, 10, allow)
    assert len(want) == 10
    compact_segments(spark, idx.cat.root, group_size=4)
    idx2 = SearchIndex(spark, idx.cat.root)
    assert idx2.stats.get("pseg_of")  # the divergence actually happened
    assert idx2.topk(q, k=10, filter_ids=allow) == want
    assert idx2.topk(q, k=10, filter_ids=allow, distributed=True) == want


def test_filtered_search_count_ids(idx):
    """Boolean surfaces accept the same filter (AND ids restricted to the
    allow-list)."""
    q = "t1 t2"
    ids = idx.search_and_ids(q)
    assert ids.size > 4
    allow = ids[::2].tolist()
    got = idx.search_and_ids(q, filter_ids=allow)
    assert got.tolist() == sorted(allow)
    got_d = idx.search_and_ids(q, distributed=True, filter_ids=allow)
    assert got_d.tolist() == sorted(allow)
    assert idx.count(q, filter_ids=allow) == len(allow)
    assert idx.count(q, distributed=True, filter_ids=allow) == len(allow)


# ----------------------------------------------------- FilterHandle -------

def test_filter_handle_matches_raw_paths(idx, spark):
    """prepare_filter() results are identical to passing raw ids/SQL on
    every surface (ranked, boolean, count, batch, distributed)."""
    q = "t1 t2 t3"
    allow = [d for d in range(idx.n_docs) if d % 3 == 0]
    h = idx.prepare_filter(filter_ids=allow)
    want = idx.topk(q, k=10, filter_ids=allow)
    assert idx.topk(q, k=10, filter_ids=h) == want
    assert idx.topk(q, k=10, filter_ids=h, distributed=True) == want
    assert (idx.search_and_ids("t1 t2", filter_ids=h).tolist()
            == idx.search_and_ids("t1 t2", filter_ids=allow).tolist())
    assert (idx.count("t1 t2", filter_ids=h)
            == idx.count("t1 t2", filter_ids=allow))
    assert (idx.topk_batch(QUERIES, k=7, filter_ids=h)
            == idx.topk_batch(QUERIES, k=7, filter_ids=allow))

    h_sql = idx.prepare_filter(filter_sql="doc_id % 3 = 0")
    assert idx.topk(q, k=10, filter_ids=h_sql) == want
    h_sql.release()
    # handle is still usable after release (driver caches survive;
    # the distributed frame just re-resolves if asked again)
    assert idx.topk(q, k=10, filter_ids=h_sql) == want


def test_filter_handle_resolves_once(idx):
    """The second query through a handle must not re-run the allow-list
    resolution job: by_seg is computed once and cached."""
    allow = [d for d in range(idx.n_docs) if d % 2 == 0]
    h = idx.prepare_filter(filter_ids=allow)
    first = h.by_seg()
    assert h.by_seg() is first  # cached, no re-resolution
    idx.topk("hello test", k=5, filter_ids=h)
    assert h.by_seg() is first
    # flat derives from by_seg without another Spark job
    flat = h.flat()
    assert flat.tolist() == sorted(allow)
    assert h.flat() is flat


def test_filter_handle_validation(idx, spark, tmp_path_factory, corpus):
    import pytest as _pytest
    with _pytest.raises(ValueError):
        idx.prepare_filter()
    with _pytest.raises(ValueError):
        idx.prepare_filter(filter_ids=[1], filter_sql="doc_id = 1")
    with _pytest.raises(TypeError):
        idx.prepare_filter(filter_ids=idx.prepare_filter(filter_ids=[1]))
    # cross-index use is rejected: a handle is snapshot-bound
    other = _build(spark, corpus,
                   tmp_path_factory.mktemp("filt_other"))
    h = idx.prepare_filter(filter_ids=[1, 2, 3])
    with _pytest.raises(ValueError):
        other.topk("hello", k=5, filter_ids=h)


def test_filter_handle_empty_and_tombstones(spark, tmp_path_factory,
                                            corpus):
    d = tmp_path_factory.mktemp("filt_handle_del")
    idx = _build(spark, corpus, d)
    q = "hello test"
    full = [doc for doc, _ in idx.topk(q, k=20, use_blockmax=False)]
    assert len(full) >= 2
    h_empty = idx.prepare_filter(filter_ids=[])
    assert idx.topk(q, k=10, filter_ids=h_empty) == []
    # deleted docs cannot re-enter through a pre-resolved handle:
    # the handle binds to the post-delete snapshot's SearchIndex
    delete_docs(spark, str(d), [full[0]])
    idx2 = SearchIndex(spark, str(d))
    h = idx2.prepare_filter(filter_ids=full[:4])
    got = [doc for doc, _ in idx2.topk(q, k=10, filter_ids=h)]
    assert full[0] not in got
    assert set(got) == set(full[1:4])


def test_filter_sql_lru_cache(idx):
    """Repeated identical filter_sql through the PLAIN API reuses one
    cached FilterHandle (VERDICT r4 task 8): same results, one resolved
    handle, LRU-bounded eviction releases the persisted frame."""
    idx._filter_lru.clear()
    pred = "doc_len >= 10"
    a = idx.topk("hello test", k=10, filter_sql=pred)
    assert len(idx._filter_lru) == 1
    h1 = idx._filter_lru[pred]
    b = idx.topk("hello test", k=10, filter_sql=pred)
    assert a == b
    assert idx._filter_lru[pred] is h1          # reused, not rebuilt
    # a different spelling is a different cache entry
    idx.count("hello", filter_sql="doc_len >= 11")
    assert len(idx._filter_lru) == 2
    # results equal the explicit-handle path
    h = idx.prepare_filter(filter_sql=pred)
    try:
        assert idx.topk("hello test", k=10, filter_ids=h) == a
    finally:
        h.release()
    # eviction: overflow the LRU and check the oldest handle is dropped
    for i in range(idx._FILTER_LRU_MAX + 1):
        idx.count("hello", filter_sql=f"doc_len >= {i + 20}")
    assert len(idx._filter_lru) == idx._FILTER_LRU_MAX
    assert pred not in idx._filter_lru
    idx._filter_lru.clear()


def test_clear_filter_cache(idx):
    """clear_filter_cache() releases every LRU handle (routed frames
    unpersisted) without touching caller-owned prepare_filter handles,
    and the next plain-API query re-resolves correctly."""
    idx._filter_lru.clear()
    pred = "doc_len >= 10"
    a = idx.topk("hello test", k=10, filter_sql=pred)
    owned = idx.prepare_filter(filter_sql=pred)
    owned_top = idx.topk("hello test", k=10, filter_ids=owned)
    cached = idx._filter_lru[pred]
    cached.routed_df()  # force the persisted frame into existence
    idx.clear_filter_cache()
    assert len(idx._filter_lru) == 0
    assert cached._routed is None  # released, not leaked
    try:
        # caller-owned handle still answers
        assert idx.topk("hello test", k=10, filter_ids=owned) == owned_top
    finally:
        owned.release()
    # cold re-resolution after the clear gives the same answer
    assert idx.topk("hello test", k=10, filter_sql=pred) == a
    idx._filter_lru.clear()


def test_significant_terms_with_cached_filter_sql(idx):
    """significant_terms(filter_sql=...) must not unpersist the LRU
    handle's routed frame; repeated calls stay correct."""
    idx._filter_lru.clear()
    pred = "doc_len >= 25"
    r1 = idx.significant_terms(filter_sql=pred, k=5)
    h = idx._filter_lru[pred]
    r2 = idx.significant_terms(filter_sql=pred, k=5)
    assert r1 == r2 and len(r1) == 5
    assert idx._filter_lru[pred] is h
    idx._filter_lru.clear()
