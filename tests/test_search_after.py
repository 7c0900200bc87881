"""searchAfter pagination: topk(after=(score, doc_id)) returns the next k
results strictly after the cursor in (score desc, doc_id asc) order —
cursor pagination, not OFFSET (Lucene IndexSearcher.searchAfter). Ground
truth: the exhaustive ranking, sliced."""

import random

import pytest

from pysearchlite_spark.engine import SearchIndex
from pysearchlite_spark.plans.builder import build_index


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    rng = random.Random(321)
    vocab = [f"t{i}" for i in range(15)] + ["common"]
    # small vocab + many docs → plenty of exact score TIES across pages,
    # the case a (score-only) cursor would get wrong
    docs = [(i, f"doc{i:04d}",
             " ".join(rng.choices(vocab, k=rng.randint(2, 12))))
            for i in range(300)]
    df = spark.createDataFrame(
        docs, "doc_id long, url string, text string")
    d = str(tmp_path_factory.mktemp("after_idx"))
    build_index(spark, df, d, id_col="doc_id", url_col="url",
                segment_docs=64)
    return SearchIndex(spark, d)


QUERY = "common t1 t2"


def _full(idx, query, mode="or", min_match=1):
    full = idx.topk(query, k=idx.n_docs + 10, mode=mode,
                    use_blockmax=False, min_match=min_match)
    assert len(full) > 30
    return full


def test_pagination_walks_the_exact_ranking(idx):
    for mode in ("or", "and"):
        full = _full(idx, QUERY if mode == "or" else "common t1",
                     mode=mode)
        q = QUERY if mode == "or" else "common t1"
        pages, cursor = [], None
        while True:
            page = idx.topk(q, k=7, mode=mode, after=cursor)
            if not page:
                break
            pages.extend(page)
            cursor = page[-1]
        assert pages == full, mode


def test_pagination_distributed_parity(idx):
    full = _full(idx, QUERY)
    cursor = idx.topk(QUERY, k=5)[-1]
    want = full[5:10]
    assert idx.topk(QUERY, k=5, after=cursor) == want
    assert idx.topk(QUERY, k=5, after=cursor, distributed=True) == want


def test_pagination_tie_boundary(idx):
    """Cut the page exactly inside a run of equal scores: the cursor's
    doc_id tiebreak must resume mid-run without skips or repeats."""
    full = _full(idx, "common")
    scores = [s for _, s in full]
    # find a tie run and a cut position inside it
    cut = next(i for i in range(1, len(scores)) if scores[i] == scores[i-1])
    cursor = full[cut - 1]
    got = idx.topk("common", k=5, after=cursor)
    assert got == full[cut:cut + 5]


def test_pagination_composes_with_filter_and_msm(idx):
    allow = [d for d in range(idx.n_docs) if d % 2 == 0]
    full = idx.topk(QUERY, k=idx.n_docs + 10, use_blockmax=False,
                    filter_ids=allow, min_match=2)
    assert len(full) > 10
    cursor = full[4]
    got = idx.topk(QUERY, k=5, filter_ids=allow, min_match=2, after=cursor)
    assert got == full[5:10]


def test_after_past_the_end_is_empty(idx):
    full = _full(idx, QUERY)
    assert idx.topk(QUERY, k=5, after=full[-1]) == []
    assert idx.topk(QUERY, k=5, after=(10**9, -1.0)) == []


def test_first_page_equals_plain_topk(idx):
    assert idx.topk(QUERY, k=10, after=None) == idx.topk(QUERY, k=10)
