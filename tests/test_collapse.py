"""scores_df (score the whole match set) and search_collapse (field
collapsing — Lucene grouping / ES `collapse`).

The reference engine has no scored retrieval at all (boolean COUNT/TOP_10
protocol, do_query.py:9-24); these extend the BM25 machinery. Ground truth:
scores_df must be bit-identical to the already-oracled topk path at
k ≥ match-set size, and collapse must equal a pandas reimplementation of
best-per-group over those verified scores.
"""

import numpy as np
import pandas as pd
import pytest

from pysearchlite_spark.engine import SearchIndex
from pysearchlite_spark.plans.builder import build_index

CORPUS = [
    # (doc_id, site, text) — crafted so groups span segments and the
    # best doc of a group is NOT always the best doc overall
    (0, "a.com", "spark query engine query"),
    (1, "a.com", "spark query"),
    (2, "b.com", "query engine"),
    (3, "b.com", "spark spark query engine engine"),
    (4, "c.com", "totally unrelated text"),
    (5, "c.com", "spark"),
    (6, "d.com", "engine engine engine"),
    (7, "a.com", "spark query engine"),
    (8, "e.com", "spark query engine spark query engine"),
    (9, "e.com", "query"),
]


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(i, f"doc{i}", s, t) for i, s, t in CORPUS],
        "doc_id long, url string, site string, text string")
    d = str(tmp_path_factory.mktemp("collapse_idx"))
    build_index(spark, df.select("doc_id", "url", "text"), d,
                id_col="doc_id", url_col="url", segment_docs=4)
    return SearchIndex(spark, d), df


def _brute_collapse(scored: pd.DataFrame, docs: pd.DataFrame, k: int):
    """Best doc per site by (score desc, doc_id asc), groups ranked the
    same way — straight off the verified scores."""
    m = scored.merge(docs[["doc_id", "site"]], on="doc_id")
    m = m.sort_values(["score", "doc_id"], ascending=[False, True],
                      kind="stable")
    best = m.groupby("site", sort=False).head(1)
    return best.head(k).reset_index(drop=True)


@pytest.mark.parametrize("q,mode", [("spark query", "or"),
                                    ("spark query", "and"),
                                    ("engine", "or"),
                                    ("query engine spark", "or")])
def test_scores_df_matches_topk(setup, q, mode):
    idx, _ = setup
    got = idx.scores_df(q, mode=mode).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = idx.topk(q, k=10_000, mode=mode, use_blockmax=False)
    want = pd.DataFrame(want, columns=["doc_id", "score"]) \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    # bit-identical scores: same kernel, same accumulation order
    assert np.array_equal(got["score"].to_numpy(),
                          want["score"].to_numpy())


def test_scores_df_empty_and_validation(setup):
    idx, _ = setup
    assert idx.scores_df("zzz missing").count() == 0
    assert idx.scores_df("").count() == 0
    assert idx.scores_df("spark zzz", mode="and").count() == 0
    with pytest.raises(ValueError, match="min_match"):
        idx.scores_df("spark query", mode="and", min_match=2)
    # msm keeps only docs matching >= 2 distinct terms, scores unchanged
    msm = idx.scores_df("spark query", min_match=2).toPandas()
    full = idx.scores_df("spark query").toPandas()
    both = {i for i, _, t in CORPUS if "spark" in t and "query" in t}
    assert set(msm["doc_id"]) == both
    merged = msm.merge(full, on="doc_id", suffixes=("_m", "_f"))
    assert np.array_equal(merged["score_m"].to_numpy(),
                          merged["score_f"].to_numpy())


@pytest.mark.parametrize("q,mode,k", [("spark query", "or", 3),
                                      ("spark query", "or", 100),
                                      ("spark query engine", "and", 2),
                                      ("engine", "or", 2)])
def test_collapse_matches_brute_force(setup, q, mode, k):
    idx, docs = setup
    got = idx.search_collapse(q, docs, "site", k=k, mode=mode).toPandas()
    want = _brute_collapse(idx.scores_df(q, mode=mode).toPandas(),
                           docs.toPandas(), k)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["collapse"].tolist() == want["site"].tolist()
    assert np.array_equal(got["score"].to_numpy(),
                          want["score"].to_numpy())
    # one row per group, ranked by best-member score
    assert got["collapse"].is_unique
    assert (got["score"].to_numpy()[:-1] >=
            got["score"].to_numpy()[1:]).all()


def test_collapse_group_winner_ties_break_by_doc_id(setup, spark,
                                                    tmp_path_factory):
    # identical docs in one group: the LOWEST doc_id must represent it
    rows = [(0, "s1", "alpha beta"), (1, "s1", "alpha beta"),
            (2, "s2", "alpha beta"), (3, "s2", "alpha")]
    df = spark.createDataFrame(
        [(i, f"d{i}", s, t) for i, s, t in rows],
        "doc_id long, url string, site string, text string")
    d = str(tmp_path_factory.mktemp("collapse_tie_idx"))
    build_index(spark, df.select("doc_id", "url", "text"), d,
                id_col="doc_id", url_col="url", segment_docs=2)
    idx = SearchIndex(spark, d)
    got = idx.search_collapse("alpha beta", df, "site", k=5).toPandas()
    assert got["doc_id"].tolist() == [0, 2]
    assert got["collapse"].tolist() == ["s1", "s2"]


def test_collapse_surfaces_docs_below_global_topk(setup):
    # with k=2 the two best docs overall can share a site; collapse must
    # surface the OTHER site's best even though it isn't in the global
    # top-2 — the "not post-filtering" property
    idx, docs = setup
    got = idx.search_collapse("spark query engine", docs, "site",
                              k=2).toPandas()
    assert got["collapse"].is_unique and len(got) == 2


def test_scores_df_masks_deleted(spark, tmp_path_factory):
    from pysearchlite_spark.plans.deletes import delete_docs
    df = spark.createDataFrame(
        [(i, f"doc{i}", s, t) for i, s, t in CORPUS],
        "doc_id long, url string, site string, text string")
    d = str(tmp_path_factory.mktemp("collapse_del_idx"))
    build_index(spark, df.select("doc_id", "url", "text"), d,
                id_col="doc_id", url_col="url", segment_docs=4)
    delete_docs(spark, d, [0, 8])
    idx = SearchIndex(spark, d)
    scored = idx.scores_df("spark query").toPandas()
    assert not ({0, 8} & set(scored["doc_id"]))
    col = idx.search_collapse("spark query", df, "site", k=10).toPandas()
    assert not ({0, 8} & set(col["doc_id"]))
