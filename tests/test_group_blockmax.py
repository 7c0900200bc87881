"""Group-aware block-max pruning (wand.blockmax_topk_groups): the pruned
synonym-group kernel must be rank-identical to the exhaustive group pass.
The group zone bound idf_g · Σ member block maxes is a valid upper bound
because BM25 saturation is concave/subadditive in tf (wand.py) — these
tests enforce the identity on a multi-block Zipf-ish corpus where pruning
genuinely skips zones, plus the auto-probe activation and the distributed
path."""

import random

import pytest

from pysearchlite_spark.engine import SearchIndex
from pysearchlite_spark.plans.builder import build_index


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    # Zipf-ish: "the" nearly everywhere (head), mid-frequency terms,
    # rare synonyms clustered in doc-id ranges so zone bounds vary.
    rng = random.Random(4242)
    rows = []
    for i in range(4000):
        words = ["the"] * rng.randint(1, 4)
        words += rng.choices([f"w{j}" for j in range(50)],
                             k=rng.randint(5, 25))
        # rare synonyms CLUSTERED in narrow docID ranges → their zone
        # bounds concentrate in a few zones and the auto probe can prune
        if 100 <= i < 260 and rng.random() < 0.95:
            words.append("velocity")
        if 2100 <= i < 2260 and rng.random() < 0.95:
            words.append("speed")
        if 1000 <= i < 1160 and rng.random() < 0.9:
            words.append("automobile")
        if 3000 <= i < 3160 and rng.random() < 0.9:
            words.append("motorcar")
        if rng.random() < 0.3:
            words.append("common")
        rng.shuffle(words)
        rows.append((i, f"d{i:05d}", " ".join(words)))
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    d = str(tmp_path_factory.mktemp("gbm_idx"))
    # one big segment → hundreds of skip blocks for the head term
    build_index(spark, df, d, id_col="doc_id", url_col="url",
                segment_docs=4000)
    return SearchIndex(spark, d)


GROUP_CASES = [
    ([["speed", "velocity"], ["automobile", "motorcar"]], None),
    ([["speed", "velocity"], ["the"]], None),
    ([["common"], ["speed", "velocity", "automobile"]], [2.0, 1.0]),
    ([["the", "common"]], None),
    ([["speed"], ["w1"], ["w2", "w3"]], [1.0, 0.5, 3.0]),
]


@pytest.mark.parametrize("groups,boosts", GROUP_CASES)
@pytest.mark.parametrize("k", [3, 10, 50])
def test_pruned_equals_exhaustive(idx, groups, boosts, k):
    pruned = idx.topk_groups(groups, k=k, boosts=boosts,
                             use_blockmax=True)
    exhaust = idx.topk_groups(groups, k=k, boosts=boosts,
                              use_blockmax=False)
    assert pruned == exhaust


def test_auto_probe_prunes_selective_group_query(idx):
    """The metadata probe must actually CHOOSE pruning for a selective
    group query on a multi-block segment (otherwise auto mode silently
    never exercises the kernel) — and the auto result must equal both
    forced paths."""
    from pysearchlite_spark.operators import wand as W

    groups = [["the"], ["speed", "velocity"]]
    terms = [t for g in groups for t in g]
    fetched = idx._fetch(terms)
    dfs = idx.global_dfs(fetched, terms)
    from pysearchlite_spark.engine import bm25_idf
    idfs_g = [bm25_idf(idx.n_docs, max(dfs[t] for t in g)) for g in groups]
    seg_rows = idx._rows_by_seg(fetched)
    (seg, rows), = seg_rows.items()
    by_term = {r["term"]: r for r in rows}
    groups_rows = [[by_term[t] for t in g if t in by_term] for g in groups]
    assert W.decide_blockmax_groups(groups_rows, idfs_g, k=10) is True
    auto = idx.topk_groups(groups, k=10)  # default auto
    assert auto == idx.topk_groups(groups, k=10, use_blockmax=False)


def test_auto_probe_declines_head_term_group(idx):
    """A head-term group (every zone bound comparable) must fall back to
    the exhaustive vector pass, same as the plain-term adaptive rule."""
    from pysearchlite_spark.operators import wand as W
    from pysearchlite_spark.engine import bm25_idf

    groups = [["the", "common"]]
    terms = ["the", "common"]
    fetched = idx._fetch(terms)
    dfs = idx.global_dfs(fetched, terms)
    idfs_g = [bm25_idf(idx.n_docs, max(dfs[t] for t in g)) for g in groups]
    (seg, rows), = idx._rows_by_seg(fetched).items()
    by_term = {r["term"]: r for r in rows}
    groups_rows = [[by_term[t] for t in g if t in by_term] for g in groups]
    assert W.decide_blockmax_groups(groups_rows, idfs_g, k=10) is False


def test_distributed_matches_local_pruned(idx):
    groups = [["speed", "velocity"], ["automobile", "motorcar"]]
    local = idx.topk_groups(groups, k=10, use_blockmax=True)
    dist = idx.topk_groups(groups, k=10, distributed=True)
    assert local == dist


def test_masks_force_exhaustive_but_stay_correct(idx):
    """Filters disable pruning (ghost-heap rule); result identical to the
    exhaustive path restricted to the allow-list."""
    groups = [["speed", "velocity"], ["automobile", "motorcar"]]
    allow = list(range(0, 4000, 2))
    a = idx.topk_groups(groups, k=10, use_blockmax=True, filter_ids=allow)
    b = idx.topk_groups(groups, k=10, use_blockmax=False, filter_ids=allow)
    assert a == b
    assert all(d % 2 == 0 for d, _ in a)


def test_singleton_groups_match_plain_topk(idx):
    """All-singleton groups with unit boosts are plain disjunctive BM25 —
    pruned group scoring must match the plain pruned term path."""
    q = "speed automobile w1"
    groups = [[t] for t in q.split()]
    assert (idx.topk_groups(groups, k=10, use_blockmax=True)
            == idx.topk(q, k=10, use_blockmax=False))
