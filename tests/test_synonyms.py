"""Query-time synonym expansion: boolean AND over groups (term OR its
synonyms) and Lucene SynonymQuery BM25 scoring (group tf = SUM of member
tfs with saturation applied once; group idf from the MAX member df).
Brute-force oracle reimplements both from the corpus."""

import math
import random
import re

import pytest

from pysearchlite_spark.engine import SearchIndex
from pysearchlite_spark.plans.builder import build_index
from pysearchlite_spark.plans.deletes import delete_docs

K1, B = 1.2, 0.75


def _toks(text):
    return [t.lower() for t in re.findall(r"[a-zA-Z0-9]+", text)]


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(777)
    vocab = ["fast", "quick", "rapid", "car", "auto", "vehicle",
             "slow"] + [f"w{i}" for i in range(20)]
    return [(i, f"doc{i:03d}",
             " ".join(rng.choices(vocab, k=rng.randint(2, 30))))
            for i in range(200)]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory, corpus):
    df = spark.createDataFrame(
        corpus, "doc_id long, url string, text string")
    d = str(tmp_path_factory.mktemp("syn_idx"))
    build_index(spark, df, d, id_col="doc_id", url_col="url",
                segment_docs=64)
    return SearchIndex(spark, d)


SYN = {"fast": ["quick", "rapid"], "car": ["auto", "vehicle"]}
Q = "fast car"
GROUPS = [["fast", "quick", "rapid"], ["car", "auto", "vehicle"]]


def _brute_and(corpus):
    out = []
    for i, _, text in corpus:
        ts = set(_toks(text))
        if all(ts & set(g) for g in GROUPS):
            out.append(i)
    return out


def _brute_scores(corpus, mode="or", min_match=1):
    n = len(corpus)
    toks = {i: _toks(text) for i, _, text in corpus}
    avgdl = sum(len(t) for t in toks.values()) / n
    df_g = [max(sum(1 for t in toks.values() if m in t) for m in g)
            for g in GROUPS]
    idf = [math.log(1 + (n - d + 0.5) / (d + 0.5)) for d in df_g]
    out = []
    for i, _, text in corpus:
        dl = len(toks[i])
        parts, matched = [], 0
        for gi, g in enumerate(GROUPS):
            tf = sum(toks[i].count(m) for m in g)
            if tf:
                matched += 1
                parts.append(idf[gi] * tf * (K1 + 1)
                             / (tf + K1 * (1 - B + B * dl / avgdl)))
        need = len(GROUPS) if mode == "and" else min_match
        if matched >= need and parts:
            out.append((i, sum(parts)))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out


def test_boolean_synonym_and(idx, corpus):
    want = _brute_and(corpus)
    assert len(want) > 5
    assert idx.search_synonym_ids(Q, SYN).tolist() == want
    assert idx.search_synonym_ids(Q, SYN, distributed=True).tolist() == want
    assert idx.count_synonyms(Q, SYN) == len(want)
    # distributed count: per-segment sizes only, no id materialization
    assert idx.count_synonyms(Q, SYN, distributed=True) == len(want)
    # a dead member (df=0) is pruned from the scan but never changes
    # results — the group still matches via its live members
    syn2 = {"fast": ["quick", "rapid", "zzunknown"],
            "car": ["auto", "vehicle"]}
    assert idx.search_synonym_ids(Q, syn2).tolist() == want
    assert (idx.topk_synonyms(Q, syn2, k=10, distributed=True)
            == idx.topk_synonyms(Q, SYN, k=10))
    # plain AND is a strict subset (synonyms only widen each group)
    plain = set(idx.search_and_ids(Q).tolist())
    assert plain <= set(want)
    # a dead group (all members unknown) empties the result
    assert idx.search_synonym_ids("fast zzz", {"zzz": ["yyy"]}).size == 0


@pytest.mark.parametrize("mode", ["or", "and"])
def test_synonym_scoring_matches_brute(idx, corpus, mode):
    want = _brute_scores(corpus, mode=mode)[:10]
    got = idx.topk_synonyms(Q, SYN, k=10, mode=mode)
    assert [d for d, _ in got] == [d for d, _ in want], mode
    for (d1, s1), (_, s2) in zip(got, want):
        assert abs(s1 - s2) < 1e-9
    got_d = idx.topk_synonyms(Q, SYN, k=10, mode=mode, distributed=True)
    assert got == got_d


def test_synonym_min_match(idx, corpus):
    want = _brute_scores(corpus, min_match=2)[:10]
    got = idx.topk_synonyms(Q, SYN, k=10, min_match=2)
    assert [d for d, _ in got] == [d for d, _ in want]


def test_empty_synonyms_equal_plain_topk(idx):
    # singleton groups reduce exactly to ordinary disjunctive BM25
    assert (idx.topk_synonyms(Q, {}, k=10)
            == idx.topk(Q, k=10, use_blockmax=False))
    assert idx.topk_synonyms(Q, {}, k=10) == idx.topk(Q, k=10)


def test_synonym_scoring_is_not_per_member_sum(idx, corpus):
    """The defining SynonymQuery property: tf sums BEFORE saturation, so
    the group score differs from summing per-member scores whenever a doc
    contains two members."""
    both = [i for i, _, text in corpus
            if "fast" in _toks(text) and "quick" in _toks(text)]
    assert both
    d = both[0]
    syn_score = dict(idx.topk_synonyms(
        "fast", {"fast": ["quick", "rapid"]}, k=idx.n_docs + 5))[d]
    per_member = (dict(idx.topk("fast", k=idx.n_docs + 5,
                                use_blockmax=False)).get(d, 0.0)
                  + dict(idx.topk("quick", k=idx.n_docs + 5,
                                  use_blockmax=False)).get(d, 0.0))
    assert syn_score < per_member  # saturation once beats saturation twice


def test_synonyms_respect_deletes_and_filters(spark, tmp_path_factory,
                                              corpus):
    df = spark.createDataFrame(
        corpus, "doc_id long, url string, text string")
    d = str(tmp_path_factory.mktemp("syn_del"))
    build_index(spark, df, d, id_col="doc_id", url_col="url",
                segment_docs=64)
    idx = SearchIndex(spark, d)
    full = idx.topk_synonyms(Q, SYN, k=idx.n_docs + 5)
    victims = [d_ for d_, _ in full[:2]]
    delete_docs(spark, d, victims)
    idx = SearchIndex(spark, d)
    got = idx.topk_synonyms(Q, SYN, k=10)
    survivors = [(d_, s) for d_, s in full if d_ not in set(victims)]
    want = survivors[:10]
    assert got == want
    assert idx.topk_synonyms(Q, SYN, k=10, distributed=True) == want
    # filter composes: even ids only (from the FULL surviving ranking,
    # not post-filtered top-10), scores unchanged
    evens = [(d_, s) for d_, s in survivors if d_ % 2 == 0][:5]
    assert idx.topk_synonyms(Q, SYN, k=len(evens),
                             filter_sql="doc_id % 2 = 0") == evens
