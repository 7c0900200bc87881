"""Query-string OR groups `(a OR b)` and boosts `term^2` (Lucene
BooleanQuery of SynonymQuery/BoostQuery clauses): a group matches if ANY
member matches and scores as ONE pseudo-term (member tfs summed before
saturation, idf from the max member df); a boost multiplies the clause's
BM25 contribution and has no boolean effect. Brute-force oracle
reimplements group scoring + boosts from the corpus."""

import math
import random
import re

import pytest

from pysearchlite_spark.engine import SearchIndex
from pysearchlite_spark.plans.builder import build_index
from pysearchlite_spark.query_parser import (evaluate, evaluate_df,
                                             evaluate_topk, parse)

K1, B = 1.2, 0.75


def _toks(text):
    return [t.lower() for t in re.findall(r"[a-zA-Z0-9]+", text)]


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(424)
    vocab = ["fast", "quick", "rapid", "car", "auto", "vehicle",
             "slow"] + [f"w{i}" for i in range(20)]
    return [(i, f"doc{i:03d}",
             " ".join(rng.choices(vocab, k=rng.randint(2, 30))))
            for i in range(200)]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory, corpus):
    df = spark.createDataFrame(
        corpus, "doc_id long, url string, text string")
    d = str(tmp_path_factory.mktemp("grp_idx"))
    build_index(spark, df, d, id_col="doc_id", url_col="url",
                segment_docs=64)
    return SearchIndex(spark, d)


def _brute_group_scores(corpus, groups, boosts, candidates=None):
    """(doc, score) sorted by score desc, doc asc: group tf summed before
    saturation, group idf from max member df, scaled by the boost."""
    n = len(corpus)
    toks = {i: _toks(text) for i, _, text in corpus}
    avgdl = sum(len(t) for t in toks.values()) / n
    df_g = [max(sum(1 for t in toks.values() if m in t) for m in g)
            for g in groups]
    idf = [math.log(1 + (n - d + 0.5) / (d + 0.5)) for d in df_g]
    out = []
    for i in (candidates if candidates is not None else toks):
        dl = len(toks[i])
        score = 0.0
        hit = False
        for gi, g in enumerate(groups):
            tf = sum(toks[i].count(m) for m in g)
            if tf:
                hit = True
                score += boosts[gi] * idf[gi] * tf * (K1 + 1) / (
                    tf + K1 * (1 - B + B * dl / avgdl))
        if hit:
            out.append((i, score))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out


# ------------------------------------------------------------- parsing --

def test_parse_groups_and_boosts():
    pq = parse("(fast OR quick) car^2")
    g, t = pq.must
    assert g.kind == "group" and g.text == "fast quick" and g.boost == 1.0
    assert t.kind == "term" and t.text == "car" and t.boost == 2.0
    assert parse("(a OR b)^1.5").must[0].boost == 1.5
    # bare whitespace separates members too; lowercase 'or' is a term
    assert parse("(a b)").must[0].text == "a b"
    assert parse("(a or b)").must[0].text == "a or b"
    # members dedupe, preserve order
    assert parse("(b OR a OR b)").must[0].text == "b a"
    # negated group
    pq = parse("car -(fast OR quick)")
    assert pq.must_not[0].kind == "group"
    # fielded group
    assert parse("title:(a OR b) x").must[0].field == "title"
    # boost composes with fuzzy
    fz = parse("tabel~1^3").must[0]
    assert fz.kind == "fuzzy" and fz.edits == 1 and fz.boost == 3.0
    # punctuation-only group vanishes analyzer-style
    assert len(parse("(&& ||) car").must) == 1


def test_parse_group_errors():
    with pytest.raises(ValueError):
        parse("(a OR b")          # unterminated
    with pytest.raises(ValueError):
        parse("((a) b)")          # nesting unsupported
    with pytest.raises(ValueError):
        parse("(OR)")             # no indexable member, nothing else


# ------------------------------------------------------------- boolean --

def test_group_boolean_matches_brute(idx, corpus):
    want = [i for i, _, text in corpus
            if ({"fast", "quick"} & set(_toks(text)))
            and "car" in _toks(text)]
    assert len(want) > 5
    got = evaluate(idx, "(fast OR quick) car")
    assert got.tolist() == want
    # boost is score-only: identical boolean result
    assert evaluate(idx, "(fast OR quick)^2 car^3").tolist() == want
    out = evaluate_df(idx, "(fast OR quick) car").orderBy("doc_id")
    assert [r["doc_id"] for r in out.collect()] == want
    # negated group
    want_neg = [i for i, _, text in corpus
                if "car" in _toks(text)
                and not ({"fast", "quick"} & set(_toks(text)))]
    assert evaluate(idx, "car -(fast OR quick)").tolist() == want_neg


# ------------------------------------------------------------- scoring --

def test_group_scoring_matches_brute(idx, corpus):
    groups, boosts = [["fast", "quick"], ["car"]], [1.0, 2.0]
    cand = {i for i, _, text in corpus
            if ({"fast", "quick"} & set(_toks(text)))
            and "car" in _toks(text)}
    want = _brute_group_scores(corpus, groups, boosts, cand)[:10]
    got = evaluate_topk(idx, "(fast OR quick) car^2", k=10)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, s1), (_, s2) in zip(got, want):
        assert abs(s1 - s2) < 1e-9


def test_topk_groups_boost_exact(idx, corpus):
    groups = [["fast", "quick", "rapid"], ["car", "auto", "vehicle"]]
    boosts = [2.0, 0.5]
    want = _brute_group_scores(corpus, groups, boosts)[:10]
    got = idx.topk_groups(groups, k=10, boosts=boosts)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, s1), (_, s2) in zip(got, want):
        assert abs(s1 - s2) < 1e-9
    # distributed path agrees bit-for-bit
    assert idx.topk_groups(groups, k=10, boosts=boosts,
                           distributed=True) == got
    # all-1.0 boosts ≡ no boosts ≡ topk_synonyms
    syn = {"fast": ["quick", "rapid"], "car": ["auto", "vehicle"]}
    base = idx.topk_groups(groups, k=10)
    assert idx.topk_groups(groups, k=10, boosts=[1.0, 1.0]) == base
    assert idx.topk_synonyms("fast car", syn, k=10) == base


def test_topk_groups_validates(idx):
    with pytest.raises(ValueError):
        idx.topk_groups([["a"], ["b"]], boosts=[1.0])
    with pytest.raises(ValueError):
        idx.topk_groups([["a"]], boosts=[-1.0])
    assert idx.topk_groups([], k=10) == []
    assert idx.topk_groups([["fast"], []], k=10) == []


def test_unboosted_term_query_keeps_plain_path(idx):
    # pure-term strings must stay bit-identical to the plain topk path
    assert evaluate_topk(idx, "fast car", k=10) == \
        idx.topk("fast car", k=10, filter_ids=evaluate(idx, "fast car"))


def test_group_query_string_end_to_end(idx, corpus):
    # conjunctive gating: BOTH groups must match; scoring is the summed
    # group disjunction over the candidates — equals topk_synonyms
    # mode='and' over the same groups
    syn = {"fast": ["quick", "rapid"], "car": ["auto", "vehicle"]}
    got = evaluate_topk(
        idx, "(fast OR quick OR rapid) (car OR auto OR vehicle)", k=10)
    want = idx.topk_synonyms("fast car", syn, k=10, mode="and")
    assert got == want
