"""Query-string parser: grammar → clause dispatch → composition, checked
against brute-force tokenization and the single-surface results it
composes."""

import re

import pytest

from pysearchlite_spark.engine import SearchIndex
from pysearchlite_spark.fields import build_multi_field
from pysearchlite_spark.plans.builder import build_index
from pysearchlite_spark.query_parser import Clause, parse


def _toks(text):
    return [t.lower() for t in re.findall(r"[a-zA-Z0-9]+", text)]


CORPUS = [
    (0, "the big table holds a small table"),
    (1, "a big test of the slow scan harness"),
    (2, "small scan of a big table"),
    (3, "big TABLE again; merge later"),
    (4, "tensor tables ten; big trailer taste"),
    (5, "completely different words"),
    (6, "table big reversed order here"),
]


# ------------------------------------------------------------ grammar ---

def test_parse_clause_kinds():
    pq = parse('big table "big table" "big table"~2 -merge tab* te?t '
               '/s(mall|low)/ -"slow scan"')
    kinds = [(c.kind, c.text, c.slop) for c in pq.must]
    assert kinds == [("term", "big", 0), ("term", "table", 0),
                     ("phrase", "big table", 0), ("near", "big table", 2),
                     ("wild", "tab*", 0), ("wild", "te?t", 0),
                     ("regex", "s(mall|low)", 0)]
    assert [(c.kind, c.text) for c in pq.must_not] == [
        ("term", "merge"), ("phrase", "slow scan")]


def test_parse_fields_and_errors():
    pq = parse('title:big body:"slow scan" -title:merge')
    assert pq.must[0].field == "title"
    assert pq.must[1] == Clause("phrase", "slow scan", False, "body", 0)
    assert pq.must_not[0].field == "title"
    # single-word quote is a plain term clause
    assert parse('"big"').must[0].kind == "term"
    for bad in ("", "-merge", '"unterminated', '""',
                '"big table"~x',   # non-numeric slop must not re-parse
                '"big table"~',    # dangling slop marker
                'big"table"',      # clause not ended at whitespace
                "& &"):            # nothing indexable survives analysis
        with pytest.raises(ValueError):
            parse(bad)


def test_parse_drops_unindexable_clauses_like_an_analyzer():
    """Bare punctuation vanishes at analysis time (Lucene StandardAnalyzer
    behavior, and what the plain surfaces' tokenizer does) — it must not
    silently empty the query."""
    pq = parse("big & fast -~")
    assert [c.text for c in pq.must] == ["big", "fast"]
    assert pq.must_not == []


# --------------------------------------------------------- evaluation ---

@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(i, f"doc{i}", text) for i, text in CORPUS],
        "doc_id long, url string, text string")
    d = str(tmp_path_factory.mktemp("qp_idx"))
    build_index(spark, df, d, id_col="doc_id", url_col="url",
                segment_docs=3, with_positions=True)
    return SearchIndex(spark, d)


def _brute(pred):
    return [i for i, text in CORPUS if pred(_toks(text))]


def _has_phrase(toks, words, slop=0):
    n = len(words)
    for i in range(len(toks)):
        if toks[i] != words[0]:
            continue
        j, span = i, 0
        ok = True
        for w in words[1:]:
            nxt = next((p for p in range(j + 1, len(toks))
                        if toks[p] == w), None)
            if nxt is None:
                ok = False
                break
            j = nxt
        if ok and j - i <= n - 1 + slop:
            return True
    return False


CASES = [
    ('big table', lambda t: "big" in t and "table" in t),
    ('"big table"', lambda t: _has_phrase(t, ["big", "table"])),
    ('"big table"~2', lambda t: _has_phrase(t, ["big", "table"], 2)),
    ('big -merge', lambda t: "big" in t and "merge" not in t),
    ('tab* big', lambda t: "big" in t and any(x.startswith("tab")
                                              for x in t)),
    ('/s(mall|low)/ big', lambda t: "big" in t and
     any(x in ("small", "slow") for x in t)),
    ('big -"slow scan"', lambda t: "big" in t and
     not _has_phrase(t, ["slow", "scan"])),
    ('zzmissing big', lambda t: False),
]


@pytest.mark.parametrize("q,pred", CASES)
def test_query_string_matches_brute(idx, q, pred):
    want = _brute(pred)
    assert idx.search_query_ids(q).tolist() == want, q
    assert idx.search_query_ids(q, distributed=True).tolist() == want, q
    got_df = idx.search_query_df(q).orderBy("doc_id")
    assert [r["doc_id"] for r in got_df.collect()] == want, q


def test_punctuation_parity_with_plain_surface(idx):
    assert (idx.search_query_ids("big & table").tolist()
            == idx.search_and_ids("big & table").tolist())


def test_query_string_composition_equals_surfaces(idx):
    assert (idx.search_query_ids("big table").tolist()
            == idx.search_and_ids("big table").tolist())
    assert (idx.search_query_ids('"big table"').tolist()
            == idx.search_phrase_ids("big table").tolist())
    assert (idx.search_query_ids("big -merge").tolist()
            == idx.search_and_not_ids("big", "merge").tolist())


def test_topk_query_ranks_inside_the_match_set(idx):
    """Scores come from the term clauses only; candidates are the full
    boolean set — so the result equals filtered-topk over evaluate()."""
    q = 'big -merge "big table"'
    ids = set(idx.search_query_ids(q).tolist())
    full = idx.topk("big", k=idx.n_docs + 5, use_blockmax=False)
    want = [(d, s) for d, s in full if d in ids][:10]
    assert idx.topk_query(q, k=10) == want
    assert idx.topk_query(q, k=10, distributed=True) == want
    assert idx.topk_query("zzmissing big") == []
    with pytest.raises(ValueError):
        idx.topk_query('"big table" -merge')  # no scoring term clause


def test_fielded_clause_requires_multi_field(idx):
    with pytest.raises(ValueError):
        idx.search_query_ids("title:big")


def test_query_string_over_fields(spark, tmp_path_factory):
    rows = [(i, f"doc{i}", " ".join(_toks(text)[:3]), text)
            for i, text in CORPUS]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, head string, body string")
    root = str(tmp_path_factory.mktemp("qp_mf"))
    mfi = build_multi_field(spark, df, root,
                            fields={"head": "head", "body": "body"},
                            id_col="doc_id", url_col="url",
                            segment_docs=3)
    want = [i for i, text in CORPUS
            if "big" in _toks(text)[:3] and "table" in _toks(text)
            and "merge" not in _toks(text)]
    got = mfi.search_query_ids("head:big body:table -body:merge")
    assert got.tolist() == want
    out = mfi.search_query_df("head:big body:table -body:merge")
    assert sorted(r["doc_id"] for r in out.collect()) == want
    # plain clause on a multi-field index is ambiguous → loud error
    with pytest.raises(ValueError):
        mfi.search_query_ids("big")


# ---------------------------------------------------------------- fuzzing --

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=500, deadline=None)
@given(st.text(
    alphabet=st.sampled_from(list(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
        " \t\"()-^~:*?.!@#$%&[]{}|\\/+=<>,;'`_\n")),
    max_size=60))
def test_parse_never_crashes(q):
    """The parser's error contract: any input either parses to a
    ParsedQuery with >= 1 clause, or raises ValueError — never any
    other exception (no IndexError/AttributeError/infinite loop on
    adversarial syntax)."""
    from pysearchlite_spark.query_parser import ParsedQuery, parse
    try:
        out = parse(q)
    except ValueError:
        return
    assert isinstance(out, ParsedQuery)
    assert out.must  # parse() guarantees >= 1 non-negated clause


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from(
    ["table", "part", "value", '"table part"', "-merge", "s?a*",
     "part~1", "(table OR row)", "value^2", "title:table"]),
    min_size=1, max_size=6))
def test_parse_grammar_compositions(parts):
    """Any composition of well-formed clause atoms parses, unless it is
    all-negated (a documented ValueError)."""
    from pysearchlite_spark.query_parser import parse
    q = " ".join(parts)
    try:
        out = parse(q)
    except ValueError:
        assert all(p.startswith("-") for p in parts), q
        return
    assert out.must
