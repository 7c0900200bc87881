"""Text-analysis operators vs pure-Python oracles."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pysearchlite_spark.functions.text import (_langid_series,
                                               doc_fingerprint,
                                               fingerprint_tokens, lang_id,
                                               quality_stats, token_counts)
from pysearchlite_spark.tokenizer import normalized_tokens

DOCS = [
    (0, "the cat and the dog are in the house"),
    (1, "der Hund und die Katze sind nicht hier"),
    (2, "le chat et le chien sont dans la maison"),
    (3, "el perro y el gato no es una casa"),
    (4, "xyzzy plugh"),
    (5, ""),
    (6, "Hello HELLO hello world 123"),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_token_counts(df):
    got = {r["doc_id"]: r["n_tokens"] for r in token_counts(df).collect()}
    for i, t in DOCS:
        assert got[i] == len(normalized_tokens(t)), i


def test_quality_stats(df):
    got = {r["doc_id"]: r for r in quality_stats(df).collect()}
    for i, t in DOCS:
        toks = normalized_tokens(t)
        r = got[i]
        assert r["n_chars"] == len(t)
        assert r["n_tokens"] == len(toks)
        if toks:
            assert r["distinct_ratio"] == pytest.approx(
                round(len(set(toks)) / len(toks), 6))
            assert r["avg_token_len"] == pytest.approx(
                round(sum(map(len, toks)) / len(toks), 6))
        else:
            assert r["distinct_ratio"] == 0.0
        # punct / stopword ratios vs pure-python spec: punctuation =
        # neither Unicode letter/number (category L*/N*) nor ASCII ws
        import unicodedata

        from pysearchlite_spark.functions.text import _STOPWORDS
        n_punct = sum(1 for ch in t
                      if unicodedata.category(ch)[0] not in ("L", "N")
                      and ch not in " \t\n\x0b\f\r")
        assert r["punct_ratio"] == pytest.approx(
            round(n_punct / len(t), 6) if t else 0.0)
        n_stop = sum(1 for x in toks if x in _STOPWORDS["en"])
        assert r["stopword_ratio"] == pytest.approx(
            round(n_stop / len(toks), 6) if toks else 0.0)


def test_quality_ratios_discriminate(spark):
    """The ratios must actually separate clean prose from junk — and clean
    NON-ENGLISH prose must not read as punctuation (umlauts/accents are
    Unicode letters, not punct)."""
    rows = [(0, "the cat sat on the mat and it was a good day for all"),
            (1, "!!! ??? ### $$$ %%% @@@ ^^^ &&& *** ((()))"),
            (2, "zxqj vvkp wmlr ttyn bgfd"),
            (3, "schöne Grüße für müde Bürger")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in quality_stats(df).collect()}
    assert got[0]["stopword_ratio"] > 0.4 > got[2]["stopword_ratio"]
    assert got[1]["punct_ratio"] > 0.5 > got[0]["punct_ratio"]
    assert got[3]["punct_ratio"] == 0.0


def test_lang_id(df):
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(df).collect()}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "fr"
    assert got[3] == "es"
    assert got[4] == "und"
    assert got[5] == "und"


def test_langid_series_matches_udf(df):
    import pandas as pd
    ser = pd.Series([t for _, t in DOCS])
    local = _langid_series(ser).tolist()
    got = [r["lang_pred"] for r in lang_id(df).orderBy("doc_id").collect()]
    assert got == local


def test_fingerprint(df):
    got = {r["doc_id"]: r["fingerprint"]
           for r in doc_fingerprint(df).collect()}
    for i, t in DOCS:
        assert got[i] == fingerprint_tokens(normalized_tokens(t)), i
    # case-insensitivity via tokenizer; order sensitivity of the hash
    assert fingerprint_tokens(["a", "b"]) != fingerprint_tokens(["b", "a"])
    assert got[6] == fingerprint_tokens(
        ["hello", "hello", "hello", "world", "123"])


P61 = (1 << 61) - 1


@settings(max_examples=300, deadline=None)
@given(st.integers(0, P61 - 1), st.integers(0, P61 - 1))
def test_mulmod61_matches_bigint(a, b):
    from pysearchlite_spark.functions.text import _mulmod61
    got = _mulmod61(np.asarray([a], np.uint64), np.asarray([b], np.uint64))
    assert int(got[0]) == (a * b) % P61


@settings(max_examples=300, deadline=None)
@given(st.integers(0, (1 << 64) - 1))
def test_mod61_matches_bigint(x):
    from pysearchlite_spark.functions.text import _mod61
    assert int(_mod61(np.asarray([x], np.uint64))[0]) == x % P61


@settings(max_examples=60, deadline=None)
@given(st.lists(st.sampled_from("abc xy 12 longtoken".split()),
                max_size=40), st.sampled_from(["blake2b", "md5"]))
def test_fingerprint_series_property(tokens, hash_fn):
    """Vectorized batch fingerprint == scalar spec for arbitrary token
    streams under both hash functions."""
    import pandas as pd

    from pysearchlite_spark.functions.text import (_fingerprint_series,
                                                   fingerprint_tokens)
    text = " ".join(tokens)
    # trailing empty row included: a clipped reduceat boundary used to
    # corrupt the LAST non-empty row's fingerprint
    got = _fingerprint_series(pd.Series([text, "", text, ""]),
                              hash_fn).tolist()
    want = fingerprint_tokens(normalized_tokens(text), hash_fn)
    assert got == [want, 0, want, 0]


def test_bpe_token_counts(spark):
    """JVM-side regexp_extract_all == python re.findall on the same
    pattern, incl. contractions, punctuation runs, and whitespace."""
    import re

    from pysearchlite_spark.functions.text import (BPE_PATTERN,
                                                   bpe_token_counts)
    texts = ["it's a test", "hello   world!!", "can't won't 123abc", "",
             "don't  stop-me now... 3.14", "I'll we've they're o'clock",
             "tab\there\nnewline", "'", "a'b'c"]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_token_counts(df).collect()}
    for i, t in enumerate(texts):
        assert got[i] == len(re.findall(BPE_PATTERN, t)), repr(t)


def test_null_text_counts_as_empty_doc(spark):
    """NULL text (common in crawled corpora) must behave as an empty doc
    across ALL per-doc text functions — in particular bpe_token_counts
    must not leak size(NULL)'s -1/NULL while token_counts says 0."""
    from pysearchlite_spark.functions.text import (bpe_token_counts,
                                                   token_counts)
    df = spark.createDataFrame(
        [(1, "hello world"), (2, None), (3, "")], "doc_id long, text string")
    bpe = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_token_counts(df).collect()}
    tok = {r["doc_id"]: r["n_tokens"] for r in token_counts(df).collect()}
    assert bpe == {1: 2, 2: 0, 3: 0}
    assert tok == {1: 2, 2: 0, 3: 0}


def test_repetition_stats_hand_values(spark):
    """Hand-computed Gopher-style repetition fractions, incl. the
    degenerate short-doc / empty cases."""
    from pysearchlite_spark.functions.text import repetition_stats
    df = spark.createDataFrame(
        [(0, "a b a b a b c"),          # top 2-gram 'a b' x3 of 6
         (1, "x y x y x y x y x y"),    # 5-grams: 6 total, 2 distinct
         (2, "one two"),                # no 3-grams / 5-grams
         (3, ""),                       # no tokens at all
         (4, None)],                    # NULL text == empty doc
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[0]["top2gram_frac"] == pytest.approx(0.5)
    assert got[0]["dup5gram_frac"] == pytest.approx(0.0)
    assert got[1]["dup5gram_frac"] == pytest.approx(round(1 - 2 / 6, 6))
    assert got[1]["top2gram_frac"] == pytest.approx(round(5 / 9, 6))
    assert got[2]["top2gram_frac"] == pytest.approx(1.0)
    assert got[2]["top3gram_frac"] == 0.0
    for d in (3, 4):
        assert (got[d]["top2gram_frac"], got[d]["dup5gram_frac"]) == (0.0, 0.0)


def test_repetition_stats_matches_brute(df):
    """Full-column parity vs a Counter-based per-doc oracle on the shared
    multilingual fixture."""
    from collections import Counter

    from pysearchlite_spark.functions.text import repetition_stats
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    for i, t in DOCS:
        toks = normalized_tokens(t)

        def grams(n):
            return [" ".join(toks[j:j + n])
                    for j in range(len(toks) - n + 1)] if len(toks) >= n else []

        for n in (2, 3):
            g = grams(n)
            exp = round(max(Counter(g).values()) / len(g), 6) if g else 0.0
            assert got[i][f"top{n}gram_frac"] == pytest.approx(exp), (i, n)
        g5 = grams(5)
        exp = round(1 - len(set(g5)) / len(g5), 6) if g5 else 0.0
        assert got[i]["dup5gram_frac"] == pytest.approx(exp), i


@settings(max_examples=60, deadline=None)
@given(st.lists(st.lists(st.sampled_from(["a", "b", "c", "dd"]),
                         min_size=0, max_size=30),
                min_size=1, max_size=8))
def test_repetition_frame_property(token_rows):
    """The factorize-chain implementation == a Counter brute force for
    arbitrary small corpora (incl. empty rows, rows shorter than n, and
    batches whose total token count is below a level)."""
    from collections import Counter

    import pandas as pd

    from pysearchlite_spark.functions.text import _repetition_frame
    texts = pd.Series([" ".join(toks) for toks in token_rows])
    got = _repetition_frame(texts, (2, 3), (5,))
    for i, toks in enumerate(token_rows):
        for n in (2, 3):
            g = [" ".join(toks[j:j + n])
                 for j in range(len(toks) - n + 1)] if len(toks) >= n else []
            exp = max(Counter(g).values()) / len(g) if g else 0.0
            assert got[f"top{n}gram_frac"].iloc[i] == pytest.approx(exp)
        g5 = [" ".join(toks[j:j + 5])
              for j in range(len(toks) - 4)] if len(toks) >= 5 else []
        exp = 1 - len(set(g5)) / len(g5) if g5 else 0.0
        assert got["dup5gram_frac"].iloc[i] == pytest.approx(exp)


def test_repetition_frame_unigram_level():
    """top_ns/dup_ns may include 1 (unigram fractions — the old JVM path
    supported it; regression for the factorize-chain rewrite)."""
    import pandas as pd

    from pysearchlite_spark.functions.text import _repetition_frame
    f = _repetition_frame(pd.Series(["a a b", "", "x"]), (1, 2), (1,))
    assert f["top1gram_frac"].round(6).tolist() == [0.666667, 0.0, 1.0]
    assert f["dup1gram_frac"].round(6).tolist() == [0.333333, 0.0, 0.0]
    assert f["top2gram_frac"].round(6).tolist() == [0.5, 0.0, 0.0]
