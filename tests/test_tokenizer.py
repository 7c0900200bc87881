"""Tokenizer parity vs the reference's exact semantics
(/root/reference/pysearchlite/tokenize.py:3-7): `re.findall('[A-Za-z0-9]+')`
then lower each match."""

import re

import pandas as pd
import pytest

from pysearchlite_spark.tokenizer import (normalized_tokens, query_terms,
                                          tokens_series)

_REF = re.compile("[A-Za-z0-9]+")


def ref_tokens(s):
    return [t.lower() for t in _REF.findall(s)]


CASES = [
    "hello world",
    "this is a test",
    "This IS a TeSt!!",
    "",
    "   ",
    "a-b_c.d",
    "héllo wörld",          # unicode letters are separators
    "über café 123",
    "ABC123def",
    "日本語 text 漢字42",
    "K kelvin K sign",   # U+212A lowers to ascii 'k' — must NOT match
    "İstanbul",          # U+0130 lowers to 'i'+combining — must NOT match
    "tab\tsep\nlines\r\nmixed",
    "trailing space ",
    " leading",
    "MiXeD123CaSe456",
]


@pytest.mark.parametrize("s", CASES)
def test_normalized_tokens_matches_reference(s):
    assert normalized_tokens(s) == ref_tokens(s)


def test_tokens_series_matches_scalar():
    ser = pd.Series(CASES + [None])
    got = tokens_series(ser).tolist()
    want = [ref_tokens(s) for s in CASES] + [[]]
    assert got == want


def test_query_terms_dedup_preserves_order():
    assert query_terms("the Book of the Life") == ["the", "book", "of", "life"]
    assert query_terms("a a a") == ["a"]
    assert query_terms("") == []


def test_random_parity():
    import random
    rng = random.Random(7)
    alphabet = "abcXYZ019 \t\n!@#éü漢Kİ"
    for _ in range(300):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60)))
        assert normalized_tokens(s) == ref_tokens(s)
    ser = pd.Series(["".join(rng.choice(alphabet) for _ in range(40))
                     for _ in range(200)])
    assert tokens_series(ser).tolist() == [ref_tokens(s) for s in ser]
