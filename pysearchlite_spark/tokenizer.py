"""Tokenization with exact pysearchlite semantics.

Reference: /root/reference/pysearchlite/tokenize.py:3-7 — tokens are maximal
ASCII ``[A-Za-z0-9]+`` runs, lowercased; every other byte (unicode letters,
punctuation, whitespace) is a separator and is dropped.

The SAME compiled regex drives both the single-node oracle and the Spark-side
pandas UDF, so tokenizer parity is by construction (SURVEY.md §7.5:
Spark-native regex classes can differ on unicode, so we never use them for
tokenization — only the vectorized pandas path below).
"""

from __future__ import annotations

import re
from typing import List

import pandas as pd

# ASCII-exact by construction: the class enumerates byte ranges, so Python's
# unicode-aware `re` cannot widen it (no \w, no re.UNICODE effect).
ASCII_TOKEN = re.compile(r"[A-Za-z0-9]+")


def normalized_tokens(s: str) -> List[str]:
    """Exact reference semantics (tokenize.py:6-7): findall + lower, order
    preserved, duplicates preserved."""
    return [t.lower() for t in ASCII_TOKEN.findall(s)]


def tokens_series(texts: pd.Series) -> pd.Series:
    """Vectorized tokenizer over a pandas string Series → Series of lists.

    Order of operations matters for parity: the reference matches ASCII runs
    on the ORIGINAL string and lowercases each match (tokenize.py:6-7).
    Lowercasing the whole string first would create spurious matches for
    unicode chars whose lower() contains ASCII (e.g. 'K' U+212A → 'k',
    'İ' U+0130 → 'i' + U+0307), so: findall first, then lowercase the
    matches. The matches are pure [A-Za-z0-9], so joining them with NUL and
    lowering the joined string is an exact, fully vectorized equivalent of
    per-token .lower().
    """
    matches = texts.fillna("").str.findall(ASCII_TOKEN)
    joined = matches.str.join("\x00").str.lower()
    out = joined.str.split("\x00")
    empty = joined.eq("")
    if empty.any():
        # "" splits to [""] — restore the true empty token list.
        out = out.copy()
        out[empty] = pd.Series([[] for _ in range(int(empty.sum()))],
                               index=out.index[empty])
    return out


def query_terms(query: str, dedup: bool = True) -> List[str]:
    """Tokenize a query string. The reference keeps duplicate query terms and
    intersects a list with itself (SURVEY.md §2.3) — idempotent, so deduping
    (first-occurrence order preserved) is semantics-preserving and cheaper."""
    toks = normalized_tokens(query)
    if not dedup:
        return toks
    return list(dict.fromkeys(toks))
