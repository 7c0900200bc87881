"""Deterministic synthetic `pages` corpus (FIXTURES.md §1, input_hint shape).

Schema: (url string, warc_ts timestamp, html binary, text string, lang string).

Text is a Zipfian (s≈1.1) token stream over a vocabulary seeded with the
reference query terms (commands/main.py:17-24) so every reference query has
non-trivial matches, plus the micro-corpus phrases from
test_search_engine.py:6-8. `html` wraps `text` in a noisy template so
``extract_text(html) == text`` is a checkable invariant (extraction inserts
word-boundary whitespace only, which the collapse step normalizes).

Everything keys off (seed, row index) — no RNG state shared across rows — so
generation is embarrassingly parallel and identical regardless of
partitioning (the property a 100-TB-scale generator must have).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import html as _html
import math
import random
from typing import Iterator, List

import numpy as np
import pandas as pd

REFERENCE_QUERY_WORDS = (
    "st petersburg high school united states constitution search los angeles "
    "the national football league book of life care a lot usb hub "
    "hello world this is test another that"
).split()

_EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _vocab(size: int = 30000) -> List[str]:
    """Reference query words first (so they get Zipf-head frequencies at
    realistic but non-degenerate df), then synthetic words."""
    words = list(dict.fromkeys(REFERENCE_QUERY_WORDS))
    i = 0
    while len(words) < size:
        words.append(f"w{i:05d}")
        i += 1
    return words[:size]


_VOCAB = _vocab()
_ZIPF_S = 1.1
# Precompute the Zipf CDF once (module import), shared by all partitions.
_weights = 1.0 / np.power(np.arange(1, len(_VOCAB) + 1, dtype=np.float64), _ZIPF_S)
_CDF = np.cumsum(_weights / _weights.sum())


def page_text(seed: int, i: int) -> str:
    """Deterministic text for row i: 20–200 Zipfian tokens."""
    rng = random.Random(f"{seed}:{i}")
    n = rng.randint(20, 200)
    # inverse-CDF sampling against the precomputed Zipf CDF
    us = [rng.random() for _ in range(n)]
    # clamp: float rounding leaves _CDF[-1] a hair under 1.0, so a draw in
    # [_CDF[-1], 1.0) (~1.6e-15/token) would index past the vocabulary —
    # at 10^13+ generated tokens that is an expected, not theoretical, crash
    idx = np.minimum(np.searchsorted(_CDF, us, side="left"),
                     len(_VOCAB) - 1)
    return " ".join(_VOCAB[j] for j in idx)


def page_html(text: str, i: int) -> bytes:
    """Wrap `text` so that extract_text(html) == text byte-identically:
    the only visible text is the escaped body (title is empty; script/style/
    comments are dropped by extraction; tags become collapsible whitespace)."""
    body = _html.escape(text)
    tmpl = (
        f"<html><head><title></title>"
        f"<style>body {{ color: #000; }}</style>"
        f'<script type="text/javascript">var x = {i}; // not text</script>'
        f"</head>\n<body>\n  <!-- comment {i} -->\n"
        f"  <p>{body}</p>\n</body></html>"
    )
    return tmpl.encode("utf-8")


def _url(seed: int, i: int) -> str:
    h = hashlib.sha1(f"{seed}:{i}".encode()).hexdigest()[:8]
    return f"https://example-{h}.test/p/{i}"


def pages_pdf(seed: int, start: int, stop: int) -> pd.DataFrame:
    rows = []
    for i in range(start, stop):
        text = page_text(seed, i)
        # small non-en tail exercised by the build's lang filter
        lang = "en" if i % 53 else "xx"
        rows.append(
            (
                _url(seed, i),
                _EPOCH + dt.timedelta(seconds=i),
                page_html(text, i),
                text,
                lang,
            )
        )
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def generate_pages(spark, n_rows: int, seed: int = 42, partitions: int = None):
    """Distributed deterministic generation via mapInPandas over row ranges."""
    partitions = partitions or max(1, min(64, math.ceil(n_rows / 5000)))
    bounds = [
        (i * n_rows // partitions, (i + 1) * n_rows // partitions)
        for i in range(partitions)
    ]
    rng_df = spark.createDataFrame(bounds, "start long, stop long").repartition(partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for start, stop in zip(b["start"], b["stop"]):
                yield pages_pdf(seed, int(start), int(stop))

    return rng_df.mapInPandas(gen, PAGES_SCHEMA)


def micro_corpus() -> List[tuple]:
    """The reference's own e2e corpus (test_search_engine.py:6-8)."""
    return [("id1", "hello world"), ("id2", "this is a test"),
            ("id3", "this is another test")]
