"""Randomized model-based test of the full maintenance lifecycle.

A seeded random sequence of append / upsert / delete / compact / expire
ops runs against a real index AND a trivial dict model (url -> text of
LIVE docs); after every op, boolean AND search results and counts must
equal the model's brute-force answer on multiple queries. This covers
sequential op ORDERINGS (delete-after-compact-after-upsert, etc.) that
the targeted regression tests and the concurrent stress test pin only
for specific interleavings.
"""

import random

import pytest

from pysearchlite_spark.engine import SearchIndex
from pysearchlite_spark.plans.compaction import compact_segments
from pysearchlite_spark.plans.deletes import delete_docs
from pysearchlite_spark.sources.catalog import IndexCatalog
from pysearchlite_spark.streaming.ingest import append_batch, upsert_batch
from pysearchlite_spark.tokenizer import normalized_tokens

VOCAB = ["table", "part", "query", "value", "spark", "merge", "scan",
         "filter", "window", "group", "order", "key"]
QUERIES = ["table part", "query value", "spark", "window group"]


def _text(rng: random.Random) -> str:
    return " ".join(rng.choice(VOCAB) for _ in range(rng.randint(3, 14)))


def _batch_df(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def _phrase_want(live: dict, terms: list) -> set:
    L = len(terms)
    out = set()
    for u, t in live.items():
        toks = normalized_tokens(t)
        if any(toks[i:i + L] == terms for i in range(len(toks) - L + 1)):
            out.add(u)
    return out


def _verify(spark, idx_dir: str, live: dict, step: str,
            positional: bool = False) -> None:
    idx = SearchIndex(spark, idx_dir)
    assert idx.n_docs >= 0
    for q in QUERIES:
        terms = q.split()
        want = {u for u, t in live.items()
                if set(terms) <= set(normalized_tokens(t))}
        got = set(idx.search(q))
        assert got == want, (step, q, got ^ want)
        assert idx.count(q) == len(want), (step, q)
        got_d = set(idx.search(q, distributed=True))
        assert got_d == want, (step, q, "distributed")
    if positional:
        # exact-adjacency results must also survive every op ordering
        assert idx.stats.get("has_positions") is True, step
        for q in QUERIES[:2]:
            terms = q.split()
            want_p = _phrase_want(live, terms)
            got_p = set(idx.search_phrase(q))
            assert got_p == want_p, (step, q, "phrase", got_p ^ want_p)
            assert idx.count_phrase(q, distributed=True) == len(want_p), \
                (step, q, "phrase dist")


@pytest.mark.parametrize("seed,positional", [(11, False), (23, True)])
def test_lifecycle_random_model(spark, tmp_path_factory, seed, positional):
    rng = random.Random(seed)
    idx_dir = str(tmp_path_factory.mktemp(f"life{seed}") / "idx")
    live: dict = {}
    next_url = [0]

    def new_rows(k):
        rows = []
        for _ in range(k):
            u = f"u{next_url[0]:05d}"
            next_url[0] += 1
            rows.append((u, _text(rng)))
        return rows

    # seed corpus
    rows = new_rows(40)
    append_batch(spark, _batch_df(spark, rows), idx_dir,
                 segment_docs=16, batch_id=0, with_positions=positional)
    live.update(dict(rows))
    _verify(spark, idx_dir, live, "seed", positional)

    ops = ["append", "upsert", "delete", "append", "compact", "delete",
           "upsert", "expire", "append", "delete", "compact", "upsert"]
    for i, op in enumerate(ops):
        step = f"{i}:{op}"
        if op == "append":
            rows = new_rows(rng.randint(3, 10))
            append_batch(spark, _batch_df(spark, rows), idx_dir,
                         segment_docs=16, batch_id=100 + i)
            live.update(dict(rows))
        elif op == "upsert":
            # mix of re-crawled (replace) and brand-new urls
            old = rng.sample(sorted(live), min(4, len(live)))
            rows = [(u, _text(rng)) for u in old] + new_rows(2)
            upsert_batch(spark, _batch_df(spark, rows), idx_dir,
                         segment_docs=16, batch_id=200 + i)
            live.update(dict(rows))
        elif op == "delete":
            victims = rng.sample(sorted(live), min(6, len(live) // 2))
            idx = SearchIndex(spark, idx_dir)
            by_url = {r["url"]: int(r["doc_id"]) for r in
                      idx.docmap_df(live=True)
                      .select("doc_id", "url").collect()}
            delete_docs(spark, idx_dir, [by_url[u] for u in victims])
            for u in victims:
                del live[u]
        elif op == "compact":
            compact_segments(spark, idx_dir)
        elif op == "expire":
            IndexCatalog(idx_dir).expire_snapshots(keep_last=1)
        _verify(spark, idx_dir, live, step, positional)
