"""Microbench: group-aware block-max pruning (wand.blockmax_topk_groups)
vs the always-exhaustive group pass — the synonym analogue of
BENCH/blockmax_auto.py, closing the round-3 gap where SynonymQuery
scoring always fully decoded every member stream (1.64× plain block-max
at 1M, BENCH/synonym_scale.json r3).

Corpus: every doc holds head terms; two CLUSTERED rare synonyms occupy
disjoint contiguous docID ranges (temporally-local vocabulary in a
date-ordered crawl). Queries:
  * selective — group (rareA OR rareB) + head term: the group's zone
    upper bound (idf_g · Σ member block maxes, valid by BM25 tf
    subadditivity) concentrates in the two clusters, so auto picks
    PRUNED and must beat exhaustive;
  * head — group (common OR filler): flat bounds, auto must pick
    EXHAUSTIVE and match it (no regression where pruning cannot help).
Rank identity auto == exhaustive == forced-pruned is asserted, plus the
plain-term block-max query on the same rare terms for the "within ~1.2×
of plain block-max" criterion.

Usage: python BENCH/group_blockmax.py [n_docs] → BENCH/group_blockmax.json
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pysearchlite_spark.engine import SearchIndex  # noqa: E402
from pysearchlite_spark.plans.builder import build_index  # noqa: E402
from pysearchlite_spark.session import get_spark  # noqa: E402


def corpus_df(spark, n: int):
    def gen(it):
        import pandas as pd
        for pdf in it:
            ids = pdf["id"].to_numpy()
            texts = []
            for i in ids:
                parts = ["common"] * (1 + int(i) % 3) + [f"filler{i % 7}",
                                                         "filler"]
                if n // 4 <= i < n // 4 + 120:
                    parts.append("rarea")
                if 3 * n // 4 <= i < 3 * n // 4 + 120:
                    parts.append("rareb")
                texts.append(" ".join(parts))
            yield pd.DataFrame({"doc_id": ids, "url": [f"u{i}" for i in ids],
                                "text": texts})
    return spark.range(n).mapInPandas(
        gen, "doc_id long, url string, text string")


def best_of(fn, reps: int = 5) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("group-blockmax", master="local[8]",
                      shuffle_partitions=8)
    d = tempfile.mkdtemp(prefix="gbmx_")
    build_index(spark, corpus_df(spark, n), d, id_col="doc_id",
                url_col="url", segment_docs=1 << 20)
    idx = SearchIndex(spark, d)
    idx.preload()

    out = {"n_docs": n, "k": 10, "queries": {}}
    cases = (
        ("selective", [["common"], ["rarea", "rareb"]]),
        ("head", [["common", "filler"]]),
    )
    for label, groups in cases:
        r_auto = idx.topk_groups(groups, k=10, use_blockmax="auto")
        r_ex = idx.topk_groups(groups, k=10, use_blockmax=False)
        r_bm = idx.topk_groups(groups, k=10, use_blockmax=True)
        assert r_auto == r_ex == r_bm, "rank identity violated"
        t_auto = best_of(lambda: idx.topk_groups(groups, k=10,
                                                 use_blockmax="auto"))
        t_ex = best_of(lambda: idx.topk_groups(groups, k=10,
                                               use_blockmax=False))
        t_bm = best_of(lambda: idx.topk_groups(groups, k=10,
                                               use_blockmax=True))
        out["queries"][label] = {
            "auto_ms": round(t_auto * 1e3, 3),
            "exhaustive_ms": round(t_ex * 1e3, 3),
            "blockmax_ms": round(t_bm * 1e3, 3),
            "auto_speedup_vs_exhaustive": round(t_ex / t_auto, 2),
        }
    # plain-term block-max on the same selective shape: the ~1.2× criterion
    t_plain = best_of(lambda: idx.topk("common rarea", k=10))
    out["plain_selective_ms"] = round(t_plain * 1e3, 3)
    out["group_vs_plain_blockmax"] = round(
        out["queries"]["selective"]["auto_ms"] / out["plain_selective_ms"],
        2)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "group_blockmax.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
