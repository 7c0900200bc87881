"""Microbench: adaptive block-max auto vs always-exhaustive.

Builds a 100k-doc index where every doc holds head terms and 120 CLUSTERED
docs (contiguous docID range — e.g. a temporally-local term in a
date-ordered corpus) hold a rare term, then times topk() driver-path on:
  * selective query ("common rare") — auto should pick PRUNED and beat
    always-exhaustive;
  * head query ("common filler") — auto should pick EXHAUSTIVE and match it
    (no regression where pruning cannot help).
Writes BENCH/blockmax_auto.json. Timings are warm (preloaded cache) and
best-of-N to dodge the host's co-tenant noise.

Usage: python BENCH/blockmax_auto.py [n_docs]
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
                if n // 2 <= i < n // 2 + 120:
                    parts.append("rare")
                texts.append(" ".join(parts))
            yield pd.DataFrame({"doc_id": ids, "url": [f"u{i}" for i in ids],
                                "text": texts})
    return (spark.range(n).withColumnRenamed("id", "id")
            .mapInPandas(gen, "doc_id long, url string, text string"))


def best_of(fn, reps: int = 5) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("blockmax-auto", master="local[8]",
                      shuffle_partitions=8)
    d = tempfile.mkdtemp(prefix="bmx_")
    build_index(spark, corpus_df(spark, n), d, id_col="doc_id",
                url_col="url", segment_docs=1 << 20)
    idx = SearchIndex(spark, d)
    idx.preload()

    out = {"n_docs": n, "k": 10, "queries": {}}
    for label, q in (("selective", "common rare"),
                     ("head", "common filler")):
        r_auto = idx.topk(q, k=10, use_blockmax="auto")
        r_ex = idx.topk(q, k=10, use_blockmax=False)
        r_bm = idx.topk(q, k=10, use_blockmax=True)
        assert [x[0] for x in r_auto] == [x[0] for x in r_ex] == \
               [x[0] for x in r_bm], "rank identity violated"
        t_auto = best_of(lambda: idx.topk(q, k=10, use_blockmax="auto"))
        t_ex = best_of(lambda: idx.topk(q, k=10, use_blockmax=False))
        t_bm = best_of(lambda: idx.topk(q, k=10, use_blockmax=True))
        out["queries"][label] = {
            "auto_ms": round(t_auto * 1e3, 3),
            "exhaustive_ms": round(t_ex * 1e3, 3),
            "blockmax_ms": round(t_bm * 1e3, 3),
            "auto_speedup_vs_exhaustive": round(t_ex / t_auto, 2),
        }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "blockmax_auto.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
