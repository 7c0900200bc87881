"""Degenerate-corpus dedup benchmark: the round-1 scale-killer, measured.

Corpus: n_docs where 75% are ONE byte-identical boilerplate page (the
Common-Crawl pathology: cookie banners, parked domains), the rest unique
with planted near-dup pairs. An uncapped LSH bucket self-join on this input
is O((0.75 n)^2) candidate pairs — 11 BILLION at 150k dup docs; the capped
path must emit O(n) star pairs and finish.

Reports wall time + output pair counts for minhash_lsh_pairs and
simhash_pairs at max_bucket=1000, plus correctness spot checks (cluster
fully connected through its representative; planted outside pair found).

Usage: python BENCH/dedup_degenerate.py [n_docs]  → one JSON line +
writes BENCH/dedup_degenerate.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pysearchlite_spark.session import get_spark  # noqa: E402


def corpus(spark, n: int):
    boiler = ("we use cookies to improve your experience accept all terms "
              "privacy policy all rights reserved subscribe to newsletter")

    def gen(it):
        import pandas as pd
        for pdf in it:
            ids = pdf["id"].to_numpy()
            texts = []
            for i in ids:
                i = int(i)
                if i < 3 * n // 4:
                    texts.append(boiler)
                elif i % 2 == 0:
                    texts.append(" ".join(
                        f"u{i}w{j * (i % 17 + 1) % 101}" for j in range(25)))
                else:
                    # near-dup of the previous even doc (one token changed)
                    base = [f"u{i - 1}w{j * ((i - 1) % 17 + 1) % 101}"
                            for j in range(25)]
                    base[3] = "CHANGED"
                    texts.append(" ".join(base))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return spark.range(n).mapInPandas(gen, "doc_id long, text string")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    from pysearchlite_spark.operators.dedup import (minhash_lsh_pairs,
                                                    simhash_pairs)
    spark = get_spark("dedup-degenerate", master="local[8]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    df = corpus(spark, n).persist()
    n_cluster = 3 * n // 4
    out = {"n_docs": n, "identical_cluster": n_cluster,
           "uncapped_candidate_pairs_would_be":
               n_cluster * (n_cluster - 1) // 2}

    t0 = time.monotonic()
    mh = minhash_lsh_pairs(df, threshold=0.5, max_bucket=1000)
    mh_pairs = mh.count()
    out["minhash_sec"] = round(time.monotonic() - t0, 2)
    out["minhash_pairs"] = mh_pairs

    # spot correctness: cluster connectivity through rep + planted pair
    star = mh.filter(f"a = 0 AND b < {n_cluster}").count()
    probe_even = n - 2 if (n - 2) % 2 == 0 else n - 3
    planted = mh.filter(f"a = {probe_even} AND b = {probe_even + 1}").count()
    out["cluster_star_edges"] = star
    out["planted_neardup_found"] = bool(planted == 1)

    t0 = time.monotonic()
    sh_pairs = simhash_pairs(df, max_hamming=3, max_bucket=1000).count()
    out["simhash_sec"] = round(time.monotonic() - t0, 2)
    out["simhash_pairs"] = sh_pairs

    # embedding near-dup path: 75% of vectors bit-identical — the same ONE
    # oversized LSH bucket; capped self-join must emit O(n) star pairs
    from pysearchlite_spark.operators.ann import pairwise_cosine_dups

    def gen_emb(it):
        import numpy as np
        import pandas as pd
        for pdf in it:
            ids = pdf["id"].to_numpy()
            vecs = []
            for i in ids:
                i = int(i)
                if i < 3 * n // 4:
                    v = np.linspace(0.1, 1.6, 16, dtype=np.float32)
                else:
                    rng = np.random.default_rng(i)
                    v = rng.standard_normal(16).astype(np.float32)
                vecs.append(v.tolist())
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    emb = spark.range(n).mapInPandas(
        gen_emb, "vec_id long, embedding array<float>").persist()
    t0 = time.monotonic()
    cd = pairwise_cosine_dups(emb, tau=0.999, max_bucket=1000).persist()
    cd_pairs = cd.count()
    out["cosine_sec"] = round(time.monotonic() - t0, 2)
    out["cosine_pairs"] = cd_pairs
    out["cosine_cluster_star_edges"] = cd.filter(
        f"a = 0 AND b < {n_cluster}").count()

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "dedup_degenerate.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
