"""ANN scale benchmark: persisted AnnIndex over 1M synthetic vectors.

Clustered 64-dim corpus (1000 Gaussian centers — realistic embedding
geometry; sign-LSH recall on fully-random vectors is meaningless). Measures
index build time, per-query latency, candidate fraction (how much of the
corpus a query actually scans), and recall@10 vs brute force over 20
queries.

Usage: python BENCH/ann_scale.py [n_vectors]  → one JSON line +
writes BENCH/ann_scale.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from pysearchlite_spark.session import get_spark  # noqa: E402

DIM = 64
N_CENTERS = 1000


def vectors_df(spark, n: int):
    def gen(it):
        import pandas as pd
        centers = np.random.default_rng(7).standard_normal(
            (N_CENTERS, DIM)) * 3
        for pdf in it:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(int(ids[0]) + 1)
            m = (centers[ids % N_CENTERS]
                 + rng.standard_normal((len(ids), DIM)) * 0.6)
            yield pd.DataFrame({"vec_id": ids,
                                "embedding": list(m.astype(np.float32))})
    return spark.range(n).mapInPandas(gen, "vec_id long, embedding array<float>")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    from pysearchlite_spark.operators.ann import AnnIndex, brute_cosine_topk
    spark = get_spark("ann-scale", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    src = tempfile.mkdtemp(prefix="annscale_src_")
    root = tempfile.mkdtemp(prefix="annscale_idx_")
    try:
        vectors_df(spark, n).write.mode("overwrite").parquet(src)
        emb = spark.read.parquet(src)

        t0 = time.monotonic()
        idx = AnnIndex.build(spark, emb, root, n_planes=12)
        build_sec = round(time.monotonic() - t0, 2)

        qrows = emb.filter(f"vec_id % {n // 20} = 1").collect()[:20]
        lat, cand_frac, recalls = [], [], []
        for r in qrows:
            qv = list(r["embedding"])
            t0 = time.monotonic()
            approx = [x["vec_id"] for x in idx.topk(qv, k=10).collect()]
            lat.append(time.monotonic() - t0)
            cand_frac.append(idx.candidates(qv).count() / n)
            exact = [x["vec_id"] for x in
                     brute_cosine_topk(emb, qv, k=10).collect()]
            recalls.append(len(set(approx) & set(exact)) / 10)
        t0 = time.monotonic()
        brute_cosine_topk(emb, list(qrows[0]["embedding"]), k=10).collect()
        brute_ms = round(1000 * (time.monotonic() - t0), 1)

        out = {"n_vectors": n, "dim": DIM, "n_planes": 12, "part_bits": 8,
               "build_sec": build_sec,
               "index_mb": round(sum(
                   os.path.getsize(os.path.join(dp, f))
                   for dp, _, fs in os.walk(root) for f in fs) / 2**20, 1),
               "query_ms_mean": round(1000 * float(np.mean(lat)), 1),
               "candidate_fraction_mean": round(float(np.mean(cand_frac)), 5),
               "recall_at_10_mean": round(float(np.mean(recalls)), 3),
               "brute_force_ms": brute_ms,
               "n_queries": len(qrows)}
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "ann_scale.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
