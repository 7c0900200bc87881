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


def measure(idx, emb, qrows, n, exact_by_q, topk_kwargs):
    lat, cand_frac, recalls = [], [], []
    for qi, r in enumerate(qrows):
        qv = list(r["embedding"])
        t0 = time.monotonic()
        approx = [x["vec_id"] for x in
                  idx.topk(qv, k=10, **topk_kwargs).collect()]
        lat.append(time.monotonic() - t0)
        cand_frac.append(idx.candidates(qv, **topk_kwargs).count() / n)
        recalls.append(len(set(approx) & set(exact_by_q[qi])) / 10)
    # batch path: the SAME queries in ONE job (topk_batch) — measures how
    # much of single-query latency was per-job dispatch overhead
    qvs = [list(r["embedding"]) for r in qrows]
    t0 = time.monotonic()
    brows = idx.topk_batch(qvs, k=10, **topk_kwargs).collect()
    batch_sec = time.monotonic() - t0
    by_q: dict = {}
    for r in brows:
        by_q.setdefault(r["qid"], []).append(r["vec_id"])
    batch_rec = [len(set(by_q.get(qi, [])) & set(exact_by_q[qi])) / 10
                 for qi in range(len(qrows))]
    q_ms = round(1000 * float(np.mean(lat)), 1)
    b_ms = round(1000 * batch_sec / len(qrows), 1)
    return {"query_ms_mean": q_ms,
            "candidate_fraction_mean": round(float(np.mean(cand_frac)), 5),
            "recall_at_10_mean": round(float(np.mean(recalls)), 3),
            "batch_query_ms_per_query": b_ms,
            "batch_recall_at_10_mean": round(float(np.mean(batch_rec)), 3),
            "batch_speedup_per_query": round(q_ms / max(b_ms, 1e-9), 2)}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    from pysearchlite_spark.operators.ann import (AnnIndex, IvfIndex,
                                                  brute_cosine_topk)
    spark = get_spark("ann-scale", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    src = tempfile.mkdtemp(prefix="annscale_src_")
    root_lsh = tempfile.mkdtemp(prefix="annscale_lsh_")
    root_ivf = tempfile.mkdtemp(prefix="annscale_ivf_")
    try:
        vectors_df(spark, n).write.mode("overwrite").parquet(src)
        emb = spark.read.parquet(src)

        qrows = emb.filter(f"vec_id % {n // 20} = 1").collect()[:20]
        exact_by_q = []
        t0 = time.monotonic()
        for r in qrows:
            exact_by_q.append([x["vec_id"] for x in brute_cosine_topk(
                emb, list(r["embedding"]), k=10).collect()])
        brute_ms = round(1000 * (time.monotonic() - t0) / len(qrows), 1)

        t0 = time.monotonic()
        lsh = AnnIndex.build(spark, emb, root_lsh, n_planes=12)
        lsh_build = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        ivf = IvfIndex.build(spark, emb, root_ivf, n_centroids=1024,
                             train_sample=100_000, iters=5)
        ivf_build = round(time.monotonic() - t0, 2)

        out = {"n_vectors": n, "dim": DIM, "n_queries": len(qrows),
               "brute_force_ms": brute_ms,
               "lsh": {"n_planes": 12, "part_bits": 8,
                       "build_sec": lsh_build,
                       **measure(lsh, emb, qrows, n, exact_by_q,
                                 {"probe_bits": 2})},
               "ivf": {"n_centroids": 1024, "nprobe": 32,
                       "build_sec": ivf_build,
                       **measure(ivf, emb, qrows, n, exact_by_q,
                                 {"nprobe": 32})}}
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "ann_scale.json")
        prev = {}
        if os.path.exists(path):
            with open(path) as f:
                prev = json.load(f)
        prev.setdefault("runs", {})[str(n)] = out
        with open(path, "w") as f:
            json.dump(prev, f, indent=1)
        print(json.dumps(out))
    finally:
        for d in (src, root_lsh, root_ivf):
            shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
