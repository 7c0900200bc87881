"""Similarity search over embedding columns (array<float>).

  * brute_cosine_topk — exact baseline: batch numpy matmul inside
    mapInPandas (Arrow-vectorized), global top-k via orderBy+limit
    (Catalyst's TakeOrderedAndProject — no full sort materialized).
  * lsh_cosine_topk   — scale path: random-hyperplane (sign) LSH buckets
    with multi-probe (flip up to `probe_bits` bits), exact rerank of
    candidates only.
  * pairwise_cosine_dups — embedding near-duplicate pairs (cos >= tau) via
    the same LSH bucketing.

Cosine math is float64 numpy; the LSH planes are seeded (deterministic).
"""

from __future__ import annotations

from itertools import combinations
from typing import Iterator, List, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_matrix(col: pd.Series) -> np.ndarray:
    return np.vstack([np.asarray(v, dtype=np.float64) for v in col])


def brute_cosine_topk(df: DataFrame, query_vec: Sequence[float], k: int = 10,
                      id_col: str = "vec_id", vec_col: str = "embedding"
                      ) -> DataFrame:
    """Exact top-k by cosine similarity to query_vec.
    Returns (vec_id, cos) — cos rounded to 6 for cross-engine comparison."""
    q = np.asarray(list(query_vec), dtype=np.float64)
    qn = np.linalg.norm(q)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = _as_matrix(pdf[vec_col])
            norms = np.linalg.norm(m, axis=1)
            denom = norms * qn
            cos = np.where(denom > 0, (m @ q) / np.where(denom == 0, 1, denom),
                           0.0)
            yield pd.DataFrame({"vec_id": pdf[id_col], "cos": cos})

    scored = df.mapInPandas(run, "vec_id long, cos double")
    return (scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
            .select("vec_id", F.round("cos", 6).alias("cos")))


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _bucket_of(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return bits.astype(np.int64) @ weights


def lsh_cosine_topk(df: DataFrame, query_vec: Sequence[float], k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_planes: int = 12, probe_bits: int = 2,
                    seed: int = 99) -> DataFrame:
    """Approximate top-k: hash every vector into a sign-LSH bucket (one
    mapInPandas pass), prune to the query's bucket plus all buckets within
    `probe_bits` bit flips (multi-probe), exact-rerank survivors."""
    q = np.asarray(list(query_vec), dtype=np.float64)

    # driver-side: target buckets (tiny: sum_{i<=probe} C(n_planes, i))
    def neighbors(b: int) -> List[int]:
        out = {b}
        idxs = range(n_planes)
        for r in range(1, probe_bits + 1):
            for flips in combinations(idxs, r):
                x = b
                for f in flips:
                    x ^= (1 << f)
                out.add(x)
        return sorted(out)

    dim = q.size
    planes = _planes(dim, n_planes, seed)
    qb = int(_bucket_of(q[None, :], planes)[0])
    targets = neighbors(qb)

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = _as_matrix(pdf[vec_col])
            yield pd.DataFrame({"vec_id": pdf[id_col],
                                "bucket": _bucket_of(m, planes),
                                vec_col: pdf[vec_col]})

    schema = f"vec_id long, bucket long, {vec_col} array<float>"
    bucketed = df.mapInPandas(bucketize, schema)
    cands = bucketed.filter(F.col("bucket").isin(targets))
    return brute_cosine_topk(cands, query_vec, k, "vec_id", vec_col)


def pairwise_cosine_dups(df: DataFrame, tau: float = 0.95,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         n_planes: int = 10, seed: int = 99) -> DataFrame:
    """Embedding near-dup pairs (a, b, cos) with cos >= tau: sign-LSH bucket
    self-join then exact verification (near-identical vectors collide with
    high probability; recall grows with fewer planes)."""
    planes_b = None  # built per-partition from the seeded generator

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nonlocal planes_b
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = _as_matrix(pdf[vec_col])
            if planes_b is None:
                planes_b = _planes(m.shape[1], n_planes, seed)
            yield pd.DataFrame({"vec_id": pdf[id_col],
                                "bucket": _bucket_of(m, planes_b),
                                vec_col: pdf[vec_col]})

    schema = f"vec_id long, bucket long, {vec_col} array<float>"
    b = df.mapInPandas(bucketize, schema)
    pairs = (b.alias("x").join(b.alias("y"),
                               (F.col("x.bucket") == F.col("y.bucket")) &
                               (F.col("x.vec_id") < F.col("y.vec_id")))
             .select(F.col("x.vec_id").alias("a"),
                     F.col(f"x.{vec_col}").alias("va"),
                     F.col("y.vec_id").alias("b"),
                     F.col(f"y.{vec_col}").alias("vb")))

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ma = _as_matrix(pdf["va"])
            mb = _as_matrix(pdf["vb"])
            num = (ma * mb).sum(axis=1)
            den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
            cos = np.where(den > 0, num / np.where(den == 0, 1, den), 0.0)
            yield pd.DataFrame({"a": pdf["a"], "b": pdf["b"], "cos": cos})

    out = pairs.mapInPandas(verify, "a long, b long, cos double")
    return (out.filter(F.col("cos") >= tau)
            .select("a", "b", F.round("cos", 6).alias("cos")))
