"""Similarity search over embedding columns (array<float>).

  * brute_cosine_topk — exact baseline: batch numpy matmul inside
    mapInPandas (Arrow-vectorized), global top-k via orderBy+limit
    (Catalyst's TakeOrderedAndProject — no full sort materialized).
  * AnnIndex          — the scale path: a PERSISTED sign-LSH index, parquet
    partitioned by bucket (the same partition-pruning shape as the postings
    seg=/tb= layout); a query reads only its multi-probe target buckets and
    reranks exactly — never a full-corpus scan.
  * lsh_cosine_topk   — one-shot variant of the same plan (bucketize +
    prune + rerank in a single job) for ad-hoc queries without an index.
  * pairwise_cosine_dups — embedding near-duplicate pairs (cos >= tau) via
    the same LSH bucketing, bucket-size HARD-CAPPED (dedup's
    _capped_bucket_pairs) so degenerate corpora stay O(n).

Cosine math is float64 numpy; the LSH planes are seeded (deterministic).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid
from itertools import combinations
from typing import Iterator, List, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pysearchlite_spark.locks import staging_age


def _as_matrix(col: pd.Series) -> np.ndarray:
    return np.vstack([np.asarray(v, dtype=np.float64) for v in col])



def _cosine_rerank_topk(cands: DataFrame, query_vec: Sequence[float],
                        k: int, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        norm_col: str = None) -> DataFrame:
    """Shared exact-rerank tail for every topk path: float64 cosine inside
    mapInPandas (norms from norm_col when precomputed, else on the fly),
    then Catalyst's TakeOrderedAndProject. THE single site for the
    zero-norm guard and the round(6) cross-engine contract."""
    q = np.asarray(list(query_vec), dtype=np.float64)
    qn = np.linalg.norm(q)

    def rerank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = _as_matrix(pdf[vec_col])
            norms = (pdf[norm_col].to_numpy(np.float64) if norm_col
                     else np.linalg.norm(m, axis=1))
            den = norms * qn
            cos = np.where(den > 0, (m @ q) / np.where(den == 0, 1, den),
                           0.0)
            yield pd.DataFrame({"vec_id": pdf[id_col], "cos": cos})

    scored = cands.mapInPandas(rerank, "vec_id long, cos double")
    return (scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
            .select("vec_id", F.round("cos", 6).alias("cos")))

def _batch_rerank_topk(cands: DataFrame, Q: np.ndarray, route_col: str,
                       route2qids: dict, k: int) -> DataFrame:
    """Shared batch-query rerank tail: ONE job for N queries. Each candidate
    row is scored (exact float64 cosine, precomputed norms) against every
    query probing its route bucket/cell; a per-batch tie-safe top-k
    pre-truncation (the map-side combine) bounds the shuffle to
    O(k · nq · partitions); a per-qid window takes the global top-k. Same
    zero-norm guard, round(6) contract and (score desc, vec_id asc) ties as
    the single-query path."""
    from pyspark.sql.window import Window

    qn = np.linalg.norm(Q, axis=1)

    def rerank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = _as_matrix(pdf["embedding"])
            norms = pdf["norm"].to_numpy(np.float64)
            ids = pdf["vec_id"].to_numpy(np.int64)
            codes, uniq = pd.factorize(pdf[route_col])
            qs, vs, cs = [], [], []
            for bi, b in enumerate(uniq):
                qids = route2qids.get(int(b))
                if not qids:
                    continue
                rows = np.flatnonzero(codes == bi)
                sub = m[rows]
                subn = norms[rows]
                for qj in qids:
                    den = subn * qn[qj]
                    cos = np.where(den > 0,
                                   (sub @ Q[qj]) / np.where(den == 0, 1, den),
                                   0.0)
                    qs.append(np.full(rows.size, qj, np.int32))
                    vs.append(ids[rows])
                    cs.append(cos)
            if not qs:
                continue
            qa = np.concatenate(qs)
            va = np.concatenate(vs)
            ca = np.concatenate(cs)
            keep = np.zeros(qa.size, bool)
            for qj in np.unique(qa):
                rows = np.flatnonzero(qa == qj)
                if rows.size > k:
                    kth = np.partition(ca[rows], rows.size - k)[rows.size - k]
                    rows = rows[ca[rows] >= kth]  # tie-safe truncation
                keep[rows] = True
            yield pd.DataFrame({"qid": qa[keep], "vec_id": va[keep],
                                "cos": ca[keep]})

    scored = cands.mapInPandas(rerank, "qid int, vec_id long, cos double")
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select("qid", "vec_id", F.round("cos", 6).alias("cos")))


def brute_cosine_topk(df: DataFrame, query_vec: Sequence[float], k: int = 10,
                      id_col: str = "vec_id", vec_col: str = "embedding"
                      ) -> DataFrame:
    """Exact top-k by cosine similarity to query_vec.
    Returns (vec_id, cos) — cos rounded to 6 for cross-engine comparison."""
    return _cosine_rerank_topk(df, query_vec, k, id_col, vec_col)


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _bucket_of(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return bits.astype(np.int64) @ weights


def _probe_targets(qb: int, n_planes: int, probe_bits: int) -> List[int]:
    """Multi-probe bucket ids: qb plus every bucket within probe_bits bit
    flips (driver-side; tiny: sum_{i<=probe} C(n_planes, i))."""
    out = {qb}
    idxs = range(n_planes)
    for r in range(1, probe_bits + 1):
        for flips in combinations(idxs, r):
            x = qb
            for f in flips:
                x ^= (1 << f)
            out.add(x)
    return sorted(out)


def _sign_bucketize_fn(planes: np.ndarray, shift: int,
                       id_col: str, vec_col: str):
    """mapInPandas fn: (id, vec) → VEC_SCHEMA rows bucketized under the
    given hyperplanes — shared by AnnIndex.build and AnnIndex.append so
    appended vectors land in exactly the buckets a rebuild would put them."""
    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = _as_matrix(pdf[vec_col])
            b = _bucket_of(m, planes)
            yield pd.DataFrame({
                "vec_id": pdf[id_col],
                "embedding": pdf[vec_col],
                "norm": np.linalg.norm(m, axis=1),
                "bucket": b,
                "pb": (b >> shift).astype(np.int32)})
    return bucketize


def _ivf_assign_fn(cn: np.ndarray, id_col: str, vec_col: str):
    """mapInPandas fn: (id, vec) → IvfIndex.VEC_SCHEMA rows assigned to
    the given (normalized) centroids — shared by build and append."""
    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = _as_matrix(pdf[vec_col])
            norm = np.linalg.norm(m, axis=1)
            mn = m / np.maximum(norm, 1e-12)[:, None]
            # argmax picks the FIRST max → ties break by ascending cid
            cid = np.argmax(mn @ cn.T, axis=1).astype(np.int32)
            yield pd.DataFrame({"vec_id": pdf[id_col],
                                "embedding": pdf[vec_col],
                                "norm": norm, "cid": cid})
    return assign


def _write_vectors(df: DataFrame, fn, schema: str, part_col: str,
                   sort_cols, vec_dir: str, mode: str,
                   id_col: str, vec_col: str, n_parts: int) -> int:
    """The shared vectors-write pipeline: one Arrow hop → repartition by the
    partition column → sorted parquet. Returns the row count from an
    Observation on the write itself — result-stage placement (after the
    exchange) is exactly-once under task retries; no post-write rescan.

    n_parts must be EXPLICIT (callers pass min(#partition dirs, cluster
    parallelism)): a keyless repartition(col) is AQE-coalesced by data
    volume, and a small build's ~MB shuffle collapses to ONE task that then
    writes every partition dir sequentially (measured 4.0 s for 2000
    vectors / 254 dirs at local[32] vs 0.9 s with one writer per core; the
    per-file parquet open/commit is the serial cost). File count is
    invariant either way — hash partitioning maps each dir key wholly to
    one task — only writer parallelism changes."""
    from pyspark.sql import Observation
    obs = Observation()
    (df.select(F.col(id_col).alias(id_col), vec_col)
     .mapInPandas(fn, schema)
     .repartition(max(1, n_parts), F.col(part_col))
     .sortWithinPartitions(*sort_cols)
     .observe(obs, F.count(F.lit(1)).alias("n"))
     .write.partitionBy(part_col).mode(mode).parquet(vec_dir))
    return int(obs.get["n"])


def _commit_meta(root: str, meta: dict) -> None:
    fd, tmp = tempfile.mkstemp(dir=root, suffix=".meta")
    with os.fdopen(fd, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(root, "meta.json"))  # atomic commit


def _meta_locked(root: str):
    """Exclusive flock over index mutations (meta.json AND the vectors
    generation dirs) — held by append's read-modify-write and by build's
    rmtree+rewrite, so neither can clobber the other mid-flight."""
    from pysearchlite_spark.locks import flock_ctx
    return flock_ctx(os.path.join(root, ".meta.lock"))


def _next_add_id(vec_dir: str, committed: set) -> int:
    """Allocate the next add-generation id above every committed AND
    on-disk id (crash debris never gets reused), sweeping debris dirs —
    on-disk, uncommitted, BELOW the max committed id (an id above it may
    be a concurrent in-flight append)."""
    on_disk = set()
    if os.path.isdir(vec_dir):
        for name in os.listdir(vec_dir):
            if name.startswith("add="):
                on_disk.add(int(name.split("=", 1)[1]))
    if committed:
        for i in sorted(on_disk - committed):
            if i < max(committed):
                shutil.rmtree(os.path.join(vec_dir, f"add={i}"),
                              ignore_errors=True)
    return max(on_disk | committed, default=-1) + 1


def _sweep_stale_add_tmp(root: str, max_age_sec: float = 86400.0) -> None:
    """Reclaim crashed appends' add.tmp-* staging dirs via the shared
    deep-mtime lease probe (locks.staging_age): a slow in-flight staging
    write keeps refreshing its own lease, and a dir vanishing concurrently
    (a finished/failed append rmtree-ing its own staging outside the lock)
    reads as age -1.0 — not sweepable, never a sweep failure. Staging
    lives at the index ROOT, never under vectors/ — vectors/ must contain
    ONLY add=<g> hive dirs, because _vectors_read relies on partition
    discovery there and a mixed add=*/add.tmp-* listing fails the whole
    read with CONFLICTING_DIRECTORY_STRUCTURES (the vec_dir entry of the
    sweep covers debris from the earlier in-place staging layout)."""
    for d in (root, os.path.join(root, "vectors")):
        if not os.path.isdir(d):
            continue
        for name in os.listdir(d):
            if not name.startswith("add.tmp-"):
                continue
            path = os.path.join(d, name)
            if staging_age(path) > max_age_sec:
                shutil.rmtree(path, ignore_errors=True)


def _append_generation(index, df: DataFrame, fn, schema: str,
                       part_col: str, sort_cols, id_col: str, vec_col: str,
                       batch_id, route_params: dict, n_dirs: int) -> int:
    """Shared append tail for AnnIndex/IvfIndex: stage the bucketized
    generation to an add.tmp-* dir OUTSIDE the meta flock (concurrent
    appends overlap on write time and serialize only on the rename+meta
    commit — the same stage-then-commit shape as plans.deletes), then under
    the lock allocate a generation id, rename, and commit into meta.json.
    Idempotent per batch_id, exactly like the text side's append_batch
    lineage check.

    route_params: the routing parameters (planes/centroids/part_bits) the
    bucketize closure was built from, revalidated against the freshly
    re-read meta under the lock — a rebuild with different parameters
    between this handle's construction and its commit would otherwise
    commit vectors bucketized under the OLD routing, silently unretrievable
    by queries that route with the new one."""
    done = index.meta.get("ingested_batches") or {}
    if batch_id is not None and str(batch_id) in done:
        return int(index.meta["n_vectors"])
    if index.meta.get("adds") is None:
        raise ValueError(
            "this index predates the generation-dir layout — rebuild it "
            "with .build() before appending")
    vec_dir = os.path.join(index.root, "vectors")
    # staged at the index ROOT, not inside vectors/: partition discovery in
    # _vectors_read must never see a non-add= sibling, or every concurrent
    # query fails with CONFLICTING_DIRECTORY_STRUCTURES for the whole
    # duration of the append (and until a crashed append's debris is swept)
    tmp = os.path.join(index.root, f"add.tmp-{uuid.uuid4().hex}")
    n_new = _write_vectors(
        df, fn, schema, part_col, sort_cols, tmp, "overwrite", id_col,
        vec_col,
        min(n_dirs, index.spark.sparkContext.defaultParallelism))
    try:
        with _meta_locked(index.root):
            with open(os.path.join(index.root, "meta.json")) as f:
                fresh = json.load(f)  # re-read under the lock
            for k, want in route_params.items():
                if fresh.get(k) != want:
                    raise RuntimeError(
                        f"index at {index.root} was rebuilt with a "
                        f"different '{k}' since this handle was opened; "
                        "the staged generation is bucketized under stale "
                        "routing parameters — re-open the index and retry "
                        "the append")
            done = fresh.get("ingested_batches") or {}
            if batch_id is not None and str(batch_id) in done:
                index.meta = fresh
                return int(fresh["n_vectors"])
            _sweep_stale_add_tmp(index.root)
            g = _next_add_id(vec_dir, {int(a) for a in fresh["adds"]})
            try:
                os.rename(tmp, os.path.join(vec_dir, f"add={g}"))
            except FileNotFoundError:
                raise RuntimeError(
                    "a concurrent rebuild removed this append's staged "
                    "generation mid-flight — retry the append") from None
            fresh["adds"] = sorted({int(a) for a in fresh["adds"]} | {g})
            if batch_id is not None:
                done[str(batch_id)] = g
                fresh["ingested_batches"] = done
            fresh["n_vectors"] = int(fresh["n_vectors"]) + n_new
            _commit_meta(index.root, fresh)
            index.meta = fresh
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return int(index.meta["n_vectors"])


def _vectors_read(spark: SparkSession, root: str, schema: str,
                  meta: dict) -> DataFrame:
    """Committed-adds-only vectors scan. Indexes are written in add=<g>
    GENERATION dirs; only generations recorded in meta.json are visible,
    so a crash between a parquet append and its meta commit leaves
    invisible debris instead of duplicate query results (the same
    staged-then-committed shape as the posting catalog). Pre-generation
    (legacy flat) layouts read as before."""
    vec_dir = os.path.join(root, "vectors")
    if meta.get("adds") is None:
        return spark.read.schema(schema).parquet(vec_dir)
    return (spark.read.schema(schema + ", add int").parquet(vec_dir)
            .filter(F.col("add").isin([int(a) for a in meta["adds"]])))


class _VectorsScanCache:
    """Snapshot-scoped memo of the vectors scan frame: building it per
    query repeats parquet partition DISCOVERY over the add=/pb= (or cid=)
    directory tree every call — measured most of a single topk()'s
    latency. The frame is a lazy plan + file listing (never data), keyed
    by the committed `adds` list so any append/build invalidates it —
    the SearchIndex._postings pattern applied to the ANN side."""

    def __init__(self) -> None:
        self._df = None
        self._key = None

    def get(self, spark: SparkSession, root: str, schema: str,
            meta: dict) -> DataFrame:
        key = tuple(int(a) for a in (meta.get("adds") or ()))
        if self._df is None or key != self._key:
            self._df = _vectors_read(spark, root, schema, meta)
            self._key = key
        return self._df


class AnnIndex:
    """Bucketed sign-LSH index over an embedding table (build + append).

    Layout under <root>/:
      meta.json               — atomic-rename committed parameters
                                {n_planes, seed, dim, n_vectors, adds,
                                ingested_batches}
      vectors/add=<g>/pb=<p>/*.parquet — (vec_id, embedding, norm, bucket)
                                per committed add GENERATION g (build is
                                g=0, each append a new g; only generations
                                listed in meta 'adds' are visible — crash
                                debris stays invisible and is swept)

    Query = pruned scan (PartitionFilters: bucket IN multi-probe targets —
    the same partition-pruning pattern as the postings seg=/tb= layout) +
    exact float64 rerank of survivors with the PRECOMPUTED norms. At 10^12
    vectors a query touches ~sum C(n_planes, <=probe) / 2^n_planes of the
    corpus instead of re-bucketizing everything per query (the round-1
    anti-pattern this replaces)."""

    VEC_SCHEMA = ("vec_id long, embedding array<float>, norm double, "
                  "bucket long, pb int")

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        with open(os.path.join(root, "meta.json")) as f:
            self.meta = json.load(f)
        self.n_planes = int(self.meta["n_planes"])
        self.part_bits = int(self.meta.get("part_bits", self.n_planes))
        if self.meta.get("planes") is not None:
            self.planes = np.asarray(self.meta["planes"], dtype=np.float64)
        else:
            self.planes = _planes(int(self.meta["dim"]), self.n_planes,
                                  int(self.meta["seed"]))
        self._scan_cache = _VectorsScanCache()

    @staticmethod
    def build(spark: SparkSession, df: DataFrame, root: str,
              id_col: str = "vec_id", vec_col: str = "embedding",
              n_planes: int = 12, seed: int = 99,
              planes=None, part_bits: int = 8) -> "AnnIndex":
        """planes: optional explicit (n_planes, dim) float64 hyperplanes
        (persisted verbatim in meta.json) — e.g. data-derived planes that an
        external system can reproduce; default is the seeded Gaussian set.

        part_bits: the parquet PARTITION key is the top `part_bits` bits of
        the bucket (default 8 → at most 256 directories), with the full
        bucket a regular column pushed down as a row-group filter. Using the
        raw bucket as the partition key would create 2^n_planes tiny
        directories whose listing/open cost dominates both build and query
        below billions of vectors (measured 24.8s build / 3.8s query at
        50k vectors with 4096 dirs)."""
        first = df.select(vec_col).first()
        if first is None:
            raise ValueError("cannot build AnnIndex over an empty table")
        dim = len(first[0])
        explicit = planes is not None
        if explicit:
            planes = np.asarray(planes, dtype=np.float64)
            n_planes = planes.shape[0]
        else:
            planes = _planes(dim, n_planes, seed)
        part_bits = min(part_bits, n_planes)
        shift = n_planes - part_bits

        os.makedirs(root, exist_ok=True)
        vec_dir = os.path.join(root, "vectors")
        # under the same lock append holds: a rebuild racing an in-flight
        # append must not rmtree its half-written generation and then have
        # the append's meta commit resurrect dirs the rebuild deleted
        with _meta_locked(root):
            shutil.rmtree(vec_dir, ignore_errors=True)  # clears old adds
            n_vectors = _write_vectors(
                df, _sign_bucketize_fn(planes, shift, id_col, vec_col),
                AnnIndex.VEC_SCHEMA, "pb", ("pb", "bucket"),
                os.path.join(vec_dir, "add=0"), "overwrite", id_col,
                vec_col,
                min(1 << part_bits,
                    spark.sparkContext.defaultParallelism))
            _commit_meta(root, {
                "n_planes": int(n_planes), "seed": seed, "dim": dim,
                "n_vectors": n_vectors, "part_bits": int(part_bits),
                "planes": (planes.tolist() if explicit else None),
                "adds": [0], "ingested_batches": {}})
        return AnnIndex(spark, root)

    def append(self, df: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding",
               batch_id: Optional[int] = None) -> int:
        """Incrementally add vectors: bucketized under the INDEX'S planes
        (identical buckets to a from-scratch rebuild), written as a new
        add=<g> GENERATION dir (same pb= sub-partitioning) that becomes
        visible only at the meta.json commit — O(batch), no rewrite of
        existing files. The streaming-embeddings path: each micro-batch
        of freshly embedded docs appends here while the text side appends
        index segments. Idempotent per batch_id (a foreachBatch replay of
        a committed batch is skipped; a replay of a crashed one leaves
        the half-written generation invisible and re-appends under a
        fresh id — debris is swept on later appends). Returns the new
        total n_vectors."""
        shift = self.n_planes - self.part_bits
        return _append_generation(
            self, df, _sign_bucketize_fn(self.planes, shift, id_col,
                                         vec_col), AnnIndex.VEC_SCHEMA,
            "pb", ("pb", "bucket"), id_col, vec_col, batch_id,
            route_params={"n_planes": self.meta["n_planes"],
                          "seed": self.meta.get("seed"),
                          "part_bits": self.meta.get("part_bits"),
                          "planes": self.meta.get("planes")},
            n_dirs=1 << self.part_bits)

    def candidates(self, query_vec: Sequence[float],
                   probe_bits: int = 2) -> DataFrame:
        """The pruned candidate scan (exposed for plan auditing):
        partition pruning on the bucket prefix + parquet row-group pushdown
        on the full bucket id."""
        q = np.asarray(list(query_vec), dtype=np.float64)
        qb = int(_bucket_of(q[None, :], self.planes)[0])
        targets = _probe_targets(qb, self.n_planes, probe_bits)
        shift = self.n_planes - self.part_bits
        prefixes = sorted({t >> shift for t in targets})
        return (self._scan_cache.get(self.spark, self.root,
                                     self.VEC_SCHEMA, self.meta)
                .filter(F.col("pb").isin(prefixes))
                .filter(F.col("bucket").isin(targets)))

    def topk(self, query_vec: Sequence[float], k: int = 10,
             probe_bits: int = 2) -> DataFrame:
        """(vec_id, cos) — approximate top-k via pruned scan + exact rerank."""
        return _cosine_rerank_topk(self.candidates(query_vec, probe_bits),
                                   query_vec, k, norm_col="norm")

    def topk_batch(self, query_vecs: Sequence[Sequence[float]], k: int = 10,
                   probe_bits: int = 2) -> DataFrame:
        """(qid, vec_id, cos) — N queries in ONE Spark job (qid = position
        in query_vecs). Per-query results are identical to topk(); the win
        is amortization: one pruned scan over the UNION of all probe
        buckets + one dispatch, instead of N jobs — the ~1-2s per-job
        overhead dominated single-query latency at scale
        (BENCH/ann_scale.json)."""
        if len(query_vecs) == 0:
            return self.spark.createDataFrame(
                [], "qid int, vec_id long, cos double")
        Q = np.asarray([list(q) for q in query_vecs], dtype=np.float64)
        qb = _bucket_of(Q, self.planes)
        route2qids: dict = {}
        for qi in range(Q.shape[0]):
            for t in _probe_targets(int(qb[qi]), self.n_planes, probe_bits):
                route2qids.setdefault(t, []).append(qi)
        shift = self.n_planes - self.part_bits
        prefixes = sorted({t >> shift for t in route2qids})
        cands = (self._scan_cache.get(self.spark, self.root,
                                      self.VEC_SCHEMA, self.meta)
                 .filter(F.col("pb").isin(prefixes))
                 .filter(F.col("bucket").isin(sorted(route2qids))))
        return _batch_rerank_topk(cands, Q, "bucket", route2qids, k)


class IvfIndex:
    """IVF-flat ANN index: k-means centroids → nearest-centroid partition →
    query probes the top-`nprobe` centroids and exact-reranks.

    The second scale path next to sign-LSH (AnnIndex): IVF adapts its
    partitioning to the data's cluster structure, so recall at a given scan
    fraction is typically higher on real embedding corpora. Layout mirrors
    AnnIndex: vectors/add=<g>/cid=<c>/*.parquet generation dirs + atomic
    meta.json (centroids persisted verbatim — queries are reproducible
    from disk alone; only generations in meta 'adds' are visible).

    Centroids: pass explicit `centroids`, or let build() run seeded Lloyd
    k-means on a driver-side sample (the standard IVF training shape:
    training is O(sample · k · iters) on one node, assignment is the
    distributed pass)."""

    VEC_SCHEMA = ("vec_id long, embedding array<float>, norm double, "
                  "cid int")

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        with open(os.path.join(root, "meta.json")) as f:
            self.meta = json.load(f)
        self.centroids = np.asarray(self.meta["centroids"], dtype=np.float64)
        self._scan_cache = _VectorsScanCache()

    @staticmethod
    def train_centroids(sample: np.ndarray, n_centroids: int, iters: int,
                        seed: int) -> np.ndarray:
        """Seeded Lloyd k-means (cosine geometry: rows are L2-normalized
        first, centroids renormalized each round — spherical k-means)."""
        rng = np.random.default_rng(seed)
        x = sample / np.maximum(np.linalg.norm(sample, axis=1,
                                               keepdims=True), 1e-12)
        c = x[rng.choice(len(x), size=min(n_centroids, len(x)),
                         replace=False)]
        for _ in range(iters):
            assign = np.argmax(x @ c.T, axis=1)
            for j in range(c.shape[0]):
                m = assign == j
                if m.any():
                    v = x[m].mean(axis=0)
                    c[j] = v / max(np.linalg.norm(v), 1e-12)
        return c

    @staticmethod
    def build(spark: SparkSession, df: DataFrame, root: str,
              id_col: str = "vec_id", vec_col: str = "embedding",
              centroids=None, n_centroids: int = 64,
              train_sample: int = 100_000, iters: int = 5,
              seed: int = 17) -> "IvfIndex":
        if centroids is None:
            # seeded RANDOM sample in ONE job: order by a seeded hash of the
            # id and take the first train_sample rows. Catalyst compiles
            # orderBy+limit to TakeOrderedAndProject (per-partition top-K
            # heap, no full sort, no shuffle of the corpus), so this is a
            # single scan — vs the former count()+sample() double scan. A
            # bare limit() without the hash order would take the first rows
            # of the first partitions, training k-means on whatever corpus
            # slice happens to sort first (silent recall collapse on
            # class/source-grouped tables); the hash order is uniform and
            # seed-deterministic.
            samp = (df.select(F.col(vec_col),
                              F.xxhash64(F.col(id_col),
                                         F.lit(seed)).alias("__h"))
                    .orderBy("__h").limit(train_sample)
                    .select(vec_col).collect())
            if not samp:
                raise ValueError("cannot build IvfIndex over an empty table")
            m = np.vstack([np.asarray(r[0], dtype=np.float64) for r in samp])
            centroids = IvfIndex.train_centroids(m, n_centroids, iters, seed)
        else:
            centroids = np.asarray(centroids, dtype=np.float64)
        cn = centroids / np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)

        os.makedirs(root, exist_ok=True)
        vec_dir = os.path.join(root, "vectors")
        # same lock discipline as AnnIndex.build (rebuild-vs-append race)
        with _meta_locked(root):
            shutil.rmtree(vec_dir, ignore_errors=True)  # clears old adds
            n_vectors = _write_vectors(
                df, _ivf_assign_fn(cn, id_col, vec_col),
                IvfIndex.VEC_SCHEMA, "cid", ("cid",),
                os.path.join(vec_dir, "add=0"), "overwrite", id_col,
                vec_col,
                min(int(cn.shape[0]),
                    spark.sparkContext.defaultParallelism))
            _commit_meta(root, {
                "n_centroids": int(cn.shape[0]), "dim": int(cn.shape[1]),
                "n_vectors": n_vectors, "centroids": cn.tolist(),
                "adds": [0], "ingested_batches": {}})
        return IvfIndex(spark, root)

    def append(self, df: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding",
               batch_id: Optional[int] = None) -> int:
        """Incrementally add vectors, assigned to the FROZEN centroids
        (identical cells to a rebuild with the same centroids), committed
        as a new add=<g> generation (see AnnIndex.append for the
        visibility/idempotency contract). Centroids are NOT retrained:
        cell balance can drift if the appended distribution shifts;
        rebuild when recall degrades (the IVF analogue of segment
        compaction). Returns the new total n_vectors."""
        return _append_generation(
            self, df, _ivf_assign_fn(self.centroids, id_col, vec_col),
            IvfIndex.VEC_SCHEMA, "cid", ("cid",), id_col, vec_col,
            batch_id, route_params={"centroids": self.meta["centroids"]},
            n_dirs=int(self.centroids.shape[0]))

    def probe_cids(self, query_vec: Sequence[float],
                   nprobe: int) -> List[int]:
        q = np.asarray(list(query_vec), dtype=np.float64)
        qn = q / max(np.linalg.norm(q), 1e-12)
        dots = self.centroids @ qn
        # top-nprobe by dot desc, cid asc on ties
        order = np.lexsort((np.arange(dots.size), -dots))[:nprobe]
        return sorted(int(i) for i in order)

    def candidates(self, query_vec: Sequence[float],
                   nprobe: int = 4) -> DataFrame:
        """Pruned scan: PartitionFilters on cid IN probe set."""
        cids = self.probe_cids(query_vec, nprobe)
        return (self._scan_cache.get(self.spark, self.root,
                                     self.VEC_SCHEMA, self.meta)
                .filter(F.col("cid").isin(cids)))

    def topk(self, query_vec: Sequence[float], k: int = 10,
             nprobe: int = 4) -> DataFrame:
        return _cosine_rerank_topk(self.candidates(query_vec, nprobe),
                                   query_vec, k, norm_col="norm")

    def topk_batch(self, query_vecs: Sequence[Sequence[float]], k: int = 10,
                   nprobe: int = 4) -> DataFrame:
        """(qid, vec_id, cos) — N queries in ONE job over the union of all
        probed cells; per-query results identical to topk() (see
        AnnIndex.topk_batch for the amortization rationale)."""
        if len(query_vecs) == 0:
            return self.spark.createDataFrame(
                [], "qid int, vec_id long, cos double")
        Q = np.asarray([list(q) for q in query_vecs], dtype=np.float64)
        route2qids: dict = {}
        for qi in range(Q.shape[0]):
            for cid in self.probe_cids(Q[qi], nprobe):
                route2qids.setdefault(cid, []).append(qi)
        cands = (self._scan_cache.get(self.spark, self.root,
                                      self.VEC_SCHEMA, self.meta)
                 .filter(F.col("cid").isin(sorted(route2qids))))
        return _batch_rerank_topk(cands, Q, "cid", route2qids, k)


def lsh_cosine_topk(df: DataFrame, query_vec: Sequence[float], k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_planes: int = 12, probe_bits: int = 2,
                    seed: int = 99) -> DataFrame:
    """Approximate top-k WITHOUT a persisted index: hash every vector into a
    sign-LSH bucket (one mapInPandas pass), prune to the query's multi-probe
    buckets, exact-rerank survivors. For repeated queries build an AnnIndex
    instead — this variant rescans the corpus per call (cheap math, full
    I/O)."""
    q = np.asarray(list(query_vec), dtype=np.float64)

    dim = q.size
    planes = _planes(dim, n_planes, seed)
    qb = int(_bucket_of(q[None, :], planes)[0])
    targets = _probe_targets(qb, n_planes, probe_bits)

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
                         n_planes: int = 10, seed: int = 99,
                         max_bucket: int = 1000, planes=None) -> DataFrame:
    """Embedding near-dup pairs (a, b, cos) with cos >= tau: sign-LSH bucket
    join then exact verification (near-identical vectors collide with high
    probability; recall grows with fewer planes).

    The bucket self-join is HARD-BOUNDED by max_bucket via the same
    _capped_bucket_pairs machinery as minhash/simhash: a degenerate corpus
    (millions of near-identical embeddings in ONE bucket) emits
    identical-embedding STAR pairs — O(n) — instead of O(n^2) candidates,
    and the exact-verify pass still scores every emitted pair. The grouping
    signature is the raw embedding array, so "identical" means bit-identical
    float32 vectors (the boilerplate-degenerate mass). Audit oversized
    buckets with dedup.lsh_oversize_stats over the bucketized frame.

    planes: optional explicit (n_planes, dim) float64 hyperplanes (e.g.
    data-derived, reproducible by an external oracle); default is the
    seeded Gaussian set, built lazily from the first batch's dim."""
    from pysearchlite_spark.operators.dedup import _capped_bucket_pairs

    if planes is not None:
        planes = np.asarray(planes, dtype=np.float64)

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes_b = planes  # per-partition lazy default (needs dim)
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
    # persist: candidate generation + the verify-side vector joins would
    # otherwise each re-execute the full-corpus Python bucketize scan
    b = df.mapInPandas(bucketize, schema).persist()
    cand = _capped_bucket_pairs(
        b.select(F.col("vec_id").alias("doc_id"), "bucket"), ["bucket"],
        b.select(F.col("vec_id").alias("doc_id"),
                 F.col(vec_col).alias("_sig")),
        max_bucket)
    pairs = (cand
             .join(b.select(F.col("vec_id").alias("a"),
                            F.col(vec_col).alias("va")), "a")
             .join(b.select(F.col("vec_id").alias("b"),
                            F.col(vec_col).alias("vb")), "b"))

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
