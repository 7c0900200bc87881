"""Deduplication operators for training-data pipelines.

All four families, each as a DataFrame plan designed for 100-TB inputs:
  * exact_dedup        — hash-groupBy on sha2(text); one shuffle on a 32-byte
                         key (never shuffles full text).
  * token_jaccard_pairs— exact Jaccard over distinct-token sets; candidate
                         pairs via an inverted-index self-join on shared
                         rare tokens (no crossJoin anywhere).
  * minhash_lsh_pairs  — shingle → 64-perm MinHash → banded LSH bucket join →
                         exact-Jaccard verification of candidates.
  * simhash_pairs      — 64-bit SimHash, HIERARCHICAL pigeonhole banding
                         (4×16-bit chunks; oversized buckets re-band under
                         32-bit two-chunk keys) → hamming verification.

Hashing is blake2b/crc32-based (deterministic across processes — never
Python's salted hash()). Heavy per-doc work is vectorized numpy inside
mapInPandas; joins/groupBys stay JVM-side.

Persist lifecycle: these operators persist() intermediates (signatures,
bucket frames) that the RETURNED lazy frame consumes multiple times; the
cache must outlive the return, so release is the caller's: unpersist via
spark.catalog.clearCache() (or targeted .unpersist()) after materializing
results when running many dedup passes in one long-lived session — the
bench harness does this between trials.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pysearchlite_spark.partitioning import spread_input

MERSENNE = (1 << 61) - 1


# ------------------------------------------------------------ exact dedup --

def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, keep_id, is_dup): keep_id = min doc_id among docs with
    byte-identical text. Shuffles only (hash, id) pairs. NULL text hashes
    as empty text (sha2(NULL) is NULL and NULL join keys never match, which
    would silently drop those rows from the output; the minhash/simhash
    tokenizer's fillna("") makes the same choice)."""
    h = df.select(F.col(id_col).alias("doc_id"),
                  F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256)
                  .alias("h"))
    keep = h.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    return (h.join(keep, "h")
            .select("doc_id", "keep_id",
                    (F.col("doc_id") != F.col("keep_id")).alias("is_dup")))


# ------------------------------------------------------- shingles/minhash --

_SHINGLE_MIX = np.uint64(1099511628211)  # FNV-1a prime (k-gram combine base)


def _token_hashes(uniques: np.ndarray, fn: str = "blake2b") -> np.ndarray:
    """64-bit hash per DISTINCT token — the only per-string hashing left;
    everything downstream works on uint64 vectors. fn='blake2b' (default,
    keyed for speed) or 'md5' (first 8 digest bytes big-endian — chosen
    because DuckDB can reproduce it exactly:
    ('0x'||substr(md5(t),1,16))::UBIGINT — making simhash/fingerprint
    SQL-verifiable end-to-end)."""
    out = np.empty(len(uniques), dtype=np.uint64)
    if fn == "md5":
        for i, t in enumerate(uniques):
            out[i] = int.from_bytes(
                hashlib.md5(t.encode()).digest()[:8], "big")
        return out
    for i, t in enumerate(uniques):
        out[i] = int.from_bytes(
            hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
    return out


def _shingle_hashes_batch(texts: pd.Series, k: int = 3,
                          short_rows: str = "whole") -> List[np.ndarray]:
    """Per row: SORTED DISTINCT word-k-gram shingle hashes (uint64).

    Vectorized across the whole batch: tokens are factorized once, blake2b
    runs once per DISTINCT token, and k-gram hashes are a polynomial combine
    (mod 2^64) of consecutive token hashes via shifted array multiplies —
    no per-shingle Python strings or hash calls (profiled as the whole cost
    of MinHash at bench scale). Rows shorter than k hash the whole row
    (short_rows='whole', the MinHash semantics: every doc gets a signature)
    or yield no shingles at all (short_rows='empty', the repeated-spans
    semantics: a doc shorter than the span length has no spans)."""
    from pysearchlite_spark.tokenizer import flat_tokens
    flat, lens = flat_tokens(texts)
    n = len(texts)
    if flat.size == 0:
        return [np.empty(0, np.uint64)] * n
    codes, uniques = pd.factorize(flat)
    h = _token_hashes(np.asarray(uniques, dtype=object))[codes]
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    # window hash for every start position j: poly over h[j:j+k] (mod 2^64)
    hw = h.copy()
    for step in range(1, k):
        hw = hw[: h.size - step] * _SHINGLE_MIX + h[step:]
    out: List[np.ndarray] = []
    for r in range(n):
        s, e = int(offs[r]), int(offs[r + 1])
        ln = e - s
        if ln == 0 or (ln < k and short_rows == "empty"):
            out.append(np.empty(0, np.uint64))
        elif ln < k:
            # whole-row shingle: same polynomial over the short row
            v = h[s]
            for j in range(s + 1, e):
                v = v * _SHINGLE_MIX + h[j]
            out.append(np.asarray([v], dtype=np.uint64))
        else:
            out.append(np.unique(hw[s:e - k + 1]))
    return out


_M61 = np.uint64(MERSENNE)


def _mod61(x: np.ndarray) -> np.ndarray:
    """x (u64) mod 2^61-1 via 2^61 ≡ 1 folding — bit-identical to
    numpy's `% MERSENNE` for every u64 input (property-tested) at ~2x
    the throughput (no integer division)."""
    x = (x >> np.uint64(61)) + (x & _M61)
    x = (x >> np.uint64(61)) + (x & _M61)
    return np.where(x >= _M61, x - _M61, x)


def _minhash_params(n_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n_perm: int = 64,
                       shingle_k: int = 3, seed: int = 7) -> DataFrame:
    """(doc_id, sig array<long>) — 64-permutation MinHash over word shingles,
    computed batch-vectorized (numpy (a*h+b) mod p, min over shingles)."""
    a, b = _minhash_params(n_perm, seed)
    # project to the two consumed columns BEFORE the Python hop (guide §4:
    # opaque functions ship every column) and spread a single-file scan
    df = spread_input(df.select(id_col, text_col))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sh = _shingle_hashes_batch(pdf[text_col], shingle_k)
            R = len(sh)
            sizes = np.fromiter((s.size for s in sh), dtype=np.int64,
                                count=R)
            sigm = np.full((n_perm, R), MERSENNE, dtype=np.uint64)
            nz = np.flatnonzero(sizes)
            if nz.size:
                H = np.concatenate([sh[i] for i in nz])
                starts = np.zeros(nz.size, dtype=np.int64)
                np.cumsum(sizes[nz][:-1], out=starts[1:])
                # permute + per-row min via reduceat, CHUNKED to 8 perms at
                # a time: one giant (64, total) reduceat is ~200x slower
                # (cache-hostile strides) and per-doc outer products pay one
                # numpy dispatch per doc — 8-row chunks are the sweet spot
                for p in range(0, n_perm, 8):
                    vals = _mod61(a[p:p + 8, None] * H[None, :]
                                  + b[p:p + 8, None])
                    sigm[p:p + 8, nz] = np.minimum.reduceat(
                        vals, starts, axis=1)
            sigs = list(sigm.astype(np.int64).T)
            yield pd.DataFrame({"doc_id": pdf[id_col], "sig": sigs})

    return df.mapInPandas(run, "doc_id long, sig array<long>")


def _capped_bucket_pairs(buckets: DataFrame, key_cols: List[str],
                         sig_df: DataFrame, max_bucket: int,
                         refine=None) -> DataFrame:
    """Candidate pairs (a, b) from LSH buckets with a HARD bucket-size bound.

    buckets: (doc_id, *key_cols) — one row per (doc, bucket). sig_df:
    (doc_id, _sig) — the full signature, joined onto the OVERSIZED subset
    only (carrying an n_perm-long array into every exploded band row
    would inflate the common path's cache and self-join input ~bands-fold).
    Small buckets (size <= max_bucket) self-join pairwise as usual. Oversized
    buckets — the degenerate case: millions of byte-identical boilerplate
    pages land in ONE bucket and a naive self-join is O(n^2) — are split by
    FULL signature: within an oversized bucket, docs sharing an identical
    signature are near-certain dups, so we emit STAR pairs
    (min doc_id, other) — linear in group size, and the exact-verify pass
    downstream still scores every emitted pair. (Pair OUTPUT for n identical
    docs is inherently O(n^2); the star shape keeps dedup utility — same
    connected components — with O(n) pairs.)

    Additionally the per-signature REPRESENTATIVES of an oversized bucket
    self-join with each other (when there are <= max_bucket distinct
    signatures in the bucket): two near-dup CLUSTERS sharing a degenerate
    bucket still get one connecting candidate edge, so connected components
    match the uncapped semantics whenever distinct-signature counts stay
    under the cap.

    What is dropped (never silently — audit via lsh_oversize_stats): pair
    coverage inside buckets with > max_bucket DISTINCT signatures. Each true
    near-dup pair has `bands` independent chances to collide in a smaller
    bucket elsewhere.

    refine: optional HIERARCHICAL-BANDING hook, refine(rep_rows) ->
    (refined buckets DataFrame, refined key_cols). Called with one
    REPRESENTATIVE row (doc_id, *key_cols) per (oversized bucket, distinct
    signature); the refined (finer-keyed) buckets run through one recursive
    capped pass (star/rep fallback still applies at the refined level),
    recovering pair coverage that the star/rep fallback alone loses when
    oversized buckets hold many DISTINCT signatures — the saturation regime
    at 10^9+ docs where every coarse bucket is hot."""
    def pairwise(b: DataFrame) -> DataFrame:
        # ONE exchange (groupBy bucket, collect the members) + a JVM
        # higher-order pair expansion, instead of a self-join that
        # shuffles AND sorts the bucket table twice. Safe by contract:
        # every caller bounds bucket size to <= max_bucket BEFORE pairing
        # (the fast path proved no bucket exceeds it; the capped path
        # splits oversized buckets off first), so no collected array can
        # exceed max_bucket elements. doc_ids are unique per bucket, so
        # the sorted array yields exactly the a < b pairs.
        g = (b.groupBy(*key_cols)
             .agg(F.array_sort(F.collect_list("doc_id")).alias("_ds"))
             .filter(F.size("_ds") >= 2))
        pair = F.flatten(F.transform(
            "_ds",
            lambda x, i: F.transform(
                F.slice("_ds", i + F.lit(2), F.size("_ds")),
                lambda y: F.struct(x.alias("a"), y.alias("b")))))
        return (g.select(F.explode(pair).alias("_p"))
                .select(F.col("_p.a").alias("a"), F.col("_p.b").alias("b")))

    # FAST PATH: one cheap map-side-combined count over the (persisted)
    # buckets decides whether any bucket exceeds the cap; the common healthy
    # corpus skips the annotate/split machinery entirely and runs the plain
    # self-join plan.
    over = (buckets.groupBy(*key_cols).agg(F.count("*").alias("_bsz"))
            .filter(F.col("_bsz") > max_bucket).drop("_bsz"))
    if over.limit(1).count() == 0:
        return pairwise(buckets).distinct()

    # capped path: tag rows by membership in an oversized bucket. The `over`
    # side holds one row per oversized bucket (<= rows/max_bucket of them) —
    # small by construction, so AQE broadcasts it; a pathological corpus
    # where it is huge degrades to a shuffle join, never to O(n^2) pairs.
    annotated = buckets.join(over.withColumn("_over", F.lit(True)),
                             key_cols, "left")
    small = annotated.filter(F.col("_over").isNull()).drop("_over")
    big = annotated.filter(F.col("_over").isNotNull()).drop("_over")

    pair_small = pairwise(small)

    # oversized: join the full signature on, group by (bucket, signature)
    # → star pairs to the group representative (linear in group size)
    big = big.join(sig_df, "doc_id")
    gkey = key_cols + ["_sig"]
    reps = big.groupBy(*gkey).agg(F.min("doc_id").alias("_rep"))
    pair_star = (big.join(reps, gkey)
                 .filter(F.col("doc_id") != F.col("_rep"))
                 .select(F.col("_rep").alias("a"),
                         F.col("doc_id").alias("b")))

    # rep-level pairwise join, itself capped at max_bucket reps per bucket
    rep_rows = reps.select(*key_cols, F.col("_rep").alias("doc_id"))
    rsz = rep_rows.groupBy(*key_cols).agg(F.count("*").alias("_rsz"))
    reps_small = (rep_rows.join(rsz, key_cols)
                  .filter(F.col("_rsz") <= max_bucket).drop("_rsz"))
    pair_reps = pairwise(reps_small)

    out = pair_small.union(pair_star).union(pair_reps)
    if refine is not None:
        # refine REPRESENTATIVES only (one doc per oversized-bucket ×
        # distinct-signature): identical-sig members are already star-
        # connected to their rep, and a rep shares the FULL signature with
        # its group so it lands in exactly the same refined buckets —
        # connected components are preserved while a boilerplate-degenerate
        # bucket contributes 1 refinement row instead of millions.
        refined, refined_keys = refine(rep_rows)
        # persist: the recursive pass consumes the refined frame >= 3 times
        # (fast-path probe, annotate join, both self-join sides) and its
        # lineage re-runs the rep join + explode otherwise
        refined = refined.persist()
        out = out.union(_capped_bucket_pairs(refined, refined_keys, sig_df,
                                             max_bucket))
    return out.distinct()


def lsh_oversize_stats(buckets: DataFrame, key_cols: List[str],
                       max_bucket: int) -> DataFrame:
    """(bucket key..., bsz) for buckets over the cap — the audit view for
    'what did the cap touch'. Callers (and tests) can count/log it; it reuses
    the same aggregate the capped join computes."""
    return (buckets.groupBy(*key_cols).agg(F.count("*").alias("bsz"))
            .filter(F.col("bsz") > max_bucket))


def _band_explode(sigs: DataFrame, n_perm: int, bands: int) -> DataFrame:
    """(doc_id, band, bh) from a signatures frame — sig itself is NOT
    carried (bands-fold duplication of the array)."""
    rows = n_perm // bands
    band_cols = [
        F.struct(F.lit(i).alias("band"),
                 F.hash(F.slice("sig", i * rows + 1, rows)).alias("bh"))
        for i in range(bands)
    ]
    return (sigs.select("doc_id",
                        F.explode(F.array(*band_cols)).alias("b"))
            .select("doc_id", "b.band", "b.bh"))


def minhash_buckets(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", n_perm: int = 64,
                    bands: int = 16, shingle_k: int = 3,
                    seed: int = 7) -> DataFrame:
    """(doc_id, band, bh) — one row per (doc, band): the exploded LSH
    bucket assignment, shared by minhash_lsh_pairs and its audit view."""
    sigs = minhash_signatures(df, id_col, text_col, n_perm, shingle_k, seed)
    return _band_explode(sigs, n_perm, bands)


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n_perm: int = 64,
                      bands: int = 16, shingle_k: int = 3,
                      threshold: float = 0.5, seed: int = 7,
                      max_bucket: int = 1000,
                      _registry: list | None = None) -> DataFrame:
    """Near-dup pairs (a, b, jaccard) with estimated Jaccard >= threshold.

    Plan: signatures → explode per band → groupBy(band, band_hash) bucket
    join (self-join on bucket key, a<b) → dedupe candidates → verify with
    exact shingle Jaccard (second pass joins shingle sets only for
    candidates). The bucket self-join is the only all-pairs-risk step and is
    HARD-BOUNDED by max_bucket: oversized buckets (boilerplate-degenerate
    corpora) fall back to identical-signature star pairs instead of a
    quadratic self-join — see _capped_bucket_pairs. Audit oversized buckets
    with lsh_oversize_stats(minhash_buckets(df), ["band", "bh"], max_bucket).

    _registry: optional list; every frame this call persist()s is appended
    so a long-lived caller can unpersist exactly these (instead of a
    session-wide clearCache) once the results are materialized."""
    sigs = minhash_signatures(df, id_col, text_col, n_perm, shingle_k,
                              seed).persist()
    buckets = _band_explode(sigs, n_perm, bands).persist()
    # persisted: the candidate set feeds THREE consumers (the distinct-doc
    # union for the verify-side text join, and both sides of the final
    # pair join) — without it the bucket self-join re-executes per consumer
    # (same finding as ADVICE's neardup.check cand double-execution)
    cand = _capped_bucket_pairs(buckets, ["band", "bh"],
                                sigs.select("doc_id",
                                            F.col("sig").alias("_sig")),
                                max_bucket).persist()
    if _registry is not None:
        _registry.extend([sigs, buckets, cand])

    # exact verification on shingle sets of candidate docs only; the text
    # side is spread BEFORE the join so a broadcast of toks_needed cannot
    # pin the downstream shingle UDF to the raw scan's partition count.
    # (Join-first-then-spread was A/B'd and is ~0.3-0.5 s SLOWER at 50k:
    # the broadcast probe then rides the 1-2-task scan, and that serial
    # probe costs more than round-robining the text column once.)
    toks_needed = (cand.select(F.col("a").alias("doc_id"))
                   .union(cand.select("b")).distinct())
    base = spread_input(df.select(F.col(id_col).alias("doc_id"),
                                  F.col(text_col).alias("text")))
    docs = base.join(toks_needed, "doc_id")

    def shingle_sets(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sh = _shingle_hashes_batch(pdf["text"], shingle_k)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "sh": [s.astype(np.int64).tolist() for s in sh]})

    # persisted: sh feeds BOTH sides of the verification join — without it
    # the candidate join + shingle UDF pass executes twice in one action
    sh = docs.mapInPandas(shingle_sets,
                          "doc_id long, sh array<long>").persist()
    if _registry is not None:
        _registry.append(sh)
    joined = (cand
              .join(sh.withColumnRenamed("doc_id", "a")
                      .withColumnRenamed("sh", "sha_"), "a")
              .join(sh.withColumnRenamed("doc_id", "b")
                      .withColumnRenamed("sh", "shb_"), "b"))
    inter = F.size(F.array_intersect("sha_", "shb_"))
    union = F.size(F.array_union("sha_", "shb_"))
    out = (joined
           .withColumn("jaccard", F.when(union > 0,
                                         inter.cast("double") / union)
                       .otherwise(0.0))
           .filter(F.col("jaccard") >= threshold)
           .select("a", "b", F.round("jaccard", 6).alias("jaccard")))
    return out


# ------------------------------------------------------ exact jaccard pairs --

def token_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", threshold: float = 0.5,
                        max_df: int = 1000) -> DataFrame:
    """Exact Jaccard similarity over DISTINCT-token sets for all pairs
    sharing >= 1 token with df <= max_df (rare-token candidate generation —
    the inverted-index join; stop-word-frequency tokens are excluded from
    candidate generation, which is exact for thresholds > 0 only when pairs
    share at least one sub-max_df token; used with the SQL oracle at small
    scale with max_df = +inf)."""
    from pysearchlite_spark.plans.builder import make_tokens_udf
    toks = (spread_input(df.select(F.col(id_col).alias("doc_id"),
                                   F.col(text_col).alias("_t")))
            .select("doc_id",
                    F.array_distinct(make_tokens_udf()(F.col("_t")))
                    .alias("ts"))
            .withColumn("n", F.size("ts")))
    toks = toks.persist()
    inv = toks.select("doc_id", F.explode("ts").alias("t"))
    tdf = inv.groupBy("t").agg(F.count("*").alias("df"))
    inv = inv.join(tdf.filter(F.col("df") <= max_df), "t")
    cand = (inv.alias("x").join(inv.alias("y"),
                                (F.col("x.t") == F.col("y.t")) &
                                (F.col("x.doc_id") < F.col("y.doc_id")))
            .select(F.col("x.doc_id").alias("a"),
                    F.col("y.doc_id").alias("b"))
            .distinct())
    j = (cand.join(toks.select(F.col("doc_id").alias("a"),
                               F.col("ts").alias("tsa"),
                               F.col("n").alias("na")), "a")
         .join(toks.select(F.col("doc_id").alias("b"),
                           F.col("ts").alias("tsb"),
                           F.col("n").alias("nb")), "b"))
    inter = F.size(F.array_intersect("tsa", "tsb"))
    jac = inter.cast("double") / (F.col("na") + F.col("nb") - inter)
    return (j.withColumn("jaccard", F.round(jac, 6))
            .filter(F.col("jaccard") >= threshold)
            .select("a", "b", "jaccard"))


# ---------------------------------------------------------------- simhash --

def simhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       hash_fn: str = "blake2b") -> DataFrame:
    """(doc_id, simhash long): 64-bit SimHash — per-token hash bits
    weighted by tf, vectorized with numpy bit unpacking. hash_fn='md5'
    makes the whole value reproducible in ANSI SQL (see _token_hashes)."""
    df = spread_input(df.select(id_col, text_col))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pysearchlite_spark.tokenizer import flat_tokens
        for pdf in batches:
            n = len(pdf)
            flat, lens = flat_tokens(pdf[text_col])
            if flat.size == 0:
                yield pd.DataFrame({"doc_id": pdf[id_col],
                                    "simhash": np.zeros(n, dtype=np.int64)})
                continue
            codes, uniques = pd.factorize(flat)
            th = _token_hashes(np.asarray(uniques, dtype=object), hash_fn)
            offs = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lens, out=offs[1:])
            # per-row bit accumulator: acc[r,b] = 2*ones[r,b] - len_r where
            # ones counts occurrences whose token has bit b set (tf weighting
            # == occurrence counting); sign bit per position, batch-wide
            sim = np.zeros(n, dtype=np.uint64)
            occ_cum = np.empty(flat.size + 1, dtype=np.int64)
            for bpos in range(64):
                bit_u = ((th >> np.uint64(bpos)) & np.uint64(1)).astype(np.int64)
                occ_cum[0] = 0
                np.cumsum(bit_u[codes], out=occ_cum[1:])
                ones = occ_cum[offs[1:]] - occ_cum[offs[:-1]]
                pos = (2 * ones - lens) > 0
                sim |= pos.astype(np.uint64) << np.uint64(bpos)
            yield pd.DataFrame({"doc_id": pdf[id_col],
                                "simhash": sim.astype(np.int64)})

    return df.mapInPandas(run, "doc_id long, simhash long")


def _chunk_structs(col: str, c_name: str, v_name: str) -> List:
    return [F.struct(F.lit(i).alias(c_name),
                     F.shiftrightunsigned(col, 16 * i)
                     .bitwiseAND(F.lit(0xFFFF)).alias(v_name))
            for i in range(4)]


def simhash_buckets(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    hash_fn: str = "blake2b") -> DataFrame:
    """(doc_id, c, v, simhash) — exploded 4×16-bit pigeonhole chunks."""
    sigs = simhash_signatures(df, id_col, text_col, hash_fn)
    return (sigs.select("doc_id", "simhash",
                        F.explode(F.array(
                            *_chunk_structs("simhash", "c", "v"))).alias("ch"))
            .select("doc_id", "simhash", "ch.c", "ch.v"))


def simhash_pairs_from_sigs(sigs: DataFrame, max_hamming: int = 3,
                            max_bucket: int = 1000) -> DataFrame:
    """Near-dup pairs (a, b, hamming) from a (doc_id, simhash) frame via
    HIERARCHICAL pigeonhole banding.

    Level 1: 4 × 16-bit chunks — any pair within hamming 3 agrees on >= 1
    chunk, so the bucket join over chunks is a complete candidate set.
    Chunk values are only 16-bit, so at 10^9+ docs EVERY level-1 bucket is
    hot (avg n/65536 members) and the capped self-join alone would degrade
    to identical-simhash star pairs. Level 2 (the refine hook): members of
    an OVERSIZED (c, v) bucket re-bucket under (c, v, c2, v2) for every
    second chunk c2 > c — 32-bit keys, avg n/2^32 members — before the
    star/rep fallback applies at that finer level.

    Coverage: hamming <= max_hamming pairs in healthy buckets (level 1);
    pairs agreeing on >= 2 chunks (hamming <= 2 guaranteed by pigeonhole,
    plus lucky hamming-3 splits) even when every level-1 bucket containing
    them is oversized (level 2); identical-signature mass always (star
    pairs). The one remaining drop: hamming-3 pairs with errors in 3
    distinct chunks whose single clean chunk's bucket is oversized AND
    whose 32-bit refined buckets exceed the cap too — audit via
    lsh_oversize_stats at either key granularity."""
    b = (sigs.select("doc_id", "simhash",
                     F.explode(F.array(
                         *_chunk_structs("simhash", "c", "v"))).alias("ch"))
         .select("doc_id", "simhash", "ch.c", "ch.v").persist())
    # persisted: consumed by the capped pass (oversized join + refine hook)
    # and twice more as the verify-side signature lookup
    sig_df = (b.select("doc_id", F.col("simhash").alias("_sig"))
              .distinct().persist())

    def refine(big: DataFrame):
        # oversized (c, v) members → (c, v, c2, v2) for each c2 > c. The
        # c2 > c restriction is lossless: a pair clean on chunks {c, c2}
        # (c < c2) is caught at level 1 when either bucket is small, else
        # both are oversized and bucket c's refinement emits the shared
        # (c, v, c2, v2) key.
        withsig = big.join(sig_df, "doc_id")
        return ((withsig.select(
            "doc_id", "c", "v",
            F.explode(F.array(
                *_chunk_structs("_sig", "c2", "v2"))).alias("ch"))
            .select("doc_id", "c", "v", "ch.c2", "ch.v2")
            .filter(F.col("c2") > F.col("c"))),
            ["c", "v", "c2", "v2"])

    # persisted: consumed by both sides of the verify join below — without
    # it the capped bucket join re-executes per consumer
    cand = _capped_bucket_pairs(b.select("doc_id", "c", "v"), ["c", "v"],
                                sig_df, max_bucket, refine=refine).persist()
    # reuse sig_df (same distinct aggregation, different column name)
    s = sig_df.select("doc_id", F.col("_sig").alias("simhash"))
    cand = (cand
            .join(s.select(F.col("doc_id").alias("a"),
                           F.col("simhash").alias("sa")), "a")
            .join(s.select(F.col("doc_id").alias("b"),
                           F.col("simhash").alias("sb")), "b"))
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (cand.withColumn("hamming", ham)
            .filter(F.col("hamming") <= max_hamming)
            .select("a", "b", "hamming"))


def simhash_pairs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", max_hamming: int = 3,
                  max_bucket: int = 1000,
                  hash_fn: str = "blake2b") -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming — SimHash over
    tokens, then hierarchical banded candidate generation + exact hamming
    verification (see simhash_pairs_from_sigs for the banding guarantees).
    Audit with lsh_oversize_stats(simhash_buckets(df), ["c", "v"],
    max_bucket)."""
    return simhash_pairs_from_sigs(
        simhash_signatures(df, id_col, text_col, hash_fn),
        max_hamming, max_bucket)


# -------------------------------------------------- repeated span detection --

def _span_array_frame(df: DataFrame, id_col: str, text_col: str,
                      n: int) -> DataFrame:
    """(doc_id, ks array<long>): each doc's DISTINCT n-token span hashes
    (the 64-bit polynomial window hash — the MinHash combine over blake2b
    token hashes; vectorized, no span strings materialized, content-derived
    so keys agree across partitions/jobs). The ARRAY form is the shared
    tokenize product: per-doc span counts fall out as size(ks) with no
    explode/shuffle, and the cross-doc aggregations explode it exactly
    once. Shared by repeated_spans and span_contamination."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def spans_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for b in batches:
            yield pd.Series(
                [a.astype(np.int64) for a in
                 _shingle_hashes_batch(b, k=n, short_rows="empty")],
                index=b.index)

    return (spread_input(df.select(F.col(id_col).alias("doc_id"),
                                   F.col(text_col).alias("_t")))
            .select("doc_id", spans_udf(F.col("_t")).alias("ks")))


def _span_key_frame(df: DataFrame, id_col: str, text_col: str,
                    n: int) -> DataFrame:
    """(doc_id, k): one row per DISTINCT n-token span of each doc — the
    exploded form of _span_array_frame."""
    return (_span_array_frame(df, id_col, text_col, n)
            .select("doc_id", F.explode("ks").alias("k")))


def repeated_spans(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", n: int = 20,
                   cache: bool = True) -> DataFrame:
    """Cross-document repeated n-token-span detection — the exact-substring
    duplication signal of Lee et al. 2021 ("Deduplicating Training Data
    Makes Language Models Better"; theirs is a corpus suffix array, the
    shuffle-native equivalent is grouping on span keys). Per doc:

      (doc_id, n_spans, dup_spans, dup_span_frac)

    n_spans = the doc's DISTINCT n-token spans; dup_spans = how many of
    those also occur in >= 2 documents (including this one — a span
    repeated only WITHIN one doc does not count; repetition_stats covers
    that axis); docs with < n tokens report 0.

    Plan shape for 100 TB: ONE Arrow-batched pass hashes every doc's
    distinct n-token spans to 64-bit keys (the MinHash module's
    polynomial window combine over blake2b token hashes — vectorized,
    no span strings or md5 ever materialized; measured ~4x the JVM
    concat_ws/md5 formulation at n=20, and the exchange carries 8-byte
    longs instead of 32-char digests), then two aggregations over the
    persisted (doc_id, span_hash) frame:

      * groupBy(span key) with map-side partial counts — a boilerplate
        span occurring in 10^7 docs (exactly what this detects) reduces
        to per-partition partials instead of buffering one 10^7-row
        window group in a single task;
      * dup_spans is derived as n_spans − globally-UNIQUE spans: only
        count==1 span groups (whose single row still knows its owner doc)
        flow into the second aggregate, so hot keys never cross another
        exchange at full multiplicity.

    The persist is load-bearing (both aggregates consume the tokenizer
    UDF output; without it the corpus tokenizes twice) — release is the
    caller's, per the module persist-lifecycle note. Two distinct spans
    colliding on the 64-bit key would merge (p ~ n_spans^2/2^64 — a
    handful of mislabeled spans per 10^12, fine for a dup SIGNAL; the SQL
    oracle keeps exact string spans, so a collision in a test corpus
    would surface as a parity failure, not pass silently).

    cache=False trades a second tokenize pass for not holding storage a
    caller with no unpersist hook (e.g. a long-lived harness consuming
    the lazy frame) would otherwise leak."""
    arr = _span_array_frame(df, id_col, text_col, n)
    if cache:
        arr = arr.persist()
    # n_spans = size of the distinct-span array: ZERO shuffle (the former
    # explode → groupBy(doc_id) re-aggregation of the full span table paid
    # one extra pass + exchange for a number the array already knows)
    tot = arr.select("doc_id", F.size("ks").alias("n_spans"))
    ex = arr.select("doc_id", F.explode("ks").alias("k"))
    uniq = (ex.groupBy("k")
            .agg(F.count("*").alias("nd"), F.first("doc_id").alias("doc_id"))
            .filter(F.col("nd") == 1)
            .groupBy("doc_id").agg(F.count("*").alias("uniq_spans")))
    zero = F.lit(0).cast("long")
    n_spans = F.coalesce("n_spans", zero)
    dup = n_spans - F.coalesce("uniq_spans", zero)
    # tot is 1:1 with df (the span UDF preserves cardinality and emits an
    # empty array — not a dropped row — for short/null docs), so it IS the
    # every-doc base: re-joining df's ids would re-scan the corpus and add
    # a join exchange for an identity mapping
    return (tot.join(uniq, "doc_id", "left")
            .select(
                "doc_id",
                n_spans.alias("n_spans"),
                dup.alias("dup_spans"),
                F.round(F.when(n_spans > 0, dup.cast("double") / n_spans)
                        .otherwise(0.0), 6).alias("dup_span_frac")))


def span_contamination(df: DataFrame, probe_df: DataFrame,
                       id_col: str = "doc_id", text_col: str = "text",
                       probe_text_col: str = "text",
                       n: int = 8, cache: bool = True) -> DataFrame:
    """Benchmark decontamination signal: for each corpus doc, how many of
    its DISTINCT n-token spans also occur anywhere in `probe_df` (the
    eval/benchmark set a training corpus must not leak) — the standard
    n-gram-overlap decontamination check (GPT-3 appendix C / PaLM-style),
    restated over this engine's span-hash machinery. Per doc:

      (doc_id, n_spans, contaminated_spans, contamination_frac)

    Docs with < n tokens report 0 (they cannot leak an n-gram).

    Plan shape for 100 TB: the CORPUS side never shuffles by span — probe
    spans (benchmarks are tiny next to the corpus) are hashed, dedup'd,
    and BROADCAST; corpus spans stream map-side through a broadcast
    left-semi probe, then ONE exchange on doc_id aggregates the per-doc
    counts. The persisted span frame serves both the total and the
    contaminated count (one tokenize pass). Same 64-bit span-hash
    collision acceptance as repeated_spans — the SQL oracle keeps exact
    string spans, so a test-corpus collision fails parity loudly.
    cache=False: see repeated_spans."""
    arr = _span_array_frame(df, id_col, text_col, n)
    if cache:
        arr = arr.persist()
    # the probe side needs no id of its own — only its distinct span keys
    probe_keys = (_span_key_frame(
        probe_df.select(F.lit(0).alias("_pid"),
                        F.col(probe_text_col)), "_pid", probe_text_col, n)
        .select("k").distinct())
    # n_spans from the array — no explode/shuffle (see repeated_spans)
    tot = arr.select("doc_id", F.size("ks").alias("n_spans"))
    ex = arr.select("doc_id", F.explode("ks").alias("k"))
    hits = (ex.join(F.broadcast(probe_keys), "k", "left_semi")
            .groupBy("doc_id").agg(F.count("*").alias("contaminated_spans")))
    zero = F.lit(0).cast("long")
    n_spans = F.coalesce("n_spans", zero)
    cont = F.coalesce("contaminated_spans", zero)
    # tot is the every-doc base — see the repeated_spans note
    return (tot.join(hits, "doc_id", "left")
            .select(
                "doc_id",
                n_spans.alias("n_spans"),
                cont.alias("contaminated_spans"),
                F.round(F.when(n_spans > 0, cont.cast("double") / n_spans)
                        .otherwise(0.0), 6).alias("contamination_frac")))
