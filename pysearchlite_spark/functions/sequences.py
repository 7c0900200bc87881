"""Training-sequence export — the last mile of the training-data
pipeline: turn cleaned documents into fixed-length token-id sequences
ready for a dataloader (cleanse → sample → CHUNK → write shards).

`chunk_tokens(df, seq_len)` tokenizes with the ENGINE tokenizer (exact
`[A-Za-z0-9]+`-then-lower semantics — the same vectorized Arrow UDF the
index build uses, so a corpus chunks identically to how it indexes),
maps every token to a deterministic 60-bit id (first 15 hex digits of
md5(token) — exactly representable in a signed 64-bit integer AND
reproducible in DuckDB as ('0x'||substr(md5(t),1,15))::BIGINT, keeping
the export oracle-checkable end-to-end), and splits each document into
`seq_len`-sized chunks (last chunk ragged, never padded — padding
policy belongs to the dataloader).

Two packing policies:
  * `chunk_tokens` — per-doc chunking; chunks never cross document
    boundaries (retrieval-friendly, each chunk traceable to its doc).
  * `pack_tokens` — cross-doc packed sequences in doc_id order (the
    GPT-pretraining dataloader shape, optional EOD separator). The
    global order this needs is made deterministic AND distributed by a
    two-phase prefix sum over doc_id-range buckets — never a global
    single-task window, and never partitioning-dependent (the output
    is a pure function of corpus + seq_len + eod_id; test-enforced).

Scale shape: tokenize (one Arrow-batched UDF, the only Python) →
token→id mapping, chunk-start generation, slicing and the explode all
JVM-side (`transform`/`sequence`/`slice`/`posexplode` inside
whole-stage codegen). ZERO shuffles — a pure flatMap of the corpus; at
100 TB this is one read + one write. Row growth is bounded:
ceil(n_tokens/seq_len) rows per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_tokens", "pack_tokens"]


def _token_ids(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, _ids): each doc's engine-token 60-bit md5 id stream;
    docs with no tokens are dropped (they contribute nothing)."""
    from pysearchlite_spark.plans.builder import make_tokens_udf

    from pysearchlite_spark.partitioning import spread_input

    toks = make_tokens_udf()(F.col("_x"))
    ids = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10)
        .cast("long"))
    return (spread_input(df.select(F.col(id_col).alias("doc_id"),
                                   F.col(text_col).alias("_x")))
            .select("doc_id", ids.alias("_ids"))
            .filter(F.size("_ids") > 0))


def chunk_tokens(df: DataFrame, seq_len: int, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(doc_id, chunk_id, n_tokens, token_ids): each doc's engine-token
    id stream split into `seq_len`-sized chunks. Docs with no tokens
    produce no rows. chunk_id is 0-based and dense per doc."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    base = _token_ids(df, id_col, text_col)  # empty docs dropped before
                                             # explode: sequence(0,-1)
                                             # would descend, not be empty
    n_chunks = F.ceil(F.size("_ids") / F.lit(seq_len)).cast("int")
    exploded = base.select(
        "doc_id", "_ids",
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1))
        .alias("chunk_id", "_start"))
    chunk = F.slice(F.col("_ids"), F.col("_start") * seq_len + 1, seq_len)
    return exploded.select("doc_id", "chunk_id",
                           F.size(chunk).alias("n_tokens"),
                           chunk.alias("token_ids"))


def pack_tokens(df: DataFrame, seq_len: int, eod_id: int | None = None,
                id_col: str = "doc_id", text_col: str = "text",
                n_buckets: int | None = None) -> DataFrame:
    """Cross-document PACKED training sequences (the GPT-pretraining
    dataloader shape): concatenate every doc's engine-token id stream in
    doc_id order — optionally with `eod_id` appended after each doc —
    and split the single global stream into `seq_len`-sized sequences
    (only the final one ragged). Returns (seq_id, n_tokens, token_ids);
    `seq_id` is the 0-based global sequence index. Unlike
    `chunk_tokens`, sequences CROSS document boundaries, so there is no
    per-chunk padding waste.

    Determinism: the output depends only on (corpus, seq_len, eod_id) —
    never on partitioning or `n_buckets` (test-enforced). The global
    token offset of each doc is an exact prefix sum over doc_id order,
    computed scalably in two phases instead of one global-order window
    (which would serialize onto a single task):

      1. bucket docs by COUNT-BALANCED doc_id borders (an approxQuantile
         sample of the id column — any monotone step function of doc_id
         preserves stream order, and quantile borders stay balanced even
         when ids cluster in a narrow range, where the former VALUE-range
         split degraded to a handful of effective buckets → one giant
         per-bucket window sort); per-bucket token totals — n_buckets
         tiny rows — come to the driver, which forms exclusive bucket
         offsets and broadcasts them back;
      2. within each bucket an exclusive running sum over doc_id
         (window PARTITIONED by bucket — parallel across buckets).

    Each doc then contributes a slice to every sequence it overlaps
    (≤ ceil(n/seq_len)+1 rows per doc) and ONE shuffle by seq_id
    reassembles sequences via sorted-struct flatten; a group holds at
    most seq_len tokens, so reduce-side memory is bounded by seq_len
    regardless of corpus size. n_buckets=None (default) auto-sizes from
    the input row count (~100k docs per bucket, floored at the cluster's
    default parallelism, capped at 4 waves) — borders only steer balance,
    never results.

    The tokenized (doc_id, _ids, _n) relation is persisted — it feeds
    the totals pass and the assembly pass; release is the caller's job
    (repo convention), or `spark.catalog.clearCache()`.

    Empty/NULL docs contribute nothing (no EOD either — an EOD marks
    the end of actual content, and oracle-side reproduction needs the
    same rule).
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    if n_buckets is not None and n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    from pyspark.sql import Window

    spark = df.sparkSession
    out_schema = "seq_id long, n_tokens int, token_ids array<long>"
    # count + quantile borders from the RAW input's id column: one cheap
    # id-only scan, nothing tokenized yet
    ids_only = df.select(F.col(id_col).cast("long").alias("doc_id"))
    n_rows = ids_only.count()
    if n_rows == 0:
        return spark.createDataFrame([], out_schema)
    if n_buckets is None:
        par = spark.sparkContext.defaultParallelism
        n_buckets = max(1, min(4 * par, max(par, n_rows // 100_000 + 1)))
    n_buckets = min(n_buckets, n_rows)
    # COUNT-BALANCED borders: a quantile sample of doc_id. Any fixed,
    # sorted border list yields a bucket function monotone in doc_id
    # (order preserved), and the output is invariant to bucketing, so the
    # sample's approximation error only affects balance. Duplicate
    # borders (heavy id clustering) are deduped — fewer, fuller buckets.
    if n_buckets > 1:
        qs = [i / n_buckets for i in range(1, n_buckets)]
        borders = sorted({int(b) for b in
                          ids_only.approxQuantile("doc_id", qs, 0.001)})
    else:
        borders = []
    if borders:
        barr = F.array(*[F.lit(int(b)).cast("long") for b in borders])
        # bucket = how many borders are strictly below this id — a
        # monotone step function of doc_id, O(n_buckets) JVM comparisons
        bucket = F.size(F.filter(barr,
                                 lambda b: b < F.col("doc_id"))).cast("long")
    else:
        bucket = F.lit(0).cast("long")

    base = _token_ids(df, id_col, text_col)
    if eod_id is not None:
        base = base.withColumn(
            "_ids", F.concat("_ids",
                             F.array(F.lit(int(eod_id)).cast("long"))))
    base = (base
            .withColumn("_n", F.size("_ids").cast("long"))
            .withColumn("_b", bucket)
            .persist())

    # phase 1: exclusive per-bucket offsets (n_buckets rows -> driver)
    totals = {int(r["_b"]): int(r["t"]) for r in
              base.groupBy("_b").agg(F.sum("_n").alias("t")).collect()}
    if not totals:
        return spark.createDataFrame([], out_schema)
    run = 0
    offs = []
    for k in sorted(totals):
        offs.append((k, run))
        run += totals[k]
    off_df = spark.createDataFrame(offs, "_b long, _boff long")

    # phase 2: exclusive running sum WITHIN each bucket (parallel)
    w = (Window.partitionBy("_b").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    placed = (base.join(F.broadcast(off_df), "_b")
              .withColumn("_doff", F.coalesce(F.sum("_n").over(w),
                                              F.lit(0).cast("long"))
                          + F.col("_boff"))
              .withColumn("_dend", F.col("_doff") + F.col("_n")))

    # one contribution row per (doc, overlapped sequence)
    first_seq = (F.col("_doff") / seq_len).cast("long")
    last_seq = ((F.col("_dend") - 1) / seq_len).cast("long")
    contrib = placed.select(
        "_ids", "_doff", "_dend",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"))
    g_start = F.greatest(F.col("_doff"), F.col("seq_id") * seq_len)
    g_end = F.least(F.col("_dend"), (F.col("seq_id") + 1) * seq_len)
    parts = contrib.select(
        "seq_id", g_start.alias("_gs"),
        F.slice(F.col("_ids"),
                (g_start - F.col("_doff") + 1).cast("int"),
                (g_end - g_start).cast("int")).alias("_piece"))

    # assembly: ONE exchange by seq_id; sorted-struct flatten keeps the
    # stream order ((_gs ranges are disjoint, so struct order == _gs
    # order); each group is <= seq_len tokens
    packed = (parts.groupBy("seq_id")
              .agg(F.flatten(F.transform(
                  F.sort_array(F.collect_list(F.struct("_gs", "_piece"))),
                  lambda s: s["_piece"])).alias("token_ids")))
    return packed.select("seq_id",
                         F.size("token_ids").alias("n_tokens"),
                         "token_ids")
