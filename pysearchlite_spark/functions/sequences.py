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

Per-doc chunking only: chunks never cross document boundaries (the
standard document-packed alternative needs a global order and is
partitioning-dependent — indeterminism this repo's oracle discipline
rejects). Cross-doc packing density can be recovered downstream by the
dataloader concatenating chunks.

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

__all__ = ["chunk_tokens"]


def chunk_tokens(df: DataFrame, seq_len: int, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(doc_id, chunk_id, n_tokens, token_ids): each doc's engine-token
    id stream split into `seq_len`-sized chunks. Docs with no tokens
    produce no rows. chunk_id is 0-based and dense per doc."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    from pysearchlite_spark.plans.builder import make_tokens_udf

    toks = make_tokens_udf()(F.col(text_col))
    ids = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10)
        .cast("long"))
    base = (df.select(F.col(id_col).alias("doc_id"), ids.alias("_ids"))
            .filter(F.size("_ids") > 0))  # before explode: sequence(0,-1)
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
