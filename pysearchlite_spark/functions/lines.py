"""Duplicate-line removal — the CCNet / Dolma "duplicated paragraph"
cleaning stage: lines (paragraphs) that repeat across the corpus are
boilerplate (nav bars, cookie banners, footers) and are stripped from
every document. In a composed pipeline this runs AFTER doc-level dedup
(the Dolma order, and prepare_corpus's): run earlier, an exact document
copy makes every one of its lines a corpus-repeated line, and the stage
would gut BOTH copies to empty text instead of letting exact-dedup keep
one.

Two-pass shape (the only scalable one — per-doc heuristics can't see
corpus-wide repetition):
  1. explode documents into (doc_id, pos, line); count occurrences of
     each candidate line by 64-bit hash — a groupBy with map-side
     partial combine, so a line repeated 100M times arrives at its
     reducer as one (hash, count) per map task, never 100M rows;
  2. anti-join the exploded lines against the hot-hash set and
     reassemble each document with `sort_array(collect_list(struct(pos,
     line)))` — the groupBy(doc_id) buffers one DOCUMENT per key, which
     by definition fits (a document already fit in one row).

Only lines with at least `min_chars` after trim are candidates for
removal: short structural lines ("", "-", "1.") repeat across any
corpus without being boilerplate, and removing them would mangle
formatting. Non-candidate lines always survive.

Line identity is the TRIMMED line (leading/trailing whitespace doesn't
make a different banner) hashed with xxhash64; the reassembled text
preserves the original (untrimmed) surviving lines and their order.

Cross-engine note: xxhash64 is Spark-specific, but the hash only
partitions the aggregation — equality of trimmed STRINGS decides
removal, which DuckDB reproduces directly (see test_lines' oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["line_counts", "strip_duplicate_lines"]


def _lines(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    from pysearchlite_spark.partitioning import spread_input
    return (spread_input(df.select(F.col(id_col).alias("doc_id"),
                                   F.col(text_col).alias("_x")))
            .select("doc_id",
                    F.posexplode(F.split(F.coalesce(F.col("_x"), F.lit("")),
                                         "\n", -1)).alias("pos", "line"))
            .withColumn("_t", F.trim("line")))


def line_counts(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", min_chars: int = 15) -> DataFrame:
    """(line, n_docs, n_occurrences) for candidate lines (trimmed length
    >= min_chars) — the corpus-wide boilerplate census."""
    return (_lines(df, id_col, text_col)
            .filter(F.length("_t") >= min_chars)
            .groupBy(F.col("_t").alias("line"))
            .agg(F.countDistinct("doc_id").alias("n_docs"),
                 F.count("*").alias("n_occurrences")))


def strip_duplicate_lines(df: DataFrame, min_count: int = 2,
                          id_col: str = "doc_id", text_col: str = "text",
                          min_chars: int = 15) -> DataFrame:
    """(doc_id, text, n_lines, n_removed): every candidate line whose
    trimmed form appears >= min_count times corpus-wide is removed from
    every document; survivors are rejoined with '\\n' in original order.
    Documents whose lines are all removed keep an empty text. Extra
    input columns are preserved (joined back by id)."""
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    # persisted: the exploded lines feed the census, the anti-join and
    # the per-doc stats; release is the caller's job (repo convention —
    # same as the dedup operators), or spark.catalog.clearCache()
    lines = _lines(df, id_col, text_col).persist()
    hot = (lines.filter(F.length("_t") >= min_chars)
           .groupBy(F.xxhash64("_t").alias("_h"))
           .agg(F.count("*").alias("_n"))
           .filter(F.col("_n") >= min_count)
           .select("_h"))
    kept = (lines.withColumn("_h", F.xxhash64("_t"))
            .join(hot, "_h", "left_anti"))
    rebuilt = (kept.groupBy("doc_id")
               .agg(F.array_join(
                        F.transform(
                            F.sort_array(F.collect_list(
                                F.struct("pos", "line"))),
                            lambda s: s["line"]), "\n")
                    .alias("_clean"),
                    F.count("*").alias("_kept_lines")))
    stats = (lines.groupBy("doc_id")
             .agg(F.count("*").alias("n_lines")))
    out = (df.withColumnRenamed(text_col, "_orig")
           .join(stats.withColumnRenamed("doc_id", id_col), id_col, "left")
           .join(rebuilt.withColumnRenamed("doc_id", id_col), id_col, "left")
           .withColumn(text_col, F.coalesce(F.col("_clean"), F.lit("")))
           .withColumn("n_removed",
                       F.col("n_lines")
                       - F.coalesce(F.col("_kept_lines"), F.lit(0)))
           .drop("_orig", "_clean", "_kept_lines"))
    return out
