"""Input-parallelism guard for Python-boundary scans.

A single large file — or a parquet file with one row group — scans as 1-2
tasks no matter how many cores the cluster has: byte-range splits cannot
cut inside a row group, so every mapInPandas / mapInArrow / heavy-expression
stage fed DIRECTLY by such a scan runs on 1-2 cores while the rest idle
(measured on this engine's bench corpus: the whole 50k-doc text crosses the
Python boundary through 2 tasks at local[32]).

This is the optimization guide's input-skew fix ("one huge unsplittable
file ... repartition immediately after the read") packaged as a reusable
guard: round-robin repartition to the cluster's default parallelism ONLY
when the frame currently has fewer partitions. On a real cluster reading
TB-scale inputs the scan partition count already exceeds the core count and
the guard is a no-op — it can never ADD an exchange at scale, it only
rescues the degenerate small-file/row-group layout. The repartition is
keyless (round-robin): operators downstream key everything by explicit ids
or content hashes, so row placement is semantically irrelevant, and Spark's
sort-before-repartition (on by default) keeps the assignment deterministic
under task retry.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame


def spread_input(df: DataFrame, min_parts: Optional[int] = None) -> DataFrame:
    """Ensure `df` has at least min_parts (default: defaultParallelism)
    partitions; no-op when it already does (or when the partition count
    cannot be determined, e.g. streaming frames)."""
    sc = df.sparkSession.sparkContext
    target = int(min_parts) if min_parts else sc.defaultParallelism
    if target <= 1:
        return df
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:  # streaming / unresolvable plan — leave untouched
        return df
    if cur >= target:
        return df
    return df.repartition(target)
