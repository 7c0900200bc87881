"""Corpus sampling operators: stratified capping (at most `cap` docs per
key) and deterministic weighted sampling without replacement.

Stratified capping is the standard Common-Crawl skew control: boilerplate-heavy hosts
(or over-represented sources/languages) would otherwise dominate a
training mix, so the pipeline caps each stratum at a quota, keeping a
DETERMINISTIC uniform sample of each key's documents rather than
whatever ordering the scan happened to deliver.

Scale design (the part that matters at 10^12 docs): the textbook hazard
of `row_number() OVER (PARTITION BY key ...) <= cap` is that every row
of a hot key shuffles into ONE reducer task — a 1B-page domain becomes
a 1B-row single-task window. Spark >= 3.5 closes this natively: the
`InferWindowGroupLimit` rule turns the rank filter into a
`WindowGroupLimit(... row_number(), cap, Partial)` that runs BEFORE the
exchange, so each map task forwards at most `cap` rows per key and the
post-shuffle per-key window sees at most cap x n_map_tasks rows
regardless of the key's true size. We verified the plan shape
(Partial WindowGroupLimit under the Exchange) and measured it
(BENCH/sample_scale.json: a 3.6M-row hot key with ~200 B payloads caps
in ~1 s, FASTER than a hand-salted two-phase run of the same job) —
so `salts=1`, the single-window form, is the default.

`salts>1` keeps the explicit two-phase form available:

  phase 1  partition by (key, salt): each of `salts` sub-windows keeps
           its own `cap` best rows, so at most cap x salts rows per key
           survive toward phase 2;
  phase 2  exact top-`cap` per key over the survivors.

Use it when the NATIVE bound is not tight enough: the map-side group
limit bounds the final window to cap x n_map_tasks rows per key, which
grows with cluster width (100k map tasks x cap=1000 = a 100M-row final
window for a truly global hot key); the salted form pins the final
window to cap x salts — chosen, not cluster-shaped — at the price of
one extra exchange. It is also the portable fallback for engines
without window-group-limit inference.

Both phases are plain JVM window functions (no UDFs, whole-stage
codegen); the salt only shapes the shuffle, never the result.

The per-key "best cap rows" are selected by a deterministic, uniform,
engine-portable priority: `md5(cast(id as string))` ordered
lexicographically (ties broken by id — unreachable for distinct ids but
keeps the ordering total). Portability is load-bearing: the same
expression evaluates identically in DuckDB, so the driver's SQL oracle
reproduces the EXACT kept set, not just the kept counts. Callers who
want quality-weighted rather than uniform capping pass `priority_col`
(e.g. a negated quality score) — ascending order, best first.

Reference scope note: the reference engine (stn/pysearchlite) has no
sampling surface; this operator is part of the beyond-reference
training-data-pipeline layer (SURVEY.md "LLM-data-pipeline operators"),
alongside dedup/quality/decontamination.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cap_per_key", "weighted_sample_n"]


def cap_per_key(df: DataFrame, key_col: str, cap: int,
                id_col: str = "doc_id",
                priority_col: Column | None = None,
                salts: int = 1) -> DataFrame:
    """Keep at most `cap` rows per distinct `key_col` value.

    Deterministic: the kept set is the `cap` rows with the smallest
    (priority, id) per key, independent of partitioning, salts, or plan
    choices. Default priority is md5(id) — a uniform random-but-stable
    sample of each key. Returns df's columns unchanged.

    salts=1 (default) relies on Spark's InferWindowGroupLimit for the
    map-side skew bound (verified in the plan + at-scale bench — see
    module docstring); salts>1 adds the explicit salted partial top-cap
    phase, pinning the final per-key window to cap*salts rows
    independent of cluster width.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    if salts < 1:
        raise ValueError(f"salts must be >= 1, got {salts}")
    pr = (priority_col if priority_col is not None
          else F.md5(F.col(id_col).cast("string")))
    out = df.withColumn("_pr", pr)
    if salts > 1:
        # phase 1: salted partial top-cap. The salt is any deterministic
        # spread of rows WITHIN a key — xxhash64(id) keeps re-runs stable.
        w1 = (Window.partitionBy(key_col, "_salt")
              .orderBy(F.col("_pr").asc(), F.col(id_col).asc()))
        out = (out
               .withColumn("_salt",
                           F.pmod(F.xxhash64(F.col(id_col)), F.lit(salts)))
               .withColumn("_rn", F.row_number().over(w1))
               .filter(F.col("_rn") <= cap)
               .drop("_rn", "_salt"))
    # final: exact top-cap per key (Partial WindowGroupLimit bounds the
    # map-side contribution per key when salts=1; survivors are already
    # <= cap x salts per key when salts>1)
    w2 = (Window.partitionBy(key_col)
          .orderBy(F.col("_pr").asc(), F.col(id_col).asc()))
    return (out.withColumn("_rn", F.row_number().over(w2))
            .filter(F.col("_rn") <= cap)
            .drop("_rn", "_pr"))


def weighted_sample_n(df: DataFrame, n: int, weight_col: str,
                      id_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: keep `n` rows
    with inclusion bias proportional to `weight_col`.

    The training-mix primitive: subsample a corpus so higher-quality (or
    longer, or rarer-language) documents are more likely to be kept,
    without ever materializing or shuffling the full corpus.

    Algorithm: Efraimidis-Spirakis A-ES reformulated as an exponential
    race — each row draws key = -ln(u) / w with u uniform in (0,1), and
    the n SMALLEST keys win; P(row i beats row j) = w_i / (w_i + w_j),
    the weighted-sampling-without-replacement property. Instead of a
    random u, we use a DETERMINISTIC uniform: the first 13 hex digits
    (52 bits — exactly representable in a double, so every engine
    computes the identical float) of md5(id || salt), divided by 2^52.
    Same corpus + same salt -> same sample, independent of partitioning
    or plan choices; vary `salt` to draw independent samples.

    Scale shape: orderBy(key, id).limit(n) compiles to
    TakeOrderedAndProject — a size-n heap per partition, partial results
    merged on the driver. No shuffle of the corpus, no full sort; cost
    is one scan + O(n) per partition, at any corpus size.

    Portability is load-bearing (as with cap_per_key): md5, hex->int and
    ln evaluate identically in DuckDB, so the driver's SQL oracle
    reproduces the EXACT kept set.

    Rows with NULL or non-positive weight are excluded (their key would
    be NaN/negative — not meaningfully orderable).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    u = (F.conv(F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))),
            1, 13), 16, 10).cast("double") / F.lit(float(2 ** 52)))
    key = -F.log(u) / F.col(weight_col).cast("double")
    return (df.filter(F.col(weight_col).isNotNull()
                      & (F.col(weight_col) > 0))
            .withColumn("_k", key)
            .orderBy(F.col("_k").asc(), F.col(id_col).asc())
            .limit(n)
            .drop("_k"))
