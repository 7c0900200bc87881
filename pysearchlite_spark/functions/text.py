"""Text-analysis operators for training-data pipelines (SURVEY.md §2 scope
extension): token counting, quality stats, language-ID heuristic, document
fingerprinting. All plans are native pyspark.sql.functions where possible;
Python appears only inside vectorized pandas UDFs (tokenize, langid,
fingerprint), per the input_hint "no per-row Python".
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pysearchlite_spark.partitioning import spread_input
from pysearchlite_spark.plans.builder import make_tokens_udf
from pysearchlite_spark.tokenizer import tokens_series


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("tokens", make_tokens_udf()(F.col(text_col)))


def _scan_input(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The shared scan head of every per-doc text statistic: project to the
    two consumed columns (an opaque UDF otherwise ships, and reads, every
    column — guide §4) and spread a single-file input across the cluster
    (partitioning.spread_input; no-op on well-partitioned inputs)."""
    return spread_input(df.select(id_col, text_col))


def token_counts(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(id, n_tokens) — exact tokenizer semantics."""
    return (with_tokens(_scan_input(df, id_col, text_col), text_col)
            .select(F.col(id_col), F.size("tokens").alias("n_tokens")))


def quality_exprs(text_col: str = "text",
                  tokens_col: str = "tokens") -> dict:
    """The named quality-stat COLUMN EXPRESSIONS over an existing tokens
    column — the single source shared by quality_stats and the pipeline's
    inline quality filter, so the two can never disagree on a rounding or
    an edge case."""
    n = F.size(tokens_col)
    n_chars = F.length(F.col(text_col))
    total_len = F.aggregate(tokens_col, F.lit(0).cast("long"),
                            lambda acc, x: acc + F.length(x))
    # punctuation = characters that are neither Unicode letters/digits
    # (\p{L}\p{N} — Java and RE2 agree; ASCII-only classes would count
    # every accented or non-Latin letter as punctuation) nor ASCII
    # whitespace (explicit class: Java \s and RE2 \s disagree on \x0B)
    n_punct = n_chars - F.length(
        F.regexp_replace(F.col(text_col),
                         "[^\\p{L}\\p{N}" + _WS + "]", ""))
    sw = sorted(_STOPWORDS["en"])
    n_stop = F.size(F.filter(tokens_col, lambda x: x.isin(*sw)))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n.cast("long"),
        "distinct_ratio": F.round(
            F.when(n > 0, F.size(F.array_distinct(tokens_col))
                   .cast("double") / n).otherwise(0.0), 6),
        "avg_token_len": F.round(
            F.when(n > 0, total_len.cast("double") / n).otherwise(0.0), 6),
        "punct_ratio": F.round(
            F.when(n_chars > 0, n_punct.cast("double") / n_chars)
            .otherwise(0.0), 6),
        "stopword_ratio": F.round(
            F.when(n > 0, n_stop.cast("double") / n).otherwise(0.0), 6),
    }


def quality_stats(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per-doc quality features: n_chars, n_tokens, distinct-token ratio,
    mean token length, punctuation-character ratio, English-stopword token
    ratio (the standard web-text quality filters: length / punct /
    stopword). Everything after tokenization is JVM-side (whole-stage
    codegen): size/array_distinct/aggregate/filter/regexp_replace."""
    t = with_tokens(_scan_input(df, id_col, text_col), text_col)
    exprs = quality_exprs(text_col)
    return t.select(F.col(id_col),
                    *[e.alias(name) for name, e in exprs.items()])


def _rep_ngram_stats(keys: np.ndarray, valid: np.ndarray,
                     rows: np.ndarray, n_rows: int):
    """(mode_count, distinct, total) per row for one n-gram level.
    keys = dense n-gram code per start position, valid = mask of
    positions whose gram stays inside its row, rows = row id per
    position. One lexsort + run-length pass, fully vectorized."""
    mode = np.zeros(n_rows, dtype=np.int64)
    distinct = np.zeros(n_rows, dtype=np.int64)
    total = np.zeros(n_rows, dtype=np.int64)
    k, r = keys[valid], rows[valid]
    if k.size == 0:
        return mode, distinct, total
    order = np.lexsort((k, r))
    k, r = k[order], r[order]
    grp = np.empty(k.size, dtype=bool)
    grp[0] = True
    grp[1:] = (k[1:] != k[:-1]) | (r[1:] != r[:-1])
    starts = np.flatnonzero(grp)
    counts = np.diff(np.append(starts, k.size))
    grow = r[starts]                       # row of each (row, key) group
    rstart = np.empty(grow.size, dtype=bool)
    rstart[0] = True
    rstart[1:] = grow[1:] != grow[:-1]
    ridx = np.flatnonzero(rstart)
    present = grow[ridx]
    mode[present] = np.maximum.reduceat(counts, ridx)
    total[present] = np.add.reduceat(counts, ridx)
    distinct[present] = np.diff(np.append(ridx, grow.size))
    return mode, distinct, total


def _repetition_frame(texts: pd.Series, top_ns, dup_ns) -> pd.DataFrame:
    """Per-doc Gopher repetition fractions, vectorized: tokens are
    factorized once, n-gram codes are built by CHAINED factorization
    (combine level n-1 code with the next token code, re-densify — exact
    string-equality semantics, no n-gram strings ever materialized), and
    per-row mode/distinct/total come from one lexsort per level."""
    from pysearchlite_spark.tokenizer import occurrence_codes
    rows, codes, _uniq, lens = occurrence_codes(texts)
    n_rows = len(texts)
    cols: dict = {}
    levels = sorted(set(top_ns) | set(dup_ns))
    if codes.size == 0:
        for n in top_ns:
            cols[f"top{n}gram_frac"] = np.zeros(n_rows)
        for n in dup_ns:
            cols[f"dup{n}gram_frac"] = np.zeros(n_rows)
        return pd.DataFrame(cols, index=texts.index)
    lens = np.asarray(lens, dtype=np.int64)
    offs = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    m = codes.size
    ends = np.repeat(offs[1:], lens)       # row-end offset per position
    pos = np.arange(m, dtype=np.int64)
    codes = codes.astype(np.int64)
    key = codes                            # level-1 keys, length m
    max_n = max(levels)
    stats: dict = {}
    if 1 in levels:                        # unigram level: every position
        stats[1] = _rep_ngram_stats(codes, np.ones(m, dtype=bool),
                                    rows, n_rows)
    for n in range(2, max_n + 1):
        # key[p] (gram of length n-1 at p) + codes[p+n-1] → dense again.
        # Cross-row combinations are built but masked out at counting,
        # so the chain never branches per row.
        nxt = codes[n - 1:]
        if nxt.size == 0:                  # batch shorter than n tokens
            key = np.empty(0, dtype=np.int64)
        else:
            combined = key[:m - n + 1] * (int(nxt.max()) + 1) + nxt
            key, _ = pd.factorize(combined)
            key = key.astype(np.int64)
        if n in levels:
            if key.size == 0:              # m < n: no grams anywhere
                z = np.zeros(n_rows, dtype=np.int64)
                stats[n] = (z, z, z)
            else:
                valid = (pos[:m - n + 1] + n) <= ends[:m - n + 1]
                stats[n] = _rep_ngram_stats(key, valid, rows[:m - n + 1],
                                            n_rows)
    for n in top_ns:
        mode, _d, total = stats[n]
        cols[f"top{n}gram_frac"] = np.where(
            total > 0, mode / np.maximum(total, 1), 0.0)
    for n in dup_ns:
        _m, distinct, total = stats[n]
        cols[f"dup{n}gram_frac"] = np.where(
            total > 0, 1.0 - distinct / np.maximum(total, 1), 0.0)
    return pd.DataFrame(cols, index=texts.index)


def repetition_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     top_ns: tuple = (2, 3),
                     dup_ns: tuple = (5,)) -> DataFrame:
    """Per-doc repetition signals in the style of the Gopher / MassiveText
    quality filters (Rae et al. 2021 §A1.1: "top n-gram fraction" and
    "duplicate n-gram fraction"), restated over flat token streams:

      top{n}gram_frac — occurrences of the MOST FREQUENT n-gram / total
        n-gram instances (high → the doc keeps repeating one phrase);
      dup{n}gram_frac — 1 - distinct n-grams / total n-gram instances
        (high → boilerplate / TV-transcript-style repetition).

    Docs with fewer than n tokens report 0.0. One Arrow-batched pandas
    UDF computes every level in a single factorize-chain pass (measured
    ~17x the JVM transform/slice/concat_ws formulation, whose per-position
    string materialization dominated); rounding stays Spark-side so the
    oracle's round() semantics match. The plan is a pure per-doc scan —
    a quality-filter pass over 100 TB shuffles NOTHING."""
    rep_udf, fields = make_repetition_udf(top_ns, dup_ns)
    out = (_scan_input(df, id_col, text_col)
           .select(F.col(id_col), rep_udf(F.col(text_col)).alias("_r")))
    return out.select(
        F.col(id_col),
        *[F.round(F.col(f"_r.{f}"), 6).alias(f) for f in fields])


def make_repetition_udf(top_ns: tuple = (2, 3), dup_ns: tuple = (5,)):
    """(pandas_udf, field names) behind repetition_stats — exposed so the
    pipeline's inline repetition filter evaluates the EXACT same UDF and
    rounding as the stats surface (one source of truth)."""
    from pyspark.sql.functions import pandas_udf

    fields = [f"top{n}gram_frac" for n in top_ns] + \
             [f"dup{n}gram_frac" for n in dup_ns]
    spec = ", ".join(f"{f} double" for f in fields)

    @pandas_udf(spec)
    def rep_udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _repetition_frame(b, top_ns, dup_ns)

    return rep_udf, fields


# GPT-2-style pretokenizer pattern, restricted to constructs Java regex and
# RE2 (DuckDB) evaluate identically — no lookaheads, and whitespace spelled
# as an EXPLICIT class (Java's \s includes \x0B, RE2's does not — the
# explicit class keeps Spark and the SQL oracle bit-identical):
# contraction suffixes, optional-space letter runs, optional-space digit
# runs, optional-space punctuation runs, single whitespace chars. This is
# the "BPE-ish" token counting spec: counts approximate a byte-level BPE
# pretokenizer's piece count (before merges).
_WS = " \\t\\n\\x0B\\f\\r"
BPE_PATTERN = ("'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+|"
               f" ?[^A-Za-z0-9{_WS}']+|[{_WS}]")


def bpe_token_counts(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, n_bpe_tokens) — BPE-pretokenizer piece counting, entirely
    JVM-side (regexp_extract_all inside whole-stage codegen; no Python in
    the plan). NULL text counts as an empty doc (0 tokens) — same
    semantics as token_counts' fillna('') — not size(NULL)'s -1/NULL."""
    return _scan_input(df, id_col, text_col).select(
        F.col(id_col),
        F.size(F.regexp_extract_all(
            F.coalesce(F.col(text_col), F.lit("")),
            F.lit(BPE_PATTERN), 0)).cast("long").alias("n_bpe_tokens"))


# Minimal per-language stopword lists for the langid heuristic (public
# common-word lists; deterministic, dependency-free).
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for",
           "was", "with", "on", "as", "are", "this", "be", "at", "have"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit",
           "von", "zu", "den", "im", "für", "auf", "des"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "du", "dans",
           "pour", "que", "qui", "sur", "pas", "au"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "en",
           "que", "por", "para", "con", "no", "se"},
}


def _langid_series(texts: pd.Series) -> pd.Series:
    """Stopword-hit heuristic: the language with the most stopword token
    hits; 'und' (undetermined) when no hits. Ties go to the earliest
    language in _STOPWORDS order (argmax first-wins == the scalar loop's
    strict `hits > best`).

    Vectorized batch-wide: tokens are factorized once, stopword membership
    is computed per DISTINCT token, and per-row hit counts come from
    cumsum differences at row offsets — no per-token Python."""
    from pysearchlite_spark.tokenizer import flat_tokens
    flat, lens = flat_tokens(texts)
    n = len(texts)
    langs = list(_STOPWORDS)
    if flat.size == 0:
        return pd.Series(["und"] * n, index=texts.index)
    codes, uniques = pd.factorize(flat)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    counts = np.empty((len(langs), n), dtype=np.int64)
    for li, lang in enumerate(langs):
        sw = _STOPWORDS[lang]
        member = np.fromiter((u in sw for u in uniques), dtype=np.int64,
                             count=len(uniques))
        occ_cum = np.zeros(flat.size + 1, dtype=np.int64)
        np.cumsum(member[codes], out=occ_cum[1:])
        counts[li] = occ_cum[offs[1:]] - occ_cum[offs[:-1]]
    best = np.argmax(counts, axis=0)
    hit = counts.max(axis=0) > 0
    lang_arr = np.asarray(langs, dtype=object)
    out = np.where(hit, lang_arr[best], "und")
    return pd.Series(out, index=texts.index, dtype=object)


def make_langid_udf():
    """The language-ID pandas UDF — shared by lang_id and the pipeline's
    inline lang filter."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def langid_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for b in batches:
            yield _langid_series(b)

    return langid_udf


def lang_id(df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    return (_scan_input(df, id_col, text_col)
            .select(F.col(id_col),
                    make_langid_udf()(F.col(text_col)).alias("lang_pred")))


_FP_MOD = (1 << 61) - 1
_FP_BASE = 1_000_003


def fingerprint_tokens(tokens: list, hash_fn: str = "blake2b") -> int:
    """Rolling polynomial hash of the token stream over a Mersenne prime —
    OUR deterministic fingerprint spec (stable across processes; no reliance
    on PYTHONHASHSEED). hash_fn='md5' (first 8 digest bytes) makes the value
    reproducible in SQL: DuckDB list_reduce over
    ('0x'||substr(md5(t),1,16))::UBIGINT with HUGEINT modmul."""
    import hashlib
    h = 0
    for t in tokens:
        d = (hashlib.md5(t.encode()).digest()[:8] if hash_fn == "md5" else
             hashlib.blake2b(t.encode(), digest_size=8).digest())
        h = (h * _FP_BASE + int.from_bytes(d, "big")) % _FP_MOD
    return h


_M61 = np.uint64(_FP_MOD)


def _mod61(x: np.ndarray) -> np.ndarray:
    """x (u64) mod 2^61-1, via 2^61 ≡ 1: fold the top 3 bits down twice."""
    x = (x >> np.uint64(61)) + (x & _M61)
    x = (x >> np.uint64(61)) + (x & _M61)
    return np.where(x >= _M61, x - _M61, x)


def _mulmod61(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*b) mod 2^61-1 for a,b < 2^61, entirely in u64 numpy: 32-bit limb
    split (a1*b1*2^64 ≡ a1*b1*8; mid*2^32 folded at bit 61; a0*b0 < 2^64)."""
    u32 = np.uint64(0xFFFFFFFF)
    a1, a0 = a >> np.uint64(32), a & u32
    b1, b0 = b >> np.uint64(32), b & u32
    hi = a1 * b1                       # < 2^58
    mid = a1 * b0 + a0 * b1            # < 2^62
    lo = a0 * b0                       # < 2^64
    m29 = np.uint64((1 << 29) - 1)
    t = ((hi << np.uint64(3))          # hi*2^64 ≡ hi*8 (mod p), < 2^61
         + (mid >> np.uint64(29))      # mid*2^32 = (mid>>29)*2^61 + ...
         + ((mid & m29) << np.uint64(32))
         + (lo >> np.uint64(61)) + (lo & _M61))
    return _mod61(t)                   # t < 5*2^61 < 2^64: no overflow


_PW = np.ones(1, dtype=np.uint64)  # module-level B^e mod p table (grows)


def _powers(upto: int) -> np.ndarray:
    global _PW
    if _PW.size <= upto:
        old = _PW.size
        new = np.empty(max(upto + 1, old * 2), dtype=np.uint64)
        new[:old] = _PW
        b = np.asarray([_FP_BASE], dtype=np.uint64)
        for e in range(old, new.size):  # amortized: runs once per max-len
            new[e] = _mulmod61(new[e - 1:e], b)[0]
        _PW = new
    return _PW


def _fingerprint_series(texts: pd.Series,
                        hash_fn: str = "blake2b") -> pd.Series:
    """Batch fingerprints, identical to fingerprint_tokens per row
    (property-tested): blake2b runs once per DISTINCT token; the rolling
    combine is the closed form h = Σ th_j · B^(L-1-j) mod p, fully numpy —
    Mersenne-prime limb multiplication (_mulmod61) instead of the former
    per-token Python big-int loop."""
    from pysearchlite_spark.operators.dedup import _token_hashes
    from pysearchlite_spark.tokenizer import flat_tokens
    flat, lens = flat_tokens(texts)
    n = len(texts)
    if flat.size == 0:
        return pd.Series([0] * n, index=texts.index, dtype="int64")
    codes, uniques = pd.factorize(flat)
    th = _mod61(_token_hashes(np.asarray(uniques, dtype=object),
                              hash_fn))[codes]
    lens = np.asarray(lens, dtype=np.int64)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    # exponent of position g in its row r: (offs[r+1]-1) - g
    ends = np.repeat(offs[1:] - 1, lens)
    exps = ends - np.arange(flat.size, dtype=np.int64)
    pw = _powers(int(lens.max()))[exps]
    prod = _mulmod61(th, pw)           # < 2^61 each
    # per-row modular sum without u64 overflow: sum 32-bit halves separately
    u32 = np.uint64(0xFFFFFFFF)
    # reduceat over NON-EMPTY rows only: their start offsets are strictly
    # increasing and < flat.size, so each segment is exactly one row.
    # (Clipping trailing-empty-row offsets to flat.size-1 instead corrupted
    # the LAST non-empty row: its reduceat segment lost the final token.)
    ne = lens > 0
    starts = offs[:-1][ne]
    lo = np.add.reduceat(prod & u32, starts)          # < L*2^32
    hi = np.add.reduceat(prod >> np.uint64(32), starts)
    total_ne = _mod61(_mulmod61(_mod61(hi), np.uint64(1) << np.uint64(32))
                      + _mod61(lo))
    total = np.zeros(n, dtype=np.uint64)
    total[ne] = total_ne
    return pd.Series(total.astype(np.int64), index=texts.index,
                     dtype="int64")


def doc_fingerprint(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    hash_fn: str = "blake2b") -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def fp_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for b in batches:
            yield _fingerprint_series(b, hash_fn)

    return (_scan_input(df, id_col, text_col)
            .select(F.col(id_col),
                    fp_udf(F.col(text_col)).alias("fingerprint")))
