"""chunk_tokens: brute-force recomputation parity, chunk-boundary pins,
plan shape (no shuffle), and DuckDB cross-engine parity of the 60-bit
md5 token ids (the oracle building block)."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from pysearchlite_spark.functions.sequences import chunk_tokens


def tok_ids(text: str) -> list[int]:
    """Engine tokenizer semantics (findall-then-lower) + 60-bit md5 id."""
    return [int(hashlib.md5(t.lower().encode()).hexdigest()[:15], 16)
            for t in re.findall("[A-Za-z0-9]+", text or "")]


def brute(rows, seq_len):
    out = []
    for i, text in rows:
        ids = tok_ids(text)
        for c in range(0, (len(ids) + seq_len - 1) // seq_len):
            part = ids[c * seq_len:(c + 1) * seq_len]
            out.append((i, c, len(part), part))
    return sorted(out)


CASES = [
    (0, "one two three four five six seven"),       # ragged last chunk
    (1, "exactly four token chunk"),                # exact multiple
    (2, "a"),                                       # single token
    (3, ""),                                        # no tokens -> no rows
    (4, None),                                      # NULL text -> no rows
    (5, "punct!!!only???"),                         # punct split
    (6, " ".join(f"w{j}" for j in range(11))),      # 3 chunks at len 4
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CASES, "doc_id long, text string").cache()


@pytest.mark.parametrize("seq_len", [1, 4, 100])
def test_matches_brute_force(docs, seq_len):
    got = sorted((r["doc_id"], r["chunk_id"], r["n_tokens"],
                  list(r["token_ids"]))
                 for r in chunk_tokens(docs, seq_len).collect())
    assert got == brute(CASES, seq_len)


def test_chunk_boundaries(docs):
    rows = {(r["doc_id"], r["chunk_id"]): r
            for r in chunk_tokens(docs, 4).collect()}
    # 7 tokens at seq_len 4 -> chunks of 4 and 3
    assert rows[(0, 0)]["n_tokens"] == 4 and rows[(0, 1)]["n_tokens"] == 3
    # exact multiple -> one full chunk, no empty tail
    assert rows[(1, 0)]["n_tokens"] == 4 and (1, 1) not in rows
    # empty/NULL docs produce nothing
    assert not any(k[0] in (3, 4) for k in rows)
    # 11 tokens -> 4+4+3, ids dense
    assert [rows[(6, c)]["n_tokens"] for c in (0, 1, 2)] == [4, 4, 3]
    # concatenating chunks reproduces the full id stream
    full = (rows[(6, 0)]["token_ids"] + rows[(6, 1)]["token_ids"]
            + rows[(6, 2)]["token_ids"])
    assert full == tok_ids(CASES[6][1])


def test_no_shuffle_plan(docs):
    plan = (chunk_tokens(docs, 4)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan


def test_duckdb_id_parity(docs, spark):
    """DuckDB reproduces the 60-bit token ids and the chunking exactly
    (list-comprehension chunking over the same md5 ids)."""
    import duckdb
    con = duckdb.connect()
    con.register("t", docs.toPandas())
    tok = ("list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
           "x -> x <> '')")
    q = f"""
    WITH ids AS (
      SELECT doc_id,
             list_transform({tok},
               x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS ids
      FROM t WHERE len({tok}) > 0)
    SELECT doc_id, c - 1 AS chunk_id,
           len(ids[(c-1)*4+1 : c*4]) AS n_tokens,
           ids[(c-1)*4+1 : c*4] AS token_ids
    FROM (SELECT doc_id, ids,
                 unnest(range(1, 1 + cast(ceil(len(ids) / 4.0) AS BIGINT)))
                   AS c
          FROM ids)
    ORDER BY doc_id, chunk_id"""
    want = [(int(r["doc_id"]), int(r["chunk_id"]), int(r["n_tokens"]),
             list(r["token_ids"])) for _, r in con.execute(q).df().iterrows()]
    got = sorted((r["doc_id"], r["chunk_id"], r["n_tokens"],
                  list(r["token_ids"]))
                 for r in chunk_tokens(docs, 4).collect())
    assert got == sorted(want)


def test_validation(docs):
    with pytest.raises(ValueError):
        chunk_tokens(docs, 0)


# ---------------------------------------------------------------------------
# pack_tokens: cross-doc packed sequences
# ---------------------------------------------------------------------------

def brute_pack(rows, seq_len, eod_id=None):
    stream = []
    for i, text in sorted(rows):
        ids = tok_ids(text)
        if ids:
            stream += ids + ([eod_id] if eod_id is not None else [])
    return [(s, len(stream[s * seq_len:(s + 1) * seq_len]),
             stream[s * seq_len:(s + 1) * seq_len])
            for s in range((len(stream) + seq_len - 1) // seq_len)]


PACK_CASES = CASES + [
    (17, "long doc " + " ".join(f"t{j}" for j in range(23))),  # spans seqs
    (100, "sparse id far from the others"),    # sparse doc_id range
]


@pytest.fixture(scope="module")
def pack_docs(spark):
    return spark.createDataFrame(PACK_CASES,
                                 "doc_id long, text string").cache()


@pytest.mark.parametrize("seq_len", [1, 4, 16, 1000])
def test_pack_matches_brute_force(pack_docs, seq_len, spark):
    from pysearchlite_spark.functions.sequences import pack_tokens
    got = sorted((r["seq_id"], r["n_tokens"], list(r["token_ids"]))
                 for r in pack_tokens(pack_docs, seq_len).collect())
    assert got == brute_pack(PACK_CASES, seq_len)
    spark.catalog.clearCache()


def test_pack_bucket_invariance(pack_docs, spark):
    """The output NEVER depends on n_buckets — the two-phase prefix sum
    reproduces the single global cumsum exactly for any bucketing."""
    from pysearchlite_spark.functions.sequences import pack_tokens
    want = brute_pack(PACK_CASES, 4)
    for nb in (1, 3, 64, 1000):
        got = sorted((r["seq_id"], r["n_tokens"], list(r["token_ids"]))
                     for r in pack_tokens(pack_docs, 4,
                                          n_buckets=nb).collect())
        assert got == want, f"n_buckets={nb}"
    spark.catalog.clearCache()


def test_pack_partitioning_invariance(pack_docs, spark):
    """Repartitioning the input (the cluster's choice, not the user's)
    cannot change the packed stream."""
    from pysearchlite_spark.functions.sequences import pack_tokens
    scrambled = pack_docs.repartition(7)
    got = sorted((r["seq_id"], r["n_tokens"], list(r["token_ids"]))
                 for r in pack_tokens(scrambled, 4).collect())
    assert got == brute_pack(PACK_CASES, 4)
    spark.catalog.clearCache()


def test_pack_eod_separator(pack_docs, spark):
    from pysearchlite_spark.functions.sequences import pack_tokens
    got = sorted((r["seq_id"], r["n_tokens"], list(r["token_ids"]))
                 for r in pack_tokens(pack_docs, 4, eod_id=0).collect())
    want = brute_pack(PACK_CASES, 4, eod_id=0)
    assert got == want
    # empty/NULL docs contributed no EOD: total tokens = sum per-doc
    n_docs_with_tokens = sum(1 for _, t in PACK_CASES if tok_ids(t))
    total = sum(n for _, n, _ in got)
    assert total == (sum(len(tok_ids(t)) for _, t in PACK_CASES)
                     + n_docs_with_tokens)
    spark.catalog.clearCache()


def test_pack_stream_reconstruction(pack_docs, spark):
    """Concatenating the packed sequences in seq_id order reproduces the
    doc_id-ordered global token stream byte-for-byte."""
    from pysearchlite_spark.functions.sequences import pack_tokens
    rows = sorted((r["seq_id"], list(r["token_ids"]))
                  for r in pack_tokens(pack_docs, 5).collect())
    flat = [t for _, ids in rows for t in ids]
    want = []
    for _, t in sorted(PACK_CASES):
        want += tok_ids(t)
    assert flat == want
    # seq_ids dense from 0, all full except possibly the last
    assert [s for s, _ in rows] == list(range(len(rows)))
    assert all(len(ids) == 5 for _, ids in rows[:-1])
    spark.catalog.clearCache()


def test_pack_empty_and_validation(spark):
    from pysearchlite_spark.functions.sequences import pack_tokens
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert pack_tokens(empty, 4).count() == 0
    none_docs = spark.createDataFrame([(0, None), (1, "")],
                                      "doc_id long, text string")
    assert pack_tokens(none_docs, 4).count() == 0
    with pytest.raises(ValueError):
        pack_tokens(empty, 0)
    with pytest.raises(ValueError):
        pack_tokens(empty, 4, n_buckets=0)
    spark.catalog.clearCache()


def test_pack_no_global_window(pack_docs, spark):
    """The prefix sum must never serialize onto one task: every Window
    in the plan is partitioned by the bucket column, not global."""
    from pysearchlite_spark.functions.sequences import pack_tokens
    plan = (pack_tokens(pack_docs, 4)._jdf.queryExecution()
            .executedPlan().toString())
    import re as _re
    for m in _re.finditer(r"Window \[", plan):
        seg = plan[m.start():m.start() + 300]
        assert "_b" in seg.split("ORDER BY")[0], seg
    spark.catalog.clearCache()


def test_pack_duckdb_oracle(pack_docs, spark):
    """DuckDB reproduces the packed stream from the same md5 ids via a
    global window cumsum — the contract-entry oracle's building block."""
    import duckdb
    con = duckdb.connect()
    con.register("t", pack_docs.toPandas())
    tok = ("list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
           "x -> x <> '')")
    q = f"""
    WITH ids AS (
      SELECT doc_id,
             list_transform({tok},
               x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS ids
      FROM t WHERE len({tok}) > 0),
    placed AS (
      SELECT doc_id, ids,
             coalesce(sum(len(ids)) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS doff
      FROM ids),
    flat AS (
      SELECT doff + unnest(range(len(ids))) AS off, unnest(ids) AS tid
      FROM placed)
    SELECT (off // 4)::BIGINT AS seq_id,
           list(tid ORDER BY off) AS token_ids
    FROM flat GROUP BY 1 ORDER BY 1"""
    want = [(int(r["seq_id"]), list(r["token_ids"]))
            for _, r in con.execute(q).df().iterrows()]
    from pysearchlite_spark.functions.sequences import pack_tokens
    got = sorted((r["seq_id"], list(r["token_ids"]))
                 for r in pack_tokens(pack_docs, 4).collect())
    assert got == want
    spark.catalog.clearCache()


def test_pack_full_range_64bit_ids(spark):
    """xxhash64-derived doc_ids span the whole signed-64 range: the
    bucket arithmetic (span and shift both overflow BIGINT) must stay
    exact — regression for the DECIMAL(38,0) bucketing."""
    from pysearchlite_spark.functions.sequences import pack_tokens
    cases = [(-(2 ** 63) + 5, "far negative id doc"),
             (-17, "small negative"),
             (0, "zero id doc"),
             (2 ** 63 - 3, "far positive id doc")]
    docs = spark.createDataFrame(cases, "doc_id long, text string")
    got = sorted((r["seq_id"], r["n_tokens"], list(r["token_ids"]))
                 for r in pack_tokens(docs, 4, n_buckets=64).collect())
    assert got == brute_pack(cases, 4)
    spark.catalog.clearCache()


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_pack_randomized(spark, seed):
    """Randomized corpora (sparse/negative ids, ragged docs, empties)
    against the brute pack — one Spark run per seed."""
    import random
    rng = random.Random(seed)
    vocab = ["alpha", "bravo", "x9", "delta", "echo", "f0x", "gamma"]
    used = set()
    cases = []
    for _ in range(rng.randint(5, 40)):
        i = rng.randint(-10**12, 10**12)
        if i in used:
            continue
        used.add(i)
        n = rng.randint(0, 30)
        cases.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    L = rng.randint(1, 17)
    nb = rng.choice([1, 2, 8, 64])
    docs = spark.createDataFrame(cases, "doc_id long, text string")
    from pysearchlite_spark.functions.sequences import pack_tokens
    got = sorted((r["seq_id"], r["n_tokens"], list(r["token_ids"]))
                 for r in pack_tokens(docs, L, n_buckets=nb).collect())
    assert got == brute_pack(cases, L)
    spark.catalog.clearCache()


def test_pack_tokens_clustered_ids_count_balanced(spark):
    """Adversarial id distribution: monotone ids clustered in a narrow
    band (a crawl's sequential ids) must still pack correctly — and the
    quantile borders make the bucketing count-balanced where the former
    value-range split collapsed every doc into one bucket."""
    from pysearchlite_spark.functions.sequences import pack_tokens
    base = 10**12
    rows = [(base + i, f"tok{i} alpha beta gamma {i % 7}")
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = [tuple(r) for r in
            pack_tokens(df, 16, n_buckets=1).orderBy("seq_id").collect()]
    for nb in (None, 8, 64):
        got = [tuple(r) for r in
               pack_tokens(df, 16, n_buckets=nb).orderBy("seq_id").collect()]
        assert got == want, nb
