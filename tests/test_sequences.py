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
