"""Duplicate-line removal: planted boilerplate, formatting preservation,
short-line immunity, brute-force recomputation, and a DuckDB string-level
oracle (hashes only partition the agg — trimmed-string equality decides)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from pysearchlite_spark.functions.lines import (line_counts,
                                                strip_duplicate_lines)

BANNER = "Accept all cookies to continue reading"
FOOTER = "Copyright Example Media Holdings 2024"

DOCS = [
    (0, f"{BANNER}\nunique first article body text here\n{FOOTER}"),
    (1, f"{BANNER}\nanother distinct piece of writing\n{FOOTER}"),
    (2, f"  {BANNER}  \nthird doc body stays intact"),   # whitespace variant
    (3, "no boilerplate in this one at all"),
    (4, "-\n-\n-\nshort lines repeat but survive\n-"),   # structural lines
    (5, f"{BANNER}"),                                    # all-boilerplate doc
    (6, ""),                                             # empty doc
    (7, None),                                           # NULL doc
]


def brute(rows, min_count=2, min_chars=15):
    census = Counter()
    for _, t in rows:
        for ln in (t or "").split("\n"):
            if len(ln.strip()) >= min_chars:
                census[ln.strip()] += 1
    hot = {k for k, v in census.items() if v >= min_count}
    out = {}
    for i, t in rows:
        lines = (t or "").split("\n")
        kept = [ln for ln in lines if ln.strip() not in hot
                or len(ln.strip()) < min_chars]
        out[i] = ("\n".join(kept), len(lines), len(lines) - len(kept))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_matches_brute_force(docs, spark):
    got = {r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"])
           for r in strip_duplicate_lines(docs).collect()}
    assert got == brute(DOCS)
    spark.catalog.clearCache()


def test_planted_boilerplate_removed(docs, spark):
    got = {r["doc_id"]: r for r in strip_duplicate_lines(docs).collect()}
    # banner (3 occurrences incl. whitespace variant) and footer (2) gone
    for i in (0, 1, 2):
        assert BANNER not in got[i]["text"]
    assert FOOTER not in got[0]["text"] and FOOTER not in got[1]["text"]
    # bodies intact, order preserved
    assert got[0]["text"] == "unique first article body text here"
    assert got[2]["text"] == "third doc body stays intact"
    # untouched doc byte-identical
    assert got[3]["text"] == DOCS[3][1] and got[3]["n_removed"] == 0
    # short structural lines survive even though they repeat
    assert got[4]["text"] == DOCS[4][1]
    # all-boilerplate doc -> empty text, accounted
    assert got[5]["text"] == "" and got[5]["n_removed"] == 1
    # empty + NULL docs -> one empty line kept, nothing removed
    assert got[6] ["text"] == "" and got[6]["n_removed"] == 0
    assert got[7]["text"] == "" and got[7]["n_removed"] == 0
    spark.catalog.clearCache()


def test_line_counts_census(docs, spark):
    got = {r["line"]: (r["n_docs"], r["n_occurrences"])
           for r in line_counts(docs).collect()}
    assert got[BANNER] == (4, 4)  # docs 0,1,2 + the all-banner doc 5
    assert got[FOOTER] == (2, 2)
    assert "-" not in got  # below min_chars
    spark.catalog.clearCache()


def test_duckdb_oracle_parity(docs, spark):
    """DuckDB recomputes removal at the trimmed-string level — confirms
    the xxhash64 is pure partitioning, not semantics."""
    import duckdb
    con = duckdb.connect()
    con.register("t", docs.toPandas())
    q = """
    WITH lines AS (
      SELECT doc_id, unnest(string_split(coalesce(text, ''), chr(10)))
               AS line
      FROM t),
    hot AS (
      SELECT trim(line) AS k FROM lines
      WHERE length(trim(line)) >= 15
      GROUP BY 1 HAVING count(*) >= 2),
    hotlist AS (SELECT coalesce(list(k), []) AS ks FROM hot)
    SELECT doc_id,
           coalesce(array_to_string(list_filter(
             string_split(coalesce(text, ''), chr(10)),
             l -> length(trim(l)) < 15
                  OR NOT list_contains(ks, trim(l))), chr(10)), '') AS clean
    FROM t, hotlist ORDER BY doc_id"""
    want = {int(r["doc_id"]): r["clean"]
            for _, r in con.execute(q).df().iterrows()}
    got = {r["doc_id"]: r["text"]
           for r in strip_duplicate_lines(docs).collect()}
    assert got == want
    spark.catalog.clearCache()


def test_validation(docs):
    with pytest.raises(ValueError):
        strip_duplicate_lines(docs, min_count=1)
