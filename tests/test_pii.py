"""PII redaction: hand-pinned cases + brute-force `re` recomputation of
the exact sequential count/redact semantics."""

from __future__ import annotations

import re

import pytest

from pysearchlite_spark.functions.pii import (PII_PATTERNS, pii_stats,
                                              redact_pii)


def brute(text: str | None):
    """Independent recomputation with Python re (Java-compatible syntax)."""
    cur = text or ""
    counts = {}
    for name, pat, repl in PII_PATTERNS:
        counts[name] = len(re.findall(pat, cur))
        cur = re.sub(pat, repl, cur)
    return counts, cur


CASES = [
    "mail me at alice.smith+spam@sub.example.co.uk today",
    "two: a@b.io and c_d%x@y-z.org!",
    "call (202) 555-0199 or 555-123-4567 now",
    "intl +4915123456789 end",
    "host 192.168.1.1 and 10.0.0.255.",
    "version 1.2.3.4 looks like an ip (documented limitation)",
    "email with digits 12.34.56.78@ex.com stays ONE email",  # order matters
    "no pii here at all",
    "",
    None,
    "mixed: bob@x.com from 10.1.1.1 dial 555-867-5309",
    "not a phone 12-34-5678, not an ip 1.2.3, not mail a@b",
]


@pytest.fixture(scope="module")
def pii_df(spark):  # noqa: F811
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], ["doc_id", "text"]).cache()


def test_counts_and_redaction_match_brute(pii_df):
    got = {r["doc_id"]: r for r in
           redact_pii(pii_df).orderBy("doc_id").collect()}
    for i, t in enumerate(CASES):
        counts, clean = brute(t)
        r = got[i]
        assert (r["n_emails"], r["n_phones"], r["n_ipv4"]) == (
            counts["email"], counts["phone"], counts["ipv4"]), (i, t)
        assert r["text_clean"] == clean, (i, t)


def test_pinned_values(pii_df):
    rows = {r["doc_id"]: r for r in redact_pii(pii_df).collect()}
    # digit-dotted local part is consumed by the EMAIL pass first
    assert rows[6]["n_emails"] == 1 and rows[6]["n_ipv4"] == 0
    assert rows[2]["n_phones"] == 2
    assert rows[4]["n_ipv4"] == 2
    assert rows[10]["text_clean"] == "mixed: <EMAIL> from <IP> dial <PHONE>"
    assert rows[11]["n_emails"] + rows[11]["n_phones"] + rows[11]["n_ipv4"] == 0
    assert rows[9]["text_clean"] == ""  # NULL -> empty


def test_stats_form_matches(pii_df):
    a = {r["doc_id"]: (r["n_emails"], r["n_phones"], r["n_ipv4"])
         for r in pii_stats(pii_df).collect()}
    b = {r["doc_id"]: (r["n_emails"], r["n_phones"], r["n_ipv4"])
         for r in redact_pii(pii_df).collect()}
    assert a == b


def test_no_shuffle_plan(pii_df):
    plan = redact_pii(pii_df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_duckdb_oracle_parity(pii_df):
    """The driver-oracle building block: DuckDB RE2 reproduces counts and
    redacted text exactly on every case."""
    import duckdb
    pdf = pii_df.toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    expr = "coalesce(text, '')"
    sels = []
    for name, pat, repl in PII_PATTERNS:
        sels.append(f"len(regexp_extract_all({expr}, '{pat}'))"
                    f" AS n_{name}")
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    q = (f"SELECT doc_id, {', '.join(sels)}, {expr} AS clean "
         f"FROM t ORDER BY doc_id")
    want = con.execute(q).df()
    got = redact_pii(pii_df).orderBy("doc_id").toPandas()
    assert list(want["n_email"]) == list(got["n_emails"])
    assert list(want["n_phone"]) == list(got["n_phones"])
    assert list(want["n_ipv4"]) == list(got["n_ipv4"])
    assert list(want["clean"]) == list(got["text_clean"])
