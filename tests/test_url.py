"""URL canonicalization: pinned rule-by-rule cases, idempotence, dedup
keep-list shape, plan shape, and DuckDB cross-engine parity (the
driver-oracle building block)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pysearchlite_spark.functions.url import (canonical_url, url_dedup,
                                              with_canonical_url)

# (raw, canonical) — one case per rule plus combinations
CASES = [
    # scheme/host lowercase; path case preserved
    ("HTTPS://WWW.Example.COM/Path/File", "https://www.example.com/Path/File"),
    # fragment stripped
    ("https://a.com/p#section-2", "https://a.com/p"),
    # default ports
    ("http://a.com:80/x", "http://a.com/x"),
    ("https://a.com:443/x", "https://a.com/x"),
    ("https://a.com:443", "https://a.com/"),
    # NON-default port kept
    ("http://a.com:8080/x", "http://a.com:8080/x"),
    # empty path gets '/'
    ("https://a.com", "https://a.com/"),
    ("https://a.com?q=1", "https://a.com/?q=1"),
    # tracking params dropped, order of survivors preserved
    ("https://a.com/p?utm_source=tw&id=3&utm_campaign=x&b=2",
     "https://a.com/p?id=3&b=2"),
    ("https://a.com/p?gclid=abc", "https://a.com/p"),
    ("https://a.com/p?fbclid=1&msclkid=2&mc_eid=3", "https://a.com/p"),
    # empty params dropped; bare '?' dropped
    ("https://a.com/p?", "https://a.com/p"),
    ("https://a.com/p?&&a=1&", "https://a.com/p?a=1"),
    # whitespace trim
    ("  https://a.com/p  ", "https://a.com/p"),
    # everything at once
    ("HTTP://HOST.COM:80?utm_medium=email&keep=1#frag",
     "http://host.com/?keep=1"),
    # non-tracking param that merely CONTAINS a tracker name is kept
    ("https://a.com/p?xutm_source=1", "https://a.com/p?xutm_source=1"),
    # path/query case and %-encoding untouched
    ("https://a.com/A%2Fb?Q=V", "https://a.com/A%2Fb?Q=V"),
]


@pytest.fixture(scope="module")
def urls(spark):
    rows = [(i, u) for i, (u, _) in enumerate(CASES)] + [(99, None)]
    return spark.createDataFrame(rows, ["doc_id", "url"]).cache()


def test_pinned_cases(urls):
    got = {r["doc_id"]: r["canonical_url"]
           for r in with_canonical_url(urls).collect()}
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, (raw, got[i], want)
    assert got[99] is None


def test_idempotent(urls):
    """canonical(canonical(u)) == canonical(u) — a fixed point."""
    once = with_canonical_url(urls.filter(F.col("url").isNotNull()))
    twice = once.select(
        "doc_id", F.col("canonical_url").alias("a"),
        canonical_url("canonical_url").alias("b"))
    bad = twice.filter(F.col("a") != F.col("b")).collect()
    assert bad == [], bad


def test_url_dedup_keep_list(spark):
    df = spark.createDataFrame(
        [(1, "https://A.com/x?utm_source=1"),
         (2, "https://a.com/x"),
         (3, "https://a.com/x#frag"),
         (4, "https://a.com/y")],
        ["doc_id", "url"])
    rows = {r["doc_id"]: r for r in url_dedup(df).collect()}
    assert [rows[i]["is_dup"] for i in (1, 2, 3, 4)] == [
        False, True, True, False]
    assert all(rows[i]["keep_id"] == 1 for i in (1, 2, 3))
    assert rows[1]["canonical_url"] == "https://a.com/x"


def test_projection_plan_no_shuffle(urls):
    plan = (with_canonical_url(urls)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_duckdb_oracle_parity(urls):
    """DuckDB reproduces the canonical string byte-for-byte via the same
    regex chain (the Java∩RE2 subset claim, checked)."""
    import duckdb
    con = duckdb.connect()
    con.register("t", urls.toPandas())
    q = r"""
    WITH s1 AS (SELECT doc_id,
                       regexp_replace(trim(url), '#.*', '') AS u FROM t),
    s2 AS (SELECT doc_id,
                  lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*'))
                  || substr(u, length(regexp_extract(
                         u, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*')) + 1) AS u
           FROM s1),
    s3 AS (SELECT doc_id, regexp_replace(regexp_replace(u,
                  '^(http://[^/?#]*):80([/?#]|$)', '\1\2'),
                  '^(https://[^/?#]*):443([/?#]|$)', '\1\2') AS u FROM s2),
    s4 AS (SELECT doc_id, regexp_replace(regexp_replace(u,
                  '^([a-z][a-z0-9+.\-]*://[^/?#]*)\?', '\1/?'),
                  '^([a-z][a-z0-9+.\-]*://[^/?#]*)$', '\1/') AS u FROM s3),
    s5 AS (SELECT doc_id, regexp_replace(u, '\?.*', '') AS base,
                  coalesce(array_to_string(list_filter(
                    string_split(regexp_extract(u, '\?(.*)', 1), '&'),
                    p -> p <> '' AND NOT regexp_matches(
                      p, '^(?:utm_[A-Za-z0-9_]+|gclid|fbclid|msclkid|mc_eid)=')
                  ), '&'), '') AS q FROM s4)
    SELECT doc_id,
           CASE WHEN u IS NULL THEN NULL
                WHEN q = '' THEN base ELSE base || '?' || q END AS canon
    FROM s5 JOIN s1 USING (doc_id) ORDER BY doc_id"""
    want = {int(r["doc_id"]): r["canon"]
            for _, r in con.execute(q).df().iterrows()}
    got = {r["doc_id"]: r["canonical_url"]
           for r in with_canonical_url(urls).collect()}
    for k in got:
        w = want[k]
        assert got[k] == (None if w is None or w != w else w), (k, got[k], w)


def test_url_host_and_registered_domain(spark):
    from pysearchlite_spark.functions.url import (registered_domain,
                                                  url_host)
    cases = [
        (0, "https://WWW.Sub.Example.COM:8443/p?q=1", "www.sub.example.com",
         "example.com"),
        (1, "http://user:pw@host.org/x", "host.org", "host.org"),
        (2, "https://localhost:8080/", "localhost", "localhost"),
        (3, "https://example-ab12.test/p/9", "example-ab12.test",
         "example-ab12.test"),
        (4, "not a url", "", ""),
        (5, None, "", None),
    ]
    df = spark.createDataFrame([(i, u) for i, u, _, _ in cases],
                               "doc_id long, url string")
    got = {r["doc_id"]: (r["h"], r["d"]) for r in df.select(
        "doc_id", url_host("url").alias("h"),
        registered_domain("url").alias("d")).collect()}
    for i, _, h, d in cases:
        if i == 5:
            # regexp_extract(NULL) is NULL; both helpers propagate it
            assert got[i][0] is None and got[i][1] is None
        else:
            assert got[i] == (h, d), (i, got[i], (h, d))


def test_domain_capping_from_urls(spark):
    """The quota use case end-to-end: cap docs per registered domain."""
    from pysearchlite_spark.functions.url import registered_domain
    from pysearchlite_spark.operators.sample import cap_per_key
    rows = [(i, f"https://s{i % 3}.big.com/p/{i}") for i in range(30)]
    rows += [(100 + i, f"https://small.org/p/{i}") for i in range(2)]
    df = (spark.createDataFrame(rows, "doc_id long, url string")
          .withColumn("domain", registered_domain("url")))
    kept = cap_per_key(df, "domain", 5).groupBy("domain").count().collect()
    counts = {r["domain"]: r["count"] for r in kept}
    assert counts == {"big.com": 5, "small.org": 2}
