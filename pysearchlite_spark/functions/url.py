"""URL canonicalization + URL-level dedup — the crawl-frontier /
re-crawl dedup stage of a web-corpus pipeline: map every URL to a
canonical form so the same page fetched under trivially-different URLs
(case-variant host, default port, tracking parameters, fragments)
deduplicates to one document.

Canonicalization steps (in order):
  1. trim whitespace
  2. strip the fragment (`#...` — never sent to the server)
  3. lowercase the scheme and authority (`HTTPS://WWW.X.COM/P` →
     `https://www.x.com/P` — the PATH stays case-sensitive per RFC 3986)
  4. strip default ports (`http://h:80/`, `https://h:443/`)
  5. insert the empty path (`https://h?q` → `https://h/?q`,
     `https://h` → `https://h/`)
  6. drop tracking query parameters (`utm_*`, `gclid`, `fbclid`,
     `msclkid`, `mc_eid`) and empty params, preserving the relative
     order of the survivors; a now-empty query drops its `?`

Scale shape: a pure JVM projection — regexp extract/replace plus a
split/filter/array_join over the query string, all inside whole-stage
codegen; zero shuffles, zero Python. `url_dedup` then reuses the
exact-dedup shape (hash groupBy on the canonical string — shuffles only
(key, id) pairs, never the documents).

Portability: the regex chain stays inside the Java∩RE2 subset (no
lookaround — the default-port and empty-path rules use captured
alternatives instead), so the driver's DuckDB oracle reproduces the
canonical string byte-for-byte.

Not attempted (documented): percent-encoding normalization, IDN/punycode,
query-parameter re-ordering (order can be semantic), trailing-slash
folding on non-empty paths (`/a` vs `/a/` can be different resources).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["TRACKING_PARAM_RE", "canonical_url", "registered_domain",
           "url_host", "url_dedup", "with_canonical_url"]

# authority prefix: scheme://host[:port] (everything before path/query)
_HEAD = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*"
# a tracking query param, matched against one `k=v` piece
TRACKING_PARAM_RE = r"^(?:utm_[A-Za-z0-9_]+|gclid|fbclid|msclkid|mc_eid)="


def canonical_url(col: Column | str) -> Column:
    """Column expression: the canonical form of a URL string (see module
    docstring for the exact rules). NULL in -> NULL out."""
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    # 2. fragment ('.' never matches a newline in Java or RE2; URLs with
    #    embedded newlines are malformed upstream garbage either way)
    u = F.regexp_replace(u, r"#.*", "")
    # 3. lowercase scheme+authority, keep the rest byte-identical
    head = F.regexp_extract(u, _HEAD, 0)
    u = F.concat(F.lower(head), u.substr(F.length(head) + F.lit(1),
                                         F.length(u)))
    # 4. default ports (captured-tail alternative instead of lookahead,
    #    which RE2 lacks)
    u = F.regexp_replace(u, r"^(http://[^/?#]*):80([/?#]|$)", "$1$2")
    u = F.regexp_replace(u, r"^(https://[^/?#]*):443([/?#]|$)", "$1$2")
    # 5. empty path -> '/'
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.\-]*://[^/?#]*)\?", "$1/?")
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.\-]*://[^/?#]*)$", "$1/")
    # 6. tracking params: split the query, drop trackers + empties,
    #    reassemble (order-preserving)
    base = F.regexp_replace(u, r"\?.*", "")
    query = F.regexp_extract(u, r"\?(.*)", 1)
    kept = F.filter(F.split(query, "&"),
                    lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE))
    newq = F.array_join(kept, "&")
    # NULL input propagates naturally (every step above is NULL-safe)
    return F.when(newq == "", base).otherwise(
        F.concat(base, F.lit("?"), newq))


def with_canonical_url(df: DataFrame, url_col: str = "url",
                       out_col: str = "canonical_url") -> DataFrame:
    return df.withColumn(out_col, canonical_url(url_col))


def url_dedup(df: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """(doc_id, canonical_url, keep_id, is_dup): keep_id = min id among
    rows whose URLs canonicalize identically — the re-crawl dedup
    keep-list. Same scale shape as operators/dedup.exact_dedup: the
    groupBy shuffles only (canonical, id) pairs."""
    c = df.select(F.col(id_col).alias("doc_id"),
                  F.coalesce(canonical_url(url_col), F.lit(""))
                  .alias("canonical_url"))
    keep = c.groupBy("canonical_url").agg(F.min("doc_id").alias("keep_id"))
    return (c.join(keep, "canonical_url")
            .select("doc_id", "canonical_url", "keep_id",
                    (F.col("doc_id") != F.col("keep_id")).alias("is_dup")))


def url_host(col: Column | str) -> Column:
    """Lowercased host of a URL (authority minus userinfo and port).
    NULL/invalid URLs yield ''. Pure JVM regexp — zero-shuffle."""
    u = F.col(col) if isinstance(col, str) else col
    h = F.lower(F.regexp_extract(
        F.trim(u), r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1))
    h = F.regexp_replace(h, r"^[^@]*@", "")
    return F.regexp_replace(h, r":\d+$", "")


def registered_domain(col: Column | str) -> Column:
    """Naive registered domain: the last two dot-labels of the host
    ('a.b.example.com' -> 'example.com'). A real implementation needs the
    Public Suffix List (multi-label suffixes like .co.uk collapse
    incorrectly here) — that list isn't bundled, and the quota key only
    needs a consistent grouping, not registrar truth. Feed this to
    operators/sample.cap_per_key for per-domain corpus quotas."""
    h = url_host(col)
    return F.when(h.rlike(r"[^.]+\.[^.]+$"),
                  F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)).otherwise(h)
