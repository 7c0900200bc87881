"""PII detection / redaction — the standard web-corpus cleaning stage
(C4 / Dolma / RedPajama shape): find emails, phone numbers and IPv4
addresses with conservative regexes and replace them with stable
placeholder tokens before the text enters a training mix.

Scale shape: ONE zero-shuffle projection. Every pattern is evaluated by
JVM-side `regexp_count` / `regexp_replace` inside whole-stage codegen —
no Python in the path, no UDF, nothing leaves the scan stage. At 100 TB
this is a pure map over the corpus, exactly as cheap as reading it.

Portability is load-bearing (as with operators/sample.py): the patterns
use only the regex subset where Java (Spark) and RE2 (DuckDB) agree —
character classes, bounded repeats, alternation, ASCII `\\b`, no
lookaround, no backreferences — so the driver's DuckDB oracle reproduces
counts and redacted text exactly.

Semantics:
  * Patterns are applied IN ORDER (email, phone, ipv4), each to the text
    as redacted by the previous ones, so a digit run inside an email's
    local part is never double-counted as a phone/IP.
  * Counts are per-doc match counts under the same sequential semantics.
  * NULL text is treated as empty (consistent with exact_dedup /
    quality_stats).

Known limitations (documented, standard for regex-level PII): dotted
version strings ("1.2.3.4") count as IPv4; international phone formats
beyond +E.164 and NANP dash/paren styles are not matched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "redact_pii", "pii_stats"]

# (name, pattern, replacement) — applied in order; order matters (see
# module docstring). Kept RE2-compatible: no lookaround/backrefs.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email",
     r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("phone",
     r"\(\d{3}\) ?\d{3}-\d{4}|\b\d{3}-\d{3}-\d{4}\b|\+\d{9,14}",
     "<PHONE>"),
    ("ipv4",
     r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
     "<IP>"),
)


def _chain(text: Column) -> tuple[dict[str, Column], Column]:
    """Sequential count+redact chain over one text expression. Returns
    ({name: count_col}, redacted_col). The intermediate redacted
    expressions repeat in the count columns; Spark's subexpression
    elimination collapses them inside the generated code."""
    counts: dict[str, Column] = {}
    cur = text
    for name, pat, repl in PII_PATTERNS:
        counts[name] = F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, repl)
    return counts, cur


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str | None = None) -> DataFrame:
    """Adds `n_emails`, `n_phones`, `n_ipv4` (int counts) and the
    redacted text column (default `<text_col>_clean`) to `df`."""
    out_col = out_col or f"{text_col}_clean"
    counts, clean = _chain(F.coalesce(F.col(text_col), F.lit("")))
    return (df
            .withColumn("n_emails", counts["email"])
            .withColumn("n_phones", counts["phone"])
            .withColumn("n_ipv4", counts["ipv4"])
            .withColumn(out_col, clean))


def pii_stats(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(id, n_emails, n_phones, n_ipv4) — the scan-only stat form (no
    redacted text materialized; column pruning keeps the write narrow)."""
    counts, _ = _chain(F.coalesce(F.col(text_col), F.lit("")))
    return df.select(F.col(id_col),
                     counts["email"].alias("n_emails"),
                     counts["phone"].alias("n_phones"),
                     counts["ipv4"].alias("n_ipv4"))
