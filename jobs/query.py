"""spark-submit entrypoint: query a built index.

Speaks the reference's search-benchmark-game protocol
(/root/reference/pysearchlite/commands/do_query.py:6-24) — tab-separated
``COMMAND\tquery`` lines on stdin:
    COUNT        → number of documents matching ALL terms
    TOP_10       → BM25 top-10 (doc_id:score pairs) — the north-rule upgrade
                   of the reference's unranked TOP_10 (:15-17)
    TOP_10_COUNT → count, like the reference (:18-19)
Plus extensions: AND / OR (matching doc ids), SEARCH (doc names),
NOT / NOT_COUNT (payload ``<include terms> -- <exclude terms>``: AND over
the includes minus any doc containing an exclude term),
PHRASE / PHRASE_COUNT (exact consecutive-token match; needs an index
built with_positions=True), NEAR / NEAR_COUNT (payload ``<slop> <query>``:
ordered proximity within slop; positional index required),
UNEAR / UNEAR_COUNT (same payload, unordered proximity — the distinct
query terms in any arrangement inside the window),
PREFIX / PREFIX_COUNT (payload is a single term prefix, expanded against
the dictionary and unioned like OR; cap the expansion with
``--prefix-max-terms N`` — keeps the N highest-df matches),
WILDCARD / WILDCARD_COUNT (payload is one */? pattern over the token
alphabet, same expansion cap), FUZZY / FUZZY_COUNT (payload
``<term>[~<edits>]``: terms within Levenshtein distance edits ≤ 2, bare
term defaults to ~2, same cap), REGEX / REGEX_COUNT (payload is one
anchored regular expression, same cap), MSM / MSM_COUNT (payload ``<m> <query>``:
docs matching at least m distinct terms), TOP_10_AFTER (payload
``<doc_id>:<score> <query>``: the next ranked page strictly after that
cursor — searchAfter pagination), and QUERY / QUERY_COUNT (full
query-string grammar — terms, "phrase", "phrase"~slop, -negation,
wild*cards, fuzzy~1, /regex/ — see pysearchlite_spark/query_parser.py).

    spark-submit --py-files pysearchlite_spark.zip jobs/query.py \
        --index-dir /path/to/idx [--distributed] [--prefix-max-terms N]
"""

from __future__ import annotations

import argparse
import re
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(spark, index_dir: str, lines, out=None, err=None,
        distributed: bool = False, reference_protocol: bool = False,
        prefix_max_terms=None) -> None:
    """Protocol core (testable without owning the SparkSession): one output
    line per input line, matching do_query.py's line discipline.

    reference_protocol=True reproduces do_query.py:9-24 byte-for-byte for
    drop-in search-benchmark-game harness runs: TOP_10 executes the search
    but prints the constant '1' (:15-17), unknown commands print '0' with
    'UNSUPPORTED' on stderr (:20-22). Default mode keeps the richer output
    (TOP_10 → doc:score pairs — the north-rule BM25 upgrade)."""
    from pysearchlite_spark.engine import SearchIndex

    out = out or sys.stdout
    err = err or sys.stderr
    if os.path.exists(os.path.join(index_dir, "fields.json")):
        # a multi-field root: the query-string commands work with
        # field-scoped clauses (QUERY title:foo body:bar); the
        # single-index commands need a field subdirectory instead
        from pysearchlite_spark.fields import MultiFieldIndex
        idx = MultiFieldIndex(spark, index_dir)
    else:
        idx = SearchIndex(spark, index_dir)
    dist = distributed
    is_mf = not hasattr(idx, "count")  # MultiFieldIndex surface
    for line in lines:
        line = line.rstrip("\n")
        if not line:
            continue
        cmd, _, q = line.partition("\t")
        if is_mf and cmd not in ("QUERY", "QUERY_COUNT"):
            err.write(f"ERR {cmd} needs a single-field index; this is a "
                      "multi-field root (use QUERY with field: clauses, "
                      "or point --index-dir at root/fields/<name>)\n")
            out.write("\n")
            out.flush()
            continue
        if cmd == "COUNT" or cmd == "TOP_10_COUNT":
            out.write(f"{idx.count(q, distributed=dist)}\n")
        elif cmd == "TOP_10":
            if reference_protocol:
                idx.search(q, distributed=dist)  # executed, not printed
                out.write("1\n")
            else:
                top = idx.topk(q, k=10, distributed=dist)
                out.write(" ".join(f"{d}:{s:.6f}" for d, s in top) + "\n")
        elif reference_protocol:
            err.write("UNSUPPORTED\n")
            out.write("0\n")
        elif cmd == "AND":
            out.write(" ".join(map(str, idx.search_and_ids(
                q, distributed=dist).tolist())) + "\n")
        elif cmd == "OR":
            out.write(" ".join(map(str, idx.search_or_ids(
                q, distributed=dist).tolist())) + "\n")
        elif cmd == "SEARCH":
            out.write(" ".join(idx.search(q, distributed=dist)) + "\n")
        elif cmd == "PHRASE":
            # a non-positional index raises ValueError — degrade to an ERR
            # line like every other bad input instead of killing the loop
            try:
                ids = idx.search_phrase_ids(q, distributed=dist)
            except ValueError as e:
                err.write(f"ERR {e}\n")
                out.write("\n")
            else:
                out.write(" ".join(map(str, ids.tolist())) + "\n")
        elif cmd in ("NEAR", "NEAR_COUNT", "UNEAR", "UNEAR_COUNT"):
            # payload is "<slop> <query>"; bad slop / non-positional
            # index degrade to an ERR line like the phrase commands.
            # UNEAR* = unordered proximity (SpanNearQuery inOrder=false)
            s, _, nq = q.partition(" ")
            ordered = not cmd.startswith("U")
            try:
                slop = int(s)
                if cmd.endswith("_COUNT"):
                    res = str(idx.count_near(nq, slop, distributed=dist,
                                             in_order=ordered))
                else:
                    res = " ".join(map(str, idx.search_near_ids(
                        nq, slop, distributed=dist,
                        in_order=ordered).tolist()))
            except ValueError as e:
                err.write(f"ERR {e}\n")
                out.write("\n")
            else:
                out.write(res + "\n")
        elif cmd == "NOT" or cmd == "NOT_COUNT":
            # payload is "<include terms> -- <exclude terms>"
            inc, _, exc = q.partition(" -- ")
            if cmd == "NOT":
                out.write(" ".join(map(str, idx.search_and_not_ids(
                    inc, exc, distributed=dist).tolist())) + "\n")
            else:
                out.write(f"{idx.count_and_not(inc, exc, distributed=dist)}\n")
        elif cmd == "PREFIX":
            out.write(" ".join(map(str, idx.search_prefix_ids(
                q, distributed=dist,
                max_terms=prefix_max_terms).tolist())) + "\n")
        elif cmd == "PREFIX_COUNT":
            out.write(f"{idx.count_prefix(q, distributed=dist, max_terms=prefix_max_terms)}\n")
        elif cmd == "WILDCARD":
            out.write(" ".join(map(str, idx.search_wildcard_ids(
                q, distributed=dist,
                max_terms=prefix_max_terms).tolist())) + "\n")
        elif cmd == "WILDCARD_COUNT":
            out.write(f"{idx.count_wildcard(q, distributed=dist, max_terms=prefix_max_terms)}\n")
        elif cmd == "FUZZY" or cmd == "FUZZY_COUNT":
            # payload is "<term>" or "<term>~<edits>" (bare term = ~2,
            # the Lucene default)
            fm = re.fullmatch(r"(.*?)(?:~(\d*))?", q.strip())
            fterm, fed = fm[1], int(fm[2]) if fm[2] else 2
            try:
                ids = idx.search_fuzzy_ids(
                    fterm, max_edits=fed, distributed=dist,
                    max_terms=prefix_max_terms)
            except ValueError as e:
                err.write(f"ERR {e}\n")
                out.write("\n")
            else:
                out.write((f"{ids.size}" if cmd == "FUZZY_COUNT" else
                           " ".join(map(str, ids.tolist()))) + "\n")
        elif cmd == "REGEX":
            out.write(" ".join(map(str, idx.search_regex_ids(
                q, distributed=dist,
                max_terms=prefix_max_terms).tolist())) + "\n")
        elif cmd == "REGEX_COUNT":
            out.write(f"{idx.count_regex(q, distributed=dist, max_terms=prefix_max_terms)}\n")
        elif cmd == "QUERY" or cmd == "QUERY_COUNT":
            # full query-string grammar (query_parser): terms, "phrase",
            # "phrase"~slop, -negation, wild*cards, /regex/. Syntax errors
            # and positional-index requirements degrade to ERR lines
            try:
                ids = idx.search_query_ids(q, distributed=dist)
            except ValueError as e:
                err.write(f"ERR {e}\n")
                out.write("\n")
            else:
                out.write((f"{ids.size}" if cmd == "QUERY_COUNT" else
                           " ".join(map(str, ids.tolist()))) + "\n")
        elif cmd == "MSM" or cmd == "MSM_COUNT":
            # payload is "<m> <query>"
            m_s, _, mq = q.partition(" ")
            try:
                m = int(m_s)
            except ValueError as e:
                err.write(f"ERR {e}\n")
                out.write("\n")
            else:
                ids = idx.search_min_match_ids(mq, m, distributed=dist)
                out.write((f"{ids.size}" if cmd == "MSM_COUNT" else
                           " ".join(map(str, ids.tolist()))) + "\n")
        elif cmd == "TOP_10_AFTER":
            # payload is "<doc_id>:<score> <query>" — the cursor is page
            # N's last printed pair, pasted back verbatim. The printed
            # score is rounded to 6 decimals, so a tie thinner than 1e-6
            # can repeat/skip at the page seam — the library API's exact-
            # float cursor (engine.topk after=) has no such loss
            cur, _, aq = q.partition(" ")
            try:
                d_s, _, s_s = cur.partition(":")
                after = (int(d_s), float(s_s))
            except ValueError as e:
                err.write(f"ERR {e}\n")
                out.write("\n")
            else:
                top = idx.topk(aq, k=10, distributed=dist, after=after)
                out.write(" ".join(f"{d}:{s:.6f}" for d, s in top) + "\n")
        elif cmd == "PHRASE_COUNT":
            try:
                cnt = idx.count_phrase(q, distributed=dist)
            except ValueError as e:
                err.write(f"ERR {e}\n")
                out.write("\n")
            else:
                out.write(f"{cnt}\n")
        elif cmd == "SUGGEST":
            # payload "<term>" or "<term>~<edits>" like FUZZY; prints
            # ranked "term:distance:df" triples
            fm = re.fullmatch(r"(.*?)(?:~(\d*))?", q.strip())
            sterm, sed = fm[1], int(fm[2]) if fm[2] else 2
            try:
                sug = idx.suggest(sterm, k=10, max_edits=sed)
            except ValueError as e:
                err.write(f"ERR {e}\n")
                out.write("\n")
            else:
                out.write(" ".join(f"{t}:{d}:{df}"
                                   for t, d, df in sug) + "\n")
        elif cmd == "MLT":
            # payload is free text; prints the BM25 top-10 most-similar
            # docs as "doc_id:score" pairs (MoreLikeThis defaults)
            top = idx.more_like_this(q, k=10, distributed=dist)
            out.write(" ".join(f"{d}:{s:.6f}" for d, s in top) + "\n")
        elif cmd == "TERM_STATS":
            # payload is whitespace terms; prints "term:df:cf" sorted
            st = idx.term_stats(q.split(), distributed=dist)
            out.write(" ".join(f"{t}:{d}:{c}" for t, d, c in st) + "\n")
        else:
            err.write(f"ERR unknown command {cmd}\n")
        out.flush()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--distributed", action="store_true")
    ap.add_argument("--reference-protocol", action="store_true",
                    help="byte-identical do_query.py output (TOP_10 prints "
                         "the constant 1; non-reference commands print 0 + "
                         "UNSUPPORTED on stderr)")
    ap.add_argument("--prefix-max-terms", type=int, default=None,
                    help="cap PREFIX/PREFIX_COUNT dictionary expansion to "
                         "the N highest-df matching terms (unbounded by "
                         "default)")
    ap.add_argument("--queries", default="-",
                    help="query file; '-' = stdin (NOTE: spark-submit's "
                         "PythonRunner does not forward stdin to the app — "
                         "pass a file when running via spark-submit)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("psl-query").getOrCreate()
    source = sys.stdin if args.queries == "-" else open(args.queries)
    run(spark, args.index_dir, source, distributed=args.distributed,
        reference_protocol=args.reference_protocol,
        prefix_max_terms=args.prefix_max_terms)
    spark.stop()


if __name__ == "__main__":
    main()
