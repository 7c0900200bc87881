"""Query-CLI protocol test — pins jobs/query.py's line discipline to the
reference's search-benchmark-game protocol (commands/do_query.py:9-23):
tab-separated COMMAND\tquery lines, one output line per input line,
flushed per line. COUNT/TOP_10_COUNT print the AND match count; TOP_10 is
our north-rule BM25 upgrade (doc:score pairs instead of the reference's
constant 1)."""

import io

import pytest

from jobs.query import run
from pysearchlite_spark.datagen import micro_corpus
from pysearchlite_spark.engine import SearchIndex
from pysearchlite_spark.oracle import OracleEngine
from pysearchlite_spark.plans.builder import build_index


@pytest.fixture(scope="module")
def idx_dir(spark, tmp_path_factory):
    docs = micro_corpus()
    df = spark.createDataFrame(
        [(i, name, text) for i, (name, text) in enumerate(docs)],
        "doc_id long, url string, text string")
    d = str(tmp_path_factory.mktemp("cli_idx"))
    build_index(spark, df, d, id_col="doc_id", url_col="url", segment_docs=2)
    return d


def _run(spark, idx_dir, lines, distributed=False):
    out, err = io.StringIO(), io.StringIO()
    run(spark, idx_dir, [l + "\n" for l in lines], out, err,
        distributed=distributed)
    return out.getvalue().splitlines(), err.getvalue().splitlines()


def test_protocol_counts_match_reference_semantics(spark, idx_dir):
    # reference goldens (test_search_engine.py:12-14,25-27): count semantics
    out, err = _run(spark, idx_dir, [
        "COUNT\tthis test",
        "COUNT\tthat",
        "COUNT\thello",
        "TOP_10_COUNT\tthis test",
        "TOP_10_COUNT\tthat",
    ])
    assert out == ["2", "0", "1", "2", "0"]
    assert err == []


@pytest.fixture(scope="module")
def pos_idx_dir(spark, tmp_path_factory):
    docs = micro_corpus()
    df = spark.createDataFrame(
        [(i, name, text) for i, (name, text) in enumerate(docs)],
        "doc_id long, url string, text string")
    d = str(tmp_path_factory.mktemp("cli_pos_idx"))
    build_index(spark, df, d, id_col="doc_id", url_col="url",
                segment_docs=2, with_positions=True)
    return d


def test_protocol_phrase_commands(spark, pos_idx_dir):
    # micro corpus (test_search_engine.py:6-8): "this is a test" docs —
    # exact adjacency distinguishes "this test" (no) from "a test" (yes)
    out, err = _run(spark, pos_idx_dir, [
        "PHRASE_COUNT\ta test",
        "PHRASE_COUNT\tthis test",
        "PHRASE\ta test",
        "PHRASE_COUNT\tthat",
    ])
    assert err == []
    n_a_test = int(out[0])
    assert n_a_test >= 1
    assert out[1] == "0"            # tokens present, never adjacent
    assert len(out[2].split()) == n_a_test
    assert out[3] == "0"
    # distributed path agrees
    out_d, _ = _run(spark, pos_idx_dir, ["PHRASE_COUNT\ta test"],
                    distributed=True)
    assert out_d == [str(n_a_test)]


def test_protocol_top10_and_extensions(spark, idx_dir):
    oracle = OracleEngine()
    oracle.index_corpus(micro_corpus())
    out, _ = _run(spark, idx_dir, ["TOP_10\tthis test", "AND\tthis test",
                                   "OR\thello another", "SEARCH\tthis test"])
    want_top = " ".join(f"{d}:{s:.6f}" for d, s in oracle.topk(
        "this test", 10))
    assert out[0] == want_top
    assert out[1] == " ".join(map(str, oracle.search_and_ids("this test")))
    assert out[2] == " ".join(map(str, oracle.search_or_ids("hello another")))
    assert out[3] == " ".join(oracle.search("this test"))


def test_protocol_distributed_matches_driver(spark, idx_dir):
    lines = ["COUNT\tthis test", "TOP_10\tthis test", "AND\tthis test",
             "OR\thello another", "SEARCH\tthis test",
             "WILDCARD\tt?st", "MSM_COUNT\t2 hello this test"]
    assert _run(spark, idx_dir, lines)[0] == \
        _run(spark, idx_dir, lines, distributed=True)[0]


def test_protocol_wildcard_and_msm(spark, idx_dir):
    out, err = _run(spark, idx_dir, [
        "WILDCARD\tt?st",          # test → docs 1, 2
        "WILDCARD\t*ello",         # hello → doc 0
        "WILDCARD_COUNT\tanoth*",  # another → doc 2
        "REGEX\tt(his|est)",       # this|test → docs 1, 2
        "REGEX_COUNT\th.llo",      # hello → doc 0
        "MSM\t2 hello this test",  # ≥2 of the 3 terms → docs 1, 2
        "MSM\t1 hello this test",  # OR → all
        "MSM_COUNT\t3 hello this test",
        "MSM\tx hello",            # bad m → ERR line discipline
    ])
    assert out == ["1 2", "0", "1", "1 2", "1", "1 2", "0 1 2", "0", ""]
    assert err == ["ERR invalid literal for int() with base 10: 'x'"]


def test_protocol_query_string(spark, pos_idx_dir, idx_dir):
    out, err = _run(spark, pos_idx_dir, [
        'QUERY\t"this is" -another',   # phrase minus term → doc 1
        'QUERY_COUNT\tt?st -zz*',      # wildcard minus wildcard → 1, 2
        "QUERY\t-all -negated",        # no MUST clause → ERR discipline
    ])
    assert out == ["1", "2", ""]
    assert len(err) == 1 and err[0].startswith("ERR")
    # phrase clause on a position-free index degrades to ERR, not a crash
    out, err = _run(spark, idx_dir, ['QUERY\t"this is" test'])
    assert out == [""] and err and err[0].startswith("ERR")


def test_protocol_top10_after_paginates(spark, idx_dir):
    # 'another test' (OR): doc 2 matches both terms, doc 1 only 'test' —
    # distinct, well-separated scores so the 6-decimal protocol rounding
    # can't wobble the page seam; cursor = page 1's first printed pair
    (p1,), _ = _run(spark, idx_dir, ["TOP_10\tanother test"])
    pairs = p1.split()
    assert len(pairs) == 2
    (p2,), err = _run(spark, idx_dir,
                      [f"TOP_10_AFTER\t{pairs[0]} another test"])
    assert p2 == pairs[1]
    assert err == []
    # cursor past the end → empty line, bad cursor → ERR discipline
    (p3,), _ = _run(spark, idx_dir,
                    [f"TOP_10_AFTER\t{pairs[1]} another test"])
    assert p3 == ""
    out, err = _run(spark, idx_dir, ["TOP_10_AFTER\tnope another test"])
    assert out == [""] and err and err[0].startswith("ERR")


def test_protocol_unknown_and_blank_lines(spark, idx_dir):
    out, err = _run(spark, idx_dir, ["", "BOGUS\tx", "COUNT\thello"])
    assert out == ["1"]
    assert err == ["ERR unknown command BOGUS"]


def test_reference_protocol_byte_identical(spark, idx_dir):
    """--reference-protocol must be a drop-in for the reference's
    do_query loop: run the ACTUAL reference (imported read-only from
    /root/reference, driven through its own commands.do_query.main) and
    our run(reference_protocol=True) over the same corpus/queries and
    compare stdout byte-for-byte."""
    import os
    import sys
    import tempfile

    if not os.path.isdir("/root/reference/pysearchlite"):
        pytest.skip("reference engine not available")
    sys.path.insert(0, "/root/reference")
    try:
        import pysearchlite as psl
        from pysearchlite.commands import do_query
    finally:
        sys.path.pop(0)

    lines = [
        "COUNT\tthis test\n",
        "TOP_10\tthis test\n",
        "TOP_10_COUNT\tthat\n",
        "TOP_10_COUNT\thello\n",
        "BOGUS\tx\n",
        "COUNT\thello\n",
    ]

    # reference side: index micro_corpus with its own API, run ITS loop
    ref_dir = tempfile.mkdtemp(prefix="refproto_")
    psl.init(ref_dir)
    for name, text in micro_corpus():
        psl.index(name, text)
    psl.save_index()
    psl.clear_index()
    old_in, old_out, old_err = sys.stdin, sys.stdout, sys.stderr
    sys.stdin = io.StringIO("".join(lines))
    sys.stdout, sys.stderr = io.StringIO(), io.StringIO()
    try:
        do_query.main(ref_dir)
        ref_out = sys.stdout.getvalue()
        ref_err = sys.stderr.getvalue()
    finally:
        sys.stdin, sys.stdout, sys.stderr = old_in, old_out, old_err

    out, err = io.StringIO(), io.StringIO()
    run(spark, idx_dir, lines, out, err, reference_protocol=True)
    assert out.getvalue() == ref_out
    assert err.getvalue() == ref_err == "UNSUPPORTED\n"


def test_phrase_on_plain_index_degrades_to_err_line(spark, idx_dir):
    # a non-positional index must NOT kill the protocol loop: each phrase
    # command gets its one (empty) output line + an ERR line on stderr,
    # and later queued commands still run
    out, err = _run(spark, idx_dir, [
        "PHRASE\ta test",
        "PHRASE_COUNT\ta test",
        "COUNT\tthis test",
    ])
    assert out == ["", "", "2"]
    assert len(err) == 2 and all(e.startswith("ERR ") for e in err)


def test_protocol_multi_field_root(spark, tmp_path_factory):
    from pysearchlite_spark.fields import build_multi_field
    df = spark.createDataFrame(
        [(0, "a", "hello title", "hello world body"),
         (1, "b", "other title", "this is a test body"),
         (2, "c", "hello again", "this is another test")],
        "doc_id long, url string, title string, body string")
    root = str(tmp_path_factory.mktemp("cli_mf"))
    build_multi_field(spark, df, root,
                      fields={"title": "title", "body": "body"},
                      id_col="doc_id", url_col="url", segment_docs=2)
    out, err = _run(spark, root, [
        "QUERY\ttitle:hello body:test",    # fielded query string → doc 2
        "QUERY_COUNT\ttitle:hello",        # docs 0, 2
        "COUNT\thello",                    # single-index cmd → ERR line
    ])
    assert out == ["2", "2", ""]
    assert len(err) == 1 and "multi-field root" in err[0]
    # the per-field subdirectory stays a full single-field index
    out2, _ = _run(spark, f"{root}/fields/body", ["COUNT\ttest"])
    assert out2 == ["2"]


def test_suggest_mlt_stats_commands(spark, idx_dir):
    out, err = _run(spark, idx_dir, [
        "SUGGEST\ttost~1",        # 'test' is 1 edit away (df 2)
        "SUGGEST\tworld~0",       # exact-only → term itself excluded
        "TERM_STATS\ttest this zzmissing",
        "MLT\tthis is a test",
    ])
    assert out[0] == "test:1:2"
    assert out[1] == ""
    assert out[2] == "test:2:2 this:2:2"
    # doc 1 IS the text → ranks first; pairs are doc:score like TOP_10
    assert out[3].startswith("1:")
    assert all(":" in p for p in out[3].split())
    assert err == []
