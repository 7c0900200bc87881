"""prepare_corpus — the composed cleaning pipeline: each stage drops
exactly the planted offenders, the survivors land in the output parquet,
and the optional index build searches only survivors."""

import pytest

from pysearchlite_spark.pipeline import prepare_corpus


GOOD = ("the quick brown fox jumps over the lazy dog and then walks "
        "into town to find some other words worth keeping around")


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # 10 good docs: a long DISTINCT tail per doc (a shared head alone
    # would make them near-dups of each other)
    for i in range(10):
        tail = " ".join(f"w{i}x{j}" for j in range(20))
        rows.append((i, GOOD + " " + tail))
    rows.append((20, "zz " * 3))                        # too short
    rows.append((21, ";;; !!! ??? ::: " * 20))          # punctuation soup
    # repetition offender: passes quality (stopword 'the', no punct) but
    # one bigram is ~1/3 of all bigram instances
    rows.append((22, ("the spam phrase " * 40).strip()))
    rows.append((23, rows[0][1]))                       # exact dup of 0
    rows.append((24, rows[1][1] + " tiny edit"))        # near dup of 1
    rows.append((25, GOOD + " contains the secret benchmark answer "
                     "sequence alpha beta gamma delta epsilon zeta eta "
                     "theta"))                          # contaminated
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def probe(spark):
    return spark.createDataFrame(
        [(0, "the secret benchmark answer sequence alpha beta gamma "
             "delta epsilon zeta eta theta")],
        "doc_id long, text string")


def test_pipeline_stages_drop_the_planted_offenders(
        spark, corpus, probe, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("clean") / "out")
    idx_dir = str(tmp_path_factory.mktemp("clean_idx"))
    report = prepare_corpus(
        spark, corpus, out,
        quality={"min_n_tokens": 10, "max_punct_ratio": 0.2,
                 "min_stopword_ratio": 0.05},
        repetition={"max_top2gram_frac": 0.3},
        exact_dedup=True,
        near_dedup={"threshold": 0.8, "max_bucket": 100},
        decontaminate={"probe": probe, "n": 8, "max_frac": 0.0},
        index_dir=idx_dir, segment_docs=8)

    stages = {s["stage"]: s for s in report["stages"]}
    assert report["n_in"] == 16
    assert stages["quality"]["dropped"] == 2      # 20 (short), 21 (punct)
    assert stages["repetition"]["dropped"] == 1   # 22
    assert stages["exact_dedup"]["dropped"] == 1  # 23
    assert stages["near_dedup"]["dropped"] == 1   # 24
    assert stages["decontaminate"]["dropped"] == 1  # 25
    assert report["n_out"] == 10

    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept == set(range(10))

    # the index was built over survivors only
    from pysearchlite_spark.engine import SearchIndex
    idx = SearchIndex(spark, idx_dir)
    assert idx.n_docs == 10
    assert idx.count("quick brown fox") == 10
    assert idx.count("secret benchmark") == 0
    assert report["index"]["n_docs"] == 10  # BuildResult in the report


def test_pipeline_stage_toggles_and_errors(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("clean2") / "out")
    # only exact dedup enabled: one drop, everything else untouched
    report = prepare_corpus(spark, corpus, out)
    assert [s["stage"] for s in report["stages"]] == ["exact_dedup"]
    assert report["n_out"] == report["n_in"] - 1
    with pytest.raises(ValueError):
        prepare_corpus(spark, corpus, out, exact_dedup=False,
                       quality={"min_bogus_col": 1})


def test_pipeline_validates_config_before_any_stage(spark, corpus,
                                                    tmp_path_factory):
    out = str(tmp_path_factory.mktemp("clean4") / "out")
    # a typo'd near_dedup key fails up front — NOT after hours of
    # upstream stages at real scale (max_df belongs to token_jaccard)
    with pytest.raises(ValueError, match="near_dedup"):
        prepare_corpus(spark, corpus, out, near_dedup={"max_df": 100})
    assert not __import__("os").path.exists(out)  # no stage ran
    # near dedup keys docs by long ids: string id_col fails fast
    sdf = corpus.selectExpr("CAST(doc_id AS STRING) AS doc_id", "text")
    with pytest.raises(ValueError, match="integral id_col"):
        prepare_corpus(spark, sdf, out, near_dedup={"threshold": 0.9})


def test_pipeline_never_evicts_the_callers_cache(spark, corpus,
                                                 tmp_path_factory):
    out = str(tmp_path_factory.mktemp("clean5") / "out")
    cached = corpus.select("doc_id", "text").persist()
    cached.count()
    try:
        prepare_corpus(spark, cached, out)
        assert cached.storageLevel.useMemory  # still cached afterwards
    finally:
        cached.unpersist()


def test_pipeline_lang_filter(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(0, GOOD), (1, GOOD + " more of the same english text here"),
         (2, "der schnelle braune fuchs springt und der hund schläft "
             "während die katze über die straße in die stadt läuft")],
        "doc_id long, text string")
    out = str(tmp_path_factory.mktemp("clean3") / "out")
    report = prepare_corpus(spark, df, out, lang="en", exact_dedup=False)
    assert report["stages"][0]["stage"] == "lang"
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept == {0, 1}


def test_pipeline_url_dedup_and_pii_stages(spark, tmp_path_factory):
    df = spark.createDataFrame(
        [(0, GOOD, "https://a.com/x?utm_source=tw"),
         (1, GOOD + " variant one of the text", "HTTPS://A.COM:443/x#frag"),
         (2, GOOD + " mail me at bob@example.com or (202) 555-0199",
          "https://a.com/y"),
         (3, GOOD + " from host 10.1.2.3 tail", "https://b.com/z")],
        "doc_id long, text string, url string")
    out = str(tmp_path_factory.mktemp("clean6") / "out")
    report = prepare_corpus(spark, df, out, url_dedup_col="url",
                            exact_dedup=False, redact_pii=True)
    stages = {s["stage"]: s for s in report["stages"]}
    # 0 and 1 canonicalize to https://a.com/x — min id 0 survives
    assert stages["url_dedup"]["dropped"] == 1
    assert report["stages"][0]["stage"] == "url_dedup"  # runs first
    assert report["stages"][-1]["stage"] == "redact_pii"  # runs last
    assert stages["redact_pii"]["dropped"] == 0  # transform, not filter
    rows = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {0, 2, 3}
    assert "<EMAIL>" in rows[2]["text"] and "<PHONE>" in rows[2]["text"]
    assert "bob@example.com" not in rows[2]["text"]
    assert "<IP>" in rows[3]["text"]
    assert (rows[2]["n_emails"], rows[2]["n_phones"]) == (1, 1)
    assert rows[3]["n_ipv4"] == 1
    assert rows[0]["text"] == GOOD  # untouched text stays byte-identical


def test_pipeline_strip_lines_stage(spark, tmp_path_factory):
    banner = "subscribe to our newsletter for the latest updates"
    df = spark.createDataFrame(
        [(0, GOOD + "\n" + banner),
         (1, banner + "\n" + GOOD + " with a second distinct body"),
         (2, GOOD + " third body entirely boilerplate free")],
        "doc_id long, text string")
    out = str(tmp_path_factory.mktemp("clean7") / "out")
    report = prepare_corpus(spark, df, out,
                            strip_lines={"min_count": 2},
                            exact_dedup=False, release_cache=True)
    stages = [s["stage"] for s in report["stages"]]
    assert stages == ["strip_lines"]
    assert report["stages"][0]["dropped"] == 0  # transform, not filter
    rows = {r["doc_id"]: r["text"]
            for r in __import__("pyspark").sql.SparkSession.getActiveSession()
            .read.parquet(out).collect()}
    assert rows[0] == GOOD and banner not in rows[1]
    assert rows[2].startswith(GOOD)
    # typo'd key fails before any stage runs
    with pytest.raises(ValueError, match="strip_lines"):
        prepare_corpus(spark, df, out + "2",
                       strip_lines={"mincount": 2}, exact_dedup=False)


def test_pipeline_strip_lines_after_exact(spark, tmp_path_factory):
    banner = "please accept all cookies before continuing to read"
    # exact dup pair sharing the banner: after_exact placement must let
    # exact_dedup keep doc 0 with its BODY intact (only the banner goes)
    df = spark.createDataFrame(
        [(0, GOOD + "\n" + banner),
         (1, GOOD + "\n" + banner),          # exact copy of 0
         (2, banner + "\nsecond distinct body of text here"),
         (3, "third body without any boilerplate")],
        "doc_id long, text string")
    out = str(tmp_path_factory.mktemp("clean8") / "out")
    report = prepare_corpus(spark, df, out,
                            strip_lines={"min_count": 2},
                            strip_lines_stage="after_exact",
                            exact_dedup=True,
                            near_dedup={"threshold": 0.8, "max_bucket": 100},
                            release_cache=True)
    stages = [s["stage"] for s in report["stages"]]
    assert stages == ["exact_dedup", "strip_lines", "near_dedup"]
    rows = {r["doc_id"]: r["text"]
            for r in spark.read.parquet(out).collect()}
    assert set(rows) == {0, 2, 3}
    assert rows[0] == GOOD                   # body survived, banner gone
    assert banner not in rows[2]
    with pytest.raises(ValueError, match="strip_lines_stage"):
        prepare_corpus(spark, df, out + "2", strip_lines={"min_count": 2},
                       strip_lines_stage="first", exact_dedup=False)
