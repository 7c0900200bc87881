"""Driver contract for the spark-graft builder (PySpark target).

queries() entries cover SURVEY.md §2's operator inventory re-expressed
Spark-first (inverted-index build + AND/OR/COUNT/BM25 engine) plus the
training-data-pipeline operators (dedup, similarity, text analysis).

EVERY entry has a DuckDB oracle in oracle_sql() — including the ones whose
round-1 form was rows-only. The trick is configuration, not weakening:
  * doc_fingerprint / simhash_signatures run with hash_fn='md5' (the token
    hash DuckDB can reproduce bit-for-bit: '0x'||substr(md5(t),1,16));
  * minhash_lsh_pairs runs with shingle_k=1, threshold=0.9, bands=32 —
    unigram shingles make exact-verified LSH output equal token-set Jaccard
    pairs (P(missed pair) <= (1-0.9^2)^32 ≈ 8e-24), which SQL computes
    directly;
  * ann_lsh_topk queries a PERSISTED AnnIndex built with DATA-DERIVED
    hyperplanes (embeddings of vec_id 1..12), so the bucket bits are
    list_dot_product signs DuckDB can replicate; multi-probe(<=2 bit flips)
    == hamming(bits, query_bits) <= 2.
The default blake2b/Gaussian-plane configurations stay covered by tests/.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared bits
# ---------------------------------------------------------------------------

_IDX_CACHE: dict = {}
_TMP_DIRS: list = []


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _media_df(spark: SparkSession, sf_dir: str, kind: str) -> DataFrame:
    """(doc_id, media binary) with deterministic PSL1/PSLA blobs derived
    from doc_id alone — the oracle re-derives the same pixels/samples in
    SQL, so the Spark side exercises the real container encode/decode and
    feature kernels (functions/multimodal.py) end-to-end."""
    import numpy as np
    import pandas as pd

    from pysearchlite_spark.functions import multimodal as mm

    docs = _docs(spark, sf_dir).select("doc_id")

    def synth(batches):
        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                d = np.int64(did)
                if kind == "image":
                    flat = (d * 131 + np.arange(192, dtype=np.int64)
                            * 7919) % 256
                    blobs.append(mm.encode_image(
                        flat.astype(np.uint8).reshape(8, 8, 3)))
                elif kind == "video":
                    frames = []
                    for f in range(N_VID_FRAMES):
                        flat = (d * 131 + f * 4099
                                + np.arange(48, dtype=np.int64) * 7919) % 256
                        frames.append(
                            flat.astype(np.uint8).reshape(4, 4, 3))
                    blobs.append(mm.encode_video(frames))
                else:
                    s16 = ((d * 7 + np.arange(200, dtype=np.int64) * 13)
                           % 64001) - 32000
                    blobs.append(mm.encode_audio(
                        s16.astype(np.int16), sample_rate=8000))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": blobs})

    return docs.mapInPandas(synth, "doc_id long, media binary")


def _index(spark: SparkSession, sf_dir: str):
    """Build (once per sf_dir) and cache the inverted index over documents."""
    from pysearchlite_spark.engine import SearchIndex
    from pysearchlite_spark.plans.builder import build_index

    if sf_dir not in _IDX_CACHE:
        d = tempfile.mkdtemp(prefix="pslspark_idx_")
        _TMP_DIRS.append(d)
        build_index(spark, _docs(spark, sf_dir), d, id_col="doc_id",
                    segment_docs=256,
                    lineage={"source": f"{sf_dir}/documents.parquet"})
        _IDX_CACHE[sf_dir] = SearchIndex(spark, d)
    return _IDX_CACHE[sf_dir]


def _index_pos(spark: SparkSession, sf_dir: str):
    """Positional index over documents (built separately so the boolean /
    top-k entries keep measuring the position-free build): feeds the
    exact-phrase entries. Position pages live in their own parquet
    columns, so the boolean paths on THIS index would still prune them."""
    from pysearchlite_spark.engine import SearchIndex
    from pysearchlite_spark.plans.builder import build_index

    key = ("pos", sf_dir)
    if key not in _IDX_CACHE:
        d = tempfile.mkdtemp(prefix="pslspark_posidx_")
        _TMP_DIRS.append(d)
        build_index(spark, _docs(spark, sf_dir), d, id_col="doc_id",
                    segment_docs=256, with_positions=True,
                    lineage={"source": f"{sf_dir}/documents.parquet"})
        _IDX_CACHE[key] = SearchIndex(spark, d)
    return _IDX_CACHE[key]


DELETE_MOD = 7  # search_and_deleted tombstones doc_id % 7 == 0

# derived title field: the doc's first 5 tokens (Spark-side expression and
# the DuckDB oracle slice the SAME reference tokenization, so parity is
# exact by construction)
TITLE_EXPR = ("concat_ws(' ', slice(filter(split(lower(text), "
              "'[^a-z0-9]+'), x -> x != ''), 1, 5))")


def _mfi(spark: SparkSession, sf_dir: str):
    """Two-field index (title = first-5-token head, body = full text) —
    per-field term spaces with their own df/avgdl, Lucene's field model
    (fields.MultiFieldIndex)."""
    from pysearchlite_spark.fields import MultiFieldIndex, build_multi_field

    key = ("mfi", sf_dir)
    if key not in _IDX_CACHE:
        d = tempfile.mkdtemp(prefix="pslspark_mfidx_")
        _TMP_DIRS.append(d)
        build_multi_field(spark, _docs(spark, sf_dir), d,
                          fields={"title": TITLE_EXPR, "body": "text"},
                          id_col="doc_id", segment_docs=256)
        _IDX_CACHE[key] = MultiFieldIndex(spark, d)
    return _IDX_CACHE[key]


def _index_deleted(spark: SparkSession, sf_dir: str):
    """Index over documents with doc_id % DELETE_MOD == 0 tombstoned via
    plans.deletes.delete_docs — exercises delete-file commit + query-time
    masking (the Iceberg equality-delete shape); built separately so the
    shared _index stays delete-free."""
    from pysearchlite_spark.engine import SearchIndex
    from pysearchlite_spark.plans.builder import build_index
    from pysearchlite_spark.plans.deletes import delete_docs

    key = ("deleted", sf_dir)
    if key not in _IDX_CACHE:
        d = tempfile.mkdtemp(prefix="pslspark_delidx_")
        _TMP_DIRS.append(d)
        docs = _docs(spark, sf_dir)
        build_index(spark, docs, d, id_col="doc_id", segment_docs=256,
                    lineage={"source": f"{sf_dir}/documents.parquet"})
        delete_docs(spark, d,
                    docs.filter(F.col("doc_id") % DELETE_MOD == 0)
                    .select("doc_id"))
        _IDX_CACHE[key] = SearchIndex(spark, d)
    return _IDX_CACHE[key]


N_ANN_PLANES = 12


def _ann_query(spark: SparkSession, sf_dir: str) -> list:
    qv = (_emb(spark, sf_dir).filter(F.col("vec_id") == 0)
          .select("embedding").collect())
    return list(qv[0][0])


def _ann_index(spark: SparkSession, sf_dir: str):
    """Build (once per sf_dir) the persisted bucket-partitioned AnnIndex
    with data-derived hyperplanes: the embeddings of vec_id 1..N_ANN_PLANES
    (float64-promoted), which the SQL oracle reproduces via
    list_dot_product sign bits."""
    import numpy as np

    from pysearchlite_spark.operators.ann import AnnIndex

    key = ("ann", sf_dir)
    if key not in _IDX_CACHE:
        emb = _emb(spark, sf_dir)
        rows = (emb.filter(F.col("vec_id").between(1, N_ANN_PLANES))
                .orderBy("vec_id").collect())
        planes = np.asarray([list(r["embedding"]) for r in rows],
                            dtype=np.float64)
        d = tempfile.mkdtemp(prefix="pslspark_ann_")
        _TMP_DIRS.append(d)
        _IDX_CACHE[key] = AnnIndex.build(
            spark, emb.filter(F.col("vec_id") != 0), d, planes=planes)
    return _IDX_CACHE[key]


N_IVF_CENTROIDS = 16
IVF_NPROBE = 4
N_DUP_PLANES = 10            # pairwise_cosine_dups planes = embeddings 1..10
ANN_BATCH_QVIDS = (13, 14)   # batch queries (outside the plane vectors);
                             # vec 0 rides the single-query path as qid 0
N_VID_FRAMES = 4             # synthetic PSLV: 4 frames of 4x4x3
VID_EVERY_N = 2              # frame_sample stride -> frames {0, 2} kept


def _ivf_index(spark: SparkSession, sf_dir: str):
    """Persisted IVF-flat index with FIXED centroids (embeddings of vec_id
    1..N_IVF_CENTROIDS) so the oracle can replicate assignment/probing as
    cosine argmax in SQL (k-means-trained centroids stay covered in
    tests/)."""
    import numpy as np

    from pysearchlite_spark.operators.ann import IvfIndex

    key = ("ivf", sf_dir)
    if key not in _IDX_CACHE:
        emb = _emb(spark, sf_dir)
        rows = (emb.filter(F.col("vec_id").between(1, N_IVF_CENTROIDS))
                .orderBy("vec_id").collect())
        cents = np.asarray([list(r["embedding"]) for r in rows],
                           dtype=np.float64)
        d = tempfile.mkdtemp(prefix="pslspark_ivf_")
        _TMP_DIRS.append(d)
        _IDX_CACHE[key] = IvfIndex.build(
            spark, emb.filter(F.col("vec_id") != 0), d, centroids=cents)
    return _IDX_CACHE[key]


@atexit.register
def _cleanup() -> None:
    for d in _TMP_DIRS:
        shutil.rmtree(d, ignore_errors=True)


def _bpe_pattern_sql() -> str:
    from pysearchlite_spark.functions.text import BPE_PATTERN
    return BPE_PATTERN.replace("'", "''")


def _ids_df(spark: SparkSession, ids) -> DataFrame:
    # Arrow path (one batch, no per-row Python tuples) — the engine's own
    # idiom for id frames (engine.py search(), large-result branch)
    import numpy as np
    import pandas as pd
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": np.asarray(list(ids), dtype=np.int64)}),
        schema="doc_id long")


# DuckDB tokenizer expression — exact SQL equivalent of
# pysearchlite_spark.tokenizer (ASCII [A-Za-z0-9]+ runs, lowered; valid
# because lower() on the matched runs is ASCII-only):
_TOK = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"

def _with_pii_columns(base_sql: str) -> str:
    """Wrap a per-doc oracle query with the PII-redaction columns: the
    same doc_id%4-keyed synthetic PII injection as the quality_lang
    entry, counted/redacted by the identical sequential regex chain
    (functions/pii.py PII_PATTERNS — Java∩RE2-portable, so DuckDB
    reproduces Spark's regexp_count/regexp_replace exactly). Built by
    string concatenation, NOT .format(), because the patterns contain
    literal braces."""
    from pysearchlite_spark.functions.pii import PII_PATTERNS
    inject = ("coalesce(text, '') || CASE doc_id % 4"
              " WHEN 0 THEN ' contact user' || doc_id::VARCHAR ||"
              " '@example.com or admin@test.org'"
              " WHEN 1 THEN ' from 10.2.0.' || (doc_id % 250)::VARCHAR ||"
              " ' and 192.168.1.1'"
              " WHEN 2 THEN ' call (202) 555-0199 or 555-123-4567'"
              " ELSE '' END")
    expr, cols = "s", []
    names = {"email": "n_emails", "phone": "n_phones", "ipv4": "n_ipv4"}
    for name, pat, repl in PII_PATTERNS:
        cols.append(f"len(regexp_extract_all({expr}, '{pat}'))"
                    f" AS {names[name]}")
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    pii_q = (f"SELECT doc_id, {', '.join(cols)}, "
             f"length({expr}) AS clean_n_chars "
             f"FROM (SELECT doc_id, {inject} AS s FROM documents)")
    return (f"SELECT base.*, p.n_emails, p.n_phones, p.n_ipv4, "
            f"p.clean_n_chars FROM ({base_sql}) base "
            f"JOIN ({pii_q}) p USING (doc_id) ORDER BY doc_id")


Q_AND = "table part"          # terms present in the synthetic vocabulary
Q_OR = "spark merge"
Q_BM25 = "query value"
Q_TERMS = ["table", "part", "query", "value", "spark", "merge", "zzmissing"]
Q_PHRASE = "table part"       # consecutive-token phrase, non-trivial hits
Q_PHRASE3 = "value table part"
Q_PREFIX = "s"  # expands to 6 dictionary terms at sf0.01
Q_NEAR, NEAR_SLOP = "value part", 2  # 71 docs at sf0.01 vs 28 exact
Q_NOT = "merge"                # exclusion term for the AND-NOT entry
BATCH_QUERIES = [Q_BM25, Q_AND, Q_OR]  # bm25_topk_batch: one job, 3 queries
FILTER_PRED = "n_chars >= 300"  # allow-list predicate (filtered entries)
Q_MSM, MSM_M = "table query spark merge", 3   # min-should-match: 3 of 4
W_PATTERN, W_LIKE = "s?a*", "s_a%"  # wildcard ≙ SQL LIKE (token alphabet)
FZ_TERM, FZ_EDITS = "part", 2  # fuzzy: expands to {fast,part,sort,spark}
SG_TERM, SG_EDITS = "part", 2  # suggest: same neighbourhood, ranked
RANGE_EDGES = [0, 150, 250, 350, 450, 600]  # n_chars bins (range facet)
SIG_K, SIG_MIN_FG = 10, 2      # significant-terms: top-10, fg_df >= 2
MLT_TEXT = "table part value spark table query merge table"  # MLT source
MLT_MAXT, MLT_MINDF = 4, 2     # keep 4 most characteristic terms, df >= 2
RX_PATTERN = "s(mall|low|ort)"  # regex term query (valid re/rlike/RE2)
Q_STRING = f'value "{Q_PHRASE}" -merge {W_PATTERN}'  # parser composite
GRP_Q = "(table OR row)^2 value"  # OR-group + boost query string
GRP_BOOST = 2.0
SYN_Q, SYN_MAP = "table value", {"table": ["row"]}  # synonym group
FIELD_Q = {"title": "table", "body": "part value"}  # cross-field AND
Q_DIS, DIS_W = "table value", {"title": 2.0, "body": 1.0}  # dismax
# strip_lines entry: planted boilerplate (>= 15 trimmed chars, so both
# pass the census min_chars bar); the oracle mirrors the same concat
BANNER_LINE = "Accept cookies to continue reading"
FOOTER_LINE = "Copyright Example Media Holdings"
CHUNK_LEN = 8                  # chunk_tokens entry: seq_len


# ---------------------------------------------------------------------------
# contract functions
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 ranked retrieval over sf0.001 documents."""
    idx = _index(spark, "/root/testdata/sf0.001")
    top = idx.topk(Q_BM25, k=10)
    return spark.createDataFrame(
        [(int(d), float(s)) for d, s in top], "doc_id long, score double")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def search_and(spark, sf):
        # THREE boolean-AND surfaces in one verified entry: variant='local'
        # is the collect path (leapfrog kernel, ids to driver); 'dist' is
        # the lazy 10^12-doc surface (per-segment distributed kernels +
        # docmap join, nothing collected until the driver's comparison);
        # 'count' is count-WITHOUT-materialization (reference A3: engine
        # .count over the Q_BM25 terms, distributed per-segment counts
        # summed — no id list ever built), riding as one
        # (doc_id=cnt, url=NULL) row
        idx = _index(spark, sf)
        local = (_ids_df(spark, idx.search_and_ids(Q_AND))
                 .select(F.lit("local").alias("variant"), "doc_id",
                         F.col("doc_id").cast("string").alias("url")))
        dist = (idx.search_df(Q_AND).select("doc_id", "url")
                .select(F.lit("dist").alias("variant"), "doc_id", "url"))
        cnt = (spark.createDataFrame([(int(idx.count(Q_BM25)),)],
                                     "doc_id long")
               .select(F.lit("count").alias("variant"), "doc_id",
                       F.lit(None).cast("string").alias("url")))
        return local.unionByName(dist).unionByName(cnt)

    def search_and_deleted(spark, sf):
        # tombstone masking on the DISTRIBUTED path (cogrouped per-segment
        # delete rows), post-delete snapshot
        return _ids_df(spark, _index_deleted(spark, sf)
                       .search_and_ids(Q_AND, distributed=True))

    def search_or(spark, sf):
        return _ids_df(spark, _index(spark, sf).search_or_ids(Q_OR))

    def search_phrase(spark, sf):
        # both phrase kernels, one entry: variant='local3' is the 3-gram
        # local block-selective kernel (operators/phrase.py); 'dist2' is
        # the distributed path (per-segment applyInPandas kernel, only
        # matching ids cross the exchange)
        idx = _index_pos(spark, sf)
        local = (_ids_df(spark, idx.search_phrase_ids(Q_PHRASE3))
                 .select(F.lit("local3").alias("variant"), "doc_id"))
        dist = (idx.search_df(Q_PHRASE, mode="phrase").select("doc_id")
                .select(F.lit("dist2").alias("variant"), "doc_id"))
        return local.unionByName(dist)

    def search_near(spark, sf):
        # both proximity kernels (SpanNearQuery): variant='ordered' is
        # inOrder=True (greedy chained-searchsorted,
        # operators/phrase.py:near_match_ids); 'unordered' allows ANY
        # arrangement inside a window of n-1+slop (anchor-scan kernel,
        # near_unordered_match_ids)
        idx = _index_pos(spark, sf)
        o = (_ids_df(spark, idx.search_near_ids(Q_NEAR, NEAR_SLOP))
             .select(F.lit("ordered").alias("variant"), "doc_id"))
        u = (_ids_df(spark, idx.search_near_ids(Q_NEAR, NEAR_SLOP,
                                                in_order=False))
             .select(F.lit("unordered").alias("variant"), "doc_id"))
        return o.unionByName(u)

    def bm25_scores(spark, sf):
        # score the WHOLE match set as a lazy DataFrame (reranker-feature /
        # export surface): per-segment scoring kernel, no truncation, no
        # driver hop — engine.scores_df
        return (_index(spark, sf).scores_df(Q_BM25)
                .select("doc_id", F.round("score", 6).alias("score")))

    def search_collapse(spark, sf):
        # field collapsing (Lucene grouping / ES collapse): top-k matches
        # keeping only the best-scoring doc per lang; groupBy+max_by with
        # map-side partial combine over the scored match set
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        return (_index(spark, sf)
                .search_collapse(Q_BM25, docs, "lang", k=10)
                .select("doc_id", F.round("score", 6).alias("score"),
                        "collapse"))

    def search_prefix(spark, sf):
        # wildcard-prefix query (Lucene PrefixQuery shape): dictionary
        # expansion via a StartsWith-pushed (term, df) scan, then the OR
        # union over the expanded terms
        return _ids_df(spark,
                       _index(spark, sf).search_prefix_ids(Q_PREFIX))

    def bm25_topk_batch(spark, sf):
        # N queries through ONE distributed job (qid-tagged per-segment
        # partials, engine.topk_batch) — the text analogue of the batch
        # ANN entry
        res = _index(spark, sf).topk_batch(BATCH_QUERIES, k=10)
        rows = [(qi, int(d), float(s))
                for qi, lst in enumerate(res) for d, s in lst]
        out = spark.createDataFrame(rows, "qid long, doc_id long, score double")
        return out.select("qid", "doc_id",
                          F.round("score", 6).alias("score"))

    def bm25_topk(spark, sf):
        # page 1 = plain top-10 (block-max WAND); page 2 = searchAfter
        # pagination (Lucene cursor, not OFFSET): page 1's last
        # (doc_id, score) tuple is the cursor — both pages one entry
        idx = _index(spark, sf)
        p1 = idx.topk(Q_BM25, k=10)
        p2 = idx.topk(Q_BM25, k=10, after=p1[-1])
        rows = ([(1, int(d), float(s)) for d, s in p1]
                + [(2, int(d), float(s)) for d, s in p2])
        out = spark.createDataFrame(
            rows, "page long, doc_id long, score double")
        return out.select("page", "doc_id",
                          F.round("score", 6).alias("score"))

    def bm25_topk_filtered(spark, sf):
        # filtered retrieval (Lucene filter-clause shape): the allow-list
        # is a doc_id DataFrame produced from the corpus table — the
        # "rank only docs that passed the upstream quality pass" pipeline
        # form. Scores stay corpus-wide; the filter is applied before
        # per-segment top-k truncation (engine.topk filter_ids), so docs
        # below the unfiltered top-10 surface — NOT post-filtering.
        allow = _docs(spark, sf).filter(FILTER_PRED).select("doc_id")
        top = _index(spark, sf).topk(Q_BM25, k=10, filter_ids=allow)
        out = spark.createDataFrame(
            [(int(d), float(s)) for d, s in top], "doc_id long, score double")
        return out.select("doc_id", F.round("score", 6).alias("score"))

    def search_min_match(spark, sf):
        # BOTH min-should-match surfaces (Lucene minimumNumberShouldMatch,
        # 3 of 4 terms) in one entry: variant='ids' is the DISTRIBUTED
        # match-id surface (per-segment multiplicity counting inside the
        # kernel — segments partition the docID space, so local counts
        # are global counts); variant='topk' is ranked msm: candidates =
        # docs matching >= m distinct terms, scores = full disjunctive
        # BM25 (msm restricts, never rescores)
        idx = _index(spark, sf)
        ids = (_ids_df(spark, idx.search_min_match_ids(
                   Q_MSM, MSM_M, distributed=True))
               .select(F.lit("ids").alias("variant"), "doc_id",
                       F.lit(None).cast("double").alias("score")))
        top = idx.topk(Q_MSM, k=10, min_match=MSM_M)
        topdf = (spark.createDataFrame(
                     [(int(d), float(s)) for d, s in top],
                     "doc_id long, score double")
                 .select(F.lit("topk").alias("variant"), "doc_id",
                         F.round("score", 6).alias("score")))
        return ids.unionByName(topdf)

    def search_termset(spark, sf):
        # the three dictionary-expansion term queries in one entry, each
        # its own kernel: 'wildcard' (s?a*) expands via pushed StartsWith
        # + rlike on the term-sorted postings; 'regex' (Lucene
        # RegexpQuery) anchors the literal head as StartsWith; 'fuzzy'
        # (FuzzyQuery, transpositions=false) expands by length-banded
        # thresholded Levenshtein over the (term, df) scan — all three
        # end in the same OR union
        idx = _index(spark, sf)
        parts = [
            (_ids_df(spark, idx.search_wildcard_ids(W_PATTERN))
             .select(F.lit("wildcard").alias("variant"), "doc_id")),
            (_ids_df(spark, idx.search_regex_ids(RX_PATTERN))
             .select(F.lit("regex").alias("variant"), "doc_id")),
            (_ids_df(spark, idx.search_fuzzy_ids(FZ_TERM,
                                                 max_edits=FZ_EDITS))
             .select(F.lit("fuzzy").alias("variant"), "doc_id")),
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def suggest_terms(spark, sf):
        # spell suggestions (Lucene DirectSpellChecker shape): dictionary
        # terms within <=2 edits of the query term, ranked (distance asc,
        # global df desc, term asc) — plain Levenshtein so DuckDB agrees
        rows = _index(spark, sf).suggest(SG_TERM, k=5, max_edits=SG_EDITS)
        return spark.createDataFrame(
            [(t, int(d), int(df)) for t, d, df in rows],
            "term string, distance long, df long")

    def more_like_this(spark, sf):
        # Lucene MoreLikeThis: select the text's most characteristic
        # terms by tf-in-text * corpus idf (rounded to 6dp for tie
        # parity with the SQL ln()), then disjunctive BM25 top-10
        top = _index(spark, sf).more_like_this(
            MLT_TEXT, k=10, max_query_terms=MLT_MAXT, min_df=MLT_MINDF)
        out = spark.createDataFrame(
            [(int(d), float(s)) for d, s in top], "doc_id long, score double")
        return out.select("doc_id", F.round("score", 6).alias("score"))

    def search_query(spark, sf):
        # Lucene-style query STRING (query_parser): term AND exact-phrase
        # AND wildcard-any AND NOT term, each clause on its own kernel,
        # composed with the sorted-mask kernels (positional index)
        return _ids_df(spark, _index_pos(spark, sf)
                       .search_query_ids(Q_STRING))

    def search_synonym_and(spark, sf):
        # query-time synonym expansion (table|row) AND value — union
        # within group, intersect across groups, per segment
        return _ids_df(spark, _index(spark, sf)
                       .search_synonym_ids(SYN_Q, SYN_MAP))

    def bm25_topk_syn(spark, sf):
        # Lucene SynonymQuery scoring: group tf = sum of member tfs
        # (saturation once), group idf from the max member df
        top = _index(spark, sf).topk_synonyms(SYN_Q, SYN_MAP, k=10)
        out = spark.createDataFrame(
            [(int(d), float(s)) for d, s in top], "doc_id long, score double")
        return out.select("doc_id", F.round("score", 6).alias("score"))

    def bm25_topk_query(spark, sf):
        # ranked query string: phrase/wildcard/NOT clauses gate
        # membership, the term clause ('value') scores — filtered top-k
        # inside the boolean match set
        top = _index_pos(spark, sf).topk_query(Q_STRING, k=10)
        out = spark.createDataFrame(
            [(int(d), float(s)) for d, s in top], "doc_id long, score double")
        return out.select("doc_id", F.round("score", 6).alias("score"))

    def bm25_topk_boosted(spark, sf):
        # OR-group + boost query string ((table OR row)^2 value): the
        # group gates AND scores as ONE SynonymQuery pseudo-term whose
        # contribution is multiplied by the boost (folded into the group
        # idf — bit-identical to post-scaling); conjunctive gating across
        # clauses, filtered group scoring inside the match set
        top = _index(spark, sf).topk_query(GRP_Q, k=10)
        out = spark.createDataFrame(
            [(int(d), float(s)) for d, s in top], "doc_id long, score double")
        return out.select("doc_id", F.round("score", 6).alias("score"))

    def field_search_and(spark, sf):
        # cross-field conjunction (title:table AND body:(part value)):
        # each field queries its OWN pruned index; ids intersect after
        return _ids_df(spark, _mfi(spark, sf).search_and_ids(FIELD_Q))

    def bm25_dismax(spark, sf):
        # Lucene DisjunctionMax across title/body with field boosts:
        # score = max_f(w_f * BM25_f) — per-field stats (df, avgdl), so a
        # title hit outranks the same tokens buried in a long body
        top = _mfi(spark, sf).topk_dismax(Q_DIS, k=10, weights=DIS_W)
        out = spark.createDataFrame(
            [(int(d), float(s)) for d, s in top], "doc_id long, score double")
        return out.select("doc_id", F.round("score", 6).alias("score"))

    def search_and_filtered(spark, sf):
        # boolean AND restricted to the same allow-list, DISTRIBUTED path:
        # the pseg-routed allow rows are cogrouped into the per-segment
        # kernel next to the tombstones — never collected or broadcast
        allow = _docs(spark, sf).filter(FILTER_PRED).select("doc_id")
        return _ids_df(spark, _index(spark, sf).search_and_ids(
            Q_AND, distributed=True, filter_ids=allow))

    def token_stats(spark, sf):
        # three independent token-count surfaces joined on doc_id, all
        # value-checked at once: doc_len from the INDEX's docmap (the
        # persisted DocList), n_tokens from the tokenizer function, and
        # n_bpe_tokens from the BPE-ish regex counter
        from pysearchlite_spark.functions.text import (bpe_token_counts,
                                                       token_counts)
        docs = _docs(spark, sf)
        dl = _index(spark, sf)._docmap.select("doc_id", "doc_len")
        tc = token_counts(docs).select(
            "doc_id", F.col("n_tokens").cast("long").alias("n_tokens"))
        bc = bpe_token_counts(docs)
        return dl.join(tc, "doc_id").join(bc, "doc_id")

    def quality_lang(spark, sf):
        # per-doc quality signals + language-ID + PII redaction counts,
        # one scan each, joined. The corpus has no organic PII, so the
        # entry injects deterministic emails/IPs/phones keyed on
        # doc_id%4 (the oracle mirrors the same concat) — the redaction
        # regexes live in the Java∩RE2 subset, so DuckDB reproduces the
        # counts and the redacted length exactly.
        from pysearchlite_spark.functions.pii import redact_pii
        from pysearchlite_spark.functions.text import lang_id, quality_stats
        docs = _docs(spark, sf)
        m = F.col("doc_id") % 4
        pii_txt = F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(m == 0, F.concat(
                F.lit(" contact user"), F.col("doc_id").cast("string"),
                F.lit("@example.com or admin@test.org")))
            .when(m == 1, F.concat(
                F.lit(" from 10.2.0."),
                (F.col("doc_id") % 250).cast("string"),
                F.lit(" and 192.168.1.1")))
            .when(m == 2, F.lit(" call (202) 555-0199 or 555-123-4567"))
            .otherwise(F.lit("")))
        pii = (redact_pii(docs.select("doc_id", pii_txt.alias("text")))
               .select("doc_id", "n_emails", "n_phones", "n_ipv4",
                       F.length("text_clean").alias("clean_n_chars")))
        return (quality_stats(docs).join(lang_id(docs), "doc_id")
                .join(pii, "doc_id"))

    def doc_signatures(spark, sf):
        # both 64-bit per-doc signatures, full VALUES oracle-checked:
        # rolling-hash fingerprint + simhash (hash_fn='md5' — the token
        # hash DuckDB reproduces bit-for-bit)
        from pysearchlite_spark.functions.text import doc_fingerprint
        from pysearchlite_spark.operators.dedup import simhash_signatures
        docs = _docs(spark, sf)
        return (doc_fingerprint(docs, hash_fn="md5")
                .join(simhash_signatures(docs, hash_fn="md5"), "doc_id"))

    def exact_dup(spark, sf):
        # both exact-dedup tiers in one entry (method column):
        # 'text' — byte-identical-content keep-list (hash groupBy);
        # 'url'  — re-crawl dedup by CANONICAL URL (functions/url.py:
        # case/port/fragment/tracking-param normalization, then the same
        # keep-list shape). documents has no url column, so the entry
        # synthesizes one per doc exercising every canonicalization rule
        # (mixed-case scheme+host, default ports, empty paths, utm/fbclid
        # params, fragments); the oracle builds the identical string and
        # canonicalizes it with the same Java∩RE2 regex chain.
        from pysearchlite_spark.functions.url import url_dedup
        from pysearchlite_spark.operators.dedup import exact_dedup
        docs = _docs(spark, sf)
        text_part = exact_dedup(docs).select(
            F.lit("text").alias("method"), "doc_id",
            F.lit(None).cast("string").alias("canonical_url"),
            "keep_id", "is_dup")
        d = F.col("doc_id")
        raw = F.concat(
            F.lit("HTTP"),
            F.when(d % 2 == 0, F.lit("S")).otherwise(F.lit("")),
            F.lit("://WWW.H"), (d % 7).cast("string"), F.lit(".Example.COM"),
            F.when(d % 2 == 0, F.lit(":443")).otherwise(F.lit(":80")),
            F.when(d % 3 == 0, F.lit("")).otherwise(
                F.concat(F.lit("/p/"), (d % 5).cast("string"))),
            F.lit("?utm_source=feed&id="), (d % 4).cast("string"),
            F.lit("&fbclid=XYZ#s"), d.cast("string"))
        url_part = url_dedup(docs.select("doc_id", raw.alias("url"))).select(
            F.lit("url").alias("method"), "doc_id", "canonical_url",
            "keep_id", "is_dup")
        return text_part.unionAll(url_part).orderBy("method", "doc_id")

    def corpus_sample(spark, sf):
        # both sampling operators in one entry (method column):
        # 'cap' — stratified capping (Common-Crawl domain-quota shape):
        # keep <= 7 docs per source, the deterministic md5-priority
        # sample, via the salted two-phase path (salts=4; the salt shapes
        # the shuffle only — the kept SET is what the oracle's single
        # window computes; the salts=1 native-WindowGroupLimit default is
        # exercised by test_sample + BENCH/sample_scale.py);
        # 'wsample' — deterministic weighted sampling without replacement
        # (Efraimidis-Spirakis exponential race, u from md5 hex — 52-bit
        # exact in float64, so DuckDB reproduces the exact kept set),
        # weight = length(text)+1, compiled to TakeOrderedAndProject.
        import pyspark.sql.functions as F

        from pysearchlite_spark.operators.sample import (cap_per_key,
                                                         weighted_sample_n)
        docs = _docs(spark, sf)
        capped = (cap_per_key(docs.select("doc_id", "source"),
                              "source", 7, salts=4)
                  .select(F.lit("cap").alias("method"), "doc_id", "source"))
        sampled = (weighted_sample_n(
                       docs.select("doc_id", "source",
                                   (F.length("text") + 1).cast("double")
                                   .alias("w")),
                       25, "w")
                   .select(F.lit("wsample").alias("method"), "doc_id",
                           "source"))
        return capped.unionAll(sampled).orderBy("method", "doc_id")

    def strip_lines(spark, sf):
        # corpus-wide duplicate-line removal (CCNet/Dolma boilerplate-
        # paragraph stage, functions/lines.py): census of trimmed lines
        # (map-side combined on 64-bit hashes) -> anti-join -> per-doc
        # reassembly. The synthetic corpus has no organic repeated lines,
        # so the entry plants a cookie banner on doc_id%3==0 and a footer
        # on doc_id%4==1 (the oracle mirrors the same concat — both
        # >= min_chars so they pass the census bar while every organic
        # line survives). Cleaned text ships as md5 so the value compare
        # stays byte-exact without moving whole documents.
        from pysearchlite_spark.functions.lines import strip_duplicate_lines
        docs = _docs(spark, sf)
        txt = F.concat(
            F.when(F.col("doc_id") % 3 == 0,
                   F.lit(BANNER_LINE + "\n")).otherwise(F.lit("")),
            F.coalesce(F.col("text"), F.lit("")),
            F.when(F.col("doc_id") % 4 == 1,
                   F.lit("\n" + FOOTER_LINE)).otherwise(F.lit("")))
        out = strip_duplicate_lines(
            docs.select("doc_id", txt.alias("text")))
        return out.select("doc_id", "n_lines", "n_removed",
                          F.md5("text").alias("clean_md5"))

    def chunk_tokens_entry(spark, sf):
        # BOTH training-sequence exports (functions/sequences.py) in one
        # entry: variant='chunk' — per-doc chunking (engine-tokenizer
        # stream -> deterministic 60-bit md5 token ids -> seq_len-sized
        # chunks, ragged tail, a ZERO-shuffle flatMap); variant='pack' —
        # cross-doc PACKED sequences in doc_id order (GPT-dataloader
        # shape; two-phase bucketed prefix sum replaces the global-order
        # window, chunk_id = global seq_id, doc_id = NULL since a packed
        # sequence spans docs). Each id list is fingerprinted as
        # md5(comma-join) so the compare is value-exact on every token id
        # without array-typed columns in the contract.
        from pysearchlite_spark.functions.sequences import (chunk_tokens,
                                                            pack_tokens)
        docs = _docs(spark, sf)

        def fp(col):
            return F.md5(F.concat_ws(
                ",", F.transform(col, lambda x: x.cast("string"))))

        chunked = (chunk_tokens(docs, CHUNK_LEN)
                   .select(F.lit("chunk").alias("variant"), "doc_id",
                           "chunk_id", "n_tokens",
                           fp("token_ids").alias("ids_md5")))
        packed = (pack_tokens(docs, CHUNK_LEN, n_buckets=16)
                  .select(F.lit("pack").alias("variant"),
                          F.lit(None).cast("long").alias("doc_id"),
                          F.col("seq_id").cast("int").alias("chunk_id"),
                          "n_tokens", fp("token_ids").alias("ids_md5")))
        return chunked.unionByName(packed)

    def jaccard_pairs(spark, sf):
        # both tiers of the two-tier dedup design in one entry:
        # variant='all' is EXACT all-pairs jaccard with the rare-token cap
        # disabled (max_df=inf) — valid only at oracle scale;
        # variant='bounded' is the 100-TB configuration — candidates only
        # through tokens with df <= 100, exact for pairs sharing >= 1
        # rare token (the oracle replicates the same candidate rule)
        from pysearchlite_spark.operators.dedup import token_jaccard_pairs
        docs = _docs(spark, sf)
        a = (token_jaccard_pairs(docs, threshold=0.8, max_df=10**9)
             .select(F.lit("all").alias("variant"), "a", "b", "jaccard"))
        b = (token_jaccard_pairs(docs, threshold=0.8, max_df=100)
             .select(F.lit("bounded").alias("variant"), "a", "b",
                     "jaccard"))
        return a.unionByName(b)

    def search_and_not(spark, sf):
        # boolean negation: include-AND minus per-segment exclusion union
        # (sorted-mask kernel; the NOT set never materializes globally)
        return _ids_df(spark, _index(spark, sf).search_and_not_ids(
            Q_AND, Q_NOT, distributed=True))

    def facet_counts_entry(spark, sf):
        # Solr/ES-style aggregations over the match set, both shapes in
        # one entry: kind='lang' is the terms aggregation (lazy id set
        # joins documents reading only (doc_id, lang), map-side-combined
        # count per value); kind='chars' is the range aggregation
        # (half-open [lo, hi) n_chars bins, CASE chain in whole-stage
        # codegen) keyed by stringified bin index
        idx = _index(spark, sf)
        docs = _docs(spark, sf)
        lang = (idx.facet_counts(Q_AND, docs, "lang")
                .select(F.lit("lang").alias("kind"), "facet", "n"))
        rng = (idx.facet_range(Q_AND, docs, "n_chars", RANGE_EDGES)
               .select(F.lit("chars").alias("kind"),
                       F.col("bin").cast("string").alias("facet"), "n"))
        return lang.unionByName(rng)

    def search_sorted(spark, sf):
        # Lucene Sort/SortField shape: top-10 matches by n_chars desc
        # (doc_id tiebreak) — orderBy+limit compiles to
        # TakeOrderedAndProject, never a full sort
        return _index(spark, sf).search_sorted(
            Q_AND, by="n_chars", docs=_docs(spark, sf), k=10)

    def term_stats(spark, sf):
        # Lucene CollectionStatistics/TermStatistics: (df, totalTermFreq)
        # per term — tf streams decoded inside mapInPandas, only the
        # per-term aggregate crosses. The dictionary-scan df path
        # (global_dfs over the pushed (term, df) scan) is cross-asserted
        # in-entry so BOTH df surfaces stay honest under one oracle.
        idx = _index(spark, sf)
        rows = idx.term_stats(Q_TERMS, distributed=True)
        dfs = idx.global_dfs(idx._fetch(Q_TERMS), Q_TERMS)
        for t, d, _ in rows:
            if int(dfs[t]) != int(d):
                raise AssertionError(
                    f"global_dfs({t})={dfs[t]} != term_stats df={d}")
        return spark.createDataFrame(rows, "term string, df long, cf long")

    def significant_terms(spark, sf):
        # ES significant-terms (JLH): one full postings scan cogrouped
        # with the pseg-routed foreground rows; agg + score + top-k all
        # JVM-side, k rows collected
        rows = _index(spark, sf).significant_terms(
            Q_AND, k=SIG_K, min_fg=SIG_MIN_FG)
        return spark.createDataFrame(
            [(t, int(f), int(d), float(s)) for t, f, d, s in rows],
            "term string, fg_df long, df long, score double")

    def search_snippets_entry(spark, sf):
        # keyword-in-context highlighting: index prunes the doc set, the
        # ±5-token window around the first query-term hit is pure JVM
        # expressions over the re-tokenized stored text (Lucene
        # highlighter shape)
        return _index(spark, sf).search_snippets(
            Q_AND, _docs(spark, sf), window=5)

    def dedup_cluster_entry(spark, sf):
        # the step AFTER pair generation: transitive closure of the
        # bounded-jaccard pairs via alternating large/small-star connected
        # components — (doc_id, cluster_id=component min, is_dup) for
        # EVERY doc, so filter(~is_dup) is the keep-one-per-group list
        from pysearchlite_spark.operators.cluster import dedup_clusters
        return dedup_clusters(_docs(spark, sf), threshold=0.8, max_df=100)

    def minhash_pairs(spark, sf):
        # unigram shingles + 32x2 banding: output == token-jaccard >= 0.9
        # pairs (see module docstring), giving the LSH pipeline an exact
        # SQL oracle; k=3 shingles + capped buckets stay covered in tests/
        from pysearchlite_spark.operators.dedup import minhash_lsh_pairs
        return minhash_lsh_pairs(_docs(spark, sf), threshold=0.9,
                                 shingle_k=1, n_perm=64, bands=32)

    def simhash_prs(spark, sf):
        # full banded pipeline end-to-end (md5 token hash → signatures →
        # hierarchical pigeonhole candidates → exact hamming verify); at
        # oracle scale no bucket exceeds the cap, so output == ALL pairs
        # with hamming <= 3, which SQL computes directly
        from pysearchlite_spark.operators.dedup import simhash_pairs
        return simhash_pairs(_docs(spark, sf), max_hamming=3, hash_fn="md5")

    def cosine_dups(spark, sf):
        # bucket-capped embedding near-dup pairs with DATA-DERIVED planes
        # (embeddings of vec_id 1..10) so the oracle reproduces bucket
        # equality as sign-bit parity + exact cosine verify
        import numpy as np

        from pysearchlite_spark.operators.ann import pairwise_cosine_dups
        emb = _emb(spark, sf)
        rows = (emb.filter(F.col("vec_id").between(1, N_DUP_PLANES))
                .orderBy("vec_id").collect())
        planes = np.asarray([list(r["embedding"]) for r in rows],
                            dtype=np.float64)
        # the synthetic embeddings are near-orthogonal (max same-bucket
        # cos ~0.45 at sf0.01), so tau=0.4 exercises a non-empty verify
        return pairwise_cosine_dups(emb.filter(F.col("vec_id") != 0),
                                    tau=0.4, planes=planes)

    def ann_cosine(spark, sf):
        from pysearchlite_spark.operators.ann import brute_cosine_topk
        emb = _emb(spark, sf)
        qv = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
        return brute_cosine_topk(emb.filter(F.col("vec_id") != 0),
                                 list(qv[0][0]), k=10)

    def hybrid_rrf_topk(spark, sf):
        # hybrid lexical+vector retrieval: BM25 top-50 and exact-cosine
        # top-50 legs fused by reciprocal-rank fusion (rrf_k=60, the
        # Cormack et al. constant / ES default) — operators/hybrid.py
        from pysearchlite_spark.operators.hybrid import hybrid_topk
        emb = _emb(spark, sf)
        qv = list(emb.filter(F.col("vec_id") == 0)
                  .select("embedding").collect()[0][0])
        fused = hybrid_topk(_index(spark, sf),
                            emb.filter(F.col("vec_id") != 0),
                            Q_BM25, qv, k=10, fetch_k=50)
        out = spark.createDataFrame(
            [(int(d), float(s)) for d, s in fused],
            "doc_id long, rrf double")
        return out.select("doc_id", F.round("rrf", 6).alias("rrf"))

    def ann_lsh(spark, sf):
        # persisted bucket-partitioned index (built once per sf), planes =
        # embeddings of vec_id 1..12 so DuckDB can recompute the bucket
        # bits. BOTH query paths, one entry: qid 0 rides the single-query
        # topk; qids 1.. ride topk_batch (N queries in ONE job, qid =
        # tuple position + 1)
        idx = _ann_index(spark, sf)
        emb = _emb(spark, sf)
        single = (idx.topk(_ann_query(spark, sf), k=10, probe_bits=2)
                  .select(F.lit(0).cast("int").alias("qid"),
                          "vec_id", "cos"))
        qrows = {r["vec_id"]: list(r["embedding"]) for r in
                 emb.filter(F.col("vec_id").isin(list(ANN_BATCH_QVIDS)))
                 .collect()}
        batch = (idx.topk_batch([qrows[v] for v in ANN_BATCH_QVIDS],
                                k=10, probe_bits=2)
                 .select((F.col("qid") + 1).cast("int").alias("qid"),
                         "vec_id", "cos"))
        return single.unionByName(batch)

    def ann_ivf(spark, sf):
        # persisted IVF-flat index, fixed centroids (embeddings 1..16),
        # nprobe=4 — assignment/probing reproducible as SQL cosine argmax
        return _ivf_index(spark, sf).topk(_ann_query(spark, sf), k=10,
                                          nprobe=IVF_NPROBE)

    def repetition_spans(spark, sf):
        # the three span/repetition signals joined on doc_id:
        # (a) Gopher-style repetition quality (top n-gram fraction,
        # duplicate n-gram fraction) — vectorized Arrow UDF, pure per-doc
        # scan, no shuffle; (b) cross-doc repeated n-token spans
        # (exact-substring dup signal, span-key aggregation, no
        # self-join); (c) benchmark-decontamination — probe set = docs
        # 0..49, probe keys broadcast into a left-semi, the corpus side
        # never shuffles by span. cache=False: these lazy frames outlive
        # the call in the driver's long-lived session.
        from pysearchlite_spark.functions.text import repetition_stats
        from pysearchlite_spark.operators.dedup import (repeated_spans,
                                                        span_contamination)
        docs = _docs(spark, sf)
        rep = repetition_stats(docs)
        spans = repeated_spans(docs, n=3, cache=False)
        cont = span_contamination(
            docs, docs.filter(F.col("doc_id") < 50), n=3, cache=False
        ).select("doc_id", "contaminated_spans", "contamination_frac")
        return rep.join(spans, "doc_id").join(cont, "doc_id")

    def image_feats(spark, sf):
        # multimodal image decode+featurize (functions/multimodal.py):
        # deterministic 8x8x3 PSL1 blobs synthesized from doc_id, run
        # through the REAL encode -> decode_image -> image_feature_vec
        # Arrow path, feature vector exploded to (dim, val) rows. The
        # oracle recomputes mean/std/luma-histogram analytically from the
        # same pixel formula v(i) = (doc_id*131 + i*7919) % 256; both
        # sides quantize through float32 so float64 summation-order
        # differences collapse.
        from pysearchlite_spark.functions.multimodal import image_features
        feats = image_features(_media_df(spark, sf, "image"))
        return (feats.select(
                    "doc_id",
                    F.col("meta.width").alias("width"),
                    F.col("meta.height").alias("height"),
                    F.col("meta.channels").alias("channels"),
                    F.posexplode("feature").alias("dim", "v"))
                .select("doc_id", "width", "height", "channels", "dim",
                        F.round(F.col("v").cast("double"), 6).alias("val")))

    def audio_feats(spark, sf):
        # multimodal audio decode+featurize: deterministic 200-sample
        # 8 kHz PSLA PCM blobs from doc_id, run through the real
        # decode_audio -> audio_feature_vec path. Oracle recomputes
        # duration/rms/zcr/|amp|-histogram from the sample formula
        # s16(i) = ((doc_id*7 + i*13) % 64001) - 32000.
        from pysearchlite_spark.functions.multimodal import audio_features
        feats = audio_features(_media_df(spark, sf, "audio"))
        return (feats.select(
                    "doc_id", "sample_rate",
                    F.round("duration_sec", 6).alias("dur_sec"),
                    F.posexplode("feature").alias("dim", "v"))
                .select("doc_id", "sample_rate", "dur_sec", "dim",
                        F.round(F.col("v").cast("double"), 6).alias("val")))

    def video_feats(spark, sf):
        # multimodal video path end-to-end: deterministic 4-frame 4x4x3
        # PSLV blobs from doc_id, frame_sample(every_n=2) keeps frames
        # {0, 2}, each sampled frame runs the REAL PSL1 decode +
        # image_feature_vec Arrow path. The oracle recomputes per-frame
        # mean/std/luma-histogram analytically from the pixel formula
        # v(f, i) = (doc_id*131 + f*4099 + i*7919) % 256.
        from pysearchlite_spark.functions.multimodal import (frame_sample,
                                                             image_features)
        frames = frame_sample(_media_df(spark, sf, "video"),
                              every_n=VID_EVERY_N)
        # composite frame id so the per-image featurizer keeps one id col;
        # recovered below (frame_no < 16 always: PSLV n_frames is u16 but
        # the synthetic corpus uses 4)
        fids = frames.select(
            (F.col("doc_id") * 16 + F.col("frame_no")).alias("fid"),
            F.col("frame").alias("media"))
        feats = image_features(fids, id_col="fid", media_col="media")
        return (feats.select(
                    "fid",
                    F.col("meta.width").alias("width"),
                    F.col("meta.height").alias("height"),
                    F.posexplode("feature").alias("dim", "v"))
                .select(F.expr("CAST(fid DIV 16 AS BIGINT)").alias("doc_id"),
                        F.expr("CAST(fid % 16 AS INT)").alias("frame_no"),
                        "width", "height", "dim",
                        F.round(F.col("v").cast("double"), 6).alias("val")))

    def events_hourly(spark, sf):
        ev = spark.read.parquet(f"{sf}/events.parquet")
        return (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
                .agg(F.count("*").alias("cnt"),
                     F.round(F.sum("value"), 4).alias("sum_value"))
                .select(F.unix_timestamp(F.col("w.start")).alias("hour_start"),
                        "event_type", "cnt", "sum_value"))

    # ≤ 50 entries BY CONSTRUCTION: the driver verifies only the first 50
    # dict entries, so redundant scalar entries are consolidated into
    # multi-column / variant-tagged entries (tools/selfcheck.py asserts
    # the window invariant). Every operator family keeps a verified row.
    out = {
        "search_and": search_and,
        "search_and_deleted": search_and_deleted,
        "search_or": search_or,
        "search_phrase": search_phrase,
        "search_near": search_near,
        "bm25_scores": bm25_scores,
        "search_collapse": search_collapse,
        "search_prefix": search_prefix,
        "search_snippets": search_snippets_entry,
        "search_and_not": search_and_not,
        "facet_counts": facet_counts_entry,
        "search_sorted": search_sorted,
        "term_stats": term_stats,
        "significant_terms": significant_terms,
        "bm25_topk": bm25_topk,
        "bm25_topk_batch": bm25_topk_batch,
        "bm25_topk_filtered": bm25_topk_filtered,
        "search_and_filtered": search_and_filtered,
        "search_min_match": search_min_match,
        "search_termset": search_termset,
        "suggest_terms": suggest_terms,
        "more_like_this": more_like_this,
        "search_query": search_query,
        "bm25_topk_query": bm25_topk_query,
        "bm25_topk_boosted": bm25_topk_boosted,
        "search_synonym_and": search_synonym_and,
        "bm25_topk_syn": bm25_topk_syn,
        "field_search_and": field_search_and,
        "bm25_dismax": bm25_dismax,
        "token_stats": token_stats,
        "quality_lang": quality_lang,
        "doc_signatures": doc_signatures,
        "exact_dedup": exact_dup,
        "corpus_sample": corpus_sample,
        "strip_lines": strip_lines,
        "chunk_tokens": chunk_tokens_entry,
        "token_jaccard_pairs": jaccard_pairs,
        "dedup_clusters": dedup_cluster_entry,
        "minhash_lsh_pairs": minhash_pairs,
        "simhash_pairs": simhash_prs,
        "cosine_dup_pairs": cosine_dups,
        "repetition_spans": repetition_spans,
        "image_features": image_feats,
        "audio_features": audio_feats,
        "video_features": video_feats,
        "ann_cosine_topk": ann_cosine,
        "hybrid_rrf_topk": hybrid_rrf_topk,
        "ann_lsh_topk": ann_lsh,
        "ann_ivf_topk": ann_ivf,
        "events_hourly": events_hourly,
    }
    assert len(out) <= 50, f"driver checks only 50 entries, got {len(out)}"
    return out


def oracle_sql() -> dict[str, str]:
    and_terms = Q_AND.split()
    or_terms = Q_OR.split()
    bm_terms = Q_BM25.split()
    and_pred = " AND ".join(f"list_contains({_TOK}, '{t}')" for t in and_terms)
    or_pred = " OR ".join(f"list_contains({_TOK}, '{t}')" for t in or_terms)
    bm_in = ", ".join(f"'{t}'" for t in bm_terms)
    df_in = ", ".join(f"'{t}'" for t in Q_TERMS)

    def bm25_sql(terms_in: str, qid: int | None = None,
                 where: str = "", having: str = "",
                 offset: int = 0, limit: int | None = 10,
                 rounded: bool = True) -> str:
        # `where`: filtered retrieval — restricts the RESULT candidates
        # only; corpus stats (n, avgdl, df) stay corpus-wide, exactly the
        # engine's Lucene-filter semantics. `having`: msm — candidates
        # must match >= m distinct terms, scores stay full-disjunctive.
        # limit=None: the FULL scored match set (scores_df oracle).
        # rounded=False: raw scores — for oracles that RANK over the
        # scores (hybrid RRF), where rounding would collapse distinct
        # neighbors into artificial ties the engine doesn't see
        sc = "round(score, 6) AS score" if rounded else "score"
        head = (f"SELECT doc_id, {sc}" if qid is None
                else f"SELECT {qid} AS qid, doc_id, {sc}")
        return f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
), dl AS (
  SELECT d.doc_id, count(t.term) AS dl
  FROM documents d LEFT JOIN tok t USING (doc_id) GROUP BY d.doc_id
), stats AS (
  SELECT count(*) AS n, avg(dl) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ({terms_in}) GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dft.df + 0.5)/(dft.df + 0.5))
              * tf.tf * (1.2 + 1)
              / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS score
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
  {having}
)
{head} FROM scores
{where}
{("ORDER BY score DESC, doc_id LIMIT " + str(limit)
  + " OFFSET " + str(offset)) if limit is not None else "ORDER BY doc_id"}
"""

    bm25 = bm25_sql(bm_in)
    # the composite query string's boolean predicate (Q_STRING):
    # value AND "table part" AND s?a* AND NOT merge
    qstring_pred = (f"list_contains({_TOK}, 'value') AND "
                    f"' ' || array_to_string({_TOK}, ' ') || ' ' "
                    f"LIKE '% {Q_PHRASE} %' AND "
                    f"NOT list_contains({_TOK}, '{Q_NOT}') AND "
                    f"len(list_filter({_TOK}, t -> t LIKE "
                    f"'{W_LIKE}')) > 0")
    # synonym-group BM25 (Lucene SynonymQuery): group tf = SUM of member
    # tfs (saturation applied once), group idf from the MAX member df
    syn_g0 = ", ".join(f"'{t}'" for t in ["table"] + SYN_MAP["table"])
    syn_all = ", ".join(f"'{t}'" for t in
                        ["table"] + SYN_MAP["table"] + ["value"])
    bm25_syn = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
), dl AS (
  SELECT d.doc_id, count(t.term) AS dl
  FROM documents d LEFT JOIN tok t USING (doc_id) GROUP BY d.doc_id
), stats AS (
  SELECT count(*) AS n, avg(dl) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ({syn_all}) GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), gtf AS (
  SELECT doc_id, CASE WHEN term IN ({syn_g0}) THEN 0 ELSE 1 END AS g,
         sum(tf) AS tf
  FROM tf GROUP BY doc_id, g
), gdf AS (
  SELECT CASE WHEN term IN ({syn_g0}) THEN 0 ELSE 1 END AS g,
         max(df) AS df
  FROM dft GROUP BY g
), scores AS (
  SELECT gtf.doc_id,
         sum( ln(1 + (stats.n - gdf.df + 0.5)/(gdf.df + 0.5))
              * gtf.tf * (1.2 + 1)
              / (gtf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS score
  FROM gtf JOIN gdf USING (g) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY gtf.doc_id
)
SELECT doc_id, round(score, 6) AS score FROM scores
ORDER BY score DESC, doc_id LIMIT 10"""
    # OR-group + boost query string (GRP_Q = "(table OR row)^2 value"):
    # same SynonymQuery group scoring as bm25_syn, but (a) the g=0 group's
    # contribution is multiplied by the boost and (b) gating is
    # CONJUNCTIVE — a doc must match BOTH clauses (the group and the term)
    # to be a candidate, per the query-string grammar
    bm25_boosted = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
), dl AS (
  SELECT d.doc_id, count(t.term) AS dl
  FROM documents d LEFT JOIN tok t USING (doc_id) GROUP BY d.doc_id
), stats AS (
  SELECT count(*) AS n, avg(dl) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ({syn_all}) GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), gtf AS (
  SELECT doc_id, CASE WHEN term IN ({syn_g0}) THEN 0 ELSE 1 END AS g,
         sum(tf) AS tf
  FROM tf GROUP BY doc_id, g
), gdf AS (
  SELECT CASE WHEN term IN ({syn_g0}) THEN 0 ELSE 1 END AS g,
         max(df) AS df
  FROM dft GROUP BY g
), cand AS (
  SELECT doc_id FROM gtf GROUP BY doc_id HAVING count(DISTINCT g) = 2
), scores AS (
  SELECT gtf.doc_id,
         sum( (CASE WHEN gtf.g = 0 THEN {GRP_BOOST} ELSE 1.0 END)
              * ln(1 + (stats.n - gdf.df + 0.5)/(gdf.df + 0.5))
              * gtf.tf * (1.2 + 1)
              / (gtf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS score
  FROM gtf JOIN gdf USING (g) JOIN dl USING (doc_id) CROSS JOIN stats
  WHERE gtf.doc_id IN (SELECT doc_id FROM cand)
  GROUP BY gtf.doc_id
)
SELECT doc_id, round(score, 6) AS score FROM scores
ORDER BY score DESC, doc_id LIMIT 10"""
    msm_in = ", ".join(f"'{t}'" for t in Q_MSM.split())
    bm25_msm = bm25_sql(
        msm_in, having=f"HAVING count(DISTINCT tf.term) >= {MSM_M}")

    def bm25_field_scores(tok_expr: str, terms_in: str, w: float) -> str:
        # per-FIELD BM25 score table: identical structure to bm25_sql but
        # tokens come from `tok_expr` (the field's own term space — df,
        # dl, avgdl all field-local), weighted by the dismax field boost
        return f"""(
WITH tok AS (
  SELECT doc_id, unnest({tok_expr}) AS term FROM documents
), dl AS (
  SELECT d.doc_id, count(t.term) AS dl
  FROM documents d LEFT JOIN tok t USING (doc_id) GROUP BY d.doc_id
), stats AS (
  SELECT count(*) AS n, avg(dl) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ({terms_in}) GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
)
SELECT tf.doc_id,
       {w} * sum( ln(1 + (stats.n - dft.df + 0.5)/(dft.df + 0.5))
            * tf.tf * (1.2 + 1)
            / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
       ) AS score
FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
GROUP BY tf.doc_id)"""

    title_tok = f"({_TOK})[1:5]"  # the derived title field: first 5 tokens
    dis_in = ", ".join(f"'{t}'" for t in Q_DIS.split())
    bm25_dismax_sql = f"""
SELECT doc_id,
       round(greatest(coalesce(t.score, 0), coalesce(b.score, 0)), 6)
         AS score
FROM {bm25_field_scores(title_tok, dis_in, DIS_W["title"])} t
FULL JOIN {bm25_field_scores(_TOK, dis_in, DIS_W["body"])} b
USING (doc_id)
ORDER BY score DESC, doc_id LIMIT 10"""
    filter_subq = f"(SELECT doc_id FROM documents WHERE {FILTER_PRED})"
    bm25_filtered = bm25_sql(
        bm_in, where=f"WHERE doc_id IN {filter_subq}")
    bm25_batch_sql = " UNION ALL ".join(
        f"SELECT * FROM ({bm25_sql(', '.join(repr(t) for t in q.split()), qid=i)})"
        for i, q in enumerate(BATCH_QUERIES))

    jaccard = f"""
WITH t AS (
  SELECT doc_id, list_distinct({_TOK}) AS ts FROM documents
)
SELECT x.doc_id AS a, y.doc_id AS b,
       round(len(list_intersect(x.ts, y.ts))::DOUBLE
             / (len(x.ts) + len(y.ts) - len(list_intersect(x.ts, y.ts))), 6)
         AS jaccard
FROM t x JOIN t y ON x.doc_id < y.doc_id
WHERE len(list_intersect(x.ts, y.ts))::DOUBLE
      / (len(x.ts) + len(y.ts) - len(list_intersect(x.ts, y.ts))) >= 0.8
"""

    # bounded max_df: candidates only via tokens with df <= 100 — replicates
    # the operator's documented candidate-generation semantics exactly
    jaccard_bounded = f"""
WITH t AS (
  SELECT doc_id, list_distinct({_TOK}) AS ts FROM documents
), inv AS (
  SELECT doc_id, unnest(ts) AS tok FROM t
), tdf AS (
  SELECT tok, count(*) AS df FROM inv GROUP BY tok
), rare AS (
  SELECT inv.doc_id, inv.tok FROM inv JOIN tdf USING (tok) WHERE tdf.df <= 100
), cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM rare x JOIN rare y ON x.tok = y.tok AND x.doc_id < y.doc_id
)
SELECT a, b,
       round(len(list_intersect(xt.ts, yt.ts))::DOUBLE
             / (len(xt.ts) + len(yt.ts) - len(list_intersect(xt.ts, yt.ts))),
             6) AS jaccard
FROM cand JOIN t xt ON xt.doc_id = cand.a JOIN t yt ON yt.doc_id = cand.b
WHERE len(list_intersect(xt.ts, yt.ts))::DOUBLE
      / (len(xt.ts) + len(yt.ts) - len(list_intersect(xt.ts, yt.ts))) >= 0.8
"""

    # transitive closure of the bounded-jaccard pairs: recursive
    # reachability (edges are symmetric, so min reachable id ∪ self = the
    # component minimum — exactly the engine's star-root cluster_id)
    cluster_oracle = f"""
WITH RECURSIVE pairs AS (
  SELECT a, b FROM ({jaccard_bounded})
), edges AS (
  SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs
), reach(node, r) AS (
  SELECT u, v FROM edges
  UNION
  SELECT reach.node, e.v FROM reach JOIN edges e ON reach.r = e.u
), comp AS (
  SELECT node, least(min(r), node) AS cluster_id FROM reach GROUP BY node
)
SELECT d.doc_id,
       coalesce(c.cluster_id, d.doc_id) AS cluster_id,
       d.doc_id <> coalesce(c.cluster_id, d.doc_id) AS is_dup
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
"""

    # minhash_lsh_pairs with shingle_k=1: exact-verified output over distinct
    # unigram (token) sets == token jaccard >= 0.9 (miss prob ~8e-24/pair)
    minhash_oracle = jaccard.replace(">= 0.8", ">= 0.9")

    # doc_fingerprint (hash_fn='md5'): full rolling-hash value —
    # h = fold(h*B + md5_64(token)) mod 2^61-1
    fingerprint_sql = f"""
SELECT doc_id, list_reduce(
  list_prepend(0::HUGEINT,
    list_transform({_TOK},
                   t -> (('0x' || substr(md5(t), 1, 16))::UBIGINT)::HUGEINT)),
  (acc, x) -> (acc * {1_000_003} + x) % {(1 << 61) - 1}
)::BIGINT AS fingerprint
FROM documents
"""

    # simhash (hash_fn='md5'): bit b of the signature is set iff the
    # tf-weighted majority of md5_64 token-hash bits at position b is 1
    bit_sums = ",\n         ".join(
        f"sum(((h >> {b}) & 1)::BIGINT) AS b{b}" for b in range(64))
    bit_val = "\n       + ".join(
        f"(CASE WHEN 2*b{b} > n THEN {1 << b}::HUGEINT ELSE 0::HUGEINT END)"
        for b in range(64))
    simhash_sql = f"""
WITH tok AS (
  SELECT doc_id, ('0x' || substr(md5(t), 1, 16))::UBIGINT AS h
  FROM (SELECT doc_id, unnest({_TOK}) AS t FROM documents)
), bits AS (
  SELECT doc_id, count(*) AS n,
         {bit_sums}
  FROM tok GROUP BY doc_id
), val AS (
  SELECT doc_id,
       {bit_val} AS v
  FROM bits
)
SELECT d.doc_id,
       CASE WHEN v IS NULL THEN 0
            WHEN v >= {1 << 63}::HUGEINT THEN (v - {1 << 64}::HUGEINT)::BIGINT
            ELSE v::BIGINT END AS simhash
FROM documents d LEFT JOIN val USING (doc_id)
"""

    # ann_lsh_topk: planes = embeddings 1..N; candidate iff hamming between
    # sign-bit vectors <= 2 (== the engine's multi-probe 2-bit flips);
    # exact float64 cosine rerank of candidates. Parameterized by query
    # vec_id (+ optional batch qid) so the batch entry reuses it verbatim.
    def _ann_lsh_select(qvid: int, qid=None) -> str:
        head = f"{qid} AS qid, " if qid is not None else ""
        return f"""
WITH p AS (
  SELECT vec_id AS pid, embedding::DOUBLE[] AS pv FROM embeddings
  WHERE vec_id BETWEEN 1 AND {N_ANN_PLANES}
), q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {qvid}
), vb AS (
  SELECT e.vec_id, p.pid,
         (list_dot_product(e.embedding::DOUBLE[], p.pv) > 0) AS s
  FROM embeddings e CROSS JOIN p WHERE e.vec_id <> 0
), qb AS (
  SELECT p.pid, (list_dot_product(q.qv, p.pv) > 0) AS s
  FROM p CROSS JOIN q
), ham AS (
  SELECT vb.vec_id,
         sum(CASE WHEN vb.s <> qb.s THEN 1 ELSE 0 END) AS h
  FROM vb JOIN qb USING (pid) GROUP BY vb.vec_id
), cand AS (
  SELECT vec_id FROM ham WHERE h <= 2
)
SELECT {head}e.vec_id,
       round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS cos
FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN q
ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC, e.vec_id
LIMIT 10
"""

    # merged single+batch entry: qid 0 = the single-query path (query
    # vec 0); qids 1.. = batch tuple position + 1 over ANN_BATCH_QVIDS
    ann_lsh_sql = "\nUNION ALL\n".join(
        f"SELECT * FROM ({_ann_lsh_select(v, i)})"
        for i, v in enumerate((0,) + tuple(ANN_BATCH_QVIDS)))

    # simhash_pairs (md5): at oracle scale no bucket exceeds the cap, so
    # the banded pipeline's output == ALL pairs with hamming <= 3 — which
    # SQL computes directly over the simhash values (bit_count/xor on
    # BIGINT are two's-complement popcounts in both engines)
    simhash_pairs_sql = f"""
WITH sims AS ({simhash_sql})
SELECT x.doc_id AS a, y.doc_id AS b,
       bit_count(xor(x.simhash, y.simhash))::INTEGER AS hamming
FROM sims x JOIN sims y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
"""

    # cosine_dup_pairs: planes = embeddings 1..N_DUP_PLANES; bucket equality
    # == identical sign-bit words; exact float64 cosine verify >= tau
    cosine_dups_sql = f"""
WITH p AS (
  SELECT vec_id AS pid, embedding::DOUBLE[] AS pv FROM embeddings
  WHERE vec_id BETWEEN 1 AND {N_DUP_PLANES}
), sig AS (
  SELECT e.vec_id,
         sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.pv) > 0
                  THEN 1 << (p.pid - 1)::INTEGER ELSE 0 END) AS bw
  FROM embeddings e CROSS JOIN p WHERE e.vec_id <> 0
  GROUP BY e.vec_id
)
SELECT x.vec_id AS a, y.vec_id AS b,
       round(list_cosine_similarity(ex.embedding::DOUBLE[],
                                    ey.embedding::DOUBLE[]), 6) AS cos
FROM sig x JOIN sig y ON x.bw = y.bw AND x.vec_id < y.vec_id
JOIN embeddings ex ON ex.vec_id = x.vec_id
JOIN embeddings ey ON ey.vec_id = y.vec_id
WHERE list_cosine_similarity(ex.embedding::DOUBLE[],
                             ey.embedding::DOUBLE[]) >= 0.4
"""

    # langid: occurrence counts per stopword set; first language in
    # (en, de, fr, es) order with the strictly-highest count wins
    # (mirrors functions/text.py:_langid_series tie-breaking).
    from pysearchlite_spark.functions.text import _STOPWORDS
    hits = {
        lang: ("len(list_filter({tok}, t -> t IN ({sw})))".format(
            tok=_TOK, sw=", ".join(f"'{w}'" for w in sorted(sws))))
        for lang, sws in _STOPWORDS.items()
    }
    langid = f"""
WITH h AS (
  SELECT doc_id, {hits['en']} AS en, {hits['de']} AS de,
         {hits['fr']} AS fr, {hits['es']} AS es
  FROM documents
)
SELECT doc_id,
  CASE WHEN en >= de AND en >= fr AND en >= es AND en > 0 THEN 'en'
       WHEN de >= fr AND de >= es AND de > 0 THEN 'de'
       WHEN fr >= es AND fr > 0 THEN 'fr'
       WHEN es > 0 THEN 'es'
       ELSE 'und' END AS lang_pred
FROM h
"""

    # ann_ivf_topk: assignment = cosine-argmax over fixed centroids
    # (embeddings 1..16; engine cid = position == vec_id-1, ties by lowest
    # cid == lowest vec_id); probe = top-4 centroids by cosine; rerank.
    ann_ivf_sql = f"""
WITH cent AS (
  SELECT vec_id AS cvid, embedding::DOUBLE[] AS cv FROM embeddings
  WHERE vec_id BETWEEN 1 AND {N_IVF_CENTROIDS}
), q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
), assign AS (
  SELECT vec_id, cvid FROM (
    SELECT e.vec_id, c.cvid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cv)
               DESC, c.cvid) AS rn
    FROM embeddings e CROSS JOIN cent c WHERE e.vec_id <> 0)
  WHERE rn = 1
), probe AS (
  SELECT cvid FROM cent CROSS JOIN q
  ORDER BY list_cosine_similarity(q.qv, cv) DESC, cvid
  LIMIT {IVF_NPROBE}
), cand AS (
  SELECT vec_id FROM assign WHERE cvid IN (SELECT cvid FROM probe)
)
SELECT e.vec_id,
       round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS cos
FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN q
ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC, e.vec_id
LIMIT 10
"""

    return {
        "ann_ivf_topk": ann_ivf_sql,
        # both engine AND surfaces return the same match set; url is the
        # build_index(id_col='doc_id', url_col=None) derived str(doc_id)
        "search_and": f"""
SELECT 'local' AS variant, doc_id, CAST(doc_id AS VARCHAR) AS url
FROM documents WHERE {and_pred}
UNION ALL
SELECT 'dist', doc_id, CAST(doc_id AS VARCHAR)
FROM documents WHERE {and_pred}
UNION ALL
SELECT 'count', count(*)::BIGINT, NULL::VARCHAR
FROM documents WHERE """ + " AND ".join(
            f"list_contains({_TOK}, '{t}')" for t in bm_terms) + """
ORDER BY variant, doc_id""",
        "search_and_deleted": f"SELECT doc_id FROM documents WHERE "
                              f"{and_pred} AND doc_id % {DELETE_MOD} <> 0 "
                              f"ORDER BY doc_id",
        "search_or": f"SELECT doc_id FROM documents WHERE {or_pred} "
                     f"ORDER BY doc_id",
        # phrase oracle: rebuild the token stream with the SAME tokenizer
        # expression and substring-match the space-joined form — exact
        # consecutive-token semantics (tokens are alnum, so the single
        # space is an unambiguous delimiter)
        "search_phrase": f"""
SELECT 'local3' AS variant, doc_id FROM documents
WHERE ' ' || array_to_string({_TOK}, ' ') || ' ' LIKE '% {Q_PHRASE3} %'
UNION ALL
SELECT 'dist2', doc_id FROM documents
WHERE ' ' || array_to_string({_TOK}, ' ') || ' ' LIKE '% {Q_PHRASE} %'
ORDER BY variant, doc_id""",
        # proximity oracle: token positions via range+list_filter, then an
        # exists-chain check. ordered (2 terms): some pa<pb with gap
        # ≤ 1+slop; unordered: |pa-pb| ≤ 1+slop, either order
        "search_near": f"""
WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
p AS (SELECT doc_id,
        list_filter(range(1, len(toks)+1),
                    i -> toks[i] = '{Q_NEAR.split()[0]}') AS p1,
        list_filter(range(1, len(toks)+1),
                    i -> toks[i] = '{Q_NEAR.split()[1]}') AS p2
      FROM t)
SELECT 'ordered' AS variant, doc_id FROM p
WHERE len(list_filter(p1, pa -> len(list_filter(p2,
          pb -> pb > pa AND pb - pa <= {1 + NEAR_SLOP})) > 0)) > 0
UNION ALL
SELECT 'unordered', doc_id FROM p
WHERE len(list_filter(p1, pa -> len(list_filter(p2,
          pb -> abs(pb - pa) <= {1 + NEAR_SLOP})) > 0)) > 0
ORDER BY variant, doc_id""",
        "search_prefix": f"SELECT doc_id FROM documents WHERE "
                         f"len(list_filter({_TOK}, "
                         f"t -> t LIKE '{Q_PREFIX}%')) > 0 ORDER BY doc_id",
        "search_and_not": f"SELECT doc_id FROM documents WHERE {and_pred} "
                          f"AND NOT list_contains({_TOK}, '{Q_NOT}') "
                          f"ORDER BY doc_id",
        "facet_counts": f"""
WITH bins(bin, lo, hi) AS (VALUES {", ".join(
    f"({i}::BIGINT, {float(RANGE_EDGES[i])}::DOUBLE,"
    f" {float(RANGE_EDGES[i + 1])}::DOUBLE)"
    for i in range(len(RANGE_EDGES) - 1))})
SELECT 'lang' AS kind, lang AS facet, count(*)::BIGINT AS n
FROM documents WHERE {and_pred} GROUP BY lang
UNION ALL
SELECT 'chars', CAST(b.bin AS VARCHAR), count(*)::BIGINT
FROM documents d JOIN bins b
  ON d.n_chars >= b.lo AND d.n_chars < b.hi
WHERE {and_pred}
GROUP BY b.bin""",
        "search_sorted": f"SELECT doc_id, n_chars FROM documents "
                         f"WHERE {and_pred} "
                         f"ORDER BY n_chars DESC, doc_id LIMIT 10",
        "term_stats": f"""
WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS cf
FROM tok WHERE term IN ({df_in}) GROUP BY term ORDER BY term""",
        "significant_terms": f"""
WITH fg AS (
  SELECT doc_id FROM documents WHERE {and_pred}
), tok AS (
  SELECT doc_id, unnest(list_distinct({_TOK})) AS term FROM documents
), bg AS (
  SELECT term, count(*)::BIGINT AS df FROM tok GROUP BY term
), f AS (
  SELECT term, count(*)::BIGINT AS fg_df
  FROM tok JOIN fg USING (doc_id) GROUP BY term
), st AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         (SELECT count(*) FROM fg)::DOUBLE AS fn
)
SELECT term, fg_df, df,
       round(((fg_df / fn) - (df / n)) * ((fg_df / fn) / (df / n)), 6)
         AS score
FROM f JOIN bg USING (term) CROSS JOIN st
WHERE fg_df >= {SIG_MIN_FG}
ORDER BY score DESC, term LIMIT {SIG_K}""",
        # first-hit position (1-based, min across query terms) + ±5-token
        # window; list_position returns 0 when absent, same guard as the
        # engine's when(array_position > 0)
        "search_snippets": f"""
WITH t AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(text, '[A-Za-z0-9]+'),
                        t -> lower(t)) AS ts
  FROM documents WHERE {and_pred}
), p AS (
  SELECT doc_id, ts,
         least({", ".join(
             f"CASE WHEN list_position(ts, '{t}') > 0 "
             f"THEN list_position(ts, '{t}') END"
             for t in and_terms)})::BIGINT AS first_pos
  FROM t
)
SELECT doc_id, first_pos,
       array_to_string(ts[greatest(1, first_pos - 5) : first_pos + 5], ' ')
         AS snippet
FROM p ORDER BY doc_id""",
        # page 1 = LIMIT 10, page 2 = the engine's searchAfter cursor ==
        # LIMIT 10 OFFSET 10 on the same (score desc, doc_id) order
        "bm25_topk": f"""
SELECT 1 AS page, * FROM ({bm25})
UNION ALL
SELECT 2 AS page, * FROM ({bm25_sql(bm_in, offset=10)})""",
        # the FULL scored match set (scores_df): same scoring CTE, no
        # top-k truncation
        "bm25_scores": bm25_sql(bm_in, limit=None),
        # field collapsing: best-scoring doc per lang over the full scored
        # match set, groups ranked by their winner (ties -> doc_id asc).
        # The CTE keeps RAW scores (rounded=False) so the per-group winner
        # and the group ranking are decided on the same float64 values the
        # engine's max_by sees; round only the projected output.
        "search_collapse": f"""
WITH s AS ({bm25_sql(bm_in, limit=None, rounded=False)}),
j AS (
  SELECT s.doc_id, s.score, d.lang AS collapse,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY s.score DESC, s.doc_id) AS rn
  FROM s JOIN documents d USING (doc_id))
SELECT doc_id, round(j.score, 6) AS score, collapse FROM j WHERE rn = 1
ORDER BY j.score DESC, doc_id LIMIT 10
""",
        "bm25_topk_batch": bm25_batch_sql,
        "bm25_topk_filtered": bm25_filtered,
        "search_and_filtered": f"SELECT doc_id FROM documents "
                               f"WHERE {and_pred} AND doc_id IN "
                               f"{filter_subq} ORDER BY doc_id",
        "search_min_match": f"""
SELECT 'ids' AS variant, doc_id, NULL::DOUBLE AS score FROM (
  SELECT doc_id, count(DISTINCT term) AS c
  FROM (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
  WHERE term IN ({msm_in}) GROUP BY doc_id)
WHERE c >= {MSM_M}
UNION ALL
SELECT 'topk', doc_id, score FROM ({bm25_msm})
ORDER BY variant, doc_id""",
        # the three dictionary-expansion term queries (wildcard / regex /
        # fuzzy), variant-tagged to mirror the entry's union
        "search_termset": f"""
SELECT 'wildcard' AS variant, doc_id FROM documents
WHERE len(list_filter({_TOK}, t -> t LIKE '{W_LIKE}')) > 0
UNION ALL
SELECT 'regex', doc_id FROM documents
WHERE len(list_filter({_TOK},
          t -> regexp_full_match(t, '{RX_PATTERN}'))) > 0
UNION ALL
SELECT 'fuzzy', doc_id FROM documents
WHERE len(list_filter({_TOK},
          t -> levenshtein(t, '{FZ_TERM}') <= {FZ_EDITS})) > 0
ORDER BY variant, doc_id""",
        "search_query": f"SELECT doc_id FROM documents WHERE "
                        f"{qstring_pred} ORDER BY doc_id",
        "bm25_topk_query": bm25_sql(
            "'value'", where=f"WHERE doc_id IN (SELECT doc_id "
                             f"FROM documents WHERE {qstring_pred})"),
        "search_synonym_and": f"SELECT doc_id FROM documents WHERE "
                              f"(list_contains({_TOK}, 'table') OR "
                              f"list_contains({_TOK}, 'row')) AND "
                              f"list_contains({_TOK}, 'value') "
                              f"ORDER BY doc_id",
        "bm25_topk_syn": bm25_syn,
        "bm25_topk_boosted": bm25_boosted,
        "suggest_terms": f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct({_TOK})) AS term FROM documents
), dict AS (
  SELECT term, count(*)::BIGINT AS df FROM tok GROUP BY term
)
SELECT term, levenshtein(term, '{SG_TERM}')::BIGINT AS distance, df
FROM dict
WHERE levenshtein(term, '{SG_TERM}') <= {SG_EDITS}
  AND term <> '{SG_TERM}'
ORDER BY distance, df DESC, term LIMIT 5
""",
        "more_like_this": f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
), dl AS (
  SELECT d.doc_id, count(t.term) AS dl
  FROM documents d LEFT JOIN tok t USING (doc_id) GROUP BY d.doc_id
), stats AS (
  SELECT count(*) AS n, avg(dl) AS avgdl FROM dl
), qt AS (
  SELECT term, count(*)::BIGINT AS qtf
  FROM (SELECT unnest(regexp_extract_all(lower('{MLT_TEXT}'),
                                         '[a-z0-9]+')) AS term)
  GROUP BY term
), dfq AS (
  SELECT t.term, count(DISTINCT t.doc_id) AS df
  FROM tok t JOIN qt USING (term) GROUP BY t.term
), sel AS (
  SELECT dfq.term
  FROM dfq JOIN qt USING (term) CROSS JOIN stats
  WHERE dfq.df >= {MLT_MINDF}
  ORDER BY round(qt.qtf * ln(1 + (stats.n - dfq.df + 0.5)
                             / (dfq.df + 0.5)), 6) DESC, dfq.term
  LIMIT {MLT_MAXT}
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN (SELECT term FROM sel) GROUP BY doc_id, term
), dft AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dft.df + 0.5)/(dft.df + 0.5))
              * tf.tf * (1.2 + 1)
              / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ) AS score
  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 6) AS score FROM scores
ORDER BY score DESC, doc_id LIMIT 10
""",
        "field_search_and": f"""
SELECT doc_id FROM (SELECT doc_id, {_TOK} AS tb FROM documents)
WHERE {" AND ".join(f"list_contains(tb[1:5], '{t}')"
                    for t in FIELD_Q["title"].split())}
  AND {" AND ".join(f"list_contains(tb, '{t}')"
                    for t in FIELD_Q["body"].split())}
ORDER BY doc_id""",
        "bm25_dismax": bm25_dismax_sql,
        # the three token-count surfaces in one row set: doc_len (persisted
        # DocList), n_tokens (tokenizer), n_bpe_tokens (BPE-ish regex —
        # same pattern string, Java regex on Spark vs RE2 in DuckDB,
        # restricted to constructs both evaluate identically)
        "token_stats": (
            f"SELECT doc_id, len({_TOK})::BIGINT AS doc_len, "
            f"len({_TOK})::BIGINT AS n_tokens, "
            "len(regexp_extract_all(coalesce(text, ''), '"
            + _bpe_pattern_sql()
            + "'))::BIGINT AS n_bpe_tokens FROM documents ORDER BY doc_id"),
        "quality_lang": _with_pii_columns("""
            WITH ql AS (
            WITH t AS (SELECT doc_id, length(text)::BIGINT AS n_chars,
                              length(regexp_replace(
                                text, '[^\\p{{L}}\\p{{N}} \\t\\n\\x0B\\f\\r]',
                                '', 'g'))::BIGINT
                                AS n_keep,
                              {tok} AS ts FROM documents)
            SELECT doc_id, n_chars, len(ts)::BIGINT AS n_tokens,
                   round(CASE WHEN len(ts) > 0 THEN
                         len(list_distinct(ts))::DOUBLE / len(ts)
                         ELSE 0.0 END, 6) AS distinct_ratio,
                   round(CASE WHEN len(ts) > 0 THEN
                         list_sum(list_transform(ts, x -> length(x)))::DOUBLE
                           / len(ts)
                         ELSE 0.0 END, 6) AS avg_token_len,
                   round(CASE WHEN n_chars > 0 THEN
                         (n_chars - n_keep)::DOUBLE / n_chars
                         ELSE 0.0 END, 6) AS punct_ratio,
                   round(CASE WHEN len(ts) > 0 THEN
                         len(list_filter(ts, x -> x IN ({sw})))::DOUBLE
                           / len(ts)
                         ELSE 0.0 END, 6) AS stopword_ratio
            FROM t
            ), li AS ({langid})
            SELECT ql.*, li.lang_pred FROM ql JOIN li USING (doc_id)
            """.format(
            tok=_TOK,
            sw=", ".join(f"'{w}'" for w in sorted(_STOPWORDS["en"])),
            langid=langid)),
        # exact-dedup tiers: 'text' = the byte-identical keep-list window;
        # 'url' = the synthesized raw URL pushed through the SAME
        # canonicalization regex chain as functions/url.py (Java∩RE2
        # subset — byte-identical canonical strings), then the keep-list
        # window over the canonical form. coalesce() guards DuckDB's
        # array_to_string([]) -> NULL on empty query-param lists.
        "exact_dedup": r"""
            WITH raw AS (
              SELECT doc_id,
                     'HTTP' || CASE WHEN doc_id % 2 = 0 THEN 'S' ELSE '' END
                     || '://WWW.H' || (doc_id % 7)::VARCHAR || '.Example.COM'
                     || CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END
                     || CASE WHEN doc_id % 3 = 0 THEN ''
                             ELSE '/p/' || (doc_id % 5)::VARCHAR END
                     || '?utm_source=feed&id=' || (doc_id % 4)::VARCHAR
                     || '&fbclid=XYZ#s' || doc_id::VARCHAR AS url
              FROM documents),
            s1 AS (SELECT doc_id,
                          regexp_replace(trim(url), '#.*', '') AS u FROM raw),
            s2 AS (SELECT doc_id,
                  lower(regexp_extract(
                      u, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*'))
                  || substr(u, length(regexp_extract(
                      u, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*')) + 1) AS u
                   FROM s1),
            s3 AS (SELECT doc_id, regexp_replace(regexp_replace(u,
                      '^(http://[^/?#]*):80([/?#]|$)', '\1\2'),
                      '^(https://[^/?#]*):443([/?#]|$)', '\1\2') AS u
                   FROM s2),
            s4 AS (SELECT doc_id, regexp_replace(regexp_replace(u,
                      '^([a-z][a-z0-9+.\-]*://[^/?#]*)\?', '\1/?'),
                      '^([a-z][a-z0-9+.\-]*://[^/?#]*)$', '\1/') AS u
                   FROM s3),
            s5 AS (SELECT doc_id, regexp_replace(u, '\?.*', '') AS base,
                          coalesce(array_to_string(list_filter(
                            string_split(regexp_extract(u, '\?(.*)', 1), '&'),
                            p -> p <> '' AND NOT regexp_matches(p,
                  '^(?:utm_[A-Za-z0-9_]+|gclid|fbclid|msclkid|mc_eid)=')
                          ), '&'), '') AS q FROM s4),
            canon AS (SELECT doc_id,
                             CASE WHEN q = '' THEN base
                                  ELSE base || '?' || q END AS canonical_url
                      FROM s5)
            SELECT 'text' AS method, doc_id, NULL::VARCHAR AS canonical_url,
                   min(doc_id) OVER (PARTITION BY coalesce(text, ''))
                     AS keep_id,
                   doc_id <> min(doc_id) OVER (PARTITION BY coalesce(text, ''))
                     AS is_dup
            FROM documents
            UNION ALL
            SELECT 'url' AS method, doc_id, canonical_url,
                   min(doc_id) OVER (PARTITION BY canonical_url) AS keep_id,
                   doc_id <> min(doc_id) OVER (PARTITION BY canonical_url)
                     AS is_dup
            FROM canon
            ORDER BY method, doc_id""",
        # sampling operators: (cap) md5(doc_id) priority is engine-
        # portable, so one window reproduces the engine's exact kept SET;
        # (wsample) the same md5 hex truncated to 13 digits = a 52-bit
        # uniform exact in float64 — -ln(u)/w ranks identically in both
        # engines, so the weighted draw is also an exact-set oracle
        "corpus_sample": """
            SELECT 'cap' AS method, doc_id, source FROM (
              SELECT doc_id, source,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
              FROM documents) WHERE rn <= 7
            UNION ALL
            SELECT 'wsample' AS method, doc_id, source FROM (
              SELECT doc_id, source,
                     -ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 13))
                          ::UBIGINT)::DOUBLE / 4503599627370496.0)
                       / (length(text) + 1)::DOUBLE AS k
              FROM documents
              ORDER BY k, doc_id LIMIT 25)
            ORDER BY method, doc_id""",
        # duplicate-line removal at the trimmed-STRING level (the engine's
        # xxhash64 census is pure partitioning, not semantics): same
        # planted banner/footer concat as the entry, census >= 2 over
        # >= 15-trimmed-char lines, list_filter removal, md5 of the
        # rejoined text
        "strip_lines": f"""
WITH t2 AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 3 = 0
               THEN '{BANNER_LINE}' || chr(10) ELSE '' END)
         || coalesce(text, '')
         || (CASE WHEN doc_id % 4 = 1
                  THEN chr(10) || '{FOOTER_LINE}' ELSE '' END) AS text
  FROM documents),
lines AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM t2),
hot AS (
  SELECT trim(line) AS k FROM lines
  WHERE length(trim(line)) >= 15
  GROUP BY 1 HAVING count(*) >= 2),
hotlist AS (SELECT coalesce(list(k), []) AS ks FROM hot),
cleaned AS (
  SELECT doc_id,
         len(string_split(text, chr(10))) AS n_lines,
         list_filter(string_split(text, chr(10)),
                     l -> length(trim(l)) < 15
                          OR NOT list_contains(ks, trim(l))) AS kept
  FROM t2, hotlist)
SELECT doc_id, n_lines::INT AS n_lines,
       (n_lines - len(kept))::INT AS n_removed,
       md5(coalesce(array_to_string(kept, chr(10)), '')) AS clean_md5
FROM cleaned ORDER BY doc_id""",
        # training-sequence exports: identical 60-bit md5 token ids
        # (('0x'||substr(md5(t),1,15))::BIGINT == Spark's
        # conv(substring(md5(t),1,15),16,10)); 'chunk' = per-doc
        # list-slices, 'pack' = cross-doc stream via a global window
        # cumsum (the oracle CAN use the single-task form the engine
        # replaces with its bucketed two-phase prefix sum); both
        # fingerprinted by md5(comma-join)
        "chunk_tokens": f"""
WITH ids AS (
  SELECT doc_id,
         list_transform({_TOK},
           x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS ids
  FROM documents WHERE len({_TOK}) > 0),
placed AS (
  SELECT doc_id, ids,
         coalesce(sum(len(ids)) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS doff
  FROM ids),
flat AS (
  SELECT doff + unnest(range(len(ids))) AS off, unnest(ids) AS tid
  FROM placed)
SELECT 'chunk' AS variant, doc_id, (c - 1)::INT AS chunk_id,
       len(ids[(c-1)*{CHUNK_LEN}+1 : c*{CHUNK_LEN}])::INT AS n_tokens,
       md5(array_to_string(
         list_transform(ids[(c-1)*{CHUNK_LEN}+1 : c*{CHUNK_LEN}],
                        x -> x::VARCHAR), ',')) AS ids_md5
FROM (SELECT doc_id, ids,
             unnest(range(1, 1 + cast(ceil(len(ids) / {CHUNK_LEN}.0)
                                      AS BIGINT))) AS c
      FROM ids)
UNION ALL
SELECT 'pack', NULL::BIGINT, (off // {CHUNK_LEN})::INT,
       count(*)::INT,
       md5(array_to_string(
         list_transform(list(tid ORDER BY off), x -> x::VARCHAR), ','))
FROM flat GROUP BY (off // {CHUNK_LEN})::INT
ORDER BY variant, doc_id, chunk_id""",
        # both tiers of the entry's variant union: 'all' = uncapped
        # all-pairs, 'bounded' = rare-token (df<=100) candidate generation
        "token_jaccard_pairs": f"""
SELECT 'all' AS variant, * FROM ({jaccard})
UNION ALL
SELECT 'bounded' AS variant, * FROM ({jaccard_bounded})
ORDER BY variant, a, b""",
        "dedup_clusters": cluster_oracle,
        # the three span/repetition signals joined on doc_id (one entry):
        # (r) Gopher-style repetition quality — list_max over
        # per-distinct-gram filter counts == the engine's sorted-run
        # aggregate by definition; (s) cross-doc repeated spans — md5(span)
        # is the ORACLE's grouping key only (exact string equality; the
        # engine's 64-bit window hashes would FAIL parity on collision);
        # (c) decontamination — probe spans = distinct spans of docs 0..49
        "repetition_spans": f"""
WITH r AS (
            WITH t AS (SELECT doc_id, {_TOK} AS ts FROM documents),
            ng AS (SELECT doc_id,
              list_transform(range(1, len(ts)-2+2),
                             i -> array_to_string(ts[i:i+1], ' ')) AS g2,
              list_transform(range(1, len(ts)-3+2),
                             i -> array_to_string(ts[i:i+2], ' ')) AS g3,
              list_transform(range(1, len(ts)-5+2),
                             i -> array_to_string(ts[i:i+4], ' ')) AS g5
              FROM t)
            SELECT doc_id,
              CASE WHEN len(g2) > 0 THEN
                round(list_max(list_transform(list_distinct(g2),
                      x -> len(list_filter(g2, y -> y = x)))) / len(g2), 6)
                ELSE 0.0 END AS top2gram_frac,
              CASE WHEN len(g3) > 0 THEN
                round(list_max(list_transform(list_distinct(g3),
                      x -> len(list_filter(g3, y -> y = x)))) / len(g3), 6)
                ELSE 0.0 END AS top3gram_frac,
              CASE WHEN len(g5) > 0 THEN
                round(1.0 - len(list_distinct(g5)) / len(g5), 6)
                ELSE 0.0 END AS dup5gram_frac
            FROM ng
), s AS (
            WITH t AS (SELECT doc_id, {_TOK} AS ts FROM documents),
            sp AS (SELECT doc_id,
                     list_distinct(list_transform(range(1, len(ts)-3+2),
                       i -> array_to_string(ts[i:i+2], ' '))) AS spans
                   FROM t),
            ex AS (SELECT doc_id, md5(unnest(spans)) AS k FROM sp),
            c AS (SELECT k, count(*) AS nd FROM ex GROUP BY k),
            pd AS (SELECT doc_id, count(*) AS n_spans,
                          sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS dup_spans
                   FROM ex JOIN c USING (k) GROUP BY doc_id)
            SELECT sp.doc_id,
              coalesce(pd.n_spans, 0)::BIGINT AS n_spans,
              coalesce(pd.dup_spans, 0)::BIGINT AS dup_spans,
              CASE WHEN len(sp.spans) > 0
                   THEN round(coalesce(pd.dup_spans, 0) / len(sp.spans), 6)
                   ELSE 0.0 END AS dup_span_frac
            FROM sp LEFT JOIN pd USING (doc_id)
), c AS (
            WITH t AS (SELECT doc_id, {_TOK} AS ts FROM documents),
            sp AS (SELECT doc_id,
                     list_distinct(list_transform(range(1, len(ts)-3+2),
                       i -> array_to_string(ts[i:i+2], ' '))) AS spans
                   FROM t),
            ex AS (SELECT doc_id, unnest(spans) AS s FROM sp),
            probe AS (SELECT DISTINCT s FROM ex WHERE doc_id < 50),
            pd AS (SELECT ex.doc_id, count(*) AS n_spans,
                          sum(CASE WHEN probe.s IS NOT NULL
                              THEN 1 ELSE 0 END) AS cont
                   FROM ex LEFT JOIN probe ON ex.s = probe.s
                   GROUP BY ex.doc_id)
            SELECT sp.doc_id,
              coalesce(pd.n_spans, 0)::BIGINT AS n_spans,
              coalesce(pd.cont, 0)::BIGINT AS contaminated_spans,
              CASE WHEN len(sp.spans) > 0
                   THEN round(coalesce(pd.cont, 0) / len(sp.spans), 6)
                   ELSE 0.0 END AS contamination_frac
            FROM sp LEFT JOIN pd USING (doc_id)
)
SELECT r.doc_id, r.top2gram_frac, r.top3gram_frac, r.dup5gram_frac,
       s.n_spans, s.dup_spans, s.dup_span_frac,
       c.contaminated_spans, c.contamination_frac
FROM r JOIN s USING (doc_id) JOIN c USING (doc_id)
ORDER BY doc_id""",
        # multimodal oracles: recompute the spec'd feature vectors
        # (functions/multimodal.py docstring) analytically from the same
        # deterministic pixel/sample formulas the Spark entries encode
        # into PSL1/PSLA blobs. CAST(... AS FLOAT)::DOUBLE mirrors the
        # engine's float32 feature dtype so both sides quantize
        # identically before round(,6).
        "image_features": """
            WITH px AS (
              SELECT d.doc_id, g.i::BIGINT AS i,
                     ((d.doc_id*131 + g.i*7919) % 256)::DOUBLE AS v
              FROM documents d, generate_series(0, 191) g(i)
            ),
            chan AS (  -- dims 0-2 mean/255, dims 3-5 std/255 per channel
              SELECT doc_id, (i % 3)::INT AS ch,
                     avg(v)/255.0 AS mean_v,
                     stddev_pop(v)/255.0 AS std_v
              FROM px GROUP BY doc_id, ch
            ),
            luma AS (  -- Rec.601 luminance per pixel (channel-last i%3)
              SELECT doc_id, i // 3 AS p,
                     0.299*max(CASE WHEN i % 3 = 0 THEN v END)
                   + 0.587*max(CASE WHEN i % 3 = 1 THEN v END)
                   + 0.114*max(CASE WHEN i % 3 = 2 THEN v END) AS l
              FROM px GROUP BY doc_id, p
            ),
            hist AS (  -- dims 6-63: 58-bin luminance histogram fractions
              SELECT doc_id,
                     LEAST(floor(l*58.0/255.0)::INT, 57) AS b,
                     count(*)/64.0 AS frac
              FROM luma GROUP BY doc_id, b
            ),
            vals AS (
              SELECT doc_id, ch AS dim, mean_v AS val FROM chan
              UNION ALL SELECT doc_id, ch + 3, std_v FROM chan
              UNION ALL SELECT doc_id, b + 6, frac FROM hist
            ),
            dims AS (
              SELECT d.doc_id, g.dim::INT AS dim
              FROM documents d, generate_series(0, 63) g(dim)
            )
            SELECT dims.doc_id, 8 AS width, 8 AS height, 3 AS channels,
                   dims.dim,
                   round(CAST(coalesce(vals.val, 0.0) AS FLOAT)::DOUBLE, 6)
                     AS val
            FROM dims LEFT JOIN vals
              ON dims.doc_id = vals.doc_id AND dims.dim = vals.dim""",
        "audio_features": """
            WITH smp AS (
              SELECT d.doc_id, g.i::BIGINT AS i,
                     ((((d.doc_id*7 + g.i*13) % 64001) - 32000)::DOUBLE
                      / 32768.0) AS s
              FROM documents d, generate_series(0, 199) g(i)
            ),
            lagged AS (
              SELECT doc_id, i, s,
                     lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
              FROM smp
            ),
            base AS (  -- dim 0 duration, dim 1 rms, dim 2 zero-crossing
              SELECT doc_id,
                     200.0/8000.0 AS dur,
                     sqrt(avg(s*s)) AS rms,
                     sum(CASE WHEN prev IS NOT NULL
                              AND ((s < 0) <> (prev < 0))
                         THEN 1 ELSE 0 END)/199.0 AS zcr
              FROM lagged GROUP BY doc_id
            ),
            hist AS (  -- dims 3-63: 61-bin |amplitude| histogram fractions
              SELECT doc_id, floor(abs(s)*61.0)::INT AS b,
                     count(*)/200.0 AS frac
              FROM smp GROUP BY doc_id, b
            ),
            vals AS (
              SELECT doc_id, 0 AS dim, dur AS val FROM base
              UNION ALL SELECT doc_id, 1, rms FROM base
              UNION ALL SELECT doc_id, 2, zcr FROM base
              UNION ALL SELECT doc_id, b + 3, frac FROM hist
            ),
            dims AS (
              SELECT d.doc_id, g.dim::INT AS dim
              FROM documents d, generate_series(0, 63) g(dim)
            )
            SELECT dims.doc_id, 8000 AS sample_rate,
                   round(200.0/8000.0, 6) AS dur_sec, dims.dim,
                   round(CAST(coalesce(vals.val, 0.0) AS FLOAT)::DOUBLE, 6)
                     AS val
            FROM dims LEFT JOIN vals
              ON dims.doc_id = vals.doc_id AND dims.dim = vals.dim""",
        # video: frame_sample(every_n=2) keeps frames {0, 2} of the 4-frame
        # PSLV blobs; each kept frame is featurized by the SAME PSL1 image
        # path (4x4x3 -> 16 pixels, hist fractions /16)
        "video_features": f"""
            WITH fr AS (SELECT unnest([{", ".join(
                str(f) for f in range(0, N_VID_FRAMES, VID_EVERY_N))}])
                          AS frame_no),
            px AS (
              SELECT d.doc_id, fr.frame_no, g.i::BIGINT AS i,
                     ((d.doc_id*131 + fr.frame_no*4099 + g.i*7919) % 256)
                       ::DOUBLE AS v
              FROM documents d, fr, generate_series(0, 47) g(i)
            ),
            chan AS (
              SELECT doc_id, frame_no, (i % 3)::INT AS ch,
                     avg(v)/255.0 AS mean_v,
                     stddev_pop(v)/255.0 AS std_v
              FROM px GROUP BY doc_id, frame_no, ch
            ),
            luma AS (
              SELECT doc_id, frame_no, i // 3 AS p,
                     0.299*max(CASE WHEN i % 3 = 0 THEN v END)
                   + 0.587*max(CASE WHEN i % 3 = 1 THEN v END)
                   + 0.114*max(CASE WHEN i % 3 = 2 THEN v END) AS l
              FROM px GROUP BY doc_id, frame_no, p
            ),
            hist AS (
              SELECT doc_id, frame_no,
                     LEAST(floor(l*58.0/255.0)::INT, 57) AS b,
                     count(*)/16.0 AS frac
              FROM luma GROUP BY doc_id, frame_no, b
            ),
            vals AS (
              SELECT doc_id, frame_no, ch AS dim, mean_v AS val FROM chan
              UNION ALL SELECT doc_id, frame_no, ch + 3, std_v FROM chan
              UNION ALL SELECT doc_id, frame_no, b + 6, frac FROM hist
            ),
            dims AS (
              SELECT d.doc_id, fr.frame_no, g.dim::INT AS dim
              FROM documents d, fr, generate_series(0, 63) g(dim)
            )
            SELECT dims.doc_id, dims.frame_no::INT AS frame_no,
                   4 AS width, 4 AS height, dims.dim,
                   round(CAST(coalesce(vals.val, 0.0) AS FLOAT)::DOUBLE, 6)
                     AS val
            FROM dims LEFT JOIN vals
              ON dims.doc_id = vals.doc_id
             AND dims.frame_no = vals.frame_no
             AND dims.dim = vals.dim""",
        "minhash_lsh_pairs": minhash_oracle,
        # both 64-bit per-doc signatures (rolling-hash fingerprint +
        # md5-token simhash), full VALUES, one entry
        "doc_signatures": f"""
WITH fp AS ({fingerprint_sql}), sh AS ({simhash_sql})
SELECT fp.doc_id, fp.fingerprint, sh.simhash
FROM fp JOIN sh USING (doc_id) ORDER BY doc_id""",
        "simhash_pairs": simhash_pairs_sql,
        "cosine_dup_pairs": cosine_dups_sql,
        "ann_lsh_topk": ann_lsh_sql,
        # hybrid RRF: rank each leg on RAW scores (rounding would invent
        # ties the engine doesn't see), fuse 1/(60+rank), round only the
        # fused output. BM25 leg ranks over the full match set; cosine leg
        # over all non-query vectors — both truncated to the 50-deep
        # fetch windows the engine uses
        "hybrid_rrf_topk": f"""
WITH bm_all AS ({bm25_sql(bm_in, limit=None, rounded=False)}),
bm AS (SELECT doc_id,
              row_number() OVER (ORDER BY score DESC, doc_id) AS r
       FROM bm_all QUALIFY r <= 50),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
nn_all AS (SELECT vec_id AS doc_id,
                  list_cosine_similarity(embedding::DOUBLE[], q.qv) AS cos
           FROM embeddings, q WHERE vec_id <> 0),
nn AS (SELECT doc_id,
              row_number() OVER (ORDER BY cos DESC, doc_id) AS r
       FROM nn_all QUALIFY r <= 50),
fused AS (
  SELECT doc_id,
         COALESCE(1.0 / (60 + bm.r), 0) + COALESCE(1.0 / (60 + nn.r), 0)
           AS rrf
  FROM bm FULL OUTER JOIN nn USING (doc_id))
SELECT doc_id, round(fused.rrf, 6) AS rrf FROM fused
ORDER BY fused.rrf DESC, doc_id LIMIT 10""",
        "ann_cosine_topk": """
            -- DOUBLE[] casts force float64 math (DuckDB's native
            -- list_cosine_similarity on FLOAT[] computes in float32,
            -- which drifts from the engine's numpy float64 at ~1e-7)
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                       WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[], q.qv), 6)
                     AS cos
            FROM embeddings, q WHERE vec_id <> 0
            ORDER BY list_cosine_similarity(embedding::DOUBLE[], q.qv) DESC,
                     vec_id
            LIMIT 10""",
        "events_hourly": """
            SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
                   event_type, count(*)::BIGINT AS cnt,
                   round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2""",
    }
