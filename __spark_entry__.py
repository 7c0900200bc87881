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
ANN_BATCH_QVIDS = (0, 13, 14)  # batch queries (outside the plane vectors)


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
        return _ids_df(spark, _index(spark, sf).search_and_ids(Q_AND))

    def search_df_and(spark, sf):
        # the lazy 10^12-doc surface: per-segment distributed kernels +
        # docmap join, nothing collected until the driver's comparison
        return _index(spark, sf).search_df(Q_AND).select("doc_id", "url")

    def search_and_deleted(spark, sf):
        # tombstone masking on the DISTRIBUTED path (cogrouped per-segment
        # delete rows), post-delete snapshot
        return _ids_df(spark, _index_deleted(spark, sf)
                       .search_and_ids(Q_AND, distributed=True))

    def search_or(spark, sf):
        return _ids_df(spark, _index(spark, sf).search_or_ids(Q_OR))

    def search_phrase(spark, sf):
        # exact consecutive-token phrase over positional postings
        # (operators/phrase.py): 3-gram, local block-selective kernel
        return _ids_df(spark,
                       _index_pos(spark, sf).search_phrase_ids(Q_PHRASE3))

    def search_phrase_dist(spark, sf):
        # distributed phrase path: per-segment applyInPandas kernel, only
        # matching ids cross the exchange, docmap join resolves urls
        return (_index_pos(spark, sf).search_df(Q_PHRASE, mode="phrase")
                .select("doc_id", "url"))

    def search_near(spark, sf):
        # ordered proximity (SpanNearQuery inOrder=True shape): tokens in
        # order, span ≤ n-1+slop over the positional index; greedy
        # chained-searchsorted kernel (operators/phrase.py:near_match_ids)
        return _ids_df(spark, _index_pos(spark, sf)
                       .search_near_ids(Q_NEAR, NEAR_SLOP))

    def search_near_unordered(spark, sf):
        # unordered proximity (SpanNearQuery inOrder=False shape): the
        # distinct terms in ANY arrangement inside a window of n-1+slop;
        # anchor-scan kernel (operators/phrase.py:near_unordered_match_ids)
        return _ids_df(spark, _index_pos(spark, sf)
                       .search_near_ids(Q_NEAR, NEAR_SLOP, in_order=False))

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

    def count_and(spark, sf):
        return spark.createDataFrame(
            [(_index(spark, sf).count(Q_BM25),)], "cnt long")

    def term_df(spark, sf):
        idx = _index(spark, sf)
        pdf = idx._fetch(Q_TERMS)
        dfs = idx.global_dfs(pdf, Q_TERMS)
        return spark.createDataFrame(
            [(t, int(dfs[t])) for t in Q_TERMS if dfs[t] > 0],
            "term string, df long")

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
        top = _index(spark, sf).topk(Q_BM25, k=10)
        out = spark.createDataFrame(
            [(int(d), float(s)) for d, s in top], "doc_id long, score double")
        return out.select("doc_id", F.round("score", 6).alias("score"))

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
        # Lucene minimumNumberShouldMatch (3 of 4 terms), DISTRIBUTED:
        # per-segment multiplicity counting inside the kernel — segments
        # partition the docID space, so local counts are global counts
        return _ids_df(spark, _index(spark, sf).search_min_match_ids(
            Q_MSM, MSM_M, distributed=True))

    def bm25_topk_msm(spark, sf):
        # ranked msm: candidates = docs matching >= m distinct terms,
        # scores = full disjunctive BM25 (msm restricts, never rescores)
        top = _index(spark, sf).topk(Q_MSM, k=10, min_match=MSM_M)
        out = spark.createDataFrame(
            [(int(d), float(s)) for d, s in top], "doc_id long, score double")
        return out.select("doc_id", F.round("score", 6).alias("score"))

    def search_wildcard(spark, sf):
        # wildcard term query (s?a*): dictionary expansion via pushed
        # StartsWith + rlike on the term-sorted postings, then OR union
        return _ids_df(spark, _index(spark, sf)
                       .search_wildcard_ids(W_PATTERN))

    def search_regex(spark, sf):
        # regex term query (Lucene RegexpQuery): anchored dictionary
        # expansion (literal head pushed as StartsWith) + OR union
        return _ids_df(spark, _index(spark, sf)
                       .search_regex_ids(RX_PATTERN))

    def search_fuzzy(spark, sf):
        # fuzzy term query (Lucene FuzzyQuery, transpositions=false):
        # dictionary expansion by length-banded thresholded Levenshtein
        # over the (term, df) scan, then OR union
        return _ids_df(spark, _index(spark, sf)
                       .search_fuzzy_ids(FZ_TERM, max_edits=FZ_EDITS))

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

    def bm25_topk_page2(spark, sf):
        # searchAfter pagination (Lucene cursor, not OFFSET): page 1's
        # last (doc_id, score) tuple is the cursor for page 2; the oracle
        # is the same ranking with LIMIT 10 OFFSET 10
        idx = _index(spark, sf)
        page1 = idx.topk(Q_BM25, k=10)
        top = idx.topk(Q_BM25, k=10, after=page1[-1])
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

    def doc_len(spark, sf):
        idx = _index(spark, sf)
        return idx._docmap.select("doc_id", "doc_len").orderBy("doc_id")

    def token_count(spark, sf):
        from pysearchlite_spark.functions.text import token_counts
        return token_counts(_docs(spark, sf)).select(
            "doc_id", F.col("n_tokens").cast("long").alias("n_tokens"))

    def bpe_count(spark, sf):
        from pysearchlite_spark.functions.text import bpe_token_counts
        return bpe_token_counts(_docs(spark, sf))

    def quality(spark, sf):
        from pysearchlite_spark.functions.text import quality_stats
        return quality_stats(_docs(spark, sf))

    def langid(spark, sf):
        from pysearchlite_spark.functions.text import lang_id
        return lang_id(_docs(spark, sf))

    def fingerprint(spark, sf):
        # hash_fn='md5' → the full fingerprint VALUE is oracle-checked
        from pysearchlite_spark.functions.text import doc_fingerprint
        return doc_fingerprint(_docs(spark, sf), hash_fn="md5")

    def exact_dup(spark, sf):
        from pysearchlite_spark.operators.dedup import exact_dedup
        return exact_dedup(_docs(spark, sf))

    def jaccard_pairs(spark, sf):
        # tier 1 of the two-tier dedup design: EXACT all-pairs jaccard with
        # the rare-token cap disabled (max_df=inf) — valid only at oracle
        # scale; production uses the bounded entry below + MinHash for the
        # non-rare-token mass
        from pysearchlite_spark.operators.dedup import token_jaccard_pairs
        return token_jaccard_pairs(_docs(spark, sf), threshold=0.8,
                                   max_df=10**9)

    def jaccard_bounded(spark, sf):
        # tier 2: the 100-TB configuration — candidate generation only
        # through tokens with df <= 100; exact for pairs sharing >= 1 rare
        # token (the oracle replicates the same candidate rule)
        from pysearchlite_spark.operators.dedup import token_jaccard_pairs
        return token_jaccard_pairs(_docs(spark, sf), threshold=0.8,
                                   max_df=100)

    def search_and_not(spark, sf):
        # boolean negation: include-AND minus per-segment exclusion union
        # (sorted-mask kernel; the NOT set never materializes globally)
        return _ids_df(spark, _index(spark, sf).search_and_not_ids(
            Q_AND, Q_NOT, distributed=True))

    def facet_lang(spark, sf):
        # Solr/ES-style terms aggregation over the match set: lazy id set
        # joins documents reading only (doc_id, lang); map-side-combined
        # count per facet value
        return _index(spark, sf).facet_counts(
            Q_AND, _docs(spark, sf), "lang")

    def search_sorted(spark, sf):
        # Lucene Sort/SortField shape: top-10 matches by n_chars desc
        # (doc_id tiebreak) — orderBy+limit compiles to
        # TakeOrderedAndProject, never a full sort
        return _index(spark, sf).search_sorted(
            Q_AND, by="n_chars", docs=_docs(spark, sf), k=10)

    def facet_chars_range(spark, sf):
        # ES range-aggregation shape: match-set counts per half-open
        # [lo, hi) n_chars bin — lazy id set joins a 2-column doc
        # projection, the bin CASE chain is whole-stage codegen
        return _index(spark, sf).facet_range(
            Q_AND, _docs(spark, sf), "n_chars", RANGE_EDGES)

    def term_stats(spark, sf):
        # Lucene CollectionStatistics/TermStatistics: (df, totalTermFreq)
        # per term — tf streams decoded inside mapInPandas, only the
        # per-term aggregate crosses
        rows = _index(spark, sf).term_stats(Q_TERMS, distributed=True)
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

    def simhash_sigs(spark, sf):
        from pysearchlite_spark.operators.dedup import simhash_signatures
        return simhash_signatures(_docs(spark, sf), hash_fn="md5")

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

    def ann_lsh_batch(spark, sf):
        # N queries in ONE job (qid = position): same per-query results as
        # ann_lsh_topk, amortizing the per-job dispatch
        idx = _ann_index(spark, sf)
        emb = _emb(spark, sf)
        qrows = {r["vec_id"]: list(r["embedding"]) for r in
                 emb.filter(F.col("vec_id").isin(list(ANN_BATCH_QVIDS)))
                 .collect()}
        # qid = TUPLE position (the oracle's convention), independent of
        # vec_id ordering
        return idx.topk_batch([qrows[v] for v in ANN_BATCH_QVIDS], k=10,
                              probe_bits=2)

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
        # embeddings of vec_id 1..12 so DuckDB can recompute the bucket bits
        return _ann_index(spark, sf).topk(_ann_query(spark, sf), k=10,
                                          probe_bits=2)

    def ann_ivf(spark, sf):
        # persisted IVF-flat index, fixed centroids (embeddings 1..16),
        # nprobe=4 — assignment/probing reproducible as SQL cosine argmax
        return _ivf_index(spark, sf).topk(_ann_query(spark, sf), k=10,
                                          nprobe=IVF_NPROBE)

    def repetition(spark, sf):
        # Gopher-style repetition quality signals (top n-gram fraction,
        # duplicate n-gram fraction); vectorized Arrow UDF (chained
        # factorization), pure per-doc scan — no shuffle
        from pysearchlite_spark.functions.text import repetition_stats
        return repetition_stats(_docs(spark, sf))

    def rep_spans(spark, sf):
        # cross-doc repeated n-token spans (exact-substring dup signal);
        # n=3 so the synthetic vocabulary actually produces collisions
        from pysearchlite_spark.operators.dedup import repeated_spans
        # cache=False: this lazy frame outlives the call in the driver's
        # long-lived session; no unpersist hook exists there
        return repeated_spans(_docs(spark, sf), n=3, cache=False)

    def contamination(spark, sf):
        # benchmark-decontamination signal: probe set = docs 0..49 (stand-in
        # for an eval benchmark); corpus side never shuffles by span —
        # probe keys broadcast into a left-semi
        from pysearchlite_spark.operators.dedup import span_contamination
        docs = _docs(spark, sf)
        return span_contamination(docs, docs.filter(F.col("doc_id") < 50),
                                   n=3, cache=False)

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

    def events_hourly(spark, sf):
        ev = spark.read.parquet(f"{sf}/events.parquet")
        return (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
                .agg(F.count("*").alias("cnt"),
                     F.round(F.sum("value"), 4).alias("sum_value"))
                .select(F.unix_timestamp(F.col("w.start")).alias("hour_start"),
                        "event_type", "cnt", "sum_value"))

    return {
        "search_and": search_and,
        "search_and_deleted": search_and_deleted,
        "search_df_and": search_df_and,
        "search_or": search_or,
        "search_phrase": search_phrase,
        "search_phrase_dist": search_phrase_dist,
        "search_near": search_near,
        "search_near_unordered": search_near_unordered,
        "bm25_scores": bm25_scores,
        "search_collapse": search_collapse,
        "search_prefix": search_prefix,
        "search_snippets": search_snippets_entry,
        "search_and_not": search_and_not,
        "facet_lang": facet_lang,
        "search_sorted": search_sorted,
        "facet_chars_range": facet_chars_range,
        "term_stats": term_stats,
        "significant_terms": significant_terms,
        "count_and": count_and,
        "term_df": term_df,
        "bm25_topk": bm25_topk,
        "bm25_topk_batch": bm25_topk_batch,
        "bm25_topk_filtered": bm25_topk_filtered,
        "bm25_topk_msm": bm25_topk_msm,
        "bm25_topk_page2": bm25_topk_page2,
        "search_and_filtered": search_and_filtered,
        "search_min_match": search_min_match,
        "search_wildcard": search_wildcard,
        "search_regex": search_regex,
        "search_fuzzy": search_fuzzy,
        "suggest_terms": suggest_terms,
        "more_like_this": more_like_this,
        "search_query": search_query,
        "bm25_topk_query": bm25_topk_query,
        "bm25_topk_boosted": bm25_topk_boosted,
        "search_synonym_and": search_synonym_and,
        "bm25_topk_syn": bm25_topk_syn,
        "field_search_and": field_search_and,
        "bm25_dismax": bm25_dismax,
        "doc_len": doc_len,
        "token_count": token_count,
        "bpe_token_count": bpe_count,
        "quality_stats": quality,
        "lang_id": langid,
        "doc_fingerprint": fingerprint,
        "exact_dedup": exact_dup,
        "token_jaccard_pairs": jaccard_pairs,
        "token_jaccard_bounded": jaccard_bounded,
        "dedup_clusters": dedup_cluster_entry,
        "minhash_lsh_pairs": minhash_pairs,
        "simhash_signatures": simhash_sigs,
        "simhash_pairs": simhash_prs,
        "cosine_dup_pairs": cosine_dups,
        "repetition_stats": repetition,
        "repeated_spans": rep_spans,
        "span_contamination": contamination,
        "image_features": image_feats,
        "audio_features": audio_feats,
        "ann_cosine_topk": ann_cosine,
        "hybrid_rrf_topk": hybrid_rrf_topk,
        "ann_lsh_topk": ann_lsh,
        "ann_lsh_topk_batch": ann_lsh_batch,
        "ann_ivf_topk": ann_ivf,
        "events_hourly": events_hourly,
    }


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

    ann_lsh_sql = _ann_lsh_select(0)
    ann_lsh_batch_sql = "\nUNION ALL\n".join(
        f"SELECT * FROM ({_ann_lsh_select(v, i)})"
        for i, v in enumerate(ANN_BATCH_QVIDS))

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
        "search_and": f"SELECT doc_id FROM documents WHERE {and_pred} "
                      f"ORDER BY doc_id",
        "search_and_deleted": f"SELECT doc_id FROM documents WHERE "
                              f"{and_pred} AND doc_id % {DELETE_MOD} <> 0 "
                              f"ORDER BY doc_id",
        # build_index(id_col='doc_id', url_col=None) derives url=str(doc_id)
        "search_df_and": f"SELECT doc_id, CAST(doc_id AS VARCHAR) AS url "
                         f"FROM documents WHERE {and_pred} ORDER BY doc_id",
        "search_or": f"SELECT doc_id FROM documents WHERE {or_pred} "
                     f"ORDER BY doc_id",
        # phrase oracle: rebuild the token stream with the SAME tokenizer
        # expression and substring-match the space-joined form — exact
        # consecutive-token semantics (tokens are alnum, so the single
        # space is an unambiguous delimiter)
        "search_phrase": f"SELECT doc_id FROM documents WHERE "
                         f"' ' || array_to_string({_TOK}, ' ') || ' ' "
                         f"LIKE '% {Q_PHRASE3} %' ORDER BY doc_id",
        "search_phrase_dist": f"SELECT doc_id, CAST(doc_id AS VARCHAR) AS "
                              f"url FROM documents WHERE "
                              f"' ' || array_to_string({_TOK}, ' ') || ' ' "
                              f"LIKE '% {Q_PHRASE} %' ORDER BY doc_id",
        # ordered-proximity oracle: token positions via range+list_filter,
        # then an exists-chain check (2 terms: some pa<pb with gap ≤ 1+slop)
        "search_near": f"""
WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
p AS (SELECT doc_id,
        list_filter(range(1, len(toks)+1),
                    i -> toks[i] = '{Q_NEAR.split()[0]}') AS p1,
        list_filter(range(1, len(toks)+1),
                    i -> toks[i] = '{Q_NEAR.split()[1]}') AS p2
      FROM t)
SELECT doc_id FROM p
WHERE len(list_filter(p1, pa -> len(list_filter(p2,
          pb -> pb > pa AND pb - pa <= {1 + NEAR_SLOP})) > 0)) > 0
ORDER BY doc_id""",
        # unordered proximity: for 2 distinct terms a window of width
        # n-1+slop holding both ≡ |pa - pb| ≤ 1+slop, either order
        "search_near_unordered": f"""
WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
p AS (SELECT doc_id,
        list_filter(range(1, len(toks)+1),
                    i -> toks[i] = '{Q_NEAR.split()[0]}') AS p1,
        list_filter(range(1, len(toks)+1),
                    i -> toks[i] = '{Q_NEAR.split()[1]}') AS p2
      FROM t)
SELECT doc_id FROM p
WHERE len(list_filter(p1, pa -> len(list_filter(p2,
          pb -> abs(pb - pa) <= {1 + NEAR_SLOP})) > 0)) > 0
ORDER BY doc_id""",
        "search_prefix": f"SELECT doc_id FROM documents WHERE "
                         f"len(list_filter({_TOK}, "
                         f"t -> t LIKE '{Q_PREFIX}%')) > 0 ORDER BY doc_id",
        "search_and_not": f"SELECT doc_id FROM documents WHERE {and_pred} "
                          f"AND NOT list_contains({_TOK}, '{Q_NOT}') "
                          f"ORDER BY doc_id",
        "facet_lang": f"SELECT lang AS facet, count(*)::BIGINT AS n "
                      f"FROM documents WHERE {and_pred} GROUP BY lang",
        "search_sorted": f"SELECT doc_id, n_chars FROM documents "
                         f"WHERE {and_pred} "
                         f"ORDER BY n_chars DESC, doc_id LIMIT 10",
        "facet_chars_range": f"""
WITH bins(bin, lo, hi) AS (VALUES {", ".join(
    f"({i}::BIGINT, {float(RANGE_EDGES[i])}::DOUBLE,"
    f" {float(RANGE_EDGES[i + 1])}::DOUBLE)"
    for i in range(len(RANGE_EDGES) - 1))})
SELECT b.bin, b.lo, b.hi, count(*)::BIGINT AS n
FROM documents d JOIN bins b
  ON d.n_chars >= b.lo AND d.n_chars < b.hi
WHERE {and_pred}
GROUP BY b.bin, b.lo, b.hi ORDER BY b.bin""",
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
        "count_and": "SELECT count(*)::BIGINT AS cnt FROM documents WHERE "
                     + " AND ".join(f"list_contains({_TOK}, '{t}')"
                                    for t in bm_terms),
        "term_df": f"""
            SELECT term, count(DISTINCT doc_id)::BIGINT AS df
            FROM (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
            WHERE term IN ({df_in}) GROUP BY term""",
        "bm25_topk": bm25,
        # the FULL scored match set (scores_df): same scoring CTE, no
        # top-k truncation
        "bm25_scores": bm25_sql(bm_in, limit=None),
        # field collapsing: best-scoring doc per lang over the full scored
        # match set, groups ranked by their winner (ties -> doc_id asc)
        "search_collapse": f"""
WITH s AS ({bm25_sql(bm_in, limit=None)}),
j AS (
  SELECT s.doc_id, s.score, d.lang AS collapse,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY s.score DESC, s.doc_id) AS rn
  FROM s JOIN documents d USING (doc_id))
SELECT doc_id, score, collapse FROM j WHERE rn = 1
ORDER BY score DESC, doc_id LIMIT 10
""",
        "bm25_topk_batch": bm25_batch_sql,
        "bm25_topk_filtered": bm25_filtered,
        "bm25_topk_msm": bm25_msm,
        "bm25_topk_page2": bm25_sql(bm_in, offset=10),
        "search_and_filtered": f"SELECT doc_id FROM documents "
                               f"WHERE {and_pred} AND doc_id IN "
                               f"{filter_subq} ORDER BY doc_id",
        "search_min_match": f"""
SELECT doc_id FROM (
  SELECT doc_id, count(DISTINCT term) AS c
  FROM (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
  WHERE term IN ({msm_in}) GROUP BY doc_id)
WHERE c >= {MSM_M} ORDER BY doc_id""",
        "search_wildcard": f"SELECT doc_id FROM documents WHERE "
                           f"len(list_filter({_TOK}, t -> t LIKE "
                           f"'{W_LIKE}')) > 0 ORDER BY doc_id",
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
        "search_fuzzy": f"SELECT doc_id FROM documents WHERE "
                        f"len(list_filter({_TOK}, t -> "
                        f"levenshtein(t, '{FZ_TERM}') <= {FZ_EDITS})) > 0 "
                        f"ORDER BY doc_id",
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
        "search_regex": f"SELECT doc_id FROM documents WHERE "
                        f"len(list_filter({_TOK}, t -> "
                        f"regexp_full_match(t, '{RX_PATTERN}'))) > 0 "
                        f"ORDER BY doc_id",
        "field_search_and": f"""
SELECT doc_id FROM (SELECT doc_id, {_TOK} AS tb FROM documents)
WHERE {" AND ".join(f"list_contains(tb[1:5], '{t}')"
                    for t in FIELD_Q["title"].split())}
  AND {" AND ".join(f"list_contains(tb, '{t}')"
                    for t in FIELD_Q["body"].split())}
ORDER BY doc_id""",
        "bm25_dismax": bm25_dismax_sql,
        "doc_len": f"SELECT doc_id, len({_TOK})::BIGINT AS doc_len "
                   f"FROM documents ORDER BY doc_id",
        "token_count": f"SELECT doc_id, len({_TOK})::BIGINT AS n_tokens "
                       f"FROM documents",
        # same pattern string, Java regex (Spark, JVM-side) vs RE2 (DuckDB):
        # restricted to constructs both evaluate identically (functions/
        # text.py BPE_PATTERN)
        "bpe_token_count": (
            "SELECT doc_id, len(regexp_extract_all(coalesce(text, ''), '"
            + _bpe_pattern_sql()
            + "'))::BIGINT AS n_bpe_tokens FROM documents"),
        "quality_stats": """
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
            FROM t""".format(
            tok=_TOK,
            sw=", ".join(f"'{w}'" for w in sorted(_STOPWORDS["en"]))),
        "lang_id": langid,
        "exact_dedup": """
            SELECT doc_id,
                   min(doc_id) OVER (PARTITION BY coalesce(text, ''))
                     AS keep_id,
                   doc_id <> min(doc_id) OVER (PARTITION BY coalesce(text, ''))
                     AS is_dup
            FROM documents""",
        "token_jaccard_pairs": jaccard,
        "token_jaccard_bounded": jaccard_bounded,
        "dedup_clusters": cluster_oracle,
        # list-comprehension mode count: list_max over per-distinct-gram
        # filter counts == the engine's sorted-run aggregate by definition
        "repetition_stats": f"""
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
            FROM ng""",
        # md5(span) is the ORACLE's grouping key only — exact per-span
        # string equality (md5 collisions negligible). The engine groups
        # on 64-bit blake2b polynomial window hashes; an engine-side key
        # collision in a test corpus fails parity loudly.
        "repeated_spans": f"""
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
            FROM sp LEFT JOIN pd USING (doc_id)""",
        # probe spans = distinct spans of docs 0..49 (same derivation as
        # the engine's broadcast left-semi; exact string spans, so a
        # 64-bit span-hash collision in the engine would FAIL parity here)
        "span_contamination": f"""
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
            FROM sp LEFT JOIN pd USING (doc_id)""",
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
        "minhash_lsh_pairs": minhash_oracle,
        "doc_fingerprint": fingerprint_sql,
        "simhash_signatures": simhash_sql,
        "simhash_pairs": simhash_pairs_sql,
        "cosine_dup_pairs": cosine_dups_sql,
        "ann_lsh_topk": ann_lsh_sql,
        "ann_lsh_topk_batch": ann_lsh_batch_sql,
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
SELECT doc_id, round(rrf, 6) AS rrf FROM fused
ORDER BY rrf DESC, doc_id LIMIT 10""",
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
