"""Driver contract for the spark-graft builder (PySpark target).

queries() entries cover SURVEY.md §2's operator inventory re-expressed
Spark-first (inverted-index build + AND/OR/COUNT/BM25 engine) plus the
training-data-pipeline operators (dedup, similarity, text analysis).
Each SQL-expressible entry has a DuckDB oracle in oracle_sql(); engine
internals that SQL cannot express (MinHash-LSH, SimHash, LSH-ANN,
fingerprints, langid) are rows-only checks here but are oracle-verified in
tests/ against single-node references.
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


@atexit.register
def _cleanup() -> None:
    for d in _TMP_DIRS:
        shutil.rmtree(d, ignore_errors=True)


def _ids_df(spark: SparkSession, ids) -> DataFrame:
    return spark.createDataFrame([(int(i),) for i in ids], "doc_id long")


# DuckDB tokenizer expression — exact SQL equivalent of
# pysearchlite_spark.tokenizer (ASCII [A-Za-z0-9]+ runs, lowered; valid
# because lower() on the matched runs is ASCII-only):
_TOK = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"

Q_AND = "table part"          # terms present in the synthetic vocabulary
Q_OR = "spark merge"
Q_BM25 = "query value"
Q_TERMS = ["table", "part", "query", "value", "spark", "merge", "zzmissing"]


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

    def search_or(spark, sf):
        return _ids_df(spark, _index(spark, sf).search_or_ids(Q_OR))

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

    def bm25_topk(spark, sf):
        top = _index(spark, sf).topk(Q_BM25, k=10)
        out = spark.createDataFrame(
            [(int(d), float(s)) for d, s in top], "doc_id long, score double")
        return out.select("doc_id", F.round("score", 6).alias("score"))

    def doc_len(spark, sf):
        idx = _index(spark, sf)
        return idx._docmap.select("doc_id", "doc_len").orderBy("doc_id")

    def token_count(spark, sf):
        from pysearchlite_spark.functions.text import token_counts
        return token_counts(_docs(spark, sf)).select(
            "doc_id", F.col("n_tokens").cast("long").alias("n_tokens"))

    def quality(spark, sf):
        from pysearchlite_spark.functions.text import quality_stats
        return quality_stats(_docs(spark, sf))

    def langid(spark, sf):
        from pysearchlite_spark.functions.text import lang_id
        return lang_id(_docs(spark, sf))

    def fingerprint(spark, sf):
        from pysearchlite_spark.functions.text import doc_fingerprint
        return doc_fingerprint(_docs(spark, sf))

    def exact_dup(spark, sf):
        from pysearchlite_spark.operators.dedup import exact_dedup
        return exact_dedup(_docs(spark, sf))

    def jaccard_pairs(spark, sf):
        from pysearchlite_spark.operators.dedup import token_jaccard_pairs
        return token_jaccard_pairs(_docs(spark, sf), threshold=0.8,
                                   max_df=10**9)

    def minhash_pairs(spark, sf):
        from pysearchlite_spark.operators.dedup import minhash_lsh_pairs
        return minhash_lsh_pairs(_docs(spark, sf), threshold=0.5)

    def simhash_sigs(spark, sf):
        from pysearchlite_spark.operators.dedup import simhash_signatures
        return simhash_signatures(_docs(spark, sf))

    def ann_cosine(spark, sf):
        from pysearchlite_spark.operators.ann import brute_cosine_topk
        emb = _emb(spark, sf)
        qv = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
        return brute_cosine_topk(emb.filter(F.col("vec_id") != 0),
                                 list(qv[0][0]), k=10)

    def ann_lsh(spark, sf):
        from pysearchlite_spark.operators.ann import lsh_cosine_topk
        emb = _emb(spark, sf)
        qv = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
        return lsh_cosine_topk(emb.filter(F.col("vec_id") != 0),
                               list(qv[0][0]), k=10)

    def events_hourly(spark, sf):
        ev = spark.read.parquet(f"{sf}/events.parquet")
        return (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
                .agg(F.count("*").alias("cnt"),
                     F.round(F.sum("value"), 4).alias("sum_value"))
                .select(F.unix_timestamp(F.col("w.start")).alias("hour_start"),
                        "event_type", "cnt", "sum_value"))

    return {
        "search_and": search_and,
        "search_or": search_or,
        "count_and": count_and,
        "term_df": term_df,
        "bm25_topk": bm25_topk,
        "doc_len": doc_len,
        "token_count": token_count,
        "quality_stats": quality,
        "lang_id": langid,
        "doc_fingerprint": fingerprint,
        "exact_dedup": exact_dup,
        "token_jaccard_pairs": jaccard_pairs,
        "minhash_lsh_pairs": minhash_pairs,
        "simhash_signatures": simhash_sigs,
        "ann_cosine_topk": ann_cosine,
        "ann_lsh_topk": ann_lsh,
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

    bm25 = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
), dl AS (
  SELECT d.doc_id, count(t.term) AS dl
  FROM documents d LEFT JOIN tok t USING (doc_id) GROUP BY d.doc_id
), stats AS (
  SELECT count(*) AS n, avg(dl) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ({bm_in}) GROUP BY doc_id, term
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
"""

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

    return {
        "search_and": f"SELECT doc_id FROM documents WHERE {and_pred} "
                      f"ORDER BY doc_id",
        "search_or": f"SELECT doc_id FROM documents WHERE {or_pred} "
                     f"ORDER BY doc_id",
        "count_and": "SELECT count(*)::BIGINT AS cnt FROM documents WHERE "
                     + " AND ".join(f"list_contains({_TOK}, '{t}')"
                                    for t in bm_terms),
        "term_df": f"""
            SELECT term, count(DISTINCT doc_id)::BIGINT AS df
            FROM (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
            WHERE term IN ({df_in}) GROUP BY term""",
        "bm25_topk": bm25,
        "doc_len": f"SELECT doc_id, len({_TOK})::BIGINT AS doc_len "
                   f"FROM documents ORDER BY doc_id",
        "token_count": f"SELECT doc_id, len({_TOK})::BIGINT AS n_tokens "
                       f"FROM documents",
        "quality_stats": f"""
            WITH t AS (SELECT doc_id, length(text)::BIGINT AS n_chars,
                              {_TOK} AS ts FROM documents)
            SELECT doc_id, n_chars, len(ts)::BIGINT AS n_tokens,
                   round(CASE WHEN len(ts) > 0 THEN
                         len(list_distinct(ts))::DOUBLE / len(ts)
                         ELSE 0.0 END, 6) AS distinct_ratio,
                   round(CASE WHEN len(ts) > 0 THEN
                         list_sum(list_transform(ts, x -> length(x)))::DOUBLE
                           / len(ts)
                         ELSE 0.0 END, 6) AS avg_token_len
            FROM t""",
        "lang_id": langid,
        "exact_dedup": """
            SELECT doc_id,
                   min(doc_id) OVER (PARTITION BY text) AS keep_id,
                   doc_id <> min(doc_id) OVER (PARTITION BY text) AS is_dup
            FROM documents""",
        "token_jaccard_pairs": jaccard,
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
