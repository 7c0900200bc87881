"""pysearchlite_spark — a from-scratch PySpark-native inverted-index + BM25
search engine with the query semantics of stn/pysearchlite.

NOT a port: the reference (/root/reference, pure-Python single-process SPIMI
engine) defines WHAT is computed — tokenization (`tokenize.py:3-7`),
doc-presence postings (`inverted_index_skip_list.py:48-57`), boolean-AND
leapfrog intersection (`inverted_index_skip_list.py:207-250`) — while this
package re-expresses it as Spark DataFrame plans + vectorized Arrow UDFs,
and extends it with BM25 top-k ranking, OR queries, delta+varbyte compressed
segment storage, segment compaction, skew-aware build, dedup / similarity /
text-analysis operators for training-data pipelines.
"""

__version__ = "0.1.0"

from pysearchlite_spark.tokenizer import normalized_tokens  # noqa: F401
