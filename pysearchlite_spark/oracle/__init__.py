from pysearchlite_spark.oracle.engine import OracleEngine, bm25_idf  # noqa: F401
