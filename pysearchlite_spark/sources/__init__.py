from pysearchlite_spark.sources.catalog import IndexCatalog  # noqa: F401
