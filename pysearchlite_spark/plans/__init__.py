from pysearchlite_spark.plans.builder import build_index, BuildResult  # noqa: F401
