from sparkml_spark.streaming import ops  # noqa: F401
