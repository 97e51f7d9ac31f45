from sparkml_spark.functions import scalar  # noqa: F401
