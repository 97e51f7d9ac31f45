from sparkml_spark.functions import scalar, subword  # noqa: F401
