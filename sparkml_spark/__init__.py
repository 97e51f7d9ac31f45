"""sparkml_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first implementation of the query and
data-processing capabilities of the johnniev5/SparkML reference
(checkout empty — see SURVEY.md §0; capability surface reconstructed
from the public PySpark 4.x API per SURVEY.md §2).

Architecture: everything is declared through the DataFrame/SQL API so
Catalyst owns optimization (pushdown, pruning, join selection, AQE) and
Tungsten owns execution (vectorized parquet scan, whole-stage codegen).
Custom operators (as-of join, MinHash dedup, ANN search, sessionize) are
compositions of built-in operators; Python touches data only behind the
explicitly-marked Arrow/Pandas-UDF escape hatches in `udfs.py`.
"""

from sparkml_spark.session import get_spark  # noqa: F401
from sparkml_spark.registry import QUERIES, ORACLES, query  # noqa: F401

__version__ = "0.1.0"
