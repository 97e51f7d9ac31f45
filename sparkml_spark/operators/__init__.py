"""Operator modules. Importing this package registers every query in
`sparkml_spark.registry` (each module's import has that side effect)."""

from sparkml_spark.operators import (  # noqa: F401
    aggregates,
    funnels,
    graph,
    joins,
    llm_dedup,
    llm_pipeline,
    llm_similarity,
    llm_text,
    ml,
    multimodal,
    relational,
    reshape,
    scale,
    subqueries,
    timeseries,
    tpch_corpus,
    tpch_partsupp,
    tpch_shapes,
    udfs,
    windows,
)
from sparkml_spark import functions as _functions  # noqa: F401
from sparkml_spark import streaming as _streaming  # noqa: F401
from sparkml_spark.sources import formats as _formats  # noqa: F401
