"""Operator modules. Importing this package registers every query in
`sparkml_spark.registry` (each module's import has that side effect)."""

from sparkml_spark.operators import aggregates, joins, relational, windows  # noqa: F401
from sparkml_spark import functions as _functions  # noqa: F401
