"""Mirror of the driver's t2 gate: every ORACLE-tier query runs through
BOTH engines at sf0.001 and must agree row-for-row (sorted columns,
sorted rows, exact-or-last-ulp floats)."""

from __future__ import annotations

import pytest

import sparkml_spark.operators  # noqa: F401
from sparkml_spark.registry import ORACLES, QUERIES

from .conftest import SF_DIR, assert_df_equal


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    rel = duck.execute(ORACLES[name])
    assert_df_equal(sdf, rel)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_tier_runs(name, spark):
    """ROWS-tier ops must at least execute and return a stable schema —
    and that schema must be scalar-only: the driver pandas-canonicalizes
    ROWS-tier output too, and its factorize dies on ndarray cells
    (CORRECTNESS_r05 agg_collect_sorted_array). Together with
    test_entry_contract's ORACLE-tier guard this covers ALL queries."""
    sdf = QUERIES[name](spark, SF_DIR)
    assert sdf.columns, f"{name}: no columns"
    nested = [
        f.name
        for f in sdf.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]
    assert not nested, (
        f"{name}: canonicalizer-unsafe nested result columns {nested} — "
        f"serialize (array_join / to_json) inside the query"
    )
    assert sdf.count() >= 0
