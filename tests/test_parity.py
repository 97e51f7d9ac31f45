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
    """ROWS-tier ops must at least execute and return a stable schema."""
    sdf = QUERIES[name](spark, SF_DIR)
    assert sdf.columns, f"{name}: no columns"
    assert sdf.count() >= 0
