"""Driver-contract shape checks on __spark_entry__ itself."""

from __future__ import annotations

import inspect

import __spark_entry__ as entrymod


def test_oracle_keys_subset_of_queries():
    q, o = entrymod.queries(), entrymod.oracle_sql()
    missing = set(o) - set(q)
    assert not missing, f"oracle entries without queries: {missing}"


def test_query_callables_arity():
    for name, fn in entrymod.queries().items():
        params = inspect.signature(fn).parameters
        assert len(params) == 2, f"{name} must take (spark, sf_dir)"


def test_oracle_sql_mentions_known_views():
    views = {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    # Queries whose data is generated in-query (custom connectors) rather
    # than read from a fixture table; their oracle uses table functions.
    generator_backed = {"scan_python_datasource"}
    for name, sql in entrymod.oracle_sql().items():
        if name in generator_backed:
            continue
        tokens = sql.lower()
        assert any(v in tokens for v in views), f"{name}: oracle references no fixture view"


def test_entry_returns_dataframe(spark):
    df = entrymod.entry(spark)
    assert df.columns and len(df.collect()) > 0
