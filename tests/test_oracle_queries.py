"""Oracle-differential tests: every declared query vs its DuckDB SQL.

Mirrors the driver's t2 gate (row count + schema + order-insensitive
value hash) at a small scale factor so the full suite stays fast.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE
from tests.oracle_harness import assert_match

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_match(spark, name):
    df = _QUERIES[name](spark, SF_ORACLE)
    assert_match(df, _ORACLES[name], SF_ORACLE, name)


def test_every_query_runs(spark):
    """Queries without oracles must still execute and have a stable schema."""
    for name, fn in _QUERIES.items():
        df = fn(spark, SF_ORACLE)
        assert df.columns, name
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
