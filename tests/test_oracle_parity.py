"""The local mirror of the driver's t2 correctness gate: every registered
query with an oracle twin must match DuckDB exactly at sf0.001 (fast) —
the driver runs the same comparison at sf0.01."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare
from tf_datapipeline_spark import registry


def _pairs():
    q = registry.queries()
    o = registry.oracle_sql()
    return [(name, q[name], o[name]) for name in sorted(o)]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_oracle_parity(spark, name, fn, sql):
    compare(fn(spark, SF_SMOKE), sql, SF_SMOKE, name=name)


def test_every_query_runs(spark):
    """Rows-only queries (no oracle) must still execute and return a schema."""
    q = registry.queries()
    o = registry.oracle_sql()
    for name in sorted(set(q) - set(o)):
        df = q[name](spark, SF_SMOKE)
        assert df.columns, name
        df.limit(5).collect()


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
