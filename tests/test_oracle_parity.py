"""Every registered query hash-matches its DuckDB oracle at sf0.01 —
the local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from eventstreamml_spark import queries as q
from tests.conftest import SF_ORACLE
from tests.oracle import compare

CASES = sorted(q.oracle_sql().keys())


@pytest.mark.parametrize("name", CASES)
def test_query_matches_oracle(spark, name):
    fn = q.queries()[name]
    sql = q.oracle_sql()[name]
    compare(spark, SF_ORACLE, fn, sql)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.columns
