"""Bench-scale (sf0.1) replica of the driver's oracle comparison.

The default sweep (test_oracle_parity.py) runs at sf0.01, the driver's
own scale — but sf0.01 can agree by COINCIDENCE where the engines
genuinely diverge: the round-5 KS query binned with round() on the
Spark side and floor() in the oracle, attained the same sup at sf0.01,
and only split at sf0.1 (0.004487 vs 0.004469). This sweep runs every
oracle-checked query at sf0.1 to close that class.

Gated behind ``SPARK_GRAFT_FULL_PARITY=1`` (adds ~10-15 min): run it
before every driver-window rotation and after any change to a query's
binning/rounding/hashing arithmetic.
"""

from __future__ import annotations

import os

import pytest

from eventstreamml_spark import queries as q
from tests.oracle import compare

SF_BENCH = os.path.join(
    os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.1"
)

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FULL_PARITY"),
    reason="set SPARK_GRAFT_FULL_PARITY=1 for the bench-scale sweep",
)

CASES = sorted(q.oracle_sql().keys())


@pytest.mark.parametrize("name", CASES)
def test_query_matches_oracle_at_bench_scale(spark, name):
    compare(spark, SF_BENCH, q.queries()[name], q.oracle_sql()[name])
