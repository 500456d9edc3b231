"""Data-layout functions: multi-dimensional clustering keys.

Engine extension (no reference analog — the reference is single-node
pandas with no storage layout concerns). At 100 TB, scan pruning on
TWO correlated predicates (e.g. order key ranges × part key ranges)
needs rows physically clustered in both dimensions at once; sorting by
a Z-order (Morton) interleave of the keys gives every file a tight
min/max envelope in BOTH columns, so parquet row-group statistics
prune either predicate — the technique behind Delta/Iceberg Z-ordered
OPTIMIZE, here as a plain expression usable with
``repartitionByRange(zval).sortWithinPartitions(zval)`` before any
parquet write.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton/Z-order interleave of the low ``bits`` of two
    non-negative integer columns: bit i of x lands at position 2i, bit
    i of y at 2i+1. Pure integer bit arithmetic (codegen'd, portable to
    any engine with shifts), monotone in each input's quantile rank
    when inputs are pre-bucketed. Callers bucket/clamp inputs to
    ``bits`` beforehand (e.g. ``F.pmod(k, 1 << bits)`` or a rank)."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    xl = x.cast("long")
    yl = y.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xl, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(yl, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z
