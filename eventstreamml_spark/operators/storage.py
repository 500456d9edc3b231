"""Storage-layout operators: bucketed tables for co-located joins and
partitioned layouts for scan pruning.

At 100 TB the dominant costs are the shuffle a repeated fact-to-fact
join pays and the bytes a full scan reads; both are LAYOUT decisions
made at write time. These helpers make the two canonical layouts
first-class engine operations, and the companion plan tests pin the
payoff (no Exchange above bucketed scans; PartitionFilters reaching the
parquet scan). Declared-new per SURVEY §2.8b.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str,
) -> None:
    """Persist ``df`` as an external bucketed+sorted table: rows are
    hash-distributed into ``n_buckets`` files by ``key`` and sorted
    within each, so ANY later equi-join or aggregation on ``key``
    between tables sharing the layout runs with ZERO exchange — the
    shuffle is paid once at write time and amortized over every read.
    (``saveAsTable`` is required: bucketing metadata lives in the
    catalog, a bare ``parquet(path)`` write silently drops it.)"""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .saveAsTable(table)
    )


def bucketed_pair(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    key: str,
    cache_tag: str,
    n_buckets: int = 8,
    src_paths: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    """Materialize two relations as same-bucketed tables (content
    cached under a tag-keyed temp path, table re-registered per
    session) and return them as catalog-backed DataFrames ready for a
    co-located join. The cache key includes the tag, the layout, a
    source-freshness fingerprint (mtime of each ``src_paths`` entry —
    data changing under the tag yields a NEW table, never a stale
    reuse), and the Spark application id (two concurrent sessions get
    disjoint paths instead of racing ``mode("overwrite")`` on a shared
    one — bucketing metadata lives in the per-session catalog, so the
    path was never shareable across sessions anyway)."""
    missing = [p for p in src_paths if not os.path.exists(p)]
    if missing:
        # silently skipping a typo'd path would freeze the fingerprint
        # and quietly revive the stale-reuse bug this parameter fixes
        raise FileNotFoundError(f"bucketed_pair src_paths not found: {missing}")
    # full mtime precision: a same-second rewrite must still miss the cache
    fp = ":".join(f"{p}@{os.path.getmtime(p)!r}" for p in src_paths)
    app = spark.sparkContext.applicationId
    key_hash = hashlib.md5(
        f"{cache_tag}:{key}:{n_buckets}:{fp}:{app}".encode()
    ).hexdigest()[:12]
    base = os.path.join(tempfile.gettempdir(), f"esml_bucketed_{key_hash}")
    names = (f"esml_b_{key_hash}_l", f"esml_b_{key_hash}_r")
    for name, df, sub in ((names[0], left, "l"), (names[1], right, "r")):
        if not spark.catalog.tableExists(name):
            write_bucketed(df, name, key, n_buckets, os.path.join(base, sub))
    return spark.table(names[0]), spark.table(names[1])


def partitioned_copy(
    df: DataFrame, src_path: str, partition_col: str = "event_type"
) -> str:
    """Hive-partitioned copy of a table (caller passes the frame loaded
    through the engine's ts-unit-sniffing reader; cached per source,
    built into a fresh dir renamed into place so concurrent readers
    never see a half-written layout — same protocol as the
    schema-evolution fixture). A filter on the partition column then
    prunes entire directories at planning time: the scan reads
    1/|partitions| of the bytes, which at 100 TB is the difference
    between a query and an outage."""
    src = src_path
    key = hashlib.md5(
        (os.path.abspath(src_path) + ":" + partition_col).encode()
    ).hexdigest()[:12]
    dst = os.path.join(tempfile.gettempdir(), f"esml_events_part_{key}")
    marker = os.path.join(dst, "_done")

    def _fresh(path: str) -> bool:
        return os.path.exists(path) and os.path.getmtime(path) >= os.path.getmtime(
            src
        )

    if not _fresh(marker):
        build = tempfile.mkdtemp(prefix=f"esml_events_part_{key}_")
        out = os.path.join(build, "data")
        df.write.mode("overwrite").partitionBy(partition_col).parquet(out)
        with open(os.path.join(build, "_done"), "w") as fh:
            fh.write("ok")
        old = None
        if os.path.exists(dst):
            old = dst + "." + os.path.basename(build)
            os.rename(dst, old)
        try:
            os.rename(build, dst)
        except OSError:
            pass  # lost the race; the winner's layout is complete
    return os.path.join(dst, "data")
