"""Readers for the driver-generated test parquet tables (SURVEY §2.1 S7).

TPC-H-ish star schema + an ``events`` stream table + ``documents`` /
``embeddings`` for the LLM-pipeline operators (TESTDATA.md).

Timestamp handling: some driver parquet files store INT64
TIMESTAMP(NANOS), which vanilla Spark rejects. We read with
``spark.sql.legacy.parquet.nanosAsLong=true`` (set at session runtime —
the driver owns the session) and convert nanos→microsecond timestamps
with floor division, which is exactly DuckDB's TIMESTAMP_NS→TIMESTAMP
conversion, so oracle comparisons see identical values. Detection of
which columns are nano-stamped is done from the parquet footer via
pyarrow (cheap, driver-side, no data read).
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession, functions as F

from eventstreamml_spark.session import apply_runtime_confs

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@lru_cache(maxsize=256)
def _nano_ts_columns(path: str) -> tuple[str, ...]:
    """Column names stored as timestamp[ns] in the parquet footer."""
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    schema = pq.read_schema(path)
    return tuple(
        f.name for f in schema if pat.is_timestamp(f.type) and f.type.unit == "ns"
    )


#: (abs path, mtime) -> Spark schema from the FIRST load's inference.
#: Passing the schema back on later loads skips the per-query JVM
#: footer-inference step — pure metadata reuse (never rows, never
#: results; the mtime key re-infers if the driver regenerates a file).
#: Measurable because the bench constructs each query's plan fresh per
#: rep: ~500 queries × reps × tables of repeated schema inference is a
#: driver-side fixed cost on every mid-tail query (guide §1.2 step 2).
_SCHEMA_CACHE: dict[tuple[str, float], object] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table, normalizing nano timestamps to timestamp_ntz.

    All timestamp columns come out as TIMESTAMP_NTZ (naive wall clock),
    matching DuckDB's view of the same files.
    """
    apply_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = (os.path.abspath(path), os.path.getmtime(path))
    cached = _SCHEMA_CACHE.get(key)
    if cached is not None:
        df = spark.read.schema(cached).parquet(path)
    else:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
    for c in _nano_ts_columns(path):
        # nanos since epoch (long) → micros → naive timestamp. Integer
        # DIV, not float division: int64 nanos exceed double's 2^53
        # mantissa and would round the microsecond.
        df = df.withColumn(
            c,
            F.timestamp_micros(F.expr(f"`{c}` div 1000")).cast("timestamp_ntz"),
        )
    return df


@lru_cache(maxsize=256)
def _scan_splits(path: str) -> tuple[int, int]:
    """(row groups, compressed bytes) of one parquet file: parquet only
    splits at row-group boundaries, so a single-row-group file yields
    ONE non-empty scan partition no matter how Spark slices the byte
    range — every downstream per-row projection pipelined into that
    stage then runs on one core (guide §2.5: unsplittable input)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    nbytes = sum(md.row_group(i).total_byte_size for i in range(md.num_row_groups))
    return max(1, md.num_row_groups), nbytes


#: ``load_table_spread`` only repartitions inputs below this many
#: serialized bytes: row-group COUNT does not bound data size (a file
#: with 8 multi-GB row groups still reads "few splits"), and the whole
#: premise of the round-robin spread is that the input is small enough
#: that shuffling it is trivially cheap. Above the bound the scan's own
#: parallelism — however coarse — beats a full shuffle of the payload.
SPREAD_MAX_BYTES = 1 << 30


def load_table_spread(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table, spreading an unsplittable scan across the
    cluster when (and only when) the parquet footer says the scan
    cannot parallelize on its own.

    Use for CPU-dense per-row pipelines (embedding folds, hashing,
    DCT) whose work Catalyst pipelines into the scan stage: a
    single-row-group input otherwise pins the whole projection on one
    core. SCALE-ADAPTIVE by construction — the decision reads the
    footer, so production inputs with many row groups (or any input
    already splitting at least as wide as the session's parallelism)
    pass through untouched with no extra exchange; the round-robin
    repartition only ever fires on inputs small enough that shuffling
    them is trivially cheap. Results must not (and per the engine's
    partitioning-agnostic discipline do not) depend on partitioning."""
    df = load_table(spark, sf_dir, name)
    p = spark.sparkContext.defaultParallelism
    path = os.path.join(sf_dir, f"{name}.parquet")
    splits, nbytes = _scan_splits(path)
    if splits < p and nbytes <= SPREAD_MAX_BYTES:
        return df.repartition(p)
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view for spark.sql queries."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
