"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark query and the matching oracle SQL over the same parquet
tables, then compares row count, column names, and order-insensitive
values (sorted by all columns, floats to 9 significant digits — the
queries themselves round to 6dp, so this tolerance only matters for
unrounded passthrough columns).
"""

from __future__ import annotations

import math
import os
from datetime import datetime

import duckdb

from eventstreamml_spark.sources.testdata import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    conn = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            conn.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return conn


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        if v == 0:
            # The driver's value hasher distinguishes -0.0 from 0.0 (it
            # hashes the raw bit pattern via pandas); Python's == does not
            # (-0.0 == 0.0), so negative zero must map to a DISTINCT token
            # or a signed-zero mismatch passes silently (round-7 red row:
            # theil_sen_trend_by_subject).
            return "-0.0" if math.copysign(1.0, v) < 0 else 0.0
        return float(f"{v:.9g}")
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(normed, key=repr)


def compare(spark, sf_dir: str, spark_fn, sql: str) -> None:
    sdf = spark_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    conn = duckdb_conn(sf_dir)
    res = conn.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    conn.close()

    assert len(s_rows) == len(d_rows), f"row count: spark={len(s_rows)} duckdb={len(d_rows)}"
    sc, sr = _norm_rows(s_cols, s_rows)
    dc, dr = _norm_rows(d_cols, d_rows)
    assert sc == dc, f"columns: spark={sc} duckdb={dc}"
    n_bad = sum(1 for a, b in zip(sr, dr) if a != b)
    if n_bad:
        examples = [(a, b) for a, b in zip(sr, dr) if a != b][:5]
        raise AssertionError(f"{n_bad}/{len(sr)} rows differ; first: {examples}")
