"""Round-12 staging: operators built in round 11 AFTER the window
rotation, deliberately NOT registered.

The round-11 driver window (queries.py ``_ORDER_FIRST``) was rotated at
bc9c00e with the pledge that nothing registers after it, keeping the
driver-row ledger debt-free once CORRECTNESS_r11 lands green. These
operators are therefore staged here — fully implemented, oracle-paired
and unit-fixture-tested (tests/test_staging_r12.py) — but invisible to
``queries()`` / ``oracle_sql()`` / bench.py until round 12 wires
``STAGED`` into the registry, folds the names into
``registry_order.REGISTRATION_ORDER``, adds the SURVEY §2.8b/§2.8c
rows, and rotates the window once.

Every entry follows the repo's oracle-portability rules (CLAUDE.md):
identical column names and rounding on both engines, exact-integer
intermediates on micro-unit grids with int128 widening where per-row
products can outgrow BIGINT, ``nullif`` on every degenerate
denominator, ``+ 0.0`` on every rounded output that can be a tiny
negative, and md5-free / HUGEINT-free / DECIMAL-free output schemas.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from eventstreamml_spark.sources.testdata import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

STAGED: dict[str, tuple[QueryFn, str | None]] = {}


def stage(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        STAGED[name] = (fn, oracle)
        return fn

    return deco


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# Batch A — nonparametric / two-sample / changepoint statistics
# ---------------------------------------------------------------------------
# Shared value-histogram relation: the user-parity arms' event values on
# the 1e-3 micro grid (the cucconi/lepage relation, rebuilt here so the
# staging module stays import-independent of queries.py internals).

_ARMS_HIST_SQL = """
    v AS (
      SELECT user_id % 2 AS arm,
             CAST(floor(value * 1000) AS BIGINT) AS vm
      FROM events WHERE value IS NOT NULL
    ),
    hist AS (
      SELECT vm,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS c1,
             CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS c0
      FROM v GROUP BY 1
    )
"""


def _arm_value_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = (
        _events(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .selectExpr(
            "user_id % 2 AS arm",
            "CAST(floor(value * 1000) AS BIGINT) AS vm",
        )
    )
    return v.groupBy("vm").agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("c0"),
    )


@stage(
    "wald_wolfowitz_runs_two_sample",
    f"""
    WITH {_ARMS_HIST_SQL},
    seg AS (
      SELECT vm, c1, c0,
             CASE WHEN c1 > 0 AND c0 > 0 THEN 2 ELSE 1 END AS internal,
             CASE WHEN c0 > 0 THEN 0 ELSE 1 END AS first_arm,
             CASE WHEN c1 > 0 THEN 1 ELSE 0 END AS last_arm
      FROM hist
    ),
    m AS (
      SELECT internal, c1, c0,
             CASE WHEN first_arm = lag(last_arm) OVER (ORDER BY vm)
                  THEN 1 ELSE 0 END AS mrg
      FROM seg
    ),
    runs AS (
      SELECT CAST(sum(internal) AS BIGINT)
               - CAST(coalesce(sum(mrg), 0) AS BIGINT) AS r,
             CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c0) AS BIGINT) AS n0
      FROM m
    )
    SELECT n0, n1, r AS n_runs,
           round((CAST(r AS DOUBLE) - (2.0 * n1 * n0
                    / nullif(CAST(n1 + n0 AS DOUBLE), 0) + 1.0))
                 / nullif(sqrt(2.0 * n1 * n0 * (2.0 * n1 * n0 - n1 - n0)
                   / nullif(CAST(n1 + n0 AS DOUBLE) * (n1 + n0)
                            * (n1 + n0 - 1), 0)), 0), 6) + 0.0 AS ww_z
    FROM runs
    """,
)
def q_wald_wolfowitz_runs_two_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Wald-Wolfowitz two-sample runs test between the user-parity
    arms: pool both arms' micro-gridded values, order them, and count
    maximal same-arm runs, with the cross-arm tie convention pinned to
    "arm 0 before arm 1 inside a tied value" on BOTH engines (runs are
    ill-defined under ties without such a pin). The run count comes
    from the value histogram alone — each histogram group contributes
    2 runs when both arms are present else 1, minus one merge whenever
    a group's first arm equals the previous group's last arm — so the
    whole test is one histogram shuffle plus one bounded window pass,
    never a pooled sort of raw rows. z uses the exact run-count mean
    2*n1*n0/N + 1 and variance formula; single-arm degenerate inputs
    NULL out via nullif. Scale: the histogram is bounded by the value
    grid, and the lag window runs on that bounded relation.
    """
    hist = _arm_value_hist(spark, sf_dir)
    seg = hist.selectExpr(
        "vm",
        "c1",
        "c0",
        "CASE WHEN c1 > 0 AND c0 > 0 THEN 2 ELSE 1 END AS internal",
        "CASE WHEN c0 > 0 THEN 0 ELSE 1 END AS first_arm",
        "CASE WHEN c1 > 0 THEN 1 ELSE 0 END AS last_arm",
    )
    wlag = W.orderBy("vm")
    seg = seg.withColumn(
        "merge",
        F.when(
            F.col("first_arm") == F.lag("last_arm").over(wlag), 1
        ).otherwise(0),
    )
    runs = seg.agg(
        (
            F.sum("internal").cast("long")
            - F.coalesce(F.sum("merge"), F.lit(0)).cast("long")
        ).alias("r"),
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c0").cast("long").alias("n0"),
    )
    return runs.selectExpr(
        "n0",
        "n1",
        "r AS n_runs",
        "round((CAST(r AS DOUBLE) - (2.0 * n1 * n0"
        " / nullif(CAST(n1 + n0 AS DOUBLE), 0) + 1.0))"
        " / nullif(sqrt(2.0 * n1 * n0 * (2.0 * n1 * n0 - n1 - n0)"
        " / nullif(CAST(n1 + n0 AS DOUBLE) * (n1 + n0)"
        " * (n1 + n0 - 1), 0)), 0), 6) + 0.0 AS ww_z",
    )


_HOURLY_SQL = """
    hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    )
"""


def _hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("h"))
        .agg(F.count("*").cast("long").alias("y"))
    )


@stage(
    "buishand_range_hourly",
    f"""
    WITH {_HOURLY_SQL},
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS s,
             CAST(sum(y * y) AS BIGINT) AS ss
      FROM hourly
    ),
    cum AS (
      SELECT CAST(sum(y) OVER (ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS sk,
             CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS k
      FROM hourly
    ),
    ext AS (
      SELECT CAST(max(n * sk - k * s) AS BIGINT) AS smax,
             CAST(min(n * sk - k * s) AS BIGINT) AS smin,
             any_value(n) AS n, any_value(s) AS s, any_value(ss) AS ss
      FROM cum CROSS JOIN tot
    )
    SELECT n AS n_hours,
           round((CAST(smax AS DOUBLE) - smin) / nullif(
             CAST(n AS DOUBLE) * sqrt(nullif(
               (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n, 0))
             * sqrt(CAST(n AS DOUBLE)), 0), 6) + 0.0
             AS buishand_r_rescaled
    FROM ext
    """,
)
def q_buishand_range_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Buishand range homogeneity test on the hourly event-count
    series: R/(s*sqrt(n)) where R = max_k S_k - min_k S_k over the
    cumulative deviations S_k = sum_{i<=k}(y_i - mean). The deviations
    are kept EXACT by working n-scaled — n*S_k = n*cumsum_k - k*total
    is a pure BIGINT (magnitude <= n_hours * N_events, ~1e12 at 1e8
    events / 1e4 hours, far inside int64) — and only the final
    standardization divides doubles, with identical expression text on
    both engines. Population variance (ddof=0, the Buishand
    convention) from exact sum/sumsq; a constant series NULLs via
    nullif. One hourly groupBy shuffle + one bounded window pass.
    """
    hourly = _hourly_counts(spark, sf_dir)
    tot = hourly.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("ss"),
    )
    wcum = W.orderBy("h").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = hourly.select(
        F.sum("y").over(wcum).cast("long").alias("sk"),
        F.row_number().over(W.orderBy("h")).cast("long").alias("k"),
    )
    ext = cum.crossJoin(F.broadcast(tot)).agg(
        F.max(F.col("n") * F.col("sk") - F.col("k") * F.col("s"))
        .cast("long")
        .alias("smax"),
        F.min(F.col("n") * F.col("sk") - F.col("k") * F.col("s"))
        .cast("long")
        .alias("smin"),
        F.first("n").alias("n"),
        F.first("s").alias("s"),
        F.first("ss").alias("ss"),
    )
    return ext.selectExpr(
        "n AS n_hours",
        "round((CAST(smax AS DOUBLE) - smin) / nullif("
        "CAST(n AS DOUBLE) * sqrt(nullif("
        "(CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n, 0))"
        " * sqrt(CAST(n AS DOUBLE)), 0), 6) + 0.0"
        " AS buishand_r_rescaled",
    )


@stage(
    "tukey_fences_outlier_rate_by_type",
    """
    WITH v AS (
      SELECT event_type,
             CAST(floor(value * 1000) AS BIGINT) AS vm
      FROM events WHERE value IS NOT NULL
    ),
    rk AS (
      SELECT event_type, vm,
             row_number() OVER (PARTITION BY event_type ORDER BY vm)
               AS r,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM v
    ),
    hinges AS (
      SELECT event_type, any_value(n) AS n,
             CAST(sum((CASE WHEN r = (((n + 1) // 2) + 1) // 2
                       THEN vm ELSE 0 END)
                  + (CASE WHEN r = (((n + 1) // 2) + 2) // 2
                       THEN vm ELSE 0 END))
               AS BIGINT) AS h1d,
             CAST(sum((CASE WHEN r = n + 1 - ((((n + 1) // 2) + 1) // 2)
                       THEN vm ELSE 0 END)
                  + (CASE WHEN r = n + 1 - ((((n + 1) // 2) + 2) // 2)
                       THEN vm ELSE 0 END))
               AS BIGINT) AS h3d
      FROM rk GROUP BY 1
    )
    SELECT v.event_type,
           any_value(h.n) AS n_values,
           round(CAST(any_value(h.h1d) AS DOUBLE) / 2000.0, 6) + 0.0
             AS q1,
           round(CAST(any_value(h.h3d) AS DOUBLE) / 2000.0, 6) + 0.0
             AS q3,
           CAST(sum(CASE WHEN 4 * vm < 5 * h1d - 3 * h3d
                      OR 4 * vm > 5 * h3d - 3 * h1d
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(CAST(sum(CASE WHEN 4 * vm < 5 * h1d - 3 * h3d
                           OR 4 * vm > 5 * h3d - 3 * h1d
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / nullif(CAST(any_value(h.n) AS DOUBLE), 0), 6) + 0.0
             AS outlier_rate
    FROM v JOIN hinges h USING (event_type)
    GROUP BY 1 ORDER BY 1
    """,
)
def q_tukey_fences_outlier_rate_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tukey-fences outlier rate per event type: hinges are the Tukey
    quartiles (medians of the lower/upper halves, median-inclusive for
    odd n — lower-hinge rank (floor((n+1)/2)+1)/2 in integer
    arithmetic), kept exact as DOUBLED micro-grid sums with BOTH
    middle-rank CASE terms ADDED (the doubled-median rule: an
    OR-condition would halve the odd-position hinge). The fence test
    4*vm < 5*h1d - 3*h3d compares 4x-scaled micro values against
    2x-doubled hinges times 2 — i.e. vm < h1 - 1.5*(h3-h1) in pure
    BIGINT, no float fences. Output quartiles divide the doubled sums
    by 2000 (grid x doubling) at 6dp. Per-type ranking partitions by
    event_type, so the sort parallelizes across types; the hinge
    relation is 5 rows and broadcast back onto the value scan.
    """
    v = (
        _events(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .selectExpr(
            "event_type", "CAST(floor(value * 1000) AS BIGINT) AS vm"
        )
    )
    wp = W.partitionBy("event_type").orderBy("vm")
    rk = v.select(
        "event_type",
        "vm",
        F.row_number().over(wp).alias("r"),
        F.count("*").over(W.partitionBy("event_type")).alias("n"),
    )
    hinges = rk.groupBy("event_type").agg(
        F.first("n").alias("n"),
        F.expr(
            "CAST(sum((CASE WHEN r = (((n + 1) div 2) + 1) div 2"
            " THEN vm ELSE 0 END)"
            " + (CASE WHEN r = (((n + 1) div 2) + 2) div 2"
            " THEN vm ELSE 0 END)) AS BIGINT)"
        ).alias("h1d"),
        F.expr(
            "CAST(sum((CASE WHEN r = n + 1 - ((((n + 1) div 2) + 1) div 2)"
            " THEN vm ELSE 0 END)"
            " + (CASE WHEN r = n + 1 - ((((n + 1) div 2) + 2) div 2)"
            " THEN vm ELSE 0 END)) AS BIGINT)"
        ).alias("h3d"),
    )
    joined = v.join(F.broadcast(hinges), "event_type")
    return (
        joined.groupBy("event_type")
        .agg(
            F.first("n").alias("n_values"),
            F.expr(
                "round(CAST(any_value(h1d) AS DOUBLE) / 2000.0, 6)"
                " + 0.0"
            ).alias("q1"),
            F.expr(
                "round(CAST(any_value(h3d) AS DOUBLE) / 2000.0, 6)"
                " + 0.0"
            ).alias("q3"),
            F.expr(
                "CAST(sum(CASE WHEN 4 * vm < 5 * h1d - 3 * h3d"
                " OR 4 * vm > 5 * h3d - 3 * h1d"
                " THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_outliers"),
            F.expr(
                "round(CAST(sum(CASE WHEN 4 * vm < 5 * h1d - 3 * h3d"
                " OR 4 * vm > 5 * h3d - 3 * h1d"
                " THEN 1 ELSE 0 END) AS DOUBLE)"
                " / nullif(CAST(any_value(n) AS DOUBLE), 0), 6) + 0.0"
            ).alias("outlier_rate"),
        )
        .orderBy("event_type")
    )


@stage(
    "stuart_maxwell_first_last_bands",
    """
    WITH vals AS (
      SELECT user_id, ts, event_id,
             CAST(floor(value * 1000) AS BIGINT) AS vm
      FROM events WHERE value IS NOT NULL
    ),
    rk AS (
      SELECT user_id, vm,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS ra,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rd
      FROM vals
    ),
    fl AS (
      SELECT user_id,
             CAST(sum(CASE WHEN ra = 1 THEN vm ELSE 0 END) AS BIGINT)
               AS vf,
             CAST(sum(CASE WHEN rd = 1 THEN vm ELSE 0 END) AS BIGINT)
               AS vl
      FROM rk GROUP BY 1
    ),
    pooled AS (
      SELECT v, row_number() OVER (ORDER BY v) AS rn,
             count(*) OVER () AS nn
      FROM (SELECT vf AS v FROM fl UNION ALL SELECT vl AS v FROM fl)
    ),
    bounds AS (
      SELECT CAST(sum(CASE WHEN rn = (nn + 2) // 3 THEN v ELSE 0 END)
               AS BIGINT) AS b1,
             CAST(sum(CASE WHEN rn = (2 * nn + 2) // 3 THEN v ELSE 0
               END) AS BIGINT) AS b2
      FROM pooled
    ),
    pairs AS (
      SELECT CASE WHEN vf <= b1 THEN 1 WHEN vf <= b2 THEN 2 ELSE 3
               END AS r,
             CASE WHEN vl <= b1 THEN 1 WHEN vl <= b2 THEN 2 ELSE 3
               END AS c
      FROM fl CROSS JOIN bounds
    ),
    cells AS (
      SELECT
        CAST(sum(CASE WHEN r = 1 THEN 1 ELSE 0 END)
           - sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
        CAST(sum(CASE WHEN r = 2 THEN 1 ELSE 0 END)
           - sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
        CAST(sum(CASE WHEN r = 3 THEN 1 ELSE 0 END)
           - sum(CASE WHEN c = 3 THEN 1 ELSE 0 END) AS BIGINT) AS d3,
        CAST(sum(CASE WHEN (r = 1 AND c = 2) OR (r = 2 AND c = 1)
                 THEN 1 ELSE 0 END) AS BIGINT) AS m12,
        CAST(sum(CASE WHEN (r = 1 AND c = 3) OR (r = 3 AND c = 1)
                 THEN 1 ELSE 0 END) AS BIGINT) AS m13,
        CAST(sum(CASE WHEN (r = 2 AND c = 3) OR (r = 3 AND c = 2)
                 THEN 1 ELSE 0 END) AS BIGINT) AS m23,
        CAST(count(*) AS BIGINT) AS n_users
      FROM pairs
    )
    SELECT n_users, d1, d2, d3,
           round(CAST(m23::HUGEINT * d1 * d1 + m13::HUGEINT * d2 * d2
                      + m12::HUGEINT * d3 * d3 AS DOUBLE)
                 / nullif(CAST(m12::HUGEINT * m13 + m12::HUGEINT * m23
                      + m13::HUGEINT * m23 AS DOUBLE), 0), 6) + 0.0
             AS stuart_maxwell_chi2
    FROM cells
    """,
)
def q_stuart_maxwell_first_last_bands(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stuart-Maxwell marginal-homogeneity test on paired per-user
    value bands: each user contributes (band of FIRST event value,
    band of LAST event value) under the pinned (ts, event_id) total
    order, with band boundaries the exact pooled micro-grid order
    stats at ranks (N+2)//3 and (2N+2)//3 — integer comparisons only,
    so the margins are genuinely free (an ntile pairing would force
    equal margins and a vacuously-zero statistic). For k = 3 the test
    has the exact closed form chi2 = (m23*d1^2 + m13*d2^2 + m12*d3^2)
    / (m12*m13 + m12*m23 + m13*m23) on DOUBLED off-diagonal means
    m_ij = n_ij + n_ji and marginal differences d_i — pure integers
    until one final double division (per-row products ~n^3 widened to
    int128 internally). A diagonal table (no movement) NULLs via
    nullif. Two per-user window passes + one bounded pooled sort of
    2 rows/user; the boundary relation is one broadcast row.
    """
    vals = (
        _events(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .selectExpr(
            "user_id",
            "ts",
            "event_id",
            "CAST(floor(value * 1000) AS BIGINT) AS vm",
        )
    )
    wa = W.partitionBy("user_id").orderBy("ts", "event_id")
    wd = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    rk = vals.select(
        "user_id",
        "vm",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wd).alias("rd"),
    )
    fl = rk.groupBy("user_id").agg(
        F.expr(
            "CAST(sum(CASE WHEN ra = 1 THEN vm ELSE 0 END) AS BIGINT)"
        ).alias("vf"),
        F.expr(
            "CAST(sum(CASE WHEN rd = 1 THEN vm ELSE 0 END) AS BIGINT)"
        ).alias("vl"),
    )
    pooled = (
        fl.selectExpr("vf AS v")
        .unionAll(fl.selectExpr("vl AS v"))
        .select(
            "v",
            F.row_number().over(W.orderBy("v")).alias("rn"),
            F.count("*").over(
                W.orderBy(F.lit(1)).rowsBetween(
                    W.unboundedPreceding, W.unboundedFollowing
                )
            ).alias("nn"),
        )
    )
    bounds = pooled.agg(
        F.expr(
            "CAST(sum(CASE WHEN rn = (nn + 2) div 3 THEN v ELSE 0 END)"
            " AS BIGINT)"
        ).alias("b1"),
        F.expr(
            "CAST(sum(CASE WHEN rn = (2 * nn + 2) div 3 THEN v ELSE 0"
            " END) AS BIGINT)"
        ).alias("b2"),
    )
    pairs = fl.crossJoin(F.broadcast(bounds)).selectExpr(
        "CASE WHEN vf <= b1 THEN 1 WHEN vf <= b2 THEN 2 ELSE 3 END AS r",
        "CASE WHEN vl <= b1 THEN 1 WHEN vl <= b2 THEN 2 ELSE 3 END AS c",
    )
    cells = pairs.selectExpr(
        "CAST(r = 1 AS INT) - CAST(c = 1 AS INT) AS t1",
        "CAST(r = 2 AS INT) - CAST(c = 2 AS INT) AS t2",
        "CAST(r = 3 AS INT) - CAST(c = 3 AS INT) AS t3",
        "CAST((r = 1 AND c = 2) OR (r = 2 AND c = 1) AS INT) AS p12",
        "CAST((r = 1 AND c = 3) OR (r = 3 AND c = 1) AS INT) AS p13",
        "CAST((r = 2 AND c = 3) OR (r = 3 AND c = 2) AS INT) AS p23",
    ).agg(
        F.sum("t1").cast("long").alias("d1"),
        F.sum("t2").cast("long").alias("d2"),
        F.sum("t3").cast("long").alias("d3"),
        F.sum("p12").cast("long").alias("m12"),
        F.sum("p13").cast("long").alias("m13"),
        F.sum("p23").cast("long").alias("m23"),
        F.count("*").cast("long").alias("n_users"),
    )
    return cells.selectExpr(
        "n_users",
        "d1",
        "d2",
        "d3",
        "round(CAST(CAST(m23 AS DECIMAL(38,0)) * d1 * d1"
        " + CAST(m13 AS DECIMAL(38,0)) * d2 * d2"
        " + CAST(m12 AS DECIMAL(38,0)) * d3 * d3 AS DOUBLE)"
        " / nullif(CAST(CAST(m12 AS DECIMAL(38,0)) * m13"
        " + CAST(m12 AS DECIMAL(38,0)) * m23"
        " + CAST(m13 AS DECIMAL(38,0)) * m23 AS DOUBLE), 0), 6) + 0.0"
        " AS stuart_maxwell_chi2",
    )


@stage(
    "snht_changepoint_hourly",
    f"""
    WITH {_HOURLY_SQL},
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS s,
             CAST(sum(y * y) AS BIGINT) AS ss
      FROM hourly
    ),
    cum AS (
      SELECT CAST(sum(y) OVER (ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS s1,
             CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS k
      FROM hourly
    ),
    tk AS (
      SELECT k,
             CAST((n::HUGEINT * s1 - k::HUGEINT * s)
                  * (n::HUGEINT * s1 - k::HUGEINT * s) AS DOUBLE)
               * n / (CAST(k AS DOUBLE) * (n - k)
                      * nullif(CAST(n::HUGEINT * ss
                               - s::HUGEINT * s AS DOUBLE), 0)) AS t
      FROM cum CROSS JOIN tot
      WHERE k < n
    ),
    best AS (
      SELECT k, t,
             row_number() OVER (ORDER BY floor(t * 1000000.0) DESC, k)
               AS pos
      FROM tk
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM hourly) AS n_hours,
           k AS k_hat,
           round(t, 6) + 0.0 AS snht_t_max
    FROM best WHERE pos = 1
    """,
)
def q_snht_changepoint_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard Normal Homogeneity Test (Alexandersson) changepoint on
    the hourly count series. Algebra collapses T(k) = k*z1^2 +
    (n-k)*z2^2 to A_k * n / (k*(n-k)*(n*ss - s^2)) with the single
    exact integer numerator A_k = (n*S1_k - k*S)^2 — the second
    segment's deviation is exactly the negation of the first's, so one
    int128-widened square serves both (A_k <= (n_hours*N)^2 ~ 1e22 at
    1e8 events, inside DECIMAL(38,0)). The argmax over k ranks on
    floor(t*1e6) with the k tiebreak — t is one identical double
    expression on both engines, so the quantized ranking is
    bit-stable (the bh_fdr pattern). Constant series NULL out via
    nullif on the variance term and the max row keeps t NULL. One
    hourly shuffle + one bounded window pass; the scalar totals ride a
    broadcast cross join.
    """
    hourly = _hourly_counts(spark, sf_dir)
    tot = hourly.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("ss"),
    )
    wcum = W.orderBy("h").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = hourly.select(
        F.sum("y").over(wcum).cast("long").alias("s1"),
        F.row_number().over(W.orderBy("h")).cast("long").alias("k"),
    )
    tk = (
        cum.crossJoin(F.broadcast(tot))
        .where("k < n")
        .selectExpr(
            "k",
            "CAST((CAST(n AS DECIMAL(38,0)) * s1"
            " - CAST(k AS DECIMAL(38,0)) * s)"
            " * (CAST(n AS DECIMAL(38,0)) * s1"
            " - CAST(k AS DECIMAL(38,0)) * s) AS DOUBLE)"
            " * n / (CAST(k AS DOUBLE) * (n - k)"
            " * nullif(CAST(CAST(n AS DECIMAL(38,0)) * ss"
            " - CAST(s AS DECIMAL(38,0)) * s AS DOUBLE), 0)) AS t",
        )
    )
    best = tk.withColumn(
        "pos",
        F.row_number().over(
            W.orderBy(F.expr("floor(t * 1000000.0)").desc(), F.col("k"))
        ),
    ).where("pos = 1")
    nh = hourly.agg(F.count("*").cast("long").alias("n_hours"))
    return best.crossJoin(F.broadcast(nh)).selectExpr(
        "n_hours", "k AS k_hat", "round(t, 6) + 0.0 AS snht_t_max"
    )


@stage(
    "hodges_lehmann_shift_arms",
    """
    WITH v AS (
      SELECT user_id % 2 AS arm,
             CAST(floor(value * 10) AS BIGINT) AS vc
      FROM events WHERE value IS NOT NULL
    ),
    h1 AS (
      SELECT vc, CAST(count(*) AS BIGINT) AS c FROM v
      WHERE arm = 1 GROUP BY 1
    ),
    h0 AS (
      SELECT vc, CAST(count(*) AS BIGINT) AS c FROM v
      WHERE arm = 0 GROUP BY 1
    ),
    diffs AS (
      SELECT h1.vc - h0.vc AS d,
             sum(h1.c::HUGEINT * h0.c) AS w
      FROM h1 CROSS JOIN h0 GROUP BY 1
    ),
    cum AS (
      SELECT d, w,
             coalesce(sum(w) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0::HUGEINT) AS cb,
             sum(w) OVER () AS wt
      FROM diffs
    ),
    dm AS (
      SELECT CAST(sum((CASE WHEN wt >= 2 * cb + 1
                        AND wt <= 2 * cb + 2 * w
                       THEN d ELSE 0 END)
                  + (CASE WHEN wt >= 2 * cb
                        AND wt <= 2 * cb + 2 * w - 1
                       THEN d ELSE 0 END)) AS BIGINT) AS d2,
             CAST(any_value(wt) AS DOUBLE) AS n_pairs
      FROM cum
    )
    SELECT n_pairs + 0.0 AS n_pairs,
           round(CAST(d2 AS DOUBLE) / 20.0, 6) + 0.0 AS hl_shift
    FROM dm
    """,
)
def q_hodges_lehmann_shift_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann location-shift estimator between the user-parity
    arms: the median of all n1*n0 pairwise differences X_i - Y_j,
    computed WITHOUT materializing pairs of rows — both arms collapse
    to DECI-grid value histograms (distinct values bounded by the
    value span x 10, not the row count: ~3k at sf0.1 where a centi
    grid's 17k distinct values made the pair join 2.9e8 wide and 4x
    slower), their cross join enumerates only distinct-value pairs
    with weight c1*c0, and the weighted doubled median walks the
    cumulative pair mass with both middle-rank terms ADDED. The rank
    conditions use the multiply-only forms (W >= 2cb+1, W <= 2cb+2w
    for rank (W+1)//2) so the int128 pair mass W = n1*n0 (~2.5e23 at
    the design point) never meets a division — Spark's div would
    overflow its BIGINT result; n_pairs is emitted as DOUBLE for the
    same reason. The output divides the doubled deci-grid sum by 20.
    The grid IS the scale knob: a wider value span coarsens the
    estimate, never the cost model — pairs stay O(grid^2).
    """
    v = (
        _events(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .selectExpr(
            "user_id % 2 AS arm", "CAST(floor(value * 10) AS BIGINT) AS vc"
        )
    )
    h1 = (
        v.where("arm = 1").groupBy("vc").agg(F.count("*").cast("long").alias("c"))
    )
    h0 = (
        v.where("arm = 0").groupBy("vc").agg(F.count("*").cast("long").alias("c"))
    )
    diffs = (
        h1.alias("a")
        .crossJoin(F.broadcast(h0.alias("b")))
        .selectExpr(
            "a.vc - b.vc AS d",
            "CAST(a.c AS DECIMAL(38,0)) * b.c AS pw",
        )
        .groupBy("d")
        .agg(F.sum("pw").alias("w"))
    )
    wb = W.orderBy("d").rowsBetween(W.unboundedPreceding, -1)
    wall = W.orderBy("d").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = diffs.select(
        "d",
        "w",
        F.coalesce(
            F.sum("w").over(wb), F.expr("CAST(0 AS DECIMAL(38,0))")
        ).alias("cb"),
        F.sum("w").over(wall).alias("wt"),
    )
    dm = cum.agg(
        F.expr(
            "CAST(sum((CASE WHEN wt >= 2 * cb + 1"
            " AND wt <= 2 * cb + 2 * w THEN d ELSE 0 END)"
            " + (CASE WHEN wt >= 2 * cb"
            " AND wt <= 2 * cb + 2 * w - 1 THEN d ELSE 0 END))"
            " AS BIGINT)"
        ).alias("d2"),
        F.expr("CAST(any_value(wt) AS DOUBLE)").alias("n_pairs"),
    )
    return dm.selectExpr(
        "n_pairs + 0.0 AS n_pairs",
        "round(CAST(d2 AS DOUBLE) / 20.0, 6) + 0.0 AS hl_shift",
    )


# ---------------------------------------------------------------------------
# Batch B — time-series features / heteroscedastic ANOVA / block ranks
# ---------------------------------------------------------------------------

_SIXH_GRID_SQL = """
    c AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) // 21600 AS b,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    span AS (SELECT min(b) AS lo, max(b) AS hi FROM c),
    z AS (
      SELECT g.b, CAST(coalesce(c.n, 0) AS BIGINT) AS y,
             row_number() OVER (ORDER BY g.b) AS idx
      FROM (SELECT unnest(generate_series(lo, hi)) AS b FROM span) g
      LEFT JOIN c USING (b)
    )
"""

_HOURLY_GRID_SQL = """
    c AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS b,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    span AS (SELECT min(b) AS lo, max(b) AS hi FROM c),
    z AS (
      SELECT g.b, CAST(coalesce(c.n, 0) AS BIGINT) AS y,
             row_number() OVER (ORDER BY g.b) AS idx
      FROM (SELECT unnest(generate_series(lo, hi)) AS b FROM span) g
      LEFT JOIN c USING (b)
    )
"""


def _bucket_grid(spark: SparkSession, sf_dir: str, width: int) -> DataFrame:
    """Zero-filled bucket-count series (b, y, idx) at `width` seconds,
    the sample_entropy_6h idiom: counts, span scaffold, left join."""
    ev = _events(spark, sf_dir)
    sec = F.unix_timestamp(F.col("ts").cast("timestamp"))
    c = ev.groupBy((sec / width).cast("long").alias("b")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    span = c.agg(F.min("b").alias("_lo"), F.max("b").alias("_hi"))
    return (
        span.select(
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("b")
        )
        .join(c, "b", "left")
        .select(
            "b", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("y")
        )
        .select("b", "y", F.row_number().over(W.orderBy("b")).alias("idx"))
    )


@stage(
    "c3_nonlinearity_6h",
    f"""
    WITH {_SIXH_GRID_SQL},
    lagged AS (
      SELECT y,
             lag(y, 1) OVER (ORDER BY idx) AS l1,
             lag(y, 2) OVER (ORDER BY idx) AS l2,
             lag(y, 3) OVER (ORDER BY idx) AS l3,
             lag(y, 4) OVER (ORDER BY idx) AS l4,
             lag(y, 6) OVER (ORDER BY idx) AS l6
      FROM z
    ),
    agg AS (
      SELECT
        sum(CASE WHEN l2 IS NOT NULL
            THEN y::HUGEINT * l1 * l2 END) AS s1,
        CAST(count(CASE WHEN l2 IS NOT NULL THEN 1 END) AS BIGINT)
          AS k1,
        sum(CASE WHEN l4 IS NOT NULL
            THEN y::HUGEINT * l2 * l4 END) AS s2,
        CAST(count(CASE WHEN l4 IS NOT NULL THEN 1 END) AS BIGINT)
          AS k2,
        sum(CASE WHEN l6 IS NOT NULL
            THEN y::HUGEINT * l3 * l6 END) AS s3,
        CAST(count(CASE WHEN l6 IS NOT NULL THEN 1 END) AS BIGINT)
          AS k3
      FROM lagged
    )
    SELECT 1 AS lag, k1 AS n_terms,
           round(CAST(s1 AS DOUBLE) / nullif(CAST(k1 AS DOUBLE), 0), 6)
             + 0.0 AS c3_mean
    FROM agg
    UNION ALL
    SELECT 2, k2,
           round(CAST(s2 AS DOUBLE) / nullif(CAST(k2 AS DOUBLE), 0), 6)
             + 0.0
    FROM agg
    UNION ALL
    SELECT 3, k3,
           round(CAST(s3 AS DOUBLE) / nullif(CAST(k3 AS DOUBLE), 0), 6)
             + 0.0
    FROM agg
    ORDER BY 1
    """,
)
def q_c3_nonlinearity_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tsfresh-style c3 nonlinearity statistic of the zero-filled
    6-hour count series at lags 1..3: mean(y_t * y_{{t-lag}} *
    y_{{t-2lag}}). Counts are integers, so the triple products sum
    EXACTLY — widened per-row to int128 because a bucket count can hit
    ~1e6 at corpus scale and its cube overflows BIGINT (the round-10
    widening rule); only the final mean divides doubles. Lags ride one
    bounded window pass over the time-bounded 6h grid; missing buckets
    zero-fill via the span scaffold so gaps don't silently shorten the
    lag chains.
    """
    z = _bucket_grid(spark, sf_dir, 21600)
    wo = W.orderBy("idx")
    lagged = z.select(
        "y",
        F.lag("y", 1).over(wo).alias("l1"),
        F.lag("y", 2).over(wo).alias("l2"),
        F.lag("y", 3).over(wo).alias("l3"),
        F.lag("y", 4).over(wo).alias("l4"),
        F.lag("y", 6).over(wo).alias("l6"),
    )
    agg = lagged.agg(
        F.expr(
            "sum(CASE WHEN l2 IS NOT NULL"
            " THEN CAST(y AS DECIMAL(38,0)) * l1 * l2 END)"
        ).alias("s1"),
        F.expr(
            "CAST(count(CASE WHEN l2 IS NOT NULL THEN 1 END) AS BIGINT)"
        ).alias("k1"),
        F.expr(
            "sum(CASE WHEN l4 IS NOT NULL"
            " THEN CAST(y AS DECIMAL(38,0)) * l2 * l4 END)"
        ).alias("s2"),
        F.expr(
            "CAST(count(CASE WHEN l4 IS NOT NULL THEN 1 END) AS BIGINT)"
        ).alias("k2"),
        F.expr(
            "sum(CASE WHEN l6 IS NOT NULL"
            " THEN CAST(y AS DECIMAL(38,0)) * l3 * l6 END)"
        ).alias("s3"),
        F.expr(
            "CAST(count(CASE WHEN l6 IS NOT NULL THEN 1 END) AS BIGINT)"
        ).alias("k3"),
    )
    structs = ", ".join(
        f"struct(CAST({i} AS INT) AS lag, k{i} AS n_terms,"
        f" round(CAST(s{i} AS DOUBLE)"
        f" / nullif(CAST(k{i} AS DOUBLE), 0), 6) + 0.0 AS c3_mean)"
        for i in (1, 2, 3)
    )
    return (
        agg.selectExpr(f"explode(array({structs})) AS r")
        .select("r.*")
        .orderBy("lag")
    )


@stage(
    "time_reversal_asymmetry_6h",
    f"""
    WITH {_SIXH_GRID_SQL},
    lagged AS (
      SELECT y,
             lag(y, 1) OVER (ORDER BY idx) AS l1,
             lag(y, 2) OVER (ORDER BY idx) AS l2,
             lag(y, 3) OVER (ORDER BY idx) AS l3
      FROM z
    ),
    agg AS (
      SELECT
        sum(CASE WHEN l1 IS NOT NULL
            THEN y::HUGEINT * y * l1 - l1::HUGEINT * l1 * y END) AS s1,
        CAST(count(CASE WHEN l1 IS NOT NULL THEN 1 END) AS BIGINT)
          AS k1,
        sum(CASE WHEN l2 IS NOT NULL
            THEN y::HUGEINT * y * l2 - l2::HUGEINT * l2 * y END) AS s2,
        CAST(count(CASE WHEN l2 IS NOT NULL THEN 1 END) AS BIGINT)
          AS k2,
        sum(CASE WHEN l3 IS NOT NULL
            THEN y::HUGEINT * y * l3 - l3::HUGEINT * l3 * y END) AS s3,
        CAST(count(CASE WHEN l3 IS NOT NULL THEN 1 END) AS BIGINT)
          AS k3
      FROM lagged
    )
    SELECT 1 AS lag, k1 AS n_terms,
           round(CAST(s1 AS DOUBLE) / nullif(CAST(k1 AS DOUBLE), 0), 6)
             + 0.0 AS trev_mean
    FROM agg
    UNION ALL
    SELECT 2, k2,
           round(CAST(s2 AS DOUBLE) / nullif(CAST(k2 AS DOUBLE), 0), 6)
             + 0.0
    FROM agg
    UNION ALL
    SELECT 3, k3,
           round(CAST(s3 AS DOUBLE) / nullif(CAST(k3 AS DOUBLE), 0), 6)
             + 0.0
    FROM agg
    ORDER BY 1
    """,
)
def q_time_reversal_asymmetry_6h(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """tsfresh time-reversal asymmetry statistic of the zero-filled
    6-hour count series at lags 1..3: mean(y_t^2 * y_{{t-lag}} -
    y_{{t-lag}}^2 * y_t) — zero for any time-reversible series, so a
    signed departure flags asymmetric ramp-up/decay dynamics. The
    per-term cubic products are exact integers widened to int128
    per-row (bucket counts cube past 2^63 at corpus scale); one
    bounded window pass over the 6h grid, no raw-row windows.
    """
    z = _bucket_grid(spark, sf_dir, 21600)
    wo = W.orderBy("idx")
    lagged = z.select(
        "y",
        F.lag("y", 1).over(wo).alias("l1"),
        F.lag("y", 2).over(wo).alias("l2"),
        F.lag("y", 3).over(wo).alias("l3"),
    )
    aggs = []
    for i in (1, 2, 3):
        aggs.append(
            F.expr(
                f"sum(CASE WHEN l{i} IS NOT NULL"
                f" THEN CAST(y AS DECIMAL(38,0)) * y * l{i}"
                f" - CAST(l{i} AS DECIMAL(38,0)) * l{i} * y END)"
            ).alias(f"s{i}")
        )
        aggs.append(
            F.expr(
                f"CAST(count(CASE WHEN l{i} IS NOT NULL THEN 1 END)"
                " AS BIGINT)"
            ).alias(f"k{i}")
        )
    agg = lagged.agg(*aggs)
    structs = ", ".join(
        f"struct(CAST({i} AS INT) AS lag, k{i} AS n_terms,"
        f" round(CAST(s{i} AS DOUBLE)"
        f" / nullif(CAST(k{i} AS DOUBLE), 0), 6) + 0.0 AS trev_mean)"
        for i in (1, 2, 3)
    )
    return (
        agg.selectExpr(f"explode(array({structs})) AS r")
        .select("r.*")
        .orderBy("lag")
    )


@stage(
    "allan_variance_hourly_rate",
    f"""
    WITH {_HOURLY_GRID_SQL},
    grp AS (
      SELECT m, (idx - 1) // m AS g,
             CAST(sum(y) AS BIGINT) AS sg,
             CAST(count(*) AS BIGINT) AS cnt
      FROM z CROSS JOIN (SELECT unnest([1, 2, 4]) AS m)
      GROUP BY 1, 2
    ),
    full_g AS (
      SELECT m, g, sg,
             lag(sg) OVER (PARTITION BY m ORDER BY g) AS prev
      FROM grp WHERE cnt = m
    ),
    agg AS (
      SELECT m,
             CAST(count(*) AS BIGINT) AS n_groups,
             sum(CASE WHEN prev IS NOT NULL
                 THEN (sg::HUGEINT - prev) * (sg::HUGEINT - prev)
                 END) AS sd2
      FROM full_g GROUP BY 1
    )
    SELECT m AS tau_hours, n_groups,
           round(CAST(sd2 AS DOUBLE)
                 / nullif(2.0 * m * m * (n_groups - 1), 0), 6) + 0.0
             AS allan_var
    FROM agg ORDER BY 1
    """,
)
def q_allan_variance_hourly_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Allan variance of the zero-filled hourly event-count series at
    averaging windows tau = 1, 2, 4 hours: AVAR(m) = sum((ybar_{{k+1}}
    - ybar_k)^2) / (2*(K-1)) over NON-overlapping m-hour block means.
    Block means stay exact by working on block SUMS — (S_{{k+1}} -
    S_k)^2 / m^2 — so the numerator is a pure int128-widened integer
    sum (block sums reach ~m*1e6 at corpus scale, their squared
    differences pass 2^63) and one double division lands the result.
    Trailing partial blocks are excluded (cnt = m), matching the
    standard estimator. The tau fan-out is a 3-constant cross join on
    the bounded hourly grid, one groupBy + one partitioned lag.
    """
    z = _bucket_grid(spark, sf_dir, 3600)
    ms = spark.range(1).selectExpr("explode(array(1, 2, 4)) AS m")
    grp = (
        z.crossJoin(F.broadcast(ms))
        .selectExpr("m", "(idx - 1) div m AS g", "y")
        .groupBy("m", "g")
        .agg(
            F.sum("y").cast("long").alias("sg"),
            F.count("*").cast("long").alias("cnt"),
        )
    )
    full_g = grp.where("cnt = m").select(
        "m",
        "g",
        "sg",
        F.lag("sg").over(W.partitionBy("m").orderBy("g")).alias("prev"),
    )
    agg = full_g.groupBy("m").agg(
        F.count("*").cast("long").alias("n_groups"),
        F.expr(
            "sum(CASE WHEN prev IS NOT NULL"
            " THEN (CAST(sg AS DECIMAL(38,0)) - prev)"
            " * (CAST(sg AS DECIMAL(38,0)) - prev) END)"
        ).alias("sd2"),
    )
    return agg.selectExpr(
        "m AS tau_hours",
        "n_groups",
        "round(CAST(sd2 AS DOUBLE)"
        " / nullif(2.0 * m * m * (n_groups - 1), 0), 6) + 0.0"
        " AS allan_var",
    ).orderBy("tau_hours")


@stage(
    "longest_monotone_runs_hourly",
    f"""
    WITH {_HOURLY_GRID_SQL},
    d AS (
      SELECT idx, y, lag(y) OVER (ORDER BY idx) AS py
      FROM z
    ),
    flags AS (
      SELECT idx,
             CASE WHEN py IS NULL OR y <= py THEN 1 ELSE 0 END AS up_brk,
             CASE WHEN py IS NULL OR y >= py THEN 1 ELSE 0 END AS dn_brk
      FROM d
    ),
    runs AS (
      SELECT idx,
             sum(up_brk) OVER (ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS up_g,
             sum(dn_brk) OVER (ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS dn_g
      FROM flags
    ),
    lens AS (
      SELECT
        (SELECT CAST(max(c) AS BIGINT)
         FROM (SELECT count(*) AS c FROM runs GROUP BY up_g)) AS lu,
        (SELECT CAST(max(c) AS BIGINT)
         FROM (SELECT count(*) AS c FROM runs GROUP BY dn_g)) AS ld,
        (SELECT CAST(count(*) AS BIGINT) FROM z) AS n_hours
    )
    SELECT n_hours, lu AS longest_up_run, ld AS longest_down_run
    FROM lens
    """,
)
def q_longest_monotone_runs_hourly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Longest strictly-increasing and strictly-decreasing run lengths
    in the zero-filled hourly count series (a run of length L covers L
    consecutive hours whose pairwise steps are all strict). Classic
    gaps-and-islands: a break flag at every non-increase (resp.
    non-decrease), a running sum to number the islands, and a max
    group size — all exact integer window/group work on the bounded
    hourly grid, zero float anywhere. Flat series collapse to runs of
    length 1 by construction (every step breaks both directions).
    """
    z = _bucket_grid(spark, sf_dir, 3600)
    wo = W.orderBy("idx")
    wcum = W.orderBy("idx").rowsBetween(W.unboundedPreceding, W.currentRow)
    flags = z.select(
        "idx", "y", F.lag("y").over(wo).alias("py")
    ).selectExpr(
        "idx",
        "CASE WHEN py IS NULL OR y <= py THEN 1 ELSE 0 END AS up_brk",
        "CASE WHEN py IS NULL OR y >= py THEN 1 ELSE 0 END AS dn_brk",
    )
    runs = flags.select(
        "idx",
        F.sum("up_brk").over(wcum).alias("up_g"),
        F.sum("dn_brk").over(wcum).alias("dn_g"),
    )
    lu = (
        runs.groupBy("up_g")
        .agg(F.count("*").alias("c"))
        .agg(F.max("c").cast("long").alias("longest_up_run"))
    )
    ld = (
        runs.groupBy("dn_g")
        .agg(F.count("*").alias("c"))
        .agg(F.max("c").cast("long").alias("longest_down_run"))
    )
    nh = z.agg(F.count("*").cast("long").alias("n_hours"))
    return (
        nh.crossJoin(F.broadcast(lu))
        .crossJoin(F.broadcast(ld))
        .select("n_hours", "longest_up_run", "longest_down_run")
    )


@stage(
    "welch_anova_value_types",
    """
    WITH v AS (
      SELECT event_type,
             CAST(floor(value * 1000) AS BIGINT) AS vm
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(vm) AS BIGINT) AS s,
             sum(vm::HUGEINT * vm) AS ss
      FROM v GROUP BY 1
      HAVING count(*) >= 2 AND min(vm) <> max(vm)
    ),
    w AS (
      SELECT event_type, n,
             CAST(n AS DOUBLE)
               / ((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                  / (n - 1)) AS wj,
             CAST(s AS DOUBLE) / n AS xbar
      FROM g
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             sum(wj) AS wsum, sum(wj * xbar) AS wxsum
      FROM w
    ),
    parts AS (
      SELECT k, wsum,
             sum(wj * (xbar - wxsum / wsum)
                 * (xbar - wxsum / wsum)) AS a_num,
             sum((1.0 - wj / wsum) * (1.0 - wj / wsum) / (n - 1))
               AS lam
      FROM w CROSS JOIN tot
      GROUP BY 1, 2
    )
    SELECT k AS k_groups,
           round((a_num / nullif(CAST(k - 1 AS DOUBLE), 0))
                 / (1.0 + CAST(2 * (k - 2) AS DOUBLE)
                    / nullif(CAST(k * k - 1 AS DOUBLE), 0) * lam), 6)
             + 0.0 AS welch_f,
           round(CAST(k * k - 1 AS DOUBLE)
                 / nullif(3.0 * lam, 0), 6) + 0.0 AS welch_df2
    FROM parts
    """,
)
def q_welch_anova_value_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's heteroscedastic one-way ANOVA across event types on the
    micro-gridded values: F* = [sum w_j (xbar_j - xbar_w)^2 / (k-1)] /
    [1 + 2(k-2)/(k^2-1) * Lambda], Lambda = sum (1-w_j/W)^2/(n_j-1),
    with w_j = n_j / s_j^2 — the variance-ratio-robust alternative to
    classic ANOVA. Group moments (n, sum, sumsq) are exact integers
    (sumsq int128-widened: micro values square to 1e12 and 1e8 rows
    push the sum past 2^63); zero-variance or singleton groups drop
    via the exact min <> max test (an n*ss > s^2 comparison would
    outgrow even int128 at the design point), mirroring the bartlett
    exclusion rule. Constants follow
    the decimal-poison rule (CAST(2*(k-2) AS DOUBLE), never 2.0*(k-2)
    on a path where DECIMAL could bind first). k <= 1 NULLs via
    nullif. Shape: one groupBy to ~5 rows, scalar broadcast join,
    second tiny aggregate.
    """
    v = (
        _events(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .selectExpr(
            "event_type", "CAST(floor(value * 1000) AS BIGINT) AS vm"
        )
    )
    g = (
        v.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("vm").cast("long").alias("s"),
            F.expr("sum(CAST(vm AS DECIMAL(38,0)) * vm)").alias("ss"),
            F.min("vm").alias("lo"),
            F.max("vm").alias("hi"),
        )
        .where("n >= 2 AND lo <> hi")
    )
    w = g.selectExpr(
        "event_type",
        "n",
        "CAST(n AS DOUBLE)"
        " / ((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)"
        " / (n - 1)) AS wj",
        "CAST(s AS DOUBLE) / n AS xbar",
    )
    tot = w.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("wj").alias("wsum"),
        F.sum(F.col("wj") * F.col("xbar")).alias("wxsum"),
    )
    parts = (
        w.crossJoin(F.broadcast(tot))
        .groupBy("k", "wsum")
        .agg(
            F.expr(
                "sum(wj * (xbar - wxsum / wsum)"
                " * (xbar - wxsum / wsum))"
            ).alias("a_num"),
            F.expr(
                "sum((1.0 - wj / wsum) * (1.0 - wj / wsum) / (n - 1))"
            ).alias("lam"),
        )
    )
    return parts.selectExpr(
        "k AS k_groups",
        "round((a_num / nullif(CAST(k - 1 AS DOUBLE), 0))"
        " / (1.0 + CAST(2 * (k - 2) AS DOUBLE)"
        " / nullif(CAST(k * k - 1 AS DOUBLE), 0) * lam), 6)"
        " + 0.0 AS welch_f",
        "round(CAST(k * k - 1 AS DOUBLE)"
        " / nullif(3.0 * lam, 0), 6) + 0.0 AS welch_df2",
    )


@stage(
    "quade_test_day_types",
    """
    WITH c AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
             event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT d, event_type,
             CAST(coalesce(n, 0) AS BIGINT) AS n
      FROM (SELECT DISTINCT d FROM c) dd
      CROSS JOIN (SELECT DISTINCT event_type FROM c) tt
      LEFT JOIN c USING (d, event_type)
    ),
    rk AS (
      SELECT d, event_type, n,
             2 * rank() OVER (PARTITION BY d ORDER BY n)
               + count(*) OVER (PARTITION BY d, n) - 1 AS dr,
             count(*) OVER (PARTITION BY d) AS k
      FROM grid
    ),
    rng AS (
      SELECT d, max(n) - min(n) AS spread FROM grid GROUP BY 1
    ),
    q AS (
      SELECT d,
             2 * rank() OVER (ORDER BY spread)
               + count(*) OVER (PARTITION BY spread) - 1 AS dq,
             count(*) OVER () AS b
      FROM rng
    ),
    s AS (
      SELECT rk.event_type, rk.k, q.b,
             CAST(q.dq * (rk.dr - (rk.k + 1)) AS BIGINT) AS sp
      FROM rk JOIN q USING (d)
    ),
    per_type AS (
      SELECT event_type, any_value(k) AS k, any_value(b) AS b,
             sum(sp::HUGEINT * sp) AS a_part,
             CAST(sum(sp) AS BIGINT) AS sj
      FROM s GROUP BY 1
    ),
    agg AS (
      SELECT any_value(k) AS k, any_value(b) AS b,
             sum(a_part) AS ap,
             sum(sj::HUGEINT * sj) AS bpp
      FROM per_type
    )
    SELECT b AS b_days, k AS k_types,
           round(CAST((b - 1)::HUGEINT * bpp AS DOUBLE)
                 / nullif(CAST(b::HUGEINT * ap - bpp AS DOUBLE), 0), 6)
             + 0.0 AS quade_f
    FROM agg
    """,
)
def q_quade_test_day_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quade test for treatment differences across event types with
    days as blocks, on the zero-filled day x type count grid: within
    each day the counts get DOUBLED midranks dr (2*rank + ties - 1 —
    exact integers, no 0.5 rank arithmetic), each day gets a doubled
    midrank weight dq of its count spread, and the weighted centered
    scores S' = dq*(dr - (k+1)) = 4*S_quade satisfy F = (b-1)*B'' /
    (b*A' - B'') with A' = sum S'^2, B'' = sum_j (sum_d S')^2 — the
    4x doubling cancels, leaving the textbook statistic as one exact
    integer ratio until the final division. The squared sums and the
    b*A' cross term ride int128: at the 1e5-day design point b*A'
    reaches ~2e23, past BIGINT even though any realistic fixture
    fits. Identical-ranking degeneracy (all spreads equal and blocks
    unanimous) makes both A' and B'' collapse and NULLs via nullif.
    Shape: one grid groupBy, two bounded window passes, joins on the
    day key only.
    """
    ev = _events(spark, sf_dir)
    sec = F.unix_timestamp(F.col("ts").cast("timestamp"))
    c = ev.groupBy(
        (sec / 86400).cast("long").alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    days = c.select("d").distinct()
    types = c.select("event_type").distinct()
    grid = (
        days.crossJoin(types)
        .join(c, ["d", "event_type"], "left")
        .select(
            "d",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        )
    )
    rk = grid.select(
        "d",
        "event_type",
        "n",
        (
            2 * F.rank().over(W.partitionBy("d").orderBy("n"))
            + F.count("*").over(W.partitionBy("d", "n"))
            - 1
        ).alias("dr"),
        F.count("*").over(W.partitionBy("d")).alias("k"),
    )
    rng = grid.groupBy("d").agg(
        (F.max("n") - F.min("n")).alias("spread")
    )
    q = rng.select(
        "d",
        (
            2 * F.rank().over(W.orderBy("spread"))
            + F.count("*").over(W.partitionBy("spread"))
            - 1
        ).alias("dq"),
        F.count("*")
        .over(
            W.orderBy(F.lit(1)).rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        )
        .alias("b"),
    )
    s = rk.join(q, "d").selectExpr(
        "event_type",
        "k",
        "b",
        "CAST(dq * (dr - (k + 1)) AS BIGINT) AS sp",
    )
    per_type = s.groupBy("event_type").agg(
        F.first("k").alias("k"),
        F.first("b").alias("b"),
        F.expr("sum(CAST(sp AS DECIMAL(38,0)) * sp)").alias("a_part"),
        F.sum("sp").cast("long").alias("sj"),
    )
    agg = per_type.agg(
        F.first("k").alias("k"),
        F.first("b").alias("b"),
        F.sum("a_part").alias("ap"),
        F.expr("sum(CAST(sj AS DECIMAL(38,0)) * sj)").alias("bpp"),
    )
    return agg.selectExpr(
        "b AS b_days",
        "k AS k_types",
        "round(CAST(CAST(b - 1 AS DECIMAL(38,0)) * bpp AS DOUBLE)"
        " / nullif(CAST(CAST(b AS DECIMAL(38,0)) * ap - bpp"
        " AS DOUBLE), 0), 6) + 0.0 AS quade_f",
    )


# ---------------------------------------------------------------------------
# Batch C — corpus / text diagnostics
# ---------------------------------------------------------------------------

def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


_WORDS_BY_LANG_SQL = """
    w AS (
      SELECT lang, unnest(string_split(lower(text), ' ')) AS word
      FROM documents
    ),
    wc AS (
      SELECT lang, word, CAST(count(*) AS BIGINT) AS c
      FROM w WHERE word <> '' GROUP BY 1, 2
    )
"""


@stage(
    "good_turing_unseen_mass_by_lang",
    f"""
    WITH {_WORDS_BY_LANG_SQL},
    g AS (
      SELECT lang,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS v1,
             CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS v2
      FROM wc GROUP BY 1
    )
    SELECT lang, n_tokens, n_types, v1,
           round(CAST(v1 AS DOUBLE) / nullif(CAST(n_tokens AS DOUBLE),
                 0), 6) + 0.0 AS p_unseen,
           round(CAST(2 * v2 AS DOUBLE) / nullif(CAST(v1 AS DOUBLE),
                 0), 6) + 0.0 AS gt_hapax_adjusted_count
    FROM g ORDER BY lang
    """,
)
def q_good_turing_unseen_mass_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Good-Turing unseen-mass estimate per language: the probability
    the NEXT token is a never-seen type, p0 = V1/N (hapax count over
    token count), plus the Good-Turing adjusted count for hapaxes
    r* = 2*V2/V1 — the two numbers that decide how much probability
    mass a language model should reserve for novel vocabulary when a
    corpus slice is used for training. Pure exact-integer ratios off
    the same vocab-sized word-count relation as the diversity
    operators (one token-explode shuffle, one vocab groupBy);
    a hapax-free corpus NULLs r* via nullif.
    """
    docs = _documents(spark, sf_dir)
    w = docs.select(
        "lang",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"),
    ).where(F.col("word") != "")
    wc = w.groupBy("lang", "word").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    g = wc.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("v1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("long")
        .alias("v2"),
    )
    return g.selectExpr(
        "lang",
        "n_tokens",
        "n_types",
        "v1",
        "round(CAST(v1 AS DOUBLE) / nullif(CAST(n_tokens AS DOUBLE),"
        " 0), 6) + 0.0 AS p_unseen",
        "round(CAST(2 * v2 AS DOUBLE)"
        " / nullif(CAST(v1 AS DOUBLE), 0), 6) + 0.0"
        " AS gt_hapax_adjusted_count",
    ).orderBy("lang")


@stage(
    "mattr_window25_by_lang",
    """
    WITH d AS (
      SELECT doc_id, lang,
             list_filter(string_split(lower(text), ' '), x -> x <> '')
               AS l
      FROM documents
    ),
    t0 AS (
      SELECT doc_id, lang, CAST(len(l) AS BIGINT) AS ln_,
             unnest(generate_series(1, len(l))) AS j, l
      FROM d WHERE len(l) >= 25
    ),
    tok AS (
      SELECT doc_id, lang, ln_, CAST(j AS BIGINT) AS j,
             l[j] AS word
      FROM t0
    ),
    prev AS (
      SELECT doc_id, lang, ln_, j,
             CAST(coalesce(lag(j) OVER (PARTITION BY doc_id, word
               ORDER BY j), 0) AS BIGINT) AS p
      FROM tok
    ),
    contrib AS (
      SELECT doc_id, lang, any_value(ln_) AS ln_,
             CAST(sum(greatest(0, least(j + 24, ln_)
                   - greatest(j, p + 25, 25) + 1)) AS BIGINT) AS s
      FROM prev GROUP BY 1, 2
    ),
    per_doc AS (
      SELECT lang,
             CAST(floor(CAST(s AS DOUBLE)
                  / ((ln_ - 24) * 25) * 1000000.0) AS BIGINT) AS m6
      FROM contrib
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs_scored,
           round(CAST(sum(m6) AS DOUBLE) / count(*) / 1000000.0, 6)
             + 0.0 AS mattr_mean
    FROM per_doc GROUP BY 1 ORDER BY 1
    """,
)
def q_mattr_window25_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-Average Type-Token Ratio (window 25) per language,
    computed WITHOUT a sliding distinct-count: a token at position j
    with previous same-word occurrence p contributes to exactly the
    windows ending in [max(j, p+25, 25), min(j+24, L)], so the summed
    distinct counts over all windows collapse to one exact integer
    closed form per token — no fold, no O(L*w) expansion, one lag
    window over (doc, word). MATTR = sum / ((L-24)*25) is an exact
    rational; per-doc scores are floor-quantized to integer micro
    units before the per-lang mean so the cross-doc sum is exact
    integer arithmetic (the round-7 digest rule). Docs shorter than
    the window are excluded deterministically.
    """
    docs = _documents(spark, sf_dir)
    d = docs.select(
        "doc_id",
        "lang",
        F.filter(
            F.split(F.lower(F.col("text")), " "), lambda x: x != ""
        ).alias("l"),
    ).where(F.size("l") >= 25)
    tok = d.select(
        "doc_id",
        "lang",
        F.size("l").cast("long").alias("ln_"),
        F.posexplode("l").alias("pos", "word"),
    ).selectExpr("doc_id", "lang", "ln_", "CAST(pos + 1 AS BIGINT) AS j",
                 "word")
    prev = tok.select(
        "doc_id",
        "lang",
        "ln_",
        "j",
        F.coalesce(
            F.lag("j").over(
                W.partitionBy("doc_id", "word").orderBy("j")
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("p"),
    )
    contrib = prev.groupBy("doc_id", "lang").agg(
        F.first("ln_").alias("ln_"),
        F.expr(
            "CAST(sum(greatest(0, least(j + 24, ln_)"
            " - greatest(j, p + 25, 25) + 1)) AS BIGINT)"
        ).alias("s"),
    )
    per_doc = contrib.selectExpr(
        "lang",
        "CAST(floor(CAST(s AS DOUBLE)"
        " / ((ln_ - 24) * 25) * 1000000.0) AS BIGINT) AS m6",
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs_scored"),
            F.expr(
                "round(CAST(sum(m6) AS DOUBLE) / count(*) / 1000000.0,"
                " 6) + 0.0"
            ).alias("mattr_mean"),
        )
        .orderBy("lang")
    )


@stage(
    "readability_cli_ari_by_lang",
    """
    WITH s AS (
      SELECT lang,
             CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
               AS BIGINT) AS letters,
             CAST(len(list_filter(string_split(text, ' '),
               x -> x <> '')) AS BIGINT) AS words,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
               AS BIGINT) AS sents
      FROM documents
    ),
    g AS (
      SELECT lang,
             CAST(sum(letters) AS BIGINT) AS lt,
             CAST(sum(words) AS BIGINT) AS wd,
             CAST(sum(sents) AS BIGINT) AS st,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM s WHERE words > 0 GROUP BY 1
    )
    SELECT lang, n_docs,
           round(0.0588 * (CAST(100 * lt AS DOUBLE) / wd)
                 - 0.296 * (CAST(100 * st AS DOUBLE) / wd) - 15.8, 6)
             + 0.0 AS coleman_liau,
           round(4.71 * (CAST(lt AS DOUBLE) / wd)
                 + 0.5 * (CAST(wd AS DOUBLE) / st) - 21.43, 6) + 0.0
             AS ari
    FROM g ORDER BY lang
    """,
)
def q_readability_cli_ari_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Coleman-Liau index and Automated Readability Index per
    language, both computed from corpus-level integer totals (letters,
    whitespace words, sentence-punctuation runs with the flesch
    floor-at-1 convention) rather than per-doc averages — the ratios
    of exact BIGINT sums feed the published constants in pure double
    arithmetic with identical expression text on both engines. These
    two indices need NO syllable heuristic (that's what distinguishes
    them from the existing Flesch operator): CLI is letters/sentences
    per 100 words, ARI is chars-per-word + words-per-sentence. One
    regex projection + one groupBy to 5 rows.
    """
    docs = _documents(spark, sf_dir)
    s = docs.selectExpr(
        "lang",
        "CAST(length(regexp_replace(lower(text), '[^a-z]', ''))"
        " AS BIGINT) AS letters",
        "CAST(size(filter(split(text, ' '), x -> x != ''))"
        " AS BIGINT) AS words",
        "CAST(greatest(size(regexp_extract_all(text, '[.!?]+', 0)), 1)"
        " AS BIGINT) AS sents",
    )
    g = (
        s.where("words > 0")
        .groupBy("lang")
        .agg(
            F.sum("letters").cast("long").alias("lt"),
            F.sum("words").cast("long").alias("wd"),
            F.sum("sents").cast("long").alias("st"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
    )
    return g.selectExpr(
        "lang",
        "n_docs",
        "round(0.0588 * (CAST(100 * lt AS DOUBLE) / wd)"
        " - 0.296 * (CAST(100 * st AS DOUBLE) / wd) - 15.8, 6)"
        " + 0.0 AS coleman_liau",
        "round(4.71 * (CAST(lt AS DOUBLE) / wd)"
        " + 0.5 * (CAST(wd AS DOUBLE) / st) - 21.43, 6) + 0.0 AS ari",
    ).orderBy("lang")


@stage(
    "gunning_fog_by_lang",
    """
    WITH d AS (
      SELECT doc_id, lang,
             list_filter(string_split(lower(text), ' '), x -> x <> '')
               AS l,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
               AS BIGINT) AS sents
      FROM documents
    ),
    w AS (
      SELECT lang, sents, doc_id, unnest(l) AS word FROM d
    ),
    cx AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS words,
             CAST(sum(CASE WHEN len(regexp_extract_all(word,
                 '[aeiouy]+')) >= 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS complex_words
      FROM w GROUP BY 1
    ),
    sg AS (
      SELECT lang, CAST(sum(sents) AS BIGINT) AS sents
      FROM d GROUP BY 1
    )
    SELECT cx.lang, words, complex_words,
           round(0.4 * (CAST(words AS DOUBLE) / sents
                 + CAST(100 * complex_words AS DOUBLE) / words), 6)
             + 0.0 AS gunning_fog
    FROM cx JOIN sg ON cx.lang = sg.lang
    ORDER BY 1
    """,
)
def q_gunning_fog_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gunning fog readability per language: 0.4 * (words/sentences +
    100 * complex/words) with complex = words of >= 3 vowel-group
    syllables (the same [aeiouy]+ heuristic the Flesch operator pins).
    Counts are corpus-level BIGINTs — the per-word syllable regex runs
    in the token explode (whole-stage codegen, no UDF) — and the
    published 0.4/100 constants bind against doubles only. Sentence
    runs floor at 1 per document. One explode + two groupBys joined on
    the 5-row lang key.
    """
    docs = _documents(spark, sf_dir)
    d = docs.selectExpr(
        "doc_id",
        "lang",
        "filter(split(lower(text), ' '), x -> x != '') AS l",
        "CAST(greatest(size(regexp_extract_all(text, '[.!?]+', 0)), 1)"
        " AS BIGINT) AS sents",
    )
    w = d.select("lang", "sents", "doc_id", F.explode("l").alias("word"))
    cx = w.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("words"),
        F.expr(
            "CAST(sum(CASE WHEN size(regexp_extract_all(word,"
            " '[aeiouy]+', 0)) >= 3 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("complex_words"),
    )
    sg = d.groupBy("lang").agg(F.sum("sents").cast("long").alias("sents"))
    return (
        cx.join(sg, "lang")
        .selectExpr(
            "lang",
            "words",
            "complex_words",
            "round(0.4 * (CAST(words AS DOUBLE) / sents"
            " + CAST(100 * complex_words AS DOUBLE) / words), 6)"
            " + 0.0 AS gunning_fog",
        )
        .orderBy("lang")
    )


@stage(
    "keyness_g2_top_terms",
    """
    WITH w AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS word
      FROM documents
    ),
    wc AS (
      SELECT source, word, CAST(count(*) AS BIGINT) AS c
      FROM w WHERE word <> '' GROUP BY 1, 2
    ),
    totals AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS n,
             row_number() OVER (ORDER BY sum(c) DESC, source) AS pos
      FROM wc GROUP BY 1
    ),
    ab AS (
      SELECT wc.word,
             CAST(sum(CASE WHEN t.pos = 1 THEN c ELSE 0 END) AS BIGINT)
               AS a,
             CAST(sum(CASE WHEN t.pos = 2 THEN c ELSE 0 END) AS BIGINT)
               AS b
      FROM wc JOIN totals t ON wc.source = t.source AND t.pos <= 2
      GROUP BY 1
      HAVING sum(c) >= 5
    ),
    nn AS (
      SELECT CAST(sum(CASE WHEN pos = 1 THEN n ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(sum(CASE WHEN pos = 2 THEN n ELSE 0 END) AS BIGINT)
               AS n2
      FROM totals WHERE pos <= 2
    ),
    g2 AS (
      SELECT word, a, b,
             2.0 * ((CASE WHEN a > 0 THEN a * ln(CAST(a AS DOUBLE)
                      * (n1 + n2) / (CAST(a + b AS DOUBLE) * n1))
                      ELSE 0.0 END)
                  + (CASE WHEN b > 0 THEN b * ln(CAST(b AS DOUBLE)
                      * (n1 + n2) / (CAST(a + b AS DOUBLE) * n2))
                      ELSE 0.0 END)) AS g
      FROM ab CROSS JOIN nn
    ),
    ranked AS (
      SELECT word, a, b, g,
             row_number() OVER (ORDER BY round(g, 9) DESC, word)
               AS pos
      FROM g2
    )
    SELECT word, a AS count_top1, b AS count_top2,
           round(g, 6) + 0.0 AS keyness_g2
    FROM ranked WHERE pos <= 15 ORDER BY word
    """,
)
def q_keyness_g2_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-likelihood (G2) keyness of terms between the corpus' two
    LARGEST sources (picked by exact token totals with a name
    tiebreak): G2 = 2*(a*ln(a/E_a) + b*ln(b/E_b)) against
    size-proportional expected counts — the corpus-linguistics
    standard for "which words distinguish source A from source B",
    directly useful for mixture/contamination triage. Zero cells
    contribute zero by the standard convention; rare words (a+b < 5)
    are excluded to bound the relation. The top-15 ranking orders on
    round(g, 9) with the word tiebreak because raw libm ln output is
    engine-unstable in ties (the bh_fdr rank rule). Scale: everything
    runs on the vocab-sized per-source count relation; the two-source
    totals ride one broadcast row.
    """
    docs = _documents(spark, sf_dir)
    w = docs.select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"),
    ).where(F.col("word") != "")
    wc = w.groupBy("source", "word").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    totals = (
        wc.groupBy("source")
        .agg(F.sum("c").cast("long").alias("n"))
        .select(
            "source",
            "n",
            F.row_number()
            .over(W.orderBy(F.col("n").desc(), F.col("source")))
            .alias("pos"),
        )
    )
    top2 = totals.where("pos <= 2")
    ab = (
        wc.join(F.broadcast(top2), "source")
        .groupBy("word")
        .agg(
            F.expr(
                "CAST(sum(CASE WHEN pos = 1 THEN c ELSE 0 END)"
                " AS BIGINT)"
            ).alias("a"),
            F.expr(
                "CAST(sum(CASE WHEN pos = 2 THEN c ELSE 0 END)"
                " AS BIGINT)"
            ).alias("b"),
        )
        .where("a + b >= 5")
    )
    nn = top2.agg(
        F.expr(
            "CAST(sum(CASE WHEN pos = 1 THEN n ELSE 0 END) AS BIGINT)"
        ).alias("n1"),
        F.expr(
            "CAST(sum(CASE WHEN pos = 2 THEN n ELSE 0 END) AS BIGINT)"
        ).alias("n2"),
    )
    g2 = ab.crossJoin(F.broadcast(nn)).selectExpr(
        "word",
        "a",
        "b",
        "2.0 * ((CASE WHEN a > 0 THEN a * ln(CAST(a AS DOUBLE)"
        " * (n1 + n2) / (CAST(a + b AS DOUBLE) * n1))"
        " ELSE 0.0 END)"
        " + (CASE WHEN b > 0 THEN b * ln(CAST(b AS DOUBLE)"
        " * (n1 + n2) / (CAST(a + b AS DOUBLE) * n2))"
        " ELSE 0.0 END)) AS g",
    )
    ranked = g2.select(
        "word",
        "a",
        "b",
        "g",
        F.row_number()
        .over(W.orderBy(F.expr("round(g, 9)").desc(), F.col("word")))
        .alias("pos"),
    ).where("pos <= 15")
    return ranked.selectExpr(
        "word",
        "a AS count_top1",
        "b AS count_top2",
        "round(g, 6) + 0.0 AS keyness_g2",
    ).orderBy("word")


@stage(
    "vocab_overlap_top_sources",
    """
    WITH w AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS word
      FROM documents
    ),
    wc AS (
      SELECT source, word, CAST(count(*) AS BIGINT) AS c
      FROM w WHERE word <> '' GROUP BY 1, 2
    ),
    totals AS (
      SELECT source, row_number() OVER (ORDER BY sum(c) DESC, source)
               AS pos
      FROM wc GROUP BY 1
    ),
    vocab AS (
      SELECT t.pos, wc.word
      FROM wc JOIN totals t ON wc.source = t.source AND t.pos <= 4
    ),
    sizes AS (
      SELECT pos, CAST(count(*) AS BIGINT) AS v FROM vocab GROUP BY 1
    ),
    inter AS (
      SELECT a.pos AS p1, b.pos AS p2, CAST(count(*) AS BIGINT) AS i
      FROM vocab a JOIN vocab b
        ON a.word = b.word AND a.pos < b.pos
      GROUP BY 1, 2
    )
    SELECT p1 AS source_rank_a, p2 AS source_rank_b,
           i AS n_shared_types,
           sa.v AS types_a, sb.v AS types_b,
           round(CAST(i AS DOUBLE) / nullif(CAST(sa.v + sb.v - i
                 AS DOUBLE), 0), 6) + 0.0 AS jaccard,
           round(CAST(i AS DOUBLE) / nullif(CAST(least(sa.v, sb.v)
                 AS DOUBLE), 0), 6) + 0.0 AS overlap_coef
    FROM inter
    JOIN sizes sa ON sa.pos = p1
    JOIN sizes sb ON sb.pos = p2
    ORDER BY 1, 2
    """,
)
def q_vocab_overlap_top_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Vocabulary Jaccard and overlap (Szymkiewicz-Simpson)
    coefficients between every pair of the corpus' four largest
    sources (exact token totals, name tiebreak): the standard corpus-
    mixing diagnostic — low Jaccard across sources flags domain
    shift, overlap near 1 with unequal sizes flags containment. Set
    sizes and intersections are exact integer counts; the pair join
    runs on the vocab-sized (word, source-rank) relation with the
    rank inequality bounding it to 6 pairs. Ranks rather than raw
    source names key the output so the schema is stable as the corpus
    grows.
    """
    docs = _documents(spark, sf_dir)
    w = docs.select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"),
    ).where(F.col("word") != "")
    wc = w.groupBy("source", "word").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    totals = (
        wc.groupBy("source")
        .agg(F.sum("c").cast("long").alias("n"))
        .select(
            "source",
            F.row_number()
            .over(W.orderBy(F.col("n").desc(), F.col("source")))
            .alias("pos"),
        )
        .where("pos <= 4")
    )
    vocab = wc.join(F.broadcast(totals), "source").select("pos", "word")
    sizes = vocab.groupBy("pos").agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    inter = (
        vocab.alias("a")
        .join(
            vocab.alias("b"),
            (F.col("a.word") == F.col("b.word"))
            & (F.col("a.pos") < F.col("b.pos")),
        )
        .groupBy(F.col("a.pos").alias("p1"), F.col("b.pos").alias("p2"))
        .agg(F.count(F.lit(1)).cast("long").alias("i"))
    )
    return (
        inter.join(
            F.broadcast(sizes.selectExpr("pos AS p1", "v AS va")), "p1"
        )
        .join(F.broadcast(sizes.selectExpr("pos AS p2", "v AS vb")), "p2")
        .selectExpr(
            "p1 AS source_rank_a",
            "p2 AS source_rank_b",
            "i AS n_shared_types",
            "va AS types_a",
            "vb AS types_b",
            "round(CAST(i AS DOUBLE) / nullif(CAST(va + vb - i"
            " AS DOUBLE), 0), 6) + 0.0 AS jaccard",
            "round(CAST(i AS DOUBLE) / nullif(CAST(least(va, vb)"
            " AS DOUBLE), 0), 6) + 0.0 AS overlap_coef",
        )
        .orderBy("source_rank_a", "source_rank_b")
    )


@stage(
    "char_bigram_entropy_by_lang",
    """
    WITH t AS (
      SELECT lang, lower(text) AS s FROM documents
      WHERE length(text) >= 2
    ),
    pos AS (
      SELECT lang, s, unnest(generate_series(1, length(s) - 1)) AS i
      FROM t
    ),
    bg AS (
      SELECT lang, substr(s, CAST(i AS INT), 2) AS b FROM pos
    ),
    bc AS (
      SELECT lang, b, CAST(count(*) AS BIGINT) AS c
      FROM bg GROUP BY 1, 2
    ),
    g AS (
      SELECT lang,
             CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
             sum(c * ln(CAST(c AS DOUBLE))) AS clogc
      FROM bc GROUP BY 1
    )
    SELECT lang, n AS n_bigrams, n_distinct_bigrams,
           round((ln(CAST(n AS DOUBLE)) - clogc / n)
                 / ln(2.0), 6) + 0.0 AS bigram_entropy_bits
    FROM g ORDER BY lang
    """,
)
def q_char_bigram_entropy_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Character-bigram entropy rate per language in bits: H =
    (ln N - sum(c*ln c)/N) / ln 2 over all adjacent character pairs of
    the lowered text (spaces included — word-boundary bigrams carry
    real signal for language ID). The bigram extraction is a
    positional explode (one row per character, linear in corpus size,
    no quadratic blowup); counts collapse to the bounded bigram-type
    relation before any float appears, and the ln-sum spans only that
    bounded relation (the markov_entropy_rate precedent for libm use
    under 6dp rounding). Distinguishes scripts with concentrated
    bigram mass (zh pinyin soup) from diffuse Latin text.
    """
    docs = _documents(spark, sf_dir)
    t = docs.selectExpr("lang", "lower(text) AS s").where(
        "length(s) >= 2"
    )
    pos = t.select(
        "lang",
        "s",
        F.explode(
            F.sequence(F.lit(1), F.length("s") - 1)
        ).alias("i"),
    )
    bg = pos.selectExpr("lang", "substr(s, CAST(i AS INT), 2) AS b")
    bc = bg.groupBy("lang", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    g = bc.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_bigrams"),
        F.sum(F.expr("c * ln(CAST(c AS DOUBLE))")).alias("clogc"),
    )
    return g.selectExpr(
        "lang",
        "n AS n_bigrams",
        "n_distinct_bigrams",
        "round((ln(CAST(n AS DOUBLE)) - clogc / n)"
        " / ln(2.0), 6) + 0.0 AS bigram_entropy_bits",
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# Batch D — evaluation / cluster-validity diagnostics
# ---------------------------------------------------------------------------
# Local copy of the registered _SCORED_SQL construct (queries.py:7599)
# so the staging module stays import-independent: y = churn-ish label,
# score = 0.3*y + 0.7*uniform(md5). On the 1/999 grid the score is the
# exact integer s_int = 2997*y + 7*h (score * 9990), which batch D's
# pair counting uses to stay float-free.

_SCORED2_SQL = """
    scored AS (
      SELECT event_type,
             CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS y,
             CAST(2997 * (CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END)
               + 7 * (('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT
                      % 1000) AS BIGINT) AS si,
             CAST(2997 * (CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END)
               + 7 * (('0x' || substr(md5(event_id::VARCHAR), 5, 4))::BIGINT
                      % 1000) AS BIGINT) AS si2
      FROM events
    )
"""


def _scored2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    y = F.when(F.col("user_id") % 3 == 0, 1).otherwise(0)
    h1 = (
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 4),
            16,
            10,
        ).cast("long")
        % 1000
    )
    h2 = (
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 5, 4),
            16,
            10,
        ).cast("long")
        % 1000
    )
    return ev.select(
        "event_type",
        y.alias("y"),
        (F.lit(2997) * y + 7 * h1).cast("long").alias("si"),
        (F.lit(2997) * y + 7 * h2).cast("long").alias("si2"),
    )


@stage(
    "v_measure_embedding_partition",
    """
    WITH p AS (
      SELECT label,
             2 * (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
             + (CASE WHEN embedding[2] > 0 THEN 1 ELSE 0 END) AS bucket
      FROM embeddings
    ),
    cell AS (
      SELECT label, bucket, CAST(count(*) AS BIGINT) AS n
      FROM p GROUP BY 1, 2
    ),
    a AS (SELECT label, CAST(sum(n) AS BIGINT) AS na FROM cell GROUP BY 1),
    b AS (SELECT bucket, CAST(sum(n) AS BIGINT) AS nb FROM cell GROUP BY 1),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM cell),
    ents AS (
      SELECT
        (SELECT -sum(na * ln(CAST(na AS DOUBLE) / nt)) / any_value(nt)
         FROM a CROSS JOIN tot) AS hc,
        (SELECT -sum(nb * ln(CAST(nb AS DOUBLE) / nt)) / any_value(nt)
         FROM b CROSS JOIN tot) AS hk,
        (SELECT -sum(cell.n * ln(CAST(cell.n AS DOUBLE) / b.nb))
           / any_value(nt)
         FROM cell JOIN b USING (bucket) CROSS JOIN tot) AS hck,
        (SELECT -sum(cell.n * ln(CAST(cell.n AS DOUBLE) / a.na))
           / any_value(nt)
         FROM cell JOIN a USING (label) CROSS JOIN tot) AS hkc,
        (SELECT nt FROM tot) AS n_points
    ),
    hcpair AS (
      SELECT n_points,
             CASE WHEN hc = 0 THEN 1.0 ELSE 1.0 - hck / hc END AS h,
             CASE WHEN hk = 0 THEN 1.0 ELSE 1.0 - hkc / hk END AS c
      FROM ents
    )
    SELECT n_points,
           round(h, 6) + 0.0 AS homogeneity,
           round(c, 6) + 0.0 AS completeness,
           round(2.0 * h * c / nullif(h + c, 0), 6) + 0.0 AS v_measure
    FROM hcpair
    """,
)
def q_v_measure_embedding_partition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Homogeneity / completeness / V-measure between the embedding
    labels and the 4-way sign-quadrant partition of dims 1-2 — the
    entropy-based companion to the pairwise ARI/FM agreement operator
    (same two partitions, different failure modes: V-measure penalizes
    split clusters where ARI forgives them). Conditional entropies run
    over the bounded label x bucket contingency relation (ln under 6dp
    rounding, the markov_entropy precedent); the sklearn conventions
    h = 1 when H(C) = 0 and V = 0/NULL when h + c = 0 are pinned via
    CASE/nullif. One groupBy to the contingency cells; every entropy
    is a scalar off that bounded relation.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    p = emb.selectExpr(
        "label",
        "2 * (CASE WHEN get(embedding, 0) > 0 THEN 1 ELSE 0 END)"
        " + (CASE WHEN get(embedding, 1) > 0 THEN 1 ELSE 0 END)"
        " AS bucket",
    )
    cell = p.groupBy("label", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    a = cell.groupBy("label").agg(F.sum("n").cast("long").alias("na"))
    b = cell.groupBy("bucket").agg(F.sum("n").cast("long").alias("nb"))
    tot = cell.agg(F.sum("n").cast("long").alias("nt"))
    hc = (
        a.crossJoin(F.broadcast(tot))
        .agg(F.expr("-sum(na * ln(CAST(na AS DOUBLE) / nt))").alias("x"))
        .crossJoin(F.broadcast(tot))
        .selectExpr("x / nt AS hc")
    )
    hk = (
        b.crossJoin(F.broadcast(tot))
        .agg(F.expr("-sum(nb * ln(CAST(nb AS DOUBLE) / nt))").alias("x"))
        .crossJoin(F.broadcast(tot))
        .selectExpr("x / nt AS hk")
    )
    hck = (
        cell.join(F.broadcast(b), "bucket")
        .agg(
            F.expr("-sum(n * ln(CAST(n AS DOUBLE) / nb))").alias("x")
        )
        .crossJoin(F.broadcast(tot))
        .selectExpr("x / nt AS hck")
    )
    hkc = (
        cell.join(F.broadcast(a), "label")
        .agg(
            F.expr("-sum(n * ln(CAST(n AS DOUBLE) / na))").alias("x")
        )
        .crossJoin(F.broadcast(tot))
        .selectExpr("x / nt AS hkc")
    )
    ents = (
        hc.crossJoin(F.broadcast(hk))
        .crossJoin(F.broadcast(hck))
        .crossJoin(F.broadcast(hkc))
        .crossJoin(F.broadcast(tot.selectExpr("nt AS n_points")))
    )
    hcp = ents.selectExpr(
        "n_points",
        "CASE WHEN hc = 0 THEN 1.0 ELSE 1.0 - hck / hc END AS h",
        "CASE WHEN hk = 0 THEN 1.0 ELSE 1.0 - hkc / hk END AS c",
    )
    return hcp.selectExpr(
        "n_points",
        "round(h, 6) + 0.0 AS homogeneity",
        "round(c, 6) + 0.0 AS completeness",
        "round(2.0 * h * c / nullif(h + c, 0), 6) + 0.0 AS v_measure",
    )


@stage(
    "calinski_harabasz_value_types",
    """
    WITH v AS (
      SELECT event_type,
             CAST(floor(value * 1000) AS BIGINT) AS vm
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS nj,
             CAST(sum(vm) AS BIGINT) AS sj,
             sum(vm::HUGEINT * vm) AS ssj
      FROM v GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(nj) AS BIGINT) AS n,
             CAST(sum(sj) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS k
      FROM g
    ),
    parts AS (
      SELECT k, n,
             sum(CAST(n::HUGEINT * sj - nj::HUGEINT * s AS DOUBLE)
                 * CAST(n::HUGEINT * sj - nj::HUGEINT * s AS DOUBLE)
                 / (CAST(nj AS DOUBLE) * n * n)) AS between_ss,
             sum(CAST(ssj AS DOUBLE)
                 - CAST(sj AS DOUBLE) * sj / nj) AS within_ss
      FROM g CROSS JOIN tot
      GROUP BY 1, 2
    )
    SELECT k AS k_clusters, n AS n_points,
           round((between_ss / nullif(CAST(k - 1 AS DOUBLE), 0))
                 / nullif(within_ss / nullif(CAST(n - k AS DOUBLE), 0),
                          0), 6) + 0.0 AS ch_index
    FROM parts
    """,
)
def q_calinski_harabasz_value_types(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Calinski-Harabasz variance-ratio index treating event types as
    clusters over the micro-gridded value axis: [between-SS/(k-1)] /
    [within-SS/(n-k)]. Between-group terms keep the
    difference n*s_j - n_j*S exact in int128 (~1e33 at corpus scale)
    and square it in DOUBLE — squaring inside int128 would overflow
    even DECIMAL(38,0) — and within-SS comes from
    exact integer group moments; the 5-term cross-group sums are the
    bartlett small-k float precedent. Degenerate k = 1 or zero
    within-variance NULLs via nullif. One groupBy to k rows + one
    broadcast scalar join.
    """
    v = (
        _events(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .selectExpr(
            "event_type", "CAST(floor(value * 1000) AS BIGINT) AS vm"
        )
    )
    g = v.groupBy("event_type").agg(
        F.count("*").cast("long").alias("nj"),
        F.sum("vm").cast("long").alias("sj"),
        F.expr("sum(CAST(vm AS DECIMAL(38,0)) * vm)").alias("ssj"),
    )
    tot = g.agg(
        F.sum("nj").cast("long").alias("n"),
        F.sum("sj").cast("long").alias("s"),
        F.count("*").cast("long").alias("k"),
    )
    parts = (
        g.crossJoin(F.broadcast(tot))
        .groupBy("k", "n")
        .agg(
            F.expr(
                "sum(CAST(CAST(n AS DECIMAL(38,0)) * sj"
                " - CAST(nj AS DECIMAL(38,0)) * s AS DOUBLE)"
                " * CAST(CAST(n AS DECIMAL(38,0)) * sj"
                " - CAST(nj AS DECIMAL(38,0)) * s AS DOUBLE)"
                " / (CAST(nj AS DOUBLE) * n * n))"
            ).alias("between_ss"),
            F.expr(
                "sum(CAST(ssj AS DOUBLE)"
                " - CAST(sj AS DOUBLE) * sj / nj)"
            ).alias("within_ss"),
        )
    )
    return parts.selectExpr(
        "k AS k_clusters",
        "n AS n_points",
        "round((between_ss / nullif(CAST(k - 1 AS DOUBLE), 0))"
        " / nullif(within_ss / nullif(CAST(n - k AS DOUBLE), 0),"
        " 0), 6) + 0.0 AS ch_index",
    )


@stage(
    "davies_bouldin_value_types",
    """
    WITH v AS (
      SELECT event_type,
             CAST(floor(value * 1000) AS BIGINT) AS vm
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS nj,
             CAST(sum(vm) AS BIGINT) AS sj,
             sum(vm::HUGEINT * vm) AS ssj
      FROM v GROUP BY 1
    ),
    m AS (
      SELECT event_type,
             CAST(sj AS DOUBLE) / nj AS mu,
             sqrt((CAST(ssj AS DOUBLE) - CAST(sj AS DOUBLE) * sj / nj)
                  / nj) AS sig
      FROM g
    ),
    r AS (
      SELECT a.event_type AS ta, b.event_type AS tb,
             (a.sig + b.sig) / nullif(abs(a.mu - b.mu), 0) AS ratio
      FROM m a JOIN m b ON a.event_type <> b.event_type
    ),
    best AS (
      SELECT ta, ratio,
             row_number() OVER (PARTITION BY ta
               ORDER BY round(ratio, 9) DESC, tb) AS rk
      FROM r
    )
    SELECT CAST(count(*) AS BIGINT) AS k_clusters,
           round(avg(ratio), 6) + 0.0 AS db_index
    FROM best WHERE rk = 1
    """,
)
def q_davies_bouldin_value_types(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Davies-Bouldin index treating event types as clusters on the
    micro value axis: DB = mean over clusters of the worst
    (sigma_i + sigma_j)/|mu_i - mu_j| ratio. Centroids and population
    sigmas derive from exact integer group moments (int128 sumsq);
    the per-cluster worst-partner argmax ranks on round(ratio, 9)
    with the partner-name tiebreak because the ratio is libm-computed
    (the bh_fdr rank rule), and coincident centroids NULL their pair
    via nullif (NULLs sort last under DESC on both engines, so they
    never win the argmax unless every partner coincides). The pair
    join is k x k on the 5-row moment relation.
    """
    v = (
        _events(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .selectExpr(
            "event_type", "CAST(floor(value * 1000) AS BIGINT) AS vm"
        )
    )
    g = v.groupBy("event_type").agg(
        F.count("*").cast("long").alias("nj"),
        F.sum("vm").cast("long").alias("sj"),
        F.expr("sum(CAST(vm AS DECIMAL(38,0)) * vm)").alias("ssj"),
    )
    m = g.selectExpr(
        "event_type",
        "CAST(sj AS DOUBLE) / nj AS mu",
        "sqrt((CAST(ssj AS DOUBLE) - CAST(sj AS DOUBLE) * sj / nj)"
        " / nj) AS sig",
    )
    r = (
        m.alias("a")
        .join(
            m.alias("b"),
            F.col("a.event_type") != F.col("b.event_type"),
        )
        .selectExpr(
            "a.event_type AS ta",
            "b.event_type AS tb",
            "(a.sig + b.sig) / nullif(abs(a.mu - b.mu), 0) AS ratio",
        )
    )
    best = r.select(
        "ta",
        "ratio",
        F.row_number()
        .over(
            W.partitionBy("ta").orderBy(
                F.expr("round(ratio, 9)").desc(), F.col("tb")
            )
        )
        .alias("rk"),
    ).where("rk = 1")
    return best.agg(
        F.count("*").cast("long").alias("k_clusters"),
        F.expr("round(avg(ratio), 6) + 0.0").alias("db_index"),
    )


@stage(
    "nri_reclassification_scores",
    f"""
    WITH {_SCORED2_SQL},
    c AS (
      SELECT
        CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS pos,
        CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg,
        CAST(sum(CASE WHEN y = 1 AND si < 4995 AND si2 >= 4995
                 THEN 1 ELSE 0 END) AS BIGINT) AS pos_up,
        CAST(sum(CASE WHEN y = 1 AND si >= 4995 AND si2 < 4995
                 THEN 1 ELSE 0 END) AS BIGINT) AS pos_down,
        CAST(sum(CASE WHEN y = 0 AND si < 4995 AND si2 >= 4995
                 THEN 1 ELSE 0 END) AS BIGINT) AS neg_up,
        CAST(sum(CASE WHEN y = 0 AND si >= 4995 AND si2 < 4995
                 THEN 1 ELSE 0 END) AS BIGINT) AS neg_down
      FROM scored
    )
    SELECT pos, neg, pos_up, pos_down, neg_up, neg_down,
           round(CAST(pos_up - pos_down AS DOUBLE) / nullif(pos, 0)
                 + CAST(neg_down - neg_up AS DOUBLE) / nullif(neg, 0),
                 6) + 0.0 AS nri
    FROM c
    """,
)
def q_nri_reclassification_scores(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Net Reclassification Improvement between the two synthetic
    model scores (md5 hex substrings 1-4 vs 5-8 over the shared label
    construct) at the 0.5 risk threshold: among events with y = 1 the
    share moving INTO the high band minus the share moving out, plus
    the mirror among y = 0 — the standard "did the new model reclassify
    in the right direction" metric. Scores compare on the exact
    integer 1/9990 grid (si = score * 9990), so band membership is
    pure integer comparison and every cell is an exact count; one
    single-pass aggregate, no joins. An armless degenerate side NULLs
    via nullif.
    """
    sc = _scored2(spark, sf_dir)
    c = sc.agg(
        F.expr(
            "CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("pos"),
        F.expr(
            "CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("neg"),
        F.expr(
            "CAST(sum(CASE WHEN y = 1 AND si < 4995 AND si2 >= 4995"
            " THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("pos_up"),
        F.expr(
            "CAST(sum(CASE WHEN y = 1 AND si >= 4995 AND si2 < 4995"
            " THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("pos_down"),
        F.expr(
            "CAST(sum(CASE WHEN y = 0 AND si < 4995 AND si2 >= 4995"
            " THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("neg_up"),
        F.expr(
            "CAST(sum(CASE WHEN y = 0 AND si >= 4995 AND si2 < 4995"
            " THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("neg_down"),
    )
    return c.selectExpr(
        "pos",
        "neg",
        "pos_up",
        "pos_down",
        "neg_up",
        "neg_down",
        "round(CAST(pos_up - pos_down AS DOUBLE) / nullif(pos, 0)"
        " + CAST(neg_down - neg_up AS DOUBLE) / nullif(neg, 0),"
        " 6) + 0.0 AS nri",
    )


@stage(
    "eval_partial_auc_fpr20",
    f"""
    WITH {_SCORED2_SQL},
    hist AS (
      SELECT si,
             CAST(sum(y) AS BIGINT) AS p,
             CAST(sum(1 - y) AS BIGINT) AS ng
      FROM scored GROUP BY 1
    ),
    cum AS (
      SELECT si, p, ng,
             CAST(coalesce(sum(ng) OVER (ORDER BY si DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS neg_above,
             CAST(coalesce(sum(p) OVER (ORDER BY si DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS pos_above,
             CAST(sum(p) OVER () AS BIGINT) AS pos,
             CAST(sum(ng) OVER () AS BIGINT) AS neg
      FROM hist
    ),
    contrib AS (
      SELECT pos, neg, neg // 5 AS m,
             sum(greatest(0, least(ng, neg // 5 - neg_above))::HUGEINT
                 * (2 * pos_above + p)) AS s2
      FROM cum
      GROUP BY 1, 2, 3
    )
    SELECT pos, neg, m AS n_negatives_in_band,
           round(CAST(s2 AS DOUBLE)
                 / nullif(2.0 * pos * neg, 0), 6) + 0.0 AS pauc,
           round(CAST(s2 AS DOUBLE)
                 / nullif(2.0 * pos * m, 0), 6) + 0.0
             AS pauc_normalized
    FROM contrib
    """,
)
def q_eval_partial_auc_fpr20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial AUC restricted to the FPR <= 0.2 operating band — the
    region that matters when false alarms are expensive. The band is
    the top floor(neg/5) negatives by score; on the exact integer
    score histogram each score group contributes taken_negatives *
    (2*pos_above + pos_tied) with taken = clamp(m - neg_above, 0, ng)
    — partial inclusion of a tied boundary group is EXACT because all
    its members share the same positives-above count. The doubled sum
    handles ties midrank-style and rides int128 (bounded by 2*pos*neg
    ~ 2e24 at the 1e12-event design point, the widened MW-U magnitude
    class).
    Outputs both the absolute pAUC (fraction of the full unit square)
    and the band-normalized form. One histogram shuffle + one bounded
    window pass.
    """
    sc = _scored2(spark, sf_dir)
    hist = sc.groupBy("si").agg(
        F.sum("y").cast("long").alias("p"),
        F.sum(F.expr("1 - y")).cast("long").alias("ng"),
    )
    wab = W.orderBy(F.col("si").desc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    wall = W.orderBy(F.col("si").desc()).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = hist.select(
        "si",
        "p",
        "ng",
        F.coalesce(F.sum("ng").over(wab), F.lit(0))
        .cast("long")
        .alias("neg_above"),
        F.coalesce(F.sum("p").over(wab), F.lit(0))
        .cast("long")
        .alias("pos_above"),
        F.sum("p").over(wall).cast("long").alias("pos"),
        F.sum("ng").over(wall).cast("long").alias("neg"),
    )
    contrib = cum.selectExpr(
        "pos",
        "neg",
        "neg div 5 AS m",
        "CAST(greatest(0, least(ng, neg div 5 - neg_above))"
        " AS DECIMAL(38,0)) * (2 * pos_above + p) AS t",
    ).groupBy("pos", "neg", "m").agg(
        F.sum("t").alias("s2")
    )
    return contrib.selectExpr(
        "pos",
        "neg",
        "m AS n_negatives_in_band",
        "round(CAST(s2 AS DOUBLE)"
        " / nullif(2.0 * pos * neg, 0), 6) + 0.0 AS pauc",
        "round(CAST(s2 AS DOUBLE)"
        " / nullif(2.0 * pos * m, 0), 6) + 0.0 AS pauc_normalized",
    )


@stage(
    "cluster_dunn_index_types",
    """
    WITH v AS (
      SELECT event_type,
             CAST(floor(value * 1000) AS BIGINT) AS vm
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT event_type,
             CAST(min(vm) AS BIGINT) AS lo,
             CAST(max(vm) AS BIGINT) AS hi
      FROM v GROUP BY 1
    ),
    diam AS (
      SELECT CAST(max(hi - lo) AS BIGINT) AS max_diam,
             CAST(count(*) AS BIGINT) AS k
      FROM g
    ),
    pv AS (
      SELECT vm,
             CAST(count(DISTINCT event_type) AS BIGINT) AS ntypes,
             min(event_type) AS t_min,
             max(event_type) AS t_max
      FROM v GROUP BY 1
    ),
    adj AS (
      SELECT vm, ntypes, t_min, t_max,
             lag(vm) OVER (ORDER BY vm) AS pvm,
             lag(ntypes) OVER (ORDER BY vm) AS pnt,
             lag(t_min) OVER (ORDER BY vm) AS ptmin
      FROM pv
    ),
    inter AS (
      SELECT CAST(min(CASE
               WHEN ntypes >= 2 THEN 0
               WHEN pvm IS NULL THEN NULL
               WHEN pnt >= 2 THEN vm - pvm
               WHEN t_min <> ptmin THEN vm - pvm
               ELSE NULL END) AS BIGINT) AS min_inter
      FROM adj
    )
    SELECT k AS k_clusters, min_inter, max_diam,
           round(CAST(min_inter AS DOUBLE)
                 / nullif(CAST(max_diam AS DOUBLE), 0), 6) + 0.0
             AS dunn_index
    FROM diam CROSS JOIN inter
    """,
)
def q_cluster_dunn_index_types(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dunn cluster-validity index treating event types as clusters on
    the micro value axis: min inter-cluster point distance over max
    intra-cluster diameter, both EXACT integers. The 1-D minimum
    cross-type distance is always achieved either inside one tied
    value (a value shared by >= 2 types -> 0) or between ADJACENT
    distinct values whose type sets are not the same singleton — so
    one sorted lag pass over the grid-bounded per-value relation
    replaces the quadratic cross join entirely (the interleaving
    argument is in the row CASE: any value strictly between a closer
    cross pair would itself form a closer adjacent pair). max_diam = 0
    (all clusters degenerate points) NULLs via nullif. NOT named
    after the registered dunn_posthoc_type_pairs, which is the
    unrelated Dunn multiple-comparison test.
    """
    v = (
        _events(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .selectExpr(
            "event_type", "CAST(floor(value * 1000) AS BIGINT) AS vm"
        )
    )
    g = v.groupBy("event_type").agg(
        F.min("vm").cast("long").alias("lo"),
        F.max("vm").cast("long").alias("hi"),
    )
    diam = g.agg(
        F.max(F.col("hi") - F.col("lo")).cast("long").alias("max_diam"),
        F.count("*").cast("long").alias("k"),
    )
    pv = v.groupBy("vm").agg(
        F.countDistinct("event_type").cast("long").alias("ntypes"),
        F.min("event_type").alias("t_min"),
        F.max("event_type").alias("t_max"),
    )
    wo = W.orderBy("vm")
    adj = pv.select(
        "vm",
        "ntypes",
        "t_min",
        "t_max",
        F.lag("vm").over(wo).alias("pvm"),
        F.lag("ntypes").over(wo).alias("pnt"),
        F.lag("t_min").over(wo).alias("ptmin"),
    )
    inter = adj.agg(
        F.expr(
            "CAST(min(CASE"
            " WHEN ntypes >= 2 THEN 0"
            " WHEN pvm IS NULL THEN NULL"
            " WHEN pnt >= 2 THEN vm - pvm"
            " WHEN t_min <> ptmin THEN vm - pvm"
            " ELSE NULL END) AS BIGINT)"
        ).alias("min_inter")
    )
    return diam.crossJoin(F.broadcast(inter)).selectExpr(
        "k AS k_clusters",
        "min_inter",
        "max_diam",
        "round(CAST(min_inter AS DOUBLE)"
        " / nullif(CAST(max_diam AS DOUBLE), 0), 6) + 0.0"
        " AS dunn_index",
    )


# ---------------------------------------------------------------------------
# Batch E — business / pricing / forensic diagnostics
# ---------------------------------------------------------------------------

@stage(
    "cr_concentration_by_nation",
    """
    WITH rev AS (
      SELECT c.c_nationkey AS nation,
             o.o_custkey AS cust,
             CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    rk AS (
      SELECT nation, cents,
             row_number() OVER (PARTITION BY nation
               ORDER BY cents DESC, cust) AS r
      FROM rev
    )
    SELECT nation,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           round(CAST(sum(CASE WHEN r <= 4 THEN cents ELSE 0 END)
                 AS DOUBLE) / nullif(CAST(sum(cents) AS DOUBLE), 0), 6)
             + 0.0 AS cr4,
           round(CAST(sum(CASE WHEN r <= 8 THEN cents ELSE 0 END)
                 AS DOUBLE) / nullif(CAST(sum(cents) AS DOUBLE), 0), 6)
             + 0.0 AS cr8
    FROM rk GROUP BY 1 ORDER BY 1
    """,
)
def q_cr_concentration_by_nation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CR4/CR8 revenue concentration per customer nation: the share of
    a nation's order revenue held by its top-4 and top-8 customers —
    the concentration-ratio cousin of the registered HHI operator
    (antitrust-style k-firm ratios instead of the full quadratic
    index). Revenue is exact on the cent grid; the per-nation top-k
    ranking pins ties by custkey; one broadcast-joinable customer dim,
    one partitioned rank, one grouped conditional sum.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    rev = (
        orders.join(
            F.broadcast(cust.selectExpr("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .selectExpr(
            "c_nationkey AS nation",
            "o_custkey AS cust",
            "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents",
        )
        .groupBy("nation", "cust")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    rk = rev.select(
        "nation",
        "cents",
        F.row_number()
        .over(
            W.partitionBy("nation").orderBy(
                F.col("cents").desc(), F.col("cust")
            )
        )
        .alias("r"),
    )
    return (
        rk.groupBy("nation")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("total_cents"),
            F.expr(
                "round(CAST(sum(CASE WHEN r <= 4 THEN cents ELSE 0 END)"
                " AS DOUBLE) / nullif(CAST(sum(cents) AS DOUBLE), 0),"
                " 6) + 0.0"
            ).alias("cr4"),
            F.expr(
                "round(CAST(sum(CASE WHEN r <= 8 THEN cents ELSE 0 END)"
                " AS DOUBLE) / nullif(CAST(sum(cents) AS DOUBLE), 0),"
                " 6) + 0.0"
            ).alias("cr8"),
        )
        .orderBy("nation")
    )


@stage(
    "customer_frequency_migration_halves",
    """
    WITH mi AS (
      SELECT o_custkey AS cust,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
               AS BIGINT) AS m
      FROM orders
    ),
    span AS (
      SELECT (min(m) + max(m) + 1) // 2 AS thr FROM mi
    ),
    halves AS (
      SELECT cust,
             CAST(sum(CASE WHEN m < thr THEN 1 ELSE 0 END) AS BIGINT)
               AS f1,
             CAST(sum(CASE WHEN m >= thr THEN 1 ELSE 0 END) AS BIGINT)
               AS f2
      FROM mi CROSS JOIN span GROUP BY 1
    ),
    banded AS (
      SELECT CASE WHEN f1 = 0 THEN '0_none'
                  WHEN f1 = 1 THEN '1_one'
                  WHEN f1 <= 3 THEN '2_few' ELSE '3_many' END AS band_from,
             CASE WHEN f2 = 0 THEN '0_none'
                  WHEN f2 = 1 THEN '1_one'
                  WHEN f2 <= 3 THEN '2_few' ELSE '3_many' END AS band_to
      FROM halves
    )
    SELECT band_from, band_to, CAST(count(*) AS BIGINT) AS n_customers
    FROM banded GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_customer_frequency_migration_halves(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Customer purchase-frequency migration matrix between the two
    calendar halves of the order timeline: each customer's order count
    in each half maps to a band (none / one / few(2-3) / many(4+)) and
    the matrix counts band transitions — the retention/churn mobility
    table behind RFM dashboards. The half boundary is the exact
    integer month midpoint (y*12+m index, no timestamp arithmetic),
    so banding is pure integer CASE on both engines; one order scan,
    one per-customer groupBy, one matrix groupBy.
    """
    orders = load_table(spark, sf_dir, "orders")
    mi = orders.selectExpr(
        "o_custkey AS cust",
        "CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1"
        " AS BIGINT) AS m",
    )
    span = mi.agg(
        F.expr("(min(m) + max(m) + 1) div 2").alias("thr")
    )
    halves = (
        mi.crossJoin(F.broadcast(span))
        .groupBy("cust")
        .agg(
            F.expr(
                "CAST(sum(CASE WHEN m < thr THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("f1"),
            F.expr(
                "CAST(sum(CASE WHEN m >= thr THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("f2"),
        )
    )
    banded = halves.selectExpr(
        "CASE WHEN f1 = 0 THEN '0_none'"
        " WHEN f1 = 1 THEN '1_one'"
        " WHEN f1 <= 3 THEN '2_few' ELSE '3_many' END AS band_from",
        "CASE WHEN f2 = 0 THEN '0_none'"
        " WHEN f2 = 1 THEN '1_one'"
        " WHEN f2 <= 3 THEN '2_few' ELSE '3_many' END AS band_to",
    )
    return (
        banded.groupBy("band_from", "band_to")
        .agg(F.count("*").cast("long").alias("n_customers"))
        .orderBy("band_from", "band_to")
    )


_BENFORD2_P = [
    (0, 0.119679), (1, 0.113890), (2, 0.108821), (3, 0.104330),
    (4, 0.100308), (5, 0.096677), (6, 0.093375), (7, 0.090352),
    (8, 0.087570), (9, 0.084997),
]
_BENFORD2_VALUES = ", ".join(f"({d}, {p})" for d, p in _BENFORD2_P)


@stage(
    "benford_second_digit_totalprice",
    f"""
    WITH obs AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
               AS VARCHAR), 2, 1) AS BIGINT) AS d2,
             CAST(count(*) AS BIGINT) AS n
      FROM orders WHERE o_totalprice >= 10 GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM obs),
    exp_t AS (
      SELECT * FROM (VALUES {_BENFORD2_VALUES}) t(d2, p)
    )
    SELECT e.d2 AS digit,
           CAST(coalesce(o.n, 0) AS BIGINT) AS n_obs,
           round(CAST(coalesce(o.n, 0) AS DOUBLE) / nt, 6) + 0.0
             AS obs_p,
           CAST(e.p AS DOUBLE) + 0.0 AS exp_p,
           round((coalesce(o.n, 0) - nt * CAST(e.p AS DOUBLE))
                 * (coalesce(o.n, 0) - nt * CAST(e.p AS DOUBLE))
                 / (nt * CAST(e.p AS DOUBLE)), 6) + 0.0 AS chi2_term
    FROM exp_t e LEFT JOIN obs o ON o.d2 = e.d2 CROSS JOIN tot
    ORDER BY 1
    """,
)
def q_benford_second_digit_totalprice(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Nigrini second-digit Benford conformity of order totals — the
    forensic-accounting screen that catches price-point manipulation
    (x9.99 clustering) that the first-digit test misses. The second
    significant digit comes from integer string slicing of
    floor(totalprice) (totals >= 10 guaranteed a second digit); the
    ten expected probabilities are 6dp LITERALS shared by both engines
    (sum_d1 log10(1 + 1/(10*d1+d2)) precomputed — no runtime libm, so
    no cross-engine ulp risk in the expectations). Emits the per-digit
    observed share and chi-squared term; zero-count digits survive via
    the expected-side left join. One scan + 10-row literal join.
    """
    orders = load_table(spark, sf_dir, "orders")
    obs = (
        orders.where("o_totalprice >= 10")
        .selectExpr(
            "CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)"
            " AS STRING), 2, 1) AS BIGINT) AS d2"
        )
        .groupBy("d2")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = obs.agg(F.sum("n").cast("long").alias("nt"))
    exp_t = spark.createDataFrame(
        [(d, p) for d, p in _BENFORD2_P], "d2 INT, p DOUBLE"
    )
    return (
        exp_t.alias("e")
        .join(obs.alias("o"), F.col("e.d2") == F.col("o.d2"), "left")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "CAST(e.d2 AS BIGINT) AS digit",
            "CAST(coalesce(n, 0) AS BIGINT) AS n_obs",
            "round(CAST(coalesce(n, 0) AS DOUBLE) / nt, 6) + 0.0"
            " AS obs_p",
            "CAST(p AS DOUBLE) + 0.0 AS exp_p",
            "round((coalesce(n, 0) - nt * CAST(p AS DOUBLE))"
            " * (coalesce(n, 0) - nt * CAST(p AS DOUBLE))"
            " / (nt * CAST(p AS DOUBLE)), 6) + 0.0 AS chi2_term",
        )
        .orderBy("digit")
    )


@stage(
    "price_index_fisher_monthly",
    """
    WITH pm AS (
      SELECT l_partkey AS part,
             CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1
               AS BIGINT) AS mi,
             CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
               AS q,
             CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS v
      FROM lineitem GROUP BY 1, 2
      HAVING sum(CAST(floor(l_quantity) AS BIGINT)) > 0
    ),
    up AS (
      SELECT part, mi, q,
             CAST((v::HUGEINT * 1000) // q AS BIGINT) AS p
      FROM pm
    ),
    base AS (
      SELECT part, q AS q0, p AS p0
      FROM up WHERE mi = (SELECT min(mi) FROM up)
    ),
    j AS (
      SELECT up.mi, up.part, up.q AS qt, up.p AS pt, b.q0, b.p0
      FROM up JOIN base b USING (part)
    ),
    idx AS (
      SELECT mi, CAST(count(*) AS BIGINT) AS n_parts,
             sum(pt::HUGEINT * q0) AS l_num,
             sum(p0::HUGEINT * q0) AS l_den,
             sum(pt::HUGEINT * qt) AS p_num,
             sum(p0::HUGEINT * qt) AS p_den
      FROM j GROUP BY 1
    )
    SELECT mi AS month_index, n_parts,
           round(CAST(l_num AS DOUBLE) / nullif(CAST(l_den AS DOUBLE),
                 0), 6) + 0.0 AS laspeyres,
           round(CAST(p_num AS DOUBLE) / nullif(CAST(p_den AS DOUBLE),
                 0), 6) + 0.0 AS paasche,
           round(sqrt((CAST(l_num AS DOUBLE)
                       / nullif(CAST(l_den AS DOUBLE), 0))
                 * (CAST(p_num AS DOUBLE)
                    / nullif(CAST(p_den AS DOUBLE), 0))), 6) + 0.0
             AS fisher
    FROM idx ORDER BY 1
    """,
)
def q_price_index_fisher_monthly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Laspeyres, Paasche and Fisher price indices per ship month
    against the first month's basket: unit prices are exact integers
    on the 1/1000-cent grid ((cents*1000) // quantity — integer
    division, never a float unit price), so every index is a ratio of
    int128-widened exact integer sums (p*q reaches ~1e17 per row at
    corpus scale; the per-month sums pass 2^63) with one double
    division at the end; Fisher is the geometric mean of the two. The
    basket restricts to parts present in both the base month and the
    current month (the standard matched-basket convention — n_parts
    reports the matched count). One part-month groupBy + one
    part-keyed join; the base-month relation is part-bounded.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pm = (
        li.selectExpr(
            "l_partkey AS part",
            "CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1"
            " AS BIGINT) AS mi",
            "CAST(floor(l_quantity) AS BIGINT) AS qi",
            "CAST(floor(l_extendedprice * 100) AS BIGINT) AS vi",
        )
        .groupBy("part", "mi")
        .agg(
            F.sum("qi").cast("long").alias("q"),
            F.sum("vi").cast("long").alias("v"),
        )
        .where("q > 0")
    )
    up = pm.selectExpr(
        "part", "mi", "q",
        "CAST((CAST(v AS DECIMAL(38,0)) * 1000) div q AS BIGINT) AS p",
    )
    base_mi = up.agg(F.min("mi").alias("m0"))
    base = (
        up.crossJoin(F.broadcast(base_mi))
        .where("mi = m0")
        .selectExpr("part", "q AS q0", "p AS p0")
    )
    j = up.join(base, "part").selectExpr(
        "mi", "q AS qt", "p AS pt", "q0", "p0"
    )
    idx = j.groupBy("mi").agg(
        F.count("*").cast("long").alias("n_parts"),
        F.expr("sum(CAST(pt AS DECIMAL(38,0)) * q0)").alias("l_num"),
        F.expr("sum(CAST(p0 AS DECIMAL(38,0)) * q0)").alias("l_den"),
        F.expr("sum(CAST(pt AS DECIMAL(38,0)) * qt)").alias("p_num"),
        F.expr("sum(CAST(p0 AS DECIMAL(38,0)) * qt)").alias("p_den"),
    )
    return idx.selectExpr(
        "mi AS month_index",
        "n_parts",
        "round(CAST(l_num AS DOUBLE) / nullif(CAST(l_den AS DOUBLE),"
        " 0), 6) + 0.0 AS laspeyres",
        "round(CAST(p_num AS DOUBLE) / nullif(CAST(p_den AS DOUBLE),"
        " 0), 6) + 0.0 AS paasche",
        "round(sqrt((CAST(l_num AS DOUBLE)"
        " / nullif(CAST(l_den AS DOUBLE), 0))"
        " * (CAST(p_num AS DOUBLE)"
        " / nullif(CAST(p_den AS DOUBLE), 0))), 6) + 0.0 AS fisher",
    ).orderBy("month_index")


# 24-slot literal circular table: c6/s6 = floor(cos|sin(2*pi*h/24)*1e6)
# — precomputed so no runtime trig runs on either engine.
_CIRC24 = [
    (0, 1000000, 0), (1, 965925, 258819), (2, 866025, 499999),
    (3, 707106, 707106), (4, 500000, 866025), (5, 258819, 965925),
    (6, 0, 1000000), (7, -258820, 965925), (8, -500000, 866025),
    (9, -707107, 707106), (10, -866026, 499999), (11, -965926, 258819),
    (12, -1000000, 0), (13, -965926, -258820), (14, -866026, -500000),
    (15, -707107, -707107), (16, -500001, -866026),
    (17, -258820, -965926), (18, -1, -1000000), (19, 258819, -965926),
    (20, 500000, -866026), (21, 707106, -707107), (22, 866025, -500001),
    (23, 965925, -258820),
]
_CIRC24_VALUES = ", ".join(f"({h}, {c}, {s})" for h, c, s in _CIRC24)


@stage(
    "rayleigh_hour_concentration_by_type",
    f"""
    WITH hc AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // 3600 % 24 AS h,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    circ AS (SELECT * FROM (VALUES {_CIRC24_VALUES}) t(h, c6, s6)),
    agg AS (
      SELECT event_type,
             CAST(sum(n) AS BIGINT) AS nt,
             CAST(sum(n * c6) AS BIGINT) AS cs,
             CAST(sum(n * s6) AS BIGINT) AS sn
      FROM hc JOIN circ USING (h) GROUP BY 1
    )
    SELECT event_type, nt AS n_events,
           round(sqrt(CAST(cs::HUGEINT * cs + sn::HUGEINT * sn
                 AS DOUBLE)) / (CAST(nt AS DOUBLE) * 1000000.0), 6)
             + 0.0 AS resultant_rbar,
           round(CAST(cs::HUGEINT * cs + sn::HUGEINT * sn AS DOUBLE)
                 / (CAST(nt AS DOUBLE) * 1000000.0 * 1000000.0), 6)
             + 0.0 AS rayleigh_z
    FROM agg ORDER BY 1
    """,
)
def q_rayleigh_hour_concentration_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rayleigh test of hour-of-day concentration per event type —
    circular statistics on the 24-hour clock: the mean resultant
    length Rbar = |sum e^(i*theta_h)| / n over event angles theta_h =
    2*pi*h/24, and the Rayleigh statistic z = n*Rbar^2 (large z
    rejects uniform-around-the-clock activity). The 24 cos/sin values
    are 1e-6-quantized LITERALS shared verbatim by both engines — no
    runtime trig, so the vector sums are exact integers (int128-
    widened squares: (n*1e6)^2 ~ 1e28 at corpus scale) and only the
    final normalization divides doubles. One hour-of-day groupBy + a
    24-row literal join.
    """
    ev = _events(spark, sf_dir)
    sec = F.unix_timestamp(F.col("ts").cast("timestamp"))
    hc = ev.groupBy(
        "event_type", ((sec / 3600).cast("long") % 24).alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    circ = spark.createDataFrame(_CIRC24, "h INT, c6 LONG, s6 LONG")
    agg = (
        hc.join(F.broadcast(circ), "h")
        .groupBy("event_type")
        .agg(
            F.sum("n").cast("long").alias("nt"),
            F.sum(F.col("n") * F.col("c6")).cast("long").alias("cs"),
            F.sum(F.col("n") * F.col("s6")).cast("long").alias("sn"),
        )
    )
    return agg.selectExpr(
        "event_type",
        "nt AS n_events",
        "round(sqrt(CAST(CAST(cs AS DECIMAL(38,0)) * cs"
        " + CAST(sn AS DECIMAL(38,0)) * sn AS DOUBLE))"
        " / (CAST(nt AS DOUBLE) * 1000000.0), 6) + 0.0"
        " AS resultant_rbar",
        "round(CAST(CAST(cs AS DECIMAL(38,0)) * cs"
        " + CAST(sn AS DECIMAL(38,0)) * sn AS DOUBLE)"
        " / (CAST(nt AS DOUBLE) * 1000000.0 * 1000000.0), 6) + 0.0"
        " AS rayleigh_z",
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Batch F — graph degree-correlation / motifs + embedding geometry
# ---------------------------------------------------------------------------
# Shared synthetic interaction graph (the graph_bfs construct,
# queries.py graph family): nodes = ids mod 997, undirected edges from
# every 10th event's (user_id, event_id) pair. Node count is FIXED at
# <= 997 by construction, so wedge-quadratic motif counting is
# scale-safe — corpus growth densifies edges, never the node set.

_GRAPH_SQL = """
    raw AS (
      SELECT user_id % 997 AS a, event_id % 997 AS b
      FROM events WHERE event_id % 10 = 0
    ),
    und AS (
      SELECT DISTINCT least(a, b) AS lo, greatest(a, b) AS hi
      FROM raw WHERE a <> b
    ),
    sym AS (
      SELECT lo AS u, hi AS v FROM und
      UNION ALL SELECT hi AS u, lo AS v FROM und
    ),
    deg AS (
      SELECT u, CAST(count(*) AS BIGINT) AS dg FROM sym GROUP BY 1
    )
"""


def _graph_sym(spark: SparkSession, sf_dir: str):
    raw = (
        _events(spark, sf_dir)
        .where("event_id % 10 = 0")
        .selectExpr("user_id % 997 AS a", "event_id % 997 AS b")
        .where("a <> b")
        .selectExpr("least(a, b) AS lo", "greatest(a, b) AS hi")
        .distinct()
    )
    sym = raw.selectExpr("lo AS u", "hi AS v").unionAll(
        raw.selectExpr("hi AS u", "lo AS v")
    )
    deg = sym.groupBy("u").agg(F.count("*").cast("long").alias("dg"))
    return sym, deg


@stage(
    "graph_avg_neighbor_degree_profile",
    f"""
    WITH {_GRAPH_SQL},
    nbr AS (
      SELECT s.u, CAST(sum(d.dg) AS BIGINT) AS sdeg
      FROM sym s JOIN deg d ON d.u = s.v
      GROUP BY 1
    ),
    pernode AS (
      SELECT n.u, d.dg,
             (n.sdeg * 1000000) // d.dg AS knn6
      FROM nbr n JOIN deg d USING (u)
    )
    SELECT dg AS degree,
           CAST(count(*) AS BIGINT) AS n_nodes,
           round(CAST(sum(knn6) AS DOUBLE) / count(*) / 1000000.0, 6)
             + 0.0 AS avg_neighbor_degree
    FROM pernode GROUP BY 1 ORDER BY 1
    """,
)
def q_graph_avg_neighbor_degree_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Degree-correlation function knn(k): the mean neighbor degree of
    degree-k nodes, the curve whose slope signs assortative vs
    disassortative mixing (the registered assortativity operator's
    scalar is this curve's correlation). Per-node mean neighbor degree
    is kept exact as the integer (sum_deg * 1e6) // degree before the
    per-class mean, so no float enters until the final 6dp division.
    One edge-degree join + two bounded groupBys on the fixed-997-node
    relation.
    """
    sym, deg = _graph_sym(spark, sf_dir)
    nbr = (
        sym.alias("s")
        .join(deg.alias("d"), F.col("d.u") == F.col("s.v"))
        .groupBy(F.col("s.u").alias("u"))
        .agg(F.sum("d.dg").cast("long").alias("sdeg"))
    )
    pernode = nbr.join(deg, "u").selectExpr(
        "u", "dg", "(sdeg * 1000000) div dg AS knn6"
    )
    return (
        pernode.groupBy("dg")
        .agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.expr(
                "round(CAST(sum(knn6) AS DOUBLE) / count(*)"
                " / 1000000.0, 6) + 0.0"
            ).alias("avg_neighbor_degree"),
        )
        .selectExpr("dg AS degree", "n_nodes", "avg_neighbor_degree")
        .orderBy("degree")
    )


@stage(
    "graph_square_count_c4",
    f"""
    WITH {_GRAPH_SQL},
    wedge AS (
      SELECT a.u AS x, b.v AS y, CAST(count(*) AS BIGINT) AS q
      FROM sym a JOIN sym b ON a.v = b.u AND a.u < b.v
      GROUP BY 1, 2
    ),
    sq AS (
      SELECT CAST(sum(q * (q - 1) // 2) AS BIGINT) AS diag_pairs,
             CAST(count(*) AS BIGINT) AS n_connected_pairs
      FROM wedge
    ),
    es AS (SELECT CAST(count(*) AS BIGINT) // 2 AS n_edges FROM sym)
    SELECT n_edges, n_connected_pairs,
           diag_pairs // 2 AS n_squares
    FROM sq CROSS JOIN es
    """,
)
def q_graph_square_count_c4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 4-cycle (square) count of the interaction graph: every
    unordered node pair (x, y) with q common neighbors closes
    C(q, 2) squares through its diagonal, and each square owns exactly
    2 diagonals — so n_squares = sum C(q,2) / 2, the motif companion
    to the registered triangle count (squares capture bipartite-ish
    clustering that triangles miss). The wedge join is
    sum-of-degrees-squared on the FIXED <= 997-node relation, bounded
    by construction regardless of corpus size; all arithmetic is
    exact integers (q <= 997 keeps q^2 trivially in BIGINT).
    """
    sym, _ = _graph_sym(spark, sf_dir)
    wedge = (
        sym.alias("a")
        .join(
            sym.alias("b"),
            (F.col("a.v") == F.col("b.u"))
            & (F.col("a.u") < F.col("b.v")),
        )
        .groupBy(F.col("a.u").alias("x"), F.col("b.v").alias("y"))
        .agg(F.count("*").cast("long").alias("q"))
    )
    sq = wedge.agg(
        F.expr("CAST(sum(q * (q - 1) div 2) AS BIGINT)").alias(
            "diag_pairs"
        ),
        F.count("*").cast("long").alias("n_connected_pairs"),
    )
    es = sym.agg(
        F.expr("CAST(count(*) AS BIGINT) div 2").alias("n_edges")
    )
    return sq.crossJoin(F.broadcast(es)).selectExpr(
        "n_edges", "n_connected_pairs", "diag_pairs div 2 AS n_squares"
    )


@stage(
    "embedding_participation_ratio",
    """
    WITH e1 AS (
      SELECT embedding AS emb,
             unnest(embedding) AS xa,
             unnest(generate_series(1, len(embedding))) AS a
      FROM embeddings
    ),
    e2 AS (
      SELECT a, CAST(xa AS DOUBLE) AS xa,
             unnest(emb) AS xb,
             unnest(generate_series(1, len(emb))) AS b
      FROM e1
    ),
    cells AS (
      SELECT a, b,
             CAST(sum(CAST(floor(xa * CAST(xb AS DOUBLE) * 1000000.0)
               AS BIGINT)) AS BIGINT) AS c6
      FROM e2 GROUP BY 1, 2
    ),
    agg AS (
      SELECT CAST(sum(CASE WHEN a = b THEN c6 ELSE 0 END) AS BIGINT)
               AS tr,
             sum(c6::HUGEINT * c6) AS den,
             CAST(max(a) AS BIGINT) AS d
      FROM cells
    )
    SELECT d AS n_dims,
           round(CAST(tr::HUGEINT * tr AS DOUBLE)
                 / nullif(CAST(den AS DOUBLE), 0), 6) + 0.0
             AS participation_ratio,
           round(CAST(tr::HUGEINT * tr AS DOUBLE)
                 / nullif(CAST(den AS DOUBLE) * d, 0), 6) + 0.0
             AS pr_over_d
    FROM agg
    """,
)
def q_embedding_participation_ratio(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Participation ratio of the embedding cloud — the eigenvalue-
    free effective dimensionality (tr C)^2 / ||C||_F^2 of the
    uncentered Gram matrix C = X^T X, computable WITHOUT any
    eigendecomposition because ||C||_F^2 = sum_ab C_ab^2: PR = d for
    isotropic clouds, ~1 for rank-collapsed (anisotropic) ones — the
    standard representation-collapse alarm for embedding pipelines.
    Per-row products are floor-quantized to 1e-6 integers (float32
    components are cast to DOUBLE first on BOTH engines — DuckDB would
    otherwise multiply in FLOAT) so the d x d cell sums are exact
    integers; cell squares widen to int128 (C_ab ~ 1e15 at 1e8
    vectors). The double explode is linear in n with a fixed d^2 = 4k
    fan-out, and the 4096-cell groupBy combines map-side.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    e1 = emb.select(
        "embedding",
        F.posexplode("embedding").alias("a0", "xa"),
    )
    e2 = e1.select(
        (F.col("a0") + 1).alias("a"),
        F.col("xa").cast("double").alias("xa"),
        F.posexplode("embedding").alias("b0", "xb"),
    )
    cells = (
        e2.selectExpr(
            "a",
            "b0 + 1 AS b",
            "CAST(floor(xa * CAST(xb AS DOUBLE) * 1000000.0)"
            " AS BIGINT) AS p6",
        )
        .groupBy("a", "b")
        .agg(F.sum("p6").cast("long").alias("c6"))
    )
    agg = cells.agg(
        F.expr(
            "CAST(sum(CASE WHEN a = b THEN c6 ELSE 0 END) AS BIGINT)"
        ).alias("tr"),
        F.expr("sum(CAST(c6 AS DECIMAL(38,0)) * c6)").alias("den"),
        F.max("a").cast("long").alias("d"),
    )
    return agg.selectExpr(
        "d AS n_dims",
        "round(CAST(CAST(tr AS DECIMAL(38,0)) * tr AS DOUBLE)"
        " / nullif(CAST(den AS DOUBLE), 0), 6) + 0.0"
        " AS participation_ratio",
        "round(CAST(CAST(tr AS DECIMAL(38,0)) * tr AS DOUBLE)"
        " / nullif(CAST(den AS DOUBLE) * d, 0), 6) + 0.0"
        " AS pr_over_d",
    )


# ---------------------------------------------------------------------------
# Batch G — robust two-sample / trend / reliability / decomposition
# ---------------------------------------------------------------------------

@stage(
    "brunner_munzel_arms",
    f"""
    WITH {_ARMS_HIST_SQL},
    cum AS (
      SELECT c1, c0,
             CAST(coalesce(sum(c1 + c0) OVER (ORDER BY vm
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cb,
             CAST(coalesce(sum(c1) OVER (ORDER BY vm
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cb1,
             CAST(coalesce(sum(c0) OVER (ORDER BY vm
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cb0
      FROM hist
    ),
    terms AS (
      SELECT c1, c0,
             2 * cb + c1 + c0 + 1 AS dr,
             2 * cb1 + c1 + 1 AS dh1,
             2 * cb0 + c0 + 1 AS dh0
      FROM cum
    ),
    g AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c0) AS BIGINT) AS n0,
             CAST(sum(c1 * dr) AS BIGINT) AS sr1,
             CAST(sum(c0 * dr) AS BIGINT) AS sr0,
             sum(c1::HUGEINT * (dr - dh1)) AS sb1,
             sum(c1::HUGEINT * (dr - dh1) * (dr - dh1)) AS sb1sq,
             sum(c0::HUGEINT * (dr - dh0)) AS sb0,
             sum(c0::HUGEINT * (dr - dh0) * (dr - dh0)) AS sb0sq
      FROM terms
    ),
    s AS (
      SELECT n1, n0,
             (CAST(sb1sq AS DOUBLE)
              - CAST(sb1 AS DOUBLE) * CAST(sb1 AS DOUBLE) / n1)
               / nullif(4.0 * (n1 - 1), 0) AS s1sq,
             (CAST(sb0sq AS DOUBLE)
              - CAST(sb0 AS DOUBLE) * CAST(sb0 AS DOUBLE) / n0)
               / nullif(4.0 * (n0 - 1), 0) AS s0sq,
             (CAST(sr1 AS DOUBLE) / n1 - CAST(sr0 AS DOUBLE) / n0)
               / 2.0 AS rdiff
      FROM g
    )
    SELECT n0, n1,
           round((CAST(sr1 AS DOUBLE) / (2.0 * n1) - (n1 + 1) / 2.0)
                 / n0, 6) + 0.0 AS p_hat,
           round(CAST(n1 AS DOUBLE) * n0 * rdiff / (n1 + n0)
                 / nullif(sqrt(n1 * s1sq + n0 * s0sq), 0), 6) + 0.0
             AS bm_statistic
    FROM s CROSS JOIN (SELECT sr1, sr0 FROM g) gg
    """,
)
def q_brunner_munzel_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brunner-Munzel generalized Wilcoxon test between the user-parity
    arms — the heteroscedasticity-robust replacement for Mann-Whitney
    (valid when the arms differ in variance AND location). Works
    entirely on the value histogram with DOUBLED midranks: each group
    carries its combined midrank dr and within-arm midrank dh, and the
    rank-variance S_i^2 = Var(R - H)/4 comes from two exact int128
    scalars per arm (sum c*(dr-dh), sum c*(dr-dh)^2 — the centered
    square expansion keeps the per-row magnitude at ~9N^3, inside
    DECIMAL(38,0) at 1e8 rows, where the naive n^2-scaled deviation
    form would overflow). p_hat estimates P(X0 < X1) + 0.5*P(=); the
    scipy-convention statistic divides the weighted mean-rank gap by
    sqrt(n1*S1^2 + n0*S0^2). Singleton arms NULL via nullif. One
    histogram shuffle + one bounded window pass.
    """
    hist = _arm_value_hist(spark, sf_dir)
    wb = W.orderBy("vm").rowsBetween(W.unboundedPreceding, -1)
    cum = hist.select(
        "c1",
        "c0",
        F.coalesce(F.sum(F.col("c1") + F.col("c0")).over(wb), F.lit(0))
        .cast("long")
        .alias("cb"),
        F.coalesce(F.sum("c1").over(wb), F.lit(0))
        .cast("long")
        .alias("cb1"),
        F.coalesce(F.sum("c0").over(wb), F.lit(0))
        .cast("long")
        .alias("cb0"),
    )
    terms = cum.selectExpr(
        "c1",
        "c0",
        "2 * cb + c1 + c0 + 1 AS dr",
        "2 * cb1 + c1 + 1 AS dh1",
        "2 * cb0 + c0 + 1 AS dh0",
    )
    g = terms.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c0").cast("long").alias("n0"),
        F.sum(F.col("c1") * F.col("dr")).cast("long").alias("sr1"),
        F.sum(F.col("c0") * F.col("dr")).cast("long").alias("sr0"),
        F.expr(
            "sum(CAST(c1 AS DECIMAL(38,0)) * (dr - dh1))"
        ).alias("sb1"),
        F.expr(
            "sum(CAST(c1 AS DECIMAL(38,0)) * (dr - dh1) * (dr - dh1))"
        ).alias("sb1sq"),
        F.expr(
            "sum(CAST(c0 AS DECIMAL(38,0)) * (dr - dh0))"
        ).alias("sb0"),
        F.expr(
            "sum(CAST(c0 AS DECIMAL(38,0)) * (dr - dh0) * (dr - dh0))"
        ).alias("sb0sq"),
    )
    s = g.selectExpr(
        "n1",
        "n0",
        "sr1",
        "sr0",
        "(CAST(sb1sq AS DOUBLE)"
        " - CAST(sb1 AS DOUBLE) * CAST(sb1 AS DOUBLE) / n1)"
        " / nullif(4.0 * (n1 - 1), 0) AS s1sq",
        "(CAST(sb0sq AS DOUBLE)"
        " - CAST(sb0 AS DOUBLE) * CAST(sb0 AS DOUBLE) / n0)"
        " / nullif(4.0 * (n0 - 1), 0) AS s0sq",
        "(CAST(sr1 AS DOUBLE) / n1 - CAST(sr0 AS DOUBLE) / n0)"
        " / 2.0 AS rdiff",
    )
    return s.selectExpr(
        "n0",
        "n1",
        "round((CAST(sr1 AS DOUBLE) / (2.0 * n1) - (n1 + 1) / 2.0)"
        " / n0, 6) + 0.0 AS p_hat",
        "round(CAST(n1 AS DOUBLE) * n0 * rdiff / (n1 + n0)"
        " / nullif(sqrt(n1 * s1sq + n0 * s0sq), 0), 6) + 0.0"
        " AS bm_statistic",
    )


@stage(
    "icc_oneway_user_values",
    """
    WITH v AS (
      SELECT user_id,
             CAST(floor(value * 1000) AS BIGINT) AS vm
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(vm) AS BIGINT) AS s,
             sum(vm::HUGEINT * vm) AS ss
      FROM v GROUP BY 1 HAVING count(*) >= 1
    ),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS j,
             CAST(sum(n) AS BIGINT) AS nt,
             CAST(sum(s) AS BIGINT) AS st,
             sum(ss) AS sst,
             sum(n::HUGEINT * ((s * 1000) // n) * ((s * 1000) // n))
               AS sq6,
             CAST(sum(n * n) AS BIGINT) AS nsq
      FROM g
    ),
    ms AS (
      SELECT j, nt,
             (CAST(sq6 AS DOUBLE) / 1000000.0
              - CAST(st AS DOUBLE) * st / nt)
               / nullif(CAST(j - 1 AS DOUBLE), 0) AS msb,
             (CAST(sst AS DOUBLE) - CAST(sq6 AS DOUBLE) / 1000000.0)
               / nullif(CAST(nt - j AS DOUBLE), 0) AS msw,
             (CAST(nt AS DOUBLE) - CAST(nsq AS DOUBLE) / nt)
               / nullif(CAST(j - 1 AS DOUBLE), 0) AS k0
      FROM t
    )
    SELECT j AS n_subjects, nt AS n_values,
           round(k0, 6) + 0.0 AS k0,
           round((msb - msw) / nullif(msb + (k0 - 1.0) * msw, 0), 6)
             + 0.0 AS icc1
    FROM ms
    """,
)
def q_icc_oneway_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way random-effects intraclass correlation ICC(1) of event
    values within users — how much of the value variance is
    between-user (a repeatability / reliability staple, and the
    design-effect input for clustered sampling). Unequal group sizes
    use the standard k0 = (N - sum n_j^2 / N)/(J-1) correction. The
    between-groups sum sum(n_j * mean_j^2) is kept DETERMINISTIC at
    any group count by quantizing each group mean to the exact
    integer (s*1000) // n (so per-group terms are int128 integers,
    never a float sum whose accumulation order drifts past 6dp at
    100k+ users — the round-7 digest rule; s*1000 stays inside BIGINT
    where a raw s^2 quotient would not). Single-user or constant
    inputs NULL via nullif. One
    per-user groupBy + one scalar aggregate.
    """
    v = (
        _events(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .selectExpr(
            "user_id", "CAST(floor(value * 1000) AS BIGINT) AS vm"
        )
    )
    g = v.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("vm").cast("long").alias("s"),
        F.expr("sum(CAST(vm AS DECIMAL(38,0)) * vm)").alias("ss"),
    )
    t = g.agg(
        F.count("*").cast("long").alias("j"),
        F.sum("n").cast("long").alias("nt"),
        F.sum("s").cast("long").alias("st"),
        F.sum("ss").alias("sst"),
        F.expr(
            "sum(CAST(n AS DECIMAL(38,0)) * ((s * 1000) div n)"
            " * ((s * 1000) div n))"
        ).alias("sq6"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("nsq"),
    )
    ms = t.selectExpr(
        "j",
        "nt",
        "(CAST(sq6 AS DOUBLE) / 1000000.0"
        " - CAST(st AS DOUBLE) * st / nt)"
        " / nullif(CAST(j - 1 AS DOUBLE), 0) AS msb",
        "(CAST(sst AS DOUBLE) - CAST(sq6 AS DOUBLE) / 1000000.0)"
        " / nullif(CAST(nt - j AS DOUBLE), 0) AS msw",
        "(CAST(nt AS DOUBLE) - CAST(nsq AS DOUBLE) / nt)"
        " / nullif(CAST(j - 1 AS DOUBLE), 0) AS k0",
    )
    return ms.selectExpr(
        "j AS n_subjects",
        "nt AS n_values",
        "round(k0, 6) + 0.0 AS k0",
        "round((msb - msw) / nullif(msb + (k0 - 1.0) * msw, 0), 6)"
        " + 0.0 AS icc1",
    )


# floor(ln(k)*1e6) literals for k = 1, 2, 4, 8 — shared by both
# engines so no runtime libm enters the slope's x-axis.
_VT_LNK = {1: 0, 2: 693147, 4: 1386294, 8: 2079441}


@stage(
    "variance_time_slope_hourly",
    f"""
    WITH {_HOURLY_GRID_SQL},
    grp AS (
      SELECT m, (idx - 1) // m AS g,
             CAST(sum(y) AS BIGINT) AS sg,
             CAST(count(*) AS BIGINT) AS cnt
      FROM z CROSS JOIN (SELECT unnest([1, 2, 4, 8]) AS m)
      GROUP BY 1, 2
    ),
    vk AS (
      SELECT m,
             CAST(count(*) AS BIGINT) AS kk,
             CAST(sum(sg) AS BIGINT) AS s1,
             sum(sg::HUGEINT * sg) AS s2
      FROM grp WHERE cnt = m GROUP BY 1
    ),
    lv AS (
      SELECT m,
             CASE m WHEN 1 THEN 0 WHEN 2 THEN 693147
                    WHEN 4 THEN 1386294 ELSE 2079441 END AS lx,
             CAST(floor(ln((CAST(kk AS DOUBLE) * CAST(s2 AS DOUBLE)
                  - CAST(s1 AS DOUBLE) * s1)
                  / (CAST(m AS DOUBLE) * m * kk * (kk - 1)))
                * 1000000.0) AS BIGINT) AS ly
      FROM vk WHERE kk >= 2
        AND CAST(kk AS DOUBLE) * CAST(s2 AS DOUBLE)
            - CAST(s1 AS DOUBLE) * s1 > 0
    ),
    sl AS (
      SELECT CAST(count(*) AS BIGINT) AS np,
             CAST(sum(lx) AS BIGINT) AS sx,
             CAST(sum(ly) AS BIGINT) AS sy,
             sum(lx::HUGEINT * ly) AS sxy,
             sum(lx::HUGEINT * lx) AS sxx
      FROM lv
    )
    SELECT np AS n_points,
           round(CAST(np::HUGEINT * sxy - sx::HUGEINT * sy AS DOUBLE)
                 / nullif(CAST(np::HUGEINT * sxx - sx::HUGEINT * sx
                   AS DOUBLE), 0), 6) + 0.0 AS vt_slope,
           round(1.0 + CAST(np::HUGEINT * sxy - sx::HUGEINT * sy
                   AS DOUBLE)
                 / nullif(CAST(np::HUGEINT * sxx - sx::HUGEINT * sx
                   AS DOUBLE), 0) / 2.0, 6) + 0.0 AS hurst_vt
    FROM sl
    """,
)
def q_variance_time_slope_hourly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Aggregated-variance (variance-time) long-range-dependence
    estimate on the hourly count series: the sample variance of
    non-overlapping k-hour block MEANS for k = 1, 2, 4, 8, and the
    OLS slope of ln(var) against ln(k) — slope ~ -1 for short-memory
    series, shallower for long memory; H_vt = 1 + slope/2 is the
    variance-time Hurst estimate, methodologically independent of the
    registered R/S estimator. Block variances are exact rationals
    from integer block sums ((K*sum(S^2) - (sum S)^2) / (m^2*K*(K-1)),
    int128-widened); ln lands on a floor-quantized 1e-6 integer grid
    and the x-axis uses PRECOMPUTED ln(k) literals, so the 4-point
    regression is exact integer arithmetic (the nb_lang micro-log
    pattern). Zero-variance or single-block scales drop
    deterministically; fewer than 2 surviving points NULL the slope.
    """
    z = _bucket_grid(spark, sf_dir, 3600)
    ms = spark.range(1).selectExpr("explode(array(1, 2, 4, 8)) AS m")
    grp = (
        z.crossJoin(F.broadcast(ms))
        .selectExpr("m", "(idx - 1) div m AS g", "y")
        .groupBy("m", "g")
        .agg(
            F.sum("y").cast("long").alias("sg"),
            F.count("*").cast("long").alias("cnt"),
        )
    )
    vk = (
        grp.where("cnt = m")
        .groupBy("m")
        .agg(
            F.count("*").cast("long").alias("kk"),
            F.sum("sg").cast("long").alias("s1"),
            F.expr("sum(CAST(sg AS DECIMAL(38,0)) * sg)").alias("s2"),
        )
    )
    lv = (
        vk.where(
            "kk >= 2 AND CAST(kk AS DOUBLE) * CAST(s2 AS DOUBLE)"
            " - CAST(s1 AS DOUBLE) * s1 > 0"
        )
        .selectExpr(
            "m",
            "CASE m WHEN 1 THEN 0 WHEN 2 THEN 693147"
            " WHEN 4 THEN 1386294 ELSE 2079441 END AS lx",
            "CAST(floor(ln((CAST(kk AS DOUBLE) * CAST(s2 AS DOUBLE)"
            " - CAST(s1 AS DOUBLE) * s1)"
            " / (CAST(m AS DOUBLE) * m * kk * (kk - 1)))"
            " * 1000000.0) AS BIGINT) AS ly",
        )
    )
    sl = lv.agg(
        F.count("*").cast("long").alias("np"),
        F.sum("lx").cast("long").alias("sx"),
        F.sum("ly").cast("long").alias("sy"),
        F.expr("sum(CAST(lx AS DECIMAL(38,0)) * ly)").alias("sxy"),
        F.expr("sum(CAST(lx AS DECIMAL(38,0)) * lx)").alias("sxx"),
    )
    slope = (
        "CAST(CAST(np AS DECIMAL(38,0)) * sxy"
        " - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)"
        " / nullif(CAST(CAST(np AS DECIMAL(38,0)) * sxx"
        " - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE), 0)"
    )
    return sl.selectExpr(
        "np AS n_points",
        f"round({slope}, 6) + 0.0 AS vt_slope",
        f"round(1.0 + {slope} / 2.0, 6) + 0.0 AS hurst_vt",
    )


@stage(
    "clv_heuristic_by_segment",
    """
    WITH cust AS (
      SELECT o_custkey AS cust,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS cents,
             CAST(max(year(o_orderdate) * 12 + month(o_orderdate))
               - min(year(o_orderdate) * 12 + month(o_orderdate)) + 1
               AS BIGINT) AS months
      FROM orders GROUP BY 1
    ),
    seg AS (
      SELECT CASE WHEN n_orders = 1 THEN '1_one'
                  WHEN n_orders <= 3 THEN '2_few'
                  ELSE '3_many' END AS segment,
             n_orders, cents, months
      FROM cust
    )
    SELECT segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(n_orders) AS BIGINT) AS n_orders,
           round(CAST(sum(cents) AS DOUBLE) / 100.0
                 / nullif(CAST(sum(n_orders) AS DOUBLE), 0), 6) + 0.0
             AS avg_order_value,
           round(CAST(sum(n_orders) AS DOUBLE)
                 / nullif(CAST(sum(months) AS DOUBLE), 0), 6) + 0.0
             AS orders_per_active_month,
           round(CAST(sum(cents) AS DOUBLE) / 100.0
                 / nullif(CAST(sum(n_orders) AS DOUBLE), 0)
                 * (CAST(sum(n_orders) AS DOUBLE)
                    / nullif(CAST(sum(months) AS DOUBLE), 0))
                 * 24.0, 6) + 0.0 AS clv_24m
    FROM seg GROUP BY 1 ORDER BY 1
    """,
)
def q_clv_heuristic_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic 24-month customer-lifetime-value per frequency
    segment: segment-level average order value times orders-per-
    active-month times a 24-month horizon — the standard back-of-
    envelope CLV triangulation before a BG/NBD model earns its keep.
    Active months are the inclusive calendar month span (exact
    integer y*12+m arithmetic); revenue is exact on the cent grid;
    every output is a ratio of integer sums. One per-customer groupBy
    + one 3-row segment rollup.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.expr(
            "CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))"
            " AS BIGINT)"
        ).alias("cents"),
        F.expr(
            "CAST(max(year(o_orderdate) * 12 + month(o_orderdate))"
            " - min(year(o_orderdate) * 12 + month(o_orderdate)) + 1"
            " AS BIGINT)"
        ).alias("months"),
    )
    seg = cust.selectExpr(
        "CASE WHEN n_orders = 1 THEN '1_one'"
        " WHEN n_orders <= 3 THEN '2_few'"
        " ELSE '3_many' END AS segment",
        "n_orders",
        "cents",
        "months",
    )
    return (
        seg.groupBy("segment")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.expr(
                "round(CAST(sum(cents) AS DOUBLE) / 100.0"
                " / nullif(CAST(sum(n_orders) AS DOUBLE), 0), 6) + 0.0"
            ).alias("avg_order_value"),
            F.expr(
                "round(CAST(sum(n_orders) AS DOUBLE)"
                " / nullif(CAST(sum(months) AS DOUBLE), 0), 6) + 0.0"
            ).alias("orders_per_active_month"),
            F.expr(
                "round(CAST(sum(cents) AS DOUBLE) / 100.0"
                " / nullif(CAST(sum(n_orders) AS DOUBLE), 0)"
                " * (CAST(sum(n_orders) AS DOUBLE)"
                " / nullif(CAST(sum(months) AS DOUBLE), 0))"
                " * 24.0, 6) + 0.0"
            ).alias("clv_24m"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# Batch H — BWS, sequence complexity, independence, multimodal tone energy
# ---------------------------------------------------------------------------

@stage(
    "bws_test_arms",
    f"""
    WITH {_ARMS_HIST_SQL},
    cum AS (
      SELECT c1, c0,
             CAST(coalesce(sum(c1 + c0) OVER (ORDER BY vm
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cb,
             CAST(coalesce(sum(c1) OVER (ORDER BY vm
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cb1,
             CAST(coalesce(sum(c0) OVER (ORDER BY vm
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cb0
      FROM hist
    ),
    tot AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c0) AS BIGINT) AS n0
      FROM hist
    ),
    m1 AS (
      SELECT 2 * cb + c1 + c0 + 1 AS dr, cb1, c1 FROM cum
      WHERE c1 > 0
    ),
    i1 AS (
      SELECT dr, unnest(generate_series(cb1 + 1, cb1 + c1)) AS i
      FROM m1
    ),
    t1 AS (
      SELECT CAST(sum(CAST(floor(
               CAST(n1::HUGEINT * dr
                    - 2 * (n1 + n0)::HUGEINT * i AS DOUBLE)
               * CAST(n1::HUGEINT * dr
                    - 2 * (n1 + n0)::HUGEINT * i AS DOUBLE)
               * (n1 + 1) * (n1 + 1)
               / (4.0 * n1 * n0 * (n1 + n0))
               / (CAST(i AS DOUBLE) * (n1 + 1 - i))
               * 1000000.0) AS BIGINT)) AS BIGINT) AS s6
      FROM i1 CROSS JOIN tot
    ),
    m0 AS (
      SELECT 2 * cb + c1 + c0 + 1 AS dr, cb0, c0 FROM cum
      WHERE c0 > 0
    ),
    i0 AS (
      SELECT dr, unnest(generate_series(cb0 + 1, cb0 + c0)) AS i
      FROM m0
    ),
    t0 AS (
      SELECT CAST(sum(CAST(floor(
               CAST(n0::HUGEINT * dr
                    - 2 * (n1 + n0)::HUGEINT * i AS DOUBLE)
               * CAST(n0::HUGEINT * dr
                    - 2 * (n1 + n0)::HUGEINT * i AS DOUBLE)
               * (n0 + 1) * (n0 + 1)
               / (4.0 * n0 * n1 * (n1 + n0))
               / (CAST(i AS DOUBLE) * (n0 + 1 - i))
               * 1000000.0) AS BIGINT)) AS BIGINT) AS s6
      FROM i0 CROSS JOIN tot
    )
    SELECT n0, n1,
           round(CAST(t1.s6 AS DOUBLE) / n1 / 1000000.0, 6) + 0.0
             AS b_arm1,
           round(CAST(t0.s6 AS DOUBLE) / n0 / 1000000.0, 6) + 0.0
             AS b_arm0,
           round((CAST(t1.s6 AS DOUBLE) / n1
                  + CAST(t0.s6 AS DOUBLE) / n0) / 2.0 / 1000000.0, 6)
             + 0.0 AS bws_b
    FROM t1 CROSS JOIN t0 CROSS JOIN tot
    """,
)
def q_bws_test_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baumgartner-Weiss-Schindler two-sample test between the
    user-parity arms: B = (B_X + B_Y)/2 with each arm's B averaging
    the squared standardized rank gaps (R_i - (m+n)/n * i)^2 against
    the Brownian-bridge variance i(n+1-i) — more sensitive to tail
    differences than KS or MW-U. The per-member expansion is a
    linear-size unnest over the histogram's within-arm index ranges
    (each tied member shares its group's doubled midrank dr, so the
    numerator difference n*dr - 2(m+n)i stays exact in int128 and is
    squared in DOUBLE — its square would pass 1e38 at the design
    point); each
    member's term is floor-quantized to 1e-6 before summation, making
    the cross-member sum exact integer arithmetic at any n (the
    round-7 digest rule). Half the doubled midrank enters as dr/2
    through the 2i scaling, the classical definition under midrank
    ties. One histogram pass + one linear unnest per arm.
    """
    hist = _arm_value_hist(spark, sf_dir)
    wb = W.orderBy("vm").rowsBetween(W.unboundedPreceding, -1)
    cum = hist.select(
        "c1",
        "c0",
        F.coalesce(F.sum(F.col("c1") + F.col("c0")).over(wb), F.lit(0))
        .cast("long")
        .alias("cb"),
        F.coalesce(F.sum("c1").over(wb), F.lit(0))
        .cast("long")
        .alias("cb1"),
        F.coalesce(F.sum("c0").over(wb), F.lit(0))
        .cast("long")
        .alias("cb0"),
    )
    tot = hist.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c0").cast("long").alias("n0"),
    )

    def _arm_sum(cn, cbn, n_self, n_other):
        m = cum.where(f"{cn} > 0").selectExpr(
            "2 * cb + c1 + c0 + 1 AS dr", cbn, cn
        )
        i_rel = m.select(
            "dr",
            F.explode(
                F.sequence(
                    F.col(cbn) + 1, F.col(cbn) + F.col(cn)
                )
            ).alias("i"),
        )
        return i_rel.crossJoin(F.broadcast(tot)).agg(
            F.expr(
                "CAST(sum(CAST(floor("
                f"CAST(CAST({n_self} AS DECIMAL(38,0)) * dr"
                f" - 2 * CAST(n1 + n0 AS DECIMAL(38,0)) * i AS DOUBLE)"
                f" * CAST(CAST({n_self} AS DECIMAL(38,0)) * dr"
                f" - 2 * CAST(n1 + n0 AS DECIMAL(38,0)) * i AS DOUBLE)"
                f" * ({n_self} + 1) * ({n_self} + 1)"
                f" / (4.0 * {n_self} * {n_other} * (n1 + n0))"
                f" / (CAST(i AS DOUBLE) * ({n_self} + 1 - i))"
                " * 1000000.0) AS BIGINT)) AS BIGINT)"
            ).alias("s6")
        )

    t1 = _arm_sum("c1", "cb1", "n1", "n0")
    t0 = _arm_sum("c0", "cb0", "n0", "n1")
    return (
        t1.selectExpr("s6 AS s6a")
        .crossJoin(F.broadcast(t0.selectExpr("s6 AS s6b")))
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "n0",
            "n1",
            "round(CAST(s6a AS DOUBLE) / n1 / 1000000.0, 6) + 0.0"
            " AS b_arm1",
            "round(CAST(s6b AS DOUBLE) / n0 / 1000000.0, 6) + 0.0"
            " AS b_arm0",
            "round((CAST(s6a AS DOUBLE) / n1"
            " + CAST(s6b AS DOUBLE) / n0) / 2.0 / 1000000.0, 6)"
            " + 0.0 AS bws_b",
        )
    )


@stage(
    "g_test_type_arm_independence",
    """
    WITH c AS (
      SELECT event_type, user_id % 2 AS arm,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS r
           FROM c GROUP BY 1),
    ct AS (SELECT arm, CAST(sum(n) AS BIGINT) AS k FROM c GROUP BY 1),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
                   CAST(count(DISTINCT event_type) AS BIGINT) AS nr,
                   CAST(count(DISTINCT arm) AS BIGINT) AS nc
            FROM c)
    SELECT nt AS n_events,
           (nr - 1) * (nc - 1) AS df,
           round(2.0 * sum(n * ln(CAST(n AS DOUBLE) * nt
                 / (CAST(r AS DOUBLE) * k))), 6) + 0.0 AS g2
    FROM c
    JOIN rt USING (event_type) JOIN ct USING (arm) CROSS JOIN tot
    GROUP BY nt, nr, nc
    """,
)
def q_g_test_type_arm_independence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """G-test (log-likelihood ratio) of independence between event
    type and the user-parity arm: G2 = 2*sum O*ln(O*N/(R*C)) over the
    type x arm contingency table — the likelihood-based sibling of the
    registered Pearson chi-square operator, preferred when expected
    counts are small or when G2 values must ADD across partitions
    (chi2 doesn't decompose; G2 does, which matters when sharding the
    test across data slices). Observed cells and margins are exact
    integers; ln runs over the ~10-cell bounded relation (the markov
    precedent). Empty cells never appear (groupBy only materializes
    observed cells, matching the 0*ln(0) = 0 convention).
    """
    ev = _events(spark, sf_dir)
    c = ev.groupBy(
        "event_type", (F.col("user_id") % 2).alias("arm")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    rt = c.groupBy("event_type").agg(F.sum("n").cast("long").alias("r"))
    ct = c.groupBy("arm").agg(F.sum("n").cast("long").alias("k"))
    tot = c.agg(
        F.sum("n").cast("long").alias("nt"),
        F.countDistinct("event_type").cast("long").alias("nr"),
        F.countDistinct("arm").cast("long").alias("nc"),
    )
    return (
        c.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "arm")
        .crossJoin(F.broadcast(tot))
        .groupBy("nt", "nr", "nc")
        .agg(
            F.expr(
                "round(2.0 * sum(n * ln(CAST(n AS DOUBLE) * nt"
                " / (CAST(r AS DOUBLE) * k))), 6) + 0.0"
            ).alias("g2")
        )
        .selectExpr(
            "nt AS n_events", "(nr - 1) * (nc - 1) AS df", "g2"
        )
    )


@stage(
    "audio_goertzel_tone_energy",
    """
    WITH d AS (
      SELECT lang, substr(text, 1, 60) AS s FROM documents
      WHERE length(text) >= 60
    ),
    pw AS (
      SELECT lang,
             list_reduce(list_prepend(CAST(8192 * 16384 + 8192
                 AS BIGINT), range(1, 61)),
               (st, j) -> (ascii(substr(s, CAST(j AS INT), 1))
                           + 1 * ((st // 16384) - 8192)
                           - ((st % 16384) - 8192) + 8192) * 16384
                          + (st // 16384)) AS e10,
             list_reduce(list_prepend(CAST(8192 * 16384 + 8192
                 AS BIGINT), range(1, 61)),
               (st, j) -> (ascii(substr(s, CAST(j AS INT), 1))
                           + 0 * ((st // 16384) - 8192)
                           - ((st % 16384) - 8192) + 8192) * 16384
                          + (st // 16384)) AS e15,
             list_reduce(list_prepend(CAST(8192 * 16384 + 8192
                 AS BIGINT), range(1, 61)),
               (st, j) -> (ascii(substr(s, CAST(j AS INT), 1))
                           + (-1) * ((st // 16384) - 8192)
                           - ((st % 16384) - 8192) + 8192) * 16384
                          + (st // 16384)) AS e20
      FROM d
    ),
    p AS (
      SELECT lang,
             ((e10 // 16384) - 8192) * ((e10 // 16384) - 8192)
             + ((e10 % 16384) - 8192) * ((e10 % 16384) - 8192)
             - 1 * ((e10 // 16384) - 8192) * ((e10 % 16384) - 8192)
               AS p10,
             ((e15 // 16384) - 8192) * ((e15 // 16384) - 8192)
             + ((e15 % 16384) - 8192) * ((e15 % 16384) - 8192)
               AS p15,
             ((e20 // 16384) - 8192) * ((e20 // 16384) - 8192)
             + ((e20 % 16384) - 8192) * ((e20 % 16384) - 8192)
             + 1 * ((e20 // 16384) - 8192) * ((e20 % 16384) - 8192)
               AS p20
      FROM pw
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(p10) AS DOUBLE) / count(*), 6) + 0.0
             AS mean_power_fs6,
           round(CAST(sum(p15) AS DOUBLE) / count(*), 6) + 0.0
             AS mean_power_fs4,
           round(CAST(sum(p20) AS DOUBLE) / count(*), 6) + 0.0
             AS mean_power_fs3
    FROM p GROUP BY 1 ORDER BY 1
    """,
)
def q_audio_goertzel_tone_energy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Goertzel tone-energy extraction over the deterministic fake-PCM
    payloads (text bytes as 8-bit samples, the audio_feature_extraction
    convention): single-bin DFT power at fs/6, fs/4 and fs/3 over a
    60-sample window. The three bins are chosen so the Goertzel
    coefficient 2*cos(2*pi*k/60) is EXACTLY 1, 0 and -1 — the entire
    recurrence s_j = x_j + c*s_{j-1} - s_{j-2} is then pure BIGINT
    arithmetic (|s| <= 60*127 < 2^13, so the (s1, s2) state packs into
    one integer as (s1+8192)*16384 + (s2+8192) and the fold is a
    sequential integer reduce on both engines — zero floats until the
    final per-lang mean of exact integer powers P = s1^2 + s2^2 -
    c*s1*s2). Real decode stays PIL/wave-gated elsewhere; this is the
    Spark-side spectral plumbing with an exactly-replayable oracle.
    """
    docs = _documents(spark, sf_dir)
    d = docs.selectExpr("lang", "substr(text, 1, 60) AS s").where(
        "length(s) >= 60"
    )

    def fold(c: int) -> str:
        return (
            "aggregate(sequence(1, 60),"
            " CAST(8192 * 16384 + 8192 AS BIGINT),"
            " (st, j) -> (ascii(substr(s, CAST(j AS INT), 1))"
            f" + ({c}) * ((st div 16384) - 8192)"
            " - ((st % 16384) - 8192) + 8192) * 16384"
            " + (st div 16384))"
        )

    pw = d.selectExpr(
        "lang",
        f"{fold(1)} AS e10",
        f"{fold(0)} AS e15",
        f"{fold(-1)} AS e20",
    )
    p = pw.selectExpr(
        "lang",
        "((e10 div 16384) - 8192) * ((e10 div 16384) - 8192)"
        " + ((e10 % 16384) - 8192) * ((e10 % 16384) - 8192)"
        " - 1 * ((e10 div 16384) - 8192) * ((e10 % 16384) - 8192)"
        " AS p10",
        "((e15 div 16384) - 8192) * ((e15 div 16384) - 8192)"
        " + ((e15 % 16384) - 8192) * ((e15 % 16384) - 8192) AS p15",
        "((e20 div 16384) - 8192) * ((e20 div 16384) - 8192)"
        " + ((e20 % 16384) - 8192) * ((e20 % 16384) - 8192)"
        " + 1 * ((e20 div 16384) - 8192) * ((e20 % 16384) - 8192)"
        " AS p20",
    )
    return (
        p.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr(
                "round(CAST(sum(p10) AS DOUBLE) / count(*), 6) + 0.0"
            ).alias("mean_power_fs6"),
            F.expr(
                "round(CAST(sum(p15) AS DOUBLE) / count(*), 6) + 0.0"
            ).alias("mean_power_fs4"),
            F.expr(
                "round(CAST(sum(p20) AS DOUBLE) / count(*), 6) + 0.0"
            ).alias("mean_power_fs3"),
        )
        .orderBy("lang")
    )


@stage(
    "lempel_ziv_complexity_6h",
    f"""
    WITH {_SIXH_GRID_SQL},
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS sy
      FROM z
    ),
    bits AS (
      SELECT idx,
             CASE WHEN y * n > sy THEN '1' ELSE '0' END AS b
      FROM z CROSS JOIN tot
    ),
    str AS (
      SELECT string_agg(b, '' ORDER BY idx) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM bits
    ),
    lz AS (
      SELECT n, s,
             list_reduce(list_prepend(CAST(10000000 + 2 AS BIGINT),
                 range(2, CAST(n + 1 AS BIGINT))),
               (st, j) -> CASE
                 WHEN st % 10000000 > j THEN st
                 WHEN instr(substr(s, 1, CAST(j - 1 AS INT)),
                        substr(s, CAST(st % 10000000 AS INT),
                               CAST(j - st % 10000000 + 1 AS INT))) > 0
                   THEN st
                 ELSE (st // 10000000 + 1) * 10000000 + j + 1
               END) AS enc
      FROM str
    )
    SELECT n AS n_symbols,
           CAST(enc // 10000000
                + CASE WHEN enc % 10000000 <= n THEN 1 ELSE 0 END
             AS BIGINT) AS lz_complexity,
           round(CAST(enc // 10000000
                 + CASE WHEN enc % 10000000 <= n THEN 1 ELSE 0 END
               AS DOUBLE) * ln(CAST(n AS DOUBLE)) / ln(2.0) / n, 6)
             + 0.0 AS lz_normalized
    FROM lz
    """,
)
def q_lempel_ziv_complexity_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaspar-Schuster Lempel-Ziv complexity of the above-mean
    binarization of the 6-hour count series: the number of distinct
    phrases an exhaustive-history parse needs (low for rhythmic load,
    approaching n*ln2/ln(n) for algorithmically random load) — the
    complexity companion to sample/permutation entropy that sees
    STRUCTURE, not just distribution. Binarization compares exact
    integers (y*n > sum); the parse is a sequential integer fold whose
    (phrase_count, phrase_start) state packs as c*1e7 + p (the 1e7
    base clears even the 114-year design-point series of ~1.7e5 6h
    buckets), with substring containment via instr on both engines
    and the standard trailing-phrase increment. The fold is O(n) steps
    of O(n) substring search on ONE scalar row — the series, not the
    events, carries the quadratic.
    """
    z = _bucket_grid(spark, sf_dir, 21600)
    tot = z.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
    )
    bits = z.crossJoin(F.broadcast(tot)).selectExpr(
        "idx", "CASE WHEN y * n > sy THEN '1' ELSE '0' END AS b"
    )
    s = bits.agg(
        F.expr(
            "array_join(transform(array_sort(collect_list("
            "struct(idx, b))), x -> x.b), '')"
        ).alias("s"),
        F.count("*").cast("long").alias("n"),
    )
    lz = s.selectExpr(
        "n",
        "s",
        "aggregate(CASE WHEN n >= 2 THEN"
        " sequence(CAST(2 AS BIGINT), n)"
        " ELSE CAST(array() AS ARRAY<BIGINT>) END,"
        " CAST(10000000 + 2 AS BIGINT),"
        " (st, j) -> CASE"
        " WHEN st % 10000000 > j THEN st"
        " WHEN instr(substr(s, 1, CAST(j - 1 AS INT)),"
        " substr(s, CAST(st % 10000000 AS INT),"
        " CAST(j - st % 10000000 + 1 AS INT))) > 0"
        " THEN st"
        " ELSE (st div 10000000 + 1) * 10000000 + j + 1"
        " END) AS enc",
    )
    return lz.selectExpr(
        "n AS n_symbols",
        "CAST(enc div 10000000"
        " + CASE WHEN enc % 10000000 <= n THEN 1 ELSE 0 END"
        " AS BIGINT) AS lz_complexity",
        "round(CAST(enc div 10000000"
        " + CASE WHEN enc % 10000000 <= n THEN 1 ELSE 0 END"
        " AS DOUBLE) * ln(CAST(n AS DOUBLE)) / ln(2.0) / n, 6)"
        " + 0.0 AS lz_normalized",
    )


# ---------------------------------------------------------------------------
# Batch I — DFA, aging mix, norm profile, always-valid AB, mix drift,
# link-prediction calibration
# ---------------------------------------------------------------------------

@stage(
    "dfa_alpha_hourly",
    f"""
    WITH {_HOURLY_GRID_SQL},
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s
      FROM z
    ),
    prof AS (
      SELECT CAST(row_number() OVER (ORDER BY idx) AS BIGINT) AS k,
             CAST(n * (sum(y) OVER (ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               - (row_number() OVER (ORDER BY idx)) * s AS BIGINT)
               AS np,
             n
      FROM z CROSS JOIN tot
    ),
    boxed AS (
      SELECT m, (k - 1) // m AS g, k - ((k - 1) // m) * m AS x, np, n
      FROM prof CROSS JOIN (SELECT unnest([8, 16, 32]) AS m)
    ),
    box AS (
      SELECT m, g, any_value(n) AS n,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(np) AS BIGINT) AS sp,
             sum(np::HUGEINT * np) AS spp,
             sum(x::HUGEINT * np) AS sxp
      FROM boxed GROUP BY 1, 2
    ),
    rss AS (
      SELECT m, n,
             CAST(floor(((CAST(spp AS DOUBLE)
                   - CAST(sp AS DOUBLE) * sp / m)
                 - (CAST(sxp AS DOUBLE)
                    - (m + 1) / 2.0 * CAST(sp AS DOUBLE))
                   * (CAST(sxp AS DOUBLE)
                      - (m + 1) / 2.0 * CAST(sp AS DOUBLE))
                   / (CAST(m AS DOUBLE) * (m * m - 1) / 12.0))
                 / (CAST(n AS DOUBLE) * n) * 1000000.0) AS BIGINT)
               AS r6
      FROM box WHERE cnt = m
    ),
    f2 AS (
      SELECT m, CAST(count(*) AS BIGINT) AS kk,
             CAST(sum(r6) AS BIGINT) AS sr6
      FROM rss GROUP BY 1
    ),
    pts AS (
      SELECT CASE m WHEN 8 THEN 2079441 WHEN 16 THEN 2772588
                    ELSE 3465735 END AS lx,
             CAST(floor(ln(CAST(sr6 AS DOUBLE)
                   / (1000000.0 * kk * m)) * 1000000.0) AS BIGINT)
               AS ly
      FROM f2 WHERE kk >= 2 AND sr6 > 0
    ),
    sl AS (
      SELECT CAST(count(*) AS BIGINT) AS np_,
             CAST(sum(lx) AS BIGINT) AS sx,
             CAST(sum(ly) AS BIGINT) AS sy,
             sum(lx::HUGEINT * ly) AS sxy,
             sum(lx::HUGEINT * lx) AS sxx
      FROM pts
    )
    SELECT np_ AS n_scales,
           round(CAST(np_::HUGEINT * sxy - sx::HUGEINT * sy AS DOUBLE)
                 / nullif(CAST(np_::HUGEINT * sxx - sx::HUGEINT * sx
                   AS DOUBLE), 0) / 2.0, 6) + 0.0 AS dfa_alpha
    FROM sl
    """,
)
def q_dfa_alpha_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detrended fluctuation analysis of the hourly count series at
    box sizes 8/16/32: the integrated profile is detrended per box by
    an OLS line and alpha is half the slope of ln F^2 against ln m —
    the third, mutually-independent long-range-dependence estimate
    next to the registered R/S and the staged variance-time slope
    (agreement across the three is the standard LRD robustness
    check). The n-scaled profile nP_k = n*cumsum - k*S is exact
    BIGINT; per-box moment sums are int128; each box's residual SS is
    one identical double expression floor-quantized to micro units
    before the cross-box sum (round-7 rule), and the 3-point log
    regression reuses the variance-time literal-ln(m) machinery.
    Partial trailing boxes and degenerate scales drop
    deterministically; fewer than 2 surviving scales NULL alpha.
    """
    z = _bucket_grid(spark, sf_dir, 3600)
    tot = z.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
    )
    wcum = W.orderBy("idx").rowsBetween(W.unboundedPreceding, W.currentRow)
    prof = z.crossJoin(F.broadcast(tot)).select(
        F.row_number().over(W.orderBy("idx")).cast("long").alias("k"),
        (
            F.col("n") * F.sum("y").over(wcum)
            - F.row_number().over(W.orderBy("idx")) * F.col("s")
        )
        .cast("long")
        .alias("np"),
        "n",
    )
    ms = spark.range(1).selectExpr("explode(array(8, 16, 32)) AS m")
    boxed = prof.crossJoin(F.broadcast(ms)).selectExpr(
        "m",
        "(k - 1) div m AS g",
        "k - ((k - 1) div m) * m AS x",
        "np",
        "n",
    )
    box = boxed.groupBy("m", "g").agg(
        F.first("n").alias("n"),
        F.count("*").cast("long").alias("cnt"),
        F.sum("np").cast("long").alias("sp"),
        F.expr("sum(CAST(np AS DECIMAL(38,0)) * np)").alias("spp"),
        F.expr("sum(CAST(x AS DECIMAL(38,0)) * np)").alias("sxp"),
    )
    rss = box.where("cnt = m").selectExpr(
        "m",
        "n",
        "CAST(floor(((CAST(spp AS DOUBLE)"
        " - CAST(sp AS DOUBLE) * sp / m)"
        " - (CAST(sxp AS DOUBLE)"
        " - (m + 1) / 2.0 * CAST(sp AS DOUBLE))"
        " * (CAST(sxp AS DOUBLE)"
        " - (m + 1) / 2.0 * CAST(sp AS DOUBLE))"
        " / (CAST(m AS DOUBLE) * (m * m - 1) / 12.0))"
        " / (CAST(n AS DOUBLE) * n) * 1000000.0) AS BIGINT) AS r6",
    )
    f2 = rss.groupBy("m").agg(
        F.count("*").cast("long").alias("kk"),
        F.sum("r6").cast("long").alias("sr6"),
    )
    pts = f2.where("kk >= 2 AND sr6 > 0").selectExpr(
        "CASE m WHEN 8 THEN 2079441 WHEN 16 THEN 2772588"
        " ELSE 3465735 END AS lx",
        "CAST(floor(ln(CAST(sr6 AS DOUBLE)"
        " / (1000000.0 * kk * m)) * 1000000.0) AS BIGINT) AS ly",
    )
    sl = pts.agg(
        F.count("*").cast("long").alias("np_"),
        F.sum("lx").cast("long").alias("sx"),
        F.sum("ly").cast("long").alias("sy"),
        F.expr("sum(CAST(lx AS DECIMAL(38,0)) * ly)").alias("sxy"),
        F.expr("sum(CAST(lx AS DECIMAL(38,0)) * lx)").alias("sxx"),
    )
    return sl.selectExpr(
        "np_ AS n_scales",
        "round(CAST(CAST(np_ AS DECIMAL(38,0)) * sxy"
        " - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)"
        " / nullif(CAST(CAST(np_ AS DECIMAL(38,0)) * sxx"
        " - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE), 0) / 2.0, 6)"
        " + 0.0 AS dfa_alpha",
    )


@stage(
    "embedding_norm_octiles_by_label",
    """
    WITH comp0 AS (
      SELECT vec_id, label, unnest(embedding) AS x
      FROM embeddings
    ),
    n2 AS (
      SELECT vec_id, label,
             CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1000.0)
                AS BIGINT) * CAST(floor(CAST(x AS DOUBLE) * 1000.0)
                AS BIGINT)) AS BIGINT) AS q2
      FROM comp0 GROUP BY 1, 2
    ),
    rk AS (
      SELECT label, q2,
             row_number() OVER (PARTITION BY label
               ORDER BY q2, vec_id) AS r,
             count(*) OVER (PARTITION BY label) AS n
      FROM n2
    ),
    oct AS (
      SELECT label, o,
             CAST(sum(CASE WHEN r = ((o * (n - 1)) // 8) + 1
                      THEN q2 ELSE 0 END) AS BIGINT) AS q2o,
             any_value(n) AS n
      FROM rk CROSS JOIN (SELECT unnest([1, 2, 3, 4, 5, 6, 7]) AS o)
      GROUP BY 1, 2
    )
    SELECT label, o AS octile, n AS n_vectors,
           round(sqrt(CAST(q2o AS DOUBLE)) / 1000.0, 6) + 0.0
             AS norm_at_octile
    FROM oct ORDER BY 1, 2
    """,
)
def q_embedding_norm_octiles_by_label(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding L2-norm octile ladder per label: the order statistics
    at ranks (o*(n-1))//8 + 1 of the vector norms — the distribution
    check behind norm-clipping / outlier-vector triage (a label whose
    upper octiles run away signals unnormalized or corrupt batches).
    Norms are compared via their EXACT integer squared form (1e-3
    quantized components summed as integers), so ranking needs no
    float comparisons and ties pin by vec_id; the single sqrt is
    cosmetic output scaling. One per-vector groupBy + one partitioned
    rank + a 7-constant octile scaffold.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    comp0 = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("a0", "x")
    )
    n2 = comp0.groupBy("vec_id", "label").agg(
        F.expr(
            "CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1000.0)"
            " AS BIGINT) * CAST(floor(CAST(x AS DOUBLE) * 1000.0)"
            " AS BIGINT)) AS BIGINT)"
        ).alias("q2")
    )
    rk = n2.select(
        "label",
        "q2",
        F.row_number()
        .over(W.partitionBy("label").orderBy("q2", "vec_id"))
        .alias("r"),
        F.count("*").over(W.partitionBy("label")).alias("n"),
    )
    octs = spark.range(1).selectExpr(
        "explode(array(1, 2, 3, 4, 5, 6, 7)) AS o"
    )
    oct_rel = (
        rk.crossJoin(F.broadcast(octs))
        .groupBy("label", "o")
        .agg(
            F.expr(
                "CAST(sum(CASE WHEN r = ((o * (n - 1)) div 8) + 1"
                " THEN q2 ELSE 0 END) AS BIGINT)"
            ).alias("q2o"),
            F.expr("any_value(n)").alias("n"),
        )
    )
    return oct_rel.selectExpr(
        "label",
        "o AS octile",
        "n AS n_vectors",
        "round(sqrt(CAST(q2o AS DOUBLE)) / 1000.0, 6) + 0.0"
        " AS norm_at_octile",
    ).orderBy("label", "octile")


@stage(
    "ab_msprt_always_valid",
    """
    WITH v AS (
      SELECT user_id % 2 AS arm,
             CAST(floor(value * 1000) AS BIGINT) AS vm
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(vm) AS BIGINT) AS s,
             sum(vm::HUGEINT * vm) AS ss
      FROM v GROUP BY 1
    ),
    w AS (
      SELECT
        CAST(sum(CASE WHEN arm = 1 THEN n ELSE 0 END) AS BIGINT) AS n1,
        CAST(sum(CASE WHEN arm = 0 THEN n ELSE 0 END) AS BIGINT) AS n0,
        CAST(sum(CASE WHEN arm = 1 THEN s ELSE 0 END) AS BIGINT) AS s1,
        CAST(sum(CASE WHEN arm = 0 THEN s ELSE 0 END) AS BIGINT) AS s0,
        sum(ss) AS sst,
        CAST(sum(s) AS BIGINT) AS st,
        CAST(sum(n) AS BIGINT) AS nt
      FROM g
    ),
    p AS (
      SELECT n1, n0,
             CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0 AS zd,
             (CAST(sst AS DOUBLE) - CAST(st AS DOUBLE) * st / nt)
               / nullif(CAST(nt - 1 AS DOUBLE), 0)
               * (1.0 / n1 + 1.0 / n0) AS sd2
      FROM w WHERE n1 >= 2 AND n0 >= 2
    )
    SELECT n0, n1,
           round(-0.5 * ln(2.0) + zd * zd
                 / nullif(4.0 * sd2, 0), 6) + 0.0 AS log_lambda,
           round(least(1.0, exp(0.5 * ln(2.0) - zd * zd
                 / nullif(4.0 * sd2, 0))), 6) + 0.0 AS always_valid_p
    FROM p
    """,
)
def q_ab_msprt_always_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture sequential probability ratio test (mSPRT) for the
    user-parity arms' mean difference — the always-valid-inference
    machinery behind modern continuous-monitoring A/B platforms: with
    a normal mixture prior of variance tau^2 = sd_diff^2, the mixture
    likelihood ratio collapses to Lambda = sqrt(1/2) * exp(zd^2 /
    (4*sd^2)), and p_av = min(1, 1/Lambda) can be peeked at any time
    without alpha inflation. Arm moments are exact integers (int128
    sumsq); the pooled variance uses the combined-sample ddof=1 form;
    degenerate arms (n < 2) or zero variance NULL via nullif. One
    groupBy to two rows + one scalar projection.
    """
    v = (
        _events(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .selectExpr(
            "user_id % 2 AS arm", "CAST(floor(value * 1000) AS BIGINT) AS vm"
        )
    )
    g = v.groupBy("arm").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("vm").cast("long").alias("s"),
        F.expr("sum(CAST(vm AS DECIMAL(38,0)) * vm)").alias("ss"),
    )
    w = g.agg(
        F.expr(
            "CAST(sum(CASE WHEN arm = 1 THEN n ELSE 0 END) AS BIGINT)"
        ).alias("n1"),
        F.expr(
            "CAST(sum(CASE WHEN arm = 0 THEN n ELSE 0 END) AS BIGINT)"
        ).alias("n0"),
        F.expr(
            "CAST(sum(CASE WHEN arm = 1 THEN s ELSE 0 END) AS BIGINT)"
        ).alias("s1"),
        F.expr(
            "CAST(sum(CASE WHEN arm = 0 THEN s ELSE 0 END) AS BIGINT)"
        ).alias("s0"),
        F.sum("ss").alias("sst"),
        F.sum("s").cast("long").alias("st"),
        F.sum("n").cast("long").alias("nt"),
    )
    p = w.where("n1 >= 2 AND n0 >= 2").selectExpr(
        "n1",
        "n0",
        "CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0 AS zd",
        "(CAST(sst AS DOUBLE) - CAST(st AS DOUBLE) * st / nt)"
        " / nullif(CAST(nt - 1 AS DOUBLE), 0)"
        " * (1.0 / n1 + 1.0 / n0) AS sd2",
    )
    return p.selectExpr(
        "n0",
        "n1",
        "round(-0.5 * ln(2.0) + zd * zd"
        " / nullif(4.0 * sd2, 0), 6) + 0.0 AS log_lambda",
        "round(least(1.0, exp(0.5 * ln(2.0) - zd * zd"
        " / nullif(4.0 * sd2, 0))), 6) + 0.0 AS always_valid_p",
    )


@stage(
    "part_size_mix_chi2_by_brand",
    """
    WITH b AS (
      SELECT p_brand AS brand, (p_size - 1) // 10 AS band
      FROM part
    ),
    c AS (
      SELECT brand, band, CAST(count(*) AS BIGINT) AS n
      FROM b GROUP BY 1, 2
    ),
    gb AS (
      SELECT band, CAST(sum(n) AS BIGINT) AS gn FROM c GROUP BY 1
    ),
    tb AS (
      SELECT brand, CAST(sum(n) AS BIGINT) AS bn FROM c GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nt,
             CAST(count(DISTINCT band) AS BIGINT) AS nbands
      FROM c
    ),
    grid AS (
      SELECT tb.brand, gb.band, tb.bn, gb.gn, tot.nt, tot.nbands,
             coalesce(c.n, 0) AS n
      FROM tb CROSS JOIN gb CROSS JOIN tot
      LEFT JOIN c ON c.brand = tb.brand AND c.band = gb.band
    )
    SELECT brand,
           any_value(bn) AS n_parts,
           any_value(nbands) - 1 AS df,
           round(sum((n - CAST(bn AS DOUBLE) * gn / nt)
                     * (n - CAST(bn AS DOUBLE) * gn / nt)
                     / (CAST(bn AS DOUBLE) * gn / nt)), 6) + 0.0
             AS mix_chi2
    FROM grid GROUP BY 1 ORDER BY 1
    """,
)
def q_part_size_mix_chi2_by_brand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-brand size-mix drift: chi-squared of each brand's part-size
    band composition (bands of 10) against the global mix — the
    assortment-drift screen that flags brands whose catalog shape
    diverges from the portfolio. The brand x band grid zero-fills
    missing cells via the margin scaffold (a chi2 over observed cells
    only would silently drop the strongest deviations); all counts
    and margins are exact integers and the expected-count ratios are
    the only doubles. Bounded relations end to end (brands x 5
    bands).
    """
    part = load_table(spark, sf_dir, "part")
    b = part.selectExpr("p_brand AS brand", "(p_size - 1) div 10 AS band")
    c = b.groupBy("brand", "band").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    gb = c.groupBy("band").agg(F.sum("n").cast("long").alias("gn"))
    tb = c.groupBy("brand").agg(F.sum("n").cast("long").alias("bn"))
    tot = c.agg(
        F.sum("n").cast("long").alias("nt"),
        F.countDistinct("band").cast("long").alias("nbands"),
    )
    grid = (
        tb.crossJoin(F.broadcast(gb))
        .crossJoin(F.broadcast(tot))
        .join(c, ["brand", "band"], "left")
        .selectExpr(
            "brand",
            "band",
            "bn",
            "gn",
            "nt",
            "nbands",
            "coalesce(n, 0) AS n",
        )
    )
    return (
        grid.groupBy("brand")
        .agg(
            F.expr("any_value(bn)").alias("n_parts"),
            F.expr("any_value(nbands) - 1").alias("df"),
            F.expr(
                "round(sum((n - CAST(bn AS DOUBLE) * gn / nt)"
                " * (n - CAST(bn AS DOUBLE) * gn / nt)"
                " / (CAST(bn AS DOUBLE) * gn / nt)), 6) + 0.0"
            ).alias("mix_chi2"),
        )
        .orderBy("brand")
    )


@stage(
    "graph_common_neighbor_edge_rate",
    f"""
    WITH {_GRAPH_SQL},
    wedge AS (
      SELECT a.u AS x, b.v AS y, CAST(count(*) AS BIGINT) AS q
      FROM sym a JOIN sym b ON a.v = b.u AND a.u < b.v
      GROUP BY 1, 2
    ),
    marked AS (
      SELECT w.q,
             CASE WHEN e.lo IS NOT NULL THEN 1 ELSE 0 END AS edged
      FROM wedge w
      LEFT JOIN und e ON e.lo = w.x AND e.hi = w.y
    )
    SELECT q AS n_common_neighbors,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(edged) AS BIGINT) AS n_edged,
           round(CAST(sum(edged) AS DOUBLE) / count(*), 6) + 0.0
             AS edge_rate
    FROM marked GROUP BY 1 ORDER BY 1
    """,
)
def q_graph_common_neighbor_edge_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Link-prediction calibration curve of the interaction graph: for
    node pairs with q common neighbors, the observed probability they
    are directly connected — the empirical justification (or
    refutation) for common-neighbor-count link predictors like the
    registered Adamic-Adar and Jaccard operators. The wedge join and
    edge lookup run on the fixed <= 997-node relation (bounded by
    construction); counts are exact integers and only the final rate
    divides. Output rows are bounded by the max common-neighbor count.
    """
    sym, _ = _graph_sym(spark, sf_dir)
    und = sym.where("u < v").selectExpr("u AS lo", "v AS hi")
    wedge = (
        sym.alias("a")
        .join(
            sym.alias("b"),
            (F.col("a.v") == F.col("b.u"))
            & (F.col("a.u") < F.col("b.v")),
        )
        .groupBy(F.col("a.u").alias("x"), F.col("b.v").alias("y"))
        .agg(F.count("*").cast("long").alias("q"))
    )
    marked = (
        wedge.alias("w")
        .join(
            und.alias("e"),
            (F.col("e.lo") == F.col("w.x"))
            & (F.col("e.hi") == F.col("w.y")),
            "left",
        )
        .selectExpr(
            "q", "CASE WHEN lo IS NOT NULL THEN 1 ELSE 0 END AS edged"
        )
    )
    return (
        marked.groupBy("q")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum("edged").cast("long").alias("n_edged"),
            F.expr(
                "round(CAST(sum(edged) AS DOUBLE) / count(*), 6) + 0.0"
            ).alias("edge_rate"),
        )
        .selectExpr("q AS n_common_neighbors", "n_pairs", "n_edged",
                    "edge_rate")
        .orderBy("n_common_neighbors")
    )


def register_all(register) -> None:
    """Round-12 wiring hook: call once from queries.py AFTER every
    existing registration, passing its module-level ``register``:

        from eventstreamml_spark.staging_r12 import register_all
        register_all(register)

    Appends all staged operators in staged order (= the intended
    round-12 ``_ORDER_FIRST`` window order). Remember the same-commit
    obligations: fold the names into registry_order.REGISTRATION_ORDER,
    add SURVEY rows/names, bump README counts, rotate, and commit the
    fresh PARITY_SF01.json with the rotation.
    """
    for name, (fn, oracle) in STAGED.items():
        register(name, oracle)(fn)


# ---------------------------------------------------------------------------
# Batch J — replacements for near-duplicates found against the live
# registry (cochran_armitage_trend, seasonality_strength_by_type,
# order_backlog_aging and embedding_label_centroids already cover the
# originally-staged variants).
# ---------------------------------------------------------------------------

@stage(
    "temporal_gini_hourly",
    f"""
    WITH {_HOURLY_GRID_SQL},
    rk AS (
      SELECT y,
             CAST(row_number() OVER (ORDER BY y, b) AS BIGINT) AS i,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM z
    ),
    g AS (
      SELECT any_value(n) AS n,
             CAST(sum(y) AS BIGINT) AS s,
             sum((2 * i - n - 1)::HUGEINT * y) AS w
      FROM rk
    )
    SELECT n AS n_hours, s AS n_events,
           round(CAST(w AS DOUBLE)
                 / nullif(CAST(n AS DOUBLE) * s, 0), 6) + 0.0
             AS temporal_gini
    FROM g
    """,
)
def q_temporal_gini_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of event volume across HOURS — the temporal
    axis the registered Gini family doesn't cover (subject_count_gini
    concentrates over users, revenue_lorenz over customers,
    graph_degree_gini over nodes): 0 for perfectly steady load, near 1
    when traffic piles into a few hours — the capacity-planning
    peakiness score. Uses the exact sorted-rank identity G = sum((2i -
    n - 1) * y_i) / (n * sum(y)) on the zero-filled hourly grid with a
    (count, hour) tiebreak; the rank-weighted sum is int128-widened
    (2n*y per row passes 2^63 at ~1e4 hours x 1e6-event peaks). One
    bounded sort + one aggregate.
    """
    z = _bucket_grid(spark, sf_dir, 3600)
    rk = z.select(
        "y",
        F.row_number().over(W.orderBy("y", "b")).cast("long").alias("i"),
        F.count("*")
        .over(
            W.orderBy(F.lit(1)).rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        )
        .cast("long")
        .alias("n"),
    )
    g = rk.agg(
        F.expr("any_value(n)").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.expr(
            "sum(CAST(2 * i - n - 1 AS DECIMAL(38,0)) * y)"
        ).alias("w"),
    )
    return g.selectExpr(
        "n AS n_hours",
        "s AS n_events",
        "round(CAST(w AS DOUBLE)"
        " / nullif(CAST(n AS DOUBLE) * s, 0), 6) + 0.0"
        " AS temporal_gini",
    )


@stage(
    "customer_nation_repeat_rate",
    """
    WITH oc AS (
      SELECT o_custkey AS cust, CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    ),
    j AS (
      SELECT c.c_nationkey AS nation, oc.n_orders
      FROM oc JOIN customer c ON oc.cust = c.c_custkey
    )
    SELECT nation,
           CAST(count(*) AS BIGINT) AS n_buyers,
           CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_repeaters,
           round(CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
                 AS DOUBLE) / count(*), 6) + 0.0 AS repeat_rate,
           round(CAST(sum(CASE WHEN n_orders >= 2 THEN n_orders
                          ELSE 0 END) AS DOUBLE)
                 / nullif(CAST(sum(CASE WHEN n_orders >= 2 THEN 1
                               ELSE 0 END) AS DOUBLE), 0), 6) + 0.0
             AS orders_per_repeater
    FROM j GROUP BY 1 ORDER BY 1
    """,
)
def q_customer_nation_repeat_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Repeat-purchase structure per customer nation: the share of
    buyers who ordered at least twice and the mean order count among
    those repeaters — the loyalty decomposition that explains WHERE a
    nation's volume comes from (broad one-time reach vs a loyal core),
    complementary to the RFM segmentation and the CR4/CR8
    concentration staged alongside. Exact counts end to end, one
    per-customer groupBy + one broadcast customer-dim join + one
    nation rollup; a repeater-free nation NULLs its per-repeater mean
    via nullif.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    oc = orders.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.count("*").cast("long").alias("n_orders")
    )
    j = oc.join(
        F.broadcast(cust.selectExpr("c_custkey", "c_nationkey")),
        oc.cust == F.col("c_custkey"),
    ).selectExpr("c_nationkey AS nation", "n_orders")
    return (
        j.groupBy("nation")
        .agg(
            F.count("*").cast("long").alias("n_buyers"),
            F.expr(
                "CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("n_repeaters"),
            F.expr(
                "round(CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0"
                " END) AS DOUBLE) / count(*), 6) + 0.0"
            ).alias("repeat_rate"),
            F.expr(
                "round(CAST(sum(CASE WHEN n_orders >= 2 THEN n_orders"
                " ELSE 0 END) AS DOUBLE)"
                " / nullif(CAST(sum(CASE WHEN n_orders >= 2 THEN 1"
                " ELSE 0 END) AS DOUBLE), 0), 6) + 0.0"
            ).alias("orders_per_repeater"),
        )
        .orderBy("nation")
    )


@stage(
    "moses_extreme_reaction_arms",
    f"""
    WITH {_ARMS_HIST_SQL},
    cum AS (
      SELECT c1, c0,
             CAST(coalesce(sum(c1 + c0) OVER (ORDER BY vm
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cb
      FROM hist
    ),
    spans AS (
      SELECT
        CAST(min(CASE WHEN c0 > 0 THEN 2 * cb + c1 + c0 + 1 END)
          AS BIGINT) AS lo0,
        CAST(max(CASE WHEN c0 > 0 THEN 2 * cb + c1 + c0 + 1 END)
          AS BIGINT) AS hi0,
        CAST(min(CASE WHEN c1 > 0 THEN 2 * cb + c1 + c0 + 1 END)
          AS BIGINT) AS lo1,
        CAST(max(CASE WHEN c1 > 0 THEN 2 * cb + c1 + c0 + 1 END)
          AS BIGINT) AS hi1,
        CAST(sum(c0) AS BIGINT) AS n0,
        CAST(sum(c1) AS BIGINT) AS n1
      FROM cum
    )
    SELECT n0, n1,
           round((hi0 - lo0) / 2.0 + 1.0, 6) + 0.0 AS span_arm0,
           round((hi1 - lo1) / 2.0 + 1.0, 6) + 0.0 AS span_arm1,
           round(((hi0 - lo0) / 2.0 + 1.0)
                 / nullif(CAST(n0 AS DOUBLE), 0), 6) + 0.0
             AS span_ratio_arm0,
           round(((hi1 - lo1) / 2.0 + 1.0)
                 / nullif(CAST(n1 AS DOUBLE), 0), 6) + 0.0
             AS span_ratio_arm1
    FROM spans
    """,
)
def q_moses_extreme_reaction_arms(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Moses test of extreme reactions (h = 0 trimming, the SPSS
    default form) between the user-parity arms: each arm's SPAN — the
    range of its pooled midranks plus one — relative to its size. A
    treatment that pushes subjects to BOTH extremes (the scenario
    location tests miss entirely) inflates its span ratio toward
    (n0+n1)/n while a concentrated arm stays near 1. Doubled midranks
    off the shared value histogram keep min/max exact integers; the
    halving to classical rank units is the only division. One
    histogram pass + one scalar aggregate.
    """
    hist = _arm_value_hist(spark, sf_dir)
    wb = W.orderBy("vm").rowsBetween(W.unboundedPreceding, -1)
    cum = hist.select(
        "c1",
        "c0",
        F.coalesce(F.sum(F.col("c1") + F.col("c0")).over(wb), F.lit(0))
        .cast("long")
        .alias("cb"),
    )
    spans = cum.agg(
        F.expr(
            "CAST(min(CASE WHEN c0 > 0 THEN 2 * cb + c1 + c0 + 1 END)"
            " AS BIGINT)"
        ).alias("lo0"),
        F.expr(
            "CAST(max(CASE WHEN c0 > 0 THEN 2 * cb + c1 + c0 + 1 END)"
            " AS BIGINT)"
        ).alias("hi0"),
        F.expr(
            "CAST(min(CASE WHEN c1 > 0 THEN 2 * cb + c1 + c0 + 1 END)"
            " AS BIGINT)"
        ).alias("lo1"),
        F.expr(
            "CAST(max(CASE WHEN c1 > 0 THEN 2 * cb + c1 + c0 + 1 END)"
            " AS BIGINT)"
        ).alias("hi1"),
        F.sum("c0").cast("long").alias("n0"),
        F.sum("c1").cast("long").alias("n1"),
    )
    return spans.selectExpr(
        "n0",
        "n1",
        "round((hi0 - lo0) / 2.0 + 1.0, 6) + 0.0 AS span_arm0",
        "round((hi1 - lo1) / 2.0 + 1.0, 6) + 0.0 AS span_arm1",
        "round(((hi0 - lo0) / 2.0 + 1.0)"
        " / nullif(CAST(n0 AS DOUBLE), 0), 6) + 0.0 AS span_ratio_arm0",
        "round(((hi1 - lo1) / 2.0 + 1.0)"
        " / nullif(CAST(n1 AS DOUBLE), 0), 6) + 0.0 AS span_ratio_arm1",
    )


@stage(
    "embedding_dim_redundancy_pairs",
    """
    WITH e1 AS (
      SELECT embedding AS emb,
             unnest(embedding) AS xa,
             unnest(generate_series(1, len(embedding))) AS a
      FROM embeddings
    ),
    e2 AS (
      SELECT a, CAST(xa AS DOUBLE) AS xa,
             unnest(emb) AS xb,
             unnest(generate_series(1, len(emb))) AS b
      FROM e1
    ),
    cells AS (
      SELECT a, b,
             CAST(sum(CAST(floor(xa * CAST(xb AS DOUBLE) * 1000000.0)
               AS BIGINT)) AS BIGINT) AS c6,
             CAST(count(*) AS BIGINT) AS n
      FROM e2 WHERE a <= b GROUP BY 1, 2
    ),
    dsum AS (
      SELECT a, CAST(sum(CAST(floor(CAST(xa AS DOUBLE) * 1000.0)
               AS BIGINT)) AS BIGINT) AS s3
      FROM e1 GROUP BY 1
    ),
    r AS (
      SELECT c.a, c.b,
             (CAST(c.n AS DOUBLE) * c.c6 / 1000000.0
              - CAST(da.s3 AS DOUBLE) * db.s3 / 1000000.0)
             / nullif(sqrt(
                 (CAST(c.n AS DOUBLE) * caa.c6 / 1000000.0
                  - CAST(da.s3 AS DOUBLE) * da.s3 / 1000000.0)
                 * (CAST(c.n AS DOUBLE) * cbb.c6 / 1000000.0
                    - CAST(db.s3 AS DOUBLE) * db.s3 / 1000000.0)), 0)
               AS corr_ab
      FROM cells c
      JOIN dsum da ON da.a = c.a
      JOIN dsum db ON db.a = c.b
      JOIN cells caa ON caa.a = c.a AND caa.b = c.a
      JOIN cells cbb ON cbb.a = c.b AND cbb.b = c.b
      WHERE c.a < c.b
    ),
    ranked AS (
      SELECT a, b, corr_ab,
             row_number() OVER (ORDER BY round(abs(corr_ab), 9) DESC,
               a, b) AS pos
      FROM r
    )
    SELECT a AS dim_a, b AS dim_b,
           round(corr_ab, 6) + 0.0 AS redundancy_corr
    FROM ranked WHERE pos <= 10 ORDER BY dim_a, dim_b
    """,
)
def q_embedding_dim_redundancy_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-10 most-correlated embedding dimension pairs — the
    redundancy audit that tells a pipeline which coordinates carry
    duplicate information (candidates for Matryoshka truncation or
    PCA, and the pairwise complement of the scalar participation
    ratio staged alongside; embedding_dim_stats only sees dimensions
    one at a time). Pearson r per pair comes from 1e-6-quantized
    product cells and 1e-3-quantized component sums — both exact
    integer relations, so the only floats are the final covariance
    ratio built from identical scalar expressions. The top-|r|
    ranking uses round(|r|, 9) with a (dim_a, dim_b) tiebreak (the
    bh_fdr rule). All joins run on the d^2/2-cell bounded relation.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    e1 = emb.select(
        "embedding", F.posexplode("embedding").alias("a0", "xa")
    )
    e2 = e1.select(
        (F.col("a0") + 1).alias("a"),
        F.col("xa").cast("double").alias("xa"),
        F.posexplode("embedding").alias("b0", "xb"),
    )
    cells = (
        e2.selectExpr(
            "a",
            "b0 + 1 AS b",
            "CAST(floor(xa * CAST(xb AS DOUBLE) * 1000000.0)"
            " AS BIGINT) AS p6",
        )
        .where("a <= b")
        .groupBy("a", "b")
        .agg(
            F.sum("p6").cast("long").alias("c6"),
            F.count("*").cast("long").alias("n"),
        )
    )
    dsum = (
        e1.selectExpr(
            "a0 + 1 AS a",
            "CAST(floor(CAST(xa AS DOUBLE) * 1000.0) AS BIGINT) AS x3",
        )
        .groupBy("a")
        .agg(F.sum("x3").cast("long").alias("s3"))
    )
    r = (
        cells.alias("c")
        .where("c.a < c.b")
        .join(
            F.broadcast(dsum.selectExpr("a AS da_a", "s3 AS sa")),
            F.col("c.a") == F.col("da_a"),
        )
        .join(
            F.broadcast(dsum.selectExpr("a AS db_a", "s3 AS sb")),
            F.col("c.b") == F.col("db_a"),
        )
        .join(
            F.broadcast(
                cells.where("a = b").selectExpr("a AS aa", "c6 AS caa")
            ),
            F.col("c.a") == F.col("aa"),
        )
        .join(
            F.broadcast(
                cells.where("a = b").selectExpr("a AS bb", "c6 AS cbb")
            ),
            F.col("c.b") == F.col("bb"),
        )
        .selectExpr(
            "c.a AS a",
            "c.b AS b",
            "(CAST(n AS DOUBLE) * c6 / 1000000.0"
            " - CAST(sa AS DOUBLE) * sb / 1000000.0)"
            " / nullif(sqrt("
            "(CAST(n AS DOUBLE) * caa / 1000000.0"
            " - CAST(sa AS DOUBLE) * sa / 1000000.0)"
            " * (CAST(n AS DOUBLE) * cbb / 1000000.0"
            " - CAST(sb AS DOUBLE) * sb / 1000000.0)), 0) AS corr_ab",
        )
    )
    ranked = r.select(
        "a",
        "b",
        "corr_ab",
        F.row_number()
        .over(
            W.orderBy(
                F.expr("round(abs(corr_ab), 9)").desc(),
                F.col("a"),
                F.col("b"),
            )
        )
        .alias("pos"),
    ).where("pos <= 10")
    return ranked.selectExpr(
        "a AS dim_a", "b AS dim_b",
        "round(corr_ab, 6) + 0.0 AS redundancy_corr",
    ).orderBy("dim_a", "dim_b")
