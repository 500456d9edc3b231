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
           round(any_value(h.h1d) / 2000.0, 6) + 0.0 AS q1,
           round(any_value(h.h3d) / 2000.0, 6) + 0.0 AS q3,
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
            F.expr("round(any_value(h1d) / 2000.0, 6) + 0.0").alias("q1"),
            F.expr("round(any_value(h3d) / 2000.0, 6) + 0.0").alias("q3"),
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
             CAST(floor(value * 100) AS BIGINT) AS vc
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
             CAST(sum(h1.c * h0.c) AS BIGINT) AS w
      FROM h1 CROSS JOIN h0 GROUP BY 1
    ),
    cum AS (
      SELECT d, w,
             CAST(coalesce(sum(w) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cb,
             CAST(sum(w) OVER () AS BIGINT) AS wt
      FROM diffs
    ),
    dm AS (
      SELECT CAST(sum((CASE WHEN cb < (wt + 1) // 2
                        AND (wt + 1) // 2 <= cb + w
                       THEN d ELSE 0 END)
                  + (CASE WHEN cb < (wt + 2) // 2
                        AND (wt + 2) // 2 <= cb + w
                       THEN d ELSE 0 END)) AS BIGINT) AS d2,
             CAST(any_value(wt) AS BIGINT) AS n_pairs
      FROM cum
    )
    SELECT n_pairs,
           round(d2 / 200.0, 6) + 0.0 AS hl_shift
    FROM dm
    """,
)
def q_hodges_lehmann_shift_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann location-shift estimator between the user-parity
    arms: the median of all n1*n0 pairwise differences X_i - Y_j,
    computed WITHOUT materializing pairs of rows — both arms collapse
    to centi-grid value histograms (distinct values bounded by the
    grid span, not the row count), their cross join enumerates only
    distinct-value pairs with weight c1*c0, and the weighted doubled
    median walks the cumulative pair mass with both middle-rank terms
    ADDED (ranks (W+1)//2 and (W+2)//2 over W = n1*n0 pairs, exact in
    BIGINT to W ~ 1e16). The output divides the doubled centi-grid sum
    by 200. At 100x data the histograms stay grid-bounded, so the
    cross join's cost is unchanged — the classic O(n^2) estimator
    priced as O(grid^2).
    """
    v = (
        _events(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .selectExpr(
            "user_id % 2 AS arm", "CAST(floor(value * 100) AS BIGINT) AS vc"
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
        .crossJoin(h0.alias("b"))
        .selectExpr("a.vc - b.vc AS d", "a.c * b.c AS pw")
        .groupBy("d")
        .agg(F.sum("pw").cast("long").alias("w"))
    )
    wb = W.orderBy("d").rowsBetween(W.unboundedPreceding, -1)
    wall = W.orderBy("d").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = diffs.select(
        "d",
        "w",
        F.coalesce(F.sum("w").over(wb), F.lit(0)).cast("long").alias("cb"),
        F.sum("w").over(wall).cast("long").alias("wt"),
    )
    dm = cum.agg(
        F.expr(
            "CAST(sum((CASE WHEN cb < (wt + 1) div 2"
            " AND (wt + 1) div 2 <= cb + w THEN d ELSE 0 END)"
            " + (CASE WHEN cb < (wt + 2) div 2"
            " AND (wt + 2) div 2 <= cb + w THEN d ELSE 0 END))"
            " AS BIGINT)"
        ).alias("d2"),
        F.expr("CAST(any_value(wt) AS BIGINT)").alias("n_pairs"),
    )
    return dm.selectExpr(
        "n_pairs", "round(d2 / 200.0, 6) + 0.0 AS hl_shift"
    )
