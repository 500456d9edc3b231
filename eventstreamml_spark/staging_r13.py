"""Round-13 staging: operators built late in round 11, NOT registered.

Same contract as ``staging_r12``: the round-11 driver window was
rotated at bc9c00e with the pledge that nothing registers after it, so
these operators are staged here — fully implemented, oracle-paired and
unit-fixture-tested (tests/test_staging_r13.py) — but invisible to
``queries()`` / ``oracle_sql()`` / bench.py.  Round 12 wires
``staging_r12.STAGED`` (its 50 names fill that round's window); round
13 wires this module's ``STAGED`` the same way: fold the names into
``registry_order.REGISTRATION_ORDER``, add the SURVEY §2.8b/§2.8c
rows, rotate the window once, and run scripts/staged_parity.py with
``eventstreamml_spark.staging_r13`` BEFORE wiring (the pre-wiring
sf0.1 scale gate).

Every entry follows the repo's oracle-portability rules (CLAUDE.md):
identical column names and rounding on both engines, exact-integer
intermediates on micro-unit grids with int128 widening where per-row
products can outgrow BIGINT, moments cast to DOUBLE only as whole
aggregated scalars (never data-ordered float sums), ``nullif`` on
every degenerate denominator, ``+ 0.0`` on every rounded output that
can be a tiny negative, and md5-free / HUGEINT-free / DECIMAL-free
output schemas.
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


def register_all(register) -> None:
    """Round-13 wiring hook — mirror of staging_r12.register_all.

    From the tail of queries.py (AFTER every round-12 registration so
    the manifest order stays append-only)::

        from eventstreamml_spark.staging_r13 import register_all
        register_all(register)
    """
    for name, (fn, oracle) in STAGED.items():
        register(name, oracle)(fn)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders")


# ---------------------------------------------------------------------------
# Batch A — two-sample / contingency statistics
# ---------------------------------------------------------------------------
# Shared value-histogram relation for the user-parity arms (the
# cucconi/lepage/staging-r12 relation, rebuilt here so this module
# stays import-independent of queries.py and staging_r12 internals).

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
    "kuiper_test_arms",
    f"""
    WITH {_ARMS_HIST_SQL},
    cum AS (
      SELECT vm,
             CAST(sum(c1) OVER (ORDER BY vm) AS BIGINT) AS s1,
             CAST(sum(c0) OVER (ORDER BY vm) AS BIGINT) AS s0
      FROM hist
    ),
    tot AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c0) AS BIGINT) AS n0
      FROM hist
    ),
    dev AS (
      SELECT greatest(max(s1::HUGEINT * n0 - s0::HUGEINT * n1),
                      0::HUGEINT) AS dpn,
             greatest(max(s0::HUGEINT * n1 - s1::HUGEINT * n0),
                      0::HUGEINT) AS dmn
      FROM cum CROSS JOIN tot
    )
    SELECT n0, n1,
           round(CAST(dpn AS DOUBLE)
                 / nullif(CAST(n1::HUGEINT * n0 AS DOUBLE), 0), 6)
             + 0.0 AS d_plus,
           round(CAST(dmn AS DOUBLE)
                 / nullif(CAST(n1::HUGEINT * n0 AS DOUBLE), 0), 6)
             + 0.0 AS d_minus,
           round(CAST(dpn + dmn AS DOUBLE)
                 / nullif(CAST(n1::HUGEINT * n0 AS DOUBLE), 0), 6)
             + 0.0 AS kuiper_v
    FROM dev CROSS JOIN tot
    """,
)
def q_kuiper_test_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kuiper two-sample statistic V = D+ + D- between the user-parity
    arms' value distributions.  Unlike the registered KS test (a single
    sup |F1-F0|), Kuiper sums the one-sided deviations, giving equal
    sensitivity at the distribution tails and under cyclic shifts —
    the variant KS famously underweights.  Both one-sided sups are
    decided on EXACT integers: the CDF difference at each micro-grid
    value is the int128 cross product s1*n0 - s0*n1 (cum counts ~N
    times arm totals ~N outgrow BIGINT at the 1e12-event design
    point), and the single division by n1*n0 happens after the max.
    One histogram shuffle + a broadcast scalar join — the raw events
    are touched once.
    """
    hist = _arm_value_hist(spark, sf_dir)
    wb = W.orderBy("vm").rowsBetween(W.unboundedPreceding, 0)
    cum = hist.select(
        "vm",
        F.sum("c1").over(wb).cast("long").alias("s1"),
        F.sum("c0").over(wb).cast("long").alias("s0"),
    )
    tot = hist.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c0").cast("long").alias("n0"),
    )
    dev = cum.crossJoin(F.broadcast(tot)).agg(
        F.expr(
            "greatest(max(CAST(s1 AS DECIMAL(38,0)) * n0"
            " - CAST(s0 AS DECIMAL(38,0)) * n1),"
            " CAST(0 AS DECIMAL(38,0)))"
        ).alias("dpn"),
        F.expr(
            "greatest(max(CAST(s0 AS DECIMAL(38,0)) * n1"
            " - CAST(s1 AS DECIMAL(38,0)) * n0),"
            " CAST(0 AS DECIMAL(38,0)))"
        ).alias("dmn"),
    )
    return dev.crossJoin(F.broadcast(tot)).selectExpr(
        "n0",
        "n1",
        "round(CAST(dpn AS DOUBLE)"
        " / nullif(CAST(CAST(n1 AS DECIMAL(38,0)) * n0 AS DOUBLE), 0),"
        " 6) + 0.0 AS d_plus",
        "round(CAST(dmn AS DOUBLE)"
        " / nullif(CAST(CAST(n1 AS DECIMAL(38,0)) * n0 AS DOUBLE), 0),"
        " 6) + 0.0 AS d_minus",
        "round(CAST(dpn + dmn AS DOUBLE)"
        " / nullif(CAST(CAST(n1 AS DECIMAL(38,0)) * n0 AS DOUBLE), 0),"
        " 6) + 0.0 AS kuiper_v",
    )


@stage(
    "tukey_quick_test_arms",
    f"""
    WITH {_ARMS_HIST_SQL},
    ext AS (
      SELECT min(CASE WHEN c0 > 0 THEN vm END) AS mn0,
             max(CASE WHEN c0 > 0 THEN vm END) AS mx0,
             min(CASE WHEN c1 > 0 THEN vm END) AS mn1,
             max(CASE WHEN c1 > 0 THEN vm END) AS mx1,
             CAST(sum(c0) AS BIGINT) AS n0,
             CAST(sum(c1) AS BIGINT) AS n1
      FROM hist
    ),
    cnt AS (
      SELECT
        CAST(sum(CASE WHEN vm > mx0 THEN 2 * c1
                      WHEN vm = mx0 THEN c1 ELSE 0 END) AS BIGINT)
          AS a2h,
        CAST(sum(CASE WHEN vm < mn1 THEN 2 * c0
                      WHEN vm = mn1 THEN c0 ELSE 0 END) AS BIGINT)
          AS b2h,
        CAST(sum(CASE WHEN vm > mx1 THEN 2 * c0
                      WHEN vm = mx1 THEN c0 ELSE 0 END) AS BIGINT)
          AS a2l,
        CAST(sum(CASE WHEN vm < mn0 THEN 2 * c1
                      WHEN vm = mn0 THEN c1 ELSE 0 END) AS BIGINT)
          AS b2l
      FROM hist CROSS JOIN ext
    )
    SELECT n0, n1,
           round((a2h + b2h) / 2.0, 6) + 0.0 AS t_arm1_high,
           round((a2l + b2l) / 2.0, 6) + 0.0 AS t_arm0_high
    FROM cnt CROSS JOIN (SELECT n0, n1 FROM ext) x
    """,
)
def q_tukey_quick_test_arms(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tukey's quick (pocket) test between the user-parity arms: the
    count of arm-1 values strictly above arm 0's maximum plus arm-0
    values strictly below arm 1's minimum (and the mirror-image count
    for the opposite direction), with boundary ties contributing 1/2
    by Tukey's original convention.  Distinct from the staged Moses
    extreme-reaction test (span of pooled midranks): Tukey counts
    EXCEEDANCES beyond the other sample's extremes, the classic
    "7-13-rule" quick screen.  Tie halves are kept exact by doubling
    the counts inside the aggregate and halving once at the end.  One
    histogram shuffle + a broadcast extremes join.
    """
    hist = _arm_value_hist(spark, sf_dir)
    ext = hist.agg(
        F.expr("min(CASE WHEN c0 > 0 THEN vm END)").alias("mn0"),
        F.expr("max(CASE WHEN c0 > 0 THEN vm END)").alias("mx0"),
        F.expr("min(CASE WHEN c1 > 0 THEN vm END)").alias("mn1"),
        F.expr("max(CASE WHEN c1 > 0 THEN vm END)").alias("mx1"),
        F.sum("c0").cast("long").alias("n0"),
        F.sum("c1").cast("long").alias("n1"),
    )
    cnt = hist.crossJoin(F.broadcast(ext)).agg(
        F.expr(
            "CAST(sum(CASE WHEN vm > mx0 THEN 2 * c1"
            " WHEN vm = mx0 THEN c1 ELSE 0 END) AS BIGINT)"
        ).alias("a2h"),
        F.expr(
            "CAST(sum(CASE WHEN vm < mn1 THEN 2 * c0"
            " WHEN vm = mn1 THEN c0 ELSE 0 END) AS BIGINT)"
        ).alias("b2h"),
        F.expr(
            "CAST(sum(CASE WHEN vm > mx1 THEN 2 * c0"
            " WHEN vm = mx1 THEN c0 ELSE 0 END) AS BIGINT)"
        ).alias("a2l"),
        F.expr(
            "CAST(sum(CASE WHEN vm < mn0 THEN 2 * c1"
            " WHEN vm = mn0 THEN c1 ELSE 0 END) AS BIGINT)"
        ).alias("b2l"),
    )
    return cnt.crossJoin(F.broadcast(ext.select("n0", "n1"))).selectExpr(
        "n0",
        "n1",
        "round((a2h + b2h) / 2.0, 6) + 0.0 AS t_arm1_high",
        "round((a2l + b2l) / 2.0, 6) + 0.0 AS t_arm0_high",
    )


@stage(
    "gk_gamma_price_priority",
    """
    WITH b AS (
      SELECT least(7, CAST(floor(o_totalprice * 1000) AS BIGINT)
                       // 25000000) AS pb,
             CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS pr
      FROM orders
    ),
    cells AS (
      SELECT pb, pr, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1, 2
    ),
    cd AS (
      SELECT
        coalesce(sum(CASE WHEN x.pb < y.pb AND x.pr < y.pr
                          THEN x.n::HUGEINT * y.n END), 0::HUGEINT)
          AS conc,
        coalesce(sum(CASE WHEN x.pb < y.pb AND x.pr > y.pr
                          THEN x.n::HUGEINT * y.n END), 0::HUGEINT)
          AS disc
      FROM cells x, cells y
    )
    SELECT CAST(conc AS DOUBLE) AS concordant,
           CAST(disc AS DOUBLE) AS discordant,
           round((CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))
                 / nullif(CAST(conc AS DOUBLE)
                          + CAST(disc AS DOUBLE), 0), 6) + 0.0
             AS gk_gamma
    FROM cd
    """,
)
def q_gk_gamma_price_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Goodman-Kruskal gamma between the ordinal order-price band
    (25k-wide bands of o_totalprice, capped at band 7) and the ordinal
    order priority (1-URGENT .. 5-LOW).  Gamma = (C - D)/(C + D) over
    concordant/discordant pairs, ignoring ties entirely — the piece
    the registered Somers' D (ties on one margin) and Kendall rank
    queries do not expose.  Pair counts are cell-product sums over the
    <= 8x5 contingency relation (a broadcast nested-loop over 40 rows,
    never the orders table), widened to int128 because C ~ N^2/4
    outgrows BIGINT past ~6e9 orders.  The raw table is touched once
    by the banding groupBy.
    """
    b = _orders(spark, sf_dir).selectExpr(
        "least(7, CAST(floor(o_totalprice * 1000) AS BIGINT)"
        " div 25000000) AS pb",
        "CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS pr",
    )
    cells = b.groupBy("pb", "pr").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    x = cells.alias("x")
    y = F.broadcast(cells.alias("y"))
    cd = (
        x.join(y, F.expr("x.pb < y.pb"))
        .agg(
            F.expr(
                "coalesce(sum(CASE WHEN x.pr < y.pr THEN"
                " CAST(x.n AS DECIMAL(38,0)) * y.n END),"
                " CAST(0 AS DECIMAL(38,0)))"
            ).alias("conc"),
            F.expr(
                "coalesce(sum(CASE WHEN x.pr > y.pr THEN"
                " CAST(x.n AS DECIMAL(38,0)) * y.n END),"
                " CAST(0 AS DECIMAL(38,0)))"
            ).alias("disc"),
        )
    )
    return cd.selectExpr(
        "CAST(conc AS DOUBLE) AS concordant",
        "CAST(disc AS DOUBLE) AS discordant",
        "round((CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))"
        " / nullif(CAST(conc AS DOUBLE) + CAST(disc AS DOUBLE), 0), 6)"
        " + 0.0 AS gk_gamma",
    )


@stage(
    "gk_lambda_type_segment",
    """
    WITH c AS (
      SELECT event_type AS t, user_id % 4 AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    rowm AS (SELECT s, max(n) AS mx FROM c GROUP BY 1),
    colm AS (SELECT t, max(n) AS mx FROM c GROUP BY 1),
    marg AS (
      SELECT (SELECT CAST(sum(mx) AS BIGINT) FROM rowm) AS srm,
             (SELECT CAST(sum(mx) AS BIGINT) FROM colm) AS scm,
             (SELECT max(tn) FROM (SELECT CAST(sum(n) AS BIGINT) AS tn
                                   FROM c GROUP BY t) z) AS mt,
             (SELECT max(sn) FROM (SELECT CAST(sum(n) AS BIGINT) AS sn
                                   FROM c GROUP BY s) z) AS ms,
             (SELECT CAST(sum(n) AS BIGINT) FROM c) AS nn
    )
    SELECT nn AS n_events,
           round(CAST(srm - mt AS DOUBLE)
                 / nullif(CAST(nn - mt AS DOUBLE), 0), 6) + 0.0
             AS lambda_type_given_segment,
           round(CAST(scm - ms AS DOUBLE)
                 / nullif(CAST(nn - ms AS DOUBLE), 0), 6) + 0.0
             AS lambda_segment_given_type,
           round(CAST(srm + scm - mt - ms AS DOUBLE)
                 / nullif(CAST(2 * nn - mt - ms AS DOUBLE), 0), 6)
             + 0.0 AS lambda_symmetric
    FROM marg
    """,
)
def q_gk_lambda_type_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Goodman-Kruskal lambda between event type and the user-id
    segment (user_id % 4, the cramers_v_type_segment convention): the
    proportional reduction in MODAL-prediction error, a fundamentally
    different association measure from the chi-square family already
    registered (Cramer's V, Theil's U) — lambda is exactly 0 whenever
    the same type is modal in every segment, regardless of dependence.
    Every term is an exact integer count (sums of per-group maxima vs
    marginal maxima); the three divisions happen once on scalars.  One
    groupBy on the raw events, then everything runs on the <= |types|
    x 4 cell relation.
    """
    ev = _events(spark, sf_dir)
    c = ev.selectExpr(
        "event_type AS t", "user_id % 4 AS s"
    ).groupBy("t", "s").agg(F.count(F.lit(1)).cast("long").alias("n"))
    # localCheckpoint, not .cache(): plan-keyed caches are reused by
    # the next identical invocation in-session (prohibited cross-run
    # result reuse); this materializes the tiny cell relation per call.
    c = c.localCheckpoint()
    rowm = c.groupBy("s").agg(F.max("n").alias("mx")).agg(
        F.sum("mx").cast("long").alias("srm")
    )
    colm = c.groupBy("t").agg(F.max("n").alias("mx")).agg(
        F.sum("mx").cast("long").alias("scm")
    )
    mt = c.groupBy("t").agg(F.sum("n").alias("tn")).agg(
        F.max("tn").cast("long").alias("mt")
    )
    ms = c.groupBy("s").agg(F.sum("n").alias("sn")).agg(
        F.max("sn").cast("long").alias("ms")
    )
    nn = c.agg(F.sum("n").cast("long").alias("nn"))
    marg = (
        rowm.crossJoin(F.broadcast(colm))
        .crossJoin(F.broadcast(mt))
        .crossJoin(F.broadcast(ms))
        .crossJoin(F.broadcast(nn))
    )
    return marg.selectExpr(
        "nn AS n_events",
        "round(CAST(srm - mt AS DOUBLE)"
        " / nullif(CAST(nn - mt AS DOUBLE), 0), 6) + 0.0"
        " AS lambda_type_given_segment",
        "round(CAST(scm - ms AS DOUBLE)"
        " / nullif(CAST(nn - ms AS DOUBLE), 0), 6) + 0.0"
        " AS lambda_segment_given_type",
        "round(CAST(srm + scm - mt - ms AS DOUBLE)"
        " / nullif(CAST(2 * nn - mt - ms AS DOUBLE), 0), 6) + 0.0"
        " AS lambda_symmetric",
    )

@stage(
    "weighted_kappa_value_bands",
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
      SELECT CAST(sum(CASE WHEN rn = (nn + 3) // 4 THEN v ELSE 0 END)
               AS BIGINT) AS b1,
             CAST(sum(CASE WHEN rn = (2 * nn + 3) // 4 THEN v ELSE 0
               END) AS BIGINT) AS b2,
             CAST(sum(CASE WHEN rn = (3 * nn + 3) // 4 THEN v ELSE 0
               END) AS BIGINT) AS b3
      FROM pooled
    ),
    pairs AS (
      SELECT CASE WHEN vf <= b1 THEN 1 WHEN vf <= b2 THEN 2
                  WHEN vf <= b3 THEN 3 ELSE 4 END AS r,
             CASE WHEN vl <= b1 THEN 1 WHEN vl <= b2 THEN 2
                  WHEN vl <= b3 THEN 3 ELSE 4 END AS c
      FROM fl CROSS JOIN bounds
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS nu,
             CAST(sum(abs(r - c)) AS BIGINT) AS wo,
             CAST(sum(CASE WHEN r = c THEN 1 ELSE 0 END) AS BIGINT)
               AS diag,
             CAST(sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS r1,
             CAST(sum(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS r2,
             CAST(sum(CASE WHEN r = 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS r3,
             CAST(sum(CASE WHEN r = 4 THEN 1 ELSE 0 END) AS BIGINT)
               AS r4,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS c1,
             CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS c2,
             CAST(sum(CASE WHEN c = 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS c3,
             CAST(sum(CASE WHEN c = 4 THEN 1 ELSE 0 END) AS BIGINT)
               AS c4
      FROM pairs
    ),
    k AS (
      SELECT nu, diag,
             nu::HUGEINT * wo AS nwo,
             r1::HUGEINT * c2 + 2 * (r1::HUGEINT * c3)
               + 3 * (r1::HUGEINT * c4)
               + r2::HUGEINT * c1 + r2::HUGEINT * c3
               + 2 * (r2::HUGEINT * c4)
               + 2 * (r3::HUGEINT * c1) + r3::HUGEINT * c2
               + r3::HUGEINT * c4
               + 3 * (r4::HUGEINT * c1) + 2 * (r4::HUGEINT * c2)
               + r4::HUGEINT * c3 AS we,
             r1::HUGEINT * c1 + r2::HUGEINT * c2 + r3::HUGEINT * c3
               + r4::HUGEINT * c4 AS pe_n2
      FROM m
    )
    SELECT nu AS n_users,
           round(1 - CAST(nwo AS DOUBLE) / nullif(CAST(we AS DOUBLE),
                 0), 6) + 0.0 AS kappa_linear,
           round((CAST(diag AS DOUBLE) / nu
                  - CAST(pe_n2 AS DOUBLE) / nullif(CAST(nu::HUGEINT
                      * nu AS DOUBLE), 0))
                 / nullif(1 - CAST(pe_n2 AS DOUBLE)
                     / nullif(CAST(nu::HUGEINT * nu AS DOUBLE), 0), 0),
                 6) + 0.0 AS kappa_unweighted
    FROM k
    """,
)
def q_weighted_kappa_value_bands(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Linearly-weighted Cohen's kappa between each user's FIRST and
    LAST event-value quartile band (pinned (ts, event_id) order; band
    edges = exact pooled order statistics at ranks (j*N+3)//4).  The
    staged Stuart-Maxwell query tests whether the first/last MARGINS
    moved; weighted kappa instead measures user-level AGREEMENT,
    penalizing a 1->4 band jump three times as hard as 1->2 — the
    paired-agreement axis the marginal test is blind to.  kappa_w =
    1 - N*sum(w*O) / sum(w*r_i*c_j) stays exact-integer until two
    scalar divisions (marginal products ~N^2 widened to int128); the
    unweighted kappa off the same table is a bonus column.  Two
    per-user window passes, one pooled rank pass, one broadcast
    boundary row.
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
            "CAST(sum(CASE WHEN rn = (nn + 3) div 4 THEN v ELSE 0 END)"
            " AS BIGINT)"
        ).alias("b1"),
        F.expr(
            "CAST(sum(CASE WHEN rn = (2 * nn + 3) div 4 THEN v ELSE 0"
            " END) AS BIGINT)"
        ).alias("b2"),
        F.expr(
            "CAST(sum(CASE WHEN rn = (3 * nn + 3) div 4 THEN v ELSE 0"
            " END) AS BIGINT)"
        ).alias("b3"),
    )
    pairs = fl.crossJoin(F.broadcast(bounds)).selectExpr(
        "CASE WHEN vf <= b1 THEN 1 WHEN vf <= b2 THEN 2"
        " WHEN vf <= b3 THEN 3 ELSE 4 END AS r",
        "CASE WHEN vl <= b1 THEN 1 WHEN vl <= b2 THEN 2"
        " WHEN vl <= b3 THEN 3 ELSE 4 END AS c",
    )
    m = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("nu"),
        F.expr("CAST(sum(abs(r - c)) AS BIGINT)").alias("wo"),
        F.expr(
            "CAST(sum(CASE WHEN r = c THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("diag"),
        *[
            F.expr(
                f"CAST(sum(CASE WHEN r = {i} THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias(f"r{i}")
            for i in (1, 2, 3, 4)
        ],
        *[
            F.expr(
                f"CAST(sum(CASE WHEN c = {i} THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias(f"c{i}")
            for i in (1, 2, 3, 4)
        ],
    )

    def _h(a: str, b: str) -> str:
        return f"CAST({a} AS DECIMAL(38,0)) * {b}"

    we = (
        f"{_h('r1', 'c2')} + 2 * ({_h('r1', 'c3')})"
        f" + 3 * ({_h('r1', 'c4')})"
        f" + {_h('r2', 'c1')} + {_h('r2', 'c3')}"
        f" + 2 * ({_h('r2', 'c4')})"
        f" + 2 * ({_h('r3', 'c1')}) + {_h('r3', 'c2')}"
        f" + {_h('r3', 'c4')}"
        f" + 3 * ({_h('r4', 'c1')}) + 2 * ({_h('r4', 'c2')})"
        f" + {_h('r4', 'c3')}"
    )
    pe_n2 = (
        f"{_h('r1', 'c1')} + {_h('r2', 'c2')} + {_h('r3', 'c3')}"
        f" + {_h('r4', 'c4')}"
    )
    k = m.selectExpr(
        "nu",
        "diag",
        f"{_h('nu', 'wo')} AS nwo",
        f"{we} AS we",
        f"{pe_n2} AS pe_n2",
    )
    return k.selectExpr(
        "nu AS n_users",
        "round(1 - CAST(nwo AS DOUBLE) / nullif(CAST(we AS DOUBLE),"
        " 0), 6) + 0.0 AS kappa_linear",
        "round((CAST(diag AS DOUBLE) / nu"
        " - CAST(pe_n2 AS DOUBLE)"
        " / nullif(CAST(CAST(nu AS DECIMAL(38,0)) * nu AS DOUBLE), 0))"
        " / nullif(1 - CAST(pe_n2 AS DOUBLE)"
        " / nullif(CAST(CAST(nu AS DECIMAL(38,0)) * nu AS DOUBLE), 0),"
        " 0), 6) + 0.0 AS kappa_unweighted",
    )

# Breslow-Day: the per-stratum pivoted scalar expressions are generated
# once in Python and spliced VERBATIM into both engines' SQL text, so
# the IEEE operation sequence is identical by construction (the
# generated-SQL idiom; strata are the four fixed 6-hour day bands).

_BD_STRATA = (0, 1, 2, 3)


def _bd_cells_sql() -> str:
    cols = []
    for s in _BD_STRATA:
        for cell, cond in (
            ("a", "arm = 1 AND pur = 1"),
            ("b", "arm = 1 AND pur = 0"),
            ("c", "arm = 0 AND pur = 1"),
            ("d", "arm = 0 AND pur = 0"),
        ):
            cols.append(
                f"CAST(sum(CASE WHEN st = {s} AND {cond} THEN 1"
                f" ELSE 0 END) AS BIGINT) AS {cell}{s}"
            )
    return ",\n             ".join(cols)


def _bd_scalar_sql() -> tuple[str, str, str]:
    """(or_numerator, or_denominator, bd_sum) expression texts over the
    pivoted a{s}/b{s}/c{s}/d{s} scalar columns, identical on both
    engines.  Written-order scalar sums — no data-ordered float
    accumulation anywhere."""
    orn = " + ".join(
        f"coalesce(CAST(a{s} AS DOUBLE) * d{s}"
        f" / nullif(a{s} + b{s} + c{s} + d{s}, 0), 0)"
        for s in _BD_STRATA
    )
    ord_ = " + ".join(
        f"coalesce(CAST(b{s} AS DOUBLE) * c{s}"
        f" / nullif(a{s} + b{s} + c{s} + d{s}, 0), 0)"
        for s in _BD_STRATA
    )
    terms = []
    for s in _BD_STRATA:
        r1 = f"(a{s} + b{s})"
        c1 = f"(a{s} + c{s})"
        n = f"(a{s} + b{s} + c{s} + d{s})"
        aa = "(1 - rr)"
        bb = f"(({n} - {r1} - {c1}) + rr * ({r1} + {c1}))"
        cc = f"(0 - rr * {r1} * CAST({c1} AS DOUBLE))"
        disc = f"sqrt(greatest({bb} * {bb} - 4 * {aa} * {cc}, 0))"
        rt1 = f"((0 - {bb} + {disc}) / nullif(2 * {aa}, 0))"
        rt2 = f"((0 - {bb} - {disc}) / nullif(2 * {aa}, 0))"
        lo = f"greatest(0, {r1} + {c1} - {n})"
        hi = f"least({r1}, {c1})"
        ae = (
            f"(CASE WHEN rr = 1 THEN CAST({r1} AS DOUBLE) * {c1}"
            f" / nullif({n}, 0)"
            f" WHEN {rt1} >= {lo} AND {rt1} <= {hi} THEN {rt1}"
            f" ELSE {rt2} END)"
        )
        vinv = (
            f"(1 / nullif({ae}, 0) + 1 / nullif({r1} - {ae}, 0)"
            f" + 1 / nullif({c1} - {ae}, 0)"
            f" + 1 / nullif({n} - {r1} - {c1} + {ae}, 0))"
        )
        terms.append(
            f"coalesce((a{s} - {ae}) * (a{s} - {ae}) * {vinv}, 0)"
        )
    return orn, ord_, " + ".join(terms)


_BD_ORN, _BD_ORD, _BD_SUM = _bd_scalar_sql()


@stage(
    "breslow_day_or_homogeneity",
    f"""
    WITH e AS (
      SELECT CAST(hour(ts) // 6 AS BIGINT) AS st,
             user_id % 2 AS arm,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
               AS pur
      FROM events
    ),
    piv AS (
      SELECT {_bd_cells_sql()}
      FROM e
    ),
    rr_t AS (
      SELECT *, ({_BD_ORN}) / nullif({_BD_ORD}, 0) AS rr FROM piv
    )
    SELECT round(rr, 6) + 0.0 AS or_mh,
           round({_BD_SUM}, 6) + 0.0 AS bd_chi2
    FROM rr_t
    """,
)
def q_breslow_day_or_homogeneity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Breslow-Day test of odds-ratio homogeneity for the (user-parity
    arm) x (purchase) association across the four 6-hour day-band
    strata, against the Mantel-Haenszel common odds ratio.  The
    registered mantel_haenszel_or_by_segment query ESTIMATES the
    common OR; Breslow-Day asks the follow-up question that estimate
    silently assumes away — whether one OR is even shared.  Per
    stratum the expected cell a_e solves the BD quadratic
    (1-R)a^2 + [(n-r1-c1) + R(r1+c1)]a - R*r1*c1 = 0 (the in-range
    root, picked by an explicit CASE; R = 1 falls back to the exact
    independence form), and the statistic sums (a - a_e)^2 / V(a_e).
    All four strata pivot to scalar columns first, so every float sum
    is a WRITTEN-ORDER scalar expression generated once and spliced
    verbatim into both engines — never an unordered float aggregate.
    One pass over events; everything after is one scalar row.
    """
    e = _events(spark, sf_dir).selectExpr(
        "CAST(hour(ts) div 6 AS BIGINT) AS st",
        "user_id % 2 AS arm",
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pur",
    )
    piv = e.agg(
        *[
            F.expr(
                f"CAST(sum(CASE WHEN st = {s} AND {cond} THEN 1"
                " ELSE 0 END) AS BIGINT)"
            ).alias(f"{cell}{s}")
            for s in _BD_STRATA
            for cell, cond in (
                ("a", "arm = 1 AND pur = 1"),
                ("b", "arm = 1 AND pur = 0"),
                ("c", "arm = 0 AND pur = 1"),
                ("d", "arm = 0 AND pur = 0"),
            )
        ]
    )
    rr_t = piv.selectExpr(
        "*", f"({_BD_ORN}) / nullif({_BD_ORD}, 0) AS rr"
    )
    return rr_t.selectExpr(
        "round(rr, 6) + 0.0 AS or_mh",
        f"round({_BD_SUM}, 6) + 0.0 AS bd_chi2",
    )


@stage(
    "cochran_c_variance_types",
    """
    WITH g AS (
      SELECT event_type AS t,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(value * 1000) AS BIGINT)::HUGEINT)
               AS HUGEINT) AS sv,
             CAST(sum(CAST(floor(value * 1000) AS BIGINT)::HUGEINT
                      * CAST(floor(value * 1000) AS BIGINT))
               AS HUGEINT) AS sq
      FROM events WHERE value IS NOT NULL
      GROUP BY 1 HAVING count(*) >= 2
    ),
    s2 AS (
      SELECT t,
             (CAST(n AS DOUBLE) * CAST(sq AS DOUBLE)
              - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
             / (CAST(n AS DOUBLE) * (n - 1)) AS v
      FROM g
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_types,
             list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                            list(v ORDER BY t)),
               (acc, x) -> acc + x) AS sv2
      FROM s2
    ),
    mx AS (
      SELECT t AS max_type, v AS vmax
      FROM (SELECT t, v, row_number() OVER (ORDER BY round(v, 9)
              DESC, t) AS rk FROM s2) z
      WHERE rk = 1
    )
    SELECT n_types, max_type,
           round(vmax / nullif(sv2, 0), 6) + 0.0 AS cochran_c
    FROM tot CROSS JOIN mx
    """,
)
def q_cochran_c_variance_types(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cochran's C statistic over the per-event-type value variances:
    the largest single variance as a fraction of the variance total —
    the classic screen for ONE anomalously noisy group, where the
    registered omnibus heteroscedasticity tests (Bartlett, Levene,
    Fligner) only say "some group differs".  Per-type moment sums on
    the micro grid stay exact (sum(vm^2) ~ N*VM^2 outgrows BIGINT at
    the design point, so the per-row squares are int128); each s_i^2
    is then one double expression over exact scalars, the variance
    TOTAL is a type-ordered sequential fold (never an unordered float
    aggregate), and the argmax is decided on round(v, 9) with the type
    name as tiebreak (the bh_fdr rank discipline).  One groupBy over
    events; the fold and rank run on the ~|types|-row relation.
    """
    ev = _events(spark, sf_dir).where(F.col("value").isNotNull())
    g = (
        ev.selectExpr(
            "event_type AS t",
            "CAST(floor(value * 1000) AS BIGINT) AS vm",
        )
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr(
                "sum(CAST(vm AS DECIMAL(38,0)))"
            ).alias("sv"),
            F.expr(
                "sum(CAST(vm AS DECIMAL(38,0)) * vm)"
            ).alias("sq"),
        )
        .where(F.col("n") >= 2)
    )
    s2 = g.selectExpr(
        "t",
        "(CAST(n AS DOUBLE) * CAST(sq AS DOUBLE)"
        " - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * (n - 1)) AS v",
    )
    tot = s2.agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.expr(
            "aggregate(transform(array_sort(collect_list("
            "struct(t, v))), p -> p.v), CAST(0 AS DOUBLE),"
            " (acc, x) -> acc + x)"
        ).alias("sv2"),
    )
    mx = (
        s2.select(
            "t",
            "v",
            F.row_number()
            .over(W.orderBy(F.expr("round(v, 9)").desc(), F.col("t")))
            .alias("rk"),
        )
        .where(F.col("rk") == 1)
        .selectExpr("t AS max_type", "v AS vmax")
    )
    return tot.crossJoin(F.broadcast(mx)).selectExpr(
        "n_types",
        "max_type",
        "round(vmax / nullif(sv2, 0), 6) + 0.0 AS cochran_c",
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
        .groupBy(
            F.date_trunc("hour", F.col("ts").cast("timestamp")).alias(
                "h"
            )
        )
        .agg(F.count("*").cast("long").alias("y"))
    )


@stage(
    "arch_lm_effect_hourly",
    f"""
    WITH {_HOURLY_SQL},
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS s
      FROM hourly
    ),
    z AS (
      SELECT abs(n * y - s) AS zv,
             row_number() OVER (ORDER BY h) AS t
      FROM hourly CROSS JOIN tot
    ),
    pair AS (
      SELECT cur.zv AS zt, prv.zv AS zp
      FROM z cur JOIN z prv ON prv.t = cur.t - 1
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(zp::HUGEINT) AS HUGEINT) AS sx,
             CAST(sum(zt::HUGEINT) AS HUGEINT) AS sy,
             CAST(sum(zp::HUGEINT * zp) AS HUGEINT) AS sxx,
             CAST(sum(zt::HUGEINT * zt) AS HUGEINT) AS syy,
             CAST(sum(zt::HUGEINT * zp) AS HUGEINT) AS sxy
      FROM pair
    ),
    r2 AS (
      SELECT m,
             (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             * (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / nullif((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)),
                      0) AS rsq
      FROM mom
    )
    SELECT m AS n_pairs,
           round(rsq, 6) + 0.0 AS arch_r2,
           round(CAST(m AS DOUBLE) * rsq, 6) + 0.0 AS arch_lm
    FROM r2
    """,
)
def q_arch_lm_effect_hourly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Engle-style ARCH LM screen on the hourly event-count series, in
    the absolute-deviation (Taylor-effect) form: regress |y_t - mean|
    on |y_{t-1} - mean| over consecutive observed hours and report
    n*R^2.  Volatility clustering — quiet and noisy hours arriving in
    runs — is invisible to the registered autocorrelation/Ljung-Box
    queries once the LEVEL correlation is gone; the LM statistic on
    absolute deviations is the standard detector.  Deviations are
    exact n-scaled integers z = |n*y - T| (<= n*N, inside BIGINT at
    the design point); per-row products z*z outgrow BIGINT so the five
    moment sums are int128, and the slope/R^2 algebra runs on the
    aggregated scalars in double — never a data-ordered float sum.
    The absolute form is what keeps the cross-moments inside int128 at
    the 1e12-event design point (squared-deviation products would need
    ~1e72).  One groupBy + one self-join on the bounded hourly grid.
    """
    hourly = _hourly_counts(spark, sf_dir)
    tot = hourly.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
    )
    z = hourly.crossJoin(F.broadcast(tot)).select(
        F.expr("abs(n * y - s)").alias("zv"),
        F.row_number().over(W.orderBy("h")).alias("t"),
    )
    cur, prv = z.alias("cur"), z.alias("prv")
    pair = cur.join(
        prv, F.expr("prv.t = cur.t - 1")
    ).selectExpr("cur.zv AS zt", "prv.zv AS zp")
    mom = pair.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.expr("sum(CAST(zp AS DECIMAL(38,0)))").alias("sx"),
        F.expr("sum(CAST(zt AS DECIMAL(38,0)))").alias("sy"),
        F.expr("sum(CAST(zp AS DECIMAL(38,0)) * zp)").alias("sxx"),
        F.expr("sum(CAST(zt AS DECIMAL(38,0)) * zt)").alias("syy"),
        F.expr("sum(CAST(zt AS DECIMAL(38,0)) * zp)").alias("sxy"),
    )
    r2 = mom.selectExpr(
        "m",
        "(CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " * (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / nullif((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        " * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0) AS rsq",
    )
    return r2.selectExpr(
        "m AS n_pairs",
        "round(rsq, 6) + 0.0 AS arch_r2",
        "round(CAST(m AS DOUBLE) * rsq, 6) + 0.0 AS arch_lm",
    )

# ---------------------------------------------------------------------------
# Batch B — time-series feature extraction
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
    the staging_r12 sample_entropy idiom: counts, span scaffold, left
    join."""
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
    "teager_kaiser_energy_6h",
    f"""
    WITH {_SIXH_GRID_SQL},
    lagged AS (
      SELECT y,
             lag(y, 1) OVER (ORDER BY idx) AS yp,
             lead(y, 1) OVER (ORDER BY idx) AS yn
      FROM z
    ),
    psi AS (
      SELECT y::HUGEINT * y - yp::HUGEINT * yn AS p
      FROM lagged WHERE yp IS NOT NULL AND yn IS NOT NULL
    )
    SELECT CAST(count(*) AS BIGINT) AS n_interior,
           round(CAST(sum(p) AS DOUBLE)
                 / nullif(CAST(count(*) AS DOUBLE), 0), 6) + 0.0
             AS mean_tk_energy,
           round(CAST(sum(CASE WHEN p < 0 THEN 1 ELSE 0 END)
                   AS DOUBLE)
                 / nullif(CAST(count(*) AS DOUBLE), 0), 6) + 0.0
             AS negative_share
    FROM psi
    """,
)
def q_teager_kaiser_energy_6h(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Teager-Kaiser operator energy of the zero-filled 6-hour count
    series: psi_t = y_t^2 - y_{t-1} * y_{t+1} per interior bucket,
    reported as the mean and the negative share.  TK energy tracks
    instantaneous amplitude-times-frequency — a burst detector that
    reacts to BOTH level and oscillation change, unlike the pure
    second-moment registered features (Hjorth activity, c3, time
    reversal).  psi is an exact integer per row (y^2 ~ N^2 outgrows
    BIGINT at the 1e12-event design point, so products are int128; the
    sum is bounded by 2*max(y)*sum(y) ~ 2e24), and the two divisions
    happen once on aggregated scalars.  One groupBy + one window over
    the bounded bucket grid.
    """
    z = _bucket_grid(spark, sf_dir, 21600)
    wo = W.orderBy("idx")
    lagged = z.select(
        "y",
        F.lag("y", 1).over(wo).alias("yp"),
        F.lead("y", 1).over(wo).alias("yn"),
    )
    psi = lagged.where(
        F.col("yp").isNotNull() & F.col("yn").isNotNull()
    ).selectExpr(
        "CAST(y AS DECIMAL(38,0)) * y"
        " - CAST(yp AS DECIMAL(38,0)) * yn AS p"
    )
    return psi.agg(
        F.count(F.lit(1)).cast("long").alias("n_interior"),
        F.expr(
            "round(CAST(sum(p) AS DOUBLE)"
            " / nullif(CAST(count(*) AS DOUBLE), 0), 6) + 0.0"
        ).alias("mean_tk_energy"),
        F.expr(
            "round(CAST(sum(CASE WHEN p < 0 THEN 1 ELSE 0 END)"
            " AS DOUBLE) / nullif(CAST(count(*) AS DOUBLE), 0), 6)"
            " + 0.0"
        ).alias("negative_share"),
    )


@stage(
    "mosum_changepoint_hourly",
    f"""
    WITH {_HOURLY_GRID_SQL},
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS s,
             sum(y::HUGEINT * y) AS ss
      FROM z
    ),
    win AS (
      SELECT idx,
             CAST(sum(y) OVER (ORDER BY idx
               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS leftw,
             CAST(sum(y) OVER (ORDER BY idx
               ROWS BETWEEN 1 FOLLOWING AND 24 FOLLOWING) AS BIGINT)
               AS rightw,
             CAST(count(*) OVER (ORDER BY idx
               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS nl,
             CAST(count(*) OVER (ORDER BY idx
               ROWS BETWEEN 1 FOLLOWING AND 24 FOLLOWING) AS BIGINT)
               AS nr
      FROM z
    ),
    stat AS (
      SELECT idx, abs(rightw - leftw) AS m
      FROM win WHERE nl = 24 AND nr = 24
    ),
    peak AS (
      SELECT idx AS peak_idx, m AS mosum_max
      FROM (SELECT idx, m, row_number() OVER (ORDER BY m DESC, idx)
              AS rk FROM stat) r
      WHERE rk = 1
    )
    SELECT n AS n_hours, peak_idx, mosum_max,
           round(CAST(mosum_max AS DOUBLE)
                 / nullif(sqrt(48 * ((CAST(ss AS DOUBLE)
                     - CAST(s AS DOUBLE) * s / n)
                   / nullif(CAST(n - 1 AS DOUBLE), 0))), 0), 6) + 0.0
             AS mosum_stat
    FROM tot CROSS JOIN peak
    """,
)
def q_mosum_changepoint_hourly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MOSUM (moving-sum) changepoint scan of the zero-filled hourly
    count series at bandwidth G = 24: the statistic at t is the
    absolute difference between the following-24h and trailing-24h
    sums, maximized over all interior t.  The registered changepoint
    family (Pettitt, SNHT, Buishand, CUSUM, Page-Hinkley) is built on
    GLOBAL cumulative deviations — a level shift near the boundary or
    multiple shifts wash out; MOSUM's fixed-width local contrast is
    the standard remedy and localizes the peak sharply.  Window sums
    and the argmax are exact integers (tiebreak: smallest idx); the
    single standardization by sqrt(2G*s^2) divides doubles built from
    int128 moment scalars.  Two ROWS windows over the bounded hourly
    grid — raw events are touched once.
    """
    z = _bucket_grid(spark, sf_dir, 3600)
    tot = z.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.expr("sum(CAST(y AS DECIMAL(38,0)) * y)").alias("ss"),
    )
    wo = W.orderBy("idx")
    win = z.select(
        "idx",
        F.sum("y").over(wo.rowsBetween(-23, 0)).cast("long").alias(
            "leftw"
        ),
        F.sum("y").over(wo.rowsBetween(1, 24)).cast("long").alias(
            "rightw"
        ),
        F.count("*").over(wo.rowsBetween(-23, 0)).cast("long").alias(
            "nl"
        ),
        F.count("*").over(wo.rowsBetween(1, 24)).cast("long").alias(
            "nr"
        ),
    )
    stat = win.where("nl = 24 AND nr = 24").selectExpr(
        "idx", "abs(rightw - leftw) AS m"
    )
    peak = (
        stat.select(
            "idx",
            "m",
            F.row_number()
            .over(W.orderBy(F.col("m").desc(), F.col("idx")))
            .alias("rk"),
        )
        .where("rk = 1")
        .selectExpr("idx AS peak_idx", "m AS mosum_max")
    )
    return tot.crossJoin(F.broadcast(peak)).selectExpr(
        "n AS n_hours",
        "peak_idx",
        "mosum_max",
        "round(CAST(mosum_max AS DOUBLE)"
        " / nullif(sqrt(48 * ((CAST(ss AS DOUBLE)"
        " - CAST(s AS DOUBLE) * s / n)"
        " / nullif(CAST(n - 1 AS DOUBLE), 0))), 0), 6) + 0.0"
        " AS mosum_stat",
    )


@stage(
    "mean_crossing_profile_hourly",
    f"""
    WITH {_HOURLY_GRID_SQL},
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS s
      FROM z
    ),
    sg AS (
      SELECT idx, y, sign(n * y - s) AS sg,
             lag(y) OVER (ORDER BY idx) AS yp,
             lag(sign(n * y - s)) OVER (ORDER BY idx) AS sp
      FROM z CROSS JOIN tot
    ),
    longest AS (
      SELECT CAST(coalesce(max(cnt), 0) AS BIGINT) AS longest_above
      FROM (SELECT grp, count(*) AS cnt FROM
            (SELECT idx - row_number() OVER (ORDER BY idx) AS grp
             FROM sg WHERE sg = 1) g GROUP BY 1) q
    ),
    agg AS (
      SELECT CAST(sum(CASE WHEN sp IS NOT NULL AND sg * sp < 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_crossings,
             CAST(sum(CASE WHEN yp IS NOT NULL THEN abs(y - yp)
                    ELSE 0 END) AS BIGINT) AS tv,
             CAST(count(*) AS BIGINT) AS n
      FROM sg
    )
    SELECT n AS n_hours, n_crossings, longest_above,
           round(CAST(tv AS DOUBLE)
                 / nullif(CAST(n - 1 AS DOUBLE), 0), 6) + 0.0
             AS mean_abs_change
    FROM agg CROSS JOIN longest
    """,
)
def q_mean_crossing_profile_hourly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mean-crossing profile of the zero-filled hourly count series:
    the number of strict sign flips of (y - mean) between consecutive
    hours, the longest run of strictly-above-mean hours, and the mean
    absolute successive change (the tsfresh mean_abs_change).  All
    three are decided on exact n-scaled integers — sign(n*y - s) needs
    no division, the crossing test is a sign product, and the longest
    run is a gaps-and-islands group over above-mean rows.  Together
    they profile oscillation speed vs persistence, which none of the
    registered run/ACF features expose jointly.  One window pass +
    one bounded islands group.
    """
    z = _bucket_grid(spark, sf_dir, 3600)
    tot = z.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
    )
    wo = W.orderBy("idx")
    sg = z.crossJoin(F.broadcast(tot)).select(
        "idx",
        "y",
        F.expr("sign(n * y - s)").alias("sg"),
        F.lag("y").over(wo).alias("yp"),
        F.lag(F.expr("sign(n * y - s)")).over(wo).alias("sp"),
        "n",
    )
    longest = (
        sg.where("sg = 1")
        .select(
            (F.col("idx") - F.row_number().over(W.orderBy("idx"))).alias(
                "grp"
            )
        )
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.coalesce(F.max("cnt"), F.lit(0))
            .cast("long")
            .alias("longest_above")
        )
    )
    agg = sg.agg(
        F.expr(
            "CAST(sum(CASE WHEN sp IS NOT NULL AND sg * sp < 0"
            " THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_crossings"),
        F.expr(
            "CAST(sum(CASE WHEN yp IS NOT NULL THEN abs(y - yp)"
            " ELSE 0 END) AS BIGINT)"
        ).alias("tv"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return agg.crossJoin(F.broadcast(longest)).selectExpr(
        "n AS n_hours",
        "n_crossings",
        "longest_above",
        "round(CAST(tv AS DOUBLE)"
        " / nullif(CAST(n - 1 AS DOUBLE), 0), 6) + 0.0"
        " AS mean_abs_change",
    )

@stage(
    "western_electric_rules_6h",
    f"""
    WITH {_SIXH_GRID_SQL},
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS s
      FROM z
    ),
    dz AS (
      SELECT idx,
             (n * y - s)::HUGEINT * (n * y - s) AS d2,
             sign(n * y - s) AS sg,
             n::HUGEINT * s AS ns
      FROM z CROSS JOIN tot
    ),
    flags AS (
      SELECT idx, sg,
             CASE WHEN d2 > 9 * ns THEN 1 ELSE 0 END AS z3,
             CASE WHEN d2 > 4 * ns AND sg > 0 THEN 1 ELSE 0 END AS a2,
             CASE WHEN d2 > 4 * ns AND sg < 0 THEN 1 ELSE 0 END AS b2,
             CASE WHEN d2 > 1 * ns AND sg > 0 THEN 1 ELSE 0 END AS a1,
             CASE WHEN d2 > 1 * ns AND sg < 0 THEN 1 ELSE 0 END AS b1,
             CASE WHEN sg > 0 THEN 1 ELSE 0 END AS ab,
             CASE WHEN sg < 0 THEN 1 ELSE 0 END AS bl
      FROM dz
    ),
    wf AS (
      SELECT idx, z3,
             sum(a2) OVER (ORDER BY idx
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS w2a,
             sum(b2) OVER (ORDER BY idx
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS w2b,
             sum(a1) OVER (ORDER BY idx
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS w1a,
             sum(b1) OVER (ORDER BY idx
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS w1b,
             sum(ab) OVER (ORDER BY idx
               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS w4a,
             sum(bl) OVER (ORDER BY idx
               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS w4b,
             count(*) OVER (ORDER BY idx
               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS w8n,
             count(*) OVER (ORDER BY idx
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS w5n,
             count(*) OVER (ORDER BY idx
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS w3n
      FROM flags
    )
    SELECT (SELECT n FROM tot) AS n_buckets,
           CAST(sum(z3) AS BIGINT) AS hits_rule1,
           CAST(sum(CASE WHEN w3n = 3 AND (w2a >= 2 OR w2b >= 2)
                    THEN 1 ELSE 0 END) AS BIGINT) AS hits_rule2,
           CAST(sum(CASE WHEN w5n = 5 AND (w1a >= 4 OR w1b >= 4)
                    THEN 1 ELSE 0 END) AS BIGINT) AS hits_rule3,
           CAST(sum(CASE WHEN w8n = 8 AND (w4a = 8 OR w4b = 8)
                    THEN 1 ELSE 0 END) AS BIGINT) AS hits_rule4
    FROM wf
    """,
)
def q_western_electric_rules_6h(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Western Electric run-rule hits on the 6-hour count series as a
    c-chart: rule 1 (a point beyond 3 sigma), rule 2 (>= 2 of 3
    consecutive beyond 2 sigma, same side), rule 3 (>= 4 of 5 beyond
    1 sigma, same side), rule 4 (8 consecutive on one side of
    center).  The registered SPC charts flag rule-1-style breaches
    only; the run rules are the classic detectors of SMALL sustained
    shifts.  With Poisson (c-chart) limits center = s/n and sigma^2 =
    s/n, every zone test is EXACT integer arithmetic: (n*y - s)^2 >
    k^2 * n * s — no sqrt, no division anywhere (int128: the squared
    deviation reaches (n*N)^2 at the design point).  Sided-ness rides
    sign(n*y - s).  One scaffold pass + one multi-column ROWS window.
    """
    z = _bucket_grid(spark, sf_dir, 21600)
    tot = z.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
    )
    dz = z.crossJoin(F.broadcast(tot)).selectExpr(
        "idx",
        "CAST(n * y - s AS DECIMAL(38,0)) * (n * y - s) AS d2",
        "sign(n * y - s) AS sg",
        "CAST(n AS DECIMAL(38,0)) * s AS ns",
    )
    flags = dz.selectExpr(
        "idx",
        "CASE WHEN d2 > 9 * ns THEN 1 ELSE 0 END AS z3",
        "CASE WHEN d2 > 4 * ns AND sg > 0 THEN 1 ELSE 0 END AS a2",
        "CASE WHEN d2 > 4 * ns AND sg < 0 THEN 1 ELSE 0 END AS b2",
        "CASE WHEN d2 > 1 * ns AND sg > 0 THEN 1 ELSE 0 END AS a1",
        "CASE WHEN d2 > 1 * ns AND sg < 0 THEN 1 ELSE 0 END AS b1",
        "CASE WHEN sg > 0 THEN 1 ELSE 0 END AS ab",
        "CASE WHEN sg < 0 THEN 1 ELSE 0 END AS bl",
    )
    wo = W.orderBy("idx")
    wf = flags.select(
        "z3",
        F.sum("a2").over(wo.rowsBetween(-2, 0)).alias("w2a"),
        F.sum("b2").over(wo.rowsBetween(-2, 0)).alias("w2b"),
        F.sum("a1").over(wo.rowsBetween(-4, 0)).alias("w1a"),
        F.sum("b1").over(wo.rowsBetween(-4, 0)).alias("w1b"),
        F.sum("ab").over(wo.rowsBetween(-7, 0)).alias("w4a"),
        F.sum("bl").over(wo.rowsBetween(-7, 0)).alias("w4b"),
        F.count("*").over(wo.rowsBetween(-7, 0)).alias("w8n"),
        F.count("*").over(wo.rowsBetween(-4, 0)).alias("w5n"),
        F.count("*").over(wo.rowsBetween(-2, 0)).alias("w3n"),
    )
    out = wf.agg(
        F.expr("CAST(sum(z3) AS BIGINT)").alias("hits_rule1"),
        F.expr(
            "CAST(sum(CASE WHEN w3n = 3 AND (w2a >= 2 OR w2b >= 2)"
            " THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("hits_rule2"),
        F.expr(
            "CAST(sum(CASE WHEN w5n = 5 AND (w1a >= 4 OR w1b >= 4)"
            " THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("hits_rule3"),
        F.expr(
            "CAST(sum(CASE WHEN w8n = 8 AND (w4a = 8 OR w4b = 8)"
            " THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("hits_rule4"),
    )
    return out.crossJoin(F.broadcast(tot.select("n"))).selectExpr(
        "n AS n_buckets",
        "hits_rule1",
        "hits_rule2",
        "hits_rule3",
        "hits_rule4",
    )


@stage(
    "diebold_mariano_forecast_test",
    f"""
    WITH {_HOURLY_GRID_SQL},
    lagged AS (
      SELECT y,
             lag(y, 1) OVER (ORDER BY idx) AS l1,
             lag(y, 24) OVER (ORDER BY idx) AS l24
      FROM z
    ),
    d AS (
      SELECT abs(y - l1) - abs(y - l24) AS dv
      FROM lagged WHERE l24 IS NOT NULL
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(dv) AS BIGINT) AS sd,
             sum(dv::HUGEINT * dv) AS sdd
      FROM d
    )
    SELECT m AS n_terms,
           round(CAST(sd AS DOUBLE) / nullif(CAST(m AS DOUBLE), 0), 6)
             + 0.0 AS mean_loss_diff,
           round((CAST(sd AS DOUBLE) / m)
                 / nullif(sqrt((CAST(sdd AS DOUBLE)
                     - CAST(sd AS DOUBLE) * sd / m)
                   / nullif(CAST(m AS DOUBLE) * m, 0)), 0), 6) + 0.0
             AS dm_stat
    FROM mom
    """,
)
def q_diebold_mariano_forecast_test(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Diebold-Mariano comparison of the naive (lag-1) vs seasonal
    naive (lag-24) one-step forecasts of the zero-filled hourly count
    series, under ABSOLUTE-error loss: d_t = |e_naive| - |e_seasonal|,
    DM = mean(d) / sqrt(var(d)/m) (lag-0 long-run variance — the
    h = 1 case).  The registered MASE / Theil's U2 queries report each
    forecaster's accuracy; DM is the paired TEST of whether the gap is
    real, which neither ratio provides.  Absolute loss is what keeps
    the statistic exact at scale: d is a BIGINT per row and d^2 an
    int128 (squared-error loss would need ~1e48 per-row products at
    the design point).  One window pass over the bounded hourly grid;
    the final algebra runs on three aggregated scalars.
    """
    z = _bucket_grid(spark, sf_dir, 3600)
    wo = W.orderBy("idx")
    lagged = z.select(
        "y",
        F.lag("y", 1).over(wo).alias("l1"),
        F.lag("y", 24).over(wo).alias("l24"),
    )
    d = lagged.where(F.col("l24").isNotNull()).selectExpr(
        "abs(y - l1) - abs(y - l24) AS dv"
    )
    mom = d.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("dv").cast("long").alias("sd"),
        F.expr("sum(CAST(dv AS DECIMAL(38,0)) * dv)").alias("sdd"),
    )
    return mom.selectExpr(
        "m AS n_terms",
        "round(CAST(sd AS DOUBLE) / nullif(CAST(m AS DOUBLE), 0), 6)"
        " + 0.0 AS mean_loss_diff",
        "round((CAST(sd AS DOUBLE) / m)"
        " / nullif(sqrt((CAST(sdd AS DOUBLE)"
        " - CAST(sd AS DOUBLE) * sd / m)"
        " / nullif(CAST(m AS DOUBLE) * m, 0)), 0), 6) + 0.0"
        " AS dm_stat",
    )
