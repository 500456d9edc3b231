"""Query registry: every implemented SURVEY §2 operator expressed as an
oracle-checkable query over the driver test tables.

Each entry is ``name -> (spark_fn, oracle_sql | None)`` where
``spark_fn(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is
DuckDB-runnable ANSI SQL over the pre-registered views. Column names
are aliased identically on both sides; float outputs are rounded to a
fixed precision on BOTH sides so the driver's order-insensitive
value-hash is immune to floating-point summation order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from eventstreamml_spark.operators import aggregations as agg
from eventstreamml_spark.operators import filters as flt
from eventstreamml_spark.operators import windows as win
from eventstreamml_spark.sources.testdata import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]
_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {k: v[0] for k, v in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# Event-engine core (SURVEY §2.4 / §2.5)
# ---------------------------------------------------------------------------


@register(
    "event_type_histogram",
    """
    SELECT event_type, count(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def q_event_type_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: event types by descending frequency."""
    return agg.event_type_histogram(_events(spark, sf_dir))


@register(
    "agg_by_time_type",
    """
    WITH g AS (
      SELECT user_id, ts, event_type,
             count(*) AS n_merged, min(event_id) AS min_old_event_id
      FROM events GROUP BY user_id, ts, event_type
    )
    SELECT row_number() OVER (ORDER BY user_id, ts, event_type) - 1 AS event_id,
           user_id, ts, event_type, n_merged, min_old_event_id
    FROM g
    """,
)
def q_agg_by_time_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: dedup events on (subject, ts, type) + renumber 0..n-1."""
    out = agg.agg_by_time_type(
        _events(spark, sf_dir), subject_col="user_id", ts_col="ts",
        type_col="event_type", id_col="event_id",
    )
    return out.select(
        "event_id", "user_id", "ts", "event_type", "n_merged",
        F.element_at("old_event_ids", 1).alias("min_old_event_id"),
    )


@register(
    "events_per_subject",
    """
    SELECT user_id, count(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def q_events_per_subject(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: events per subject (no zero-event subjects in the driver
    events table — no subjects side table exists)."""
    return agg.events_per_subject(_events(spark, sf_dir), subject_col="user_id")


@register(
    "inter_event_time_stats",
    """
    WITH tte AS (
      SELECT (epoch_us(ts) - epoch_us(lag(ts) OVER w)) / 60000000.0 AS tte
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT count(*) AS n_ttes,
           round(avg(ln(tte + 1)), 6) AS mean_log_tte,
           round(stddev_samp(ln(tte + 1)), 6) AS std_log_tte,
           round(avg(tte), 6) AS mean_tte
    FROM tte WHERE tte IS NOT NULL
    """,
)
def q_inter_event_time_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/W2: global stats of log(Δt+1), Δt in minutes, ddof=1."""
    out = agg.inter_event_time_stats(
        _events(spark, sf_dir), subject_col="user_id", ts_col="ts", id_col="event_id"
    )
    return out.select(
        "n_ttes",
        F.round("mean_log_tte", 6).alias("mean_log_tte"),
        F.round("std_log_tte", 6).alias("std_log_tte"),
        F.round("mean_tte", 6).alias("mean_tte"),
    )


@register(
    "tte_stats_by_type",
    """
    WITH tte AS (
      SELECT event_type,
             (epoch_us(ts) - epoch_us(lag(ts) OVER w)) / 60000000.0 AS tte
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type, count(*) AS n_ttes,
           round(avg(ln(tte + 1)), 6) AS mean_log_tte,
           round(stddev_samp(ln(tte + 1)), 6) AS std_log_tte,
           round(avg(tte), 6) AS mean_tte
    FROM tte WHERE tte IS NOT NULL GROUP BY event_type
    """,
)
def q_tte_stats_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 grouped: per-event-type stats of per-subject inter-event times."""
    out = agg.inter_event_time_stats(
        _events(spark, sf_dir), subject_col="user_id", ts_col="ts",
        id_col="event_id", by=["event_type"],
    )
    return out.select(
        "event_type", "n_ttes",
        F.round("mean_log_tte", 6).alias("mean_log_tte"),
        F.round("std_log_tte", 6).alias("std_log_tte"),
        F.round("mean_tte", 6).alias("mean_tte"),
    )


@register(
    "time_of_day_histogram",
    """
    SELECT CASE WHEN hour(ts) < 6 THEN 'EARLY_AM' WHEN hour(ts) < 12 THEN 'AM'
                WHEN hour(ts) < 21 THEN 'PM' ELSE 'LATE_PM' END AS time_of_day,
           count(*) AS n_events
    FROM events GROUP BY 1
    """,
)
def q_time_of_day_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 TimeOfDayFunctor buckets (time_dependent_functor.py:59-72)
    + A2-style histogram."""
    from eventstreamml_spark.preprocessing.functors import time_of_day

    ev = _events(spark, sf_dir).withColumn("time_of_day", time_of_day(F.col("ts")))
    return ev.groupBy("time_of_day").agg(F.count(F.lit(1)).alias("n_events"))


@register(
    "drop_censor_values",
    """
    SELECT event_id,
           CASE WHEN value < 5.0 OR value > 180.0 THEN NULL
                WHEN value < 10.0 THEN 10.0
                WHEN value > 150.0 THEN 150.0
                ELSE value END AS value_clean
    FROM events
    """,
)
def q_drop_censor_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: rowwise drop/censor with literal bounds (drop outside
    [5, 180] exclusive, censor into [10, 150])."""
    ev = _events(spark, sf_dir)
    expr = flt.drop_or_censor(
        F.col("value"),
        drop_lower_bound=5.0, drop_lower_bound_inclusive=False,
        drop_upper_bound=180.0, drop_upper_bound_inclusive=False,
        censor_lower_bound=10.0, censor_upper_bound=150.0,
    )
    return ev.select("event_id", expr.alias("value_clean"))


@register(
    "min_seq_len_filter",
    """
    SELECT e.user_id, count(*) AS n_events
    FROM events e
    WHERE e.user_id IN (
      SELECT user_id FROM events GROUP BY user_id HAVING count(*) >= 50
    )
    GROUP BY e.user_id
    """,
)
def q_min_seq_len_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: keep subjects with ≥50 events, then count per subject."""
    kept = flt.filter_min_seq_len(_events(spark, sf_dir), 50, subject_col="user_id")
    return kept.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))


@register(
    "time_since_start",
    """
    SELECT event_id,
           round((epoch_us(ts) - epoch_us(min(ts) OVER (PARTITION BY user_id)))
                 / 60000000.0, 6) AS time_since_start
    FROM events
    """,
)
def q_time_since_start(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: minutes since each subject's first event."""
    out = win.with_time_since_start(
        _events(spark, sf_dir), subject_col="user_id", ts_col="ts"
    )
    return out.select(
        "event_id", F.round("time_since_start", 6).alias("time_since_start")
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1-style dataset-construction slice (SURVEY §7 step 2): sort +
    dedup-agg + per-type TTE stats joined to the type histogram."""
    ev = _events(spark, sf_dir)
    dedup = agg.agg_by_time_type(
        ev, subject_col="user_id", ts_col="ts", type_col="event_type", id_col="event_id"
    )
    stats = agg.inter_event_time_stats(
        dedup, subject_col="user_id", ts_col="ts", id_col="event_id", by=["event_type"]
    )
    hist = agg.event_type_histogram(dedup)
    return hist.join(stats, "event_type", "left").orderBy(F.col("n_events").desc())
