"""Functional time-dependent measurements — SURVEY §2.9 U1.

The reference's ``TimeDependentFunctor`` ABC
(time_dependent_functor.py:9-44) computes a per-event column from the
event time and static subject data. Spark-side these are Column
expression builders: ``fn(events_df, subjects_df) -> Column`` attached
via a broadcast join on ``subject_id`` (J4). A registry mirrors
``MeasurementConfig.FUNCTORS``; arbitrary user functors can fall back
to a pandas_udf, but the built-ins are pure JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def time_of_day(ts: Column) -> Column:
    """TimeOfDayFunctor buckets (time_dependent_functor.py:59-72):
    hour < 6 → EARLY_AM, < 12 → AM, < 21 → PM, else LATE_PM."""
    h = F.hour(ts)
    return (
        F.when(h < 6, F.lit("EARLY_AM"))
        .when(h < 12, F.lit("AM"))
        .when(h < 21, F.lit("PM"))
        .otherwise(F.lit("LATE_PM"))
    )


def age_in_years(ts: Column, dob: Column) -> Column:
    """AgeFunctor (time_dependent_functor.py:50-57):
    ``(timestamp - dob) / 365 days``, as fractional years."""
    seconds = F.unix_micros(ts.cast("timestamp")) - F.unix_micros(dob.cast("timestamp"))
    return seconds / F.lit(365.0 * 24 * 3600 * 1_000_000.0)


def with_age(
    events: DataFrame,
    subjects: DataFrame,
    subject_col: str = "subject_id",
    ts_col: str = "timestamp",
    dob_col: str = "dob",
    out_col: str = "age",
) -> DataFrame:
    """J4: events ⟕ subjects (broadcast — subjects is the small dim) +
    age expression."""
    s = subjects.select(subject_col, F.col(dob_col).alias("_dob"))
    joined = events.join(F.broadcast(s), subject_col, "left")
    return joined.withColumn(out_col, age_in_years(F.col(ts_col), F.col("_dob"))).drop("_dob")


#: registry of built-in functors, mirroring MeasurementConfig.FUNCTORS
#: (config.py:45-48): name → Column builder on (ts, static cols...)
FUNCTORS = {
    "time_of_day": time_of_day,
    "age": age_in_years,
}
