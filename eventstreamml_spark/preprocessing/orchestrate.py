"""End-to-end preprocessing orchestration — SURVEY §3 E2
(``preprocess_metadata``, event_stream_dataset.py:930-1549).

``EventStreamPreprocessor`` drives the full fit → model-state →
transform lifecycle over an ``EventStreamDataset`` + ``DatasetConfig``:

fit (train split ONLY — the reference reads ``split='train'`` at
:1043/:1125/:1304; callers pass the train-restricted dataset):
  1. functional time-dependent columns: registered functors attached to
     events (U1/J4);
  2. numeric fit (``NumericPreprocessor``: bounds → value types →
     outliers → normalizer): per MULTIVARIATE_REGRESSION measurement
     over its (key, value) pairs, and per FUNCTIONAL_TIME_DEPENDENT
     numeric column (e.g. Age) with the measurement name as the single
     key (reference :1100-1156);
  3. categorical fit (``CategoricalPreprocessor``) over ALL
     measurements' elements — classification measurements contribute
     their values; regression measurements contribute their keys with
     categorical-subtype keys rewritten to ``__EQ_`` tokens first
     (:1320-1331);
  4. static measurements: vocabularies over ``subjects`` columns.

transform (any split): produces a LONG-format observations relation
``(metadata_id, event_id, subject_id, measurement, element, value)``
with numeric transforms applied (drop/censor/outlier-null/normalize),
categorical rewrites done, and out-of-vocab elements mapped to UNK —
exactly the shape :func:`eventstreamml_spark.export.tensorize`
consumes, closing the E1→E2→E3 pipeline.

The wide→long melt uses ``stack`` (one pass, no UDF); model state is
small DataFrames throughout, broadcast at transform.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from eventstreamml_spark.config import (
    DataModality,
    DatasetConfig,
    TemporalityType,
)
from eventstreamml_spark.dataset import EventStreamDataset
from eventstreamml_spark.functions.tokens import float_token, int_token
from eventstreamml_spark.preprocessing.categorical import (
    CategoricalPreprocessor,
    CategoricalPreprocessorModel,
)
from eventstreamml_spark.preprocessing.functors import FUNCTORS, with_age
from eventstreamml_spark.preprocessing.pipeline import (
    NumericPreprocessor,
    NumericPreprocessorModel,
)
from eventstreamml_spark.vocabulary import build_vocabulary


def add_time_dependent_columns(
    events: DataFrame,
    subjects: DataFrame | None,
    config: DatasetConfig,
    ts_col: str = "timestamp",
) -> DataFrame:
    """E2 step 1 (:937-945): attach one column per
    FUNCTIONAL_TIME_DEPENDENT measurement via the functor registry."""
    for name, mc in config.measurement_configs.items():
        if mc.temporality != TemporalityType.FUNCTIONAL_TIME_DEPENDENT:
            continue
        if mc.functor == "time_of_day":
            events = events.withColumn(name, FUNCTORS["time_of_day"](F.col(ts_col)))
        elif mc.functor == "age":
            if subjects is None:
                raise ValueError(f"{name}: age functor requires a subjects relation")
            events = with_age(events, subjects, ts_col=ts_col, out_col=name)
        else:
            raise KeyError(f"{name}: unknown functor {mc.functor!r}")
    return events


class EventStreamPreprocessorModel:
    def __init__(
        self,
        config: DatasetConfig,
        numeric_models: dict[str, NumericPreprocessorModel],
        categorical_model: CategoricalPreprocessorModel,
        static_vocabs: dict[str, DataFrame],
    ) -> None:
        self.config = config
        self.numeric_models = numeric_models
        self.categorical_model = categorical_model
        self.static_vocabs = static_vocabs

    def vocabs(self) -> dict[str, DataFrame]:
        """Per-measurement vocabularies (element, freq, idx) for
        :func:`tensorize`, in declared-measurement order."""
        v = self.categorical_model.vocab
        out = {}
        for name, mc in self.config.measurement_configs.items():
            if mc.temporality == TemporalityType.STATIC:
                continue
            out[name] = v.filter(F.col("measurement") == name).select("element", "freq", "idx")
        return out

    def transform(self, ds: EventStreamDataset) -> DataFrame:
        """Long observations with all transforms applied."""
        long = melt_observations(ds, self.config)

        # numeric transforms per regression measurement (value path)
        out = []
        for name, mc in self.config.measurement_configs.items():
            if mc.temporality == TemporalityType.STATIC:
                continue
            part = long.filter(F.col("measurement") == name)
            if name in self.numeric_models:
                m = self.numeric_models[name]
                part = m.transform(part.withColumnRenamed("element", m.key_col)
                                       .withColumnRenamed("value", m.value_col))
                part = part.select(
                    "metadata_id",
                    "event_id",
                    "subject_id",
                    "measurement",
                    # categorical-subtype keys were rewritten to tokens;
                    # numeric keys keep the key as element
                    F.coalesce(F.col(f"{m.value_col}_token"), F.col(m.key_col)).alias("element"),
                    F.col(m.value_col).alias("value"),
                )
            out.append(part.select("metadata_id", "event_id", "subject_id", "measurement", "element", "value"))
        obs = out[0]
        for p in out[1:]:
            obs = obs.unionByName(p)

        # vocab membership: OOV → UNK, dropped measurements → null element
        return self.categorical_model.transform(obs)

    # -- persistence: the reference dill-pickles the whole dataset
    #    object (event_stream_dataset.py:42-44, utils.py:95-116); here
    #    every piece of fitted state is an engine-portable parquet
    #    relation plus the config's existing JSON round-trip. ----------
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        self.config.to_json_file(os.path.join(path, "config.json"))
        for name, m in self.numeric_models.items():
            m.save(os.path.join(path, "numeric", name))
        self.categorical_model.save(os.path.join(path, "categorical"))
        for name, v in self.static_vocabs.items():
            v.write.mode("overwrite").parquet(os.path.join(path, "static_vocabs", name))
        manifest = {
            "model": "event_stream_preprocessor",
            "numeric_models": sorted(self.numeric_models),
            "static_vocabs": sorted(self.static_vocabs),
        }
        with open(os.path.join(path, "model.json"), "w") as f:
            json.dump(manifest, f, indent=2)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "EventStreamPreprocessorModel":
        with open(os.path.join(path, "model.json")) as f:
            m = json.load(f)
        config = DatasetConfig.from_json_file(os.path.join(path, "config.json"))
        numeric_models = {
            name: NumericPreprocessorModel.load(spark, os.path.join(path, "numeric", name))
            for name in m["numeric_models"]
        }
        cat_model = CategoricalPreprocessorModel.load(
            spark, os.path.join(path, "categorical")
        )
        static_vocabs = {
            name: spark.read.parquet(os.path.join(path, "static_vocabs", name)).cache()
            for name in m["static_vocabs"]
        }
        return cls(config, numeric_models, cat_model, static_vocabs)


def melt_observations(ds: EventStreamDataset, config: DatasetConfig) -> DataFrame:
    """Wide sparse metadata + functor event columns → long observations
    ``(metadata_id, event_id, subject_id, measurement, element, value)``.

    - MULTI/SINGLE_LABEL measurements: element = the measurement
      column's value (cast to string), value = null;
    - MULTIVARIATE_REGRESSION: element = the key column's value,
      value = the values_column;
    - FUNCTIONAL_TIME_DEPENDENT: one observation per event from the
      functor column on events (metadata_id = -event_id-1: synthetic,
      collision-free vs real metadata ids which are ≥0).
    """
    pieces: list[DataFrame] = []
    md, ev = ds.metadata, ds.events
    for name, mc in config.measurement_configs.items():
        if mc.temporality == TemporalityType.DYNAMIC:
            if mc.modality == DataModality.MULTIVARIATE_REGRESSION:
                if name not in md.columns:
                    continue
                pieces.append(
                    md.filter(F.col(name).isNotNull()).select(
                        "metadata_id",
                        "event_id",
                        "subject_id",
                        F.lit(name).alias("measurement"),
                        F.col(name).cast("string").alias("element"),
                        F.col(mc.values_column).cast("double").alias("value"),
                    )
                )
            else:
                if name not in md.columns:
                    continue
                pieces.append(
                    md.filter(F.col(name).isNotNull()).select(
                        "metadata_id",
                        "event_id",
                        "subject_id",
                        F.lit(name).alias("measurement"),
                        F.col(name).cast("string").alias("element"),
                        F.lit(None).cast("double").alias("value"),
                    )
                )
        elif mc.temporality == TemporalityType.FUNCTIONAL_TIME_DEPENDENT:
            if name not in ev.columns:
                continue
            is_numeric = dict(ev.dtypes)[name] in ("double", "float", "int", "bigint")
            pieces.append(
                ev.filter(F.col(name).isNotNull()).select(
                    (-F.col("event_id") - 1).alias("metadata_id"),
                    "event_id",
                    "subject_id",
                    F.lit(name).alias("measurement"),
                    (F.lit(name) if is_numeric else F.col(name).cast("string")).alias("element"),
                    (F.col(name).cast("double") if is_numeric else F.lit(None).cast("double")).alias("value"),
                )
            )
    if not pieces:
        raise ValueError("no declared dynamic/time-dependent measurements found")
    obs = pieces[0]
    for p in pieces[1:]:
        obs = obs.unionByName(p)
    return obs


class EventStreamPreprocessor:
    """Estimator over (EventStreamDataset, DatasetConfig)."""

    def __init__(self, config: DatasetConfig) -> None:
        self.config = config

    def fit(self, train_ds: EventStreamDataset, bounds: DataFrame | None = None) -> EventStreamPreprocessorModel:
        cfg = self.config
        pcfg = cfg.preprocessing_config()
        long = melt_observations(train_ds, cfg)

        # 2. numeric fit: multivariate-regression measurements (per-key
        #    over their (key, value) pairs) AND functional time-dependent
        #    numeric columns (single key = the measurement name) — the
        #    reference fits both (_fit_dynamic_numerical_metadata_column
        #    and _fit_time_dependent_numerical_metadata_column,
        #    event_stream_dataset.py:1012-1013, :1100-1156), so columns
        #    like Age get bounds/outlier/normalizer state too.
        ev_dtypes = dict(train_ds.events.dtypes)
        numeric_models: dict[str, NumericPreprocessorModel] = {}
        for name, mc in cfg.measurement_configs.items():
            is_td_numeric = (
                mc.temporality == TemporalityType.FUNCTIONAL_TIME_DEPENDENT
                and mc.is_numeric
                and ev_dtypes.get(name) in ("double", "float", "int", "bigint")
            )
            if mc.modality != DataModality.MULTIVARIATE_REGRESSION and not is_td_numeric:
                continue
            part = long.filter(F.col("measurement") == name).select(
                F.col("element").alias("key"), F.col("value")
            )
            numeric_models[name] = NumericPreprocessor("key", "value", pcfg).fit(part, bounds)

        # 3. categorical fit over final elements (tokens for
        #    categorical-subtype regression keys, raw elements otherwise)
        elements = []
        for name, mc in cfg.measurement_configs.items():
            if mc.temporality == TemporalityType.STATIC:
                continue
            part = long.filter(F.col("measurement") == name)
            if name in numeric_models:
                state = numeric_models[name].state.select(
                    F.col("key").alias("element"), F.col("value_type").alias("_vt")
                )
                part = part.join(F.broadcast(state), "element", "left")
                token = (
                    F.when(F.col("_vt") == "categorical_integer",
                           int_token(F.col("element"), F.col("value")))
                    .when(F.col("_vt") == "categorical_float",
                          float_token(F.col("element"), F.col("value")))
                    .otherwise(F.col("element"))
                )
                part = part.withColumn("element", token).drop("_vt")
            elements.append(part.select("measurement", "element"))
        stacked = elements[0]
        for p in elements[1:]:
            stacked = stacked.unionByName(p)
        cat_model = CategoricalPreprocessor("measurement", "element", pcfg).fit(stacked)

        # 4. static vocabularies
        static_vocabs: dict[str, DataFrame] = {}
        if train_ds.subjects is not None:
            for name, mc in cfg.measurement_configs.items():
                if mc.temporality == TemporalityType.STATIC and name in train_ds.subjects.columns:
                    static_vocabs[name] = build_vocabulary(
                        train_ds.subjects.select(name), name
                    )

        return EventStreamPreprocessorModel(cfg, numeric_models, cat_model, static_vocabs)
