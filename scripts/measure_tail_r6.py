"""Round-6 tail-trim measurement (ADVICE item 5): digest-prefix shingle
join key for containment, 8-hex winnowing fingerprints, bootstrap B=32
vs 48. Prints one JSON line with per-variant median seconds (3 reps).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W, functions as F


def timeit(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn().collect()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 3)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from eventstreamml_spark.session import get_spark
    from eventstreamml_spark.sources.testdata import load_table
    from eventstreamml_spark.operators.dedup import containment_pairs, word_shingles
    from eventstreamml_spark.operators.text import winnowing_fingerprints
    from eventstreamml_spark.operators.stats import bootstrap_mean_ci

    spark = get_spark("measure_tail_r6")
    docs = load_table(spark, sf_dir, "documents")
    orders = load_table(spark, sf_dir, "orders")
    docs.count()
    orders.count()

    out = {}

    # --- containment: current (raw shingle join) ---
    def cont_current():
        sh = word_shingles(docs, k=4)
        return containment_pairs(sh, threshold=0.2)

    # --- containment: 8-hex md5 prefix join key ---
    def cont_prefix():
        sh = word_shingles(docs, k=4).select(
            "doc_id", F.substring(F.md5("shingle"), 1, 8).alias("shingle")
        )
        return containment_pairs(sh, threshold=0.2)

    # --- winnowing current (full md5 fingerprints) ---
    def win_current():
        fps = winnowing_fingerprints(
            docs.filter(F.col("doc_id") % 2 == 0), k=20, w=4
        )
        return fps.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_fps"),
            F.md5(
                F.array_join(F.array_sort(F.collect_list("fingerprint")), ",")
            ).alias("fps_digest"),
        )

    # --- winnowing with 8-hex prefix hashes (inline variant) ---
    def win_prefix():
        d = docs.filter(F.col("doc_id") % 2 == 0)
        text = F.col("text")
        k, w = 20, 4
        n_grams = F.length(text) - F.lit(k - 1)
        grams = F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.substring(F.md5(F.substring(text, i, k)), 1, 8),
        )
        long = d.filter(F.length(text) >= k + w - 1).select(
            F.col("doc_id"),
            n_grams.alias("_n"),
            F.posexplode(grams).alias("pos", "h"),
        )
        win = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
        fps = (
            long.select(
                F.col("doc_id"),
                F.min("h").over(win).alias("fingerprint"),
                "pos",
                "_n",
            )
            .filter(F.col("pos") <= F.col("_n") - w)
            .select("doc_id", "fingerprint")
            .distinct()
        )
        return fps.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_fps"),
            F.md5(
                F.array_join(F.array_sort(F.collect_list("fingerprint")), ",")
            ).alias("fps_digest"),
        )

    def boot48():
        return bootstrap_mean_ci(
            orders, "o_totalprice", "o_orderkey", "o_orderstatus", n_replicates=48
        )

    def boot32():
        return bootstrap_mean_ci(
            orders, "o_totalprice", "o_orderkey", "o_orderstatus", n_replicates=32
        )

    out["containment_current"] = timeit(cont_current)
    out["containment_prefix8"] = timeit(cont_prefix)
    out["winnow_current"] = timeit(win_current)
    out["winnow_prefix8"] = timeit(win_prefix)
    out["boot_B48"] = timeit(boot48)
    out["boot_B32"] = timeit(boot32)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
