"""Benchmark harness: runs the registered headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}``.

Per-query timing includes full plan execution (collect) but not session
startup; a warmup query absorbs JVM/codegen warmup, mirroring the
reference's ``TimeableMixin`` per-stage timing discipline
(event_stream_dataset.py:18)."""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from eventstreamml_spark import queries as q
    from eventstreamml_spark.session import get_spark

    spark = get_spark("eventstreamml_spark_bench")

    # warmup: touch the fact tables so JVM/codegen/FS cache warm up
    from eventstreamml_spark.sources.testdata import load_table

    load_table(spark, sf_dir, "events").count()

    timings: dict[str, float] = {}
    for name, fn in q.queries().items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = len(df.collect())
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                # registry size changes round to round as coverage
                # widens — totals are only comparable per-query or
                # normalized by n_queries
                "n_queries": len(timings),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
