"""Append never-measured queries to BENCH_FULL.json at their OWN
calibration (the committed append-only bench policy: existing rows are
never re-measured at a slower window; new queries enter with the
calibration of the run that measured them, recorded per-query in
``per_query_calibration_sec``).

Runs a FRESH session (the round-9 probe caveat: a query-hot session
reads the calibration workload ~2x fast), measures the same fixed
spark.range calibration workload as bench.py, then times only the
requested queries (sorted-name order, one untimed warm-up pass over the
first five) with ``$SPARK_GRAFT_BENCH_REPS`` reps (default 3).

Usage: python scripts/bench_append.py name1 name2 ...
       python scripts/bench_append.py --missing   # all registry names
                                                  # absent from BENCH_FULL
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FULL = os.path.join(REPO, "BENCH_FULL.json")


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    from eventstreamml_spark import queries as q
    from eventstreamml_spark.session import get_spark

    with open(FULL) as f:
        full = json.load(f)

    if sys.argv[1:] == ["--missing"]:
        names = sorted(set(q.queries()) - set(full["queries"]))
    else:
        names = sorted(sys.argv[1:])
    unknown = [n for n in names if n not in q.queries()]
    if unknown:
        print("unknown queries:", unknown, file=sys.stderr)
        return 2
    already = [n for n in names if n in full["queries"]]
    if already:
        print("refusing to re-measure committed rows:", already,
              file=sys.stderr)
        return 2
    if not names:
        print("nothing to append", file=sys.stderr)
        return 0

    spark = get_spark("eventstreamml_spark_bench_append")
    from eventstreamml_spark.sources.testdata import load_table

    load_table(spark, sf_dir, "events").count()

    cal = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(50_000_000).selectExpr(
            "sum(id * 2654435761 % 1000003) AS s"
        ).collect()
        cal.append(time.perf_counter() - t0)
    calibration = round(statistics.median(cal), 4)
    print(f"# calibration {calibration}", file=sys.stderr)

    def _run_once(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        return time.perf_counter() - t0

    for n in names[:5]:
        _run_once(q.queries()[n])

    pqc = full.setdefault("per_query_calibration_sec", {})
    for n in names:
        ts = [_run_once(q.queries()[n]) for _ in range(reps)]
        med = round(statistics.median(ts), 3)
        full["queries"][n] = med
        full["queries_raw"][n] = [round(t, 4) for t in ts]
        full["queries_norm"][n] = round(med / calibration, 3)
        pqc[n] = calibration
        print(f"# {n}: med {med:.3f}s "
              f"({['%.3f' % t for t in ts]})", file=sys.stderr)

    full["n_queries"] = len(full["queries"])
    full["value"] = round(sum(full["queries"].values()), 3)
    with open(FULL, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
    print(json.dumps({"appended": len(names),
                      "calibration_sec": calibration,
                      "n_queries": full["n_queries"]}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
