"""Optimization profiler: per-query build/exec split + plans.

Usage:
  python scripts/opt_profile.py [--plans] [--noop] [--tag T] name1 ...
  python scripts/opt_profile.py --top N        # N slowest per BENCH_FULL

For each query: times DataFrame CONSTRUCTION (py4j plan building)
separately from execution (bench-identical ``collect()``; ``--noop``
additionally times the noop sink per guide §1.4), runs
``$SPARK_GRAFT_BENCH_REPS`` (default 3) reps, prints the calibration
workload first so numbers are drift-comparable, and with ``--plans``
writes ``plans/<round>/<name>_<tag>.txt`` with explain("formatted")
(round dir from ``--round``, default r12).

Output is one line per query:
  name  build=X  first=X  reps=[...]  med=X  rows=N
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="*", help="query names to profile")
    ap.add_argument("--plans", action="store_true", help="dump explain(formatted)")
    ap.add_argument("--noop", action="store_true", help="also time the noop sink")
    ap.add_argument("--tag", default="before", help="plan filename suffix")
    ap.add_argument("--round", default="r12", dest="round_dir", help="plans subdir")
    ap.add_argument("--top", type=int, default=None, help="N slowest per BENCH_FULL")
    ns = ap.parse_args()
    dump_plans, do_noop, tag = ns.plans, ns.noop, ns.tag
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if ns.top is not None:
        with open(os.path.join(repo, "BENCH_FULL.json")) as f:
            d = json.load(f)
        q_, pqc, cal = (
            d["queries"],
            d.get("per_query_calibration_sec", {}),
            d.get("calibration_sec"),
        )
        norm = {k: v / (pqc.get(k) or cal) for k, v in q_.items()}
        names = [k for k, _ in sorted(norm.items(), key=lambda kv: -kv[1])[: ns.top]]
    else:
        names = ns.names

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    from eventstreamml_spark import queries as q
    from eventstreamml_spark.session import get_spark
    from eventstreamml_spark.sources.testdata import load_table

    spark = get_spark("opt_profile")
    load_table(spark, sf_dir, "events").count()

    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(50_000_000).selectExpr(
            "sum(id * 2654435761 % 1000003) AS s"
        ).collect()
        ts.append(time.perf_counter() - t0)
    print(f"calibration={statistics.median(ts):.4f}", flush=True)

    qs = q.queries()
    plans_dir = os.path.join(repo, "plans", ns.round_dir)
    os.makedirs(plans_dir, exist_ok=True)

    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"opt_profile:{name}")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        if dump_plans:
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        t0 = time.perf_counter()
        rows = len(df.collect())
        t_first = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df2 = fn(spark, sf_dir)
            n = len(df2.collect())
            times.append(time.perf_counter() - t0)
        nt = []
        if do_noop:
            for _ in range(reps):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                nt.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        extra = f" noop_med={statistics.median(nt):.3f}" if nt else ""
        print(
            f"{name}  build={t_build:.3f}  first={t_first:.3f}  "
            f"reps={['%.3f' % t for t in times]}  "
            f"med={statistics.median(times):.3f}  rows={rows}{extra}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
