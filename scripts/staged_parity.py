"""Run every STAGED operator of a staging module against its DuckDB
oracle at sf0.1 (default) with per-op timings — the pre-wiring scale
gate.

The unit fixtures in tests/test_staging_r1N.py catch semantic bugs on
hand-computable inputs, but two classes only show at scale (both bit
round 11's staging): DECIMAL output leaks masked by dyadic fixture
values, and grid-cardinality cost blowups (hodges_lehmann's centi grid
was 4x slower than deci at sf0.1). Run this before wiring STAGED into
the registry; after wiring, the ops join the normal parity_sweep.py.

Usage: python scripts/staged_parity.py [sf_dir] [staging_module]
       (staging_module defaults to eventstreamml_spark.staging_r12;
        pass eventstreamml_spark.staging_r13 for the round-13 set)
"""

from __future__ import annotations

import importlib
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from eventstreamml_spark.session import get_spark  # noqa: E402
from eventstreamml_spark.sources.testdata import load_table  # noqa: E402
from tests.oracle import compare  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mod_name = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "eventstreamml_spark.staging_r12"
    )
    staged = importlib.import_module(mod_name).STAGED
    spark = get_spark("staged-parity")
    load_table(spark, sf, "events").count()
    for name in list(staged)[:3]:
        staged[name][0](spark, sf).collect()
    bad, times = [], {}
    for name, (fn, sql) in staged.items():
        t0 = time.perf_counter()
        try:
            compare(spark, sf, fn, sql)
        except Exception as ex:  # noqa: BLE001 - report-all gate
            bad.append((name, str(ex)[:300]))
        times[name] = round(time.perf_counter() - t0, 2)
    print(
        f"STAGED[{mod_name}] {sf} parity:"
        f" {len(staged) - len(bad)}/{len(staged)} green"
    )
    for n, m in bad:
        print("FAIL", n, m)
    print("slowest:", sorted(times.items(), key=lambda kv: -kv[1])[:8])
    print("total_sec:", round(sum(times.values()), 1))
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
