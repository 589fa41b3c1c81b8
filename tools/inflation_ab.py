#!/usr/bin/env python
"""Root-cause harness for late-bench session-state inflation.

Round-8 verdict item 2: five plan-unchanged queries ran 1.9-4.2x
slower INSIDE the full bench than solo, and the round-9 canary
first/last passes measure the same drag directly. Hypothesis under
test: the driver JVM never garbage-collects during a ~6 min bench
(spark.cleaner.periodicGC.interval defaults to 30 min), so the
ContextCleaner -- which discovers dead broadcasts / localCheckpoint
RDDs / shuffle dependencies via weak references -- never reclaims
anything; hundreds of queries of accumulated state then tax every
subsequent job (block-manager pressure, shuffle-file dirs, broadcast
re-eviction).

Protocol (one JVM per arm, same query order):

    python tools/inflation_ab.py baseline   # pollute, then time probes
    python tools/inflation_ab.py gc         # same + System.gc() every N queries

Each arm: time the PROBE queries fresh (pre), run the first
POLLUTE_N catalog queries once each (the pollution phase == bench
position), then re-time the probes (post). Inflation = post/pre per
probe. The gc arm inserts a driver-side System.gc() every GC_EVERY
pollution queries, which is exactly what spark.cleaner.periodicGC
does on its timer.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from cost_of_living_data_etl_spark.plans import catalog  # noqa: E402
from cost_of_living_data_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
POLLUTE_N = int(os.environ.get("POLLUTE_N", "120"))
GC_EVERY = int(os.environ.get("GC_EVERY", "25"))

PROBES = [
    "q_decay_attribution",
    "q_dedup_clusters_star",
    "q_zorder_layout_manifest",
    "q_negative_sampling_pairs",
    "q_bh_fdr_event_tests",
]


def main() -> int:
    arm = sys.argv[1] if len(sys.argv) > 1 else "baseline"
    spark = get_spark(app_name=f"inflation-ab-{arm}")
    spark.sparkContext.setLogLevel("ERROR")
    cat = catalog()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        cat[name].fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    # codegen warm-up, then cold+warm probe baseline
    run("q1_pricing_summary")
    pre: dict[str, float] = {}
    for p in PROBES:
        run(p)  # cold (codegen) pass
        spark.catalog.clearCache()
        pre[p] = round(run(p), 3)
        spark.catalog.clearCache()

    pollute = [n for n in cat if n not in PROBES][:POLLUTE_N]
    t0 = time.perf_counter()
    for i, name in enumerate(pollute):
        run(name)
        spark.catalog.clearCache()
        if arm == "gc" and (i + 1) % GC_EVERY == 0:
            spark.sparkContext._jvm.System.gc()
    pollute_sec = round(time.perf_counter() - t0, 1)

    post: dict[str, float] = {}
    for p in PROBES:
        post[p] = round(run(p), 3)
        spark.catalog.clearCache()

    out = {
        "arm": arm,
        "pollute_n": len(pollute),
        "pollute_sec": pollute_sec,
        "pre": pre,
        "post": post,
        "inflation": {p: round(post[p] / pre[p], 2) for p in PROBES},
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
