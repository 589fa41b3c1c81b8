#!/usr/bin/env python
"""Re-time a set of catalog queries SOLO in one fresh session — the
control arm for in-bench timing anomalies (SCALE.md drift sections).

Each query is executed cold-then-warm with the same run-once contract
as bench.py (fn construction inside the timer, noop sink,
clearCache between runs); a JVM warm-up batch (the bench canary's
cheap stratum) runs first so timings are past the steepest JIT ramp.

    python tools/retime_solo.py q_a q_b ... [--sf DIR] [--reps N]

Prints one JSON line: {"sf": ..., "warm": {name: [r1, r2, ...]}}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from cost_of_living_data_etl_spark.plans import catalog  # noqa: E402
from cost_of_living_data_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(app_name="retime-solo")
    spark.sparkContext.setLogLevel("ERROR")
    cat = catalog()
    unknown = [n for n in args.names if n not in cat]
    if unknown:
        print("UNKNOWN", *unknown)
        return 2

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        cat[name].fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # JIT warm-up: the bench canary's cheap stratum
    import bench

    for name in bench.CANARY:
        run_once(name)
        spark.catalog.clearCache()

    warm: dict[str, list[float]] = {}
    for name in args.names:
        run_once(name)  # cold (codegen compile)
        spark.catalog.clearCache()
        warm[name] = []
        for _ in range(args.reps):
            warm[name].append(round(run_once(name), 3))
            spark.catalog.clearCache()
    print(json.dumps({"sf": args.sf, "warm": warm}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
