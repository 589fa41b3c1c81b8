#!/usr/bin/env python
"""Per-query cost decomposition (optimization round 10).

For each named query: run cold then warm (same run_once contract as
bench.py — fn() construction inside the timer, noop sink), and record

- ``build``: seconds spent in fn() constructing the DataFrame — this
  includes every eager_checkpoint / collect the builder performs, i.e.
  the driver-side actions;
- ``act``: seconds in the final noop write;
- ``jobs``/``stages``/``tasks``: Spark jobs launched by the whole query
  (build + action), via a job group + statusTracker;
- ``plan_kb``: size of the analyzed plan string (driver analysis cost
  proxy).

Usage:
    python tools/profile_jobs.py q_raking_ipf_weights q_setsim_prefix_join
    python tools/profile_jobs.py --tail-floor 0.2 --tail-ceil 1.6  # all in range per BENCH ref
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from cost_of_living_data_etl_spark.plans import catalog  # noqa: E402
from cost_of_living_data_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 2
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
    specs = catalog()
    names = [n for n in args if n in specs]
    unknown = [n for n in args if n not in specs]
    if unknown:
        print("unknown:", unknown, file=sys.stderr)
    spark = get_spark(app_name="profile-jobs")
    sc = spark.sparkContext
    jsc = sc._jsc.sc()

    # JIT warm-up (same as bench.py)
    specs["q1_pricing_summary"].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    def run(name: str, tag: str) -> dict:
        group = f"{name}:{tag}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        df = specs[name].fn(spark, SF_DIR)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        sc.setJobGroup(None, None)
        tracker = jsc.statusTracker()
        jids = list(tracker.getJobIdsForGroup(group))
        n_stages = 0
        n_tasks = 0
        for j in jids:
            info = tracker.getJobInfo(j)
            if info.isEmpty():
                continue
            for s in list(info.get().stageIds()):
                si = tracker.getStageInfo(s)
                if not si.isEmpty():
                    n_stages += 1
                    n_tasks += si.get().numTasks()
        plan_kb = 0.0
        try:
            plan_kb = len(df._jdf.queryExecution().analyzed().toString()) / 1024.0
        except Exception:
            pass
        return {
            "total": round(t2 - t0, 3),
            "build": round(t1 - t0, 3),
            "act": round(t2 - t1, 3),
            "jobs": len(jids),
            "stages": n_stages,
            "tasks": n_tasks,
            "plan_kb": round(plan_kb, 1),
        }

    out = {}
    for name in names:
        recs = []
        r = run(name, "cold")
        spark.catalog.clearCache()
        recs.append(("cold", r))
        for i in range(reps):
            w = run(name, f"warm{i}")
            spark.catalog.clearCache()
            recs.append((f"warm{i}", w))
        out[name] = recs
        for tag, rec in recs:
            print(
                f"{name:40s} {tag:6s} total={rec['total']:7.3f} "
                f"build={rec['build']:7.3f} act={rec['act']:7.3f} "
                f"jobs={rec['jobs']:3d} stages={rec['stages']:4d} "
                f"tasks={rec['tasks']:5d} plan_kb={rec['plan_kb']:8.1f}"
            )
        sys.stdout.flush()
    Path("/tmp/profile_jobs_last.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
