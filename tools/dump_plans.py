#!/usr/bin/env python
"""Dump ``explain("formatted")`` for a set of catalog queries to files.

    python tools/dump_plans.py --out plans/r09 --suffix _before q_a q_b ...

Used by the optimization rounds to commit before/after plan evidence
(`plans/r09/<query>_before.txt` / `_after.txt`). Builds each query at
$SPARK_GRAFT_SF_DIR (default sf0.1) in the normal (non-plan-only)
mode, so eager checkpoints materialize exactly as in the bench and
the dumped plan is the one the timed run executes.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from cost_of_living_data_etl_spark.plans import catalog  # noqa: E402
from cost_of_living_data_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--out", default="plans/r09")
    ap.add_argument("--suffix", default="_before")
    args = ap.parse_args()

    out = Path(REPO, args.out)
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    cat = catalog()
    unknown = [n for n in args.names if n not in cat]
    if unknown:
        print("UNKNOWN", *unknown)
        return 2
    for name in args.names:
        df = cat[name].fn(spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out / f"{name}{args.suffix}.txt").write_text(txt)
        print("wrote", out / f"{name}{args.suffix}.txt")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
