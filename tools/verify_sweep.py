#!/usr/bin/env python
"""Fresh-process full-catalog strict oracle sweep — the in-session
twin of the driver's t2 correctness gate, at FULL catalog width.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables (default sf0.01), comparing
row count, column names, dtype kinds, and values at strict 1e-9
relative tolerance (tests/oracle_check.py — calibrated so local green
predicts driver green). Exit code 0 iff every query matches.

    python tools/verify_sweep.py [sf_dir] [--names a,b,c]

~12 min at sf0.01 on local[32] (full catalog). Used for the
end-of-round "full-catalog strict green" evidence line in COVERAGE.md;
--names restricts the sweep to a comma-separated subset for targeted
fresh-process checks. For quick iteration there is also:
ORACLE_SF_FULL=1 python -m pytest tests/test_catalog_oracle.py -k <name>.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from cost_of_living_data_etl_spark.plans import catalog  # noqa: E402
from cost_of_living_data_etl_spark.session import get_spark  # noqa: E402
from tests.oracle_check import assert_matches_oracle  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--names", default=None,
                    help="comma-separated catalog subset")
    args = ap.parse_args()
    sf_dir = args.sf_dir
    spark = get_spark(app_name="verify-sweep")
    spark.sparkContext.setLogLevel("FATAL")
    cat = catalog()
    if args.names:
        wanted = [n.strip() for n in args.names.split(",") if n.strip()]
        unknown = [n for n in wanted if n not in cat]
        if unknown:
            print("UNKNOWN", *unknown)
            return 2
        cat = {n: cat[n] for n in wanted}
    bad: list[tuple[str, str]] = []
    t0 = time.time()
    for i, (name, spec) in enumerate(cat.items()):
        try:
            assert_matches_oracle(spec.fn(spark, sf_dir), spec.oracle, sf_dir)
        except Exception as e:  # noqa: BLE001 — report and continue
            bad.append((name, str(e).splitlines()[0][:140]))
            print("RED", name, bad[-1][1], flush=True)
        if (i + 1) % 50 == 0:
            print(
                f"... {i + 1}/{len(cat)} checked, {len(bad)} red, "
                f"{round(time.time() - t0)}s",
                flush=True,
            )
    print(
        f"DONE {len(cat) - len(bad)}/{len(cat)} strict green at {sf_dir} "
        f"in {round(time.time() - t0)}s"
    )
    for b in bad:
        print("RED", *b)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
