"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``cost_of_living_data_etl_spark``; this module
just adapts the query catalog to the driver's shape.
"""

from __future__ import annotations

import json
import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from cost_of_living_data_etl_spark.plans import catalog  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "q1_pricing_summary"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog()[FLAGSHIP].fn(spark, SMOKE_SF_DIR)


def _hash_verified_names() -> set[str]:
    """Query names with a green hash_match in any prior CORRECTNESS_r*.json.

    The driver verifies a bounded sample of ``queries()`` per round, in
    dict order — so enumerate not-yet-hash-verified queries FIRST and the
    sample converges to full catalog coverage across rounds with no
    manual curation. Rows-only (no-oracle) and failed rows do NOT count
    as verified: they re-sort to the front until they earn a green row.
    """
    seen: set[str] = set()
    for p in sorted(Path(_REPO).glob("CORRECTNESS_r*.json")):
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if isinstance(row, dict) and row.get("hash_match") is True:
                seen.add(name)
    return seen


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    not-yet-driver-verified queries first (see _hash_verified_names)."""
    cat = catalog()
    verified = _hash_verified_names()
    ordered = sorted(cat, key=lambda name: name in verified)
    return {name: cat[name].fn for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted → rows-only check."""
    return {
        name: spec.oracle
        for name, spec in catalog().items()
        if spec.oracle is not None
    }
