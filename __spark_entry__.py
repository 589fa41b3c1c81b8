"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``cost_of_living_data_etl_spark``; this module
just adapts the query catalog to the driver's shape.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from cost_of_living_data_etl_spark.plans import catalog  # noqa: E402
from cost_of_living_data_etl_spark.verification import (  # noqa: E402
    verified_names,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "q1_pricing_summary"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog()[FLAGSHIP].fn(spark, SMOKE_SF_DIR)


def _hash_verified_names() -> set[str]:
    """Query names whose CURRENT plan has a green driver hash.

    The driver verifies a bounded sample of ``queries()`` per round, in
    dict order — so enumerate not-yet-hash-verified queries FIRST and the
    sample converges to full catalog coverage across rounds with no
    manual curation. Rows-only (no-oracle) and failed rows do NOT count
    as verified: they re-sort to the front until they earn a green row.

    Round 8 (verdict item 1): "verified" is plan-fingerprint-aware — a
    green row only counts while the query's analyzed-plan fingerprint
    still matches the one recorded when the green was earned
    (history/verified_fingerprints.json vs plan_fingerprints.json), so
    a rewritten query loses its verified status and the next driver
    sample re-hash-checks the NEW plan. Logic + maintenance in
    cost_of_living_data_etl_spark/verification.py.
    """
    return verified_names(Path(_REPO))


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
