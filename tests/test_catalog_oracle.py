"""Every catalog query with an oracle must hash-match DuckDB at sf0.001.

This mirrors the driver's t2 correctness gate (which runs at sf0.01);
tests default to sf0.001 for speed, and the full sf0.01 sweep runs when
ORACLE_SF_FULL=1 is set.
"""

from __future__ import annotations

import os

import pytest

from cost_of_living_data_etl_spark.plans import catalog
from tests.oracle_check import assert_matches_oracle

SPECS = sorted(catalog().values(), key=lambda s: s.name)
ORACLE_SPECS = [s for s in SPECS if s.oracle is not None]
ROWS_ONLY_SPECS = [s for s in SPECS if s.oracle is None]


def _sf_dir(sf_smoke, sf_oracle):
    return sf_oracle if os.environ.get("ORACLE_SF_FULL") else sf_smoke


#: single source of truth for the zero-rows allowlist lives next to
#: the registry (tools/census.py reads the same set)
from cost_of_living_data_etl_spark.plans.catalog import EMPTY_OK  # noqa: E402


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_oracle_match(spark, sf_smoke, sf_oracle, spec):
    sf = _sf_dir(sf_smoke, sf_oracle)
    df = spec.fn(spark, sf)
    assert_matches_oracle(df, spec.oracle, sf)
    if spec.name not in EMPTY_OK:
        assert df.limit(1).count() > 0, (
            f"{spec.name} returned ZERO rows at {sf} — the oracle gate "
            "cannot distinguish a degenerate empty-on-both-engines query "
            "from a correct one; if emptiness is a genuine fixture "
            "property, add the query to EMPTY_OK with a justification"
        )


def test_every_query_has_an_oracle():
    """The catalog carries ZERO rows-only entries: every query —
    streaming twins included — ships a DuckDB oracle and goes through
    the hash gate. (This used to be an empty-parameter-set skip, the
    suite's one non-protobuf skip; asserting the invariant positively
    keeps the suite at exactly one documented skip.)"""
    assert ROWS_ONLY_SPECS == [], [s.name for s in ROWS_ONLY_SPECS]


if ROWS_ONLY_SPECS:  # defined only when non-empty: empty parametrize = skip

    @pytest.mark.parametrize(
        "spec", ROWS_ONLY_SPECS, ids=[s.name for s in ROWS_ONLY_SPECS]
    )
    def test_rows_only_runs(spark, sf_smoke, sf_oracle, spec):
        sf = _sf_dir(sf_smoke, sf_oracle)
        df = spec.fn(spark, sf)
        assert df.count() >= 0
        assert len(df.schema.fields) > 0
