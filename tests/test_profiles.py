"""profiles.py: one switch (SPARK_GRAFT_PROFILE) carries every
skew/scale guard, and the parity profile is byte-identical to no
profile at all — production-profile plans may differ from parity
plans ONLY inside the guard subtrees (round-7 verdict item 6)."""

from __future__ import annotations

import re

import pytest

from cost_of_living_data_etl_spark.profiles import (
    PARITY,
    PRODUCTION,
    PROFILE_ENV,
    USE_PROFILE,
    active_profile,
    resolve,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    """Analyzed plan with per-session expression ids normalized (the
    bench fingerprint discipline) so plans compare across builds."""
    s = df._jdf.queryExecution().analyzed().toString()
    s = re.sub(r"#\d+L?", "#", s)
    s = re.sub(r"LogicalRDD \[[^\]]*\]", "LogicalRDD", s)
    s = re.sub(r"\b(lambda )?([A-Za-z]\w*?)_\d+#", r"\1\2_#", s)
    return s


# --- profile selection -------------------------------------------------------


def test_default_profile_is_parity(monkeypatch):
    monkeypatch.delenv(PROFILE_ENV, raising=False)
    assert active_profile() is PARITY


def test_unknown_profile_fails_loudly(monkeypatch):
    monkeypatch.setenv(PROFILE_ENV, "prodcution")
    with pytest.raises(ValueError, match="prodcution"):
        active_profile()


def test_resolve_sentinel_vs_explicit(monkeypatch):
    monkeypatch.setenv(PROFILE_ENV, "production")
    assert resolve(USE_PROFILE, "lsh_max_bucket") == PRODUCTION.lsh_max_bucket
    # explicit caller values -- including None = lossless -- always win
    assert resolve(None, "lsh_max_bucket") is None
    assert resolve(7, "lsh_max_bucket") == 7


def test_parity_guards_are_lossless():
    assert PARITY.lsh_max_bucket is None
    assert PARITY.setsim_max_prefix_df is None
    assert PARITY.approx_distinct is False


def test_production_guards_are_all_on():
    assert PRODUCTION.lsh_max_bucket is not None
    assert PRODUCTION.setsim_max_prefix_df is not None
    assert PRODUCTION.approx_distinct is True


# --- plan-shape contract -----------------------------------------------------

# (query, marker that must appear ONLY in the production plan)
GUARDED = [
    ("q_dedup_minhash_lsh", "bsz"),  # band-bucket size filter
    (
        "q_setsim_prefix_join",
        f"(df# <= cast({PRODUCTION.setsim_max_prefix_df} as bigint))",
    ),
    ("q_column_profile_orders", "approx_count_distinct"),
]
CONTROLS = ["q1_pricing_summary", "q_dedup_exact_groups", "q_cohort_ltv"]


def _build(spark, name, profile, monkeypatch):
    from cost_of_living_data_etl_spark.plans import catalog

    if profile is None:
        monkeypatch.delenv(PROFILE_ENV, raising=False)
    else:
        monkeypatch.setenv(PROFILE_ENV, profile)
    return catalog()[name].fn(spark, SF)


@pytest.mark.parametrize("name,marker", GUARDED, ids=[g[0] for g in GUARDED])
def test_production_plan_adds_exactly_the_guard(spark, name, marker, monkeypatch):
    parity = _plan(_build(spark, name, "parity", monkeypatch))
    noenv = _plan(_build(spark, name, None, monkeypatch))
    prod = _plan(_build(spark, name, "production", monkeypatch))
    assert parity == noenv  # parity IS the no-profile plan
    assert marker not in parity
    assert marker in prod
    # the difference is confined to the guard: strip every line
    # mentioning the guard marker from the production plan and the
    # remaining node KINDS must all exist in the parity plan too
    def node_kinds(plan, drop_marker=None):
        kinds = set()
        for line in plan.splitlines():
            if drop_marker and drop_marker in line:
                continue
            m = re.match(r"[:+\-\s']*([A-Za-z]+)", line)
            if m:
                kinds.add(m.group(1))
        return kinds

    extra = node_kinds(prod, drop_marker=marker) - node_kinds(parity)
    assert not extra, f"production plan adds non-guard nodes: {extra}"


@pytest.mark.parametrize("name", CONTROLS)
def test_unguarded_plans_identical_across_profiles(spark, name, monkeypatch):
    parity = _plan(_build(spark, name, "parity", monkeypatch))
    prod = _plan(_build(spark, name, "production", monkeypatch))
    assert parity == prod
