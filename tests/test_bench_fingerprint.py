"""--changed-only benching rests on fingerprint semantics: same query
=> same fingerprint (within and across builds of the plan), different
query => different fingerprint, and cache state must NOT leak in (the
physical-plan version re-ran ~30% of an unchanged catalog because
InMemoryRelation appeared wherever a shared intermediate happened to
be cached)."""

from __future__ import annotations

from bench import _fingerprint
from cost_of_living_data_etl_spark.plans import catalog
from conftest import TESTDATA

SF = f"{TESTDATA}/sf0.001"


def test_fingerprint_is_stable_across_rebuilds(spark):
    cat = catalog()
    for name in ["q1_pricing_summary", "q_dedup_exact_groups"]:
        a = _fingerprint(cat[name].fn(spark, SF))
        b = _fingerprint(cat[name].fn(spark, SF))
        assert a == b, name


def test_fingerprint_distinguishes_queries(spark):
    cat = catalog()
    fps = {
        name: _fingerprint(cat[name].fn(spark, SF))
        for name in ["q1_pricing_summary", "q4_order_priority", "q_distinct_counts"]
    }
    assert len(set(fps.values())) == len(fps), fps


def test_fingerprint_ignores_cache_state(spark):
    """Fingerprint before caching == after caching == after uncache:
    the analyzed plan is pre-cache-substitution by design."""
    cat = catalog()
    fn = cat["q_text_quality_by_source"].fn
    before = _fingerprint(fn(spark, SF))
    df = fn(spark, SF)
    df.persist()
    df.count()
    cached = _fingerprint(fn(spark, SF))
    df.unpersist()
    spark.catalog.clearCache()
    after = _fingerprint(fn(spark, SF))
    assert before == cached == after
