"""Hostile-skew proof for the MinHash-LSH band-join bucket cap.

`operators/dedup.py` names skewed band buckets as THE scale hazard of
LSH dedup: a bucket of size b emits b² candidate pairs in the
self-join, and boilerplate corpora routinely put ~10% of all docs in
ONE bucket. `max_bucket` claims to drop such buckets BEFORE the
self-join. This module proves that claim on a pathological fixture
(round-4 verdict item 3): one boilerplate family holding 10% of the
corpus, organic near-dup pairs that must still be found, and a plan
check that the guard sits UPSTREAM of the pair join.

Measured wall-clock with/without the cap on this fixture is recorded
in SCALE.md §"LSH band-bucket skew guard".
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from cost_of_living_data_etl_spark.operators.dedup import (
    minhash_signatures,
    neardup_pairs_from_sigs,
)

N_DOCS = 2000
N_BOILER = 200  # one band bucket holding 10% of the corpus
N_TWIN_PAIRS = 10  # organic near-dups the capped run MUST still find

_BOILER_TEXT = " ".join(f"standard legal footer clause {i}" for i in range(10))


def _hostile_docs(spark):
    """10% identical boilerplate + unique organic docs + twin pairs."""
    rows = []
    for i in range(N_BOILER):
        rows.append((i, _BOILER_TEXT))
    for i in range(N_BOILER, N_DOCS - 2 * N_TWIN_PAIRS):
        # every organic doc gets a disjoint vocabulary -> no collisions
        rows.append((i, " ".join(f"w{i}x{j}" for j in range(30))))
    base = N_DOCS - 2 * N_TWIN_PAIRS
    for p in range(N_TWIN_PAIRS):
        text = " ".join(f"twin{p}tok{j}" for j in range(30))
        rows.append((base + 2 * p, text))
        rows.append((base + 2 * p + 1, text))  # exact twin: Jaccard 1
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def sigs(spark):
    mh = minhash_signatures(_hostile_docs(spark)).localCheckpoint()
    yield mh


def _pairs(mh, max_bucket):
    df = neardup_pairs_from_sigs(mh, max_bucket=max_bucket)
    t0 = time.perf_counter()
    rows = df.collect()
    return {(r["doc_id_1"], r["doc_id_2"]) for r in rows}, (
        time.perf_counter() - t0
    )


def test_cap_drops_boilerplate_bucket_but_keeps_organic_pairs(sigs, capsys):
    twin_pairs = {
        (N_DOCS - 2 * N_TWIN_PAIRS + 2 * p, N_DOCS - 2 * N_TWIN_PAIRS + 2 * p + 1)
        for p in range(N_TWIN_PAIRS)
    }
    boiler_pair_count = N_BOILER * (N_BOILER - 1) // 2

    uncapped, t_uncapped = _pairs(sigs, max_bucket=None)
    capped, t_capped = _pairs(sigs, max_bucket=50)

    # uncapped: the b² blow-up is real — every boilerplate pair mined
    assert len(uncapped) == boiler_pair_count + N_TWIN_PAIRS, len(uncapped)
    assert twin_pairs <= uncapped

    # capped: the 200-doc bucket is gone, organic recall is intact
    assert capped == twin_pairs, (len(capped), len(capped - twin_pairs))

    # for SCALE.md (timings on local[32]; asserted only weakly since
    # CI wall-clock is noisy — the semantics above are the hard gate)
    print(
        f"\nLSH skew-guard timings: uncapped={t_uncapped:.2f}s "
        f"({len(uncapped)} pairs), capped={t_capped:.2f}s "
        f"({len(capped)} pairs)"
    )
    assert t_capped < t_uncapped * 2  # never materially slower


def test_cap_filters_before_the_self_join(sigs):
    """The guard must prune buckets UPSTREAM of the b² self-join. Since
    round 9 it is a window count partitioned on EXACTLY the self-join's
    equi keys (band_idx, band_hash) plus a filter — one derivation of
    the banded frame instead of two independent branches (the previous
    rollup + left-semi form re-ran the shingle→minhash subtree;
    SCALE.md round-9 production-decade table). Pin the shape: a Window
    over (band_idx, band_hash) and a bucket-size Filter, both present
    only in the capped plan."""
    plan = neardup_pairs_from_sigs(sigs, max_bucket=50)._jdf.queryExecution(
    ).optimizedPlan().toString()
    win_at = plan.find("Window")
    assert win_at != -1, plan
    assert "windowspecdefinition(band_idx" in plan, plan
    assert "__bsz" in plan, plan


def test_uncapped_parity_is_unchanged(sigs):
    """max_bucket=None must keep exact-oracle parity semantics: the
    default path has NO guard window (zero extra operator)."""
    plan = neardup_pairs_from_sigs(sigs, max_bucket=None)._jdf.queryExecution(
    ).optimizedPlan().toString()
    assert "Window" not in plan and "__bsz" not in plan
