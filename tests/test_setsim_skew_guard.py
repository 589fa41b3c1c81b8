"""Hostile-skew proof for the PPJoin prefix-join df cap and for the
pair CONSUMERS (round-6 verdict item 6, small-scale pytest twin of
tools/hostile_consumers.py — the 50k-doc wall-clock rows live in
SCALE.md).

`plans/structural.py::setsim_pairs(max_prefix_df=...)` is the exact
miner's skew guard: a boilerplate family whose every token is df-heavy
generates NO candidates (tokens above the cap are dropped from
prefixes), while organic pairs — whose shared tokens are rare — are
untouched. The consumer checks pin that the CAPPED pair set keeps the
downstream graph queries' OUTPUT clean: uncapped, PageRank's result is
dominated by boilerplate hub rows.
"""

from __future__ import annotations

import functools

import pytest

from cost_of_living_data_etl_spark.operators import dedup
from cost_of_living_data_etl_spark.plans.structural import setsim_pairs

N_DOCS = 600
N_BOILER = 60  # one family holding 10% of the corpus
N_TWIN_PAIRS = 5

_BOILER_TEXT = " ".join(f"standard legal footer clause {i}" for i in range(10))


@pytest.fixture(scope="module")
def hostile_docs(spark):
    rows = [(i, _BOILER_TEXT) for i in range(N_BOILER)]
    for i in range(N_BOILER, N_DOCS - 2 * N_TWIN_PAIRS):
        rows.append((i, " ".join(f"w{i}x{j}" for j in range(30))))
    base = N_DOCS - 2 * N_TWIN_PAIRS
    for p in range(N_TWIN_PAIRS):
        text = " ".join(f"twin{p}tok{j}" for j in range(30))
        rows.append((base + 2 * p, text))
        rows.append((base + 2 * p + 1, text))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def _twin_pairs():
    base = N_DOCS - 2 * N_TWIN_PAIRS
    return {(base + 2 * p, base + 2 * p + 1) for p in range(N_TWIN_PAIRS)}


def test_prefix_df_cap_drops_boilerplate_keeps_organic(hostile_docs):
    uncapped = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in setsim_pairs(hostile_docs).collect()
    }
    capped = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in setsim_pairs(hostile_docs, max_prefix_df=50).collect()
    }
    boiler_pair_count = N_BOILER * (N_BOILER - 1) // 2
    # uncapped: the b² blow-up is real (plus organic recall)
    assert len(uncapped) == boiler_pair_count + N_TWIN_PAIRS
    assert _twin_pairs() <= uncapped
    # capped: the family generates nothing; organic recall exact
    assert capped == _twin_pairs()


def test_prefix_df_cap_default_is_lossless(hostile_docs, spark):
    """max_prefix_df=None must keep the lossless prefix-filter
    contract: identical pair set to the (tiny) exact all-pairs
    verification on this corpus minus the guard-free run above —
    i.e. the default and an explicit huge cap agree."""
    default = sorted(
        map(tuple, setsim_pairs(hostile_docs).select("doc_id_1", "doc_id_2").collect())
    )
    huge_cap = sorted(
        map(
            tuple,
            setsim_pairs(hostile_docs, max_prefix_df=10**9)
            .select("doc_id_1", "doc_id_2")
            .collect(),
        )
    )
    assert default == huge_cap


def _hostile_sf(spark, tmp_path_factory, docs):
    import pyspark.sql.functions as F

    d = str(tmp_path_factory.mktemp("hostile_sf"))
    (
        docs.select(
            "doc_id",
            "text",
            F.lit("hostile").alias("source"),
            F.lit("en").alias("lang"),
            F.length("text").cast("long").alias("n_chars"),
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    )
    return d


def test_capped_pair_set_keeps_pagerank_output_organic(
    spark, hostile_docs, tmp_path_factory, monkeypatch
):
    """Consumer-level check: with the miner capped, PageRank over the
    near-dup graph ranks ONLY the organic twins; uncapped, the
    boilerplate family floods the node set (the 50k-grain wall-clock
    version of this is SCALE.md's hostile-consumer table)."""
    sf = _hostile_sf(spark, tmp_path_factory, hostile_docs)

    orig = dedup.minhash_pair_plan
    monkeypatch.setattr(
        dedup, "minhash_pair_plan", functools.partial(orig, max_bucket=50)
    )
    capped_nodes = dedup.q_pagerank_neardup_graph(spark, sf).count()
    monkeypatch.setattr(dedup, "minhash_pair_plan", orig)
    uncapped_nodes = dedup.q_pagerank_neardup_graph(spark, sf).count()

    assert capped_nodes == 2 * N_TWIN_PAIRS  # organic twins only
    assert uncapped_nodes >= N_BOILER  # family floods the graph
