"""Physical-plan-shape regression tests.

Correctness tests prove the WHAT; these prove the HOW — that each
query compiles to the plan we designed for 100 TB, not just any plan
that happens to pass at test scale. Each assertion pins a property
that, if regressed, silently multiplies cost at scale:

- filters reach the parquet scan (PushedFilters) and unused columns
  are pruned from ReadSchema,
- dimension joins broadcast (no sort-merge shuffle of the fact table),
- per-group top-k uses WindowGroupLimit (partial group limits before
  the shuffle) and global top-k uses TakeOrderedAndProject (per-
  partition heaps, no global sort),
- the as-of join compiles to window-over-union: ONE exchange, zero
  join operators,
- no row-at-a-time Python UDF (BatchEvalPython) anywhere in the
  headline set — Python only via Arrow (ArrowEvalPython / pandas).

Plans are inspected without executing anything, so this whole module
runs in seconds.
"""

from __future__ import annotations

import re

import pytest

from cost_of_living_data_etl_spark.plans import catalog


def plan_of(spark, name: str, sf_dir: str, mode: str = "formatted") -> str:
    df = catalog()[name].fn(spark, sf_dir)
    jmode = df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_q3_pushdown_broadcast_topk(spark, sf_smoke):
    plan = plan_of(spark, "q3_shipping_priority", sf_smoke)
    # date predicates pushed into both fact scans
    assert "GreaterThan(l_shipdate" in plan
    assert "LessThan(o_orderdate" in plan
    # both joins broadcast; the lineitem side is never shuffled
    tree = plan_of(spark, "q3_shipping_priority", sf_smoke, mode="simple")
    assert tree.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in tree
    # global top-10 via per-partition heaps
    assert "TakeOrderedAndProject" in tree


def test_q5_all_dim_joins_broadcast(spark, sf_smoke):
    plan = plan_of(spark, "q5_region_nation_revenue", sf_smoke)
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_q1_column_pruning(spark, sf_smoke):
    plan = plan_of(spark, "q1_pricing_summary", sf_smoke)
    # the scan must not read join keys the query never touches
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = m.group(1)
    assert "l_partkey" not in read_cols
    assert "l_suppkey" not in read_cols
    assert "l_orderkey" not in read_cols


def test_topk_per_group_uses_window_group_limit(spark, sf_smoke):
    plan = plan_of(spark, "q_topk_orders_per_priority", sf_smoke)
    # rank-filter pattern must compile to partial+final WindowGroupLimit,
    # which caps each group BEFORE the shuffle
    assert "WindowGroupLimit" in plan
    assert "rn" in plan


def test_asof_join_is_single_shuffle_no_join(spark, sf_smoke):
    plan = plan_of(spark, "q_asof_join_last_purchase", sf_smoke)
    assert "Join" not in plan  # no join operator of any kind
    assert "Window" in plan
    # exactly one data exchange: the hash partition on user_id
    assert plan.count("+- Exchange") == 1
    assert "hashpartitioning(user_id" in plan


def test_exact_dedup_single_shuffle(spark, sf_smoke):
    plan = plan_of(spark, "q_dedup_exact_groups", sf_smoke, mode="simple")
    # partial (map-side) agg + one exchange + final agg
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") == 2


def test_etl_shaped_zero_shuffles(spark, sf_smoke):
    plan = plan_of(spark, "q_etl_shaped_conform", sf_smoke)
    # reference pipeline shape: scan→transform→broadcast join→project;
    # the only exchange is the broadcast of the dim
    assert "BroadcastHashJoin" in plan
    assert "+- Exchange" not in plan.replace("BroadcastExchange", "BX")


def test_q4_exists_compiles_to_semi_join(spark, sf_smoke):
    plan = plan_of(spark, "q4_order_priority", sf_smoke)
    assert "LeftSemi" in plan
    # the date range reaches the orders scan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_q7_nation_joins_broadcast(spark, sf_smoke):
    tree = plan_of(spark, "q7_nation_pair_volume", sf_smoke, mode="simple")
    # both nation sides must broadcast at ANY scale (25 rows, bounded)
    assert tree.count("BroadcastHashJoin") >= 2
    # shipdate range pushed to the lineitem scan
    plan = plan_of(spark, "q7_nation_pair_volume", sf_smoke)
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_q10_topk_no_global_sort(spark, sf_smoke):
    plan = plan_of(spark, "q10_returned_item_topk", sf_smoke, mode="simple")
    assert "TakeOrderedAndProject" in plan
    # returnflag filter reaches the scan
    full = plan_of(spark, "q10_returned_item_topk", sf_smoke)
    assert "EqualTo(l_returnflag,R)" in full


def test_q22_anti_join_and_scalar_broadcast(spark, sf_smoke):
    plan = plan_of(spark, "q22_dormant_high_balance", sf_smoke)
    assert "LeftAnti" in plan
    # the scalar avg arrives via broadcast, not a driver collect
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_ann_batch_topk_uses_window_group_limit(spark, sf_smoke):
    plan = plan_of(spark, "q_ann_batch_topk", sf_smoke)
    assert "WindowGroupLimit" in plan


def test_simhash_signature_is_shuffle_free(spark, sf_smoke):
    """The signature stage must not shuffle the tokenized corpus: the
    only exchanges are the whole-row scan re-key (round 9
    parallelization — BEFORE any hashing) and the band self-join
    distinct, downstream of the 16-byte/doc signature table."""
    plan = plan_of(spark, "q_dedup_simhash", sf_smoke, mode="simple")
    # every shuffle is either the whole-row doc_id scan re-key
    # (REPARTITION_BY_NUM, before any hashing) or the candidate
    # distinct on (doc_id_1, doc_id_2, hamming) — never the tokenized
    # corpus. (The cached signature relation prints once per consumer,
    # so exchange COUNTS are reference-multiplied; assert by kind.)
    ex_lines = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    for line in ex_lines:
        assert "REPARTITION_BY_NUM" in line or "doc_id_1" in line, line
    # signature pipeline (InMemoryRelation → ... → FileScan) is a pure
    # Project over the (re-keyed) scan: no aggregate, md5 once, and
    # at most one exchange inside it — the pre-hash doc_id re-key,
    # present exactly when _scan_parallelized's own condition holds
    # (env on, multi-core session, fixture above the size floor) so the
    # test tracks the code's decision instead of hard-coding it
    # (ADVICE r09).
    from cost_of_living_data_etl_spark.sources import tables

    probe = tables.load_table(spark, sf_smoke, "documents")
    rekeyed = tables._scan_parallelized(
        spark, probe, f"{sf_smoke}/documents.parquet", "documents"
    ) is not probe
    sig = plan.split("InMemoryRelation", 1)[1].split("FileScan", 1)[0]
    assert "HashAggregate" not in sig
    assert sig.count("Exchange hashpartitioning") == (1 if rekeyed else 0)
    if rekeyed:
        assert "hashpartitioning(doc_id" in sig
    assert sig.count("md5") == 1


HEADLINE_NO_PYTHON_ROW_UDF = [
    "q1_pricing_summary",
    "q5_region_nation_revenue",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_text_quality_by_source",
    "q_text_langid_confusion",
    "q_ann_bruteforce_topk",
    "q_etl_shaped_conform",
    "q_bigram_pmi_topk",
    "q_embed_kmeans_cells",
]


def test_bigram_pmi_plan_shape(spark, sf_smoke):
    """Phrase mining at scale: the final k-cut is TakeOrderedAndProject
    (no global sort) and document text never crosses a shuffle — the
    count tables explode AFTER the word-array projection."""
    plan = plan_of(spark, "q_bigram_pmi_topk", sf_smoke)
    assert "TakeOrderedAndProject" in plan
    exchange_lines = [l for l in plan.splitlines() if "Exchange" in l]
    assert exchange_lines
    assert not any("text" in l for l in exchange_lines)


@pytest.mark.parametrize("name", HEADLINE_NO_PYTHON_ROW_UDF)
def test_no_row_at_a_time_python(spark, sf_smoke, name):
    plan = plan_of(spark, name, sf_smoke)
    assert "BatchEvalPython" not in plan, f"{name} fell off the JVM fast path"


def test_pandas_udf_uses_arrow(spark, sf_smoke):
    plan = plan_of(spark, "q_pandas_udf_quality", sf_smoke)
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_smoke):
    """With broadcast off (the 100 TB shuffle-join regime), Catalyst
    injects a bloom filter built from the selective dimension side into
    the fact scan (`might_contain` on the probe rows) — rows that can't
    join are dropped BEFORE the shuffle, which is the runtime analogue
    of the manual pre-join filtering the reference hand-codes."""
    import pyspark.sql.functions as F

    old = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        ),
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_smoke}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        jmode = j._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = j._jdf.queryExecution().explainString(jmode)
        assert "might_contain" in plan  # probe-side runtime filter applied
        assert "bloom_filter_agg" in plan  # built from the filtered dim
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_decontamination_broadcasts_eval_hashes(spark, sf_smoke):
    """The eval n-gram set (MBs even at 100 TB corpora) must broadcast
    — a shuffled join here would move the whole training corpus's
    exploded gram stream through an exchange keyed on gram hash."""
    plan = plan_of(spark, "q_decontaminate_ngram", sf_smoke)
    assert "BroadcastHashJoin" in plan


def test_winsorize_broadcasts_bounds(spark, sf_smoke):
    """Per-segment P1/P99 bounds are a handful of rows; they broadcast
    back onto the fact instead of re-shuffling it."""
    plan = plan_of(spark, "q_winsorized_stats", sf_smoke)
    assert "BroadcastHashJoin" in plan


def test_wordcount_topk_avoids_global_sort(spark, sf_smoke):
    """Global top-20 words compiles to TakeOrderedAndProject (per-
    partition heaps + driver merge), never a full sort of the vocab."""
    plan = plan_of(spark, "q_word_frequency_topk", sf_smoke, mode="simple")
    assert "TakeOrderedAndProject" in plan
    # no Sort NODE anywhere: in simple mode a sort renders as
    # "Sort [...]" — the heap-based top-k needs none
    assert "Sort [" not in plan


def test_tfidf_topk_uses_window_group_limit(spark, sf_smoke):
    """Per-source top-3 terms prunes to ≤3 rows per source per
    partition BEFORE the window shuffle (WindowGroupLimit)."""
    plan = plan_of(spark, "q_tfidf_top_terms", sf_smoke)
    assert "WindowGroupLimit" in plan


def test_q12_pushes_shipdate_window_to_scan(spark, sf_smoke):
    """The 1996 shipdate window must reach the lineitem parquet scan
    (PushedFilters) — it removes ~6/7 of the fact before the join."""
    plan = plan_of(spark, "q12_returnflag_priority", sf_smoke)
    m = re.search(r"PushedFilters: \[[^\]]*l_shipdate[^\]]*\]", plan)
    assert m, "no shipdate pushdown at scan"


def test_stratified_sample_filter_is_scan_stage(spark, sf_smoke):
    """The per-stratum hash predicate evaluates in the scan stage — no
    join against a rate table, no extra exchange before the rollup."""
    plan = plan_of(spark, "q_stratified_sample_by_lang", sf_smoke)
    assert "Join" not in plan  # rate CASE is folded into the filter
    assert plan.count("Exchange") <= 2  # final 5-key rollup (+AQE read)


def test_chunk_manifest_is_map_only(spark, sf_smoke):
    """Chunking emits the manifest in ONE map-only pass: no Exchange of
    any kind (the whole point — chunk hashes flow downstream, text
    never does)."""
    plan = plan_of(spark, "q_chunk_documents_overlap", sf_smoke, mode="simple")
    assert "Exchange" not in plan
    # text column read once at the scan, then only array exprs
    assert "Generate explode" in plan or "Generate" in plan


def test_hard_negative_mining_broadcasts_anchors(spark, sf_smoke):
    """Anchors are broadcast (corpus side never shuffled for the join)
    and the per-anchor argmax is a partial aggregate — the only hash
    Exchange carries |anchors|-keyed partials, not the corpus."""
    plan = plan_of(spark, "q_hard_negative_mining", sf_smoke, mode="simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1
    # partial aggregation before the exchange (map-side max per anchor)
    assert "partial_max" in plan_of(
        spark, "q_hard_negative_mining", sf_smoke, mode="formatted"
    ).lower() or "HashAggregate" in plan


def test_incremental_merge_reuses_partial_state_shape(spark, sf_smoke):
    """Base and delta partials union on the tiny (|groups| x 2)-column
    state; no join anywhere in the plan."""
    plan = plan_of(spark, "q_incremental_agg_merge", sf_smoke, mode="simple")
    assert "Join" not in plan
    assert "Union" in plan


def test_ewma_folds_over_daily_rollup_only(spark, sf_smoke):
    """The recurrence folds the pre-aggregated daily series: exactly
    two hash Exchanges (facts -> (status, day) rollup, rollup ->
    status fold); the collect_list input is |days| rows, never raw
    orders."""
    plan = plan_of(spark, "q_ewma_revenue_by_status", sf_smoke, mode="simple")
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "SortMergeJoin" not in plan and "Join" not in plan


def test_pq_encode_is_join_free_map_pass(spark, sf_smoke):
    """PQ encode ranks against LITERAL codebook arrays: the scoring
    plan must contain no join of any kind and no shuffle beyond the
    final top-k — vectors are never exchanged."""
    plan = plan_of(spark, "q_pq_adc_topk", sf_smoke, mode="simple")
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan


def test_snapshot_diff_single_keyed_join(spark, sf_smoke):
    """The keyed diff is one join (full outer on the key) plus the
    tiny per-class rollup — no nested loop, no extra joins."""
    plan = plan_of(spark, "q_snapshot_diff_orders", sf_smoke, mode="simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Join") == 1 or plan.count("SortMergeJoin") + plan.count(
        "ShuffledHashJoin"
    ) + plan.count("BroadcastHashJoin") == 1


def test_target_encoding_pushes_month_filter_to_scan(spark, sf_smoke):
    """The one-month window reaches the orders parquet scan
    (PushedFilters) and the category stats come back via broadcast —
    the fact rows are never hash-shuffled for the encode join."""
    plan = plan_of(spark, "q_target_encoding_loo", sf_smoke)
    assert re.search(r"PushedFilters: \[[^\]]*o_orderdate[^\]]*\]", plan)
    simple = plan_of(spark, "q_target_encoding_loo", sf_smoke, mode="simple")
    assert "SortMergeJoin" not in simple
    assert "BroadcastHashJoin" in simple


def test_ohlc_is_single_aggregate_shuffle(spark, sf_smoke):
    """Weekly OHLC is ONE partial-aggregated hash shuffle on the week
    key (arg-extremum structs combine map-side) — no window rank, no
    join, no sort."""
    plan = plan_of(spark, "q_ohlc_weekly_orders", sf_smoke, mode="simple")
    assert "Window" not in plan
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_bm25_filters_query_terms_before_shuffle(spark, sf_smoke):
    """The query-term IN-filter applies in the scan/explode stage —
    before the (doc, term) aggregate's Exchange — so only documents
    containing a query term are ever shuffled, and the final top-k is
    a TakeOrderedAndProject, not a global sort."""
    plan = plan_of(spark, "q_bm25_doc_ranking", sf_smoke, mode="simple")
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    # The word-IN Filter operator's CHILD must be the explode itself —
    # i.e. the filter applies map-side, directly on the generated rows,
    # upstream of the (doc_id, dl, word) aggregate's Exchange. Tree
    # adjacency (next printed line) proves the parent-child edge.
    # Matching the operator text guards against the 'PushedFilters:'
    # scan-line noise that a bare "Filter" substring check matches.
    lines = plan.splitlines()
    in_filters = [
        i
        for i, ln in enumerate(lines)
        if re.search(r"Filter \(word#\d+ IN \(spark,join,window\)", ln)
    ]
    assert in_filters, "query-term IN filter operator not found in plan"
    for i in in_filters:
        assert "Generate explode" in lines[i + 1], (
            f"term filter not applied directly onto the explode: {lines[i + 1]}"
        )


def test_rrf_candidate_lists_avoid_global_sort(spark, sf_smoke):
    """Both rankers reduce to 50-row candidate lists via
    TakeOrderedAndProject before any rank window; the fusion join is
    over two bounded lists (no shuffle of the corpus for ranking)."""
    plan = plan_of(spark, "q_hybrid_rrf_retrieval", sf_smoke, mode="simple")
    assert plan.count("TakeOrderedAndProject") >= 2


def test_semantic_decontam_broadcasts_eval_side(spark, sf_smoke):
    """The eval slice broadcasts (train corpus never shuffled for the
    probe), the per-train argmax partial-aggregates map-side, and the
    SEM_TAU filter rides the aggregate. Allowed hash Exchanges: the
    whole-row vec_id scan re-key (round-9 parallelization, BEFORE the
    cosine pass) and the per-train best-match struct shuffle — never
    the scored candidate stream."""
    plan = plan_of(spark, "q_semantic_decontam", sf_smoke, mode="simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    ex_lines = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert len(ex_lines) <= 2
    assert sum("REPARTITION_BY_NUM" in l for l in ex_lines) <= 1
    # the argmax exchange keys on the (train_id, label) group, carrying
    # best-match structs — the scored pair stream itself never shuffles
    assert all(
        "REPARTITION_BY_NUM" in l or "train_id" in l for l in ex_lines
    ), ex_lines


def test_market_basket_has_no_basket_self_join(spark, sf_smoke):
    """Pairs are generated in-row from basket arrays: the only joins in
    the plan are the broadcast count/total attachments — no sort-merge
    (basket-table self-join) anywhere, and exactly one top-k sort."""
    plan = plan_of(spark, "q_market_basket_lift", sf_smoke, mode="simple")
    assert "SortMergeJoin" not in plan
    assert "Generate explode" in plan or "Generate" in plan  # in-row pairs
    assert "TakeOrderedAndProject" in plan  # top-k, not global sort


def test_cusum_is_windowed_not_folded(spark, sf_smoke):
    """The reflected-walk form runs as running windows over the daily
    rollup — no collect_list fold for the path (only mu's det_sum
    aggregates an array), so the series stage stays distributed."""
    plan = plan_of(spark, "q_cusum_changepoint_revenue", sf_smoke, mode="simple")
    assert "Window" in plan
    # broadcast of the 1-row mu, never a shuffle join
    assert "SortMergeJoin" not in plan


def test_matryoshka_single_scored_pass(spark, sf_smoke):
    """Both rankings must come from ONE broadcast-join scored pass:
    exactly one scan of the embeddings table feeds the query side and
    one the corpus side — no third scan for the truncated ranking."""
    import re

    plan = plan_of(spark, "q_matryoshka_recall", sf_smoke, mode="formatted")
    # formatted mode prints each node in the tree AND a detail section;
    # count the numbered detail entries for true scan count
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) <= 2
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_concurrency_sweep_input_is_sessions_not_events(spark, sf_smoke):
    """The ±1 boundary union must be built from the session-interval
    aggregate (2 rows per session), not raw events — the aggregate
    sits between the events scan and the union. The catalog query
    checkpoints the block rollup (hiding this lineage behind a
    LogicalRDD), so the assertion reads the factored pre-checkpoint
    builder the query materializes."""
    from cost_of_living_data_etl_spark.plans.analytics_extra import (
        _concurrency_bounds,
        concurrency_blocks,
    )

    # ADVICE r07: audit the builder the CATALOG QUERY itself calls —
    # a locally re-built union here would keep passing if the query's
    # own wiring regressed to raw events
    bounds = _concurrency_bounds(spark, sf_smoke)
    plan = concurrency_blocks(bounds)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "Union" in plan
    # session intervals: min/max aggregate over (user_id, session_seq)
    # upstream of the union — boundary rows come from the
    # 2-rows-per-session aggregate, never raw events
    assert "partial_min" in plan or "HashAggregate" in plan
    # and the query consumes exactly this builder (source-level pin:
    # the checkpoint hides the lineage from the physical plan)
    import inspect

    from cost_of_living_data_etl_spark.plans.analytics_extra import (
        q_concurrent_sessions_peak,
    )

    assert "_concurrency_bounds(spark, sf_dir)" in inspect.getsource(
        q_concurrent_sessions_peak
    )


def test_theilsen_pair_stage_is_rollup_bounded(spark, sf_smoke):
    """The O(n²) pair join must consume the DAILY ROLLUP (aggregate
    before the join), never raw orders — one orders scan per side,
    each feeding a date-grouped aggregate first."""
    plan = plan_of(spark, "q_theilsen_revenue_trend", sf_smoke, mode="simple")
    # the self-join sides are aggregates, so a hash/NLJ join over
    # aggregated inputs; raw-order self-join would show two bare scans
    # joined without intermediate HashAggregate
    assert plan.count("HashAggregate") >= 2
    assert "TakeOrderedAndProject" not in plan  # order statistic, not top-k


def test_zipf_fit_is_bounded_to_top_vocab(spark, sf_smoke):
    """The regression stage must sit behind a GlobalLimit of ZIPF_TOP —
    the O(N) fit never sees the unbounded vocabulary."""
    plan = plan_of(spark, "q_zipf_exponent", sf_smoke, mode="simple")
    assert "TakeOrderedAndProject" in plan or "GlobalLimit" in plan


def test_bounce_rate_reuses_sessionization_shape(spark, sf_smoke):
    """Sessionization shuffles on user_id once (window), then the
    per-session aggregate and daily rollup — no extra exchanges."""
    plan = plan_of(spark, "q_session_bounce_rate", sf_smoke, mode="simple")
    assert "Window" in plan
    assert plan.count("Exchange hashpartitioning") <= 3


def test_class_separation_has_no_pairwise_pass(spark, sf_smoke):
    """Centroid-based separation must stay map-only against broadcast
    centroids: no sort-merge join, no O(n²) nested-loop over vectors
    (the only NLJ allowed is the 1-row global-centroid broadcast)."""
    plan = plan_of(spark, "q_embed_class_separation", sf_smoke, mode="simple")
    assert "SortMergeJoin" not in plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_cohort_ltv_windows_over_cells_not_orders(spark, sf_smoke):
    """The cumulative-LTV window must consume the (cohort x age) cell
    aggregate, not raw orders: a HashAggregate sits below the Window."""
    plan = plan_of(spark, "q_cohort_ltv", sf_smoke, mode="simple")
    i_window = plan.find("Window")
    assert i_window != -1
    assert "HashAggregate" in plan[i_window:]


# --- mllite family (distributed ML primitives) -----------------------------


def test_ridge_gram_reduces_to_single_row_aggregate(spark, sf_smoke):
    """The Gram pass must reduce the whole feats relation to ONE row of
    9 scalars (Exchange SinglePartition feeding the final aggregate)
    and prune both scans to exactly the used columns — the properties
    that make closed-form regression an O(d²)-state pass at 100 TB."""
    plan = plan_of(spark, "q_ridge_gram_regression", sf_smoke)
    assert "SinglePartition" in plan
    assert "BatchEvalPython" not in plan
    m = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    schemas = {s for s in m}
    assert any(s == "l_orderkey:bigint,l_quantity:double" for s in schemas), schemas
    assert any(s == "o_orderkey:bigint,o_totalprice:double" for s in schemas), schemas


def test_naive_bayes_scoring_is_single_corpus_pass(spark, sf_smoke):
    """After the bounded-collect model build, the returned scoring plan
    must touch the documents parquet exactly twice (test docs for the
    score base + test tokens for the word counts) — never the train
    subtree — and join the likelihood model by broadcast only."""
    plan = plan_of(spark, "q_naive_bayes_langid", sf_smoke, mode="simple")
    assert plan.count("documents.parquet") == 2, plan.count("documents.parquet")
    assert "BroadcastHashJoin" in plan
    # the model side arrives as literal rows, not a recomputed aggregate
    assert "LocalTableScan" in plan or "Scan ExistingRDD" in plan


def test_chi2_scoring_grid_is_broadcast_sized(spark, sf_smoke):
    """The χ² grid must be built from broadcast candidate/count tables;
    the corpus-side work is the distinct doc-term aggregate feeding
    n11 — no sort-merge join anywhere."""
    plan = plan_of(spark, "q_chi2_term_selection", sf_smoke, mode="simple")
    assert "SortMergeJoin" not in plan
    assert "BroadcastExchange" in plan


def test_bucketed_join_reads_buckets_without_exchange(spark, sf_smoke):
    """Both bucketed scans must feed the sort-merge join directly:
    Bucketed: true on both FileScans, no Exchange below the join (the
    only shuffle is the final segment aggregate), no broadcast fallback
    (the merge hint pins the 100 TB plan at toy scale)."""
    plan = plan_of(spark, "q_bucketed_colocated_join", sf_smoke, mode="simple")
    assert plan.count("Bucketed: true") == 2
    assert "SelectedBucketsCount: 16 out of 16" in plan
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_countmin_probes_avoid_global_sort_and_join_broadcast(spark, sf_smoke):
    """Probe selection must be TakeOrderedAndProject (per-partition
    heaps); the probe→cells lookup must broadcast the 40-row probe side,
    never shuffle the sketch."""
    plan = plan_of(spark, "q_countmin_word_frequency", sf_smoke, mode="simple")
    assert "TakeOrderedAndProject(limit=10" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ridge_cv_is_two_pass_gram_subtraction(spark, sf_smoke):
    """k models from TWO corpus passes total: pass 1 (the fold-Gram
    aggregate) runs at build time and collapses to k×10 literal rows,
    so the RETURNED plan is pass 2 alone — exactly one lineitem scan,
    with the 5-row betas arriving as literals joined by broadcast.
    A per-fold refit would show k extra aggregate subtrees here."""
    plan = plan_of(spark, "q_ridge_kfold_cv", sf_smoke, mode="simple")
    assert plan.count("lineitem.parquet") == 1, plan.count("lineitem.parquet")
    assert "BroadcastHashJoin" in plan
    assert "LocalTableScan" in plan or "Scan ExistingRDD" in plan
    assert "BatchEvalPython" not in plan


def test_hll_overlap_reads_sketches_not_events(spark, sf_smoke):
    """After the one sketching pass (collected as the persisted-sketch
    artifact), the returned plan touches events only for the exact-
    intersection audit — the union/estimate algebra runs over literal
    register rows."""
    plan = plan_of(spark, "q_hll_overlap_event_types", sf_smoke, mode="simple")
    assert plan.count("events.parquet") == 1, plan.count("events.parquet")
    assert "LocalTableScan" in plan or "Scan ExistingRDD" in plan


def test_aqe_splits_skewed_join_partitions(spark):
    """Runtime skew handling, pinned end-to-end: with one key holding
    ~99% of the build side and broadcast off (the 100 TB regime where
    neither side fits an executor), AQE must re-plan the sort-merge
    join with the hot partition SPLIT (`SortMergeJoin(skew=true)` +
    `AQEShuffleRead ... skewed` in the FINAL adaptive plan). This is
    the engine-native complement to the manual salting plan
    (q_salted_agg_customer_spend) and the skew-profile measurement
    (q_join_key_skew_profile): diagnose with the profile, let AQE split
    joins at runtime, salt only aggregate-only skew."""
    import pyspark.sql.functions as F

    keys = [
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.forceOptimizeSkewedJoin",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
    ]
    old = {}
    for k in keys:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB"
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        left = spark.range(0, 60000).select(
            F.when(F.col("id") % 100 < 99, 1).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 50).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        df = left.join(right, "k").groupBy().agg(F.count(F.lit(1)).alias("n"))
        # only the hot key matches the 0..49 build side: 99% of 60000
        assert df.collect()[0]["n"] == 59400
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin(skew=true)" in plan
        assert "skewed" in plan  # AQEShuffleRead split the hot partition
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_ivf_cell_assignment_is_shuffle_free(spark, sf_smoke):
    """Round 4: nearest-centroid assignment is an in-row argmin over
    literal centroid arrays — NO crossJoin, NO groupBy(vec_id), no
    embedding ever crosses an Exchange (the rounds-1-3 form shuffled
    the full corpus per assignment pass and per Lloyd round)."""
    from cost_of_living_data_etl_spark.operators.similarity import (
        _assign_cells,
        _fit_ivf_centroids,
        with_norm,
    )
    from cost_of_living_data_etl_spark.sources.tables import load_table

    e = with_norm(load_table(spark, sf_smoke, "embeddings"))
    cents = _fit_ivf_centroids(e)
    plan = (
        _assign_cells(e, cents)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_ivf_probe_plan_is_exchange_free(spark, sf_smoke):
    """The full IVF probe (assignment + probe-cell broadcast join +
    top-k) must keep ZERO shuffle exchanges: probe cells and the query
    vector broadcast, TakeOrderedAndProject handles the top-k."""
    plan = plan_of(spark, "q_ann_ivf_probe", sf_smoke, mode="simple")
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "TakeOrderedAndProject" in plan


def test_pit_assembly_single_window_shuffle_no_payload_in_exchange(
    spark, sf_smoke
):
    """The union-window spine: exactly one hashpartitioning Exchange
    (the per-entity window), however many running features ride the
    frame — and no event props/payload strings cross it."""
    plan = plan_of(spark, "q_pit_feature_assembly", sf_smoke)
    assert plan.count("+- Exchange") == 1
    exchange_lines = [l for l in plan.splitlines() if "Exchange" in l]
    assert not any("props" in l for l in exchange_lines)


def test_source_modularity_no_text_in_any_exchange(spark, sf_smoke):
    """The modularity rollup shuffles ids, hashes, and source keys
    only; document text stays inside the scan-side projections."""
    plan = plan_of(spark, "q_dupgraph_source_modularity", sf_smoke)
    exchange_lines = [l for l in plan.splitlines() if "Exchange" in l]
    assert exchange_lines
    assert not any(
        "text" in l or "shingle" in l for l in exchange_lines
    )


def test_interval_overlap_join_is_bucketed_equi_join(spark, sf_smoke):
    """The session × burst overlap join must run as an equi-join on
    grid cells — never a nested-loop inequality join — and nothing
    event-payload-sized may cross any Exchange."""
    plan = plan_of(spark, "q_interval_overlap_sessions_bursts", sf_smoke)
    assert "CartesianProduct" not in plan
    exchange_lines = [l for l in plan.splitlines() if "Exchange" in l]
    assert exchange_lines
    assert not any("props" in l or "event_type" in l for l in exchange_lines)


def test_isotonic_calibration_text_never_in_exchange(spark, sf_smoke):
    """Quality score and dup label are computed map-side: document
    text must not enter any Exchange; post-rollup the PAVA grid is
    constant-size."""
    plan = plan_of(spark, "q_isotonic_calibration_quality_dup", sf_smoke)
    exchange_lines = [l for l in plan.splitlines() if "Exchange" in l]
    assert exchange_lines
    assert not any("text" in l or "shingle" in l for l in exchange_lines)


def test_markov_solve_reads_checkpointed_counts_not_events(spark, sf_smoke):
    """The value-iteration solve runs entirely over the materialized
    ≤30-row (src, dst, cnt) table: its plan contains NO parquet scan
    (the events pass happened once, behind the checkpoint) and no
    per-event columns in any Exchange."""
    plan = plan_of(spark, "q_markov_removal_attribution", sf_smoke)
    assert "Scan parquet" not in plan
    assert "ExistingRDD" in plan or "LogicalRDD" in plan


def test_data_shapley_text_never_in_exchange(spark, sf_smoke):
    """The Data Shapley training pass tokenizes map-side: document
    text must not cross any Exchange; what shuffles is (grp, lang,
    word) count state bounded by the vocabulary."""
    plan = plan_of(spark, "q_data_shapley_source_groups", sf_smoke)
    exchange_lines = [l for l in plan.splitlines() if "Exchange" in l]
    assert exchange_lines
    assert not any("text" in l for l in exchange_lines)


def test_aqp_is_single_scan_for_both_branches(spark, sf_smoke):
    """Sample membership is a map-side flag: exact and sampled
    aggregates must come from ONE parquet scan of orders, not a scan
    per branch."""
    plan = plan_of(spark, "q_aqp_sample_sum_error", sf_smoke)
    # formatted explain prints each scan twice (tree line + details)
    assert plan.count("Scan parquet") == 2


def test_threshold_curve_reuses_checkpointed_pairs(spark, sf_smoke):
    """The tau sweep must read the materialized exact pair set (plus
    one documents scan for the denominator) — never recompute the
    PPJoin per threshold."""
    plan = plan_of(spark, "q_dedup_threshold_curve", sf_smoke)
    assert "ExistingRDD" in plan or "LogicalRDD" in plan
    # one logical scan = two formatted-explain mentions (tree + details)
    assert plan.count("Scan parquet") == 2  # the n_docs denominator only
