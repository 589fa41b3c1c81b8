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


HEADLINE_NO_PYTHON_ROW_UDF = [
    "q1_pricing_summary",
    "q5_region_nation_revenue",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_text_quality_by_source",
    "q_text_langid_confusion",
    "q_ann_bruteforce_topk",
    "q_etl_shaped_conform",
]


@pytest.mark.parametrize("name", HEADLINE_NO_PYTHON_ROW_UDF)
def test_no_row_at_a_time_python(spark, sf_smoke, name):
    plan = plan_of(spark, name, sf_smoke)
    assert "BatchEvalPython" not in plan, f"{name} fell off the JVM fast path"


def test_pandas_udf_uses_arrow(spark, sf_smoke):
    plan = plan_of(spark, "q_pandas_udf_quality", sf_smoke)
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
