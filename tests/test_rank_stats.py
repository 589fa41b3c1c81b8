"""Semantic tests for the rank/association family: perfect-monotone,
perfect-association, and perfectly-separated constructions with
exactly-known statistic values.
"""

from __future__ import annotations

import datetime

from cost_of_living_data_etl_spark.plans.rank_stats import (
    q_auc_quality_dup,
    q_cramers_v_status_priority,
    q_spearman_price_quantity,
)

BASE = datetime.datetime(2024, 1, 1)


def test_spearman_is_one_for_monotone_nonlinear(spark, tmp_path):
    """quantity = price³ is monotone but wildly nonlinear: Spearman
    must be EXACTLY 1.0 (rank vectors identical; the ratio reduces to
    A/√(A·A) over exact ints) where Pearson would be well below 1."""
    rows = [
        (i, 1, 1, 1, float(x**3), float(x), 0.0, 0.0, "A", "F", BASE)
        for i, x in enumerate(range(1, 21))
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    r = q_spearman_price_quantity(spark, str(tmp_path)).collect()[0]
    assert r["n_rows"] == 20
    assert r["spearman_rho"] == 1.0


def test_cramers_v_is_one_for_determined_pair(spark, tmp_path):
    """Status determines priority (diagonal 2×2 with equal cells):
    χ² = n exactly and V = 1.0."""
    rows = []
    for k in range(10):
        status, prio = ("O", "1-URGENT") if k % 2 == 0 else ("F", "5-LOW")
        rows.append((k, 1, status, 100.0, BASE, prio))
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    r = q_cramers_v_status_priority(spark, str(tmp_path)).collect()[0]
    assert (r["n_orders"], r["n_status"], r["n_priorities"]) == (10, 2, 2)
    assert r["cramers_v"] == 1.0


def test_auc_zero_when_dups_score_lowest(spark, tmp_path):
    """Two identical junk docs (guaranteed LSH pair, low quality) vs
    wordy unique docs (high quality): every positive scores below
    every negative, so AUC = P(score₊ > score₋) = 0.0 exactly — pins
    the orientation of the rank-sum identity."""
    junk = "@@ ## $$ %% ^^ && ** (( )) !!"  # punct-soup → quality ~0
    goods = [
        "the quick brown fox jumps over the lazy dog in the field",
        "a tall ship sails across the wide sea with the wind behind",
        "morning light falls on the quiet town and the river runs",
        "children play in the park while the band plays for the crowd",
    ]
    texts = [junk, junk] + goods
    spark.createDataFrame(
        [(i, t, "en", "t", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    r = q_auc_quality_dup(spark, str(tmp_path)).collect()[0]
    assert (r["n_dup"], r["n_unique"]) == (2, 4)
    assert r["auc"] == 0.0


def test_auc_null_when_no_dups(spark, tmp_path):
    """No near-dup pairs ⇒ degenerate label ⇒ auc NULL, not a crash
    or a fake 0.5."""
    texts = [f"completely unique document number {i} here" for i in range(4)]
    spark.createDataFrame(
        [(i, t, "en", "t", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    r = q_auc_quality_dup(spark, str(tmp_path)).collect()[0]
    assert r["n_dup"] == 0
    assert r["auc"] is None
