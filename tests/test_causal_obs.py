"""Closed-form pin for subclassification ATE: a constructed corpus
with covariate-dependent enrolment and ZERO within-cell effect —
urgent orders (70% enrolled) are all worth 500, low-priority orders
(30% enrolled) all worth 100. The naive treated-vs-control difference
is exactly 160 (pure composition bias); the stratified estimate must
be exactly 0."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F

from cost_of_living_data_etl_spark.plans.causal_obs import (
    q_subclassification_ate,
)
from cost_of_living_data_etl_spark.plans.reshape import _BUCKET_SPARK

BASE = datetime.datetime(2024, 1, 1)


def test_confounded_null_effect_recovered(spark, tmp_path):
    rows = (
        spark.range(1, 20000)
        .select(F.col("id").alias("k"))
        .withColumn("b", F.expr(_BUCKET_SPARK.format(k="k")))
        .collect()
    )
    lt30 = [r["k"] for r in rows if r["b"] < 30]
    b30_70 = [r["k"] for r in rows if 30 <= r["b"] < 70]
    ge70 = [r["k"] for r in rows if r["b"] >= 70]

    orders = []
    # urgent cell, outcome 500: 7 treated (bucket<70) + 3 control (>=70)
    for k in (lt30[:4] + b30_70[:3]):
        orders.append((k, 1, "O", 500.0, BASE, "1-URGENT"))
    for k in ge70[:3]:
        orders.append((k, 1, "O", 500.0, BASE, "1-URGENT"))
    # low cell, outcome 100: 3 treated (bucket<30) + 7 control (>=30)
    for k in lt30[4:7]:
        orders.append((k, 1, "O", 100.0, BASE, "5-LOW"))
    for k in (b30_70[3:7] + ge70[3:6]):
        orders.append((k, 1, "O", 100.0, BASE, "5-LOW"))
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")

    r = q_subclassification_ate(spark, str(tmp_path)).collect()[0]
    assert (r["n_treated"], r["n_control"]) == (10, 10)
    assert r["naive_diff"] == 160.0   # (7·500+3·100)/10 − (3·500+7·100)/10
    assert r["ate_subclass"] == 0.0   # zero within-cell effect, exactly
    assert r["n_cells_supported"] == 2 and r["n_cells_dropped"] == 0
    assert r["dropped_share"] == 0.0


def test_ipw_null_effect_with_design_exact_rates(spark, tmp_path):
    """Same confounded-null corpus as the subclassification test, with
    realized enrolment EXACTLY at the design rates (7/10 at 0.7, 3/10
    at 0.3): both IPW estimators must recover a zero effect — and
    because weights attach to class aggregates, the cancellation is
    to float round-off, not statistical noise."""
    from cost_of_living_data_etl_spark.plans.causal_obs import q_ipw_ate
    from cost_of_living_data_etl_spark.plans.reshape import _BUCKET_SPARK

    rows = (
        spark.range(1, 20000)
        .select(F.col("id").alias("k"))
        .withColumn("b", F.expr(_BUCKET_SPARK.format(k="k")))
        .collect()
    )
    lt30 = [r["k"] for r in rows if r["b"] < 30]
    b30_70 = [r["k"] for r in rows if 30 <= r["b"] < 70]
    ge70 = [r["k"] for r in rows if r["b"] >= 70]
    orders = []
    for k in (lt30[:4] + b30_70[:3]):
        orders.append((k, 1, "O", 500.0, BASE, "1-URGENT"))
    for k in ge70[:3]:
        orders.append((k, 1, "O", 500.0, BASE, "1-URGENT"))
    for k in lt30[4:7]:
        orders.append((k, 1, "O", 100.0, BASE, "5-LOW"))
    for k in (b30_70[3:7] + ge70[3:6]):
        orders.append((k, 1, "O", 100.0, BASE, "5-LOW"))
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    r = q_ipw_ate(spark, str(tmp_path)).collect()[0]
    assert r["n_orders"] == 20
    assert abs(r["ate_ipw_ht"]) < 1e-9
    assert abs(r["ate_ipw_hajek"]) < 1e-9
