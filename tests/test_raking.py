"""Closed-form pins for IPF raking on constructed orders whose sample
membership is controlled through the md5-bucket predicate: a
composition-consistent sample rakes to the uniform inverse sampling
weight exactly, and a row-biased sample (status F over-sampled 2×)
rakes each cell back to its population total with the exact per-status
weights — both cases settle in one IPF round, so the K-round values
are clean rationals."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F

from cost_of_living_data_etl_spark.plans.raking import (
    PRIORITIES,
    STATUSES,
    q_raking_ipf_weights,
)
from cost_of_living_data_etl_spark.plans.reshape import _BUCKET_SPARK

BASE = datetime.datetime(2024, 1, 1)


def _keys_by_bucket(spark, n_in, n_out):
    """Orderkeys whose md5 bucket is < 20 (always sampled) and ≥ 60
    (never sampled, even for status F)."""
    rows = (
        spark.range(1, 20000)
        .select(F.col("id").alias("k"))
        .withColumn("b", F.expr(_BUCKET_SPARK.format(k="k")))
        .collect()
    )
    ins = [r["k"] for r in rows if r["b"] < 20][:n_in]
    outs = [r["k"] for r in rows if r["b"] >= 60][:n_out]
    assert len(ins) == n_in and len(outs) == n_out
    return ins, outs


def _write_orders(spark, tmp_path, per_cell_in, per_cell_out):
    n_cells = len(STATUSES) * len(PRIORITIES)
    ins, outs = _keys_by_bucket(
        spark, n_cells * per_cell_in, n_cells * per_cell_out
    )
    rows, i_in, i_out = [], 0, 0
    for s in STATUSES:
        for p in PRIORITIES:
            for _ in range(per_cell_in):
                rows.append((ins[i_in], 1, s, 100.0, BASE, p))
                i_in += 1
            for _ in range(per_cell_out):
                rows.append((outs[i_out], 1, s, 100.0, BASE, p))
                i_out += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")


def test_consistent_sample_rakes_to_uniform_inverse_rate(spark, tmp_path):
    """1 sampled + 3 unsampled orders per cell: composition matches
    the population, so every cell rakes to its population total 4 with
    per-record weight exactly 4.0."""
    _write_orders(spark, tmp_path, per_cell_in=1, per_cell_out=3)
    for r in q_raking_ipf_weights(spark, str(tmp_path)).collect():
        assert r["n_sample"] == 1
        assert r["raked_total"] == 4.0
        assert r["weight_per_record"] == 4.0


def test_row_biased_sample_gets_exact_per_status_weights(spark, tmp_path):
    """Status F doubly sampled (2 in-sample per cell vs 1 elsewhere),
    population 4 per cell everywhere: raking restores every cell total
    to 4, so F records weigh exactly 2.0 and the rest exactly 4.0 —
    the bias-undoing the weights exist for."""
    n_cells = len(STATUSES) * len(PRIORITIES)
    ins, outs = _keys_by_bucket(spark, n_cells * 2, n_cells * 3)
    rows, i_in, i_out = [], 0, 0
    for s in STATUSES:
        for p in PRIORITIES:
            n_in = 2 if s == "F" else 1
            for _ in range(n_in):
                rows.append((ins[i_in], 1, s, 100.0, BASE, p))
                i_in += 1
            for _ in range(4 - n_in):
                rows.append((outs[i_out], 1, s, 100.0, BASE, p))
                i_out += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    got = {
        (r["o_orderstatus"], r["o_orderpriority"]): r
        for r in q_raking_ipf_weights(spark, str(tmp_path)).collect()
    }
    assert len(got) == n_cells
    for (s, _p), r in got.items():
        assert r["raked_total"] == 4.0
        assert r["weight_per_record"] == (2.0 if s == "F" else 4.0)
