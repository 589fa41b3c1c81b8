"""Semantic tests for the survival/trend family on hand-computable
constructions — censoring mechanics, perfect-trend invariants, exact
breakpoint recovery, and the DiD contrast arithmetic.
"""

from __future__ import annotations

import datetime

from cost_of_living_data_etl_spark.plans.survival_trend import (
    q_did_order_value,
    q_km_survival_conversion,
    q_mann_kendall_trend,
    q_segmented_regression_break,
)

BASE = datetime.datetime(2024, 1, 1)


def _write_events(spark, path, rows):
    """rows: [(event_id, day_offset, user_id, event_type)]"""
    df = spark.createDataFrame(
        [
            (i, BASE + datetime.timedelta(days=d), uid, et, 1.0, "{}")
            for (i, d, uid, et) in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{path}/events.parquet")


def _write_orders(spark, path, rows):
    """rows: [(o_orderkey, custkey, price, date)]"""
    df = spark.createDataFrame(
        [(k, c, "O", p, d, "1-URGENT") for (k, c, p, d) in rows],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.write.mode("overwrite").parquet(f"{path}/orders.parquet")


def test_km_censoring_shrinks_risk_set_without_counting_events(spark, tmp_path):
    """u1 converts day 0, u2 day 2; u3 censored at day 1, u4 at day 5.
    S(0) = 1·(1−1/4) = 0.75; at t=2 the risk set is ONLY {u2, u4}
    (u3 left by censoring, u1 by converting): S(2) = 0.75·(1−1/2)
    = 0.375. Counting censored u3 as converted or dropping it entirely
    would give 0.25/0.5 shapes instead."""
    rows = [
        (0, 0, 1, "purchase"),        # u1: converts at dur 0
        (1, 0, 2, "view"), (2, 2, 2, "purchase"),  # u2: dur 2
        (3, 4, 3, "view"),            # u3: censored (tmax=5) at dur 1
        (4, 0, 4, "view"), (5, 5, 4, "view"),      # u4: censored at dur 5
    ]
    _write_events(spark, str(tmp_path), rows)
    got = [
        (r["t_day"], r["n_risk"], r["d_events"], r["survival"])
        for r in q_km_survival_conversion(spark, str(tmp_path)).collect()
    ]
    assert got == [(0, 4, 1, 0.75), (2, 2, 1, 0.375)]


def test_mann_kendall_perfect_trend_tau_one(spark, tmp_path):
    """Strictly increasing monthly revenue: every pair concordant,
    S = n(n−1)/2, τ = 1 exactly, tie term zero."""
    rows = []
    for mth in range(4):
        d = datetime.datetime(2024, 1 + mth, 15)
        rows.append((mth, 1, 100.0 * (mth + 1), d))
    _write_orders(spark, str(tmp_path), rows)
    r = q_mann_kendall_trend(spark, str(tmp_path)).collect()[0]
    assert (r["n_months"], r["s_stat"]) == (4, 6)
    assert r["tau"] == 1.0


def test_segmented_regression_recovers_noiseless_vertex(spark, tmp_path):
    """Daily revenue 100−10x for x=0..4 then 40+20(x−4) for x=5..9:
    splitting after x=4 fits both pieces with zero SSE, so the argmax
    must land exactly there with the exact slopes."""
    rows = []
    for x in range(10):
        price = 100.0 - 10.0 * x if x <= 4 else 40.0 + 20.0 * (x - 4)
        rows.append((x, 1, price, BASE + datetime.timedelta(days=x)))
    _write_orders(spark, str(tmp_path), rows)
    r = q_segmented_regression_break(spark, str(tmp_path)).collect()[0]
    assert r["break_day"].date().isoformat() == "2024-01-05"
    assert (r["n_left"], r["n_right"]) == (5, 5)
    assert abs(r["left_slope"] - (-10.0)) < 1e-9
    assert abs(r["right_slope"] - 20.0) < 1e-9


def test_did_nets_out_shared_trend(spark, tmp_path):
    """T: 10 → 30, C: 5 → 15 ⇒ naive after-minus-before says +20 for
    treatment, but the control drifted +10 on its own — DiD = 10."""
    before = datetime.datetime(1996, 6, 1)
    after = datetime.datetime(1997, 6, 1)
    rows = [
        (0, 1, 10.0, before), (1, 1, 30.0, after),   # treatment (odd key)
        (2, 2, 5.0, before), (3, 2, 15.0, after),    # control (even key)
    ]
    _write_orders(spark, str(tmp_path), rows)
    r = q_did_order_value(spark, str(tmp_path)).collect()[0]
    assert (r["t_before"], r["t_after"], r["c_before"], r["c_after"]) == (
        10.0, 30.0, 5.0, 15.0,
    )
    assert r["did"] == 10.0


def test_mcf_staggered_entry_risk_sets(spark, tmp_path):
    """u1 (age window 10 days) purchases at ages 1, 1, 3; u2 joins
    late (window 2 days) and purchases at age 1. MCF(1) = 3/2 (both
    at risk), MCF(3) = 1.5 + 1/1 (only u1's window covers age 3) —
    the late joiner must NOT dilute ages it never observed."""
    from cost_of_living_data_etl_spark.plans.survival_trend import (
        q_mcf_repeat_purchases,
    )

    rows = [
        (0, 0, 1, "view"),
        (1, 1, 1, "purchase"),
        (2, 1, 1, "purchase"),
        (3, 3, 1, "purchase"),
        (4, 10, 1, "view"),  # sets tmax = day 10
        (5, 8, 2, "view"),
        (6, 9, 2, "purchase"),
    ]
    _write_events(spark, str(tmp_path), rows)
    got = [
        (r["age_day"], r["n_risk"], r["d_events"], r["mcf"])
        for r in q_mcf_repeat_purchases(spark, str(tmp_path)).collect()
    ]
    assert got == [(1, 2, 3, 1.5), (3, 1, 1, 2.5)]
