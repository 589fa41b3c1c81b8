"""Semantic regression tests for the advanced-analytics family —
cases the oracle hash gate cannot catch because oracle and engine
share the spec (a shared-spec bug would hash-match on both sides).
"""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F


def _write_events(spark, path, rows):
    """rows: [(event_id, ts, user_id)] -> events.parquet with the
    fixture schema (extra columns nulled)."""
    df = spark.createDataFrame(
        [(i, ts, uid, "view", 1.0, "{}") for (i, ts, uid) in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_concurrency_peak_carries_across_midnight(spark, tmp_path):
    """Five sessions run 23:00 day1 -> 01:00 day2 (events every 25 min
    keep each session alive across midnight). Day2's peak is CARRIED IN
    — no +1 boundary occurs on day2 — and must still report 5; a
    boundary-only sweep reports 4 (the value after the first -1)."""
    from cost_of_living_data_etl_spark.plans.analytics_extra import (
        q_concurrent_sessions_peak,
    )

    base = datetime.datetime(2024, 6, 1, 23, 0, 0)
    rows = []
    eid = 0
    for uid in range(5):
        for k in range(5):  # 23:00, 23:25, 23:50, 00:15, 00:40
            rows.append((eid, base + datetime.timedelta(minutes=25 * k), uid))
            eid += 1
    _write_events(spark, str(tmp_path), rows)

    got = {
        r["day"].date().isoformat(): r["peak_concurrency"]
        for r in q_concurrent_sessions_peak(spark, str(tmp_path)).collect()
    }
    assert got == {"2024-06-01": 5, "2024-06-02": 5}


def test_concurrency_day_inside_long_session_is_reported(spark, tmp_path):
    """A calendar day that sits entirely inside one long-running
    session has no boundary rows of its own; the midnight probe must
    still report its peak of 1 (and the covered middle day must not be
    missing from the output)."""
    from cost_of_living_data_etl_spark.plans.analytics_extra import (
        q_concurrent_sessions_peak,
    )

    start = datetime.datetime(2024, 6, 1, 12, 0, 0)
    end = datetime.datetime(2024, 6, 3, 12, 0, 0)
    rows = []
    eid = 0
    t = start
    while t <= end:  # one session: events every 25 minutes for 2 days
        rows.append((eid, t, 1))
        eid += 1
        t += datetime.timedelta(minutes=25)
    _write_events(spark, str(tmp_path), rows)

    got = {
        r["day"].date().isoformat(): r["peak_concurrency"]
        for r in q_concurrent_sessions_peak(spark, str(tmp_path)).collect()
    }
    assert got == {"2024-06-01": 1, "2024-06-02": 1, "2024-06-03": 1}


def test_bounce_rate_counts_single_event_sessions(spark, tmp_path):
    """Two sessions for user 1 (one bounce, one 2-event) on one day:
    bounce rate must be 1/2."""
    from cost_of_living_data_etl_spark.plans.analytics_extra import (
        q_session_bounce_rate,
    )

    d = datetime.datetime(2024, 6, 1, 10, 0, 0)
    rows = [
        (0, d, 1),  # bounce (next event > 30 min away)
        (1, d + datetime.timedelta(hours=2), 1),
        (2, d + datetime.timedelta(hours=2, minutes=10), 1),
    ]
    _write_events(spark, str(tmp_path), rows)
    out = q_session_bounce_rate(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_sessions"], r["n_bounces"]) == (2, 1)
    assert r["bounce_rate"] == 0.5


def test_cohort_ltv_december_cohort_label(spark, tmp_path):
    """Shared-spec regression: year*12+month decoding must label a
    December cohort as (year, 12) — the naive %12+1 decode calls it
    January of the NEXT year on both engines, so only a semantic test
    catches it."""
    import datetime

    from cost_of_living_data_etl_spark.plans.customer_analytics import (
        q_cohort_ltv,
    )

    rows = [
        # customer 1: first order December 1995, second order Feb 1996
        (1, 1, "F", 100.0, datetime.datetime(1995, 12, 15), "1-URGENT"),
        (2, 1, "F", 50.0, datetime.datetime(1996, 2, 10), "1-URGENT"),
        # customer 2: single order January 1996
        (3, 2, "F", 70.0, datetime.datetime(1996, 1, 5), "1-URGENT"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")

    got = {
        (r["cohort_year"], r["cohort_month"], r["age_months"]): (
            r["n_active"],
            r["revenue"],
            r["cum_revenue"],
        )
        for r in q_cohort_ltv(spark, str(tmp_path)).collect()
    }
    assert got == {
        (1995, 12, 0): (1, 100.0, 100.0),
        (1995, 12, 2): (1, 50.0, 150.0),
        (1996, 1, 0): (1, 70.0, 70.0),
    }


def test_pvm_bridge_closed_form_and_reconciliation(spark, tmp_path):
    """One part repricing 10→11 with volume 10→12 decomposes into a
    price effect of exactly 12 and a volume effect of exactly 20
    (residual 0); a discontinued part's entire −50 lands in the
    mix/churn residual — and every brand row reconciles to its
    revenue delta by construction."""
    import datetime

    from cost_of_living_data_etl_spark.plans.analytics_extra import (
        PVM_Y1,
        PVM_Y2,
        q_pvm_revenue_bridge,
    )

    d1 = datetime.datetime(PVM_Y1, 6, 1)
    d2 = datetime.datetime(PVM_Y2, 6, 1)
    li = [
        # (orderkey, partkey, suppkey, line, qty, extprice, disc, tax, rf, ls, ship)
        (1, 1, 1, 1, 10.0, 100.0, 0.0, 0.0, "N", "O", d1),
        (2, 1, 1, 1, 12.0, 132.0, 0.0, 0.0, "N", "O", d2),
        (3, 2, 1, 1, 5.0, 50.0, 0.0, 0.0, "N", "O", d1),  # discontinued
    ]
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    spark.createDataFrame(
        [(1, "widget one", "B1", "T", 5, 900.0),
         (2, "widget two", "B2", "T", 5, 900.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")

    got = {
        r["brand"]: r
        for r in q_pvm_revenue_bridge(spark, str(tmp_path)).collect()
    }
    b1 = got["B1"]
    assert (b1["revenue_y1"], b1["revenue_y2"]) == (100.0, 132.0)
    assert b1["price_effect"] == 12.0   # (11−10)·12
    assert b1["volume_effect"] == 20.0  # (12−10)·10
    assert b1["mix_and_churn_effect"] == 0.0
    b2 = got["B2"]
    assert (b2["revenue_y1"], b2["revenue_y2"]) == (50.0, 0.0)
    assert b2["price_effect"] == 0.0 and b2["volume_effect"] == 0.0
    assert b2["mix_and_churn_effect"] == -50.0
    for r in got.values():  # the bridge must reconcile exactly
        assert (
            r["revenue_y2"] - r["revenue_y1"]
            - r["price_effect"] - r["volume_effect"]
            - r["mix_and_churn_effect"]
        ) == 0.0
