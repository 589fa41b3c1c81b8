"""Semantic regression tests for the inference family — invariants
the oracle hash gate cannot catch because oracle and engine share the
spec (holding semantics, degenerate-bootstrap collapse, SPRT crossing
and freezing).
"""

from __future__ import annotations

import datetime
import math

from cost_of_living_data_etl_spark.plans.inference import (
    q_bootstrap_ci_mean,
    q_sprt_ab_daily,
    q_twap_by_event_type,
)


def _write_events(spark, path, rows):
    """rows: [(event_id, ts, user_id, event_type, value)]"""
    df = spark.createDataFrame(
        [(i, ts, uid, et, v, "{}") for (i, ts, uid, et, v) in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{path}/events.parquet")


def _write_orders(spark, path, prices):
    d = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(k, 1, "O", p, d, "1-URGENT") for k, p in enumerate(prices)],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.write.mode("overwrite").parquet(f"{path}/orders.parquet")


def test_twap_weighs_by_holding_time_not_tick_count(spark, tmp_path):
    """value 100 held 9 s then value 0 held 1 s → TWAP 90, where the
    tick mean is 50; the final event (no successor) contributes no
    holding."""
    base = datetime.datetime(2024, 1, 1)
    _write_events(
        spark,
        str(tmp_path),
        [
            (0, base, 1, "view", 100.0),
            (1, base + datetime.timedelta(seconds=9), 1, "view", 0.0),
            (2, base + datetime.timedelta(seconds=10), 1, "view", 50.0),
        ],
    )
    rows = q_twap_by_event_type(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["event_type"] == "view"
    assert r["twap"] == 90.0
    assert r["hold_us"] == 10_000_000


def test_twap_holding_is_per_user(spark, tmp_path):
    """Holdings never span users: two users with one event each have
    no successor events, so there is nothing to average."""
    base = datetime.datetime(2024, 1, 1)
    _write_events(
        spark,
        str(tmp_path),
        [(0, base, 1, "view", 10.0), (1, base + datetime.timedelta(seconds=5), 2, "view", 20.0)],
    )
    assert q_twap_by_event_type(spark, str(tmp_path)).count() == 0


def test_bootstrap_degenerate_data_collapses_ci(spark, tmp_path):
    """Every row equal ⇒ every resample mean equals the constant ⇒
    the CI collapses to a point regardless of the draws."""
    _write_orders(spark, str(tmp_path), [250.0] * 40)
    r = q_bootstrap_ci_mean(spark, str(tmp_path)).collect()[0]
    assert r["point_mean"] == 250.0
    assert r["ci_lo"] == 250.0
    assert r["ci_hi"] == 250.0
    assert r["n_resamples"] == 100


def test_sprt_all_purchases_accepts_h1_and_freezes(spark, tmp_path):
    """20 purchases on day 1 push the LLR past +ln 19 immediately
    (20·ln(22/18) ≈ 4.01); the decision is accept_h1 on day 1 and
    STAYS accept_h1 on day 2 even though day 2's all-miss data would
    walk the LLR back down."""
    base = datetime.datetime(2024, 1, 1)
    rows = [(i, base, 1, "purchase", 1.0) for i in range(20)]
    rows += [
        (100 + i, base + datetime.timedelta(days=1), 1, "view", 1.0)
        for i in range(200)
    ]
    _write_events(spark, str(tmp_path), rows)
    got = {
        r["day"].date().isoformat(): (r["decision"], r["llr"])
        for r in q_sprt_ab_daily(spark, str(tmp_path)).collect()
    }
    assert got["2024-01-01"][0] == "accept_h1"
    assert got["2024-01-02"][0] == "accept_h1"  # frozen
    assert math.isclose(got["2024-01-01"][1], 20 * math.log(0.22 / 0.18), abs_tol=1e-5)


def test_sprt_no_purchases_accepts_h0(spark, tmp_path):
    """100 conversion-free trials walk the LLR to 100·ln(0.78/0.82)
    ≈ −5.0 < −ln 19: accept_h0 on day 1."""
    base = datetime.datetime(2024, 1, 1)
    _write_events(
        spark,
        str(tmp_path),
        [(i, base, 1, "view", 1.0) for i in range(100)],
    )
    r = q_sprt_ab_daily(spark, str(tmp_path)).collect()[0]
    assert r["decision"] == "accept_h0"
    assert r["n_conv"] == 0


def test_uplift_bootstrap_degenerate_equal_arms(spark, tmp_path):
    """Every order identical across arms ⇒ every resample uplift is
    exactly 0 ⇒ CI collapses to [0, 0] and significant = 0."""
    from cost_of_living_data_etl_spark.plans.inference import (
        q_bootstrap_ci_uplift,
    )

    _write_orders(spark, str(tmp_path), [300.0] * 60)
    # _write_orders assigns custkey=1 for all; rewrite with mixed arms
    d = datetime.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(k, k % 2 + 1, "O", 300.0, d, "1-URGENT") for k in range(60)],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    r = q_bootstrap_ci_uplift(spark, str(tmp_path)).collect()[0]
    assert r["point_uplift"] == 0.0
    assert r["ci_lo"] == 0.0 and r["ci_hi"] == 0.0
    assert r["significant"] == 0
