"""Semantic tests for the forecast/econ family and survivorship."""

from __future__ import annotations

import datetime

BASE = datetime.datetime(2024, 1, 1)


def _write_orders(spark, path, rows):
    spark.createDataFrame(
        [(k, 1, "O", p, d, "1-URGENT") for (k, p, d) in rows],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{path}/orders.parquet")


def test_holt_tracks_perfect_linear_trend(spark, tmp_path):
    """On y = 10 + 5t the Holt states lock onto (level = last y,
    trend = 5): the 7-day forecast extrapolates the line and the
    walk-forward MAE is ~0 — every one-step-ahead forecast was
    right."""
    from cost_of_living_data_etl_spark.plans.forecast import (
        q_holt_linear_forecast,
    )

    rows = [
        (t, 10.0 + 5.0 * t, BASE + datetime.timedelta(days=t))
        for t in range(40)
    ]
    _write_orders(spark, str(tmp_path), rows)
    r = q_holt_linear_forecast(spark, str(tmp_path)).collect()[0]
    last = 10.0 + 5.0 * 39
    assert r["n_days"] == 40
    assert abs(r["level"] - last) < 1e-6
    assert abs(r["trend"] - 5.0) < 1e-6
    assert abs(r["forecast_7d"] - (last + 35.0)) < 1e-5
    assert r["mae_30d"] < 1e-6


def test_holt_backtest_averages_exactly_30_errors(spark, tmp_path):
    """The walk-forward MAE must average EXACTLY the last HOLT_BT
    one-step-ahead errors — a local replay of the fold pins both the
    window size and the pre-update scoring. A linear-trend series
    (errors all 0) cannot see an off-by-one in the window bound; a
    zig-zag series with nonzero errors can (round-3 advice: the fold
    summed 31 terms over divisor 30)."""
    from cost_of_living_data_etl_spark.plans.forecast import (
        HOLT_BT,
        q_holt_linear_forecast,
    )

    # deterministic zig-zag around a drifting level → nonzero errors
    ys = [100.0 + 2.0 * t + (7.0 if t % 2 else -7.0) for t in range(45)]
    rows = [(t, y, BASE + datetime.timedelta(days=t)) for t, y in enumerate(ys)]
    _write_orders(spark, str(tmp_path), rows)
    r = q_holt_linear_forecast(spark, str(tmp_path)).collect()[0]

    a, g = 0.3, 0.1
    lvl, trd = ys[0], ys[1] - ys[0]
    nd, idx, errs = len(ys), 2.0, []
    for y in ys[1:]:
        if idx > nd - HOLT_BT:
            errs.append(abs(y - (lvl + trd)))
        new_l = a * y + (1 - a) * (lvl + trd)
        trd = g * (new_l - lvl) + (1 - g) * trd
        lvl, idx = new_l, idx + 1.0
    assert len(errs) == HOLT_BT  # the window contract itself
    assert abs(r["mae_30d"] - sum(errs) / HOLT_BT) < 1e-9
    assert r["mae_30d"] > 1.0  # errors genuinely nonzero on this series


def test_laspeyres_freezes_base_basket(spark, tmp_path):
    """Base month: A at 10 (qty 2), B at 20 (qty 1). Month 2: A
    doubles to 20, B flat, and a NEW part C appears (excluded — not
    in the base basket). Index = (2·20 + 1·20)/(2·10 + 1·20) = 1.5;
    the base month itself indexes at exactly 1.0."""
    from cost_of_living_data_etl_spark.plans.forecast import (
        q_laspeyres_price_index,
    )

    m1 = datetime.datetime(2024, 1, 15)
    m2 = datetime.datetime(2024, 2, 15)
    rows = [
        # (okey, part, qty, extendedprice = qty * unit, ship)
        (1, 100, 2.0, 20.0, m1),   # A @ 10
        (2, 200, 1.0, 20.0, m1),   # B @ 20
        (3, 100, 1.0, 20.0, m2),   # A @ 20
        (4, 200, 2.0, 40.0, m2),   # B @ 20
        (5, 300, 5.0, 5.0, m2),    # C — not in base, excluded
    ]
    spark.createDataFrame(
        [
            (k, p, 1, 1, q, e, 0.0, 0.0, "A", "F", d)
            for (k, p, q, e, d) in rows
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    got = {
        r["month"].date().isoformat(): r["laspeyres_idx"]
        for r in q_laspeyres_price_index(spark, str(tmp_path)).collect()
    }
    assert got["2024-01-01"] == 1.0
    assert abs(got["2024-02-01"] - 1.5) < 1e-12


def test_survivorship_picks_highest_quality_then_lowest_id(spark, tmp_path):
    """Three identical docs (one cluster): equal quality, so the
    survivor is the LOWEST doc_id; member count and max length are the
    cluster's, and singleton docs produce no row."""
    from cost_of_living_data_etl_spark.plans.mining import (
        q_golden_record_survivorship,
    )

    dup = "the quick brown fox jumps over the lazy dog again and again"
    texts = [dup, dup, dup, "a completely different single document here"]
    spark.createDataFrame(
        [(i + 10, t, "en", "t", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = q_golden_record_survivorship(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["cluster_id"], r["survivor_doc_id"], r["n_members"]) == (
        10, 10, 3,
    )
    assert r["max_n_chars"] == len(dup)
