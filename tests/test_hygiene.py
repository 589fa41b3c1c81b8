"""Semantic tests for the stream-hygiene family with CONSTRUCTED
out-of-order arrivals — the driver fixture's event stream is perfectly
in-order (event_id sequence == event-time order per user), so the
oracle gate only pins the degenerate all-on-time case; lateness
mechanics must be proven here.
"""

from __future__ import annotations

import datetime

from cost_of_living_data_etl_spark.plans.hygiene import (
    q_event_gap_percentiles,
    q_event_lateness_audit,
    q_watermark_coverage_curve,
)


def _write_events(spark, path, rows):
    """rows: [(event_id, ts_seconds_offset, user_id)] — event_id is the
    ARRIVAL order, the ts offset the event time."""
    base = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (i, base + datetime.timedelta(seconds=s), uid, "view", 1.0, "{}")
            for (i, s, uid) in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_lateness_measures_against_running_max(spark, tmp_path):
    """Arrivals with event times 100, 50, 200, 150: the 2nd is 50 s
    behind the mark (100), the 4th is 50 s behind the mark (200) —
    the mark is the running MAX, not the previous event's time."""
    _write_events(spark, str(tmp_path), [(0, 100, 1), (1, 50, 1), (2, 200, 1), (3, 150, 1)])
    r = q_event_lateness_audit(spark, str(tmp_path)).collect()[0]
    assert (r["n_events"], r["n_late"]) == (4, 2)
    assert r["max_late_us"] == 50_000_000
    assert r["total_late_us"] == 100_000_000
    assert r["late_share"] == 0.5


def test_lateness_is_per_user(spark, tmp_path):
    """User 2's early event time is NOT late relative to user 1's
    high-water mark — marks never cross users."""
    _write_events(spark, str(tmp_path), [(0, 1000, 1), (1, 10, 2)])
    r = q_event_lateness_audit(spark, str(tmp_path)).collect()[0]
    assert r["n_late"] == 0


def test_gap_percentiles_are_exact_order_statistics(spark, tmp_path):
    """Gaps 1..10 s: p50 = ceil(0.5·10) = 5th smallest = 5 s,
    p90 = 9 s, p99 = ceil(0.99·10) = 10th = 10 s — elements of the
    data, not interpolations (nearest-rank would give 5.5 for p50)."""
    offs = [0]
    for g in range(1, 11):
        offs.append(offs[-1] + g)
    _write_events(
        spark, str(tmp_path), [(i, s, 1) for i, s in enumerate(offs)]
    )
    r = q_event_gap_percentiles(spark, str(tmp_path)).collect()[0]
    assert r["n_gaps"] == 10
    assert r["p50_us"] == 5_000_000
    assert r["p90_us"] == 9_000_000
    assert r["p99_us"] == 10_000_000


def test_watermark_curve_counts_coverage_inclusively(spark, tmp_path):
    """Lateness 0 s, 30 s, 400 s: a 60 s watermark accepts 2 of 3; a
    600 s watermark accepts all; boundary is inclusive (late == delay
    is accepted, matching Structured Streaming's >= watermark rule)."""
    _write_events(
        spark,
        str(tmp_path),
        [(0, 1000, 1), (1, 970, 1), (2, 1100, 1), (3, 700, 1)],
    )
    # lateness: 0 (first), 30 (970 vs 1000), 0 (1100 advances), 400
    r = q_watermark_coverage_curve(spark, str(tmp_path)).collect()[0]
    assert r["n_events"] == 4
    assert r["covered_60s"] == 0.75
    assert r["covered_600s"] == 1.0
