"""Semantic tests for Markov removal-effect attribution: exact edge
construction on constructed journeys, and exactly-known removal
effects on a chain that absorbs within two steps (so the K-step
truncation is EXACT and the expected values are clean rationals)."""

from __future__ import annotations

import datetime

from cost_of_living_data_etl_spark.plans.attribution_markov import (
    markov_transition_counts,
    q_markov_removal_attribution,
)

BASE = datetime.datetime(2024, 3, 1, 12, 0, 0)

_EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        [
            (i, BASE + datetime.timedelta(seconds=sec), uid, et, 1.0, "{}")
            for i, (sec, uid, et) in enumerate(rows)
        ],
        _EVENTS_SCHEMA,
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")


def test_transition_counts_contract(spark, tmp_path):
    """START edge for the first touch, truncation at the FIRST
    purchase (no edges sourced at conv, post-purchase events ignored),
    and a trailing →null edge only for non-converting journeys."""
    _write_events(
        spark,
        tmp_path,
        [
            # user 1: view → purchase → click (click is post-conversion)
            (0, 1, "view"),
            (10, 1, "purchase"),
            (20, 1, "click"),
            # user 2: click → view, never converts
            (0, 2, "click"),
            (10, 2, "view"),
        ],
    )
    got = {
        (r["src"], r["dst"]): r["cnt"]
        for r in markov_transition_counts(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("start", "view"): 1,
        ("view", "conv"): 1,
        ("start", "click"): 1,
        ("click", "view"): 1,
        ("view", "null"): 1,
    }
    assert not any(src == "conv" for src, _ in got)


def test_removal_effects_exact_two_step_chain(spark, tmp_path):
    """Two journeys: view→purchase and click→(nothing). The chain
    absorbs every path within two steps, so the K-step value IS the
    absorption probability: p_conv = 1/2, removing view kills the
    only converting path (effect 1, share 1), removing click changes
    nothing (effect 0), unobserved channels get exactly 0."""
    _write_events(
        spark,
        tmp_path,
        [(0, 1, "view"), (10, 1, "purchase"), (0, 2, "click")],
    )
    got = {
        r["channel"]: r
        for r in q_markov_removal_attribution(spark, str(tmp_path)).collect()
    }
    assert set(got) == {"click", "error", "signup", "view"}
    for ch, r in got.items():
        assert r["p_conv"] == 0.5
    assert got["view"]["p_conv_removed"] == 0.0
    assert got["view"]["removal_effect"] == 1.0
    assert got["view"]["share"] == 1.0
    for ch in ("click", "error", "signup"):
        assert got[ch]["p_conv_removed"] == 0.5
        assert got[ch]["removal_effect"] == 0.0
        assert got[ch]["share"] == 0.0


def test_purchase_first_journey_all_effects_zero(spark, tmp_path):
    """A journey whose first event is the purchase converts through
    NO channel: p_conv = 1 via the direct START→CONV edge, every
    removal effect is 0, and the share guard (total effect 0) yields
    0 rather than a 0/0 NaN."""
    _write_events(spark, tmp_path, [(0, 1, "purchase")])
    for r in q_markov_removal_attribution(spark, str(tmp_path)).collect():
        assert r["p_conv"] == 1.0
        assert r["p_conv_removed"] == 1.0
        assert r["removal_effect"] == 0.0
        assert r["share"] == 0.0
