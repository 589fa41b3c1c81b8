"""Semantic tests for MATCH_RECOGNIZE-lite session pattern matching:
one constructed journey per pattern with exactly-known match sets,
including the negative cases that distinguish whole-journey regex
semantics from step-wise funnel counting, and a same-timestamp tie
pinning the (ts, event_id) string order."""

from __future__ import annotations

import datetime

from cost_of_living_data_etl_spark.plans.sequence_patterns import (
    q_session_pattern_match,
)

BASE = datetime.datetime(2024, 6, 1, 9, 0, 0)


def test_pattern_match_constructed_journeys(spark, tmp_path):
    journeys = {
        1: ["view", "purchase"],            # clean_convert ONLY
        2: ["view", "error", "purchase"],   # error_recovery, NOT clean
        3: ["view"],                        # bounce
        4: ["error", "error"],              # error_loop (no purchase)
        5: ["signup", "click", "purchase"],  # signup_to_purchase, no v
        6: ["view", "view", "view"],        # deep_browse
    }
    rows = []
    eid = 0
    for uid, seq in journeys.items():
        for k, et in enumerate(seq):
            rows.append(
                (eid, BASE + datetime.timedelta(seconds=10 * k), uid, et)
            )
            eid += 1
    # user 7: purchase and view share ONE timestamp; event_id order puts
    # purchase first, so the journey string is 'pv' — which must NOT
    # count as a conversion pattern. A collection-order string build
    # would be free to emit 'vp' and silently flip this.
    rows.append((100, BASE, 7, "purchase"))
    rows.append((101, BASE, 7, "view"))
    spark.createDataFrame(
        [(i, ts, uid, et, 1.0, "{}") for (i, ts, uid, et) in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    got = {
        r["pattern_name"]: (r["n_matched"], r["n_journeys"])
        for r in q_session_pattern_match(spark, str(tmp_path)).collect()
    }
    assert got == {
        "bounce": (1, 7),
        "clean_convert": (1, 7),
        "deep_browse": (1, 7),
        "error_loop": (1, 7),
        "error_recovery": (1, 7),
        "signup_to_purchase": (1, 7),
    }
