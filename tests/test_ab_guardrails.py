"""Closed-form pins for the experimentation guardrails: a forced
80/20 arm imbalance yields chi2 = exactly 36 and trips the SRM alarm
(a balanced split scores exactly 0 and does not); a constructed
two-user-per-arm metric with known pooled variance reproduces the MDE
formula to the last bit (recomputed independently in the test)."""

from __future__ import annotations

import datetime
import math

import pyspark.sql.functions as F

from cost_of_living_data_etl_spark.plans.ab_guardrails import (
    q_ab_power_mde,
    q_ab_srm_check,
)
from cost_of_living_data_etl_spark.plans.stats_analytics import _ARM_SPARK

BASE = datetime.datetime(2024, 1, 1)

_EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _users_by_arm(spark, n0, n1):
    rows = (
        spark.range(1, 20000)
        .select(F.col("id").alias("u"))
        .withColumn("arm", F.expr(_ARM_SPARK.format(k="u")))
        .collect()
    )
    a0 = [r["u"] for r in rows if r["arm"] == 0][:n0]
    a1 = [r["u"] for r in rows if r["arm"] == 1][:n1]
    assert len(a0) == n0 and len(a1) == n1
    return a0, a1


def _write_events(spark, tmp_path, user_values):
    spark.createDataFrame(
        [
            (i, BASE, u, "view", v, "{}")
            for i, (u, v) in enumerate(user_values)
        ],
        _EVENTS_SCHEMA,
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")


def test_srm_flags_forced_imbalance_and_passes_balance(spark, tmp_path):
    a0, a1 = _users_by_arm(spark, 80, 20)
    _write_events(spark, tmp_path, [(u, 1.0) for u in a0 + a1])
    r = q_ab_srm_check(spark, str(tmp_path)).collect()[0]
    assert (r["n_arm0"], r["n_arm1"]) == (80, 20)
    assert r["srm_chi2"] == 36.0  # (80-20)^2 / 100 exactly
    assert r["srm_p"] < 1e-8 and r["srm_flag"] is True

    b0, b1 = _users_by_arm(spark, 50, 50)
    _write_events(spark, tmp_path, [(u, 1.0) for u in b0 + b1])
    r = q_ab_srm_check(spark, str(tmp_path)).collect()[0]
    assert r["srm_chi2"] == 0.0
    assert r["srm_flag"] is False


def test_mde_matches_hand_formula(spark, tmp_path):
    a0, a1 = _users_by_arm(spark, 2, 2)
    _write_events(
        spark,
        tmp_path,
        [(a0[0], 0.0), (a0[1], 2.0), (a1[0], 0.0), (a1[1], 2.0)],
    )
    r = q_ab_power_mde(spark, str(tmp_path)).collect()[0]
    assert (r["n_arm0"], r["n_arm1"]) == (2, 2)
    # per arm: ssq − s²/n = 4 − 2 = 2; pooled = (2+2)/(4−2) = 2
    assert r["pooled_sd"] == math.sqrt(2.0)
    want = (
        (1.959963984540054 + 0.8416212335729143)
        * math.sqrt(2.0)
        * math.sqrt(1.0 / 2 + 1.0 / 2)
    )
    assert abs(r["mde_abs"] - want) < 1e-12
    assert abs(r["mde_rel"] - want / 1.0) < 1e-12  # grand mean = 1.0


def test_aqp_constant_values_estimate_exact_zero_width(spark, tmp_path):
    """All orders worth the same amount: the sample mean IS the
    population mean, so the scaled estimate equals the exact sum and
    the CI half-width is exactly 0 (guarded zero variance)."""
    from cost_of_living_data_etl_spark.plans.ab_guardrails import (
        _BUCKET_SPARK_K,
        q_aqp_sample_sum_error,
    )

    rows = (
        spark.range(1, 20000)
        .select(F.col("id").alias("k"))
        .withColumn("b", F.expr(_BUCKET_SPARK_K.replace("o_orderkey", "k")))
        .collect()
    )
    ins = [r["k"] for r in rows if r["b"] < 10][:3]
    outs = [r["k"] for r in rows if r["b"] >= 10][:5]
    orders = [(k, 1, "O", 250.0, BASE, "5-LOW") for k in ins + outs]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    r = q_aqp_sample_sum_error(spark, str(tmp_path)).collect()[0]
    assert (r["n_rows"], r["n_sampled"]) == (8, 3)
    assert r["exact_sum"] == 2000.0
    assert r["est_sum"] == 2000.0  # 8 · 250, exactly
    assert r["ci_halfwidth"] == 0.0
    assert r["within_ci"] is True


def test_aqp_halfwidth_matches_hand_formula(spark, tmp_path):
    """Two sampled orders (100, 200) among four: the CLT half-width
    with finite-population correction recomputed independently must
    match to the last bits."""
    from cost_of_living_data_etl_spark.plans.ab_guardrails import (
        _BUCKET_SPARK_K,
        q_aqp_sample_sum_error,
    )

    rows = (
        spark.range(1, 20000)
        .select(F.col("id").alias("k"))
        .withColumn("b", F.expr(_BUCKET_SPARK_K.replace("o_orderkey", "k")))
        .collect()
    )
    ins = [r["k"] for r in rows if r["b"] < 10][:2]
    outs = [r["k"] for r in rows if r["b"] >= 10][:2]
    vals = dict(zip(ins + outs, [100.0, 200.0, 100.0, 200.0]))
    spark.createDataFrame(
        [(k, 1, "O", v, BASE, "5-LOW") for k, v in vals.items()],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    r = q_aqp_sample_sum_error(spark, str(tmp_path)).collect()[0]
    assert (r["n_rows"], r["n_sampled"]) == (4, 2)
    assert r["exact_sum"] == 600.0
    assert r["est_sum"] == 600.0  # 4 · 150
    import math

    n_all, n_s = 4, 2
    s_cents, ssq_cents = 30000, 100_000_000 + 400_000_000
    var = (ssq_cents / 10000.0 - (s_cents / 100.0) * (s_cents / 100.0) / n_s) / (
        n_s - 1.0
    )
    want = (
        n_all
        * 1.959963984540054
        * math.sqrt(var / n_s)
        * math.sqrt((n_all - n_s) / (n_all - 1.0))
    )
    assert abs(r["ci_halfwidth"] - want) < 1e-9
    assert r["within_ci"] is True


def test_capture_recapture_closed_form(spark, tmp_path):
    """Users chosen by their salted capture buckets: 3 in both frames,
    3 only-frame-1, 2 only-frame-2, 2 in neither ⇒ n₁=6, n₂=5, m=3:
    Lincoln-Petersen = 6·5/3 = 10 (exactly the truth here) and
    Chapman = 7·6/4 − 1 = 9.5, both exact."""
    from cost_of_living_data_etl_spark.plans.ab_guardrails import (
        _CAP_SPARK,
        q_capture_recapture_users,
    )

    rows = (
        spark.range(1, 50000)
        .select(F.col("id").alias("user_id"))
        .withColumn("c1", F.expr(_CAP_SPARK.format(salt="c1")))
        .withColumn("c2", F.expr(_CAP_SPARK.format(salt="c2")))
        .collect()
    )
    both = [r["user_id"] for r in rows if r["c1"] and r["c2"]][:3]
    only1 = [r["user_id"] for r in rows if r["c1"] and not r["c2"]][:3]
    only2 = [r["user_id"] for r in rows if r["c2"] and not r["c1"]][:2]
    neither = [r["user_id"] for r in rows if not r["c1"] and not r["c2"]][:2]
    users = both + only1 + only2 + neither
    spark.createDataFrame(
        [(i, BASE, u, "view", 1.0, "{}") for i, u in enumerate(users)],
        _EVENTS_SCHEMA,
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    r = q_capture_recapture_users(spark, str(tmp_path)).collect()[0]
    assert (r["n_true"], r["n_capture1"], r["n_capture2"], r["n_both"]) == (
        10, 6, 5, 3,
    )
    assert r["lp_estimate"] == 10.0
    assert r["chapman_estimate"] == 9.5
    assert r["chapman_rel_err"] == -0.05


def test_vocab_saturation_closed_form(spark, tmp_path):
    """Corpus 'a a a b b c d': N = 7 tokens, S = 4 words, 2 singletons,
    1 doubleton ⇒ Good-Turing unseen mass 2/7, Chao1 = 4 + 2·1/(2·2)
    = 4.5, unseen vocab share 0.125 — all exact."""
    from cost_of_living_data_etl_spark.plans.ab_guardrails import (
        q_vocab_saturation,
    )

    spark.createDataFrame(
        [(1, "a a a b", "en", "s", 7), (2, "b c d", "en", "s", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    r = q_vocab_saturation(spark, str(tmp_path)).collect()[0]
    assert (r["n_tokens"], r["vocab_observed"]) == (7, 4)
    assert (r["n_singletons"], r["n_doubletons"]) == (2, 1)
    assert r["unseen_mass_gt"] == 2.0 / 7.0
    assert r["chao1_richness"] == 4.5
    assert r["unseen_vocab_share"] == 0.125
