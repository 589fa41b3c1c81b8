"""Closed-form pins for the STL strength features: pure trend ⇒
F_T = 1 exactly (and F_S = 0 via the flat-component guard), pure
seasonality ⇒ the mirror, pure noise ⇒ both exactly 0 (the ratio is
var/var = 1, clamped difference 0)."""

from __future__ import annotations

from cost_of_living_data_etl_spark.plans.ts_features import ts_strength

_SCHEMA = "trend double, seasonal double, residual double"


def test_pure_trend_scores_one_zero(spark):
    rows = [(float(i), 0.0, 0.0) for i in range(1, 21)]
    r = ts_strength(spark.createDataFrame(rows, _SCHEMA)).collect()[0]
    assert r["n_days"] == 20
    assert r["trend_strength"] == 1.0
    assert r["seasonal_strength"] == 0.0
    assert r["var_residual"] == 0.0


def test_pure_seasonality_scores_zero_one(spark):
    rows = [(0.0, 1.0 if i % 2 == 0 else -1.0, 0.0) for i in range(20)]
    r = ts_strength(spark.createDataFrame(rows, _SCHEMA)).collect()[0]
    assert r["trend_strength"] == 0.0
    assert r["seasonal_strength"] == 1.0


def test_pure_noise_scores_zero_zero(spark):
    rows = [(0.0, 0.0, float((-1) ** i * (i % 5 + 1))) for i in range(20)]
    r = ts_strength(spark.createDataFrame(rows, _SCHEMA)).collect()[0]
    assert r["trend_strength"] == 0.0
    assert r["seasonal_strength"] == 0.0
    assert r["var_residual"] > 0.0
