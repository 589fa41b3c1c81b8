"""Semantic test for PCA power iteration on a corpus with a KNOWN
spectrum — the oracle gate proves cross-engine equality, this proves
the math finds the right component.
"""

from __future__ import annotations

from cost_of_living_data_etl_spark.plans.spectral import q_pca_power_iteration


def test_pca_recovers_planted_axis(spark, tmp_path):
    """All variance planted on axis 3 (label 0 at +0.4, label 1 at
    −0.4, zeros elsewhere): PC1 must be ±e₃ with λ₁ = 0.16 exactly
    (quantization is exact at 0.4), explained share 1.0, and the two
    label means must sit at ±0.4 — the batch-effect signature the
    per-label projection exists to expose. Sign: from the all-positive
    init the iteration lands on +e₃, so label 0 projects positive."""
    rows = []
    for k in range(8):
        vec = [0.0] * 64
        vec[3] = 0.4 if k % 2 == 0 else -0.4
        rows.append((k, vec, k % 2))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    got = {
        r["label"]: r for r in q_pca_power_iteration(spark, str(tmp_path)).collect()
    }
    assert set(got) == {0, 1}
    r0 = got[0]
    assert r0["lambda1"] == 0.16
    assert r0["explained_share"] == 1.0
    assert abs(got[0]["mean_pc1"] - 0.4) < 1e-6
    assert abs(got[1]["mean_pc1"] + 0.4) < 1e-6


def test_embedding_drift_finds_planted_dimension(spark, tmp_path):
    """Only dimension 5 differs between the label populations (+0.35
    vs −0.35, disjoint buckets); it must rank first with positive PSI
    while identical dimensions score exactly 0 (identical smoothed
    shares cancel term-by-term)."""
    from cost_of_living_data_etl_spark.plans.spectral import (
        q_embedding_dim_drift,
    )

    rows = []
    for k in range(20):
        label = k % 2
        vec = [0.0] * 64
        vec[5] = 0.35 if label == 0 else -0.35
        rows.append((k, vec, label))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    got = q_embedding_dim_drift(spark, str(tmp_path)).collect()
    assert got[0]["dim"] == 5
    assert got[0]["psi"] > 1.0
    for r in got[1:]:
        assert r["psi"] == 0.0
