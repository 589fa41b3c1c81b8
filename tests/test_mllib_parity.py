"""Cross-implementation check: our SQL-native MinHash-LSH vs Spark
MLlib's MinHashLSH (pyspark.ml.feature) on the same corpus.

Two INDEPENDENT LSH implementations (different hash families, banding
schemes, and Jaccard surfaces) exact-verifying at the same threshold
must agree on the pairs the stricter one finds: MLlib's OR-amplified
8-table scheme has ≥99% candidate recall at J ≥ 0.5, while our 4×4
banded scheme trades near-threshold recall for a far smaller candidate
set — so (a) nearly every pair WE emit must also be found by MLlib,
and (b) MLlib must find at least as many pairs. A systematic
divergence here would mean one of the two Jaccard surfaces is wrong.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from cost_of_living_data_etl_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    shingle_docs,
)
from cost_of_living_data_etl_spark.plans import catalog
from cost_of_living_data_etl_spark.sources.tables import load_table

from conftest import TESTDATA

SF = f"{TESTDATA}/sf0.001"


def test_mllib_minhash_agrees_with_custom_lsh(spark):
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = load_table(spark, SF, "documents")
    shingled = shingle_docs(docs)
    feats = HashingTF(
        inputCol="shingles",
        outputCol="features",
        numFeatures=1 << 18,
        binary=True,
    ).transform(shingled)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=42
    ).fit(feats)
    # approxSimilarityJoin thresholds on Jaccard DISTANCE = 1 - J
    ml_pairs = {
        (r["a"], r["b"])
        for r in model.approxSimilarityJoin(
            feats, feats, 1.0 - JACCARD_THRESHOLD, distCol="dist"
        )
        .select(
            F.col("datasetA.doc_id").alias("a"),
            F.col("datasetB.doc_id").alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .collect()
    }

    ours = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in catalog()["q_dedup_minhash_lsh"].fn(spark, SF).collect()
    }

    assert ours, "custom LSH found no pairs at sf0.001 — fixture drift?"
    assert len(ml_pairs) >= len(ours)
    overlap = len(ours & ml_pairs) / len(ours)
    # hashing-surface differences can flip pairs sitting exactly on the
    # threshold; systematic disagreement would push this far below 0.8
    assert overlap >= 0.8, (overlap, len(ours), len(ml_pairs))


def test_conformal_coverage_guarantee_on_fixture(spark, sf_smoke):
    """The split-conformal finite-sample guarantee: test coverage must
    land near 1 - alpha = 0.9 (exchangeable splits; binomial wobble at
    fixture n allowed) — and the three md5 splits must partition the
    joined feature table."""
    from cost_of_living_data_etl_spark.plans.mllite import (
        q_conformal_interval_ridge,
    )
    from cost_of_living_data_etl_spark.sources.tables import load_table

    r = q_conformal_interval_ridge(spark, sf_smoke).collect()[0]
    assert 0.80 <= r["coverage"] <= 1.0
    assert r["qhat"] > 0
    n_orders_with_lines = (
        load_table(spark, sf_smoke, "lineitem")
        .select("l_orderkey")
        .distinct()
        .count()
    )
    assert r["n_train"] + r["n_cal"] + r["n_test"] == n_orders_with_lines
