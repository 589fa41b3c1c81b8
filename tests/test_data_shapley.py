"""Semantic test for source-group Data Shapley: a constructed corpus
where ALL discriminative training signal lives in group 0 (src0), and
groups 1-3 hold neutral same-language filler. The 16-coalition game
then has a closed form — v(∅)=0, v(S)=0.5 for S∌0 (only English is a
candidate language, so only the English test doc is right), v(S)=1.0
for S∋0 — giving exactly-known Shapley values φ₀ = 0.625 and
φ_{1,2,3} = 0.125 (n=4 factorial weights), which also exercises the
efficiency identity Σφ = v(full) − v(∅)."""

from __future__ import annotations

import pyspark.sql.functions as F

from cost_of_living_data_etl_spark.plans.data_shapley import (
    q_data_shapley_source_groups,
)
from cost_of_living_data_etl_spark.plans.mllite import (
    _NB_BUCKET_SPARK,
    _TEST_CUT,
    _TRAIN_CUT,
)


def _ids_by_bucket(spark, n_train, n_test):
    rows = (
        spark.range(1, 2000)
        .select(F.col("id").alias("doc_id"))
        .withColumn("b", F.expr(_NB_BUCKET_SPARK))
        .collect()
    )
    train = [r["doc_id"] for r in rows if r["b"] < _TRAIN_CUT][:n_train]
    test = [r["doc_id"] for r in rows if r["b"] >= _TEST_CUT][:n_test]
    assert len(train) == n_train and len(test) == n_test
    return train, test


def test_all_signal_in_group_zero_closed_form(spark, tmp_path):
    train_ids, test_ids = _ids_by_bucket(spark, 10, 2)
    docs = []
    # group 0: both languages, perfectly discriminative words
    for i, (lang, text) in enumerate(
        [("en", "hello world")] * 2 + [("fr", "bonjour monde")] * 2
    ):
        docs.append((train_ids[i], text, lang, "src0"))
    # groups 1-3: English-only neutral filler (no usable signal)
    for g in (1, 2, 3):
        for j in range(2):
            docs.append((train_ids[4 + (g - 1) * 2 + j], "zzz zzz", "en", f"src{g}"))
    # held-out: one doc per language
    docs.append((test_ids[0], "hello world", "en", "src0"))
    docs.append((test_ids[1], "bonjour monde", "fr", "src0"))
    spark.createDataFrame(
        [(i, t, lg, s, len(t)) for (i, t, lg, s) in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    got = {
        r["grp"]: r
        for r in q_data_shapley_source_groups(spark, str(tmp_path)).collect()
    }
    assert set(got) == {0, 1, 2, 3}
    for g in got:
        assert got[g]["acc_full"] == 1.0
    assert got[0]["acc_solo"] == 1.0
    for g in (1, 2, 3):
        assert got[g]["acc_solo"] == 0.5  # English-only candidate set
        assert abs(got[g]["shapley_acc"] - 0.125) < 1e-12
    assert abs(got[0]["shapley_acc"] - 0.625) < 1e-12
    # efficiency: Σφ = v(full) − v(∅) = acc_full
    assert abs(sum(r["shapley_acc"] for r in got.values()) - 1.0) < 1e-12
