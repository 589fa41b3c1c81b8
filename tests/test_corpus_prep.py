"""Corpus-prep composite: structural invariants of the cleaned corpus.

The funnel query itself is hash-checked end-to-end against a DuckDB
CTE chain (tests/test_catalog_oracle.py); these tests pin the
per-document OUTPUT contract of prepare_corpus — the properties a
downstream training job depends on but an aggregate report can't see.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from cost_of_living_data_etl_spark.operators.decontam import EVAL_MOD
from cost_of_living_data_etl_spark.plans.corpus_prep import (
    QUALITY_MIN,
    prepare_corpus,
)


def _docs(spark, sf):
    return spark.read.parquet(f"{sf}/documents.parquet")


def test_output_contract(spark, sf_oracle):
    docs = _docs(spark, sf_oracle)
    out = prepare_corpus(docs).cache()

    # no eval docs, no sub-threshold docs
    assert out.filter(F.col("doc_id") % EVAL_MOD == 0).count() == 0
    assert out.filter(F.col("quality") < QUALITY_MIN).count() == 0

    # exact-dedup held: every surviving text is unique
    joined = out.join(docs.select("doc_id", "text"), "doc_id")
    assert joined.count() == joined.select("text").distinct().count()

    # doc_ids survive from the input, once each
    assert out.count() == out.select("doc_id").distinct().count()


def test_packing_is_monotone_within_budget(spark, sf_oracle):
    out = prepare_corpus(_docs(spark, sf_oracle))
    rows = out.orderBy("lang", "doc_id").collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    from cost_of_living_data_etl_spark.plans.corpus_prep import PACK_BUDGET

    for lang, docs in by_lang.items():
        assert docs[0]["bin_id"] == 0, lang
        cum = 0
        for r in docs:
            assert r["bin_id"] == cum // PACK_BUDGET  # bin = f(cum chars before)
            cum += r["n_chars"]
        # bins are nondecreasing in doc order
        bins = [r["bin_id"] for r in docs]
        assert bins == sorted(bins)


def test_no_text_in_any_exchange(spark, sf_oracle):
    """The pipeline's scale contract: document text is consumed in the
    map pass (signal projection) and never crosses a shuffle — every
    Exchange carries only the slim signal/flag columns."""
    from cost_of_living_data_etl_spark.plans.catalog import catalog

    plan = (
        catalog()["q_corpus_prep_funnel"]
        .fn(spark, sf_oracle)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    exchange_lines = [l for l in plan.splitlines() if "Exchange" in l]
    assert exchange_lines, "expected shuffles in the funnel plan"
    assert not any("text" in l for l in exchange_lines)
