"""End-to-end training-corpus preparation pipeline.

The individual cleaning passes (exact dedup, n-gram decontamination,
heuristic quality scoring, sequence packing) each exist as standalone
catalog queries; this module composes them in the order a pretraining
data pipeline actually runs them and reports the per-language funnel —
the artifact a data-curation team reviews before a training run:

    input → dedup → (eval slice removed) → decontaminate → quality
          → pack into token-budget bins

Every stage is deterministic (salted-md5 hashing, fixed thresholds, no
RNG), so the WHOLE composite is mirrored as one DuckDB CTE chain and
hash-checked end-to-end — not just stage-by-stage.

Scale shape: stages 1-4 are map-only over the corpus plus shuffles on
8-byte hashes or doc_ids only (never text); the packing window sorts
(lang, doc_id) pairs; the funnel report aggregates per-doc rows into
|langs| output rows. A 100 TB run replaces the in-plan composition
with the same stages checkpointed to parquet between passes (each
stage's output is a doc_id set — tiny next to the corpus), which also
makes the funnel incremental: only new ingest batches re-run stages.

The reference has no multi-stage data-quality pipeline at all
(SURVEY §2.5 — its three transforms are schema conforming only,
reference app.py:33-103); this is a north-star composite.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from cost_of_living_data_etl_spark.operators.decontam import (
    EVAL_MOD,
    NGRAM_N,
    _HASH_SQL,
    _word_ngrams_sql,
    ngram_hashes,
)
from cost_of_living_data_etl_spark.operators.textstats import quality_score
from cost_of_living_data_etl_spark.plans.catalog import register
from cost_of_living_data_etl_spark.sources.tables import load_table

QUALITY_MIN = 0.52  # ~bottom decile of the fixture corpus in every language
PACK_BUDGET = 2048  # characters per packed bin (token stand-in)

# DuckDB mirror of textstats.quality_score — SAME operation order so
# IEEE arithmetic is bit-identical and the >= threshold cannot flip
# between engines.
_WORDS_SQL = "regexp_extract_all(lower(text), '[a-z0-9]+')"
_STOPS = "('the','a','of','to','and','in','is','for','on','with')"
_QUALITY_SQL = f"""
    least(length(text) / 500.0, 1.0) * 0.4
    + least((length(list_filter({_WORDS_SQL}, w -> w IN {_STOPS})) * 1.0
             / greatest(length({_WORDS_SQL}), 1)) * 4, 1.0) * 0.2
    + greatest(0.0, 1.0 - (length(regexp_extract_all(text, '[^\\w\\s]')) * 1.0
                           / greatest(length(text), 1)) * 5) * 0.2
    + greatest(0.0, 1.0 - (length(regexp_extract_all(text, '[0-9]')) * 1.0
                           / greatest(length(text), 1)) * 5) * 0.2
"""

_FUNNEL_ORACLE = f"""
WITH kept AS (  -- exact dedup: keeper = min doc_id per content hash
    SELECT min(doc_id) AS doc_id
    FROM documents GROUP BY md5(text)
),
train AS (      -- eval slice is held out, not trained on
    SELECT d.* FROM documents d JOIN kept USING (doc_id)
    WHERE d.doc_id % {EVAL_MOD} <> 0
),
grams AS (
    SELECT doc_id,
           list_distinct(list_transform({_word_ngrams_sql(NGRAM_N)},
                                        g -> {_HASH_SQL})) AS hset
    FROM documents
),
eval_hashes AS (
    SELECT DISTINCT unnest(hset) AS h FROM grams WHERE doc_id % {EVAL_MOD} = 0
),
contaminated AS (
    SELECT DISTINCT g.doc_id
    FROM (SELECT doc_id, unnest(hset) AS h FROM grams
          WHERE doc_id % {EVAL_MOD} <> 0) g
    JOIN eval_hashes e ON g.h = e.h
),
clean AS (
    SELECT t.* FROM train t ANTI JOIN contaminated c ON t.doc_id = c.doc_id
),
final AS (
    SELECT *, {_QUALITY_SQL} AS quality FROM clean
    WHERE {_QUALITY_SQL} >= {QUALITY_MIN}
),
packed AS (
    SELECT lang, doc_id, n_chars,
           CAST(coalesce(sum(n_chars) OVER (
                    PARTITION BY lang ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), 0) // {PACK_BUDGET} AS BIGINT) AS bin_id
    FROM final
),
per_lang AS (
    SELECT lang,
           CAST(count(*) AS BIGINT)          AS n_final,
           sum(n_chars)                      AS final_chars,
           CAST(count(DISTINCT bin_id) AS BIGINT) AS n_bins
    FROM packed GROUP BY lang
)
SELECT
    i.lang,
    CAST(i.n_input AS BIGINT)                AS n_input,
    CAST(t.n_train AS BIGINT)                AS n_after_dedup,
    CAST(t.n_train - c.n_clean AS BIGINT)    AS n_contaminated,
    p.n_final,
    p.final_chars,
    p.n_bins
FROM (SELECT lang, count(*) AS n_input FROM documents GROUP BY lang) i
JOIN (SELECT lang, count(*) AS n_train FROM train GROUP BY lang) t USING (lang)
JOIN (SELECT lang, count(*) AS n_clean FROM clean GROUP BY lang) c USING (lang)
JOIN per_lang p USING (lang)
"""


def dedup_keepers(docs: DataFrame) -> DataFrame:
    """Exact-dedup keeper set: min doc_id per content hash. The shuffle
    key is the 32-byte md5, never the text."""
    return (
        docs.select("doc_id", F.md5("text").alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )


def contaminated_doc_ids(docs: DataFrame) -> DataFrame:
    """Train doc_ids sharing ≥1 word-NGRAM_N-gram with the eval slice
    (same broadcast-probe shape as q_decontaminate_ngram)."""
    grams = ngram_hashes(docs, NGRAM_N)
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    eval_hashes = grams.filter(is_eval).select(F.explode("hset").alias("h")).distinct()
    return (
        grams.filter(~is_eval)
        .select("doc_id", F.explode("hset").alias("h"))
        .join(F.broadcast(eval_hashes), "h")
        .select("doc_id")
        .distinct()
    )


def prepare_corpus(docs: DataFrame) -> DataFrame:
    """Cleaned, packed corpus: the per-document output of the funnel
    (doc_id, lang, n_chars, quality, bin_id)."""
    kept = dedup_keepers(docs)
    train = docs.join(kept, "doc_id", "left_semi").filter(
        F.col("doc_id") % EVAL_MOD != 0
    )
    clean = train.join(contaminated_doc_ids(docs), "doc_id", "left_anti")
    final = clean.withColumn("quality", quality_score(F.col("text"))).filter(
        F.col("quality") >= QUALITY_MIN
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return final.select(
        "doc_id",
        "lang",
        "n_chars",
        "quality",
        (F.coalesce(F.sum("n_chars").over(w), F.lit(0)) / PACK_BUDGET)
        .cast("bigint")
        .alias("bin_id"),
    )


@register(
    "q_corpus_prep_funnel",
    oracle=_FUNNEL_ORACLE,
    tags=("training-data", "pipeline", "dedup", "decontam", "quality", "packing"),
)
def q_corpus_prep_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language funnel report of the full corpus-prep pipeline:
    input → exact dedup → eval holdout → decontamination → quality
    floor → packing. The composite (not just each stage) is mirrored
    in DuckDB and hash-checked, so stage wiring errors — filtering the
    wrong side, dedup after decontam, packing pre-filter docs — are
    caught, not just per-stage math.
    """
    docs = load_table(spark, sf_dir, "documents")
    kept = dedup_keepers(docs)
    train = docs.join(kept, "doc_id", "left_semi").filter(
        F.col("doc_id") % EVAL_MOD != 0
    )
    clean = train.join(contaminated_doc_ids(docs), "doc_id", "left_anti")
    packed = prepare_corpus(docs)

    n_input = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_input"))
    n_train = train.groupBy("lang").agg(F.count(F.lit(1)).alias("n_after_dedup"))
    n_clean = clean.groupBy("lang").agg(F.count(F.lit(1)).alias("n_clean"))
    per_lang = packed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_final"),
        F.sum("n_chars").alias("final_chars"),
        F.count_distinct("bin_id").alias("n_bins"),
    )
    return (
        n_input.join(n_train, "lang")
        .join(n_clean, "lang")
        .join(per_lang, "lang")
        .select(
            "lang",
            "n_input",
            "n_after_dedup",
            (F.col("n_after_dedup") - F.col("n_clean")).alias("n_contaminated"),
            "n_final",
            "final_chars",
            "n_bins",
        )
    )
