"""Benchmark-decontamination and intra-document repetition operators.

Two more LLM-training-data quality passes over the ``documents`` table
(complementing dedup.py's cross-document near-dup families):

- **decontamination**: find training documents that share word-n-grams
  with an evaluation/benchmark set — the standard contamination check
  (GPT-3 used 13-gram overlap; the fixture docs average ~60 words, so
  n=5 keeps the check meaningful at test scale). The eval set here is
  the deterministic slice ``doc_id % 20 == 0``; in production it is a
  separate (small) benchmark corpus.
- **repetition**: fraction of repeated word-3-grams inside each
  document — the Gopher-style "excessive repetition" quality signal
  that catches boilerplate/spam pages cheaply before model scoring.

Scale shape: both are map-only over the corpus until a shuffle on
8-byte n-gram hashes (never on text). The eval side of the
decontamination join is tiny by construction (benchmarks are MBs,
corpora are TBs), so Spark broadcasts it and the whole check costs one
scan of the training corpus. Repetition never shuffles at all.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cost_of_living_data_etl_spark.plans.catalog import register
from cost_of_living_data_etl_spark.sources.tables import load_table

NGRAM_N = 5  # decontamination n-gram width
REP_N = 3  # repetition n-gram width
EVAL_MOD = 20  # doc_id % EVAL_MOD == 0 → eval-set member
HASH_P = 2_147_483_647  # same 61-bit md5 → mod-P hash as dedup.py


def _word_ngrams_spark(n: int) -> str:
    """Word n-grams (WITH duplicates) over bound cols `t` (trimmed
    text) and `ws` (word array); short docs fall back to whole-text —
    same convention as dedup.shingle_docs so the families compose."""
    return f"""
    CASE WHEN size(ws) < {n} THEN array(t)
         ELSE transform(sequence(1, size(ws) - {n - 1}),
                        i -> concat_ws(' ', slice(ws, i, {n})))
    END
    """


def _word_ngrams_sql(n: int) -> str:
    ws = r"string_split_regex(trim(text), '\s+')"
    return f"""
    CASE WHEN length({ws}) < {n} THEN [trim(text)]
         ELSE list_transform(range(1, greatest(length({ws}) - {n - 1}, 0) + 1),
                             i -> array_to_string({ws}[CAST(i AS INT):CAST(i + {n - 1} AS INT)], ' '))
    END
    """


_HASH_LAMBDA_SPARK = (
    f"cast(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT) % {HASH_P}"
)
_HASH_SQL = f"CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) % {HASH_P}"


def ngram_hashes(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, hset): distinct hashed word-n-grams per document.

    One md5 per n-gram, array-native (no explode before the hash): the
    corpus-side pass stays inside one whole-stage-codegen projection.
    """
    return (
        docs.select("doc_id", F.trim(F.col("text")).alias("t"))
        .select("doc_id", "t", F.split("t", r"\s+").alias("ws"))
        .selectExpr(
            "doc_id",
            f"array_distinct(transform({_word_ngrams_spark(n)}, "
            f"g -> {_HASH_LAMBDA_SPARK})) AS hset",
        )
    )


_DECONTAM_ORACLE = f"""
WITH grams AS (
    SELECT doc_id,
           list_distinct(list_transform({_word_ngrams_sql(NGRAM_N)},
                                        g -> {_HASH_SQL})) AS hset
    FROM documents
),
eval_hashes AS (
    SELECT DISTINCT unnest(hset) AS h FROM grams WHERE doc_id % {EVAL_MOD} = 0
),
train AS (
    SELECT doc_id, unnest(hset) AS h, length(hset) AS n_ngrams
    FROM grams WHERE doc_id % {EVAL_MOD} <> 0
)
SELECT
    CAST(t.doc_id AS BIGINT)   AS doc_id,
    CAST(any_value(t.n_ngrams) AS BIGINT) AS n_ngrams,
    CAST(count(*) AS BIGINT)   AS n_shared,
    count(*) * 1.0 / any_value(t.n_ngrams) AS contam_rate
FROM train t JOIN eval_hashes e ON t.h = e.h
GROUP BY t.doc_id
"""


@register("q_decontaminate_ngram", oracle=_DECONTAM_ORACLE, tags=("text", "decontam"))
def q_decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs sharing ≥1 word-5-gram with the eval slice
    (doc_id % 20 == 0), with overlap counts and contamination rate.

    The eval n-gram set is deduped then BROADCAST — at 100 TB the
    benchmark side is still only MBs of hashes, so the contamination
    scan is map-only over the corpus: hash n-grams in-place, explode,
    probe the broadcast hash set, partial-agg per doc. No shuffle of
    corpus text ever happens; the only full-width aggregate runs on
    (doc_id, count) pairs.

    The hashed gram table is persisted because both the eval and train
    branches consume it — without the cache the interpreter-bound
    n-gram hashing pass (higher-order ``transform`` doesn't codegen)
    runs twice, doubling the dominant cost. At 100 TB the same role is
    played by checkpointing the gram table to parquet.
    """
    from pyspark import StorageLevel

    grams = ngram_hashes(
        load_table(spark, sf_dir, "documents", parallel=True), NGRAM_N
    ).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    is_eval = F.col("doc_id") % EVAL_MOD == 0

    eval_hashes = (
        grams.filter(is_eval)
        .select(F.explode("hset").alias("h"))
        .distinct()
    )
    train = grams.filter(~is_eval).select(
        "doc_id", F.size("hset").alias("n_ngrams"), F.explode("hset").alias("h")
    )
    return (
        train.join(F.broadcast(eval_hashes), "h")
        .groupBy("doc_id")
        .agg(
            F.first("n_ngrams").alias("n_ngrams"),
            F.count(F.lit(1)).alias("n_shared"),
        )
        .withColumn("contam_rate", F.col("n_shared") / F.col("n_ngrams"))
        .select(
            F.col("doc_id").cast("long"),
            F.col("n_ngrams").cast("long"),
            F.col("n_shared").cast("long"),
            "contam_rate",
        )
    )


_REPETITION_ORACLE = f"""
WITH g AS (
    SELECT doc_id, source, {_word_ngrams_sql(REP_N)} AS grams FROM documents
)
SELECT
    source,
    CAST(count(*) AS BIGINT) AS n_docs,
    avg(1.0 - length(list_distinct(grams)) * 1.0 / length(grams)) AS avg_rep_ratio,
    max(1.0 - length(list_distinct(grams)) * 1.0 / length(grams)) AS max_rep_ratio
FROM g
GROUP BY source
"""


@register("q_text_repetition", oracle=_REPETITION_ORACLE, tags=("text", "quality"))
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signal: fraction of duplicated word
    3-grams per document, aggregated per source (avg + worst doc).

    Entirely map-side (array ops in one projection) + one short-key
    aggregate on `source` — the cheapest possible quality feature at
    100 TB. Documents shorter than 3 words have one whole-text "gram"
    and a ratio of 0, matching the shingle fallback convention.
    """
    docs = load_table(spark, sf_dir, "documents")
    rep = (
        docs.select("doc_id", "source", F.trim(F.col("text")).alias("t"))
        .select("doc_id", "source", "t", F.split("t", r"\s+").alias("ws"))
        .selectExpr(
            "source",
            f"element_at(transform(array({_word_ngrams_spark(REP_N)}), grams -> "
            "1.0 - size(array_distinct(grams)) / cast(size(grams) AS DOUBLE)"
            "), 1) AS rep_ratio",
        )
    )
    return rep.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("rep_ratio").alias("avg_rep_ratio"),
        F.max("rep_ratio").alias("max_rep_ratio"),
    )


CONTAIN_FLAG = 0.2  # train docs covering ≥20% of an eval doc's grams

_CONTAINMENT_ORACLE = f"""
WITH grams AS (
    SELECT doc_id,
           list_distinct(list_transform({_word_ngrams_sql(NGRAM_N)},
                                        g -> {_HASH_SQL})) AS hset
    FROM documents
),
ev AS (
    SELECT doc_id AS eval_id, length(hset) AS n_eval, unnest(hset) AS h
    FROM grams WHERE doc_id % {EVAL_MOD} = 0
),
tr AS (
    SELECT doc_id AS train_id, unnest(hset) AS h
    FROM grams WHERE doc_id % {EVAL_MOD} <> 0
),
pairs AS (
    SELECT t.train_id, e.eval_id,
           any_value(e.n_eval) AS n_eval, count(*) AS n_shared
    FROM tr t JOIN ev e ON t.h = e.h
    GROUP BY t.train_id, e.eval_id
),
scored AS (
    SELECT *, n_shared / CAST(n_eval AS DOUBLE) AS containment FROM pairs
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY eval_id ORDER BY containment DESC, train_id
    ) AS rk
    FROM scored
),
flags AS (
    SELECT eval_id,
           CAST(count(*) FILTER (WHERE containment >= {CONTAIN_FLAG}) AS BIGINT)
             AS n_flagged
    FROM scored GROUP BY eval_id
)
SELECT CAST(r.eval_id AS BIGINT)  AS eval_doc_id,
       CAST(r.train_id AS BIGINT) AS best_train_doc_id,
       r.containment              AS best_containment,
       f.n_flagged                AS n_flagged
FROM ranked r JOIN flags f USING (eval_id)
WHERE r.rk = 1
"""


@register(
    "q_decontam_containment",
    oracle=_CONTAINMENT_ORACLE,
    tags=("text", "decontam", "containment"),
)
def q_decontam_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded decontamination: for each eval document, the single
    training document covering the largest fraction of its n-gram set
    (containment = |shared grams| / |eval grams|), plus how many
    training docs cross the {CONTAIN_FLAG} flag line.

    Binary overlap (q_decontaminate_ngram) answers "is anything
    shared?"; containment answers "is the benchmark ITSELF leaked?" —
    a near-copy of an eval item scores ~1.0 even when it shares few
    grams with the rest of the corpus. Scale shape: the eval gram side
    is broadcast (benchmarks are MBs), the only shuffles carry
    (train_id, eval_id) id pairs and their counts, and the per-eval
    argmax is a window over |eval|·candidates rows — corpus text never
    shuffles.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    grams = ngram_hashes(
        load_table(spark, sf_dir, "documents", parallel=True), NGRAM_N
    ).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    ev = grams.filter(is_eval).select(
        F.col("doc_id").alias("eval_id"),
        F.size("hset").alias("n_eval"),
        F.explode("hset").alias("h"),
    )
    tr = grams.filter(~is_eval).select(
        F.col("doc_id").alias("train_id"), F.explode("hset").alias("h")
    )
    scored = (
        tr.join(F.broadcast(ev), "h")
        .groupBy("train_id", "eval_id")
        .agg(F.first("n_eval").alias("n_eval"), F.count(F.lit(1)).alias("n_shared"))
        .withColumn("containment", F.col("n_shared") / F.col("n_eval").cast("double"))
    )
    w = Window.partitionBy("eval_id").orderBy(F.desc("containment"), F.asc("train_id"))
    ranked = scored.withColumn("rk", F.row_number().over(w))
    flags = scored.groupBy("eval_id").agg(
        F.count_if(F.col("containment") >= CONTAIN_FLAG).alias("n_flagged")
    )
    return (
        ranked.filter(F.col("rk") == 1)
        .join(flags, "eval_id")
        .select(
            F.col("eval_id").cast("long").alias("eval_doc_id"),
            F.col("train_id").cast("long").alias("best_train_doc_id"),
            F.col("containment").alias("best_containment"),
            "n_flagged",
        )
    )


# --- semantic (embedding-space) decontamination ----------------------------
# n-gram overlap misses paraphrased benchmark leakage; the embedding
# check catches semantic near-copies: a train doc whose vector sits too
# close to ANY eval vector is flagged. Threshold calibrated to the
# fixture corpus (random-ish embeddings: best cross-slice cosine ≈0.49,
# p99 ≈0.43 — 0.40 flags the suspicious tail); production tunes it on a
# labeled contamination sample.

SEM_TAU = 0.40  # flag train vectors with best eval-cosine ≥ this


@register(
    "q_semantic_decontam",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS emb,
               sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        FROM embeddings
    ),
    ev AS (SELECT vec_id AS eval_id, emb AS eemb, norm AS enorm
           FROM e WHERE vec_id % {EVAL_MOD} = 0),
    tr AS (SELECT vec_id AS train_id, label, emb, norm
           FROM e WHERE vec_id % {EVAL_MOD} <> 0),
    cand AS (
        SELECT tr.train_id, tr.label, ev.eval_id,
               list_inner_product(tr.emb, ev.eemb) / (tr.norm * ev.enorm) AS c,
               row_number() OVER (
                   PARTITION BY tr.train_id
                   ORDER BY list_inner_product(tr.emb, ev.eemb) / (tr.norm * ev.enorm) DESC,
                            ev.eval_id
               ) AS rn
        FROM tr, ev
    )
    SELECT CAST(train_id AS BIGINT) AS train_id,
           CAST(label AS INT)       AS train_label,
           CAST(eval_id AS BIGINT)  AS eval_id,
           c                        AS cos_sim
    FROM cand WHERE rn = 1 AND c >= {SEM_TAU}
    """,
    tags=("decontam", "similarity", "training-data"),
)
def q_semantic_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination: train vectors whose
    best cosine against the eval slice crosses SEM_TAU, with the eval
    doc that matched. The semantic complement of q_decontaminate_ngram
    / q_decontam_containment — paraphrased leakage shares no 5-grams
    but still embeds next to its source.

    Shape (same discipline as q_hard_negative_mining): the eval side is
    tiny by construction (benchmarks are MBs) and broadcasts; the train
    corpus is a map-only cosine pass; the per-train-vector best match
    is a partial aggregate (max over a (cos, -eval_id) struct — ties
    break to the smallest eval_id inside the aggregate, the oracle's
    row_number states the same choice), so the shuffle carries one
    struct per train vector per partition, never raw vectors. The
    SEM_TAU filter then bounds output to the contaminated tail. At
    100 TB: identical plan; if the benchmark suite itself grows past
    broadcast size, route the probe through q_ann_ivf_probe cells
    instead of the flat broadcast.

    Cosines use the shared left-fold dot product (operators/similarity
    _DOT ≡ DuckDB list_inner_product), so both engines rank and filter
    on bit-identical doubles.
    """
    from cost_of_living_data_etl_spark.operators.similarity import (
        cosine_expr,
        with_norm,
    )

    # parallel=True on the TRAIN side only (round 9): the
    # |train|×|eval| interpreted fold dot products are the dominant
    # serial kernel; the per-train best match is a struct-max
    # (order-free) and the cosine is a deterministic per-pair
    # expression, so the re-key is parity-safe (measured 1.49→0.59 s
    # interleaved). The broadcast eval slice stays on the plain scan —
    # re-keying a frame that is about to be collected for broadcast is
    # pure cost.
    ev = with_norm(load_table(spark, sf_dir, "embeddings")).filter(
        F.col("vec_id") % EVAL_MOD == 0
    ).select(
        F.col("vec_id").alias("eval_id"),
        F.col("embedding").alias("eemb"),
        F.col("norm").alias("enorm"),
    )
    tr = with_norm(
        load_table(spark, sf_dir, "embeddings", parallel=True)
    ).filter(F.col("vec_id") % EVAL_MOD != 0)
    cand = tr.crossJoin(F.broadcast(ev)).select(
        F.col("vec_id").alias("train_id"),
        F.col("label"),
        F.struct(
            cosine_expr("embedding", "eemb", "norm", "enorm").alias("cos"),
            (-F.col("eval_id")).alias("eval_id_neg"),
        ).alias("c"),
    )
    best = cand.groupBy("train_id", "label").agg(F.max("c").alias("b"))
    return best.filter(F.col("b.cos") >= SEM_TAU).select(
        F.col("train_id").cast("long").alias("train_id"),
        F.col("label").cast("int").alias("train_label"),
        (-F.col("b.eval_id_neg")).cast("long").alias("eval_id"),
        F.col("b.cos").alias("cos_sim"),
    )
