"""Round-6 late additions (second block, registered after round6).

Four operators, keeping the round-6 cap intact: 36 pending + 10
(round6) + 4 (here) = 50 = the driver's unverified-first sample, so
this round's CORRECTNESS sweep still closes the whole catalog.

1. MMR diversified top-k — maximal-marginal-relevance reranking over
   the exact-cosine candidate pool: the retrieval-diversity operator
   (RAG context building, eval-set curation) the ANN family
   (brute/IVF/PQ/RRF/matryoshka) doesn't cover. Greedy selection is
   unrolled to a fixed K so BOTH engines execute the identical
   argmax-per-step plan.
2. Corpus distinct-n diversity — corpus-level distinct-1/2/3-gram
   ratios per source (the NLG "distinct-n" degeneracy metric at corpus
   grain). Complements q_text_repetition (WITHIN-doc duplication) and
   q_vocab_saturation (unigram richness estimators): this is the
   cross-doc n-gram diversity a mixture designer reads to spot
   template-generated or self-repetitive sources.
3. Padding-waste buckets — length-bucketed batching efficiency:
   pad-to-power-of-2 slot waste per bucket, the dynamic-batching
   alternative that q_pack_sequences' bin-packing is compared against
   when choosing a pretraining batching policy.
4. Pairwise source unigram JSD — Jensen-Shannon divergence (bits)
   between sources' unigram distributions: the distributional
   redundancy matrix for mixture design (DoReMi-style domain
   weighting starts from exactly this kind of divergence table).

Float discipline per the house parity recipes: identical expression
text on both engines, det_sum folds for any data-scale double sum,
integer arithmetic until one final division elsewhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cost_of_living_data_etl_spark.functions.checkpoints import (
    eager_checkpoint,
)
from cost_of_living_data_etl_spark.functions.columns import det_sum
from cost_of_living_data_etl_spark.operators.similarity import (
    cosine_expr,
    with_norm,
)
from cost_of_living_data_etl_spark.plans.catalog import register
from cost_of_living_data_etl_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# 1. MMR diversified top-k
# --------------------------------------------------------------------------

MMR_LAMBDA = 0.7  # relevance weight; (1-λ) = 0.3 diversity weight
MMR_POOL = 12  # exact-cosine candidate pool size
MMR_K = 5  # results returned
MMR_QUERY_ID = 0  # probe vector, same convention as q_ann_bruteforce_topk


def _mmr_oracle() -> str:
    """Unrolled greedy MMR in DuckDB CTEs, one stage per selection.

    Stage i scores every unselected candidate as
    ``λ·rel − (1−λ)·max_{s∈selected} sim(c, s)`` and takes the
    argmax (ties by vec_id) — the exact computation the Spark plan
    performs, so the hash gate verifies the greedy itself.
    """
    head = f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS emb,
               sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        FROM embeddings
    ),
    q AS (SELECT emb AS qemb, norm AS qnorm FROM e WHERE vec_id = {MMR_QUERY_ID}),
    rel AS (
        SELECT e.vec_id,
               list_inner_product(e.emb, q.qemb) / (e.norm * q.qnorm) AS rel
        FROM e, q WHERE e.vec_id <> {MMR_QUERY_ID}
    ),
    cand AS (SELECT * FROM rel ORDER BY rel DESC, vec_id LIMIT {MMR_POOL}),
    cv AS (SELECT c.vec_id, e.emb, e.norm FROM cand c JOIN e USING (vec_id)),
    sims AS (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               list_inner_product(a.emb, b.emb) / (a.norm * b.norm) AS sim
        FROM cv a JOIN cv b ON a.vec_id <> b.vec_id
    ),
    s1 AS (
        SELECT CAST(1 AS BIGINT) AS sel_rank, vec_id, rel AS relevance,
               {MMR_LAMBDA} * rel AS mmr_score
        FROM cand ORDER BY rel DESC, vec_id LIMIT 1
    ),
    sel1 AS (SELECT vec_id FROM s1)"""
    steps = []
    for i in range(2, MMR_K + 1):
        steps.append(f"""
    p{i} AS (
        SELECT c.vec_id, c.rel,
               {MMR_LAMBDA} * c.rel - {round(1 - MMR_LAMBDA, 12)} * max(s.sim) AS score
        FROM cand c
        JOIN sims s ON s.va = c.vec_id
                   AND s.vb IN (SELECT vec_id FROM sel{i - 1})
        WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
        GROUP BY c.vec_id, c.rel
    ),
    s{i} AS (
        SELECT CAST({i} AS BIGINT) AS sel_rank, vec_id, rel AS relevance,
               score AS mmr_score
        FROM p{i} ORDER BY score DESC, vec_id LIMIT 1
    ),
    sel{i} AS (SELECT vec_id FROM sel{i - 1} UNION ALL SELECT vec_id FROM s{i})"""
        )
    union = "\n    UNION ALL ".join(f"SELECT * FROM s{i}" for i in range(1, MMR_K + 1))
    return head + "," + ",".join(steps) + "\n    " + union


@register(
    "q_mmr_diversified_topk",
    oracle=_mmr_oracle(),
    tags=("similarity", "retrieval", "diversity", "topk"),
)
def q_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance top-{MMR_K} for the vec_id=0 probe:
    greedily pick argmax of ``λ·relevance − (1−λ)·max sim to already
    selected`` from the exact-cosine top-{MMR_POOL} pool (first pick
    scores λ·rel — the max over the empty set is 0 by convention).
    Ties break by vec_id. The diversity term is what keeps a RAG
    context window or an eval panel from filling with near-duplicates
    of the single best hit.

    Plan: ONE map-only broadcast-cosine scan feeds a
    TakeOrderedAndProject candidate pool that carries the vectors
    (per-partition heap of {MMR_POOL} wide rows — no second corpus
    scan to re-fetch them); everything after is constant-size
    ({MMR_POOL} candidates, {MMR_POOL}² sims, K unrolled argmax steps
    over tiny frames). The pool, the sim matrix, and each step's
    selected set are localCheckpoint-ed (the SCALE.md §7
    multi-consumer-intermediate rule): without it the unrolled lineage
    re-ran the corpus scan per greedy branch (measured 8.3 s warm at
    sf0.1; ~1.4 s after). At 100 TB the corpus scan is the only
    data-scale stage — exactly the q_ann_bruteforce_topk shape — and
    the greedy is O(K·POOL) regardless of corpus size; for query
    BATCHES the same greedy runs per query-group over grouped
    candidate frames. North-star extension operator (SURVEY.md §2.8
    similarity search); no reference analogue.
    """
    lam = MMR_LAMBDA
    one_minus = round(1 - MMR_LAMBDA, 12)
    e = with_norm(load_table(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") == MMR_QUERY_ID).select(
        F.col("embedding").alias("qemb"), F.col("norm").alias("qnorm")
    )
    rel = (
        e.filter(F.col("vec_id") != MMR_QUERY_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            cosine_expr("embedding", "qemb", "norm", "qnorm").alias("rel"),
            "embedding",
            "norm",
        )
    )
    # The ONE data-scale job: score + pool, vectors carried through the
    # top-k (the per-partition heap holds POOL wide rows) so the pool
    # never re-scans the corpus to recover them. Checkpoint so the K
    # unrolled greedy branches below never re-run this scan either.
    cand = (
        rel.orderBy(F.col("rel").desc(), "vec_id").limit(MMR_POOL).transform(eager_checkpoint)
    )
    a, b = cand.alias("a"), cand.alias("b")
    sims = (
        a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("va"),
            F.col("b.vec_id").alias("vb"),
            cosine_expr("a.embedding", "b.embedding", "a.norm", "b.norm").alias(
                "sim"
            ),
        )
    ).transform(eager_checkpoint)  # POOL² rows, reused by every greedy step
    cand = cand.select("vec_id", "rel")
    selected = (
        cand.orderBy(F.col("rel").desc(), "vec_id")
        .limit(1)
        .select(
            F.lit(1).cast("long").alias("sel_rank"),
            "vec_id",
            F.col("rel").alias("relevance"),
            (F.lit(lam) * F.col("rel")).alias("mmr_score"),
        )
    )
    for i in range(2, MMR_K + 1):
        sel_ids = selected.select("vec_id")
        scored = (
            cand.join(sel_ids, "vec_id", "left_anti")
            .join(
                sims.join(
                    F.broadcast(sel_ids.withColumnRenamed("vec_id", "vb")), "vb"
                )
                .groupBy("va")
                .agg(F.max("sim").alias("max_sim")),
                F.col("vec_id") == F.col("va"),
            )
            .select(
                "vec_id",
                "rel",
                (F.lit(lam) * F.col("rel") - F.lit(one_minus) * F.col("max_sim")).alias(
                    "score"
                ),
            )
        )
        pick = (
            scored.orderBy(F.col("score").desc(), "vec_id")
            .limit(1)
            .select(
                F.lit(i).cast("long").alias("sel_rank"),
                "vec_id",
                F.col("rel").alias("relevance"),
                F.col("score").alias("mmr_score"),
            )
        )
        # ≤K-row frame; checkpointing keeps step i+1's lineage flat
        # instead of recursively re-deriving every earlier pick.
        selected = selected.unionByName(pick).transform(eager_checkpoint)
    return selected


# --------------------------------------------------------------------------
# 2. Corpus distinct-n diversity per source
# --------------------------------------------------------------------------

_DIVERSITY_ORACLE = r"""
WITH ws AS (
    SELECT source,
           list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
    FROM documents
),
g AS (
    SELECT source, n,
           unnest(CASE WHEN length(w) >= n
                  THEN list_transform(
                         range(1, length(w) - n + 2),
                         i -> array_to_string(
                                w[CAST(i AS INT):CAST(i + n - 1 AS INT)], ' '))
                  ELSE [] END) AS gram
    FROM ws, (SELECT unnest(range(1, 4)) AS n)
)
SELECT source,
       CAST(n AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS total_ngrams,
       CAST(count(DISTINCT gram) AS BIGINT) AS distinct_ngrams,
       count(DISTINCT gram) * 1.0 / count(*) AS distinct_ratio
FROM g
GROUP BY source, n
"""


@register(
    "q_distinct_ngram_diversity",
    oracle=_DIVERSITY_ORACLE,
    tags=("text", "diversity", "diagnostics", "training-prep"),
)
def q_distinct_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level distinct-n diversity per source for n ∈ {1,2,3}:
    distinct n-grams / total n-grams over the WHOLE source — the NLG
    "distinct-n" degeneracy metric applied to training data. A
    template-generated source shows a collapsing distinct-2/3 ratio
    long before doc-level dedup fires; q_text_repetition measures
    within-doc duplication, this measures cross-doc sameness.

    Scale: tokenize once per doc, emit (n, gram) pairs map-side,
    ONE shuffle keyed (source, n, gram-ish) for the count-distinct
    partial aggregation — gram strings cross the exchange (like the
    novelty query), so the 100-TB variant swaps grams for 64-bit
    hashes with an identical plan shape. Integer counts, one final
    division. North-star extension (SURVEY.md §2.8 text analysis);
    no reference analogue.
    """
    # parallel=True (round 10): the tokenize + triple-gram explode is
    # the dominant serial kernel on single-split fixtures; outputs are
    # exact counts (count, count_distinct) and one LONG/LONG division —
    # order-insensitive, so the scan re-key is parity-safe. Interleaved
    # A/B: med 1.93 s (off) → 1.39 s (on), −28%. (The sibling novelty
    # query REJECTED the same re-key at +27% — there the
    # groupBy(shingle) exchange dominates, here the 3×-gram explode
    # does.)
    docs = load_table(spark, sf_dir, "documents", parallel=True)

    def grams(n: int) -> str:
        return (
            f"CASE WHEN size(ws) >= {n} THEN "
            f"transform(sequence(1, size(ws) - {n} + 1),"
            f" i -> concat_ws(' ', slice(ws, i, {n})))"
            " ELSE array() END"
        )

    exploded = (
        docs.select(
            "source",
            # drop the phantom '' token an empty/whitespace-only text
            # produces from split (house corpus_prep guard), so empty
            # docs contribute zero n-grams at every n
            F.expr(
                r"filter(split(trim(text), '\\s+'), x -> x != '')"
            ).alias("ws"),
        )
        .select(
            "source",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(n).cast("long").alias("n"),
                            F.expr(grams(n)).alias("grams"),
                        )
                        for n in (1, 2, 3)
                    ]
                )
            ).alias("g"),
        )
        .select("source", F.col("g.n").alias("n"), F.explode("g.grams").alias("gram"))
    )
    return exploded.groupBy("source", "n").agg(
        F.count(F.lit(1)).cast("long").alias("total_ngrams"),
        F.countDistinct("gram").cast("long").alias("distinct_ngrams"),
        (F.countDistinct("gram") * F.lit(1.0) / F.count(F.lit(1))).alias(
            "distinct_ratio"
        ),
    )


# --------------------------------------------------------------------------
# 3. Padding-waste buckets (length-bucketed batching efficiency)
# --------------------------------------------------------------------------

_PADDING_ORACLE = r"""
WITH t AS (
    SELECT CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE length(string_split_regex(trim(text), '\s+')) END
           AS BIGINT) AS n_tokens
    FROM documents
),
b AS (
    SELECT n_tokens,
           CASE WHEN n_tokens <= 1 THEN CAST(1 AS BIGINT)
                ELSE CAST(1 AS BIGINT) << length(bin(n_tokens - 1)) END
             AS bucket_cap
    FROM t
)
SELECT bucket_cap,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS token_sum,
       CAST(count(*) * bucket_cap AS BIGINT) AS slot_sum,
       CAST(count(*) * bucket_cap - sum(n_tokens) AS BIGINT) AS padding_tokens,
       (count(*) * bucket_cap - sum(n_tokens)) * 1.0
         / (count(*) * bucket_cap) AS waste_frac
FROM b
GROUP BY bucket_cap
"""


@register(
    "q_padding_waste_buckets",
    oracle=_PADDING_ORACLE,
    tags=("training-prep", "tokens", "batching"),
)
def q_padding_waste_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching waste: pad every doc to the next
    power-of-2 token length and report slots, padding tokens, and the
    waste fraction per bucket — the numbers that decide between
    bucketed dynamic batching and q_pack_sequences-style packing for
    a pretraining run (packing wastes ~0 but splits docs; bucketing
    keeps docs intact at the cost measured here).

    The bucket cap is computed in INTEGER arithmetic on both engines
    (bit-length of n_tokens−1, then a shift) — no float log2 at the
    exact-power-of-two boundaries. Map-only until a
    |buckets|-cardinality aggregate; integer sums, one division.
    North-star extension (SURVEY.md §2.8 training-data prep); no
    reference analogue.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.selectExpr(
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0"
        r" ELSE size(split(trim(text), '\\s+')) END AS BIGINT) AS n_tokens"
    )
    b = t.selectExpr(
        "n_tokens",
        "CASE WHEN n_tokens <= 1 THEN CAST(1 AS BIGINT)"
        " ELSE shiftleft(CAST(1 AS BIGINT), length(bin(n_tokens - 1)))"
        " END AS bucket_cap",
    )
    cap = F.col("bucket_cap")  # grouping key, directly referencable
    return b.groupBy("bucket_cap").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("token_sum"),
        (F.count(F.lit(1)) * cap).cast("long").alias("slot_sum"),
        (F.count(F.lit(1)) * cap - F.sum("n_tokens"))
        .cast("long")
        .alias("padding_tokens"),
        (
            (F.count(F.lit(1)) * cap - F.sum("n_tokens"))
            * F.lit(1.0)
            / (F.count(F.lit(1)) * cap)
        ).alias("waste_frac"),
    )


# --------------------------------------------------------------------------
# 4. Pairwise source unigram Jensen-Shannon divergence
# --------------------------------------------------------------------------

_JSD_ORACLE = r"""
WITH w AS (
    SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS word
    FROM documents
),
c AS (SELECT source, word, CAST(count(*) AS BIGINT) AS cnt
      FROM w WHERE word <> '' GROUP BY source, word),
tot AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS total FROM c GROUP BY source),
p AS (
    SELECT c.source, c.word, c.cnt * 1.0 / tot.total AS p
    FROM c JOIN tot ON c.source = tot.source
),
terms AS (
    SELECT a.source AS source_a, b.source AS source_b,
           a.p * log2(a.p / (a.p + b.p)) + b.p * log2(b.p / (a.p + b.p)) AS term
    FROM p a JOIN p b ON a.word = b.word AND a.source < b.source
)
SELECT source_a, source_b,
       CAST(count(*) AS BIGINT) AS n_shared_words,
       1.0 + 0.5 * list_reduce(list_sort(list(term)), (x, y) -> x + y) AS jsd_bits
FROM terms
GROUP BY source_a, source_b
"""


@register(
    "q_source_unigram_jsd",
    oracle=_JSD_ORACLE,
    tags=("text", "mixture-design", "divergence", "training-prep"),
)
def q_source_unigram_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence (bits, base-2, in [0,1]) between every
    source pair's unigram distributions — the distributional
    redundancy matrix a mixture designer reads next to the dup-flow
    matrix: near-0 JSD says two sources are interchangeable mass,
    near-1 says they cover disjoint vocabulary (DoReMi-style domain
    weighting starts from such a table).

    Uses the identity JSD = 1 + ½·Σ_{w: both>0} [p·log2(p/(p+q)) +
    q·log2(q/(p+q))] — words unique to one source contribute exactly
    their mass through the leading 1 (since Σp = Σq = 1), so the plan
    needs only an INNER self-join on shared words, never an outer
    join. Pairs sharing zero words are omitted (their JSD is exactly
    1). Shuffles are vocabulary-bounded: (source, word) counts are
    partial-aggregated map-side; the word self-join carries
    |V|·k²/2 rows worst case for k sources. The per-pair double sum
    is det_sum-folded for oracle replay. North-star extension
    (SURVEY.md §2.8 text analysis / mixture design); no reference
    analogue.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word"),
    ).filter(
        # empty/whitespace-only texts split to [''] — a phantom token
        # that would make two otherwise-disjoint sources "share" a word
        F.col("word")
        != ""
    )
    c = words.groupBy("source", "word").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    tot = c.groupBy("source").agg(F.sum("cnt").cast("long").alias("total"))
    p = c.join(tot, "source").select(
        "source", "word", (F.col("cnt") * F.lit(1.0) / F.col("total")).alias("p")
    )
    a, b = p.alias("a"), p.alias("b")
    terms = a.join(
        b,
        (F.col("a.word") == F.col("b.word"))
        & (F.col("a.source") < F.col("b.source")),
    ).select(
        F.col("a.source").alias("source_a"),
        F.col("b.source").alias("source_b"),
        F.expr(
            "a.p * log2(a.p / (a.p + b.p)) + b.p * log2(b.p / (a.p + b.p))"
        ).alias("term"),
    )
    return terms.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_shared_words"),
        (F.lit(1.0) + F.lit(0.5) * det_sum("term")).alias("jsd_bits"),
    )
