"""Feature-preparation and monitoring operators for training-data
pipelines: retrieval ranking (BM25 + hybrid RRF fusion),
distribution-drift monitoring (PSI), leakage-safe target encoding,
time-series resampling (weekly OHLC), and column data profiling.

These extend the reference's snapshot ETL (reference app.py:106-199)
with the ML-adjacent relational work a 100 TB corpus pipeline runs
daily: score documents against a query for retrieval-based curation
(lexically, and fused with the dense ranking), watch a metric's
distribution drift month over month, turn a categorical column into a
numeric feature without target leakage, downsample an event/price
series to a fixed calendar grain, and profile every column's shape
before trusting a new partition.

Cross-engine float determinism (driver hash gate): every fractional
aggregate here either (a) derives from exact integer counts with an
identical IEEE expression on both engines, or (b) folds a sorted
collect_list from 0.0 — the repo's established deterministic-sum
trick (see plans/reshape.py::q_embedding_dim_stats). The sorted-fold
form is the oracle-replay variant; at 100 TB you'd run the plain
partial-agg sum (map-side combine, one shuffle row per group per
mapper) and accept last-ulp drift.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cost_of_living_data_etl_spark.functions.columns import det_sum
from cost_of_living_data_etl_spark.operators.textstats import (
    _WORDS_LOWER_SQL,
    lower_word_array,
)
from cost_of_living_data_etl_spark.plans.catalog import register
from cost_of_living_data_etl_spark.sources.tables import load_table


# --- BM25 document ranking --------------------------------------------------

BM25_TERMS = ("spark", "join", "window")  # fixture-vocabulary query
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 15

# Per-doc BM25 score CTE chain, shared by the ranking query and the
# hybrid-RRF fusion query (oracle side).
_BM25_PERDOC_CTES = f"""d AS (
    SELECT doc_id, {_WORDS_LOWER_SQL} AS ws
    FROM documents
),
corpus AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(ws)) AS DOUBLE) / count(*) AS avgdl
    FROM d
),
tf AS (
    SELECT doc_id, CAST(length(ws) AS BIGINT) AS dl, word,
           CAST(count(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, ws, unnest(ws) AS word FROM d)
    WHERE word IN ('{BM25_TERMS[0]}', '{BM25_TERMS[1]}', '{BM25_TERMS[2]}')
    GROUP BY doc_id, length(ws), word
),
df AS (
    SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY word
),
scored AS (
    SELECT tf.doc_id, tf.word,
           ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
             * ((tf * {BM25_K1 + 1.0}) / (tf + {BM25_K1} * ({1.0 - BM25_B}
                + {BM25_B} * (dl / avgdl)))) AS s
    FROM tf JOIN df USING (word) CROSS JOIN corpus
),
per_doc AS (
    SELECT doc_id,
           coalesce(max(CASE WHEN word = '{BM25_TERMS[0]}' THEN s END), 0.0)
             + coalesce(max(CASE WHEN word = '{BM25_TERMS[1]}' THEN s END), 0.0)
             + coalesce(max(CASE WHEN word = '{BM25_TERMS[2]}' THEN s END), 0.0)
             AS bm25
    FROM scored GROUP BY doc_id
)"""

_BM25_ORACLE = f"""
WITH {_BM25_PERDOC_CTES}
SELECT doc_id, bm25 FROM per_doc
ORDER BY bm25 DESC, doc_id
LIMIT {BM25_TOPK}
"""


def _bm25_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BM25 score (doc_id, bm25) for the fixed query —
    shared by q_bm25_doc_ranking and q_hybrid_rrf_retrieval."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", lower_word_array(F.col("text")).alias("ws"))
    corpus = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (
            F.sum(F.size("ws")).cast("double") / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    tf = (
        d.select("doc_id", F.size("ws").cast("long").alias("dl"),
                 F.explode("ws").alias("word"))
        .filter(F.col("word").isin(*BM25_TERMS))
        .groupBy("doc_id", "dl", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df = tf.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") + F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df), "word")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            "word",
            (idf * ((F.col("tf") * F.lit(BM25_K1 + 1.0)) / norm)).alias("s"),
        )
    )
    term_score = [
        F.coalesce(
            F.max(F.when(F.col("word") == t, F.col("s"))), F.lit(0.0)
        )
        for t in BM25_TERMS
    ]
    return scored.groupBy("doc_id").agg(
        (term_score[0] + term_score[1] + term_score[2]).alias("bm25")
    )


@register(
    "q_bm25_doc_ranking",
    oracle=_BM25_ORACLE,
    tags=("text", "bm25", "retrieval", "training-data"),
)
def q_bm25_doc_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 documents by BM25 score for a fixed 3-term query — the
    retrieval-quality ranking behind query-based corpus curation
    (choose training documents relevant to a target domain) and the
    lexical half of hybrid (BM25 + embedding) search. TF-IDF
    (q_tfidf_top_terms) ranks TERMS per slice; BM25 ranks DOCUMENTS
    per query, with term-frequency saturation (k1) and length
    normalization (b) that plain TF-IDF lacks.

    Scale shape: doc length rides the GROUP BY key (functionally
    dependent on doc_id), so tf needs no join back to a lengths
    table. The shuffle after the query-term filter carries only docs
    containing a query term — at 100 TB with a selective query that
    is a tiny fraction of the corpus, and the filter applies
    pre-aggregation in the scan stage. Corpus stats (2 scalars) and
    per-term df (|terms| rows) broadcast onto the scored rows; the
    final top-k is TakeOrderedAndProject (k rows per partition, no
    global sort). Honest plan audit: ad hoc, the tokenize projection
    executes THREE times (tf branch, the df branch's re-expanded
    lineage, and the corpus-stats scan — Catalyst does not reuse
    uncached subtrees); at 100 TB you'd cache the tokenized
    projection or, better, keep (N, avgdl, df) as maintained corpus
    statistics so queries cost ONE tf pass. The per-doc score pivots
    ≤1 row per (doc, term) and adds the three term scores in fixed
    written order — bit-identical to the oracle.
    """
    return (
        _bm25_per_doc(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(BM25_TOPK)
    )


# --- PSI distribution drift -------------------------------------------------

PSI_BUCKETS = 20
PSI_BUCKET_WIDTH = 25_000.0  # o_totalprice spans ~[1.3k, 500k]
PSI_BASE_YEAR = 1995

_PSI_ORACLE = f"""
WITH b AS (
    SELECT date_trunc('month', o_orderdate) AS month,
           CAST(least(floor(o_totalprice / {PSI_BUCKET_WIDTH}),
                      {PSI_BUCKETS - 1}) AS INT) AS bucket
    FROM orders
),
cur AS (
    SELECT month, bucket, CAST(count(*) AS BIGINT) AS n_cur
    FROM b GROUP BY month, bucket
),
base AS (
    SELECT bucket, CAST(sum(n_cur) AS BIGINT) AS n_base
    FROM cur WHERE year(month) = {PSI_BASE_YEAR} GROUP BY bucket
),
base_tot AS (SELECT CAST(sum(n_base) AS BIGINT) AS tot_base FROM base),
cur_tot AS (
    SELECT month, CAST(sum(n_cur) AS BIGINT) AS tot_cur FROM cur GROUP BY month
),
grid AS (
    SELECT month, CAST(r.range AS INT) AS bucket
    FROM (SELECT DISTINCT month FROM cur) m, range({PSI_BUCKETS}) r
),
terms AS (
    SELECT g.month,
           ((coalesce(c.n_cur, 0) + 1.0) / (t.tot_cur + {PSI_BUCKETS}.0)
            - (coalesce(ba.n_base, 0) + 1.0) / (bt.tot_base + {PSI_BUCKETS}.0))
           * ln(((coalesce(c.n_cur, 0) + 1.0) / (t.tot_cur + {PSI_BUCKETS}.0))
                / ((coalesce(ba.n_base, 0) + 1.0)
                   / (bt.tot_base + {PSI_BUCKETS}.0))) AS term
    FROM grid g
    LEFT JOIN cur c USING (month, bucket)
    LEFT JOIN base ba USING (bucket)
    JOIN cur_tot t USING (month)
    CROSS JOIN base_tot bt
)
SELECT month,
       list_reduce(list_sort(list(term)), (a, x) -> a + x) AS psi
FROM terms GROUP BY month
"""


@register(
    "q_psi_price_drift_by_month",
    oracle=_PSI_ORACLE,
    tags=("drift", "monitoring", "quality", "training-data"),
)
def q_psi_price_drift_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the order-value distribution,
    per month vs the {PSI_BASE_YEAR} baseline — the standard drift
    monitor a data pipeline runs on every refresh (feature drift,
    source-mix shift, upstream schema accidents show up here first).
    PSI = Σ_buckets (p_cur − p_base)·ln(p_cur/p_base) over fixed-width
    value buckets with Laplace smoothing (so empty buckets are
    defined); > 0.25 conventionally flags a shift worth blocking on.

    Scale shape: bucketization is arithmetic on the scanned column
    (no UDF); counts partial-aggregate map-side on (month, bucket) —
    the shuffle is bounded by |months|×|buckets| regardless of row
    count, and EVERYTHING downstream (baseline, month grid, totals,
    the PSI fold) derives from that first `cur` aggregate, so no
    later stage touches raw rows. Measured plan note: AQE collapses
    the identical cur-exchange branches via ReusedExchange; branches
    whose column pruning alters the subtree still rescan ad hoc — a
    production run caches cur (≤ |months|×20 rows) and pays exactly
    one scan. The dense month×bucket grid explodes a 20-element
    literal sequence against the distinct months (tiny), and the
    baseline histogram (≤20 rows) broadcasts.
    The 20-term PSI sum folds in sorted order on both engines —
    bit-identical; at 100 TB the same plan holds because everything
    after the first aggregate operates on |months|×20 rows.
    """
    orders = load_table(spark, sf_dir, "orders")
    b = orders.select(
        F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        F.least(
            F.floor(F.col("o_totalprice") / F.lit(PSI_BUCKET_WIDTH)),
            F.lit(PSI_BUCKETS - 1),
        ).cast("int").alias("bucket"),
    )
    cur = b.groupBy("month", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_cur")
    )
    base = (
        cur.filter(F.year("month") == PSI_BASE_YEAR)
        .groupBy("bucket")
        .agg(F.sum("n_cur").cast("long").alias("n_base"))
    )
    base_tot = base.agg(F.sum("n_base").cast("long").alias("tot_base"))
    cur_tot = cur.groupBy("month").agg(
        F.sum("n_cur").cast("long").alias("tot_cur")
    )
    grid = (
        cur.select("month").distinct()
        .select(
            "month",
            F.explode(F.sequence(F.lit(0), F.lit(PSI_BUCKETS - 1))).alias("bucket0"),
        )
        .select("month", F.col("bucket0").cast("int").alias("bucket"))
    )
    smooth = F.lit(float(PSI_BUCKETS))
    p_cur = (F.coalesce(F.col("n_cur"), F.lit(0)) + F.lit(1.0)) / (
        F.col("tot_cur") + smooth
    )
    p_base = (F.coalesce(F.col("n_base"), F.lit(0)) + F.lit(1.0)) / (
        F.col("tot_base") + smooth
    )
    terms = (
        grid.join(cur, ["month", "bucket"], "left")
        .join(F.broadcast(base), ["bucket"], "left")
        .join(cur_tot, ["month"])
        .crossJoin(F.broadcast(base_tot))
        .select("month", ((p_cur - p_base) * F.log(p_cur / p_base)).alias("term"))
    )
    return terms.groupBy("month").agg(det_sum("term").alias("psi"))


# --- leakage-safe target encoding -------------------------------------------

TE_MONTH = "1995-03"
TE_SMOOTH = 10.0


def _te_bounds() -> tuple[str, str]:
    """[start, end) timestamps of TE_MONTH — derived in ONE place so
    changing TE_MONTH can never leave a stale end bound."""
    import datetime as _dt

    start = _dt.date.fromisoformat(f"{TE_MONTH}-01")
    end = (start.replace(day=28) + _dt.timedelta(days=4)).replace(day=1)
    return start.isoformat(), end.isoformat()


TE_START, TE_END = _te_bounds()

_TE_ORACLE = f"""
WITH rows_in AS (
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{TE_START}'
      AND o_orderdate < TIMESTAMP '{TE_END}'
),
cat AS (
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_c,
           list_reduce(list_sort(list(o_totalprice)), (a, x) -> a + x) AS s_c
    FROM rows_in GROUP BY o_orderpriority
),
g_all AS (
    SELECT CAST(count(*) AS BIGINT) AS n_all,
           list_reduce(list_sort(list(o_totalprice)), (a, x) -> a + x) AS s_all
    FROM rows_in
)
SELECT r.o_orderkey, r.o_orderpriority, r.o_totalprice,
       CASE WHEN c.n_c > 1
            THEN (c.s_c - r.o_totalprice) / (c.n_c - 1)
            ELSE ga.s_all / ga.n_all END AS loo_enc,
       (c.s_c - r.o_totalprice + {TE_SMOOTH} * (ga.s_all / ga.n_all))
         / (c.n_c - 1 + {TE_SMOOTH}) AS smooth_enc
FROM rows_in r
JOIN cat c USING (o_orderpriority)
CROSS JOIN g_all ga
"""


@register(
    "q_target_encoding_loo",
    oracle=_TE_ORACLE,
    tags=("feature-prep", "encoding", "leakage", "training-data"),
)
def q_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of order priority against order
    value (one month of orders): each row's categorical feature
    becomes the mean target of OTHER rows in its category —
    `(S_c − own) / (n_c − 1)` — plus a prior-smoothed variant
    `(S_c − own + m·μ) / (n_c − 1 + m)`. Excluding the row's own
    target is the leakage control (naive category means let the model
    read its own label through the feature; the same concern
    q_leakage_safe_split_by_source handles at split grain, handled
    here at row grain).

    Scale shape: per-category sums partial-aggregate to |categories|
    rows, which broadcast back onto the row stream along with the two
    global scalars — encoding is then a map-side expression; no
    shuffle of the fact rows at any point, so the plan is unchanged at
    100 TB. The month filter is pushed to the parquet scan
    (PushedFilters). Sums fold sorted (bit-identical to the oracle);
    the production form is a plain partial-agg sum.
    """
    orders = load_table(spark, sf_dir, "orders")
    rows_in = orders.filter(
        (F.col("o_orderdate") >= F.lit(TE_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(TE_END).cast("timestamp"))
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")
    cat = rows_in.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_c"),
        det_sum("o_totalprice").alias("s_c"),
    )
    glob = rows_in.agg(
        F.count(F.lit(1)).cast("long").alias("n_all"),
        det_sum("o_totalprice").alias("s_all"),
    )
    mu = F.col("s_all") / F.col("n_all")
    loo = F.when(
        F.col("n_c") > 1,
        (F.col("s_c") - F.col("o_totalprice")) / (F.col("n_c") - 1),
    ).otherwise(mu)
    smooth = (
        F.col("s_c") - F.col("o_totalprice") + F.lit(TE_SMOOTH) * mu
    ) / (F.col("n_c") - 1 + F.lit(TE_SMOOTH))
    return (
        rows_in.join(F.broadcast(cat), "o_orderpriority")
        .crossJoin(F.broadcast(glob))
        .select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            loo.alias("loo_enc"),
            smooth.alias("smooth_enc"),
        )
    )


# --- weekly OHLC resample ---------------------------------------------------

_OHLC_ORACLE = """
WITH w AS (
    SELECT date_trunc('week', o_orderdate) AS week,
           o_totalprice AS p, o_orderdate AS d, o_orderkey AS k
    FROM orders
),
r AS (
    SELECT week, p,
           row_number() OVER (PARTITION BY week ORDER BY d ASC,  k ASC)  AS rf,
           row_number() OVER (PARTITION BY week ORDER BY d DESC, k DESC) AS rl
    FROM w
)
SELECT week,
       CAST(count(*) AS BIGINT)          AS n_orders,
       max(CASE WHEN rf = 1 THEN p END)  AS open_price,
       max(p)                            AS high_price,
       min(p)                            AS low_price,
       max(CASE WHEN rl = 1 THEN p END)  AS close_price
FROM r GROUP BY week
"""


@register(
    "q_ohlc_weekly_orders",
    oracle=_OHLC_ORACLE,
    tags=("time-series", "resample", "ohlc", "agg"),
)
def q_ohlc_weekly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly OHLC resample of the order-value series: per ISO week,
    the first/highest/lowest/last order value plus count — the
    classic downsample-to-calendar-grain operator (metrics dashboards,
    financial bars, telemetry rollups). The reference has no temporal
    rollup at all (its snapshots are point-in-time, app.py:57); this
    is the generalization of q_monthly_order_extremes from
    value-extremes to SEQUENCE-extremes (first/last by event time).

    Scale shape: open/close are `min/max(struct(event_time, key,
    value))` ARG-EXTREMUM AGGREGATES, not window ranks — partial
    aggregation keeps one candidate per week per mapper, so a hot week
    costs one shuffle row per mapper instead of shuffling every row to
    one task (same rationale as q_monthly_order_extremes; the oracle
    replays the semantics with window ranks). Ties on timestamp break
    deterministically on the unique order key via lexicographic struct
    comparison. Shuffle cardinality: |weeks| × partitions.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = orders.select(
        F.date_trunc("week", F.col("o_orderdate")).alias("week"),
        F.col("o_totalprice").alias("p"),
        F.col("o_orderdate").alias("d"),
        F.col("o_orderkey").alias("k"),
    )
    first = F.min(F.struct("d", "k", "p"))
    last = F.max(F.struct("d", "k", "p"))
    return w.groupBy("week").agg(
        F.count(F.lit(1)).alias("n_orders"),
        first.getField("p").alias("open_price"),
        F.max("p").alias("high_price"),
        F.min("p").alias("low_price"),
        last.getField("p").alias("close_price"),
    )


# --- hybrid retrieval: reciprocal-rank fusion -------------------------------

RRF_K = 60          # standard RRF damping constant
RRF_CAND = 50       # per-ranker candidate depth
RRF_TOPK = 20
RRF_QUERY_VEC = 0   # query = embedding of vec_id 0 (ANN-suite convention)

_RRF_ORACLE = f"""
WITH {_BM25_PERDOC_CTES},
bm25_top AS (
    SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_bm25
    FROM (
        SELECT doc_id, bm25 FROM per_doc
        WHERE doc_id <> {RRF_QUERY_VEC}
        ORDER BY bm25 DESC, doc_id LIMIT {RRF_CAND}
    )
),
e AS (
    SELECT vec_id, embedding::DOUBLE[] AS emb,
           sqrt(list_reduce(list_transform(list_zip(embedding::DOUBLE[], embedding::DOUBLE[]), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (acc, v) -> acc + v))
             AS norm
    FROM embeddings
),
q AS (SELECT emb AS qemb, norm AS qnorm FROM e WHERE vec_id = {RRF_QUERY_VEC}),
cos_top AS (
    SELECT vec_id AS doc_id,
           row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS r_cos
    FROM (
        SELECT e.vec_id,
               list_reduce(list_transform(list_zip(e.emb, q.qemb), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (acc, v) -> acc + v)
               / (e.norm * q.qnorm) AS cos_sim
        FROM e, q WHERE e.vec_id <> {RRF_QUERY_VEC}
        ORDER BY cos_sim DESC, e.vec_id LIMIT {RRF_CAND}
    )
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       coalesce(1.0 / ({RRF_K} + r_bm25), 0.0)
         + coalesce(1.0 / ({RRF_K} + r_cos), 0.0) AS rrf_score
FROM bm25_top FULL OUTER JOIN cos_top USING (doc_id)
ORDER BY rrf_score DESC, doc_id
LIMIT {RRF_TOPK}
"""


@register(
    "q_hybrid_rrf_retrieval",
    oracle=_RRF_ORACLE,
    tags=("retrieval", "hybrid", "rrf", "similarity", "training-data"),
)
def q_hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion: fuse the BM25
    lexical ranking (fixed 3-term query) with the embedding-cosine
    ranking (query = vector {RRF_QUERY_VEC}, the ANN-suite convention)
    as RRF(d) = Σ_rankers 1/(60 + rank_r(d)) over each ranker's top-50
    — the standard zero-tuning fusion behind hybrid search and
    retrieval-based corpus curation (lexical catches exact
    terminology, dense catches paraphrase; RRF needs no score
    calibration because it only consumes RANKS).

    Scale shape: each ranker independently reduces the corpus to a
    50-row candidate list via TakeOrderedAndProject (k rows per
    partition — no global sort of the corpus); ranks are then assigned
    by a window over ≤50 rows (bounded by the literal candidate depth,
    not data size), the fusion join is a full-outer sort-merge over
    the two 50-row lists (Spark cannot broadcast-hash a keyed full
    outer join; sorting 50 rows is free), and fused scores are
    1/(k+rank) from integer ranks added in fixed order. Rank
    stability: ranks are EXACT integers, so the oracle replays the
    cosine as the SAME left-to-right fold Spark's dot_expr runs
    (list_zip→multiply→list_reduce, seed-equivalent) — bit-identical
    scores, hence identical orderings, with the (score DESC, id)
    tie-break closing the exact-tie case. The cosine side is the
    map-only broadcast-query pattern of q_ann_bruteforce_topk; at 100 TB both
    candidate generators would be index-backed (IVF / posting lists)
    with this exact fusion tail unchanged.
    """
    from pyspark.sql import Window

    from cost_of_living_data_etl_spark.operators.similarity import (
        cosine_expr,
        with_norm,
    )

    bm25_cand = (
        _bm25_per_doc(spark, sf_dir)
        .filter(F.col("doc_id") != RRF_QUERY_VEC)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(RRF_CAND)
    )
    bm25_top = bm25_cand.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), "doc_id"))
        .alias("r_bm25"),
    )

    e = with_norm(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    q = e.filter(F.col("vec_id") == RRF_QUERY_VEC).select(
        F.col("embedding").alias("qemb"), F.col("norm").alias("qnorm")
    )
    cos_cand = (
        e.filter(F.col("vec_id") != RRF_QUERY_VEC)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine_expr("embedding", "qemb", "norm", "qnorm").alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "doc_id")
        .limit(RRF_CAND)
    )
    cos_top = cos_cand.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("cos_sim").desc(), "doc_id"))
        .alias("r_cos"),
    )

    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(RRF_K) + F.col("r_bm25")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("r_cos")), F.lit(0.0))
    return (
        bm25_top.join(cos_top, "doc_id", "full_outer")
        .select(F.col("doc_id").cast("long").alias("doc_id"), rrf.alias("rrf_score"))
        .orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(RRF_TOPK)
    )


# --- column profiling --------------------------------------------------------

PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderpriority",
)

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name,
       (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_rows,
       CAST(count(*) FILTER (WHERE {c} IS NULL) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(count(*) FILTER (WHERE {c} IS NULL) AS DOUBLE)
         / (SELECT count(*) FROM orders) AS null_frac
FROM orders"""
    for c in PROFILE_COLS
)


@register(
    "q_column_profile_orders",
    oracle=_PROFILE_ORACLE,
    tags=("quality", "profiling", "diagnostics"),
)
def q_column_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data profile of the orders table: row count, null
    count, exact distinct count, null fraction — the Deequ /
    Great-Expectations-style profiling pass a pipeline runs on every
    new partition before trusting it (null-rate spikes and distinct
    collapses are the two loudest upstream-breakage signals;
    q_dq_violations_report checks declared CONSTRAINTS, this measures
    the undeclared shape).

    Scale shape: ONE scan — all per-column null counts are conditional
    sums in a single aggregate, and the multi-column exact distincts
    compile to Spark's Expand strategy (|cols|× row expansion, then
    one partial-aggregated shuffle); the output unpivots |cols| rows
    driver-side from a 1-row aggregate. The oracle's 5-scan UNION ALL
    shows what the single-pass form replaces. At 100 TB you swap
    exact count_distinct for approx_count_distinct (HLL, one pass, no
    Expand) — the profile consumer tolerates ±2%: that swap is the
    ``approx_distinct`` guard of SPARK_GRAFT_PROFILE=production
    (profiles.py); parity keeps the exact, oracle-pinnable variant.
    """
    from cost_of_living_data_etl_spark.profiles import active_profile

    orders = load_table(spark, sf_dir, "orders")
    nd = (
        F.approx_count_distinct
        if active_profile().approx_distinct
        else F.count_distinct
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in PROFILE_COLS:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"nulls_{c}")
        )
        aggs.append(nd(F.col(c)).cast("long").alias(f"nd_{c}"))
    one = orders.agg(*aggs)
    stack = ", ".join(
        f"'{c}', nulls_{c}, nd_{c}" for c in PROFILE_COLS
    )
    return one.select(
        F.expr(
            f"stack({len(PROFILE_COLS)}, {stack}) AS (column_name, n_nulls, n_distinct)"
        ),
        "n_rows",
    ).select(
        "column_name",
        "n_rows",
        "n_nulls",
        "n_distinct",
        (F.col("n_nulls").cast("double") / F.col("n_rows")).alias("null_frac"),
    )
