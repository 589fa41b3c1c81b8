"""Round-6 catalog additions (first block; see round6b.py for the
late four).

Ten operators here + four in round6b, deliberately capped (round-5
verdict item 1: ≤14 new registrations so the driver's 50-query
unverified-first sample closes the 36-query backlog this round —
36 + 14 = 50). Registered LAST in plans/all_queries.py for the same
reason.

1-2. Batch twins of the two transformWithStateInPandas operators
     (streaming/events.py::ewma_user_value / user_profile_typed_state)
     — verdict item 5: §2.7's typed-state rows enter the driver hash
     gate, not just pytest. The twins share the streaming kernels'
     constants (EWMA_STREAM_ALPHA, RECENT_K) and fold order
     (ts, event_id), so streaming-final-state == batch-twin is pinned
     by tests/test_streaming.py and the twins' values are
     driver-hash-verified.
3.   n-gram novelty by source — the "how much NEW text does each
     source contribute" curve a training-data mixture designer reads
     before weighting sources.
4.   Differentially-private release of event counts with
     DETERMINISTIC hash-seeded Laplace noise (inverse-CDF on an
     md5-derived uniform) — same mechanism shape as production DP
     releases, but reproducible, so both engines derive the identical
     noised value and the hash gate can verify the mechanism.
5.   Embedding-norm outlier audit per label — the cheap first-pass
     hygiene check before any ANN/semantic stage (broken encoders
     show up as norm outliers long before cosine metrics move).
6.   Johnson-Lindenstrauss distortion audit of the deterministic
     ±1 projection (certifies the 4× cheaper 16-d prefilter distance
     the sign-LSH planes imply).
7.   Directed cross-source duplication-flow matrix — WHICH sources
     feed which with near-dups (provenance for mixture design).
8.   Winnowing (MOSS) span-overlap mining — md5 char-k-gram
     fingerprints with the window-min guarantee; SPAN-level copying
     detection where MinHash sees whole-document sets.
9.   Boilerplate n-gram coverage — repeated-span mass that survives
     doc-level dedup (the CCNet line-dedup pass generalized).
10.  Perplexity-filter retention curve — tokens kept per ppl cutoff,
     the tuning instrument behind every CCNet/Gopher-style LM gate.

Float discipline follows the house parity recipes: shared fold order
on both engines (array_sort / ORDER BY on the same keys), folds
seeded with CAST(0.0 AS DOUBLE), counts cast to BIGINT on both sides,
single-division ratios at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cost_of_living_data_etl_spark.functions.checkpoints import (
    eager_checkpoint,
)
from cost_of_living_data_etl_spark.operators.dedup import (
    _SHINGLES_FROM_WS,
    SHINGLES_SQL,
)
from cost_of_living_data_etl_spark.plans.catalog import register
from cost_of_living_data_etl_spark.sources.tables import load_table
from cost_of_living_data_etl_spark.streaming.events import (
    EWMA_STREAM_ALPHA,
    RECENT_K,
)

# --------------------------------------------------------------------------
# 1. TWS batch twin: lifetime per-user EWMA of event values
# --------------------------------------------------------------------------

_EWMA_TWIN_ORACLE = f"""
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
                        list(value ORDER BY ts, event_id)),
           (acc, x) -> {EWMA_STREAM_ALPHA} * x
                       + {1 - EWMA_STREAM_ALPHA} * acc
       ) AS ewma_value
FROM events
GROUP BY user_id
"""


@register(
    "q_tws_ewma_user_twin",
    oracle=_EWMA_TWIN_ORACLE,
    tags=("streaming-twin", "typed-state", "recurrence"),
)
def q_tws_ewma_user_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/events.py::ewma_user_value: the FINAL
    per-user (n_events, ewma) the TWS ValueState holds after the whole
    events table has streamed through. Same α (EWMA_STREAM_ALPHA),
    same fold order (ts, event_id) — the streaming kernel sorts each
    micro-batch on exactly these keys, and chaining ordered batch
    folds is associative over concatenation, so final streaming state
    == one batch fold (pinned by
    tests/test_streaming.py::test_tws_ewma_final_state_equals_batch_twin).

    Scale: one groupBy(user) — per-key state is the value list for the
    fold; the streaming form is the one that holds O(1) state per key,
    this twin exists to hash-verify the kernel's arithmetic.
    """
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.expr(
            "aggregate("
            "  transform(array_sort(collect_list(struct(ts, event_id, value))),"
            "            s -> s.value),"
            "  CAST(0.0 AS DOUBLE),"
            f"  (acc, x) -> {EWMA_STREAM_ALPHA} * x"
            f"              + {1 - EWMA_STREAM_ALPHA} * acc"
            ")"
        ).alias("ewma_value"),
    )


# --------------------------------------------------------------------------
# 2. TWS batch twin: typed-state user profile (Value+List+Map states)
# --------------------------------------------------------------------------

_PROFILE_TWIN_ORACLE = f"""
WITH vs AS (
    SELECT user_id, list(value ORDER BY ts, event_id) AS v
    FROM events GROUP BY user_id
),
base AS (
    SELECT user_id,
           CAST(length(v) AS BIGINT) AS n_events,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE), v),
                       (a, x) -> a + x) AS total_value,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE), v[-{RECENT_K}:]),
                       (a, x) -> a + x)
               / least(length(v), {RECENT_K}) AS recent_mean
    FROM vs
),
tc AS (
    SELECT user_id, event_type, count(*) AS cnt
    FROM events GROUP BY user_id, event_type
),
top AS (
    SELECT user_id, event_type AS top_type,
           CAST(cnt AS BIGINT) AS top_type_count,
           row_number() OVER (
               PARTITION BY user_id ORDER BY cnt DESC, event_type ASC
           ) AS rn
    FROM tc
),
nt AS (
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_types FROM tc GROUP BY user_id
)
SELECT b.user_id, b.n_events, b.total_value, b.recent_mean,
       nt.n_types, top.top_type, top.top_type_count
FROM base b
JOIN nt USING (user_id)
JOIN top ON top.user_id = b.user_id AND top.rn = 1
"""


@register(
    "q_tws_user_profile_twin",
    oracle=_PROFILE_TWIN_ORACLE,
    tags=("streaming-twin", "typed-state", "profile"),
)
def q_tws_user_profile_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/events.py::user_profile_typed_state —
    the final profile all three TWS state kinds hold after the full
    table streams through: lifetime count + det-ordered value total
    (ValueState), mean of the last RECENT_K values in (ts, event_id)
    order (ListState), distinct-type count and the deterministic top
    type — count desc, name asc (MapState). Equality with the
    streaming operator's last emission per user is pinned by
    tests/test_streaming.py::test_tws_profile_final_state_equals_batch_twin.

    Scale: one groupBy(user) + one groupBy(user, type) + a per-user
    top-1 window on the tiny type rollup; no raw-event re-shuffle
    beyond the two grouped passes.
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    vs = events.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(ts, event_id, value))),"
            " s -> s.value)"
        ).alias("v")
    )
    base = vs.select(
        "user_id",
        F.expr("CAST(size(v) AS BIGINT)").alias("n_events"),
        F.expr(
            "aggregate(v, CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
        ).alias("total_value"),
        F.expr(
            f"aggregate(slice(v, greatest(1, size(v) - {RECENT_K - 1}),"
            f" {RECENT_K}), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
            f" / least(size(v), {RECENT_K})"
        ).alias("recent_mean"),
    )
    tc = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    top = (
        tc.selectExpr(
            "user_id",
            "event_type AS top_type",
            "CAST(cnt AS BIGINT) AS top_type_count",
            "row_number() OVER (PARTITION BY user_id"
            " ORDER BY cnt DESC, event_type ASC) AS rn",
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    nt = tc.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_types")
    )
    return base.join(nt, "user_id").join(top, "user_id")


# --------------------------------------------------------------------------
# 3. n-gram novelty by source: who contributes NEW text?
# --------------------------------------------------------------------------

_NOVELTY_ORACLE = f"""
WITH sh AS (
    SELECT source, doc_id, unnest({SHINGLES_SQL}) AS shingle FROM documents
),
occ AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_shingles
    FROM sh GROUP BY source
),
novel AS (
    SELECT first_source AS source, CAST(count(*) AS BIGINT) AS n_novel
    FROM (
        SELECT shingle, arg_min(source, doc_id) AS first_source
        FROM sh GROUP BY shingle
    ) GROUP BY first_source
),
nd AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY source
)
SELECT nd.source, nd.n_docs, occ.n_shingles,
       CAST(COALESCE(novel.n_novel, 0) AS BIGINT) AS n_novel,
       COALESCE(novel.n_novel, 0) * 1.0 / occ.n_shingles AS novelty_rate
FROM nd JOIN occ USING (source) LEFT JOIN novel USING (source)
"""


@register(
    "q_ngram_novelty_by_source",
    oracle=_NOVELTY_ORACLE,
    tags=("llm-pipeline", "novelty", "mixture-design"),
)
def q_ngram_novelty_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source n-gram novelty: of each source's word-3-gram shingle
    occurrences (the dedup family's shingle recipe, doc-distinct), how
    many are introduced by that doc — i.e. their global first
    occurrence (min doc_id) IS this doc. A source full of boilerplate
    already seen elsewhere scores low; a source of genuinely new text
    scores high — the curve a mixture designer reads before weighting
    sources, complementing q_dedup_inflation_factor (how much is
    duplicated) with WHERE novelty originates.

    Scale shape (rewritten after the first bench draft measured 9.5 s
    at sf0.1 for a join-back formulation): every shingle contributes
    exactly ONE novel occurrence — at its global min doc — so the
    per-source novel count is just "shingles whose min_by(source,
    doc_id) is this source". Two partial aggregations, NO join of two
    exploded-size sides, no window sort: occurrences per source
    (map-side combine) + min_by per shingle (the same groupBy(shingle)
    shuffle class the MinHash build pays) reduced to a |sources|-row
    frame. Counts are exact ints; the single ratio divides two BIGINTs
    once. Measured 9.5 s → 2.2 s warm at sf0.1.
    """
    # Scan re-key tried and REJECTED (round 10): outputs are exact ints
    # + one BIGINT ratio and min_by is a total-order argmin, so
    # parallel=True would be parity-safe — but the interleaved A/B says
    # the groupBy(shingle) exchange dominates and the re-key only adds
    # a shuffle ahead of it: med 1.31 s (off) vs 1.66 s (on), +27%.
    docs = load_table(spark, sf_dir, "documents")
    sh = (
        docs.select("source", "doc_id", F.trim(F.col("text")).alias("t"))
        .select("source", "doc_id", "t", F.split("t", r"\s+").alias("ws"))
        .select(
            "source",
            "doc_id",
            F.explode(F.expr(_SHINGLES_FROM_WS)).alias("shingle"),
        )
    )
    occ = sh.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles")
    )
    novel = (
        sh.groupBy("shingle")
        .agg(F.expr("min_by(source, doc_id)").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_novel"))
    )
    nd = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return (
        nd.join(occ, "source")
        # LEFT join: a source whose every shingle first occurred in an
        # earlier source has NO novel row — it must surface as 0.0
        # novelty, not vanish from the curve (round-6 review catch)
        .join(novel, "source", "left")
        .select(
            "source",
            "n_docs",
            "n_shingles",
            F.coalesce(F.col("n_novel"), F.lit(0)).cast("long").alias("n_novel"),
            (
                F.coalesce(F.col("n_novel"), F.lit(0))
                * F.lit(1.0)
                / F.col("n_shingles")
            ).alias("novelty_rate"),
        )
    )


# --------------------------------------------------------------------------
# 4. deterministic differentially-private count release
# --------------------------------------------------------------------------

DP_EPSILON = 1.0  # Laplace scale b = sensitivity/ε = 1.0 for counting

# A reproducible uniform in (0, 1) from the group key: first 6 md5 hex
# digits → integer in [0, 2^24), centered. Both engines derive the
# SAME u, so the inverse-CDF Laplace draw is identical — the mechanism
# is real DP shape-wise (noise ~ Laplace(1/ε)), with the RNG replaced
# by a keyed hash so the release is auditable by replay. Production
# would swap the hash seed for a secret per-release salt.
# CAST AS DOUBLE up front: with a bare `u_int + 0.5`, Spark parses the
# decimal literal as DECIMAL and carries decimal precision through the
# division (scale-rounded), while DuckDB computes in DOUBLE — a
# ~1e-12-relative divergence mid-range that blows up to ~1e-4 when u
# lands near 0 or 1 (ln of a tiny argument). Forcing double makes the
# arithmetic bit-identical on both engines (round-6 review catch).
_DP_U = "((CAST(u_int AS DOUBLE) + 0.5) / 16777216.0)"
_DP_NOISE = (
    f"(-1.0 / {DP_EPSILON}) * sign({_DP_U} - 0.5)"
    f" * ln(1.0 - 2.0 * abs({_DP_U} - 0.5))"
)

_DP_ORACLE = f"""
WITH c AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_true
    FROM events GROUP BY event_type
),
h AS (
    SELECT event_type, n_true,
           CAST(CAST('0x' || substring(md5(event_type), 1, 6) AS INTEGER)
                AS BIGINT) AS u_int
    FROM c
)
SELECT event_type, n_true,
       {_DP_NOISE} AS laplace_noise,
       n_true + {_DP_NOISE} AS n_released,
       {DP_EPSILON} AS epsilon
FROM h
"""


@register(
    "q_dp_release_event_counts",
    oracle=_DP_ORACLE,
    tags=("privacy", "differential-privacy", "release"),
)
def q_dp_release_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-DP count release over event types via the Laplace mechanism,
    with the noise drawn by inverse CDF from an md5-keyed uniform
    instead of an RNG — deterministic, so the release is replayable
    and both engines hash-match (the audit property k-anonymity and
    t-closeness queries in this catalog already have; this adds the
    NOISE-calibrated release). Complements q_k_anonymity_audit /
    q_t_closeness_audit: those measure re-identification risk of an
    exact release, this produces the protected release itself.

    Scale: one partial-agg count per type + a map-side noise
    expression — no extra shuffle over the rollup.
    """
    events = load_table(spark, sf_dir, "events")
    c = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_true")
    )
    h = c.withColumn(
        "u_int",
        F.expr(
            "CAST(conv(substring(md5(event_type), 1, 6), 16, 10) AS BIGINT)"
        ),
    )
    return h.select(
        "event_type",
        "n_true",
        F.expr(_DP_NOISE).alias("laplace_noise"),
        F.expr(f"n_true + {_DP_NOISE}").alias("n_released"),
        F.lit(DP_EPSILON).alias("epsilon"),
    )


# --------------------------------------------------------------------------
# 5. embedding-norm outlier audit per label
# --------------------------------------------------------------------------

_NORM_SQL = (
    "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), embedding),"
    " (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
)

_NORM_ORACLE = f"""
WITH norms AS (
    SELECT label, vec_id, {_NORM_SQL} AS nrm FROM embeddings
),
r AS (
    SELECT label, nrm,
           row_number() OVER (PARTITION BY label ORDER BY nrm, vec_id) AS rn,
           count(*) OVER (PARTITION BY label) AS n
    FROM norms
),
q AS (
    SELECT label,
           max(CASE WHEN rn = greatest(1, CAST(ceil(0.25 * n) AS BIGINT))
               THEN nrm END) AS q1,
           max(CASE WHEN rn = greatest(1, CAST(ceil(0.75 * n) AS BIGINT))
               THEN nrm END) AS q3
    FROM r GROUP BY label
)
SELECT r.label,
       CAST(max(r.n) AS BIGINT) AS n_vecs,
       max(q.q1) AS q1,
       max(q.q3) AS q3,
       CAST(sum(CASE WHEN r.nrm < q.q1 - 1.5 * (q.q3 - q.q1)
                       OR r.nrm > q.q3 + 1.5 * (q.q3 - q.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM r JOIN q USING (label)
GROUP BY r.label
"""


@register(
    "q_embedding_norm_outliers",
    oracle=_NORM_ORACLE,
    tags=("llm-pipeline", "embeddings", "hygiene"),
)
def q_embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding L2-norm outlier audit per label: exact rank-based
    Q1/Q3 of the norms (ceil(q·n) order statistic, vec_id tiebreak —
    the q_iqr_outlier_fences recipe) and the count outside Tukey
    1.5·IQR fences. Norm pathologies (zero vectors, exploded scales)
    are the cheapest early signal of a broken encoder batch — this is
    the first-pass hygiene gate before any ANN / SemDeDup stage
    trusts the vectors.

    Float parity: the norm is a fold over the vector in INDEX order
    seeded with 0.0 on both engines (same float32→double widening,
    same add order → bit-identical), so the rank order and quartiles
    agree exactly.

    Scale: map-side norm + one per-label window sort of scalar norms
    (vectors never cross the Exchange) + one grouped pass.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    norms = emb.select(
        "label",
        "vec_id",
        F.expr(
            "sqrt(aggregate(embedding, CAST(0.0 AS DOUBLE),"
            " (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
        ).alias("nrm"),
    )
    r = norms.selectExpr(
        "label",
        "nrm",
        "row_number() OVER (PARTITION BY label ORDER BY nrm, vec_id) AS rn",
        "count(*) OVER (PARTITION BY label) AS n",
    )
    q = r.groupBy("label").agg(
        F.expr(
            "max(CASE WHEN rn = greatest(1, CAST(ceil(0.25 * n) AS BIGINT))"
            " THEN nrm END)"
        ).alias("q1"),
        F.expr(
            "max(CASE WHEN rn = greatest(1, CAST(ceil(0.75 * n) AS BIGINT))"
            " THEN nrm END)"
        ).alias("q3"),
    )
    return (
        r.join(q, "label")
        .groupBy("label")
        .agg(
            F.expr("CAST(max(n) AS BIGINT)").alias("n_vecs"),
            F.max("q1").alias("q1"),
            F.max("q3").alias("q3"),
            F.expr(
                "CAST(sum(CASE WHEN nrm < q1 - 1.5 * (q3 - q1)"
                " OR nrm > q3 + 1.5 * (q3 - q1) THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("n_outliers"),
        )
    )


# --------------------------------------------------------------------------
# 6. Johnson-Lindenstrauss projection distortion audit
# --------------------------------------------------------------------------

JL_K = 16          # projected dims = the sign-LSH plane count
JL_PANEL = 50      # audit panel: the 50 lowest vec_ids -> 1225 pairs
_JL_SCALE = 0.25   # 1/sqrt(JL_K), exact in binary


def _jl_proj_spark() -> str:
    from cost_of_living_data_etl_spark.operators.similarity import (
        _planes_literal,
    )

    return (
        f"transform(sequence(1, {JL_K}), j -> aggregate("
        f"zip_with(embedding, element_at({_planes_literal(64)}, j),"
        " (x, p) -> CAST(x AS DOUBLE) * p),"
        " CAST(0.0 AS DOUBLE), (a, v) -> a + v)"
        f" * {_JL_SCALE})"
    )


def _jl_proj_duckdb() -> str:
    from cost_of_living_data_etl_spark.operators.similarity import (
        _plane_sql_literal,
    )

    planes = "[" + ", ".join(_plane_sql_literal(j, 64) for j in range(JL_K)) + "]"
    return (
        f"list_transform(range(1, {JL_K} + 1), j -> list_reduce("
        f"list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65),"
        f" i -> CAST(embedding[i] AS DOUBLE) * (({planes})[j])[i])),"
        f" (a, v) -> a + v) * {_JL_SCALE})"
    )


def _sq_dist(a: str, b: str, n: int, engine: str) -> str:
    """Σ(a_i - b_i)² folded in INDEX order — the same IEEE op sequence
    on both engines (shared-literal house recipe)."""
    if engine == "spark":
        return (
            f"aggregate(transform(sequence(1, {n}), i ->"
            f" (CAST(element_at({a}, i) AS DOUBLE) - CAST(element_at({b}, i) AS DOUBLE))"
            f" * (CAST(element_at({a}, i) AS DOUBLE) - CAST(element_at({b}, i) AS DOUBLE))),"
            " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, {n} + 1), i ->"
        f" (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
        f" * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)))),"
        " (acc, v) -> acc + v)"
    )


def _jl_oracle() -> str:
    from cost_of_living_data_etl_spark.plans.mllite import _DSUM_SQL

    return f"""
WITH p AS (
    SELECT vec_id, embedding, {_jl_proj_duckdb()} AS proj
    FROM embeddings WHERE vec_id < {JL_PANEL}
),
pairs AS (
    SELECT sqrt({_sq_dist('b.proj', 'a.proj', JL_K, 'duckdb')}
                / {_sq_dist('b.embedding', 'a.embedding', 64, 'duckdb')}) AS ratio
    FROM p a JOIN p b ON a.vec_id < b.vec_id
    WHERE {_sq_dist('b.embedding', 'a.embedding', 64, 'duckdb')} > 0
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       {_DSUM_SQL.format(x='ratio')} / count(*) AS mean_ratio,
       min(ratio) AS min_ratio,
       max(ratio) AS max_ratio,
       CAST(sum(CASE WHEN ratio BETWEEN 0.7 AND 1.3 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_within_30pct
FROM pairs
"""


@register(
    "q_jl_projection_distortion",
    oracle=_jl_oracle(),
    tags=("llm-pipeline", "dim-reduction", "johnson-lindenstrauss"),
)
def q_jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss audit of the engine's deterministic ±1
    projection: project 64-d embeddings to JL_K=16 dims with the SAME
    md5-derived hyperplanes the sign-LSH index uses (scaled 1/√k), and
    measure pairwise-distance distortion ||y_a−y_b||/||x_a−x_b|| on a
    fixed {JL_PANEL}-vector panel. This certifies the dim-reduction
    half of the LSH design: if the ratio concentrates near 1, the
    16-plane projection preserves geometry and a 4× cheaper prefilter
    distance (16 mults vs 64) is available to every ANN consumer.

    Scale: the projection is a map-side expression over literal
    planes (zero shuffle — same shape as the LSH signature); the
    audit panel is fixed-size regardless of corpus (1,225 pairs), so
    the pair join is broadcast-trivial at any SF.

    Float parity: projection, squared distances, and the mean fold
    all run in INDEX order from shared literals on both engines.
    """
    from cost_of_living_data_etl_spark.functions.columns import det_sum

    e = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < JL_PANEL)
        .select("vec_id", "embedding", F.expr(_jl_proj_spark()).alias("proj"))
    )
    a = e.select(
        F.col("vec_id").alias("vid_a"),
        F.col("embedding").alias("emb_a"),
        F.col("proj").alias("proj_a"),
    )
    b = e.select(
        F.col("vec_id").alias("vid_b"),
        F.col("embedding").alias("emb_b"),
        F.col("proj").alias("proj_b"),
    )
    d2o = _sq_dist("emb_b", "emb_a", 64, "spark")
    d2p = _sq_dist("proj_b", "proj_a", JL_K, "spark")
    pairs = (
        a.join(F.broadcast(b), F.col("vid_a") < F.col("vid_b"))
        .filter(F.expr(d2o) > 0)
        .select(F.expr(f"sqrt(({d2p}) / ({d2o}))").alias("ratio"))
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        (det_sum("ratio") / F.count(F.lit(1))).alias("mean_ratio"),
        F.min("ratio").alias("min_ratio"),
        F.max("ratio").alias("max_ratio"),
        F.sum(
            F.when(F.col("ratio").between(0.7, 1.3), 1).otherwise(0)
        ).cast("long").alias("n_within_30pct"),
    )


# --------------------------------------------------------------------------
# 7. directed cross-source duplication-flow matrix
# --------------------------------------------------------------------------


def _flow_oracle() -> str:
    from cost_of_living_data_etl_spark.operators.dedup import _MINHASH_ORACLE

    return f"""
WITH pairs AS (
    SELECT doc_id_1, doc_id_2 FROM ( {_MINHASH_ORACLE} )
),
f AS (
    SELECT d1.source AS src_source, d2.source AS dst_source,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs p
    JOIN documents d1 ON d1.doc_id = p.doc_id_1
    JOIN documents d2 ON d2.doc_id = p.doc_id_2
    GROUP BY d1.source, d2.source
)
SELECT src_source, dst_source, n_pairs,
       n_pairs * 1.0 / sum(n_pairs) OVER (PARTITION BY dst_source)
           AS share_of_dst_dups
FROM f
"""


@register(
    "q_source_dup_flow_matrix",
    oracle=_flow_oracle(),
    tags=("dedup", "provenance", "mixture-design"),
)
def q_source_dup_flow_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed duplication flows between sources: for every near-dup
    pair, credit the EARLIER doc (smaller doc_id = earlier crawl) as
    the origin and the later one as the copier, and roll up to a
    (src_source, dst_source) matrix with each cell's share of the
    destination's dup intake. q_dupgraph_source_modularity answers
    "is duplication within or across sources"; this names WHICH
    sources feed which — the provenance evidence a mixture designer
    uses to decide which feed to drop when two overlap.

    Scale: reuses the persisted-signature band-join pair plan (the
    shared LSH shuffle discipline); the source stamp joins 8-byte
    doc_ids on the sub-linear pair set, then a |sources|² rollup.
    """
    from cost_of_living_data_etl_spark.operators.dedup import (
        minhash_pair_plan,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    pairs = minhash_pair_plan(spark, sf_dir).select("doc_id_1", "doc_id_2")
    f = (
        pairs.join(
            docs.select(
                F.col("doc_id").alias("doc_id_1"),
                F.col("source").alias("src_source"),
            ),
            "doc_id_1",
        )
        .join(
            docs.select(
                F.col("doc_id").alias("doc_id_2"),
                F.col("source").alias("dst_source"),
            ),
            "doc_id_2",
        )
        .groupBy("src_source", "dst_source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
    return f.selectExpr(
        "src_source",
        "dst_source",
        "n_pairs",
        "CAST(n_pairs AS DOUBLE) / sum(n_pairs)"
        " OVER (PARTITION BY dst_source) AS share_of_dst_dups",
    )


# --------------------------------------------------------------------------
# 8. winnowing fingerprints + span-overlap pair mining (MOSS)
# --------------------------------------------------------------------------

WINNOW_K = 25       # char k-gram width (~5 words: the MOSS/quotation
                    # regime; 8 chars saturated the synthetic 30-word
                    # vocabulary — at 50k docs every 2-word window was
                    # corpus-common and the IDF gate left zero pairs)
WINNOW_W = 4        # winnowing window (fingerprint density guarantee)
WINNOW_MIN_SHARED = 3
WINNOW_MIN_DF_CAP = 5     # IDF gate floor …
WINNOW_DF_FRAC = 0.01     # … and its relative form: fingerprints in
                          # > max(5, 1% of docs) docs are too common to
                          # be evidence of copying (and each join
                          # bucket is df² — the LSH max_bucket
                          # discipline). A fixed absolute cap
                          # degenerated to zero pairs as the corpus
                          # grew (everything common at 50k docs);
                          # the relative gate keeps the instrument
                          # corpus-size-robust while equal to the old
                          # cap (5) at the 500-doc verification SFs.

# char-gram hash: md5 of each overlapping k-gram string, first 15 hex
# digits mod 2^31-1 — the MINHASH shingle-hash recipe, so both engines
# see identical fingerprint sets by construction. The k-gram strings
# come from ONE native pass per engine: a zero-width-lookahead
# regexp_extract_all on Spark (RE2-based DuckDB lacks lookahead, so
# the oracle builds the same strings with a substring lambda). A
# previous revision hashed per-position with an 8-step Horner tree:
# higher-order-function lambdas are interpreted, not codegen'd, and
# the ~30-node tree measured ~12 s warm at sf0.1 vs ~2 s for the
# single JVM md5 call per gram.
_WIN_GRAMS_SPARK = (  # (?s): '.' must cross newlines, like substring does
    f"regexp_extract_all(t, '(?s)(?=(.{{{WINNOW_K}}}))', 1)"
)
_WIN_HASH_LAMBDA_SPARK = (
    "g -> cast(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT) % 2147483647"
)
_WIN_HS_DUCK = f"""list_transform(
                   range(1, greatest(length(t) - {WINNOW_K - 1}, 1) + 1),
                   i -> CAST(('0x' || substr(md5(substring(t, CAST(i AS INT), {WINNOW_K})), 1, 15)) AS BIGINT) % 2147483647)"""

_WINNOW_ORACLE = f"""
WITH fp AS (
    SELECT doc_id,
           list_distinct(list_transform(
               range(1, greatest(length(hs) - {WINNOW_W - 1}, 1) + 1),
               w -> list_min(hs[CAST(w AS INT):CAST(w + {WINNOW_W - 1} AS INT)])
           )) AS fps
    FROM (
        SELECT doc_id,
               {_WIN_HS_DUCK} AS hs
        FROM (SELECT doc_id,
                     CASE WHEN length(t0) < {WINNOW_K}
                          THEN rpad(t0, {WINNOW_K}, ' ') ELSE t0 END AS t
              FROM (SELECT doc_id, trim(text) AS t0 FROM documents))
    )
),
sizes AS (SELECT doc_id, CAST(length(fps) AS BIGINT) AS n_fp FROM fp),
nd AS (SELECT greatest({WINNOW_MIN_DF_CAP},
                       CAST(ceil({WINNOW_DF_FRAC} * count(*)) AS BIGINT))
         AS max_df FROM documents),
ex0 AS (SELECT doc_id, unnest(fps) AS f FROM fp),
rare AS (
    SELECT f FROM ex0 CROSS JOIN nd GROUP BY f, nd.max_df
    HAVING count(DISTINCT doc_id) <= nd.max_df
),
ex AS (SELECT doc_id, f FROM ex0 JOIN rare USING (f)),
shared AS (
    SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM ex a JOIN ex b ON a.f = b.f AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= {WINNOW_MIN_SHARED}
)
SELECT s.doc_id_1, s.doc_id_2, s.n_shared,
       CAST(s.n_shared AS DOUBLE) / least(z1.n_fp, z2.n_fp) AS containment
FROM shared s
JOIN sizes z1 ON z1.doc_id = s.doc_id_1
JOIN sizes z2 ON z2.doc_id = s.doc_id_2
"""


@register(
    "q_winnowing_overlap_pairs",
    oracle=_WINNOW_ORACLE,
    tags=("dedup", "winnowing", "fingerprinting"),
)
def q_winnowing_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) span-overlap mining: per doc, hash every char
    {WINNOW_K}-gram, keep the minimum of each sliding {WINNOW_W}-window
    (the winnowing guarantee: any shared substring of length
    k+w-1 = {WINNOW_K + WINNOW_W - 1} yields at least one shared
    fingerprint), then mine doc pairs sharing ≥{WINNOW_MIN_SHARED}
    fingerprints with a containment score. This is SPAN-level overlap
    — the plagiarism/quotation detector — where MinHash answers
    whole-document set similarity: two docs sharing one long verbatim
    passage score near zero Jaccard but light up here.

    Scale shape: gram hashing and window minima are ALL in-row HOFs
    (zero shuffle until fingerprints — ~1/{WINNOW_W} of char count —
    explode); the pair stage is the same fingerprint equi-join
    discipline as the LSH band join, and the same bucket-cap guard
    applies to boilerplate fingerprints at production scale
    (operators/dedup.py::neardup_pairs_from_sigs max_bucket).
    """
    fp = (
        # parallel=True: char-gram md5 hashing is the dominant serial
        # kernel; fingerprints/counts are order-free ints (round 9)
        load_table(spark, sf_dir, "documents", parallel=True)
        # pad-ONLY-short-docs to k chars: rpad alone also TRUNCATES
        # longer strings (round-6 review catch: plain rpad(t, 8) cut
        # every doc to its first 8 chars and the miner returned zero
        # rows on every corpus)
        .selectExpr("doc_id", "trim(text) AS t0")
        .selectExpr(
            "doc_id",
            f"CASE WHEN length(t0) < {WINNOW_K}"
            f" THEN rpad(t0, {WINNOW_K}, ' ') ELSE t0 END AS t",
        )
        .selectExpr(
            "doc_id",
            f"transform({_WIN_GRAMS_SPARK}, {_WIN_HASH_LAMBDA_SPARK}) AS hs",
        )
        .selectExpr(
            "doc_id",
            # window minima via zip_with of shifted slices, NOT a
            # transform-over-positions lambda: a lambda referencing hs
            # re-evaluates the WHOLE gram-hash array per window
            # (O(L²) md5s per doc — measured as a hang at 500 docs);
            # zip_with's array arguments are row-level expressions,
            # evaluated once per row. W=4 as a least-tree.
            "array_distinct(CASE WHEN size(hs) < 4 THEN array(array_min(hs))"
            " ELSE zip_with("
            "   zip_with(slice(hs, 1, size(hs) - 3), slice(hs, 2, size(hs) - 3),"
            "            (a, b) -> least(a, b)),"
            "   zip_with(slice(hs, 3, size(hs) - 3), slice(hs, 4, size(hs) - 3),"
            "            (a, b) -> least(a, b)),"
            "   (x, y) -> least(x, y)) END) AS fps",
        )
        # materialize before the self-join: every downstream reference
        # (ex ×2 sides, rare, sizes ×2) would otherwise re-inline the
        # whole Horner+window-min expression tree — past codegen's
        # size limits the interpreted fallback turned sf0.01 into a
        # multi-minute job (review catch); one checkpointed
        # fingerprint table is the dedup-family persist discipline
        .transform(eager_checkpoint)
    )
    sizes = fp.selectExpr("doc_id", "CAST(size(fps) AS BIGINT) AS n_fp")
    nd = fp.agg(
        F.greatest(
            F.lit(WINNOW_MIN_DF_CAP).cast("long"),
            F.ceil(F.lit(WINNOW_DF_FRAC) * F.count(F.lit(1))).cast("long"),
        ).alias("max_df")
    )
    ex0 = fp.selectExpr("doc_id", "explode(fps) AS f")
    # pair mining via ONE groupBy(f) + in-row pair generation: collect
    # the (distinct-by-construction) doc set per fingerprint, gate on
    # its size (≡ count_distinct ≤ max_df — the old df-rollup + semi-
    # join), and emit the sorted set's i<j pairs with a nested
    # transform (≡ the old a.f = b.f AND a.doc_id < b.doc_id
    # self-join). Replaces 2 exchanges on f + a sort-merge self-join
    # with 1 exchange + a hash aggregate; pair volume is unchanged and
    # df-capped, so the in-row expansion is bounded by max_df²/2.
    # Plan evidence: plans/r09/q_winnowing_overlap_pairs_{before,after}.txt.
    #
    # HOT-FINGERPRINT PREFILTER (round 10, closing the r9 verdict's §5
    # risk): the bare collect_set materialized the FULL doc set per
    # fingerprint BEFORE the size gate — a boilerplate fingerprint
    # shared by 10⁸ docs would build a 10⁸-element array as ONE
    # aggregation value in one task (agg buffers must fit in memory;
    # only whole-row state spills). The fix is the LSH bucket-cap
    # discipline (operators/dedup.py::neardup_pairs_from_sigs): a
    # window `count(*) over (partition by f)` on the aggregate's OWN
    # key — the window's required partitioning equals the groupBy's,
    # so ONE exchange serves both, WindowExec streams each f-group
    # through a disk-spillable buffer (never a single array value),
    # and the over-cap fingerprints are dropped BEFORE the collect.
    # Exactly equivalent: (doc_id, f) pairs are distinct by
    # construction, so count(*) ≡ count_distinct(doc_id) ≡ size(ds)
    # (oracle-verified at 3 SFs). Interleaved A/B vs the bare form:
    # 1.55 → 1.71 s med (the window's sort on f) — the price of the
    # bounded buffer; a count-rollup + broadcast anti-join variant was
    # REJECTED at 1.96 s med (two extra stages + broadcast build).
    wcap = Window.partitionBy("f")
    shared = (
        ex0.withColumn("__df", F.count(F.lit(1)).over(wcap))
        .crossJoin(F.broadcast(nd))
        .filter(F.col("__df") <= F.col("max_df"))
        .groupBy("f")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ds"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ds, (x, i) ->"
                    " transform(slice(ds, i + 2, size(ds)), y ->"
                    " struct(x AS d1, y AS d2))))"
                )
            ).alias("p")
        )
        .groupBy(
            F.col("p.d1").alias("doc_id_1"),
            F.col("p.d2").alias("doc_id_2"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= WINNOW_MIN_SHARED)
    )
    return (
        shared.join(
            sizes.selectExpr("doc_id AS doc_id_1", "n_fp AS n_fp_1"),
            "doc_id_1",
        )
        .join(
            sizes.selectExpr("doc_id AS doc_id_2", "n_fp AS n_fp_2"),
            "doc_id_2",
        )
        .selectExpr(
            "doc_id_1",
            "doc_id_2",
            "n_shared",
            "CAST(n_shared AS DOUBLE) / least(n_fp_1, n_fp_2) AS containment",
        )
    )


# --------------------------------------------------------------------------
# 9. boilerplate n-gram coverage by source
# --------------------------------------------------------------------------

BOILER_DF_FRAC = 0.01  # a gram in >1% of docs is boilerplate

_BOILER_ORACLE = f"""
WITH sh AS (
    SELECT source, doc_id, unnest({SHINGLES_SQL}) AS shingle FROM documents
),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
df AS (
    SELECT shingle, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
    FROM sh GROUP BY shingle
),
flagged AS (
    SELECT sh.source,
           CAST(count(*) AS BIGINT) AS n_occ,
           CAST(sum(CASE WHEN df.df >= ceil({BOILER_DF_FRAC} * nd.n_docs)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
    FROM sh JOIN df USING (shingle) CROSS JOIN nd
    GROUP BY sh.source
)
SELECT source, n_occ, n_boiler,
       CAST(n_boiler AS DOUBLE) / n_occ AS boiler_share
FROM flagged
"""


@register(
    "q_boilerplate_ngram_coverage",
    oracle=_BOILER_ORACLE,
    tags=("curation", "boilerplate", "quality"),
)
def q_boilerplate_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate load: the share of word-3-gram
    occurrences whose document frequency exceeds {BOILER_DF_FRAC:.0%}
    of the corpus — the repeated-span mass (navboxes, legal footers,
    templates) that survives DOC-level dedup because each hosting doc
    is unique. The CCNet line-dedup pass generalized to n-grams
    (fixture text has no line structure); a source scoring high here
    needs span-level cleanup before training, however novel its docs
    look to q_ngram_novelty_by_source.

    Scale shape: one groupBy(shingle) distinct-doc count (the MinHash
    shuffle class) re-joined to the occurrence stream; the corpus doc
    count is a 1-row broadcast. Counts exact ints, one division.
    """
    # parallel=True: the shingle build is the serial map kernel; all
    # outputs are exact counts and one int ratio (order-free). ONE
    # shingle pass (round 9; previously the occurrence stream was
    # derived twice — df rollup + row-level join-back): aggregate to
    # (shingle, source) CELLS first — a document has exactly ONE
    # source, so per-shingle df = Σ_source per-cell distinct docs —
    # then the df join runs over |cells| rows, not |occurrences|.
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    sh = (
        docs.select("source", "doc_id", F.trim(F.col("text")).alias("t"))
        .select("source", "doc_id", "t", F.split("t", r"\s+").alias("ws"))
        .select(
            "source",
            "doc_id",
            F.explode(F.expr(_SHINGLES_FROM_WS)).alias("shingle"),
        )
    )
    cell = (
        sh.groupBy("shingle", "source")
        .agg(
            F.count(F.lit(1)).alias("n_occ_cell"),
            F.count_distinct("doc_id").alias("nd_cell"),
        )
        .transform(eager_checkpoint)
    )
    dfr = cell.groupBy("shingle").agg(F.sum("nd_cell").alias("df"))
    nd = (
        load_table(spark, sf_dir, "documents")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    return (
        cell.join(dfr, "shingle")
        .crossJoin(F.broadcast(nd))
        .groupBy("source")
        .agg(
            F.sum("n_occ_cell").cast("long").alias("n_occ"),
            F.sum(
                F.when(
                    F.col("df")
                    >= F.ceil(F.lit(BOILER_DF_FRAC) * F.col("n_docs")),
                    F.col("n_occ_cell"),
                ).otherwise(0)
            ).cast("long").alias("n_boiler"),
        )
        .selectExpr(
            "source",
            "n_occ",
            "n_boiler",
            "CAST(n_boiler AS DOUBLE) / n_occ AS boiler_share",
        )
    )


# --------------------------------------------------------------------------
# 10. perplexity-filter retention curve
# --------------------------------------------------------------------------

PPL_GRID = (0.5, 0.75, 0.9, 0.95, 0.99)


def _ppl_curve_oracle() -> str:
    from cost_of_living_data_etl_spark.plans.round5 import _LM_SCORED_CTES

    qs = ", ".join(f"({q})" for q in PPL_GRID)
    return f"""{_LM_SCORED_CTES}
, ppl AS (
    SELECT doc_id, n_bigrams, exp(nll / n_bigrams) AS perplexity
    FROM scored
),
r AS (
    SELECT *, row_number() OVER (ORDER BY perplexity, doc_id) AS rn,
           count(*) OVER () AS n
    FROM ppl
),
grid AS (SELECT unnest([{qs}]) AS q),
thresholds AS (
    SELECT g.q,
           max(CASE WHEN r.rn = greatest(1, CAST(ceil(g.q * r.n) AS BIGINT))
               THEN r.perplexity END) AS ppl_cut
    FROM grid g CROSS JOIN r
    GROUP BY g.q
),
tot AS (
    SELECT CAST(count(*) AS BIGINT) AS docs_total,
           CAST(sum(n_bigrams) AS BIGINT) AS tokens_total
    FROM ppl
)
SELECT t.q, t.ppl_cut,
       CAST(sum(CASE WHEN p.perplexity <= t.ppl_cut THEN 1 ELSE 0 END)
            AS BIGINT) AS docs_kept,
       CAST(sum(CASE WHEN p.perplexity <= t.ppl_cut THEN p.n_bigrams
                ELSE 0 END) AS BIGINT) AS tokens_kept,
       CAST(sum(CASE WHEN p.perplexity <= t.ppl_cut THEN p.n_bigrams
                ELSE 0 END) AS DOUBLE) / tot.tokens_total AS token_share
FROM thresholds t CROSS JOIN ppl p CROSS JOIN tot
GROUP BY t.q, t.ppl_cut, tot.tokens_total
"""


@register(
    "q_ppl_filter_retention_curve",
    oracle=_ppl_curve_oracle(),
    tags=("curation", "perplexity", "filter-tuning"),
)
def q_ppl_filter_retention_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-filter tuning curve: for cutoffs at the corpus ppl
    quantiles {PPL_GRID}, how many documents and TOKENS survive a
    "drop everything above the cutoff" filter. The decision instrument
    behind every CCNet/Gopher-style ppl gate — the question is never
    "is 1200 a good perplexity" but "what fraction of my token budget
    does each cutoff keep". Reuses the exact bigram-LM score frame of
    q_bigram_lm_perplexity (plans/round5.py::lm_scored_docs — one
    model, one SQL text).

    Scale shape: inherits the LM's vocab-bounded shuffles; the ppl
    frame is |docs| rows; cutoffs are ceil-rank order statistics
    (doc_id tiebreak — identical row on both engines) extracted by the
    distributed order-statistic path: positions come from the
    bucket-partitioned zipWithIndex (operators/distributed_rank.py;
    floor(perplexity·8) is the monotone bucket), the 5 target ranks
    are a broadcast grid, and the threshold lookup is a broadcast join
    on position — no single-partition rank window over |docs| rows.
    """
    from cost_of_living_data_etl_spark.operators.distributed_rank import (
        with_global_position,
    )
    from cost_of_living_data_etl_spark.plans.round5 import lm_scored_docs

    ppl = (
        lm_scored_docs(spark, sf_dir)
        .selectExpr("doc_id", "n_bigrams", "exp(nll / n_bigrams) AS perplexity")
        # slim 3-col per-doc frame consumed by FOUR branches (ranking
        # rollup, rank join, total, final curve join) — materialize so
        # the bigram-LM scoring pipeline runs once (dedup-family
        # persist discipline)
        .transform(eager_checkpoint)
    )
    ranked = with_global_position(
        ppl,
        ["perplexity", "doc_id"],
        F.floor(F.col("perplexity") * 8),
        pos_col="__rnk_pos",
    )
    # ONE totals text serves both the rank grid (docs_total) and the
    # final token-share denominator (round 9). Round 10: the r9 EAGER
    # CHECKPOINT on this 1-row aggregate was the round-9 PERF
    # regression (driver 2.73 → 3.02 s): it added a synchronous job
    # barrier before the two consuming broadcasts, which otherwise
    # evaluate the cheap agg-over-checkpointed-ppl inside their own
    # jobs. Interleaved A/B: fold+ckpt 3.25 s med / fold-lazy 2.93 /
    # r8 two-agg 2.98 — the fold stays, the checkpoint goes.
    tot = ppl.agg(
        F.count(F.lit(1)).cast("long").alias("docs_total"),
        F.sum("n_bigrams").cast("long").alias("tokens_total"),
    )
    grid = spark.createDataFrame([(q,) for q in PPL_GRID], "q double")
    targets = grid.crossJoin(F.broadcast(tot)).selectExpr(
        "q", "greatest(1, CAST(ceil(q * docs_total) AS BIGINT)) AS k"
    )
    thresholds = (
        ranked.join(
            F.broadcast(targets),
            F.col("__rnk_pos") == F.col("k") - 1,
        )
        .groupBy("q")
        .agg(F.max("perplexity").alias("ppl_cut"))
    )
    return (
        F.broadcast(thresholds)
        .crossJoin(ppl)
        .crossJoin(F.broadcast(tot))
        .groupBy("q", "ppl_cut", "tokens_total")
        .agg(
            F.sum(
                F.when(F.col("perplexity") <= F.col("ppl_cut"), 1).otherwise(0)
            ).cast("long").alias("docs_kept"),
            F.sum(
                F.when(
                    F.col("perplexity") <= F.col("ppl_cut"),
                    F.col("n_bigrams"),
                ).otherwise(0)
            ).cast("long").alias("tokens_kept"),
        )
        .selectExpr(
            "q",
            "ppl_cut",
            "docs_kept",
            "tokens_kept",
            "CAST(tokens_kept AS DOUBLE) / tokens_total AS token_share",
        )
    )
