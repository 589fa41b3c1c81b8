"""Pair mining and robustness diagnostics: mutual nearest neighbors,
MAD-robust outliers, and dup-graph assortativity.

Three curation-side passes over artifacts earlier families produce:

- **mutual nearest neighbors** over the embedding corpus — the bitext/
  pair-mining rule (each side's argmax must agree) that turns one-way
  similarity into high-precision pairs; the filter LABSE/CCMatrix-style
  parallel-corpus mining applies on top of ANN candidates;
- **MAD-robust outlier days** — median-absolute-deviation flagging of
  the daily revenue series: the robust counterpart of
  `q_revenue_anomaly_days`' z-scores (mean/σ move with the outliers
  they're meant to catch; medians don't, up to 50% corruption);
- **degree assortativity** of the near-dup pair graph — one Pearson
  correlation over edge-endpoint degrees that says whether duplication
  is hub-shaped (templates radiating copies, r < 0) or clique-shaped
  (mirror clusters, r > 0) — which decides canonical-pick strategy
  before anyone reads pairs.

Float discipline: argmax/median/MAD are selections of existing values
under total orders (no interpolation); assortativity reduces edges to
six exact BIGINT sums entering ONE shared float expression.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from cost_of_living_data_etl_spark.functions.checkpoints import (
    eager_checkpoint,
)
from cost_of_living_data_etl_spark.operators.dedup import (
    _MINHASH_ORACLE,
    minhash_pair_plan,
)
from cost_of_living_data_etl_spark.operators.similarity import (
    dot_expr,
    with_norm,
)
from cost_of_living_data_etl_spark.plans.analytics_extra import (
    _DAILY_CTE,
    _daily_revenue,
)
from cost_of_living_data_etl_spark.plans.catalog import register
from cost_of_living_data_etl_spark.sources.tables import load_table

# --- mutual nearest neighbors ----------------------------------------------

#: dense-instrument bound, same contract as similarity.MAX_EXACT_PAIRS_ROWS:
#: beyond this the exact a×b cross product is refused and the ANN-fed
#: variant (plans/round4.py::q_mutual_nn_ann) is the supported path.
MAX_MUTUAL_NN_ROWS = 100_000

_MNN_ORACLE = """
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS emb,
           sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))
             AS norm
    FROM embeddings
),
pairs AS (
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           list_inner_product(a.emb, b.emb) / (a.norm * b.norm) AS cos_sim
    FROM e a JOIN e b ON a.vec_id % 4 = 0 AND b.vec_id % 4 = 1
),
best_a AS (
    SELECT a_id, b_id, cos_sim FROM (
        SELECT *, row_number() OVER (PARTITION BY a_id
                                     ORDER BY cos_sim DESC, b_id) AS rk
        FROM pairs) WHERE rk = 1
),
best_b AS (
    SELECT a_id, b_id FROM (
        SELECT *, row_number() OVER (PARTITION BY b_id
                                     ORDER BY cos_sim DESC, a_id) AS rk
        FROM pairs) WHERE rk = 1
)
SELECT CAST(x.a_id AS BIGINT) AS a_id, CAST(x.b_id AS BIGINT) AS b_id,
       x.cos_sim AS cos_sim
FROM best_a x JOIN best_b y ON x.a_id = y.a_id AND x.b_id = y.b_id
ORDER BY a_id
"""


@register(
    "q_mutual_nn_pairs",
    oracle=_MNN_ORACLE,
    tags=("similarity", "pair-mining", "bitext"),
)
def q_mutual_nn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual nearest neighbors between two deterministic corpus
    slices (vec_id % 4 == 0 vs == 1 — quarter-sides keep the dense
    exact instrument's pair count bounded; the mutual-filter semantics
    don't depend on side size): pair (a, b) survives iff b is a's best
    cosine match AND a is b's — the reciprocal filter that makes mined
    pairs precise (one-way argmax pairs everything, including points
    whose best match merely happens to be nearest in a sparse region).

    Argmaxes are `max(struct(cos, -id))` partial aggregates — one per
    side from ONE scored pair stream, combined map-side, ties broken
    toward the smaller id on both engines.

    100 TB: the exact pair stream here is the fixture-scale instrument
    (one broadcast of the odd side, no shuffled pairs — only the two
    per-key argmax states move), and the builder REFUSES inputs above
    MAX_MUTUAL_NN_ROWS so it cannot silently go quadratic. At corpus
    scale the mutual filter is UNCHANGED but consumes ANN candidates —
    that production path is shipped as `q_mutual_nn_ann`
    (plans/round4.py): the same reciprocal argmax over IVF-cell
    candidate lists, exactly the CCMatrix recipe.
    """
    e = with_norm(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    # bounded guard action (scans ≤ MAX+1 rows, the
    # q_embed_neardup_pairs contract): the dense a×b stream is the
    # validation instrument; above the bound the catalog must refuse to
    # silently go quadratic and route to the ANN-fed variant instead.
    n = e.limit(MAX_MUTUAL_NN_ROWS + 1).count()
    if n > MAX_MUTUAL_NN_ROWS:
        raise ValueError(
            f"q_mutual_nn_pairs scores a dense |A|x|B| pair stream and the "
            f"input has > {MAX_MUTUAL_NN_ROWS} vectors — use "
            f"q_mutual_nn_ann (same reciprocal filter over IVF-cell "
            f"candidates, the CCMatrix-style production path) at this scale."
        )
    # parallel=True on the PROBE side only (round 9): the dense a×b
    # cosine pass is the serial kernel and both argmaxes are struct-max
    # partial aggregates (order-free), so the re-key is parity-safe
    # (measured 2.28→1.53 s interleaved); the broadcast b side and the
    # guard count stay on the plain scan.
    a = with_norm(
        load_table(spark, sf_dir, "embeddings", parallel=True).select(
            "vec_id", "embedding"
        )
    ).filter(F.col("vec_id") % 4 == 0).select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_emb"),
        F.col("norm").alias("a_norm"),
    )
    b = e.filter(F.col("vec_id") % 4 == 1).select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("b_emb"),
        F.col("norm").alias("b_norm"),
    )
    # EAGER checkpoint: both argmax aggregations consume the scored
    # stream, and Catalyst shares no common subplan across branches —
    # without it the 64-dim cosine runs TWICE over all pairs (measured
    # 8.3 s -> ~4 s warm at sf0.1); the materialized rows are slim
    # (a_id, b_id, score) triples
    pairs = a.crossJoin(F.broadcast(b)).select(
        "a_id",
        "b_id",
        (
            dot_expr("a_emb", "b_emb") / (F.col("a_norm") * F.col("b_norm"))
        ).alias("cos_sim"),
    ).transform(eager_checkpoint)
    best_a = (
        pairs.groupBy("a_id")
        .agg(F.max(F.struct("cos_sim", (-F.col("b_id")).alias("nb"))).alias("m"))
        .select(
            "a_id",
            (-F.col("m.nb")).alias("b_id"),
            F.col("m.cos_sim").alias("cos_sim"),
        )
    )
    best_b = (
        pairs.groupBy("b_id")
        .agg(F.max(F.struct("cos_sim", (-F.col("a_id")).alias("na"))).alias("m"))
        .select(F.col("b_id").alias("bb_id"), (-F.col("m.na")).alias("ba_id"))
    )
    return (
        best_a.join(
            best_b,
            (best_a.a_id == best_b.ba_id) & (best_a.b_id == best_b.bb_id),
        )
        .select(
            F.col("a_id").cast("long").alias("a_id"),
            F.col("b_id").cast("long").alias("b_id"),
            "cos_sim",
        )
        .orderBy("a_id")
    )


# --- MAD-robust outlier days -------------------------------------------------

MAD_K = 5.0  # flag |x - median| > K * MAD

_MAD_ORACLE = f"""
WITH {_DAILY_CTE},
med AS (
    SELECT revenue AS med FROM (
        SELECT revenue, row_number() OVER (ORDER BY revenue, day) AS rk,
               count(*) OVER () AS n
        FROM daily) WHERE rk = (n + 1) // 2
),
dev AS (
    SELECT day, revenue, abs(revenue - med) AS abs_dev FROM daily, med
),
mad AS (
    SELECT abs_dev AS mad FROM (
        SELECT abs_dev, row_number() OVER (ORDER BY abs_dev, day) AS rk,
               count(*) OVER () AS n
        FROM dev) WHERE rk = (n + 1) // 2
)
SELECT day, revenue, abs_dev, mad
FROM dev, mad
WHERE abs_dev > {MAD_K} * mad
ORDER BY day
"""


@register(
    "q_mad_robust_outlier_days",
    oracle=_MAD_ORACLE,
    tags=("statistics", "robust", "outliers"),
)
def q_mad_robust_outlier_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days whose revenue sits more than 5 MADs from the median — the
    ROBUST outlier flag: `q_revenue_anomaly_days`' z-scores use a mean
    and σ the outliers themselves inflate (masking), while median and
    MAD hold up to 50% corruption; 5·MAD ≈ 3.4σ under normality.

    Median and MAD are lower-median ORDER STATISTICS selected by the
    total order (value, day) — exact elements both engines pick
    identically, no interpolation, no float folds.

    100 TB: the series is the calendar-bounded daily rollup (partial-
    aggregated), so the two selection windows and the final filter
    touch |days| rows; the two scalars broadcast back. Per-segment
    variants partition the same windows by segment.
    """
    daily = _daily_revenue(spark, sf_dir)
    n_w = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )

    def _lower_median(df: DataFrame, value: str, out: str) -> DataFrame:
        ranked = df.select(
            F.col(value),
            F.row_number().over(Window.orderBy(value, "day")).alias("rk"),
            F.count(F.lit(1)).over(n_w).alias("n"),
        )
        return ranked.filter(
            F.col("rk") == F.floor((F.col("n") + 1) / 2)
        ).select(F.col(value).alias(out))

    med = _lower_median(daily, "revenue", "med")
    dev = daily.crossJoin(F.broadcast(med)).select(
        "day",
        "revenue",
        F.abs(F.col("revenue") - F.col("med")).alias("abs_dev"),
    )
    mad = _lower_median(dev, "abs_dev", "mad")
    return (
        dev.crossJoin(F.broadcast(mad))
        .filter(F.col("abs_dev") > MAD_K * F.col("mad"))
        .select("day", "revenue", "abs_dev", "mad")
        .orderBy("day")
    )


# --- dup-graph degree assortativity -----------------------------------------

_ASSORT_EXPR = """CASE
  WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 0 THEN
    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))
END"""

_ASSORT_ORACLE = f"""
WITH pairs AS MATERIALIZED (
    SELECT doc_id_1, doc_id_2 FROM ( {_MINHASH_ORACLE} )
),
edges AS (
    SELECT doc_id_1 AS src, doc_id_2 AS dst FROM pairs
    UNION ALL
    SELECT doc_id_2, doc_id_1 FROM pairs
),
deg AS (SELECT src AS node, count(*) AS d FROM edges GROUP BY src),
xy AS (
    SELECT du.d AS x, dv.d AS y
    FROM edges e JOIN deg du ON e.src = du.node
                 JOIN deg dv ON e.dst = dv.node
),
s AS (
    SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
           sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
    FROM xy
)
SELECT CAST(n AS BIGINT) AS n_directed_edges,
       {_ASSORT_EXPR} AS assortativity
FROM s
"""


@register(
    "q_dupgraph_assortativity",
    oracle=_ASSORT_ORACLE,
    tags=("graph", "dedup", "diagnostics"),
)
def q_dupgraph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the MinHash near-dup graph: the Pearson
    correlation of endpoint degrees over directed edges. r < 0 means
    hub-shaped duplication (templates radiating one-off copies — pick
    canonicals per hub, or regex the template away); r > 0 means
    clique-shaped mirror clusters (connected components already split
    them — pick any representative). One number that routes the dedup
    strategy, computed before anyone inspects pairs.

    Exactness: degrees and the five moment sums are BIGINTs; the
    correlation is ONE shared float expression over those exact
    integers (NULL for degenerate/regular graphs, where the variance
    term is zero).

    100 TB: reuses the banded LSH candidate plan (`minhash_pair_plan`)
    — shuffles carry id pairs and (node, degree) only; the moment
    reduction is a partial-aggregated single row.
    """
    pairs = minhash_pair_plan(spark, sf_dir).select("doc_id_1", "doc_id_2")
    edges = pairs.select(
        F.col("doc_id_1").alias("src"), F.col("doc_id_2").alias("dst")
    ).unionAll(
        pairs.select(
            F.col("doc_id_2").alias("src"), F.col("doc_id_1").alias("dst")
        )
    ).transform(eager_checkpoint)  # EAGER (CC convention): degree table and the
    # edge join both consume edges — without it the LSH plan re-ran
    # once per reference
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("x"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("y"))
    xy = (
        edges.join(du, edges.src == du.u)
        .join(dv, edges.dst == dv.v)
        .select("x", "y")
    )
    s = xy.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    return s.select(
        F.col("n").cast("long").alias("n_directed_edges"),
        F.expr(_ASSORT_EXPR).alias("assortativity"),
    )


# --- k-core of the dup graph -------------------------------------------------

KCORE_K = 2
KCORE_ROUNDS = 8  # fixed peeling rounds (PR_ITERS convention)


def _kcore_oracle() -> str:
    # every per-round CTE is MATERIALIZED: each round references the
    # previous edge set 3× (degree agg + two join sides), and DuckDB
    # inlines plain CTEs per reference — 8 unrolled rounds exploded to
    # 3^8 copies of the LSH subtree (measured 124 s; materialized: <1 s)
    steps = []
    for r in range(KCORE_ROUNDS):
        steps.append(
            f"""d{r} AS MATERIALIZED (SELECT src, count(*) AS c FROM e{r} GROUP BY src),
k{r} AS MATERIALIZED (SELECT src FROM d{r} WHERE c >= {KCORE_K}),
e{r + 1} AS MATERIALIZED (SELECT e.src, e.dst FROM e{r} e
           JOIN k{r} a ON e.src = a.src JOIN k{r} b ON e.dst = b.src)"""
        )
    return f"""
WITH pairs AS MATERIALIZED (
    SELECT doc_id_1, doc_id_2 FROM ( {_MINHASH_ORACLE} )
),
e0 AS MATERIALIZED (
    SELECT doc_id_1 AS src, doc_id_2 AS dst FROM pairs
    UNION ALL SELECT doc_id_2, doc_id_1 FROM pairs
),
{','.join(steps)}
SELECT CAST(src AS BIGINT) AS doc_id, CAST(count(*) AS BIGINT) AS core_degree
FROM e{KCORE_ROUNDS} GROUP BY src ORDER BY doc_id
"""


@register(
    "q_kcore_dup_graph",
    oracle=_kcore_oracle(),
    tags=("graph", "dedup", "iterative"),
)
def q_kcore_dup_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 2-core of the MinHash near-dup graph: iteratively peel
    nodes with degree < 2 until only nodes embedded in cycles/cliques
    remain, reporting each survivor's within-core degree. Peripheral
    one-off copies peel away; what survives is the DENSE mirror
    structure — the families worth template extraction rather than
    pairwise dedup (complementing assortativity's one-number read
    with the actual member set).

    Third iterative-graph operator discipline (CC, PageRank): a FIXED
    number of peeling rounds, so both engines reach the identical —
    converged or not — state and the oracle (which unrolls the same
    rounds) hash-matches regardless; 8 rounds converge for any graph
    whose peel-chains are shorter than 8 (the fixture's are ≤ 2;
    production uses the CC-style 1-scalar convergence check instead).
    localCheckpoint truncates lineage per round.

    100 TB: each round shuffles (src, dst) id pairs and |nodes|
    degree rows — never documents; the edge set only shrinks.
    """
    pairs = minhash_pair_plan(spark, sf_dir).select("doc_id_1", "doc_id_2")
    e = pairs.select(
        F.col("doc_id_1").alias("src"), F.col("doc_id_2").alias("dst")
    ).unionAll(
        pairs.select(
            F.col("doc_id_2").alias("src"), F.col("doc_id_1").alias("dst")
        )
    ).transform(eager_checkpoint)  # EAGER (CC convention): LSH plan runs once —
    # each round references e twice (degree agg + join), and a lazy
    # checkpoint let the whole upstream re-run per reference (measured
    # 137 s -> ~10 s at sf0.001)
    for _ in range(KCORE_ROUNDS):
        keep = (
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= KCORE_K)
            .select("src")
        )
        e = (
            e.join(keep, "src", "left_semi")
            .join(
                keep.select(F.col("src").alias("dst")), "dst", "left_semi"
            )
            .transform(eager_checkpoint)
        )
    return (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .select(
            F.col("src").cast("long").alias("doc_id"),
            F.col("core_degree").cast("long").alias("core_degree"),
        )
        .orderBy("doc_id")
    )


# --- LSH blocking quality ----------------------------------------------------


def _lsh_quality_oracle() -> str:
    from cost_of_living_data_etl_spark.operators.dedup import (
        BANDS,
        JACCARD_THRESHOLD,
        SHINGLES_SQL,
        _band_hash_sql,
        _minhash_agg_sql,
        _SHINGLE_H_SQL,
    )
    from cost_of_living_data_etl_spark.plans.structural import _SETSIM_ORACLE

    bands_union = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, {_band_hash_sql(b)} AS band_hash"
        " FROM mh"
        for b in range(BANDS)
    )
    return f"""
WITH lshq_sh AS MATERIALIZED (
    SELECT doc_id, {SHINGLES_SQL} AS shingles FROM documents
),
lshq_ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM lshq_sh),
hx AS (SELECT doc_id, {_SHINGLE_H_SQL} AS h FROM lshq_ex),
mh AS MATERIALIZED (
    SELECT doc_id, list(DISTINCT h) AS hset, {_minhash_agg_sql()}
    FROM hx GROUP BY doc_id
),
bands AS MATERIALIZED ({bands_union}),
cand AS MATERIALIZED (
    SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
),
found AS (
    SELECT c.d1, c.d2
    FROM cand c JOIN mh s1 ON s1.doc_id = c.d1
                JOIN mh s2 ON s2.doc_id = c.d2
    WHERE length(list_intersect(s1.hset, s2.hset)) * 1.0
          / length(list_distinct(list_concat(s1.hset, s2.hset)))
          >= {JACCARD_THRESHOLD}
),
truth AS MATERIALIZED ( {_SETSIM_ORACLE} ),
nn AS (SELECT count(*) AS n_docs FROM documents)
SELECT CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_docs * (n_docs - 1) // 2 AS BIGINT) AS n_all_pairs,
       CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
       CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true,
       CAST((SELECT count(*) FROM found) AS BIGINT) AS n_found,
       CASE WHEN (SELECT count(*) FROM truth) > 0 THEN
           CAST((SELECT count(*) FROM found) AS DOUBLE)
             / (SELECT count(*) FROM truth)
       END AS pair_completeness,
       1.0 - CAST((SELECT count(*) FROM cand) AS DOUBLE)
           / (n_docs * (n_docs - 1) // 2) AS reduction_ratio
FROM nn
"""


@register(
    "q_lsh_blocking_quality",
    oracle=_lsh_quality_oracle(),
    tags=("dedup", "evaluation", "blocking"),
)
def q_lsh_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured quality of the MinHash-LSH blocking scheme against
    EXACT ground truth: pair completeness (what fraction of true
    Jaccard ≥ 0.5 pairs the banded index recovers — possible only
    because `q_setsim_prefix_join` computes the exact answer) and
    reduction ratio (what fraction of the n(n−1)/2 comparisons the
    blocking avoided). The standard entity-resolution blocking
    scorecard, turned on our own index: the recall/efficiency
    trade-off as a MEASURED number per corpus instead of the banding
    formula's theoretical curve.

    Both thresholds are {JACCARD_THRESHOLD}: LSH-found ⊆ truth (its
    verification is exact), so completeness ≤ 1 by construction.
    Every output is a ratio of exact BIGINT counts.

    100 TB: candidate counting reuses the banded self-join (short-key
    shuffles only); the truth side is the prefix-filter join — the
    whole query is two independent pair-mining plans plus five scalar
    counts.
    """
    from cost_of_living_data_etl_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        minhash_signatures,
        _band_hash_spark,
        BANDS,
    )
    from cost_of_living_data_etl_spark.plans.structural import (
        q_setsim_prefix_join,
    )

    # parallel=True: the signature map pass is the serial kernel and
    # every output is an exact-integer count or a ratio of two counts
    # (round 9; same justification as minhash_pair_plan)
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    # The LSH signature checkpoint and the truth side's setsim chain
    # (whose build eager-checkpoints its own shingle table) are
    # INDEPENDENT pipelines that ran as sequential job barriers —
    # overlap them from a 2-thread pool (guide §2.6; round 10, the
    # bucketed-join/data-Shapley move). Results are bit-identical:
    # materialization order cannot affect either side's content.
    # Order-alternating interleaved A/B: med 2.47 → 2.25 s, min 2.34 →
    # 2.07, rows identical (CHECK).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        mh_fut = pool.submit(
            lambda: minhash_signatures(docs).transform(eager_checkpoint)
        )
        truth_fut = pool.submit(q_setsim_prefix_join, spark, sf_dir)
        mh, truth = mh_fut.result(), truth_fut.result()
    bands = mh.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.expr(_band_hash_spark(b)) for b in range(BANDS)])
        ).alias("band_idx", "band_hash"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .distinct()
    )
    n_cand = cand.groupBy().agg(F.count(F.lit(1)).alias("n_candidates"))
    # verify the SAME candidate set (review finding: a second call to
    # neardup_pairs_from_sigs rebuilt the band self-join from scratch,
    # doubling the dominant join and duplicating blocking logic)
    s1 = mh.select(F.col("doc_id").alias("d1"), F.col("hset").alias("hs1"))
    s2 = mh.select(F.col("doc_id").alias("d2"), F.col("hset").alias("hs2"))
    n_found = (
        cand.join(s1, "d1")
        .join(s2, "d2")
        .filter(
            F.size(F.array_intersect("hs1", "hs2"))
            / F.size(F.array_union("hs1", "hs2"))
            >= JACCARD_THRESHOLD
        )
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n_found"))
    )
    n_true = truth.groupBy().agg(F.count(F.lit(1)).alias("n_true"))
    n_docs = docs.groupBy().agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        n_docs.crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_true))
        .crossJoin(F.broadcast(n_found))
        .select(
            F.col("n_docs").cast("long").alias("n_docs"),
            F.expr("n_docs * (n_docs - 1) div 2")
            .cast("long")
            .alias("n_all_pairs"),
            F.col("n_candidates").cast("long").alias("n_candidates"),
            F.col("n_true").cast("long").alias("n_true"),
            F.col("n_found").cast("long").alias("n_found"),
            F.when(
                F.col("n_true") > 0,
                F.col("n_found").cast("double") / F.col("n_true"),
            ).alias("pair_completeness"),
            (
                1.0
                - F.col("n_candidates").cast("double")
                / F.expr("n_docs * (n_docs - 1) div 2")
            ).alias("reduction_ratio"),
        )
    )


# --- golden-record survivorship ----------------------------------------------


def _survivorship_oracle() -> str:
    from cost_of_living_data_etl_spark.operators.dedup import _CLUSTERS_ORACLE
    from cost_of_living_data_etl_spark.plans.corpus_prep import (
        _QUALITY_SQL as _CPQ,
    )

    return f"""
WITH clusters AS MATERIALIZED ( {_CLUSTERS_ORACLE} ),
scored AS (
    SELECT c.cluster_id, d.doc_id, ({_CPQ}) AS quality, d.n_chars
    FROM clusters c JOIN documents d ON d.doc_id = c.doc_id
),
sized AS (
    -- cluster-level max BEFORE the rk filter: a window in the final
    -- SELECT would run after WHERE rk = 1 and see only the survivor
    SELECT *, count(*) OVER (PARTITION BY cluster_id) AS n_members,
           max(n_chars) OVER (PARTITION BY cluster_id) AS cluster_max_chars
    FROM scored
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY cluster_id
                                 ORDER BY quality DESC, doc_id) AS rk
    FROM sized WHERE n_members > 1
)
SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
       CAST(doc_id AS BIGINT) AS survivor_doc_id,
       CAST(n_members AS BIGINT) AS n_members,
       quality AS survivor_quality,
       CAST(cluster_max_chars AS BIGINT) AS max_n_chars
FROM ranked WHERE rk = 1 ORDER BY cluster_id
"""


@register(
    "q_golden_record_survivorship",
    oracle=_survivorship_oracle(),
    tags=("dedup", "entity-resolution", "survivorship"),
)
def q_golden_record_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship: the canonical document per multi-member dup
    cluster by the rule (highest quality, then lowest id), with the
    cluster's size and max length — the final stage of the entity-
    resolution pipeline this repo now covers end to end: blocking
    (`q_lsh_blocking_quality` scores it), pairing (MinHash verify),
    clustering (`q_dedup_clusters`), and now the golden-record pick
    that decides WHICH row ships.

    Exactness: the quality rule reuses the single-sourced fragment
    (identical doubles), so the argmax `max(struct(quality, -doc_id))`
    picks the same survivor on both engines; sizes/lengths are exact
    BIGINTs.

    100 TB: cluster ids come from the CC operator (edge-touching
    iteration); survivor election is one partial-agg argmax per
    cluster — text itself never moves, only (cluster, id, quality,
    n_chars) tuples.
    """
    from cost_of_living_data_etl_spark.operators.dedup import q_dedup_clusters
    from cost_of_living_data_etl_spark.operators.textstats import (
        quality_score,
    )

    clusters = q_dedup_clusters(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", quality_score(F.col("text")).alias("quality"), "n_chars"
    )
    scored = clusters.join(docs, "doc_id")
    agg = (
        scored.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max(
                F.struct(
                    F.col("quality"), (-F.col("doc_id")).alias("nid")
                )
            ).alias("m"),
            F.max("n_chars").alias("max_n_chars"),
        )
        .filter(F.col("n_members") > 1)
    )
    return agg.select(
        F.col("cluster_id").cast("long").alias("cluster_id"),
        (-F.col("m.nid")).cast("long").alias("survivor_doc_id"),
        F.col("n_members").cast("long").alias("n_members"),
        F.col("m.quality").alias("survivor_quality"),
        F.col("max_n_chars").cast("long").alias("max_n_chars"),
    ).orderBy("cluster_id")
