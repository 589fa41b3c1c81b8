"""A/B experimentation guardrails: SRM check and MDE/power readout.

Two pre-analysis gates every experimentation platform runs BEFORE the
significance tests the catalog already ships (Welch, CUPED, BH-FDR,
SPRT, bootstrap):

- **Sample-ratio mismatch** (`q_ab_srm_check`): the randomizer-health
  chi-square of the observed per-arm UNIT counts against the intended
  50/50 split. A biased split silently invalidates every downstream
  readout, which is why SRM uses a far stricter alarm threshold
  (p < 0.001, the industry convention) than any effect test. For a
  two-arm 50/50 design the statistic collapses algebraically to
  (n₀−n₁)²/(n₀+n₁) — one division of exact BIGINTs — and its 1-df
  p-value is 2·Q(√χ²), the SAME shared Abramowitz-Stegun 26.2.17 tail
  text the BH family uses.

- **Minimum detectable effect** (`q_ab_power_mde`): given the
  observed per-user metric variance and arm sizes, the smallest true
  difference the standard two-sample test would detect at α = 0.05
  with 80% power: MDE = (z_{{α/2}} + z_{{β}})·s_pooled·√(1/n₀+1/n₁).
  The z constants are shared literals; the pooled variance comes from
  det-ordered moment folds over the per-user rollup (the Welch
  query's exactness pattern) with the same degenerate-margin guards.

Both run on the catalog's standard md5-parity arm assignment over
users. 100 TB: one partial-agg pass to per-user rows, then per-arm
moments — the Welch scale shape; the SRM path shuffles only distinct
user ids.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cost_of_living_data_etl_spark.functions.columns import det_sum
from cost_of_living_data_etl_spark.plans.catalog import register
from cost_of_living_data_etl_spark.plans.mllite import _DSUM_SQL
from cost_of_living_data_etl_spark.plans.round4_stats import _AS_P
from cost_of_living_data_etl_spark.plans.reshape import (
    _BUCKET_SPARK,
    _BUCKET_SQL,
)
from cost_of_living_data_etl_spark.plans.stats_analytics import (
    _ARM_SPARK,
    _ARM_SQL,
)
from cost_of_living_data_etl_spark.sources.tables import load_table

_BUCKET_SPARK_K = _BUCKET_SPARK.format(k="o_orderkey")
_BUCKET_SQL_K = _BUCKET_SQL.format(k="o_orderkey")

SRM_ALPHA = 0.001  # industry-standard SRM alarm threshold

#: z_{α/2} at α=0.05 and z_β at 80% power — shared literals (repr of
#: the standard normal quantiles)
Z_ALPHA_2 = "1.959963984540054"
Z_BETA = "0.8416212335729143"

_SRM_CHI2 = "CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / (n0 + n1)"
_SRM_P = _AS_P.format(t="sqrt(chi2)")

_SRM_ORACLE = f"""
WITH users AS (
    SELECT DISTINCT user_id, {_ARM_SQL.format(k="user_id")} AS arm
    FROM events
),
counts AS (
    SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
           CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
    FROM users
),
c2 AS (SELECT n0, n1, {_SRM_CHI2} AS chi2 FROM counts)
SELECT n0 AS n_arm0, n1 AS n_arm1, chi2 AS srm_chi2,
       {_SRM_P} AS srm_p,
       {_SRM_P} < {SRM_ALPHA} AS srm_flag
FROM c2
"""


@register(
    "q_ab_srm_check",
    oracle=_SRM_ORACLE,
    tags=("experimentation", "srm", "guardrail", "ab-test"),
)
def q_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail for the standard md5-parity
    arm assignment: per-arm distinct-user counts, the 50/50 chi-square
    (one exact-integer division), its 1-df p-value via the shared A&S
    tail text, and the p < 0.001 alarm flag. See the module
    docstring."""
    users = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(F.expr(_ARM_SPARK.format(k="user_id")).alias("arm"))
    )
    counts = users.groupBy().agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
    )
    return counts.selectExpr("n0", "n1", f"{_SRM_CHI2} AS chi2").selectExpr(
        "n0 AS n_arm0",
        "n1 AS n_arm1",
        "chi2 AS srm_chi2",
        f"{_SRM_P} AS srm_p",
        f"{_SRM_P} < {SRM_ALPHA} AS srm_flag",
    )


#: pooled two-sample variance from per-arm moments, with the Welch
#: family's degenerate guards (n ≤ 1 arms contribute 0 df)
_POOLED_VAR = (
    "CASE WHEN n0 + n1 > 2 THEN"
    " (greatest(ssq0 - s0 * s0 / n0, CAST(0.0 AS DOUBLE))"
    "  + greatest(ssq1 - s1 * s1 / n1, CAST(0.0 AS DOUBLE)))"
    " / (n0 + n1 - 2.0) ELSE CAST(0.0 AS DOUBLE) END"
)
_MDE_ABS = (
    f"(CAST({Z_ALPHA_2} AS DOUBLE) + CAST({Z_BETA} AS DOUBLE))"
    " * sqrt(pooled_var) * sqrt(1.0 / n0 + 1.0 / n1)"
)

_MDE_ORACLE = f"""
WITH per_user AS (
    SELECT user_id, {_ARM_SQL.format(k="user_id")} AS arm,
           {_DSUM_SQL.format(x="value")} AS metric
    FROM events GROUP BY user_id
),
m AS (
    SELECT
        CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        {_DSUM_SQL.format(x="CASE WHEN arm = 0 THEN metric ELSE CAST(0.0 AS DOUBLE) END")} AS s0,
        {_DSUM_SQL.format(x="CASE WHEN arm = 1 THEN metric ELSE CAST(0.0 AS DOUBLE) END")} AS s1,
        {_DSUM_SQL.format(x="CASE WHEN arm = 0 THEN metric * metric ELSE CAST(0.0 AS DOUBLE) END")} AS ssq0,
        {_DSUM_SQL.format(x="CASE WHEN arm = 1 THEN metric * metric ELSE CAST(0.0 AS DOUBLE) END")} AS ssq1
    FROM per_user
),
v AS (SELECT n0, n1, s0, s1, {_POOLED_VAR} AS pooled_var FROM m)
SELECT n0 AS n_arm0, n1 AS n_arm1,
       sqrt(pooled_var) AS pooled_sd,
       {_MDE_ABS} AS mde_abs,
       CASE WHEN s0 + s1 > 0 THEN ({_MDE_ABS})
            / ((s0 + s1) / (n0 + n1)) ELSE CAST(0.0 AS DOUBLE) END
         AS mde_rel
FROM v
"""


@register(
    "q_ab_power_mde",
    oracle=_MDE_ORACLE,
    tags=("experimentation", "power", "mde", "ab-test"),
)
def q_ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect of the per-user event-value metric at
    α = 0.05 / 80% power given the observed arm sizes and pooled
    variance — the "is this experiment even big enough?" readout run
    before any significance test. Moments are det-ordered folds over
    the per-user rollup; the z quantiles are shared literals. See the
    module docstring."""
    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(det_sum("value").alias("metric"))
        .select(
            F.expr(_ARM_SPARK.format(k="user_id")).alias("arm"), "metric"
        )
    )
    m = per_user.groupBy().agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        det_sum(
            "CASE WHEN arm = 0 THEN metric ELSE CAST(0.0 AS DOUBLE) END"
        ).alias("s0"),
        det_sum(
            "CASE WHEN arm = 1 THEN metric ELSE CAST(0.0 AS DOUBLE) END"
        ).alias("s1"),
        det_sum(
            "CASE WHEN arm = 0 THEN metric * metric"
            " ELSE CAST(0.0 AS DOUBLE) END"
        ).alias("ssq0"),
        det_sum(
            "CASE WHEN arm = 1 THEN metric * metric"
            " ELSE CAST(0.0 AS DOUBLE) END"
        ).alias("ssq1"),
    )
    return m.selectExpr(
        "n0", "n1", "s0", "s1", f"{_POOLED_VAR} AS pooled_var"
    ).selectExpr(
        "n0 AS n_arm0",
        "n1 AS n_arm1",
        "sqrt(pooled_var) AS pooled_sd",
        f"{_MDE_ABS} AS mde_abs",
        f"CASE WHEN s0 + s1 > 0 THEN ({_MDE_ABS})"
        " / ((s0 + s1) / (n0 + n1)) ELSE CAST(0.0 AS DOUBLE) END"
        " AS mde_rel",
    )


# ---------------------------------------------------------------------------
# approximate query processing: sampled SUM with honest error bars
# ---------------------------------------------------------------------------

AQP_PCT = 10  # deterministic md5-bucket sample: buckets < AQP_PCT

#: scale-up factor and CLT half-width, ONE shared text each. The
#: half-width is for the SUM estimator N·x̄_s: N·z·s/√n_s with the
#: finite-population correction √((N−n)/(N−1)) — on a 10% sample the
#: FPC tightens the bar ~5%, and leaving it out is the classic AQP
#: overcoverage bug.
_AQP_EST = "CAST(n_all AS DOUBLE) * (CAST(s_cents AS DOUBLE) / n_s) / 100.0"
_AQP_HW = (
    "CAST(n_all AS DOUBLE) * CAST(1.959963984540054 AS DOUBLE)"
    " * sqrt((CASE WHEN n_s > 1 THEN"
    " greatest(CAST(ssq_cents AS DOUBLE) / 10000.0"
    " - (CAST(s_cents AS DOUBLE) / 100.0) * (CAST(s_cents AS DOUBLE) / 100.0)"
    " / n_s, CAST(0.0 AS DOUBLE)) / (n_s - 1.0)"
    " ELSE CAST(0.0 AS DOUBLE) END) / n_s)"
    " * sqrt(CAST(n_all - n_s AS DOUBLE) / (n_all - 1.0))"
)

_AQP_ORACLE = f"""
WITH base AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS yc,
           CASE WHEN ({{bucket}}) < {AQP_PCT} THEN 1 ELSE 0 END AS in_s
    FROM orders
),
m AS (
    SELECT CAST(count(*) AS BIGINT) AS n_all,
           CAST(sum(yc) AS BIGINT) AS exact_cents,
           CAST(sum(in_s) AS BIGINT) AS n_s,
           CAST(sum(CASE WHEN in_s = 1 THEN yc ELSE 0 END) AS BIGINT)
             AS s_cents,
           sum(CASE WHEN in_s = 1 THEN CAST(yc AS HUGEINT) * yc
                    ELSE 0 END) AS ssq_cents
    FROM base
)
SELECT n_all AS n_rows, n_s AS n_sampled,
       CAST(exact_cents AS DOUBLE) / 100.0 AS exact_sum,
       {_AQP_EST} AS est_sum,
       {_AQP_HW} AS ci_halfwidth,
       abs({_AQP_EST} - CAST(exact_cents AS DOUBLE) / 100.0)
         <= {_AQP_HW} AS within_ci
FROM m
"""


@register(
    "q_aqp_sample_sum_error",
    oracle=_AQP_ORACLE.format(bucket=_BUCKET_SQL_K),
    tags=("aqp", "sampling", "approximation", "diagnostics"),
)
def q_aqp_sample_sum_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing with honest error accounting: the
    total order value estimated from the deterministic md5 {AQP_PCT}%
    sample (N·x̄_s), its 95% CLT half-width WITH the finite-population
    correction, and — because the fixture affords it — the exact
    answer and whether it landed inside the interval. The point of the
    operator is the error bar, not the estimate: an AQP layer that
    can't bound its error is a random-number generator. All inputs are
    exact BIGINT cent sums (values live on the money grid), so the
    whole row hash-replays; at 100 TB the exact column is the one you
    DON'T compute — the sample scan is the product.

    Scale: one partial-agg pass computing both branches (sample
    membership is a map-side flag, never a separate scan)."""
    base = load_table(spark, sf_dir, "orders").select(
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("yc"),
        F.expr(
            f"CASE WHEN ({_BUCKET_SPARK_K}) < {AQP_PCT} THEN 1 ELSE 0 END"
        ).alias("in_s"),
    )
    m = base.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_all"),
        F.sum("yc").cast("long").alias("exact_cents"),
        F.sum("in_s").cast("long").alias("n_s"),
        F.expr(
            "CAST(sum(CASE WHEN in_s = 1 THEN yc ELSE 0 END) AS BIGINT)"
        ).alias("s_cents"),
        # cents² exceeds int64 at fixture magnitudes: accumulate in
        # DECIMAL(38,0) (Spark) / HUGEINT (oracle); downstream reads it
        # through one CAST-to-double, identical on both engines
        F.expr(
            "sum(CASE WHEN in_s = 1 THEN CAST(yc AS DECIMAL(38,0)) * yc"
            " ELSE 0 END)"
        ).alias("ssq_cents"),
    )
    return m.selectExpr(
        "n_all AS n_rows",
        "n_s AS n_sampled",
        "CAST(exact_cents AS DOUBLE) / 100.0 AS exact_sum",
        f"{_AQP_EST} AS est_sum",
        f"{_AQP_HW} AS ci_halfwidth",
        f"abs({_AQP_EST} - CAST(exact_cents AS DOUBLE) / 100.0)"
        f" <= {_AQP_HW} AS within_ci",
    )


# ---------------------------------------------------------------------------
# capture-recapture population estimation (Lincoln-Petersen / Chapman)
# ---------------------------------------------------------------------------

CAPTURE_PCT = 30  # each frame captures ~30% of units

#: two INDEPENDENT deterministic capture frames: axis-salted md5
#: streams (the spatial-coordinate idiom) so membership in one frame
#: carries no information about the other
_CAP_SPARK = (
    "cast(conv(substring(md5(concat('{salt}:', cast(user_id AS STRING))),"
    f" 1, 15), 16, 10) AS BIGINT) % 100 < {CAPTURE_PCT}"
)
_CAP_SQL = (
    "CAST(('0x' || substr(md5('{salt}:' || CAST(user_id AS VARCHAR)),"
    f" 1, 15)) AS BIGINT) % 100 < {CAPTURE_PCT}"
)

#: estimators, ONE shared text each over exact BIGINT counts. The
#: Chapman form is defined even at m = 0 (its +1s are the point);
#: Lincoln-Petersen needs the m > 0 guard.
_LP_EST = (
    "CASE WHEN m > 0 THEN CAST(n1 AS DOUBLE) * n2 / m ELSE NULL END"
)
_CHAPMAN_EST = (
    "(CAST(n1 + 1 AS DOUBLE) * (n2 + 1)) / (m + 1) - CAST(1.0 AS DOUBLE)"
)

_CAPTURE_ORACLE = f"""
WITH users AS (
    SELECT user_id,
           CASE WHEN {_CAP_SQL.format(salt="c1")} THEN 1 ELSE 0 END AS c1,
           CASE WHEN {_CAP_SQL.format(salt="c2")} THEN 1 ELSE 0 END AS c2
    FROM (SELECT DISTINCT user_id FROM events) u
),
m AS (
    SELECT CAST(count(*) AS BIGINT) AS n_true,
           CAST(sum(c1) AS BIGINT) AS n1,
           CAST(sum(c2) AS BIGINT) AS n2,
           CAST(sum(c1 * c2) AS BIGINT) AS m
    FROM users
)
SELECT n_true, n1 AS n_capture1, n2 AS n_capture2, m AS n_both,
       {_LP_EST} AS lp_estimate,
       {_CHAPMAN_EST} AS chapman_estimate,
       ({_CHAPMAN_EST} - n_true) / n_true AS chapman_rel_err
FROM m
"""


@register(
    "q_capture_recapture_users",
    oracle=_CAPTURE_ORACLE,
    tags=("estimation", "capture-recapture", "population", "diagnostics"),
)
def q_capture_recapture_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture estimate of the distinct-user population from
    two independent deterministic ~{CAPTURE_PCT}% hash frames —
    Lincoln-Petersen n₁n₂/m and the bias-corrected Chapman
    (n₁+1)(n₂+1)/(m+1) − 1 — the classic "how many units does the
    whole system have, given two overlapping partial views" estimator
    (log coverage, crawl frontier size, mark-resight). The fixture
    affords the true count, so the row doubles as a calibration check
    (Chapman relative error reported). Exact BIGINT counts, one shared
    division per estimator, LP guarded NULL at zero overlap.

    100 TB: both frame memberships are map-side flags over one
    distinct-user pass; the estimators run on a single row — and in
    the real use case the full distinct count is exactly what you
    CANNOT afford, which is why the two cheap frames exist."""
    users = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(
            F.expr(
                f"CASE WHEN {_CAP_SPARK.format(salt='c1')} THEN 1 ELSE 0 END"
            ).alias("c1"),
            F.expr(
                f"CASE WHEN {_CAP_SPARK.format(salt='c2')} THEN 1 ELSE 0 END"
            ).alias("c2"),
        )
    )
    m = users.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_true"),
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
        F.sum(F.col("c1") * F.col("c2")).cast("long").alias("m"),
    )
    return m.selectExpr(
        "n_true",
        "n1 AS n_capture1",
        "n2 AS n_capture2",
        "m AS n_both",
        f"{_LP_EST} AS lp_estimate",
        f"{_CHAPMAN_EST} AS chapman_estimate",
        f"({_CHAPMAN_EST} - n_true) / n_true AS chapman_rel_err",
    )


# ---------------------------------------------------------------------------
# vocabulary saturation: Good-Turing unseen mass + Chao1 richness
# ---------------------------------------------------------------------------

#: estimators over the frequency-of-frequencies, ONE shared text each:
#: Good-Turing unseen probability mass P₀ = n₁/N, and the
#: bias-corrected Chao1 richness S_obs + n₁(n₁−1)/(2(n₂+1)) — defined
#: even when no doubletons exist
_GT_P0 = "CAST(n1 AS DOUBLE) / n_tokens"
_CHAO1 = (
    "CAST(s_obs AS DOUBLE)"
    " + CAST(n1 AS DOUBLE) * (n1 - 1) / (CAST(2.0 AS DOUBLE) * (n2 + 1))"
)

_VOCAB_SAT_ORACLE = f"""
WITH toks AS (
    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
    FROM documents WHERE trim(text) <> ''
),
freq AS (SELECT word, CAST(count(*) AS BIGINT) AS f FROM toks GROUP BY 1),
fof AS (
    SELECT CAST(count(*) AS BIGINT) AS s_obs,
           CAST(sum(f) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(sum(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
    FROM freq
)
SELECT n_tokens, s_obs AS vocab_observed, n1 AS n_singletons,
       n2 AS n_doubletons,
       {_GT_P0} AS unseen_mass_gt,
       {_CHAO1} AS chao1_richness,
       ({_CHAO1} - s_obs) / s_obs AS unseen_vocab_share
FROM fof
"""


@register(
    "q_vocab_saturation",
    oracle=_VOCAB_SAT_ORACLE,
    tags=("text", "vocabulary", "good-turing", "chao1", "training-data"),
)
def q_vocab_saturation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary saturation diagnostics — "will more data still add
    new words?": the Good-Turing unseen probability mass P₀ = n₁/N
    (the chance the NEXT token is a never-seen word) and the
    bias-corrected Chao1 richness estimate of the TOTAL vocabulary,
    both read off the token frequency-of-frequencies. High P₀ /
    unseen share ⇒ the corpus is still discovering its vocabulary
    (more data pays); near zero ⇒ saturated (more data only re-weights
    known tokens). Same whitespace tokenizer as the NB family; counts
    exact BIGINTs, one shared division per estimator (Chao1's +1 keeps
    it defined with no doubletons).

    100 TB: one token shuffle bounded by the vocabulary, then a
    4-number state — the wordcount scale shape."""
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(F.trim(F.col("text")).alias("t"))
        .filter(F.col("t") != "")
        .select(F.explode(F.split("t", r"\s+")).alias("word"))
    )
    freq = toks.groupBy("word").agg(F.count(F.lit(1)).alias("f"))
    fof = freq.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("s_obs"),
        F.sum("f").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("f") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("f") == 2, 1).otherwise(0))
        .cast("long")
        .alias("n2"),
    )
    return fof.selectExpr(
        "n_tokens",
        "s_obs AS vocab_observed",
        "n1 AS n_singletons",
        "n2 AS n_doubletons",
        f"{_GT_P0} AS unseen_mass_gt",
        f"{_CHAO1} AS chao1_richness",
        f"({_CHAO1} - s_obs) / s_obs AS unseen_vocab_share",
    )
