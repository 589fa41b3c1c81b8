"""Observational causal inference: subclassification (stratified) ATE.

The catalog's experimentation family (Welch/CUPED/DiD/QTE/SPRT) all
assume RANDOMIZED treatment. This operator is the observational
counterpart: when treatment take-up depends on covariates, the naive
treated-vs-control mean difference confounds the effect with the
composition, and the classic fix (Cochran 1968 subclassification —
the nonparametric core of propensity-score stratification) estimates
ATE = Σ_cells (n_cell/N) · (ȳ_T(cell) − ȳ_C(cell)) over covariate
cells, dropping cells without COMMON SUPPORT (both arms present) and
reporting how much mass was dropped — the honesty knob pure modeling
hides.

Fixture design: treatment is a deterministic md5-bucket rule whose
RATE depends on a covariate (urgent-priority orders enroll at 70%,
others at 30%) — observational selection with guaranteed overlap, no
RNG, replayable on both engines. Covariate cells are the
(priority × status) grid; outcome is the order value.

Exactness: order values live on the cent grid, so every value sum is
an exact BIGINT cent sum (order-free — no float fold discipline needed
anywhere on the data path); each mean is one shared-text division, and
only the ≤15 per-cell weighted terms take a det_sum fold. The naive
difference is computed beside the estimate so the confounding gap is
the readout.

100 TB: ONE integer partial-agg pass to the covariate-cell × arm
rollup (bounded by the category product), then constant-size
arithmetic — no data-scale float collection anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cost_of_living_data_etl_spark.functions.columns import det_sum
from cost_of_living_data_etl_spark.plans.catalog import register
from cost_of_living_data_etl_spark.plans.mllite import _DSUM_SQL
from cost_of_living_data_etl_spark.plans.reshape import (
    _BUCKET_SPARK,
    _BUCKET_SQL,
)
from cost_of_living_data_etl_spark.sources.tables import load_table

#: covariate-dependent enrolment: urgent-ish priorities at 70%,
#: everything else at 30% — deterministic observational selection
_TREAT_PRED = (
    "(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
    " THEN {b} < 70 ELSE {b} < 30 END)"
)

#: shared per-cell term: weight × within-cell arm contrast (cent sums
#: → one division each, /100 back to currency units)
_CELL_TERM = (
    "CAST(n_cell AS DOUBLE) * ((CAST(sum_t AS DOUBLE) / n_t"
    " - CAST(sum_c AS DOUBLE) / n_c) / CAST(100.0 AS DOUBLE))"
)

_ATE_ORACLE = f"""
WITH scored AS (
    SELECT o_orderpriority AS prio, o_orderstatus AS status,
           CASE WHEN {_TREAT_PRED.format(b=_BUCKET_SQL.format(k="o_orderkey"))}
                THEN 1 ELSE 0 END AS treated,
           CAST(round(o_totalprice * 100) AS BIGINT) AS yc
    FROM orders
),
cells AS (
    SELECT prio, status,
           CAST(count(*) AS BIGINT) AS n_cell,
           CAST(sum(treated) AS BIGINT) AS n_t,
           CAST(sum(1 - treated) AS BIGINT) AS n_c,
           CAST(sum(CASE WHEN treated = 1 THEN yc ELSE 0 END) AS BIGINT) AS sum_t,
           CAST(sum(CASE WHEN treated = 0 THEN yc ELSE 0 END) AS BIGINT) AS sum_c
    FROM scored GROUP BY 1, 2
),
overall AS (
    SELECT CAST(sum(treated) AS BIGINT) AS nt,
           CAST(sum(1 - treated) AS BIGINT) AS nc,
           CAST(sum(CASE WHEN treated = 1 THEN yc ELSE 0 END) AS BIGINT) AS st,
           CAST(sum(CASE WHEN treated = 0 THEN yc ELSE 0 END) AS BIGINT) AS sc
    FROM scored
),
supported AS (SELECT * FROM cells WHERE n_t > 0 AND n_c > 0),
agg AS (
    SELECT CAST(count(*) AS BIGINT) AS n_cells_supported,
           CAST(sum(n_cell) AS BIGINT) AS n_supported,
           {_DSUM_SQL.format(x=_CELL_TERM)} AS wsum
    FROM supported
),
tot AS (SELECT CAST(sum(n_cell) AS BIGINT) AS n_all,
               CAST(count(*) AS BIGINT) AS n_cells_all
        FROM cells)
SELECT o.nt AS n_treated,
       o.nc AS n_control,
       (CAST(o.st AS DOUBLE) / o.nt - CAST(o.sc AS DOUBLE) / o.nc)
         / CAST(100.0 AS DOUBLE) AS naive_diff,
       a.wsum / a.n_supported AS ate_subclass,
       a.n_cells_supported,
       t.n_cells_all - a.n_cells_supported AS n_cells_dropped,
       CAST(t.n_all - a.n_supported AS DOUBLE) / t.n_all AS dropped_share
FROM overall o, agg a, tot t
"""


@register(
    "q_subclassification_ate",
    oracle=_ATE_ORACLE,
    tags=("causal", "observational", "stratification", "ate"),
)
def q_subclassification_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subclassification ATE of a covariate-dependent treatment on
    order value: within-cell arm contrasts weighted by cell mass over
    the (priority × status) grid, restricted to common-support cells,
    reported beside the naive difference (their gap IS the measured
    confounding) and the dropped-mass share. See the module docstring
    for the selection rule and exactness contract."""
    bucket = _BUCKET_SPARK.format(k="o_orderkey")
    scored = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderstatus").alias("status"),
        F.expr(
            f"CASE WHEN {_TREAT_PRED.format(b=bucket)} THEN 1 ELSE 0 END"
        ).alias("treated"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("yc"),
    )
    cells = scored.groupBy("prio", "status").agg(
        F.count(F.lit(1)).cast("long").alias("n_cell"),
        F.sum("treated").cast("long").alias("n_t"),
        F.sum(1 - F.col("treated")).cast("long").alias("n_c"),
        F.expr("CAST(sum(CASE WHEN treated = 1 THEN yc ELSE 0 END) AS BIGINT)").alias("sum_t"),
        F.expr("CAST(sum(CASE WHEN treated = 0 THEN yc ELSE 0 END) AS BIGINT)").alias("sum_c"),
    )
    overall = scored.groupBy().agg(
        F.sum("treated").cast("long").alias("nt"),
        F.sum(1 - F.col("treated")).cast("long").alias("nc"),
        F.expr("CAST(sum(CASE WHEN treated = 1 THEN yc ELSE 0 END) AS BIGINT)").alias("st"),
        F.expr("CAST(sum(CASE WHEN treated = 0 THEN yc ELSE 0 END) AS BIGINT)").alias("sc"),
    )
    supported = cells.filter((F.col("n_t") > 0) & (F.col("n_c") > 0))
    agg = supported.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_cells_supported"),
        F.sum("n_cell").cast("long").alias("n_supported"),
        det_sum(_CELL_TERM).alias("wsum"),
    )
    tot = cells.groupBy().agg(
        F.sum("n_cell").cast("long").alias("n_all"),
        F.count(F.lit(1)).cast("long").alias("n_cells_all"),
    )
    return (
        overall.crossJoin(F.broadcast(agg))
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "nt AS n_treated",
            "nc AS n_control",
            "(CAST(st AS DOUBLE) / nt - CAST(sc AS DOUBLE) / nc)"
            " / CAST(100.0 AS DOUBLE) AS naive_diff",
            "wsum / n_supported AS ate_subclass",
            "n_cells_supported",
            "n_cells_all - n_cells_supported AS n_cells_dropped",
            "CAST(n_all - n_supported AS DOUBLE) / n_all AS dropped_share",
        )
    )


# ---------------------------------------------------------------------------
# IPW (Horvitz-Thompson / Hájek) ATE under the KNOWN enrolment design
# ---------------------------------------------------------------------------

#: the enrolment rule's DESIGN probabilities — known by construction
#: (the md5 rule enrols urgent-ish priorities at 70%, the rest at 30%),
#: which is what makes this the design-based estimator rather than a
#: modeled-propensity one. Shared literals.
_P_HI = "0.7"
_P_LO = "0.3"
_PC = (
    "CASE WHEN prio IN ('1-URGENT', '2-HIGH')"
    f" THEN CAST({_P_HI} AS DOUBLE) ELSE CAST({_P_LO} AS DOUBLE) END"
)

#: per-propensity-class Horvitz-Thompson terms from exact cent sums —
#: the weights attach to CLASS AGGREGATES (p is constant within a
#: class), so no data-scale float sum exists anywhere
_HT_T1 = "(CAST(s_t AS DOUBLE) / CAST(100.0 AS DOUBLE)) / pc"
_HT_T0 = (
    "(CAST(s_c AS DOUBLE) / CAST(100.0 AS DOUBLE))"
    " / (CAST(1.0 AS DOUBLE) - pc)"
)
_HW_T1 = "CAST(n_t AS DOUBLE) / pc"
_HW_T0 = "CAST(n_c AS DOUBLE) / (CAST(1.0 AS DOUBLE) - pc)"

_IPW_ORACLE = f"""
WITH scored AS (
    SELECT o_orderpriority AS prio,
           CASE WHEN {_TREAT_PRED.format(b=_BUCKET_SQL.format(k="o_orderkey"))}
                THEN 1 ELSE 0 END AS treated,
           CAST(round(o_totalprice * 100) AS BIGINT) AS yc
    FROM orders
),
classes AS (
    SELECT {_PC} AS pc,
           CAST(count(*) AS BIGINT) AS n_class,
           CAST(sum(treated) AS BIGINT) AS n_t,
           CAST(sum(1 - treated) AS BIGINT) AS n_c,
           CAST(sum(CASE WHEN treated = 1 THEN yc ELSE 0 END) AS BIGINT)
             AS s_t,
           CAST(sum(CASE WHEN treated = 0 THEN yc ELSE 0 END) AS BIGINT)
             AS s_c
    FROM scored GROUP BY 1
),
agg AS (
    SELECT CAST(sum(n_class) AS BIGINT) AS n,
           {_DSUM_SQL.format(x=_HT_T1)} AS y1,
           {_DSUM_SQL.format(x=_HT_T0)} AS y0,
           {_DSUM_SQL.format(x=_HW_T1)} AS w1,
           {_DSUM_SQL.format(x=_HW_T0)} AS w0
    FROM classes
)
SELECT n AS n_orders,
       y1 / n - y0 / n AS ate_ipw_ht,
       CASE WHEN w1 > 0 AND w0 > 0 THEN y1 / w1 - y0 / w0
            ELSE CAST(0.0 AS DOUBLE) END AS ate_ipw_hajek
FROM agg
"""


@register(
    "q_ipw_ate",
    oracle=_IPW_ORACLE,
    tags=("causal", "observational", "ipw", "horvitz-thompson", "ate"),
)
def q_ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted ATE under the KNOWN enrolment
    design — the design-based companion to `q_subclassification_ate`
    on the same covariate-dependent treatment: Horvitz-Thompson
    (1/N normalization, unbiased but variance-prone) and Hájek
    (self-normalized, the production default) estimates, both from
    per-propensity-class exact cent sums so the inverse weights attach
    to class aggregates and no data-scale float sum exists. Two
    estimators + subclassification agreeing is the standard
    observational-robustness check.

    100 TB: one integer partial-agg pass to the ≤2 propensity classes,
    then constant-size arithmetic."""
    bucket = _BUCKET_SPARK.format(k="o_orderkey")
    scored = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.expr(
            f"CASE WHEN {_TREAT_PRED.format(b=bucket)} THEN 1 ELSE 0 END"
        ).alias("treated"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("yc"),
    )
    classes = scored.groupBy(F.expr(_PC).alias("pc")).agg(
        F.count(F.lit(1)).cast("long").alias("n_class"),
        F.sum("treated").cast("long").alias("n_t"),
        F.sum(1 - F.col("treated")).cast("long").alias("n_c"),
        F.expr(
            "CAST(sum(CASE WHEN treated = 1 THEN yc ELSE 0 END) AS BIGINT)"
        ).alias("s_t"),
        F.expr(
            "CAST(sum(CASE WHEN treated = 0 THEN yc ELSE 0 END) AS BIGINT)"
        ).alias("s_c"),
    )
    agg = classes.groupBy().agg(
        F.sum("n_class").cast("long").alias("n"),
        det_sum(_HT_T1).alias("y1"),
        det_sum(_HT_T0).alias("y0"),
        det_sum(_HW_T1).alias("w1"),
        det_sum(_HW_T0).alias("w0"),
    )
    return agg.selectExpr(
        "n AS n_orders",
        "y1 / n - y0 / n AS ate_ipw_ht",
        "CASE WHEN w1 > 0 AND w0 > 0 THEN y1 / w1 - y0 / w0"
        " ELSE CAST(0.0 AS DOUBLE) END AS ate_ipw_hajek",
    )
