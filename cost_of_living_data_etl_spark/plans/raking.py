"""Survey raking (iterative proportional fitting) weight calibration.

The weighting step every biased-sample pipeline needs: given a sample
whose (status × priority) composition diverges from the population,
fit per-cell calibration weights so the weighted sample reproduces
BOTH population margins — classic raking / IPF (Deming & Stephan
1940), the workhorse behind survey weighting and post-stratified
metric readouts. Here the "population" is the full orders table and
the sample is a deterministically BIASED subset (md5-bucket inclusion
with an extra status-F quota), so the fit does real work and the
whole thing replays bit-for-bit.

Mechanics: the 3×5 cell-count grid pivots to ONE row of columns, and
RAKE_K row-scale/column-scale rounds run as a chain of projection
CTEs — the same engine-shared unrolled-iteration shape as the Markov
solve (`plans/attribution_markov.py`): both engines execute the SAME
generated text, every scale factor is a division of a det-ordered
arithmetic tree written in fixed literal order, so the K-round
truncation IS the statistic and parity never depends on convergence.
Zero-margin guards: a sample row/column with zero mass keeps weight 0
(CASE-guarded divisions on both engines).

100 TB: two partial-agg passes (population margins, sample cells) to
a constant 15-cell state; the IPF solve is corpus-size-free. More
dimensions ⇒ rake pairwise margins in the same loop (the standard
multiway IPF), grid still bounded by the category product.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cost_of_living_data_etl_spark.functions.checkpoints import (
    eager_checkpoint,
)
from cost_of_living_data_etl_spark.plans.catalog import register
from cost_of_living_data_etl_spark.plans.reshape import (
    _BUCKET_SPARK,
    _BUCKET_SQL,
    PRIORITIES,
)
from cost_of_living_data_etl_spark.sources.tables import load_table

STATUSES = ("F", "O", "P")
RAKE_K = 8  # row+column scaling rounds (statistic defined at K)

#: deterministic biased inclusion: ~20% of everything plus an extra
#: status-F quota — the bias raking must undo
_SAMPLE_PRED = "({b} < 20 OR (o_orderstatus = 'F' AND {b} < 60))"

_D0 = "CAST(0.0 AS DOUBLE)"


def _rake_suffix() -> str:
    """Engine-shared text: pivot `{cells}` (s, p, n) and `{margins}`
    (row targets r_i, column targets c_j) to one row, run RAKE_K
    unrolled scaling rounds, emit one row per cell. Every stage binds
    FRESH column names (w{k}_/rw{k}_), so no reference is ever
    ambiguous between an input column and a same-SELECT alias —
    engines differ on that precedence."""
    ns = len(STATUSES)
    np_ = len(PRIORITIES)
    m_cols = ",\n    ".join(
        f"coalesce(max(CASE WHEN s = '{s}' AND p = '{p}' "
        f"THEN CAST(n AS DOUBLE) END), {_D0}) AS n_{i}_{j}"
        for i, s in enumerate(STATUSES)
        for j, p in enumerate(PRIORITIES)
    )
    t_cols = ",\n    ".join(
        [
            f"coalesce(max(CASE WHEN s = '{s}' THEN CAST(rn AS DOUBLE) END),"
            f" {_D0}) AS r_{i}"
            for i, s in enumerate(STATUSES)
        ]
        + [
            f"coalesce(max(CASE WHEN p = '{p}' THEN CAST(cn AS DOUBLE) END),"
            f" {_D0}) AS c_{j}"
            for j, p in enumerate(PRIORITIES)
        ]
    )
    zero = ",\n    ".join(
        f"n_{i}_{j} AS w0_{i}_{j}" for i in range(ns) for j in range(np_)
    )
    its = [f"it0 AS (SELECT m.*, t.*,\n    {zero}\nFROM m, t)"]
    carry = ", ".join(
        [f"n_{i}_{j}" for i in range(ns) for j in range(np_)]
        + [f"r_{i}" for i in range(ns)]
        + [f"c_{j}" for j in range(np_)]
    )
    for k in range(1, RAKE_K + 1):
        prev = f"w{k - 1}"
        rowsum = {
            i: " + ".join(f"{prev}_{i}_{j}" for j in range(np_))
            for i in range(ns)
        }
        row_pass = ",\n    ".join(
            f"CASE WHEN ({rowsum[i]}) > 0 THEN {prev}_{i}_{j} * r_{i}"
            f" / ({rowsum[i]}) ELSE {_D0} END AS rw{k}_{i}_{j}"
            for i in range(ns)
            for j in range(np_)
        )
        its.append(
            f"row{k} AS (SELECT {carry},\n    {row_pass}\nFROM it{k - 1})"
        )
        colsum = {
            j: " + ".join(f"rw{k}_{i}_{j}" for i in range(ns))
            for j in range(np_)
        }
        col_pass = ",\n    ".join(
            f"CASE WHEN ({colsum[j]}) > 0 THEN rw{k}_{i}_{j} * c_{j}"
            f" / ({colsum[j]}) ELSE {_D0} END AS w{k}_{i}_{j}"
            for i in range(ns)
            for j in range(np_)
        )
        its.append(f"it{k} AS (SELECT {carry},\n    {col_pass}\nFROM row{k})")
    its_sql = ",\n".join(its)
    W = f"w{RAKE_K}"
    # ONE chain execution: a 15-row constant grid cross-joins the final
    # state and CASE chains pick each cell — a 15-branch UNION re-ran
    # the whole CTE chain per branch (measured ~18 s; this form ~2 s)
    grid = "\nUNION ALL ".join(
        f"SELECT '{s}' AS gs, '{p}' AS gp"
        for s in STATUSES
        for p in PRIORITIES
    )
    pick_n = "CASE " + " ".join(
        f"WHEN gs = '{s}' AND gp = '{p}' THEN n_{i}_{j}"
        for i, s in enumerate(STATUSES)
        for j, p in enumerate(PRIORITIES)
    ) + " END"
    pick_w = "CASE " + " ".join(
        f"WHEN gs = '{s}' AND gp = '{p}' THEN {W}_{i}_{j}"
        for i, s in enumerate(STATUSES)
        for j, p in enumerate(PRIORITIES)
    ) + " END"
    return f"""
m AS (
    SELECT
    {m_cols}
    FROM ({{cells}}) cells_
),
t AS (
    SELECT
    {t_cols}
    FROM ({{margins}}) margins_
),
{its_sql},
base AS (
    SELECT gs, gp, {pick_n} AS n_cell, {pick_w} AS w_cell
    FROM it{RAKE_K} CROSS JOIN ({grid}) g
)
SELECT gs AS o_orderstatus, gp AS o_orderpriority,
       CAST(n_cell AS BIGINT) AS n_sample,
       w_cell AS raked_total,
       CASE WHEN n_cell > 0 THEN w_cell / n_cell ELSE {_D0} END
         AS weight_per_record
FROM base ORDER BY o_orderstatus, o_orderpriority
"""


_CELLS_SQL = f"""
SELECT o_orderstatus AS s, o_orderpriority AS p, count(*) AS n
FROM orders WHERE {_SAMPLE_PRED.format(b=_BUCKET_SQL.format(k="o_orderkey"))}
GROUP BY 1, 2
"""

_MARGINS_SQL = """
SELECT s, p, rn, cn FROM (
    SELECT o_orderstatus AS s, CAST(NULL AS VARCHAR) AS p,
           count(*) AS rn, CAST(NULL AS BIGINT) AS cn
    FROM orders GROUP BY 1
    UNION ALL
    SELECT CAST(NULL AS VARCHAR), o_orderpriority,
           CAST(NULL AS BIGINT), count(*)
    FROM orders GROUP BY 2
) u
"""

_RAKE_ORACLE = "WITH " + _rake_suffix().format(
    cells=_CELLS_SQL, margins=_MARGINS_SQL
).lstrip("\n")


@register(
    "q_raking_ipf_weights",
    oracle=_RAKE_ORACLE,
    tags=("weighting", "raking", "ipf", "survey", "calibration"),
)
def q_raking_ipf_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raking / iterative-proportional-fitting calibration weights for
    a deterministically biased order sample: RAKE_K row/column scaling
    rounds fit per-(status, priority) weights whose totals reproduce
    the full table's margins — the survey-weighting step that turns a
    skewed sample into unbiased margin estimates. Emits per cell the
    sample count, the raked total, and the per-record weight. See the
    module docstring for the unrolled-iteration parity contract."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = _BUCKET_SPARK.format(k="o_orderkey")
    # ONE orders pass (round 9; previously three: sample cells + row
    # margins + column margins each re-scanned the fact table): the
    # per-(status, priority) rollup carries BOTH the population count
    # and the sample count, and the margins are exact-integer sums of
    # that ≤15-row grid.
    base = (
        orders.groupBy(
            F.col("o_orderstatus").alias("s"),
            F.col("o_orderpriority").alias("p"),
        )
        .agg(
            F.count(F.lit(1)).alias("nf"),
            F.sum(
                F.when(F.expr(_SAMPLE_PRED.format(b=bucket)), 1).otherwise(0)
            ).alias("n"),
        )
        .transform(eager_checkpoint)
    )
    cells = base.filter(F.col("n") > 0).select("s", "p", "n")
    rown = base.groupBy("s").agg(F.sum("nf").alias("rn")).select(
        "s", F.lit(None).cast("string").alias("p"), "rn",
        F.lit(None).cast("long").alias("cn"))
    coln = base.groupBy("p").agg(F.sum("nf").alias("cn")).select(
        F.lit(None).cast("string").alias("s"), "p",
        F.lit(None).cast("long").alias("rn"), "cn")
    # Round 10: the two second-level checkpoints here were STALE — they
    # guarded a 15-branch final union that round 8 already replaced
    # with the single CASE-chain execution, after which the `m` and `t`
    # CTEs each read their view exactly ONCE. Two synchronous
    # checkpoint jobs for once-read 15-row frames are pure cost (the
    # r9 checkpoint rule); base stays materialized because THREE
    # branches (cells, row margins, column margins) prune it
    # differently. Interleaved A/B keep-vs-drop: 4.65 vs 4.45 s med
    # (flat within host noise), 2 fewer jobs.
    cells.createOrReplaceTempView("rake_cells_v")
    rown.unionByName(coln).createOrReplaceTempView("rake_margins_v")
    return spark.sql(
        "WITH "
        + _rake_suffix()
        .format(
            cells="SELECT * FROM rake_cells_v",
            margins="SELECT * FROM rake_margins_v",
        )
        .lstrip("\n")
    )
