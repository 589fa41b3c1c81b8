"""Survival and trend inference: Kaplan-Meier, Mann-Kendall,
segmented regression, difference-in-differences.

Four estimators that answer "WHEN and WHAT CHANGED" questions the
descriptive time-series family (seasonal decomposition, CUSUM, EWMA,
Theil-Sen) stops short of:

- **Kaplan-Meier** time-to-conversion with right censoring — the
  correct way to average "days until first purchase" when many users
  haven't purchased YET (dropping them biases low; pretending they
  converted at cutoff biases high; KM handles both);
- **Mann-Kendall** — the NONPARAMETRIC monotone-trend test: sign
  statistics only, so one outlier month can't fake or hide a trend;
  the significance half of the Theil-Sen pairing (TS estimates the
  slope, MK says whether it's real);
- **segmented regression** — best single breakpoint by least squares,
  both slopes, from ONE pass of prefix sums (CUSUM flags *when* a
  level shifted; this fits *what the trend was* on each side);
- **difference-in-differences** — the 2×2 (arm × period) causal
  contrast that nets out the secular trend a naive before/after
  comparison confounds.

Float discipline: event counts, risk sets, durations, sign sums and
all regression moments are exact BIGINTs (money in cents); every
float is ONE shared expression over those integers, and the KM curve
is a sequential fold of identical doubles in identical order (the
det_sum convention for products).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from cost_of_living_data_etl_spark.plans.catalog import register
from cost_of_living_data_etl_spark.sources.tables import load_table

US_PER_DAY = 86_400_000_000
SEG_MIN_LEN = 3  # segmented regression: min points per side
DID_SPLIT = "1997-01-01"  # diff-in-diff before/after boundary


# --- Kaplan-Meier time-to-first-purchase ------------------------------------

_KM_ORACLE = f"""
WITH u AS (
    SELECT user_id,
           min(epoch_us(ts)) AS t0,
           min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tp,
           (SELECT max(epoch_us(ts)) FROM events) AS tmax
    FROM events GROUP BY user_id
),
dur AS (
    SELECT CASE WHEN tp IS NOT NULL AND tp >= t0
                THEN (tp - t0) // {US_PER_DAY}
                ELSE (tmax - t0) // {US_PER_DAY} END AS t,
           CASE WHEN tp IS NOT NULL AND tp >= t0 THEN 1 ELSE 0 END AS ev
    FROM u
),
tot AS (SELECT count(*) AS n_users FROM dur),
at_t AS (SELECT t, sum(ev) AS d, sum(1 - ev) AS c FROM dur GROUP BY t),
risk AS (
    SELECT t, d,
           n_users - coalesce(sum(d + c) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n
    FROM at_t CROSS JOIN tot
),
ev_t AS (
    SELECT t, d, n,
           1.0 - CAST(d AS DOUBLE) / CAST(n AS DOUBLE) AS r,
           row_number() OVER (ORDER BY t) AS rn
    FROM risk WHERE d > 0
),
arr AS (SELECT list(r ORDER BY t) AS rs FROM ev_t)
SELECT CAST(e.t AS BIGINT) AS t_day, CAST(e.n AS BIGINT) AS n_risk,
       CAST(e.d AS BIGINT) AS d_events,
       list_reduce(a.rs[1:CAST(e.rn AS INT)], (x, y) -> x * y) AS survival
FROM ev_t e CROSS JOIN arr a
ORDER BY t_day
"""


@register(
    "q_km_survival_conversion",
    oracle=_KM_ORACLE,
    tags=("survival", "censoring", "events"),
)
def q_km_survival_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier curve of days from a user's first event to first
    purchase, right-censored at the stream end: S(t) = Π over event
    days ≤ t of (1 − d/n). Censored users leave the risk set at their
    censor day WITHOUT counting as conversions — the estimator's whole
    point; both naive alternatives (drop them / count them) are
    wrong in opposite directions.

    Exactness: durations are integral days, risk sets and event counts
    exact BIGINTs from one cumulative window; each factor 1 − d/n is
    the same division of the same ints on both engines, and the curve
    is a SEQUENTIAL fold of those factors in day order (Spark
    `aggregate(slice(...))`, DuckDB `list_reduce(arr[1:rn], ...)`) —
    identical multiplications in identical order, bit-identical curve.

    100 TB: per-user reduction is one partial-aggregated groupBy; the
    curve math runs on the |distinct durations| rollup (human-time-
    bounded). The factor array broadcast is |event days| doubles.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    tmax = ev.groupBy().agg(F.max("ts_us").alias("tmax"))
    u = (
        ev.groupBy("user_id")
        .agg(
            F.min("ts_us").alias("t0"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts_us"))
            ).alias("tp"),
        )
        .crossJoin(F.broadcast(tmax))
    )
    has_ev = F.col("tp").isNotNull() & (F.col("tp") >= F.col("t0"))
    dur = u.select(
        F.when(has_ev, (F.col("tp") - F.col("t0")))
        .otherwise(F.col("tmax") - F.col("t0"))
        .alias("span_us"),
        F.when(has_ev, 1).otherwise(0).alias("ev"),
    ).select(
        F.expr(f"span_us div {US_PER_DAY}").alias("t"), "ev"
    )
    tot = dur.groupBy().agg(F.count(F.lit(1)).alias("n_users"))
    at_t = dur.groupBy("t").agg(
        F.sum("ev").alias("d"), F.sum(1 - F.col("ev")).alias("c")
    )
    before = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = at_t.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        (
            F.col("n_users")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(before), F.lit(0))
        ).alias("n"),
    )
    ev_t = risk.filter(F.col("d") > 0).select(
        "t",
        "d",
        "n",
        (1.0 - F.col("d").cast("double") / F.col("n").cast("double")).alias(
            "r"
        ),
        F.row_number().over(Window.orderBy("t")).alias("rn"),
    )
    arr = ev_t.groupBy().agg(
        F.expr("transform(array_sort(collect_list(struct(t, r))), s -> s.r)")
        .alias("rs")
    )
    return (
        ev_t.crossJoin(F.broadcast(arr))
        .select(
            F.col("t").cast("long").alias("t_day"),
            F.col("n").cast("long").alias("n_risk"),
            F.col("d").cast("long").alias("d_events"),
            F.expr(
                "aggregate(slice(rs, 1, rn), cast(1.0 AS DOUBLE),"
                " (x, y) -> x * y)"
            ).alias("survival"),
        )
        .orderBy("t_day")
    )


# --- Mann-Kendall monotone trend test ---------------------------------------

_MK_ORACLE = """
WITH m AS (
    SELECT date_trunc('month', o_orderdate) AS mon,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
    FROM orders GROUP BY 1
),
p AS (
    SELECT sum(CASE WHEN b.rev > a.rev THEN 1
                    WHEN b.rev < a.rev THEN -1 ELSE 0 END) AS s
    FROM m a JOIN m b ON a.mon < b.mon
),
n_t AS (SELECT count(*) AS n FROM m),
ties AS (
    SELECT coalesce(sum(tp * (tp - 1) * (2 * tp + 5)), 0) AS tie_term
    FROM (SELECT count(*) AS tp FROM m GROUP BY rev HAVING count(*) > 1)
)
SELECT CAST(n AS BIGINT) AS n_months, CAST(s AS BIGINT) AS s_stat,
       (CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5) - tie_term) / 18.0 AS var_s,
       CAST(s AS DOUBLE) / (0.5 * CAST(n AS DOUBLE) * (n - 1)) AS tau
FROM p, n_t, ties
"""


@register(
    "q_mann_kendall_trend",
    oracle=_MK_ORACLE,
    tags=("timeseries", "nonparametric", "trend"),
)
def q_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall test on monthly revenue: S = Σ sign(later − earlier)
    over all month pairs, its tie-corrected variance, and Kendall's τ.
    Signs only — a spiked month moves S by at most its pair count, so
    the test can't be faked or masked by outliers; the significance
    companion to `q_theilsen_revenue_trend`'s robust slope (TS says
    how steep, MK says whether it's real).

    S, n, and tie groups are exact integers (revenue compared in
    cents); variance and τ are one shared float expression each.

    100 TB: the pair join is over the MONTHLY rollup — calendar-
    bounded (a decade ≈ 120 rows ⇒ ~7k pairs) regardless of order
    volume, the same scale-honesty argument as Theil-Sen.
    """
    m = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("mon"))
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("rev")
        )
    )
    a = m.select(F.col("mon").alias("ma"), F.col("rev").alias("ra"))
    b = m.select(F.col("mon").alias("mb"), F.col("rev").alias("rb"))
    p = (
        a.join(b, F.col("ma") < F.col("mb"))
        .groupBy()
        .agg(
            F.sum(
                F.when(F.col("rb") > F.col("ra"), 1)
                .when(F.col("rb") < F.col("ra"), -1)
                .otherwise(0)
            ).alias("s")
        )
    )
    n_t = m.groupBy().agg(F.count(F.lit(1)).alias("n"))
    ties = (
        m.groupBy("rev")
        .agg(F.count(F.lit(1)).alias("tp"))
        .filter(F.col("tp") > 1)
        .groupBy()
        .agg(
            F.coalesce(
                F.sum(
                    F.col("tp") * (F.col("tp") - 1) * (2 * F.col("tp") + 5)
                ),
                F.lit(0),
            ).alias("tie_term")
        )
    )
    return (
        p.crossJoin(F.broadcast(n_t))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("n").cast("long").alias("n_months"),
            F.col("s").cast("long").alias("s_stat"),
            F.expr(
                "(CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5) - tie_term)"
                " / 18.0"
            ).alias("var_s"),
            F.expr(
                "CAST(s AS DOUBLE) / (0.5 * CAST(n AS DOUBLE) * (n - 1))"
            ).alias("tau"),
        )
    )


# --- segmented regression breakpoint ----------------------------------------

# explained-variance term of one segment from its moment sums — the
# Syy-free form: argmin SSE(k) == argmax explained(k) because Syy_total
# is constant in k, which keeps every running sum inside BIGINT
# (Σy² of cent-scale values would need int128/decimal)
_SEG_TERM = """(CAST({y} AS DOUBLE) * {y} / {n}
  + (CAST({xy} AS DOUBLE) - CAST({x} AS DOUBLE) * {y} / {n})
    * (CAST({xy} AS DOUBLE) - CAST({x} AS DOUBLE) * {y} / {n})
    / (CAST({xx} AS DOUBLE) - CAST({x} AS DOUBLE) * {x} / {n}))"""

_SEG_SLOPE = """(CAST({xy} AS DOUBLE) - CAST({x} AS DOUBLE) * {y} / {n})
  / (CAST({xx} AS DOUBLE) - CAST({x} AS DOUBLE) * {x} / {n}) / 100.0"""

_SEG_ORACLE = f"""
WITH daily AS (
    SELECT date_trunc('day', o_orderdate) AS day,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders GROUP BY 1
),
idx AS (
    SELECT row_number() OVER (ORDER BY day) - 1 AS x, day, cents,
           count(*) OVER () AS n
    FROM daily
),
pre AS (
    SELECT x, day, n,
           sum(x)         OVER w AS sx,  sum(cents)     OVER w AS sy,
           sum(x * x)     OVER w AS sxx, sum(x * cents) OVER w AS sxy,
           (SELECT sum(x) FROM idx)         AS tx,
           (SELECT sum(cents) FROM idx)     AS ty,
           (SELECT sum(x * x) FROM idx)     AS txx,
           (SELECT sum(x * cents) FROM idx) AS txy
    FROM idx
    WINDOW w AS (ORDER BY x ROWS UNBOUNDED PRECEDING)
),
cand AS (
    SELECT day, x + 1 AS nl, n - x - 1 AS nr, sx, sy, sxx, sxy,
           tx - sx AS rx, ty - sy AS ry, txx - sxx AS rxx, txy - sxy AS rxy
    FROM pre WHERE x + 1 >= {SEG_MIN_LEN} AND n - x - 1 >= {SEG_MIN_LEN}
),
scored AS (
    SELECT day, nl, nr,
           {_SEG_TERM.format(y="sy", x="sx", xx="sxx", xy="sxy", n="nl")}
           + {_SEG_TERM.format(y="ry", x="rx", xx="rxx", xy="rxy", n="nr")}
             AS explained,
           {_SEG_SLOPE.format(y="sy", x="sx", xx="sxx", xy="sxy", n="nl")}
             AS left_slope,
           {_SEG_SLOPE.format(y="ry", x="rx", xx="rxx", xy="rxy", n="nr")}
             AS right_slope
    FROM cand
)
SELECT day AS break_day, CAST(nl AS BIGINT) AS n_left,
       CAST(nr AS BIGINT) AS n_right, left_slope, right_slope
FROM scored ORDER BY explained DESC, day LIMIT 1
"""


@register(
    "q_segmented_regression_break",
    oracle=_SEG_ORACLE,
    tags=("timeseries", "changepoint", "regression"),
)
def q_segmented_regression_break(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best single breakpoint of daily revenue by two-piece least
    squares: the split day minimizing SSE_left + SSE_right, with the
    fitted slope on each side — CUSUM (`q_cusum_changepoint_revenue`)
    flags WHEN a shift started; this fits WHAT the trend was before
    and after it.

    Every candidate split is scored from PREFIX SUMS (Σx, Σy, Σxy,
    Σx² cumulated once; suffix = total − prefix), so all n−5
    regressions cost one window pass, not n re-fits. Minimizing SSE ≡
    maximizing the explained-variance terms, which drops Σy² from the
    math entirely. Running sums stay exact at ANY scale factor: Σx,
    Σx², Σcents fit int64 comfortably, and the one that doesn't —
    Σ(x·cents), which approaches 9.2e18 around ~1e13 cents/day × 2500²
    days — accumulates in decimal(38,0) on Spark (the TWAP/Spearman
    convention) and HUGEINT on DuckDB (its native sum(BIGINT)
    promotion), so neither engine can wrap silently. Argmax is
    by (explained DESC, day): explained is the same float expression
    over the same exact ints on both engines.

    100 TB: the candidate scan is over the calendar-bounded daily
    rollup; slopes report cents/day ÷ 100 = currency/day.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("cents")
        )
    )
    byday = Window.orderBy("day")
    idx = daily.select(
        "day",
        "cents",
        (F.row_number().over(byday) - 1).alias("x"),
        F.count(F.lit(1))
        .over(byday.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("n"),
    )
    run = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    pre = (
        idx.withColumn("sx", F.sum("x").over(run))
        .withColumn("sy", F.sum("cents").over(run))
        .withColumn("sxx", F.sum(F.col("x") * F.col("x")).over(run))
        .withColumn(
            "sxy",
            F.sum(
                (F.col("x") * F.col("cents")).cast("decimal(38,0)")
            ).over(run),
        )
    )
    totals = idx.groupBy().agg(
        F.sum("x").alias("tx"),
        F.sum("cents").alias("ty"),
        F.sum(F.col("x") * F.col("x")).alias("txx"),
        F.sum((F.col("x") * F.col("cents")).cast("decimal(38,0)")).alias("txy"),
    )
    cand = (
        pre.crossJoin(F.broadcast(totals))
        .filter(
            ((F.col("x") + 1) >= SEG_MIN_LEN)
            & ((F.col("n") - F.col("x") - 1) >= SEG_MIN_LEN)
        )
        .select(
            "day",
            (F.col("x") + 1).alias("nl"),
            (F.col("n") - F.col("x") - 1).alias("nr"),
            "sx",
            "sy",
            "sxx",
            "sxy",
            (F.col("tx") - F.col("sx")).alias("rx"),
            (F.col("ty") - F.col("sy")).alias("ry"),
            (F.col("txx") - F.col("sxx")).alias("rxx"),
            (F.col("txy") - F.col("sxy")).alias("rxy"),
        )
    )
    scored = cand.select(
        "day",
        "nl",
        "nr",
        F.expr(
            _SEG_TERM.format(y="sy", x="sx", xx="sxx", xy="sxy", n="nl")
            + " + "
            + _SEG_TERM.format(y="ry", x="rx", xx="rxx", xy="rxy", n="nr")
        ).alias("explained"),
        F.expr(
            _SEG_SLOPE.format(y="sy", x="sx", xx="sxx", xy="sxy", n="nl")
        ).alias("left_slope"),
        F.expr(
            _SEG_SLOPE.format(y="ry", x="rx", xx="rxx", xy="rxy", n="nr")
        ).alias("right_slope"),
    )
    return (
        scored.orderBy(F.col("explained").desc(), "day")
        .limit(1)
        .select(
            F.col("day").alias("break_day"),
            F.col("nl").cast("long").alias("n_left"),
            F.col("nr").cast("long").alias("n_right"),
            "left_slope",
            "right_slope",
        )
    )


# --- difference-in-differences ----------------------------------------------

_DID_ORACLE = f"""
WITH cells AS (
    SELECT o_custkey % 2 AS arm,
           CASE WHEN o_orderdate >= TIMESTAMP '{DID_SPLIT}' THEN 1 ELSE 0 END
             AS period,
           count(*) AS n,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders GROUP BY 1, 2
),
m AS (
    SELECT
      max(CASE WHEN arm = 1 AND period = 1
               THEN CAST(cents AS DOUBLE) / n / 100.0 END) AS t_after,
      max(CASE WHEN arm = 1 AND period = 0
               THEN CAST(cents AS DOUBLE) / n / 100.0 END) AS t_before,
      max(CASE WHEN arm = 0 AND period = 1
               THEN CAST(cents AS DOUBLE) / n / 100.0 END) AS c_after,
      max(CASE WHEN arm = 0 AND period = 0
               THEN CAST(cents AS DOUBLE) / n / 100.0 END) AS c_before
    FROM cells
)
SELECT t_before, t_after, c_before, c_after,
       (t_after - t_before) - (c_after - c_before) AS did
FROM m
"""


@register(
    "q_did_order_value",
    oracle=_DID_ORACLE,
    tags=("causal", "ab-test", "agg"),
)
def q_did_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on mean order value: treatment = odd
    custkeys, periods split at {DID_SPLIT}. DiD = (T_after − T_before)
    − (C_after − C_before) — the causal contrast that nets out the
    secular trend both arms share, which a naive before/after or a
    naive treatment/control comparison each confound.

    Four cells, each an exact (cent sum, count) pair; each mean is one
    division, DiD two subtractions — all shared expressions.

    100 TB: one partial-aggregated pass to FOUR cells; arm and period
    are scan-stage predicates. The inference companions are
    `q_ab_test_welch` (fixed-horizon s.e.) and `q_sprt_ab_daily`
    (sequential stopping).
    """
    cells = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            (F.col("o_custkey") % 2).alias("arm"),
            F.when(
                F.col("o_orderdate") >= F.lit(DID_SPLIT).cast("timestamp"), 1
            )
            .otherwise(0)
            .alias("period"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("cents"),
        )
    )
    mean = "CAST(cents AS DOUBLE) / n / 100.0"
    m = cells.groupBy().agg(
        F.max(
            F.expr(f"CASE WHEN arm = 1 AND period = 1 THEN {mean} END")
        ).alias("t_after"),
        F.max(
            F.expr(f"CASE WHEN arm = 1 AND period = 0 THEN {mean} END")
        ).alias("t_before"),
        F.max(
            F.expr(f"CASE WHEN arm = 0 AND period = 1 THEN {mean} END")
        ).alias("c_after"),
        F.max(
            F.expr(f"CASE WHEN arm = 0 AND period = 0 THEN {mean} END")
        ).alias("c_before"),
    )
    return m.select(
        "t_before",
        "t_after",
        "c_before",
        "c_after",
        (
            (F.col("t_after") - F.col("t_before"))
            - (F.col("c_after") - F.col("c_before"))
        ).alias("did"),
    )


# --- mean cumulative function (recurrent events) -----------------------------

_MCF_ORACLE = f"""
WITH u AS (
    SELECT user_id, min(epoch_us(ts)) AS t0,
           (SELECT max(epoch_us(ts)) FROM events) AS tmax
    FROM events GROUP BY user_id
),
censor AS (
    SELECT user_id, t0, (tmax - t0) // {US_PER_DAY} AS c_age FROM u
),
ev AS (
    SELECT (epoch_us(e.ts) - c.t0) // {US_PER_DAY} AS age
    FROM events e JOIN censor c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase'
),
d AS (SELECT age, count(*) AS d FROM ev GROUP BY age),
leave AS (SELECT c_age, count(*) AS l FROM censor GROUP BY c_age),
tot AS (SELECT count(*) AS n_users FROM censor),
ages AS (
    SELECT d.age, d.d,
           n_users - coalesce((SELECT sum(l) FROM leave WHERE c_age < d.age), 0)
             AS n_risk
    FROM d CROSS JOIN tot
),
walk AS (
    SELECT age, d, n_risk,
           sum(CAST(d AS DOUBLE) / n_risk) OVER (ORDER BY age
               ROWS UNBOUNDED PRECEDING) AS mcf
    FROM ages
)
SELECT CAST(age AS BIGINT) AS age_day, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS d_events, mcf
FROM walk ORDER BY age_day
"""


@register(
    "q_mcf_repeat_purchases",
    oracle=_MCF_ORACLE,
    tags=("survival", "recurrent-events", "events"),
)
def q_mcf_repeat_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean cumulative function of purchases per user by account age:
    MCF(t) = Σ over event ages a ≤ t of d(a)/n_at_risk(a) — the
    recurrent-event companion to `q_km_survival_conversion` (KM asks
    "has the FIRST purchase happened yet"; MCF asks "how many
    purchases has the average survivor accumulated"), with staggered
    entry handled by the shrinking risk set: a user only contributes
    to ages their observation window actually covers, which a naive
    "average count by age" silently gets wrong for late joiners.

    Exactness: ages, event counts and risk sets are exact BIGINTs;
    each increment is one division of ints; the cumulative walk is an
    age-ordered prefix sum — identical addition order on both engines,
    so no snapping is needed (the KM-fold argument).

    100 TB: two partial-aggregated rollups (per-user entry, per-age
    counts) then windows over the |ages| rollup — human-time-bounded.
    """
    ev_all = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    tmax = ev_all.groupBy().agg(F.max("ts_us").alias("tmax"))
    censor = (
        ev_all.groupBy("user_id")
        .agg(F.min("ts_us").alias("t0"))
        .crossJoin(F.broadcast(tmax))
        .select(
            "user_id",
            "t0",
            F.expr(f"(tmax - t0) div {US_PER_DAY}").alias("c_age"),
        )
    )
    purchases = (
        ev_all.filter(F.col("event_type") == "purchase")
        .join(censor, "user_id")
        .select(F.expr(f"(ts_us - t0) div {US_PER_DAY}").alias("age"))
    )
    d = purchases.groupBy("age").agg(F.count(F.lit(1)).alias("d"))
    leave = censor.groupBy("c_age").agg(F.count(F.lit(1)).alias("l"))
    tot = censor.groupBy().agg(F.count(F.lit(1)).alias("n_users"))
    # n_risk(age) = users whose censor age >= age: total minus those
    # leaving strictly before — a cumulative window over the (bounded)
    # leave rollup, joined to event ages by closest-preceding key
    left_before = (
        d.crossJoin(F.broadcast(leave))
        .filter(F.col("c_age") < F.col("age"))
        .groupBy("age")
        .agg(F.sum("l").alias("gone"))
    )
    ages = (
        d.join(left_before, "age", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "age",
            "d",
            (F.col("n_users") - F.coalesce(F.col("gone"), F.lit(0))).alias(
                "n_risk"
            ),
        )
    )
    walk = Window.orderBy("age").rowsBetween(Window.unboundedPreceding, 0)
    return (
        ages.withColumn(
            "mcf",
            F.sum(F.col("d").cast("double") / F.col("n_risk")).over(walk),
        )
        .select(
            F.col("age").cast("long").alias("age_day"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("d").cast("long").alias("d_events"),
            "mcf",
        )
        .orderBy("age_day")
    )
