"""Window-function capabilities: ranking, offsets, frames, top-k per
group (SURVEY.md §2.5).

Every ORDER BY inside a window carries a unique tiebreaker key so
results are deterministic across engines — without it, peers within
the frame make row_number/lag/ntile engine-dependent.

Scale note: a window partitioned by a key shuffles once on that key
and sorts within partitions; AQE handles skewed partitions. A window
with NO partitionBy (global ntile/running total) funnels everything
through a single task — fine on dims, a red flag on facts; the global
examples here run on the bounded orders table and the per-group forms
are the 100 TB pattern.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from cost_of_living_data_etl_spark.plans.catalog import register
from cost_of_living_data_etl_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q_window_latest_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC
        ) AS rn
        FROM orders
    )
    WHERE rn = 1
    """,
    tags=("window", "rank"),
)
def q_window_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-row-per-key via row_number — THE dedup/snapshot pattern."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


@register(
    "q_window_supplier_rank_in_nation",
    oracle="""
    SELECT
        n_name                       AS nation_name,
        s_name                       AS supplier_name,
        s_acctbal,
        CAST(rank()       OVER w AS BIGINT) AS bal_rank,
        CAST(dense_rank() OVER w AS BIGINT) AS bal_dense_rank
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WINDOW w AS (PARTITION BY n_name ORDER BY s_acctbal DESC, s_suppkey)
    """,
    tags=("window", "rank", "join"),
)
def q_window_supplier_rank_in_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank within a joined dimension partition."""
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation_name"),
            F.col("s_name").alias("supplier_name"),
            "s_acctbal",
            F.rank().over(w).cast("long").alias("bal_rank"),
            F.dense_rank().over(w).cast("long").alias("bal_dense_rank"),
        )
    )


@register(
    "q_window_order_value_delta",
    oracle="""
    SELECT
        o_custkey,
        o_orderkey,
        o_totalprice,
        lag(o_totalprice)  OVER w AS prev_price,
        lead(o_totalprice) OVER w AS next_price,
        o_totalprice - coalesce(lag(o_totalprice) OVER w, o_totalprice) AS delta_vs_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window", "offset"),
)
def q_window_order_value_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead offsets along each customer's order history."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        prev.alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (F.col("o_totalprice") - F.coalesce(prev, F.col("o_totalprice"))).alias(
            "delta_vs_prev"
        ),
    )


@register(
    "q_window_running_revenue",
    oracle="""
    SELECT
        o_custkey,
        o_orderkey,
        round(sum(o_totalprice) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ), 2) AS running_total,
        round(sum(o_totalprice) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
        ), 2) / count(*) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
        ) AS moving_avg_3
    FROM orders
    """,
    tags=("window", "frame"),
)
def q_window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit row frames: running total + 3-row moving average."""
    ordering = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = ordering.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    moving = ordering.rowsBetween(-2, Window.currentRow)
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        # Float pinning: o_totalprice is a 2-decimal quantity, so the
        # TRUE frame sum sits on the 2-decimal grid — round(2) snaps
        # both engines' ulp-drifted sums to the same grid point (never
        # at a rounding boundary). The moving average divides that
        # pinned sum by the exact frame count, so the division operands
        # — hence the quotient — are bit-identical across engines.
        # round(avg(...), 2) would NOT be safe: sum/3 leaves the grid
        # and can land arbitrarily close to a rounding boundary.
        F.round(F.sum("o_totalprice").over(running), 2).alias("running_total"),
        (
            F.round(F.sum("o_totalprice").over(moving), 2)
            / F.count(F.lit(1)).over(moving)
        ).alias("moving_avg_3"),
    )


@register(
    "q_window_ntile_price_quartiles",
    oracle="""
    SELECT
        quartile,
        CAST(count(*) AS BIGINT) AS n_orders,
        min(o_totalprice)        AS min_price,
        max(o_totalprice)        AS max_price
    FROM (
        SELECT o_totalprice, CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile
        FROM orders
    )
    GROUP BY quartile
    """,
    tags=("window", "ntile"),
)
def q_window_ntile_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ntile(4) bucketing then per-bucket stats.

    ntile is computed EXACTLY but distributed: global (price, key)
    positions come from the bucket-partitioned zipWithIndex
    (operators/distributed_rank.py — floor(price) is the monotone
    bucket), and the tile is closed-form ntile arithmetic on the
    position (the first n mod 4 tiles get ⌈n/4⌉ rows, the rest ⌊n/4⌋)
    — bit-identical to the single-task ntile(4) window it replaces.
    """
    from cost_of_living_data_etl_spark.operators.distributed_rank import (
        with_global_ntile,
    )

    orders = _t(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    tiled = with_global_ntile(
        orders,
        4,
        ["o_totalprice", "o_orderkey"],
        F.floor(F.col("o_totalprice")),
        out_col="quartile",
    )
    return (
        tiled.select("o_totalprice", F.col("quartile").cast("long").alias("quartile"))
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@register(
    "q_topk_orders_per_priority",
    oracle="""
    SELECT o_orderpriority AS priority, o_orderkey, o_totalprice,
           CAST(rn AS BIGINT) AS rn
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY o_orderpriority
            ORDER BY o_totalprice DESC, o_orderkey
        ) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def q_topk_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: row_number + filter (no global sort, no collect)."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_orderpriority").alias("priority"),
            "o_orderkey",
            "o_totalprice",
            F.col("rn").cast("long"),
        )
    )


@register(
    "q_global_topn_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("sort", "limit"),
)
def q_global_topn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT: Spark plans TakeOrderedAndProject — each
    partition keeps only its local top-10, the driver merges k·p rows.
    No global sort materializes at any scale."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "q_timeseries_gapfill_ffill",
    oracle="""
    WITH daily AS (
        SELECT o_orderstatus AS status,
               date_trunc('day', o_orderdate) AS day,
               sum(o_totalprice) AS day_revenue
        FROM orders GROUP BY 1, 2
    ),
    bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
    calendar AS (
        SELECT s.status, g.day
        FROM (SELECT DISTINCT status FROM daily) s
        CROSS JOIN (
            SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
            FROM bounds
        ) g
    )
    SELECT c.status, c.day,
           coalesce(last_value(d.day_revenue IGNORE NULLS) OVER (
               PARTITION BY c.status ORDER BY c.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 0.0)                                   AS revenue_ffill,
           d.day_revenue IS NULL                     AS is_gap
    FROM calendar c LEFT JOIN daily d
      ON d.status = c.status AND d.day = c.day
    """,
    tags=("window", "time-series", "gapfill"),
)
def q_timeseries_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification + forward fill: make per-status daily
    revenue CONTIGUOUS (one row per status × day between the global
    min and max order day) and carry the last observed value across
    gap days, flagging them.

    The resample/ffill step every time-series feature pipeline needs —
    downstream windows (trailing averages, lag features) silently skip
    missing days unless the grid is densified first. Scale shape: the
    calendar derives from a 1-row bounds aggregate exploded by
    `sequence` (|days| rows, data-independent), the join is
    (status, day)-keyed against the already-aggregated daily frame,
    and the fill is one window with `last(..., ignoreNulls)` — no
    self-joins, no driver loops.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.col("o_orderstatus").alias("status"),
            F.date_trunc("day", F.col("o_orderdate")).alias("day"),
        )
        .agg(F.sum("o_totalprice").alias("day_revenue"))
    )
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    calendar = (
        daily.select("status")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "status",
            F.explode(
                F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    w = (
        Window.partitionBy("status")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        calendar.join(daily, ["status", "day"], "left")
        .select(
            "status",
            "day",
            F.coalesce(
                F.last("day_revenue", ignorenulls=True).over(w), F.lit(0.0)
            ).alias("revenue_ffill"),
            F.col("day_revenue").isNull().alias("is_gap"),
        )
    )


ANOM_WINDOW = 30  # trailing days in the baseline
ANOM_Z = 2.0


@register(
    "q_revenue_anomaly_days",
    oracle=f"""
    WITH daily AS (
        SELECT date_trunc('day', o_orderdate) AS day,
               round(sum(o_totalprice), 2) AS day_revenue
        FROM orders GROUP BY 1
    ),
    scored AS (
        SELECT day, day_revenue,
               round(sum(day_revenue) OVER w, 2)      AS base_sum,
               sum(day_revenue * day_revenue) OVER w  AS base_ssq,
               count(*) OVER w                        AS n_base
        FROM daily
        WINDOW w AS (
            ORDER BY day ROWS BETWEEN {ANOM_WINDOW} PRECEDING AND 1 PRECEDING
        )
    ),
    m AS (
        SELECT day, day_revenue, n_base,
               base_sum / n_base AS base_mean,
               sqrt(greatest(base_ssq - (base_sum * base_sum) / n_base,
                             CAST(0.0 AS DOUBLE))
                    / (n_base - 1)) AS base_std
        FROM scored
    )
    SELECT day, day_revenue, base_mean,
           round((day_revenue - base_mean) / base_std, 6) AS z
    FROM m
    WHERE n_base >= 10 AND base_std > 0
      AND abs((day_revenue - base_mean) / base_std) >= {ANOM_Z}
    """,
    tags=("window", "time-series", "anomaly"),
)
def q_revenue_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: days whose revenue sits
    ≥ {ANOM_Z}σ from the mean of the PRECEDING {ANOM_WINDOW} days
    (frame excludes the current row, so an outlier can't shift its own
    baseline — the classic self-contamination bug in rolling z-scores).

    The monitoring query every load pipeline wants over the facts it
    writes. One pre-aggregation to |days| rows, one window pass; at
    100 TB the window input is the tiny daily rollup, never raw
    orders.

    Float pinning (cross-engine hash determinism): day_revenue and the
    trailing base_sum are sums of 2-decimal money, so rounding them to
    2 snaps both engines to the same grid point; base_mean divides the
    pinned sum by the exact frame count (bit-identical quotient), and
    base_std is derived from (ssq, sum, n) with the identical IEEE
    formula on both engines rather than each engine's own stddev
    kernel. Only ssq carries ulp drift, which the z round(6) absorbs.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("day_revenue"))
    w = (
        Window.orderBy("day")
        .rowsBetween(-ANOM_WINDOW, -1)
    )
    scored = daily.select(
        "day",
        "day_revenue",
        F.round(F.sum("day_revenue").over(w), 2).alias("base_sum"),
        F.sum(F.col("day_revenue") * F.col("day_revenue")).over(w).alias("base_ssq"),
        F.count(F.lit(1)).over(w).alias("n_base"),
    )
    n = F.col("n_base")
    s = F.col("base_sum")
    mean = (s / n).alias("base_mean")
    # greatest(·, 0): the textbook ssq - s²/n form can go slightly
    # NEGATIVE under float cancellation when variance is tiny relative
    # to the mean — Spark's sqrt would yield NaN (which passes > and
    # >= filters!) and DuckDB's sqrt ERRORS on negatives; the clamp is
    # identical on both engines
    std = F.sqrt(
        F.greatest(F.col("base_ssq") - (s * s) / n, F.lit(0.0)) / (n - 1)
    )
    z = (F.col("day_revenue") - s / n) / std
    return (
        scored.filter((n >= 10) & (std > 0) & (F.abs(z) >= ANOM_Z))
        .select("day", "day_revenue", mean, F.round(z, 6).alias("z"))
    )
