"""Aggregation capabilities beyond plain GROUP BY: rollup, cube,
conditional aggregation, exact/approx distinct counts, percentiles.

All are built-in Spark aggregates (JVM hash/sort aggregate with
map-side partial application) — nothing here leaves codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cost_of_living_data_etl_spark.plans.catalog import register
from cost_of_living_data_etl_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q_rollup_returnflag_linestatus",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        sum(l_quantity)                  AS sum_qty,
        CAST(count(*) AS BIGINT)         AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg", "rollup"),
)
def q_rollup_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: per-(flag,status), per-flag subtotals, and grand total.

    Spark expands rollup into grouping sets inside ONE aggregate —
    no extra passes over the input at any scale.
    """
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "q_cube_status_priority",
    oracle="""
    SELECT
        o_orderstatus,
        o_orderpriority,
        sum(o_totalprice)                AS total_price,
        CAST(count(*) AS BIGINT)         AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "cube"),
)
def q_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^2 grouping-set combinations in one aggregate."""
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.sum("o_totalprice").alias("total_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "q_conditional_agg_segment",
    oracle="""
    SELECT
        c_mktsegment                                                     AS segment,
        CAST(count(*) AS BIGINT)                                         AS n_orders,
        CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0.0 END) AS urgent_value,
        avg(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END)         AS avg_open_value
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("agg", "conditional", "join"),
)
def q_conditional_agg_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional (CASE WHEN) aggregation — the manual-pivot pattern."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("long")
            .alias("n_finished"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice")).otherwise(0.0)
            ).alias("urgent_value"),
            F.avg(F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))).alias(
                "avg_open_value"
            ),
        )
    )


@register(
    "q_distinct_counts",
    oracle="""
    SELECT
        l_returnflag,
        CAST(count(DISTINCT l_partkey) AS BIGINT)   AS n_parts,
        CAST(count(DISTINCT l_suppkey) AS BIGINT)   AS n_suppliers,
        CAST(count(*) AS BIGINT)                    AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "distinct"),
)
def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column COUNT(DISTINCT) (expand + two-phase agg)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("n_parts"),
            F.count_distinct("l_suppkey").alias("n_suppliers"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def _approx_distinct_oracle() -> str:
    from cost_of_living_data_etl_spark.operators.sketches import det_hll_oracle

    return det_hll_oracle(
        "SELECT l_returnflag, CAST(l_partkey AS VARCHAR) AS v FROM lineitem",
        ["l_returnflag"],
        "n_parts_approx",
    )


@register(
    "q_approx_distinct_counts",
    oracle=_approx_distinct_oracle(),
    tags=("agg", "approx"),
)
def q_approx_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate COUNT(DISTINCT) via HyperLogLog: the 100 TB-scale
    variant. Exact distinct over a high-cardinality key needs a full
    shuffle of the key; the HLL register table is bounded at m=4096
    rows per group and merges map-side — this is the one to reach for
    on billions of keys. Uses the deterministic portable HLL
    (operators/sketches.py) so the estimate itself hash-matches the
    DuckDB replay; `F.approx_count_distinct` is the engine-native
    drop-in, accuracy-tested against it in tests/test_sketches.py.
    """
    from cost_of_living_data_etl_spark.operators.sketches import (
        det_hll_estimate,
        det_hll_registers,
    )

    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_partkey")
    regs = det_hll_registers(li, ["l_returnflag"], "l_partkey")
    return det_hll_estimate(regs, ["l_returnflag"], "n_parts_approx")


@register(
    "q_percentiles_order_value",
    oracle="""
    SELECT
        o_orderpriority                                   AS priority,
        quantile_cont(o_totalprice, 0.5)                  AS p50,
        quantile_cont(o_totalprice, 0.9)                  AS p90,
        min(o_totalprice)                                 AS min_price,
        max(o_totalprice)                                 AS max_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg", "percentile"),
)
def q_percentiles_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile`).

    Note: at 100 TB one switches to `percentile_approx` (t-digest,
    mergeable, bounded memory); exact percentile materializes the
    group's values. Kept exact here to oracle-match quantile_cont.
    """
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.percentile("o_totalprice", 0.5).alias("p50"),
            F.percentile("o_totalprice", 0.9).alias("p90"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@register(
    "q_stats_moments",
    oracle="""
    SELECT
        l_linestatus,
        stddev_samp(l_extendedprice)   AS sd_price,
        var_samp(l_extendedprice)      AS var_price,
        corr(l_quantity, l_extendedprice) AS corr_qty_price,
        covar_samp(l_quantity, l_extendedprice) AS covar_qty_price
    FROM lineitem
    GROUP BY l_linestatus
    """,
    tags=("agg", "stats"),
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics (stddev/var/corr/covar) per group."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
            F.stddev_samp("l_extendedprice").alias("sd_price"),
            F.var_samp("l_extendedprice").alias("var_price"),
            F.corr("l_quantity", "l_extendedprice").alias("corr_qty_price"),
            F.covar_samp("l_quantity", "l_extendedprice").alias("covar_qty_price"),
        )
    )


HIST_LO, HIST_HI, HIST_NBINS = 0.0, 400_000.0, 20


@register(
    "q_histogram_order_values",
    oracle=f"""
    SELECT
        CAST(least(greatest(floor((o_totalprice - {HIST_LO})
                 / (({HIST_HI} - {HIST_LO}) / {HIST_NBINS})), 0), {HIST_NBINS - 1})
             AS BIGINT) AS bin_id,
        CAST(count(*) AS BIGINT) AS n,
        min(o_totalprice) AS lo,
        max(o_totalprice) AS hi
    FROM orders
    GROUP BY bin_id
    """,
    tags=("agg", "histogram"),
)
def q_histogram_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order values (20 bins over [0, 400k],
    clamped at the edges) — the profiling primitive behind data-quality
    dashboards and skew diagnosis.

    Bin assignment is a pure scan-stage expression (no sort, no
    window); the shuffle key domain is the BIN COUNT, not the row
    count, so at 100 TB this is one map pass plus a 20-row exchange —
    the cheapest possible shape for a full-table distribution profile.
    """
    width = (HIST_HI - HIST_LO) / HIST_NBINS
    bin_id = F.least(
        F.greatest(
            F.floor((F.col("o_totalprice") - F.lit(HIST_LO)) / F.lit(width)),
            F.lit(0),
        ),
        F.lit(HIST_NBINS - 1),
    ).cast("long")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(bin_id.alias("bin_id"), "o_totalprice")
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@register(
    "q_dq_violations_report",
    oracle="""
    SELECT * FROM (
        SELECT 'orders_null_custkey' AS check_name,
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        FROM orders
        UNION ALL
        SELECT 'orders_nonpositive_price',
               CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'orders_dup_orderkey',
               CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'orders_orphan_custkey',
               CAST(count(*) AS BIGINT)
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        WHERE c_custkey IS NULL
        UNION ALL
        SELECT 'lineitem_orphan_orderkey',
               CAST(count(*) AS BIGINT)
        FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderkey IS NULL
        UNION ALL
        SELECT 'lineitem_discount_range',
               CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem
    )
    """,
    tags=("quality", "constraints", "audit"),
)
def q_dq_violations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations report: null keys, domain violations,
    primary-key duplicates, and referential orphans across the star
    schema in one pass per table — the load-gate audit the reference
    lacks entirely (it returns 200 unconditionally, app.py:199).

    Scale shape: the column checks per table fuse into ONE scan with
    conditional partial aggregates (6 checks ≠ 6 scans); the FK checks
    are anti-join shaped (count of probe rows with no build match),
    with the dim side broadcast when small. Output is one row per
    check — metadata-sized, cheap to gate a 100 TB load on.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")

    order_checks = orders.agg(
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("orders_null_custkey"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("orders_nonpositive_price"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey")))
        .cast("long")
        .alias("orders_dup_orderkey"),
    )
    li_checks = lineitem.agg(
        F.sum(F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1).otherwise(0))
        .cast("long")
        .alias("lineitem_discount_range"),
    )
    orphan_orders = (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("orders_orphan_custkey"))
    )
    orphan_lines = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("lineitem_orphan_orderkey"))
    )

    # melt each 1-row aggregate into (check_name, n_violations) rows
    def melt(df):
        cols = df.columns
        stack = ", ".join(f"'{c}', {c}" for c in cols)
        return df.selectExpr(
            f"stack({len(cols)}, {stack}) AS (check_name, n_violations)"
        )

    return (
        melt(order_checks)
        .unionByName(melt(li_checks))
        .unionByName(melt(orphan_orders))
        .unionByName(melt(orphan_lines))
    )


WINSOR_LO, WINSOR_HI = 0.01, 0.99


@register(
    "q_winsorized_stats",
    oracle=f"""
    WITH bounds AS (
        SELECT
            c_mktsegment AS seg,
            quantile_cont(o_totalprice, {WINSOR_LO}) AS lo,
            quantile_cont(o_totalprice, {WINSOR_HI}) AS hi
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1
    )
    SELECT
        c_mktsegment,
        CAST(count(*) AS BIGINT) AS n_orders,
        avg(o_totalprice) AS raw_avg,
        avg(least(greatest(o_totalprice, lo), hi)) AS winsor_avg,
        CAST(sum(CASE WHEN o_totalprice < lo OR o_totalprice > hi
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN bounds ON c_mktsegment = seg
    GROUP BY c_mktsegment
    """,
    tags=("quality", "winsorize", "percentile"),
)
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (P1/P99-clipped) average order value per market
    segment vs the raw average — the standard outlier-robust cleaning
    step before statistics or model features.

    Two passes over the joined fact: one computes exact per-segment
    percentile bounds (tiny result: one row per segment), which then
    broadcast back onto the fact for the clipped aggregate. At 100 TB
    swap exact `percentile` for `approx_percentile` (t-digest sketch,
    single pass, mergeable map-side) — the code shape is unchanged.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        "c_mktsegment", "o_totalprice"
    )
    bounds = joined.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.expr(f"percentile(o_totalprice, {WINSOR_LO})").alias("lo"),
        F.expr(f"percentile(o_totalprice, {WINSOR_HI})").alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi"))
    return (
        joined.join(F.broadcast(bounds), joined.c_mktsegment == bounds.seg)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.avg("o_totalprice").alias("raw_avg"),
            F.avg(clipped).alias("winsor_avg"),
            F.sum(
                F.when(
                    (F.col("o_totalprice") < F.col("lo"))
                    | (F.col("o_totalprice") > F.col("hi")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_clipped"),
        )
    )


@register(
    "q_running_distinct_customers",
    oracle="""
    WITH first_seen AS (
        SELECT o_custkey, min(date_trunc('month', o_orderdate)) AS month
        FROM orders GROUP BY o_custkey
    ),
    monthly AS (
        SELECT month, CAST(count(*) AS BIGINT) AS new_customers
        FROM first_seen GROUP BY month
    )
    SELECT month, new_customers,
           CAST(sum(new_customers) OVER (ORDER BY month
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_distinct_customers
    FROM monthly
    """,
    tags=("agg", "window", "incremental"),
)
def q_running_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct customers by order month via the FIRST-SEEN
    trick — the scalable formulation of running COUNT(DISTINCT).

    The naive `count(distinct) OVER (ORDER BY month)` window has to
    carry every key through a single-partition ordered window — O(all
    keys) state on one task, dead at 100 TB. First-seen reduces it to:
    (1) `groupBy(custkey).min(month)` — a normal partial-aggregated
    hash shuffle on the key; (2) count per month (tiny); (3) a
    cumulative sum over |months| rows. The only single-partition step
    ranges over months (≤ a few hundred rows regardless of data
    size), so the plan survives any scale-up. Same trick powers "new
    vs returning users" and cohort growth curves.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    first_seen = orders.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", F.col("o_orderdate"))).alias("month")
    )
    monthly = first_seen.groupBy("month").agg(
        F.count(F.lit(1)).alias("new_customers")
    )
    w = (
        Window.orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return monthly.select(
        "month",
        "new_customers",
        F.sum("new_customers").over(w).alias("cum_distinct_customers"),
    )


@register(
    "q_monthly_order_extremes",
    oracle="""
    WITH m AS (
        SELECT date_trunc('month', o_orderdate) AS month,
               o_totalprice AS p, o_orderkey AS k
        FROM orders
    ),
    r AS (
        SELECT month, p, k,
               row_number() OVER (PARTITION BY month ORDER BY p ASC,  k ASC)  AS ra,
               row_number() OVER (PARTITION BY month ORDER BY p DESC, k DESC) AS rd
        FROM m
    )
    SELECT month,
           CAST(count(*) AS BIGINT)                      AS n_orders,
           max(CASE WHEN ra = 1 THEN p END)              AS min_price,
           CAST(max(CASE WHEN ra = 1 THEN k END) AS BIGINT) AS min_orderkey,
           max(CASE WHEN rd = 1 THEN p END)              AS max_price,
           CAST(max(CASE WHEN rd = 1 THEN k END) AS BIGINT) AS max_orderkey
    FROM r GROUP BY month
    """,
    tags=("agg", "arg-extremum"),
)
def q_monthly_order_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest and priciest order per month via argmin/argmax
    AGGREGATES — `min(struct(price, key))` — not per-group windows.

    The struct-extremum form is the scalable way to answer "which row
    attains the group's min/max": it partial-aggregates map-side (one
    candidate row per group per mapper crosses the shuffle), whereas
    the window-rank form shuffles EVERY row of the group to one task
    first. Ties on price break deterministically on the unique order
    key because struct comparison is lexicographic — which is also
    why this beats raw `min_by`/`max_by` for oracle work: Spark's
    min_by leaves ties unspecified. The DuckDB oracle replays the
    same semantics with window ranks.
    """
    orders = load_table(spark, sf_dir, "orders")
    m = orders.select(
        F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        F.col("o_totalprice").alias("p"),
        F.col("o_orderkey").alias("k"),
    )
    lo = F.min(F.struct("p", "k"))
    hi = F.max(F.struct("p", "k"))
    return m.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_orders"),
        lo.getField("p").alias("min_price"),
        lo.getField("k").alias("min_orderkey"),
        hi.getField("p").alias("max_price"),
        hi.getField("k").alias("max_orderkey"),
    )


@register(
    "q_join_key_skew_profile",
    oracle="""
    WITH freqs AS (
        SELECT 'l_orderkey' AS key_name, l_orderkey AS k, count(*) AS freq
        FROM lineitem GROUP BY l_orderkey
        UNION ALL
        SELECT 'o_custkey' AS key_name, o_custkey AS k, count(*) AS freq
        FROM orders GROUP BY o_custkey
    )
    SELECT key_name,
           CASE WHEN freq = 1 THEN '1'
                WHEN freq <= 3 THEN '2-3'
                WHEN freq <= 7 THEN '4-7'
                WHEN freq <= 15 THEN '8-15'
                ELSE '16+' END          AS freq_class,
           CAST(count(*) AS BIGINT)    AS n_keys,
           CAST(sum(freq) AS BIGINT)   AS n_rows,
           CAST(max(freq) AS BIGINT)   AS max_freq
    FROM freqs
    GROUP BY key_name, freq_class
    """,
    tags=("diagnostics", "skew", "agg"),
)
def q_join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key frequency-distribution profile — the diagnostic you run
    BEFORE choosing a skew strategy: a heavy '16+' class on a join key
    means AQE skew-split or salting (q_salted_agg_customer_spend) is
    warranted; a flat profile means plain hash partitioning is fine.

    Two-level aggregation, both partial map-side: facts → per-key
    freq (shuffle on the key being profiled — the same shuffle the
    real join would do, so the profile measures exactly what the join
    will see), then freq → integer-boundary class histogram (|classes|
    groups). All outputs are integers: no float drift surface at all.

    At 100 TB, profile a deterministic id-range sample of the fact
    table instead (the md5-bucket predicate of q_deterministic_sample
    composes in the scan stage); class boundaries and semantics are
    unchanged.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    freqs = (
        lineitem.groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(F.lit("l_orderkey").alias("key_name"), "k", "freq")
        .unionByName(
            orders.groupBy(F.col("o_custkey").alias("k"))
            .agg(F.count(F.lit(1)).alias("freq"))
            .select(F.lit("o_custkey").alias("key_name"), "k", "freq")
        )
    )
    f = F.col("freq")
    freq_class = (
        F.when(f == 1, "1")
        .when(f <= 3, "2-3")
        .when(f <= 7, "4-7")
        .when(f <= 15, "8-15")
        .otherwise("16+")
        .alias("freq_class")
    )
    return freqs.select("key_name", freq_class, "freq").groupBy(
        "key_name", "freq_class"
    ).agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("freq").alias("n_rows"),
        F.max("freq").alias("max_freq"),
    )


@register(
    "q_join_cardinality_estimate",
    oracle="""
    WITH fe AS (SELECT user_id AS k, count(*) AS f FROM events GROUP BY user_id),
    fo AS (SELECT o_custkey AS k, count(*) AS f FROM orders GROUP BY o_custkey),
    est AS (
        SELECT CAST(sum(fe.f * fo.f) AS BIGINT) AS estimated_rows,
               CAST(count(*) AS BIGINT)         AS n_shared_keys
        FROM fe JOIN fo USING (k)
    ),
    act AS (
        SELECT CAST(count(*) AS BIGINT) AS actual_rows
        FROM events e JOIN orders o ON e.user_id = o.o_custkey
    )
    SELECT est.estimated_rows, est.n_shared_keys, act.actual_rows,
           CAST(est.estimated_rows = act.actual_rows AS BOOLEAN) AS exact_match
    FROM est, act
    """,
    tags=("diagnostics", "planner", "cardinality"),
)
def q_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight join-cardinality estimation from per-key frequency
    tables: |A ⋈ B| = Σ_k f_A(k)·f_B(k). The query computes the
    estimate from the (tiny) frequency rollups, then the actual join
    count, and asserts the identity — demonstrating that the estimate
    a planner would use BEFORE launching a 100 TB join (to size
    shuffle partitions, pick broadcast vs shuffle, or refuse a
    blow-up) is exact when derived from full frequency tables, and
    that its cost is two per-key rollups + a key-only join, never the
    join itself.

    At 100 TB the same identity runs over SAMPLED or sketched (CMS)
    frequency tables for an approximate pre-flight answer; the
    frequency-join shape is unchanged.
    """
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    fe = events.groupBy(F.col("user_id").alias("k")).agg(
        F.count(F.lit(1)).alias("fe")
    )
    fo = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("fo")
    )
    est = fe.join(fo, "k").agg(
        F.sum(F.col("fe") * F.col("fo")).alias("estimated_rows"),
        F.count(F.lit(1)).alias("n_shared_keys"),
    )
    act = (
        events.join(orders, events.user_id == orders.o_custkey)
        .agg(F.count(F.lit(1)).alias("actual_rows"))
    )
    return est.crossJoin(act).select(
        "estimated_rows",
        "n_shared_keys",
        "actual_rows",
        (F.col("estimated_rows") == F.col("actual_rows")).alias("exact_match"),
    )
