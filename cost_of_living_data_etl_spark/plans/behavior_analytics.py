"""Behavioral & distribution analytics: activity concentration (Gini),
funnel conversion latency, decay-weighted attribution, and duplicate
cluster-size distribution.

The engagement-shape passes over the events stream the reference never
gets to (its pipeline stops at fact loading), plus the dedup-output
profile a curation team reads before choosing a keeper policy. Float
discipline as everywhere: integer sums wherever possible (Gini and
both histograms are exact-integer arithmetic end to end), sorted-fold
``det_sum`` for the one float aggregation (attribution), shared gap
rule for anything session-scoped.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from cost_of_living_data_etl_spark.functions.columns import det_sum
from cost_of_living_data_etl_spark.operators.dedup import _CLUSTERS_ORACLE
from cost_of_living_data_etl_spark.plans.catalog import register
from cost_of_living_data_etl_spark.sources.tables import load_table

ATTR_WINDOW_DAYS = 7  # attribution lookback
ATTR_TAU_SEC = 86400.0  # 1-day exponential decay constant


# --- activity concentration (Gini) -----------------------------------------

_GINI_ORACLE = """
WITH per_user AS (
    SELECT event_type, user_id, count(*) AS c
    FROM events GROUP BY event_type, user_id
),
ranked AS (
    SELECT event_type, c,
           row_number() OVER (
               PARTITION BY event_type ORDER BY c, user_id
           ) AS rk,
           count(*) OVER (PARTITION BY event_type) AS n,
           sum(c) OVER (PARTITION BY event_type) AS tot
    FROM per_user
)
SELECT event_type,
       CAST(n AS BIGINT)   AS n_users,
       CAST(tot AS BIGINT) AS total_events,
       CAST(2 * sum(rk * c) AS DOUBLE) / (n * tot)
           - CAST(n + 1 AS DOUBLE) / n  AS gini
FROM ranked
GROUP BY event_type, n, tot
"""


@register(
    "q_user_activity_gini",
    oracle=_GINI_ORACLE,
    tags=("events", "concentration", "window"),
)
def q_user_activity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user activity, per event type — the
    concentration number behind "do 1% of users generate 90% of the
    load?" (capacity skew, abuse detection, and the power-user lens
    that complements q_join_key_skew_profile's join-key view).

    Exact-integer discipline: counts are ints, ranks are ints over the
    TOTAL order (count, user_id), and Gini's rank-weighted form
    2·Σ(rk·c)/(n·Σc) − (n+1)/n divides exact integer sums once at the
    end — both engines produce the identical double with no fold
    ordering anywhere.

    Scale: per-user rollup is one shuffle; the rank window partitions
    by event type over |users| 2-int rows; output is |event types|.
    """
    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("c", "user_id")
    wp = Window.partitionBy("event_type")
    ranked = per_user.select(
        "event_type",
        "c",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum("c").over(wp).alias("tot"),
    )
    return ranked.groupBy("event_type", "n", "tot").agg(
        F.sum(F.col("rk") * F.col("c")).alias("src")
    ).select(
        "event_type",
        F.col("n").cast("long").alias("n_users"),
        F.col("tot").cast("long").alias("total_events"),
        (
            (2 * F.col("src")).cast("double") / (F.col("n") * F.col("tot"))
            - (F.col("n") + 1).cast("double") / F.col("n")
        ).alias("gini"),
    )


# --- funnel conversion latency ---------------------------------------------

_LATENCY_ORACLE = """
WITH firsts AS (
    SELECT user_id,
           min(ts) FILTER (WHERE event_type = 'view')     AS first_view,
           min(ts) FILTER (WHERE event_type = 'purchase') AS first_purchase
    FROM events GROUP BY user_id
),
conv AS (
    SELECT CAST(floor(date_diff('second', first_view, first_purchase)
                      / 3600.0) AS INT) AS latency_hours
    FROM firsts
    WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
      AND first_purchase >= first_view
)
SELECT latency_hours, CAST(count(*) AS BIGINT) AS n_users
FROM conv GROUP BY latency_hours
"""


@register(
    "q_funnel_latency_histogram",
    oracle=_LATENCY_ORACLE,
    tags=("events", "funnel", "latency"),
)
def q_funnel_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: hours between a user's FIRST view
    and FIRST purchase (converters only), histogrammed by hour bucket.
    q_events_funnel counts who converts; this says how long conversion
    takes — the number that sizes retargeting windows.

    One conditional-min aggregate per user (filtered min rides the
    same partial-agg combine as any min), integer second-difference,
    integer bucket — no float surface. Output is |distinct hour
    buckets| rows.
    """
    firsts = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
                "first_view"
            ),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("first_purchase"),
        )
    )
    conv = firsts.filter(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_view"))
    ).select(
        F.floor(
            (
                F.unix_timestamp("first_purchase")
                - F.unix_timestamp("first_view")
            )
            / 3600.0
        )
        .cast("int")
        .alias("latency_hours")
    )
    return conv.groupBy("latency_hours").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


# --- decay-weighted multi-touch attribution --------------------------------

_ATTRIBUTION_ORACLE = f"""
WITH views AS (
    SELECT user_id, ts AS v_ts
    FROM events WHERE event_type = 'view'
),
purchases AS (
    SELECT user_id, ts AS p_ts, event_id AS p_id, value
    FROM events WHERE event_type = 'purchase'
),
touch AS (
    SELECT p.p_id, p.value, v.v_ts,
           exp(-date_diff('second', v.v_ts, p.p_ts) / {ATTR_TAU_SEC}) AS w
    FROM purchases p JOIN views v
      ON p.user_id = v.user_id
     AND v.v_ts <= p.p_ts
     AND v.v_ts >= p.p_ts - INTERVAL {ATTR_WINDOW_DAYS} DAY
),
wsum AS (
    SELECT p_id,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                    list_sort(list(w))),
                       (a, b) -> a + b) AS sw
    FROM touch GROUP BY p_id
),
shared AS (
    SELECT date_trunc('day', t.v_ts) AS day,
           t.value * t.w / s.sw AS attributed
    FROM touch t JOIN wsum s ON t.p_id = s.p_id
)
SELECT day,
       CAST(count(*) AS BIGINT) AS n_touches,
       round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                      list_sort(list(attributed))),
                         (a, b) -> a + b), 6) AS attributed_value
FROM shared GROUP BY day
"""


@register(
    "q_decay_attribution",
    oracle=_ATTRIBUTION_ORACLE,
    tags=("events", "attribution", "range-join"),
)
def q_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential-decay multi-touch attribution: each purchase's value
    splits across the user's views in the prior {ATTR_WINDOW_DAYS}
    days, weighted exp(-age/1 day) and normalized per purchase; daily
    totals credit the VIEW day. The marketing-spend allocation view
    that last-touch attribution (q_events_click_attribution) distorts.

    Determinism: weights are exp of integer second-differences
    (libm-identical both engines); BOTH float aggregations — the
    per-purchase weight total and the per-day rollup — fold sorted
    (det_sum), and the day totals snap to 6 decimals.

    Scale: the time-bounded join shuffles both sides on user_id with
    the range predicate applied in the join — state bounded by the
    window exactly like the stream-stream attribution join; per-
    purchase windows see only that purchase's touches.
    """
    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id"), "value"
    )
    touch = purchases.join(views, "user_id").filter(
        (F.col("v_ts") <= F.col("p_ts"))
        & (
            F.col("v_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {ATTR_WINDOW_DAYS} DAYS")
        )
    ).select(
        "p_id",
        "value",
        "v_ts",
        F.exp(
            -(
                F.unix_timestamp("p_ts") - F.unix_timestamp("v_ts")
            )
            / F.lit(ATTR_TAU_SEC)
        ).alias("w"),
    )
    # per-purchase weight total via a SORTED fold, not an unordered
    # window sum: sum(w) over an unordered partition accumulates in
    # shuffle-fetch order — last-ulp drift run-to-run and
    # engine-to-engine, exactly what the driver's exact-hash gate
    # cannot tolerate (det_sum docstring). One groupBy collects the
    # purchase's touches and folds sw from the same sorted list —
    # the explode below then replaces the former touch⋈wsum join-back,
    # which derived the expensive range join a second time (2 scans of
    # events + a SortMergeJoin on p_id, all gone; plan shape pinned in
    # plans/r09/q_decay_attribution_{before,after}.txt).
    grouped = touch.groupBy("p_id").agg(
        F.first("value").alias("value"),
        F.collect_list(F.struct("v_ts", "w")).alias("touches"),
    ).withColumn(
        "sw",
        F.expr(
            "aggregate(array_sort(transform(touches, t -> t.w)),"
            " CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
        ),
    )
    shared = grouped.select(
        F.explode("touches").alias("t"), "value", "sw"
    ).select(
        F.date_trunc("day", F.col("t.v_ts")).alias("day"),
        (F.col("value") * F.col("t.w") / F.col("sw")).alias("attributed"),
    )
    return shared.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.round(det_sum("attributed"), 6).alias("attributed_value"),
    )


# --- duplicate cluster-size distribution -----------------------------------

_CLUSTER_SIZE_ORACLE = f"""
WITH assignment AS ({_CLUSTERS_ORACLE})
SELECT CAST(sz AS BIGINT)       AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters
FROM (
    SELECT cluster_id, count(*) AS sz
    FROM assignment GROUP BY cluster_id
)
GROUP BY sz
"""


@register(
    "q_dup_cluster_size_histogram",
    oracle=_CLUSTER_SIZE_ORACLE,
    tags=("dedup", "clustering", "profile"),
)
def q_dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size distribution of the near-dup clusters: how many singletons,
    pairs, triples, template families — the profile that decides the
    keeper policy (drop-all-but-one is fine for pairs; a 500-doc family
    means a template rule, cf. q_triangle_count_neardup). Composes the
    connected-components assignment (oracle REUSES the CC recursive-CTE
    text verbatim, so the two queries can never drift) with two integer
    aggregates.
    """
    from cost_of_living_data_etl_spark.operators.dedup import q_dedup_clusters

    assignment = q_dedup_clusters(spark, sf_dir)
    sizes = assignment.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return sizes.groupBy(F.col("sz").cast("long").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters")
    )
