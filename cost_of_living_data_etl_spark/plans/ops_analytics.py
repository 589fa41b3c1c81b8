"""Operational & market-structure analytics: rolling active users,
order-backlog aging, market concentration (HHI), and text readability.

The daily-ops dashboard tier: engagement reach over a trailing window,
the open-order aging report a fulfillment team walks every morning,
the market-concentration index an economist computes per region, and
the readability screen a content/curation team runs per source. Same
determinism toolkit as the whole catalog (integers first, money grid,
sorted folds for float sums).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cost_of_living_data_etl_spark.functions.columns import det_sum
from cost_of_living_data_etl_spark.plans.catalog import register
from cost_of_living_data_etl_spark.sources.tables import load_table

ROLLING_DAYS = 7  # trailing active-user window
AGE_BUCKET_DAYS = 30  # backlog aging bucket width


# --- rolling 7-day active users --------------------------------------------

_ROLLING_AU_ORACLE = f"""
WITH day_user AS (
    SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
),
grid AS (SELECT DISTINCT day FROM day_user)
SELECT g.day,
       CAST(count(DISTINCT du.user_id) AS BIGINT) AS active_users_7d
FROM grid g JOIN day_user du
  ON du.day <= g.day AND du.day > g.day - INTERVAL {ROLLING_DAYS} DAY
GROUP BY g.day
"""


@register(
    "q_rolling_active_users",
    oracle=_ROLLING_AU_ORACLE,
    tags=("events", "engagement", "range-join"),
)
def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing {ROLLING_DAYS}-day active users per day — the WAU-style
    reach metric. A windowed COUNT(DISTINCT) cannot partial-aggregate,
    so the plan collapses events to DISTINCT (day, user) rows FIRST
    (the one event-scale shuffle), then range-joins that slim rollup
    to the day grid and counts distinct per day — the trailing-window
    distinct pattern that scales as |days| x window x daily-actives,
    not as raw events (cf. q_running_distinct_customers for the
    CUMULATIVE variant's first-seen trick; a trailing window has no
    such trick because users age OUT of it).

    All-integer. The range join is day-grid x day-user on a bounded
    7-day band.
    """
    events = load_table(spark, sf_dir, "events")
    day_user = events.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    grid = day_user.select("day").distinct().withColumnRenamed("day", "gday")
    joined = grid.join(
        day_user,
        (F.col("day") <= F.col("gday"))
        & (F.col("day") > F.col("gday") - F.expr(f"INTERVAL {ROLLING_DAYS} DAYS")),
    )
    return joined.groupBy(F.col("gday").alias("day")).agg(
        F.count_distinct("user_id").cast("long").alias("active_users_7d")
    )


# --- order backlog aging ---------------------------------------------------

_BACKLOG_ORACLE = f"""
WITH snap AS (SELECT max(o_orderdate) AS max_d FROM orders),
open_orders AS (
    SELECT datediff('day', o_orderdate, max_d) AS age_days, o_totalprice
    FROM orders CROSS JOIN snap
    WHERE o_orderstatus = 'O'
)
SELECT CAST(age_days // {AGE_BUCKET_DAYS} AS INT)  AS age_bucket,
       CAST(count(*) AS BIGINT)                    AS n_orders,
       round(sum(o_totalprice), 2)                 AS open_value
FROM open_orders
GROUP BY age_days // {AGE_BUCKET_DAYS}
"""


@register(
    "q_order_backlog_aging",
    oracle=_BACKLOG_ORACLE,
    tags=("orders", "ops", "agg"),
)
def q_order_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog aged into {AGE_BUCKET_DAYS}-day buckets
    (count + open value per bucket), as of the corpus max date
    (injectable-clock discipline — no wall clock). The fulfillment
    aging report; a growing old-bucket tail is the ops alarm.

    Status filter reaches the scan (PushedFilters); ages are integer
    day differences; bucket ids are integer division; the one float
    sum snaps to the money grid. Output is |buckets| rows.
    """
    orders = load_table(spark, sf_dir, "orders")
    asof = orders.groupBy().agg(F.max("o_orderdate").alias("max_d"))
    open_orders = (
        orders.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(asof))
        .select(
            F.datediff("max_d", "o_orderdate").alias("age_days"),
            "o_totalprice",
        )
    )
    return open_orders.groupBy(
        F.floor(F.col("age_days") / AGE_BUCKET_DAYS).cast("int").alias(
            "age_bucket"
        )
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("open_value"),
    )


# --- market concentration (HHI) --------------------------------------------

_HHI_ORACLE = """
WITH cust_spend AS (
    SELECT c.c_nationkey, o.o_custkey,
           round(sum(o.o_totalprice), 2) AS spend
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_nationkey, o.o_custkey
),
nation_tot AS (
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(spend), 2) AS total_spend
    FROM cust_spend GROUP BY c_nationkey
)
SELECT n.n_name,
       t.n_customers,
       t.total_spend,
       round(list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
                        list_sort(list((s.spend / t.total_spend)
                                       * (s.spend / t.total_spend)))),
           (a, b) -> a + b) * 10000, 4) AS hhi
FROM cust_spend s
JOIN nation_tot t ON s.c_nationkey = t.c_nationkey
JOIN nation n ON n.n_nationkey = s.c_nationkey
GROUP BY n.n_name, t.n_customers, t.total_spend
"""


@register(
    "q_market_concentration_hhi",
    oracle=_HHI_ORACLE,
    tags=("customer", "concentration", "economics"),
)
def q_market_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman index of customer-spend concentration per
    nation (x10000, the antitrust convention: <1500 competitive,
    >2500 concentrated). The revenue-concentration complement to
    q_user_activity_gini's activity view — "how exposed is each
    market to its biggest customers?".

    Per-customer spend snaps to the money grid; nation totals re-snap;
    the share-square sum folds sorted (det_sum) and the index snaps to
    4 decimals. Customer dim broadcasts onto orders; everything after
    the per-customer rollup is |customers|-row arithmetic.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    cust_spend = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
    )
    nation_tot = cust_spend.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.round(F.sum("spend"), 2).alias("total_spend"),
    )
    shared = cust_spend.join(F.broadcast(nation_tot), "c_nationkey").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    )
    return shared.groupBy("n_name", "n_customers", "total_spend").agg(
        F.round(
            det_sum(
                "(spend / total_spend) * (spend / total_spend)"
            )
            * 10000,
            4,
        ).alias("hhi")
    )


# --- text readability ------------------------------------------------------

_READABILITY_ORACLE = r"""
WITH scored AS (
    SELECT source,
           length(string_split_regex(trim(text), '\s+')) AS n_words,
           greatest(length(regexp_split_to_array(text, '[.!?]+')) - 1, 1)
               AS n_sentences,
           length(regexp_split_to_array(lower(text), '[aeiouy]+')) - 1
               AS n_vowel_groups
    FROM documents
    WHERE trim(text) <> ''
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
                        list_sort(list(
                            206.835
                            - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                            - 84.6 * (CAST(greatest(n_vowel_groups, n_words)
                                           AS DOUBLE) / n_words)))),
           (a, b) -> a + b) / count(*), 4) AS mean_flesch
FROM scored
GROUP BY source
"""


@register(
    "q_readability_by_source",
    oracle=_READABILITY_ORACLE,
    tags=("text", "quality", "readability"),
)
def q_readability_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean Flesch reading-ease per source, with the classic cheap
    proxies: sentences = punctuation-delimited segments, syllables =
    vowel-group runs (floored at one per word). Another axis of the
    quality panel (q_text_quality_by_source counts shape; this scores
    linguistic complexity) — low scores flag legalese/boilerplate,
    implausibly high ones flag fragment spam.

    Both engines compute counts by splitting on identical regexes
    (split-count = match-count + 1, so the arithmetic is integer until
    the final formula), and the per-source mean folds sorted
    (det_sum). Map-only until the |sources| aggregate; text never
    shuffles.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    scored = docs.select(
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_words"),
        F.greatest(
            F.size(F.split(F.col("text"), r"[.!?]+")) - 1, F.lit(1)
        ).alias("n_sentences"),
        (F.size(F.split(F.lower(F.col("text")), r"[aeiouy]+")) - 1).alias(
            "n_vowel_groups"
        ),
    )
    flesch = (
        F.lit(206.835)
        - 1.015 * (F.col("n_words").cast("double") / F.col("n_sentences"))
        - 84.6
        * (
            F.greatest(F.col("n_vowel_groups"), F.col("n_words")).cast("double")
            / F.col("n_words")
        )
    )
    per_doc = scored.select("source", flesch.alias("flesch"))
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(det_sum("flesch") / F.count(F.lit(1)), 4).alias("mean_flesch"),
    )
