"""Scalar-function capabilities: string ops, date/time extraction,
JSON extraction, conditional expressions — all native Column
expressions (whole-stage codegen; zero Python in the row path).

Generalizes the reference's scalar surface (C1-C3: cast, de-comma,
string concat — reference app.py:53-54,71,82-83,102) to the full
practical toolkit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cost_of_living_data_etl_spark.plans.catalog import register
from cost_of_living_data_etl_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q_string_functions_part",
    oracle="""
    SELECT
        p_partkey,
        upper(p_name)                                        AS name_upper,
        CAST(length(p_name) AS BIGINT)                       AS name_len,
        substr(p_type, 1, 6)                                 AS type_prefix,
        CAST(regexp_extract(p_brand, '#(\\d+)', 1) AS BIGINT) AS brand_num,
        concat(p_brand, '/', p_type)                         AS brand_type,
        replace(p_type, ' ', '_')                            AS type_snake,
        CASE WHEN p_type LIKE 'PROMO%' THEN 'promo' ELSE 'regular' END AS kind
    FROM part
    WHERE p_name LIKE '%a%' AND p_size BETWEEN 1 AND 40
    """,
    tags=("scalar", "string"),
)
def q_string_functions_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String toolkit: upper/length/substr/regexp_extract/concat/replace/LIKE."""
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%a%") & F.col("p_size").between(1, 40))
        .select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.length("p_name").cast("long").alias("name_len"),
            F.substring("p_type", 1, 6).alias("type_prefix"),
            F.regexp_extract("p_brand", r"#(\d+)", 1).cast("long").alias("brand_num"),
            F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
            F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
            F.when(F.col("p_type").like("PROMO%"), F.lit("promo"))
            .otherwise("regular")
            .alias("kind"),
        )
    )


@register(
    "q_date_extraction_revenue",
    oracle="""
    SELECT
        CAST(year(o_orderdate) AS BIGINT)    AS order_year,
        CAST(month(o_orderdate) AS BIGINT)   AS order_month,
        CAST(count(*) AS BIGINT)             AS n_orders,
        sum(o_totalprice)                    AS total_value
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY order_year, order_month
    """,
    tags=("scalar", "date", "agg"),
)
def q_date_extraction_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar extraction + monthly rollup (year/month on timestamps).

    At scale the winning layout partitions the lake by a date column,
    turning this filter into partition pruning instead of a scan filter.
    """
    return (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .groupBy(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.month("o_orderdate").cast("long").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("total_value"),
        )
    )


@register(
    "q_datediff_ship_latency",
    oracle="""
    SELECT
        l_returnflag,
        avg(date_diff('day', o_orderdate, l_shipdate))                 AS avg_ship_days,
        CAST(max(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS max_ship_days
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_returnflag
    """,
    tags=("scalar", "date", "join"),
)
def q_datediff_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic across a fact⋈fact join: order→ship latency."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    ship_days = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.avg(ship_days).alias("avg_ship_days"),
            F.max(ship_days).cast("long").alias("max_ship_days"),
        )
    )


@register(
    "q_json_extraction_events",
    oracle="""
    SELECT
        event_type,
        CAST(count(*) AS BIGINT)                                      AS n_events,
        CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        avg(CAST(json_extract_string(props, '$.k') AS BIGINT))       AS avg_k
    FROM events
    GROUP BY event_type
    """,
    tags=("scalar", "json"),
)
def q_json_extraction_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events props column.

    `get_json_object` is JVM-native; for hot paths with a known schema
    `from_json` with an explicit StructType is the faster bulk parse
    (one parse per row instead of one per field probed).
    """
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).cast("long").alias("sum_k"),
            F.avg(k).alias("avg_k"),
        )
    )


@register(
    "q_null_handling_bucketed_balance",
    oracle="""
    SELECT
        CASE
            WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 1000 THEN 'low'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high'
        END                                  AS balance_bucket,
        CAST(count(*) AS BIGINT)             AS n_customers,
        sum(c_acctbal)                       AS total_balance
    FROM customer
    GROUP BY balance_bucket
    """,
    tags=("scalar", "conditional", "agg"),
)
def q_null_handling_bucketed_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-branch CASE bucketing feeding an aggregate."""
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    return (
        _t(spark, sf_dir, "customer")
        .groupBy(bucket.alias("balance_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("c_acctbal").alias("total_balance"),
        )
    )


@register(
    "q_variant_json_events",
    oracle="""
    WITH x AS (
        SELECT event_type,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT)             AS n_events,
           CAST(count(DISTINCT k) AS BIGINT)    AS n_distinct_k,
           CAST(max(k) AS BIGINT)               AS max_k,
           count(*) FILTER (WHERE k >= 50) / CAST(count(*) AS DOUBLE) AS share_high_k
    FROM x GROUP BY event_type
    """,
    tags=("scalar", "json", "variant"),
)
def q_variant_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via the VARIANT type (Spark 4):
    ``parse_json`` ONCE per row into a binary variant, then typed
    ``variant_get`` probes — vs ``get_json_object``'s re-parse per
    field probed (q_json_extraction_events shows that legacy path).

    At 100 TB the difference compounds: a props blob probed for five
    fields parses five times under get_json_object and once under
    variant; variant columns are also storable, so the parse can be
    paid at INGEST and never again. Shuffle shape is unchanged — one
    short-key aggregate on event_type.
    """
    events = _t(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct(F.col("k")).cast("long").alias("n_distinct_k"),
            F.max("k").alias("max_k"),
            (
                F.count_if(F.col("k") >= 50) / F.count(F.lit(1)).cast("double")
            ).alias("share_high_k"),
        )
    )
