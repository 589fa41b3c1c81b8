"""Join strategies and set operations over the star schema.

Spark-first versions of everything SURVEY.md §2.4-2.5 lists as absent
from the reference (semi/anti/outer joins, set ops) plus the multi-way
equi-join shapes the star schema exists for.

Join-strategy policy at 100 TB:
- region/nation: ALWAYS broadcast (bounded domains, KB-sized forever);
- customer/supplier/part: broadcast at test SFs; at cluster scale AQE's
  dynamic broadcast decides (autoBroadcastJoinThreshold), falling back
  to shuffle hash/sort-merge with skew-join splitting;
- fact⋈fact (orders⋈lineitem): shuffle on the join key — both sides
  partition-pruned and column-pruned before the exchange.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cost_of_living_data_etl_spark.plans.catalog import register
from cost_of_living_data_etl_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q5_region_nation_revenue",
    oracle="""
    SELECT
        r_name                                           AS region_name,
        n_name                                           AS nation_name,
        CAST(count(*) AS BIGINT)                         AS n_lineitems,
        sum(l_extendedprice * (1 - l_discount))          AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY r_name, n_name
    """,
    tags=("join", "agg", "broadcast"),
)
def q5_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by region/nation: the canonical star-schema rollup.

    Plan shape at scale: lineitem⋈orders shuffles on orderkey (both
    huge); customer/nation/region chain collapses into broadcast hash
    joins on the probe side; aggregate is map-side partial on a
    30-group key. One shuffle total for the big join + one for the
    final agg — minimal for this query.
    """
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT sum(l_extendedprice * l_discount) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("agg", "filter"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: conjunctive pushed filters + global sum.

    Every predicate reaches the parquet scan (PushedFilters); the
    aggregate is a single scalar — shuffle carries one row/partition.
    """
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "q_semi_join_active_customers",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01'
    )
    """,
    tags=("join", "semi"),
)
def q_semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi ≡ EXISTS: customers with any order since 2000.

    Semi join never duplicates or widens rows — at scale the orders
    side is pre-aggregated to distinct keys by the semi-join itself.
    """
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "q_anti_join_dormant_customers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01'
    )
    """,
    tags=("join", "anti"),
)
def q_anti_join_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti ≡ NOT EXISTS: customers with no order since 2000."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "q_outer_join_nation_customer_counts",
    oracle="""
    SELECT
        n_name                                        AS nation_name,
        CAST(count(c_custkey) AS BIGINT)              AS n_customers,
        coalesce(sum(c_acctbal), 0.0)                 AS total_acctbal
    FROM nation
    LEFT JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("join", "outer", "agg"),
)
def q_outer_join_nation_customer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving empty nations (count=0 rows)."""
    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    return (
        nation.join(customer, nation.n_nationkey == customer.c_nationkey, "left")
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.coalesce(F.sum("c_acctbal"), F.lit(0.0)).alias("total_acctbal"),
        )
    )


@register(
    "q_setops_customer_periods",
    oracle="""
    WITH p1 AS (SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'),
         p2 AS (SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '2000-01-01')
    SELECT 'both' AS cohort, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT o_custkey FROM p1 INTERSECT SELECT o_custkey FROM p2)
    UNION ALL
    SELECT 'only_early' AS cohort, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT o_custkey FROM p1 EXCEPT SELECT o_custkey FROM p2)
    UNION ALL
    SELECT 'either' AS cohort, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT o_custkey FROM p1 UNION SELECT o_custkey FROM p2)
    """,
    tags=("setops",),
)
def q_setops_customer_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION(distinct) cohort sizes across periods."""
    orders = _t(spark, sf_dir, "orders")

    def period(lo: str, hi: str) -> DataFrame:
        return (
            orders.filter(
                (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    p1 = period("1996-01-01", "1998-01-01")
    p2 = period("1998-01-01", "2000-01-01")
    both = p1.intersect(p2).agg(F.count(F.lit(1)).alias("n")).withColumn("cohort", F.lit("both"))
    only_early = p1.exceptAll(p2).agg(F.count(F.lit(1)).alias("n")).withColumn("cohort", F.lit("only_early"))
    either = p1.union(p2).distinct().agg(F.count(F.lit(1)).alias("n")).withColumn("cohort", F.lit("either"))
    return both.unionByName(only_early).unionByName(either).select("cohort", "n")


@register(
    "q_distinct_status_priority",
    oracle="""
    SELECT DISTINCT o_orderstatus AS status, o_orderpriority AS priority
    FROM orders
    """,
    tags=("distinct",),
)
def q_distinct_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a two-column projection (hash aggregate, no values)."""
    return (
        _t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        )
        .distinct()
    )


# snapshot-diff version buckets (md5(o_orderkey) % 100):
#   < 5        deleted  (in v1 only)
#   5 ≤ b < 10 changed  (price restated in v2)
#   ≥ 95       added    (in v2 only)
_DIFF_BUCKET = (
    "cast(conv(substring(md5(cast(o_orderkey AS STRING)), 1, 15), 16, 10)"
    " AS BIGINT) % 100"
)
_DIFF_BUCKET_SQL = (
    "CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) % 100"
)


@register(
    "q_snapshot_diff_orders",
    oracle=f"""
    WITH b AS (SELECT o_orderkey, o_totalprice, {_DIFF_BUCKET_SQL} AS bk FROM orders),
    v1 AS (SELECT o_orderkey, o_totalprice FROM b WHERE bk < 95),
    v2 AS (
        SELECT o_orderkey,
               CASE WHEN bk >= 5 AND bk < 10
                    THEN round(o_totalprice * 1.1, 2) ELSE o_totalprice END
                   AS o_totalprice
        FROM b WHERE bk >= 5
    ),
    d AS (
        SELECT
            CASE WHEN v2.o_orderkey IS NULL THEN 'deleted'
                 WHEN v1.o_orderkey IS NULL THEN 'added'
                 WHEN v1.o_totalprice IS DISTINCT FROM v2.o_totalprice THEN 'changed'
                 ELSE 'unchanged' END AS status,
            COALESCE(v1.o_orderkey, v2.o_orderkey) AS k,
            COALESCE(v2.o_totalprice, v1.o_totalprice) AS price
        FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
    )
    SELECT status,
           CAST(count(*) AS BIGINT)  AS n_rows,
           CAST(min(k) AS BIGINT)    AS min_key,
           CAST(max(k) AS BIGINT)    AS max_key,
           round(sum(price), 2)      AS total_price
    FROM d GROUP BY status
    """,
    tags=("diff", "full-outer-join", "versioning"),
)
def q_snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between two table versions — the change-feed a
    lakehouse computes when no CDC log exists: FULL OUTER JOIN on the
    key, then classify each row added / deleted / changed / unchanged
    (null-safe value comparison). The versions are synthesized
    deterministically from one fixture scan (disjoint md5 buckets for
    deletes/adds, a price restatement for changes), so expected class
    sizes are fixed by construction and the whole diff is
    oracle-replayable.

    Scale shape: one shuffle per side on the join key (the minimum any
    keyed diff needs), classification and the per-class rollup are
    map-side; the output is |classes| rows. At 100 TB both snapshot
    scans are partition-pruned to the compared slice, and bucketed
    layouts (sources/warehouse.py::save_bucketed) make the diff
    exchange-free.
    """
    b = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.expr(_DIFF_BUCKET).alias("bk")
    )
    v1 = b.filter(F.col("bk") < 95).select(
        F.col("o_orderkey").alias("k1"), F.col("o_totalprice").alias("p1")
    )
    v2 = b.filter(F.col("bk") >= 5).select(
        F.col("o_orderkey").alias("k2"),
        F.when(
            (F.col("bk") >= 5) & (F.col("bk") < 10),
            F.round(F.col("o_totalprice") * 1.1, 2),
        )
        .otherwise(F.col("o_totalprice"))
        .alias("p2"),
    )
    d = v1.join(v2, v1.k1 == v2.k2, "full_outer").select(
        F.when(F.col("k2").isNull(), "deleted")
        .when(F.col("k1").isNull(), "added")
        .when(~F.col("p1").eqNullSafe(F.col("p2")), "changed")
        .otherwise("unchanged")
        .alias("status"),
        F.coalesce(F.col("k1"), F.col("k2")).alias("k"),
        F.coalesce(F.col("p2"), F.col("p1")).alias("price"),
    )
    return d.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("k").alias("min_key"),
        F.max("k").alias("max_key"),
        F.round(F.sum("price"), 2).alias("total_price"),
    )
