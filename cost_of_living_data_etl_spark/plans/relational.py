"""Relational query layer: aggregations, joins, sorts over the star schema.

These queries exercise the full §2 operator surface (scan, filter,
project, cast, scalar fns, equi-joins, aggregation) the way the
reference's downstream warehouse consumers would — but expressed as
lazy Catalyst plans so predicate pushdown, column pruning, partial
aggregation and broadcast-join selection are automatic.

Scale notes are per-query; the recurring ones:
- groupBy on low-cardinality keys → partial (map-side) aggregation
  shrinks the shuffle to |groups| × partitions rows. Safe at 100 TB.
- joins to bounded dims (region/nation) → explicit broadcast; joins
  between fact tables shuffle on the join key and rely on AQE for
  skew splitting.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from cost_of_living_data_etl_spark.plans.catalog import register
from cost_of_living_data_etl_spark.sources.tables import load_table


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        sum(l_quantity)                                         AS sum_qty,
        sum(l_extendedprice)                                    AS sum_base_price,
        sum(l_extendedprice * (1 - l_discount))                 AS sum_disc_price,
        sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))   AS sum_charge,
        avg(l_quantity)                                         AS avg_qty,
        avg(l_extendedprice)                                    AS avg_price,
        avg(l_discount)                                         AS avg_disc,
        count(*)                                                AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "scan", "filter"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: filtered scan + hash aggregate.

    Scale: the filter pushes to the parquet scan (PushedFilters), only 7
    columns are read (ReadSchema), and the 6-group aggregate is almost
    entirely map-side — the shuffle carries ~6 rows per partition
    regardless of input size. This plan is flat-out scan-bound at 100 TB.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
