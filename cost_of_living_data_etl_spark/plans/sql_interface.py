"""Spark SQL surface: the engine's queries are equally expressible as
ANSI SQL over registered views — ONE query text runs verbatim on both
Spark and the DuckDB oracle, proving the SQL dialect surface (CTEs,
window-over-aggregate, joins, date_trunc) is portable ANSI, not
DataFrame-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cost_of_living_data_etl_spark.plans.catalog import register
from cost_of_living_data_etl_spark.sources.tables import load_table

# Shared verbatim between Spark and DuckDB: ANSI subset only.
_SQL_CTE_WINDOW = """
WITH monthly AS (
    SELECT
        o_custkey,
        date_trunc('month', o_orderdate) AS month,
        sum(o_totalprice)                AS spend
    FROM orders
    GROUP BY o_custkey, date_trunc('month', o_orderdate)
)
SELECT
    c_mktsegment,
    month,
    round(sum(spend), 2)                 AS seg_spend,
    CAST(rank() OVER (
        PARTITION BY month
        ORDER BY sum(spend) DESC, c_mktsegment
    ) AS INT)                            AS seg_rank
FROM monthly
JOIN customer ON c_custkey = o_custkey
GROUP BY c_mktsegment, month
"""


@register(
    "q_sql_cte_window",
    oracle=_SQL_CTE_WINDOW,
    tags=("sql", "cte", "window", "join"),
)
def q_sql_cte_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly spend per market segment with in-month rank — executed
    via ``spark.sql`` over temp views, with the IDENTICAL query text as
    the DuckDB oracle.

    Registering a view over a lazy parquet scan adds nothing physical:
    Catalyst plans the SQL exactly as the equivalent DataFrame chain
    (pushdown, partial agg, broadcast all apply). The window runs over
    the aggregate's output (|segments|×|months| rows), not the fact
    table.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_SQL_CTE_WINDOW)
