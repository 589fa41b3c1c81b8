"""Multi-dimensional data layout: Z-order (Morton) clustering and the
file-skipping statistics it buys.

Parquet/Delta/Iceberg data skipping works off per-file min/max column
stats: a file whose [min, max] range misses the predicate is never
opened. Sorting by ONE column gives perfect skipping on that column
and none on any other; interleaving the bits of two (or more) bucket
coordinates — the Z-order / Morton curve — gives every interleaved
dimension tight per-file ranges at once. This is `OPTIMIZE ZORDER BY`
in Delta and `sort_order(zorder(...))` in Iceberg, re-expressed here
as a plain Catalyst plan:

1. bucket each dimension to 8 bits against its global min/max (two
   1-row aggregates, broadcast — no shuffle of the fact side);
2. interleave the bits arithmetically (16-bit Morton code) — pure
   codegen expressions, no UDF;
3. order by (z, key) and chunk into fixed-row files; per-file
   min/max of both dimension buckets are then the skipping manifest.

Step 3 is fully distributed AND oracle-stable: the Morton code itself
is a bounded monotone bucket key (2^16 values for 8+8 bits), so
``with_global_position`` (operators/distributed_rank.py) assigns each
row its exact global ``row_number() - 1`` under (z, key) with
per-z-bucket partitioned windows + a bounded carry join — no
single-partition sort, no sampled ``repartitionByRange`` boundaries
(which would NOT be replayable in DuckDB). ``file_id = pos div
FILE_ROWS`` is then byte-for-byte the oracle's global row_number
chunking. `tests/test_layout.py` pins the payoff: a 2-D predicate
opens ≥2× fewer z-ordered files than date-sorted ones.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from cost_of_living_data_etl_spark.operators.distributed_rank import (
    with_global_position,
)
from cost_of_living_data_etl_spark.plans.catalog import register
from cost_of_living_data_etl_spark.sources.tables import load_table

ZBITS = 8
FILE_ROWS = 1000


def morton_z(xb: Column, yb: Column, bits: int = ZBITS) -> Column:
    """Interleave two `bits`-bit bucket coordinates into a Morton
    code: x occupies even bit positions, y odd. Pure integer
    arithmetic — whole-stage-codegen'd, no UDF."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftright(xb, i).bitwiseAND(F.lit(1)) * (1 << (2 * i)))
        terms.append(F.shiftright(yb, i).bitwiseAND(F.lit(1)) * (1 << (2 * i + 1)))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def _morton_sql(xb: str, yb: str, bits: int = ZBITS) -> str:
    """DuckDB mirror of :func:`morton_z` (>> and & on integers)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({xb} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({yb} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def zorder_bounds(orders: DataFrame) -> DataFrame:
    """The 1-row global (price, day) bounds frame the bucket coding
    normalizes against — split out so incremental maintenance can code
    an append batch against the FULL table's bounds (table stats stay
    fixed while data arrives)."""
    return orders.agg(
        F.min("o_totalprice").alias("pmin"),
        F.max("o_totalprice").alias("pmax"),
        F.min(F.to_date("o_orderdate")).alias("dmin"),
        F.max(F.to_date("o_orderdate")).alias("dmax"),
    )


def zorder_code(orders: DataFrame, bounds: DataFrame) -> DataFrame:
    """Bucket-code rows against a bounds frame: (k, xb, yb, z) with
    xb/yb the 8-bit dimension buckets and z their Morton interleave.
    Pure codegen arithmetic after a broadcast of the 1-row bounds."""
    b = orders.crossJoin(F.broadcast(bounds))
    d = F.datediff(F.to_date("o_orderdate"), F.col("dmin"))
    dspan = F.datediff(F.col("dmax"), F.col("dmin"))
    # degenerate span (all prices equal) maps every row to bucket 0 —
    # the raw division would be DIVIDE_BY_ZERO under Spark 4's ANSI
    # default and NULL on DuckDB; the CASE is identical on both engines
    pspan = F.col("pmax") - F.col("pmin")
    xb = (
        F.when(pspan == 0, F.lit(0))
        .otherwise(
            F.least(
                F.lit((1 << ZBITS) - 1),
                F.floor(
                    (F.col("o_totalprice") - F.col("pmin"))
                    * float(1 << ZBITS)
                    / pspan
                ),
            )
        )
        .cast("bigint")
    )
    yb = F.floor(d * float(1 << ZBITS) / (dspan + F.lit(1))).cast("bigint")
    return b.select(
        F.col("o_orderkey").alias("k"), xb.alias("xb"), yb.alias("yb")
    ).withColumn("z", morton_z(F.col("xb"), F.col("yb")))


def zorder_files(
    orders: DataFrame,
    file_rows: int = FILE_ROWS,
    bounds_from: DataFrame | None = None,
) -> DataFrame:
    """Z-order the orders fact on (price, order day) and emit the
    per-file skipping manifest: (file_id, n_rows, price-bucket and
    day-bucket min/max). ``bounds_from``: normalize buckets against
    ANOTHER frame's bounds (default: ``orders`` itself) — the
    incremental-maintenance case where the layout covers the base
    table but coding must match full-table stats."""
    coded = zorder_code(orders, zorder_bounds(bounds_from or orders))
    # the position helper reads its input TWICE (bucket rollup +
    # position join) — materialize the slim (k, xb, yb, z) frame so
    # the scan + ~32-term Morton interleave runs once, not per branch
    # (round 9; the helper's own docstring asks expensive inputs to be
    # materialized first)
    from cost_of_living_data_etl_spark.functions.checkpoints import (
        eager_checkpoint,
    )

    coded = coded.transform(eager_checkpoint)
    # distributed zipWithIndex keyed on the bounded Morton code: exact
    # global (z, k) positions without a single-partition window
    files = with_global_position(coded, ["z", "k"], F.col("z")).withColumn(
        "file_id", F.floor(F.col("pos") / file_rows)
    )
    return files.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("xb").alias("price_b_min"),
        F.max("xb").alias("price_b_max"),
        F.min("yb").alias("day_b_min"),
        F.max("yb").alias("day_b_max"),
    )


_Z_ORACLE = f"""
WITH bounds AS (
    SELECT min(o_totalprice) AS pmin, max(o_totalprice) AS pmax,
           min(CAST(o_orderdate AS DATE)) AS dmin,
           max(CAST(o_orderdate AS DATE)) AS dmax
    FROM orders
),
coded AS (
    SELECT o_orderkey AS k,
           CASE WHEN pmax = pmin THEN 0
                ELSE least({(1 << ZBITS) - 1}, CAST(floor(
                    (o_totalprice - pmin) * {float(1 << ZBITS)} / (pmax - pmin)
                ) AS BIGINT)) END AS xb,
           CAST(floor(
               date_diff('day', dmin, CAST(o_orderdate AS DATE))
               * {float(1 << ZBITS)} / (date_diff('day', dmin, dmax) + 1)
           ) AS BIGINT) AS yb
    FROM orders, bounds
),
z AS (
    SELECT k, xb, yb, {_morton_sql("xb", "yb")} AS z FROM coded
),
f AS (
    SELECT xb, yb,
           CAST(floor((row_number() OVER (ORDER BY z, k) - 1) / {FILE_ROWS})
                AS BIGINT) AS file_id
    FROM z
)
SELECT file_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(xb) AS BIGINT) AS price_b_min,
       CAST(max(xb) AS BIGINT) AS price_b_max,
       CAST(min(yb) AS BIGINT) AS day_b_min,
       CAST(max(yb) AS BIGINT) AS day_b_max
FROM f GROUP BY file_id
"""


@register("q_zorder_layout_manifest", oracle=_Z_ORACLE, tags=("layout", "zorder"))
def q_zorder_layout_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order the orders fact on (total price, order day) and return
    the per-file min/max skipping manifest a lakehouse table format
    would persist. The Morton interleave and the file assignment are
    replayed bit-for-bit in DuckDB; `tests/test_layout.py` pins the
    skipping advantage over a single-column sort."""
    return zorder_files(load_table(spark, sf_dir, "orders"))
