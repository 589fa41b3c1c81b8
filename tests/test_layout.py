"""Z-order layout: the manifest must actually buy 2-D file skipping.

The claim behind q_zorder_layout_manifest is that interleaving two
bucket coordinates gives BOTH dimensions tight per-file ranges, so a
2-D predicate opens far fewer files than under a single-column sort.
This test builds both layouts from the same coded rows and compares
how many files a central price × day box predicate has to open.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from cost_of_living_data_etl_spark.plans.layout import ZBITS, morton_z
from cost_of_living_data_etl_spark.sources.tables import load_table


def _coded(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_totalprice").alias("pmin"),
        F.max("o_totalprice").alias("pmax"),
        F.min(F.to_date("o_orderdate")).alias("dmin"),
        F.max(F.to_date("o_orderdate")).alias("dmax"),
    )
    b = orders.crossJoin(F.broadcast(bounds))
    d = F.datediff(F.to_date("o_orderdate"), F.col("dmin"))
    dspan = F.datediff(F.col("dmax"), F.col("dmin"))
    xb = F.least(
        F.lit((1 << ZBITS) - 1),
        F.floor(
            (F.col("o_totalprice") - F.col("pmin"))
            * float(1 << ZBITS)
            / (F.col("pmax") - F.col("pmin"))
        ),
    ).cast("bigint")
    yb = F.floor(d * float(1 << ZBITS) / (dspan + F.lit(1))).cast("bigint")
    return b.select(F.col("o_orderkey").alias("k"), xb.alias("xb"), yb.alias("yb"))


def _files_opened(coded, order_cols, file_rows=100):
    """Chunk rows into files under the given sort order; count files
    whose (price, day) bucket ranges overlap a central 64×64 box."""
    w = Window.orderBy(*order_cols)
    manifest = (
        coded.withColumn("file_id", F.floor((F.row_number().over(w) - 1) / file_rows))
        .groupBy("file_id")
        .agg(
            F.min("xb").alias("x0"),
            F.max("xb").alias("x1"),
            F.min("yb").alias("y0"),
            F.max("yb").alias("y1"),
        )
    )
    lo, hi = 96, 159
    total = manifest.count()
    opened = manifest.filter(
        (F.col("x1") >= lo) & (F.col("x0") <= hi)
        & (F.col("y1") >= lo) & (F.col("y0") <= hi)
    ).count()
    return opened, total


def test_zorder_beats_single_column_sort(spark, sf_oracle):
    # sf0.01: enough rows that each 100-row file covers a tight z range
    coded = _coded(spark, sf_oracle).cache()
    try:
        zcoded = coded.withColumn("z", morton_z(F.col("xb"), F.col("yb")))
        z_opened, z_total = _files_opened(zcoded, ["z", "k"])
        d_opened, d_total = _files_opened(coded, ["yb", "k"])
        assert z_total == d_total
        # the date-sorted layout opens every file whose day range hits
        # the box (price ranges are useless there); z-order must open
        # at most half as many
        assert z_opened * 2 <= d_opened, (z_opened, d_opened)
    finally:
        coded.unpersist()


def test_zorder_file_ranges_are_tight(spark, sf_smoke):
    """Mean per-file price-bucket span under z-order must be well
    under the full 256-bucket span (the whole point of clustering)."""
    coded = _coded(spark, sf_smoke)
    zcoded = coded.withColumn("z", morton_z(F.col("xb"), F.col("yb")))
    w = Window.orderBy("z", "k")
    manifest = (
        zcoded.withColumn("file_id", F.floor((F.row_number().over(w) - 1) / 100))
        .groupBy("file_id")
        .agg((F.max("xb") - F.min("xb")).alias("xspan"))
    )
    mean_span = manifest.agg(F.avg("xspan")).collect()[0][0]
    assert mean_span < 128, mean_span
