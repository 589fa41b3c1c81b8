"""Streaming drift monitoring: per-micro-batch Population Stability
Index against a static baseline histogram.

The streaming twin of ``plans/feature_prep.py::q_psi_price_drift_by_month``:
the batch form asks "did this month's distribution drift from the
baseline year"; this form asks the same question of every arriving
micro-batch, which is how a production ingest actually catches an
upstream breakage — BEFORE the broken partition lands in the lake.

Pattern note: PSI is a two-level computation (bucket counts, then a
fold across buckets). Chaining two streaming aggregations is the
restricted/fragile path, so this uses the standard
``foreachBatch`` escape hatch instead: within a micro-batch the frame
is a plain batch DataFrame, the full PSI expression runs on it (bucket
counts partial-aggregate map-side; everything after is ≤ n_buckets
rows), and one (batch_id, n_rows, n_nulls, psi) row lands per batch via the
same idempotent batch_id-keyed overwrite as the warehouse sink
(streaming/events.py::_batch_sink) — replays after a crash replace,
never duplicate. State: NONE kept by the engine (each batch is scored
independently against the broadcast ≤ n_buckets-row baseline), so the
monitor survives any retention horizon at 100 TB ingest rates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _bucket(value_col: str, bucket_width: float, n_buckets: int) -> Column:
    """Clamped fixed-width bucket id in [0, n_buckets-1].

    BOTH ends clamp: values above the domain land in the top bucket
    and values below it (including negatives from a sign-flip
    breakage) land in bucket 0 — out-of-domain data must REGISTER as
    drift in an edge bucket, never silently drop out of the grid
    join. NULLs are the one remaining non-bucketable case; they are
    excluded here and surfaced as an explicit n_nulls count by
    batch_psi (a null-rate spike is its own breakage signal, not a
    histogram shape change)."""
    return (
        F.greatest(
            F.least(
                F.floor(F.col(value_col) / F.lit(bucket_width)),
                F.lit(n_buckets - 1),
            ),
            F.lit(0),
        )
        .cast("int")
        .alias("bucket")
    )


def histogram_baseline(
    df: DataFrame, value_col: str, bucket_width: float, n_buckets: int
) -> DataFrame:
    """Static (bucket, n_base) histogram over fixed-width buckets —
    compute once on the trusted reference slice, reuse for every
    micro-batch (and persist it as the monitoring contract)."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(_bucket(value_col, bucket_width, n_buckets))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_base"))
    )


def batch_psi(
    batch_df: DataFrame,
    baseline: DataFrame,
    value_col: str,
    bucket_width: float,
    n_buckets: int,
) -> DataFrame:
    """One-row (n_rows, n_nulls, psi) frame: Laplace-smoothed PSI of
    ``batch_df[value_col]`` vs the baseline histogram, plus the total
    row count and the NULL-value count (NULLs can't be bucketed, so
    they are reported as their own signal instead of vanishing).
    Shared by the streaming sink and its batch-twin test."""
    stats = batch_df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col(value_col).isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_nulls"),
    )
    cur = (
        batch_df.filter(F.col(value_col).isNotNull())
        .select(_bucket(value_col, bucket_width, n_buckets))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_cur"))
    )
    grid = (
        baseline.sparkSession.range(n_buckets)
        .select(F.col("id").cast("int").alias("bucket"))
        .join(F.broadcast(baseline), "bucket", "left")
        .join(F.broadcast(cur), "bucket", "left")
    )
    smooth = F.lit(float(n_buckets))
    # totals as scalar aggregates folded back in (grid is ≤ n_buckets rows)
    totals = grid.agg(
        F.sum(F.coalesce(F.col("n_base"), F.lit(0))).cast("long").alias("tot_base"),
        F.sum(F.coalesce(F.col("n_cur"), F.lit(0))).cast("long").alias("tot_cur"),
    )
    p_cur = (F.coalesce(F.col("n_cur"), F.lit(0)) + F.lit(1.0)) / (
        F.col("tot_cur") + smooth
    )
    p_base = (F.coalesce(F.col("n_base"), F.lit(0)) + F.lit(1.0)) / (
        F.col("tot_base") + smooth
    )
    return (
        grid.crossJoin(F.broadcast(totals))
        .select(((p_cur - p_base) * F.log(p_cur / p_base)).alias("term"))
        .agg(F.sum("term").alias("psi"))
        .crossJoin(F.broadcast(stats))
        .select("n_rows", "n_nulls", "psi")
    )


def psi_drift_monitor(
    stream: DataFrame,
    baseline: DataFrame,
    out_dir: str,
    checkpoint: str,
    value_col: str = "value",
    bucket_width: float = 50.0,
    n_buckets: int = 20,
):
    """writeStream query scoring every micro-batch's PSI vs the
    baseline; one (batch_id=N)/part parquet row per batch, idempotent
    under replay (overwrite-by-batch_id, same contract as the
    warehouse sink)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_psi(
            batch_df, baseline, value_col, bucket_width, n_buckets
        ).write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
