"""Streaming sketch maintenance: append-only HLL register tables.

The streaming half of the persisted-sketch pattern
(operators/sketches.py): each micro-batch reduces to its OWN register
table (≤ m rows per group cell, whatever the batch size) and lands in
a ``batch_id=N`` partition; readers answer distinct-count questions by
max-merging registers across however many batches have arrived. The
merge is associative and idempotent, so

* the sink is exactly-once under replay (batch N overwrites its own
  partition — same contract as streaming/events.py::_batch_sink),
* stream-maintained estimates are EXACTLY equal to batch-sketching the
  union of all input (pinned in tests/test_streaming_sketches.py), and
* no state store is needed at all: the "state" is the append-only
  sketch table itself, bounded by batches × groups × m registers —
  at 100 TB/day this is the design that answers "distinct users this
  month per segment" without ever re-reading raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cost_of_living_data_etl_spark.operators.sketches import (
    det_hll_estimate,
    det_hll_merge,
    det_hll_registers,
)


def hll_register_sink(
    stream: DataFrame,
    sketch_root: str,
    group_cols: list[str],
    key_col: str,
    checkpoint: str,
):
    """foreachBatch sink reducing each micro-batch to its register
    table under ``{sketch_root}/batch_id=N`` (idempotent overwrite per
    batch — a crash-replayed batch replaces, never duplicates)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        regs = det_hll_registers(batch_df, group_cols, key_col)
        regs.write.mode("overwrite").parquet(
            f"{sketch_root}/batch_id={batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )


def read_hll_estimate(
    spark: SparkSession,
    sketch_root: str,
    group_cols: list[str],
    est_col: str = "n_distinct_est",
) -> DataFrame:
    """Distinct-count estimates per ``group_cols`` from the accumulated
    register partitions: max-merge across batches, then the standard
    estimator. Reads ONLY the sketch table — never the raw stream."""
    regs = spark.read.parquet(sketch_root).drop("batch_id")
    return det_hll_estimate(
        det_hll_merge(regs, group_cols), group_cols, est_col
    )


# ---------------------------------------------------------------------------
# Count-Min: the sum-merge sibling of the max-merge HLL sink
# ---------------------------------------------------------------------------


def cms_word_cells(docs: DataFrame) -> DataFrame:
    """CMS_DEPTH×CMS_WIDTH cell table over a documents frame's word
    stream — the same md5-derived row hashes as the batch catalog
    query (plans/mllite.py::q_countmin_word_frequency), so sketches
    built anywhere merge with sketches built anywhere else."""
    import pyspark.sql.functions as F

    from cost_of_living_data_etl_spark.plans.mllite import (
        _CMS_BUCKET_SPARK,
        CMS_DEPTH,
    )

    wc = (
        docs.select(F.trim(F.col("text")).alias("t"))
        .filter(F.col("t") != "")
        .select(F.explode(F.split("t", r"\s+")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    rows = F.array([F.lit(i) for i in range(CMS_DEPTH)])
    return (
        wc.select("word", "cnt", F.explode(rows).alias("i"))
        .select("i", F.expr(_CMS_BUCKET_SPARK).alias("bucket"), "cnt")
        .groupBy("i", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cell"))
    )


def cms_cell_sink(stream: DataFrame, sketch_root: str, checkpoint: str):
    """foreachBatch sink landing each micro-batch's OWN Count-Min cell
    table under ``{sketch_root}/batch_id=N`` (idempotent overwrite).
    Count-Min cells merge by ADDITION — exactly, not approximately: the
    sum-merged stream sketch is bit-identical to sketching the union of
    all input in one pass (CMS is a linear sketch), the property the
    companion test pins. Per-batch state is depth×width cells whatever
    the batch size."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        cms_word_cells(batch_df).write.mode("overwrite").parquet(
            f"{sketch_root}/batch_id={batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )


def read_cms_cells(spark: SparkSession, sketch_root: str) -> DataFrame:
    """The live merged sketch: cell-wise SUM across batch partitions.
    Point queries take min over the depth rows of the summed cells,
    exactly as the batch query does."""
    import pyspark.sql.functions as F

    return (
        spark.read.parquet(sketch_root)
        .groupBy("i", "bucket")
        .agg(F.sum("cell").cast("long").alias("cell"))
    )
