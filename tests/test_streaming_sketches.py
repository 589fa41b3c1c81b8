"""Streaming HLL register maintenance equals batch sketching exactly.

The property under test is the one that makes sketch tables a valid
streaming "state": register max-merge is associative and idempotent,
so per-micro-batch register partitions merged at read time must give
BIT-IDENTICAL estimates to sketching the whole input in one batch
pass — regardless of how the stream was chopped into batches.
"""

from __future__ import annotations

import shutil

import pytest

from cost_of_living_data_etl_spark.operators.sketches import (
    det_hll_estimate,
    det_hll_registers,
)
from cost_of_living_data_etl_spark.sources.tables import load_events
from cost_of_living_data_etl_spark.streaming.events import read_events_stream
from cost_of_living_data_etl_spark.streaming.sketches import (

    hll_register_sink,
    read_hll_estimate,
)
from conftest import TESTDATA

SF = f"{TESTDATA}/sf0.001"


@pytest.fixture()
def split_stream_dir(tmp_path):
    """Two event files so availableNow + maxFilesPerTrigger=1 yields at
    least two micro-batches (the second file duplicates the first —
    HLL must absorb the duplicate users idempotently)."""
    d = tmp_path / "ev_stream"
    d.mkdir()
    shutil.copy(f"{SF}/events.parquet", d / "a.parquet")
    shutil.copy(f"{SF}/events.parquet", d / "b.parquet")
    return str(d)


def test_stream_maintained_hll_equals_batch_sketch(
    spark, tmp_path, split_stream_dir
):
    stream = read_events_stream(
        spark, split_stream_dir, max_files_per_trigger=1
    )
    q = (
        hll_register_sink(
            stream,
            str(tmp_path / "sketches"),
            ["event_type"],
            "user_id",
            str(tmp_path / "ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # at least two batch partitions landed
    batches = spark.read.parquet(str(tmp_path / "sketches"))
    assert batches.select("batch_id").distinct().count() >= 2

    got = {
        r["event_type"]: (r["n_distinct_est"], r["n_rows"])
        for r in read_hll_estimate(
            spark, str(tmp_path / "sketches"), ["event_type"]
        ).collect()
    }

    # batch twin over the SAME doubled input
    union = load_events(spark, split_stream_dir).select(
        "event_type", "user_id"
    )
    want = {
        r["event_type"]: (r["n_distinct_est"], r["n_rows"])
        for r in det_hll_estimate(
            det_hll_registers(union, ["event_type"], "user_id"),
            ["event_type"],
        ).collect()
    }

    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k  # estimate BIT-identical
        assert got[k][1] == want[k][1], k  # raw row counts carried


def test_hll_register_sink_replay_is_idempotent(spark, tmp_path):
    """Re-running a batch id must replace its partition, not stack a
    second copy whose merged registers silently double n_rows."""
    ev = load_events(spark, f"{SF}/events.parquet").select(
        "event_type", "user_id"
    )
    regs = det_hll_registers(ev, ["event_type"], "user_id")
    root = str(tmp_path / "sk")
    regs.write.mode("overwrite").parquet(f"{root}/batch_id=3")
    regs.write.mode("overwrite").parquet(f"{root}/batch_id=3")  # replay

    est = {
        r["event_type"]: r["n_rows"]
        for r in read_hll_estimate(spark, root, ["event_type"]).collect()
    }
    want = {
        r["event_type"]: r["n_rows"]
        for r in det_hll_estimate(regs, ["event_type"]).collect()
    }
    assert est == want


def test_stream_maintained_cms_equals_batch_sketch(spark, tmp_path):
    """Count-Min is a LINEAR sketch: summing per-batch cell tables must
    reproduce the one-pass full-corpus cell table bit-for-bit (not just
    estimates — every cell)."""
    import pyspark.sql.functions as F

    from cost_of_living_data_etl_spark.streaming.sketches import (
        cms_cell_sink,
        cms_word_cells,
        read_cms_cells,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    src = tmp_path / "docs_stream"
    for i, (lo, hi) in enumerate(
        [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]
    ):
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.parquet(f"{src}/b{i}")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    root = str(tmp_path / "cms")
    q = (
        cms_cell_sink(stream, root, str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert (
        spark.read.parquet(root).select("batch_id").distinct().count() == 3
    )
    got = {
        (r["i"], r["bucket"]): r["cell"]
        for r in read_cms_cells(spark, root).collect()
    }
    want = {
        (r["i"], r["bucket"]): r["cell"]
        for r in cms_word_cells(docs).collect()
    }
    assert got == want and len(want) > 0
