"""Fixture-contract smoke test.

The driver regenerates /root/testdata between rounds and has already
changed physical layouts once (events.ts TIMESTAMP(NANOS) →
TIMESTAMP(MICROS) in round 2, which crashed the round-2 bench). This
test pins the LOADED dtypes — what every downstream operator assumes —
at all three scale factors, so the next silent regeneration fails
loudly here instead of crashing the driver bench mid-run.

Pin the loader's contract, not the parquet physical type: the loader's
whole job (sources/tables.py::load_events) is to absorb physical-layout
drift and present one stable schema.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    TimestampType,
)

from cost_of_living_data_etl_spark.sources.tables import load_table

from conftest import TESTDATA

SF_DIRS = [
    d
    for d in (
        f"{TESTDATA}/sf0.001",
        f"{TESTDATA}/sf0.01",
        f"{TESTDATA}/sf0.1",
    )
    if os.path.isdir(d)
]

# (table, column, required loaded type). Integer width (int32 vs int64)
# is allowed to drift — stringified values hash identically at the
# driver — so key columns are pinned only where code does arithmetic
# or type-sensitive ops on them.
CONTRACT = [
    ("events", "ts", TimestampType()),
    ("events", "event_id", LongType()),
    ("events", "value", DoubleType()),
    ("events", "props", StringType()),
    ("embeddings", "embedding", ArrayType(FloatType(), True)),
    ("embeddings", "vec_id", LongType()),
    ("documents", "text", StringType()),
    ("documents", "doc_id", LongType()),
    ("lineitem", "l_extendedprice", DoubleType()),
    ("lineitem", "l_discount", DoubleType()),
    ("orders", "o_totalprice", DoubleType()),
]

# Temporal columns where either generation is fine as long as it is
# SOME timestamp flavor usable by year()/month()/datediff-style exprs.
TEMPORALISH = [("orders", "o_orderdate"), ("lineitem", "l_shipdate")]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_loaded_dtypes_match_contract(spark, sf_dir):
    cache = {}
    for table, col, want in CONTRACT:
        if table not in cache:
            cache[table] = load_table(spark, sf_dir, table).schema
        got = cache[table][col].dataType
        assert got == want, (
            f"{sf_dir}/{table}.{col}: loaded as {got}, contract says {want} "
            f"— the driver fixtures changed layout; absorb it in "
            f"sources/tables.py, not downstream"
        )
    for table, col in TEMPORALISH:
        if table not in cache:
            cache[table] = load_table(spark, sf_dir, table).schema
        got = cache[table][col].dataType
        assert got.typeName() in ("timestamp", "timestamp_ntz", "date"), (
            f"{sf_dir}/{table}.{col}: loaded as {got}, expected a temporal type"
        )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_values_are_modern(spark, sf_dir):
    """A unit-confusion regression (nanos read as micros, or micros
    div'd by 1000 again) lands timestamps circa 1970/2500 — pin the
    decade instead of exact values so any future off-by-1000x fails."""
    import pyspark.sql.functions as F

    row = (
        load_table(spark, sf_dir, "events")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()[0]
    )
    assert 2000 <= row["lo"].year <= 2100, row["lo"]
    assert 2000 <= row["hi"].year <= 2100, row["hi"]


def test_loader_and_stream_absorb_nanos_generation(spark, tmp_path):
    """Round-1 fixtures shipped events.ts as parquet TIMESTAMP(NANOS).
    Both the batch loader and the stream ingest must absorb that
    generation and yield the same TimestampType values as the current
    MICROS layout."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cost_of_living_data_etl_spark.sources.tables import load_events
    from cost_of_living_data_etl_spark.streaming.events import read_events_stream

    src = f"{TESTDATA}/sf0.001/events.parquet"
    t = pq.read_table(src)
    ts_ns = t.column("ts").cast(pa.timestamp("ns"))
    t2 = t.set_column(t.schema.get_field_index("ts"), "ts", ts_ns)
    d = tmp_path / "nanos"
    d.mkdir()
    pq.write_table(
        t2, str(d / "events.parquet"), coerce_timestamps=None,
        store_schema=False, version="2.6",
    )
    assert pq.read_schema(str(d / "events.parquet")).field("ts").type == pa.timestamp("ns")

    # batch loader: same type and values as the micros generation
    nanos_df = load_events(spark, str(d / "events.parquet"))
    micros_df = load_events(spark, src)
    assert nanos_df.schema["ts"].dataType.typeName() == "timestamp"
    got = sorted((r["event_id"], r["ts"]) for r in nanos_df.limit(50).collect())
    want = sorted((r["event_id"], r["ts"]) for r in micros_df.limit(50).collect())
    assert got == want

    # stream ingest: schema probe must pick the long branch and
    # produce TimestampType
    stream = read_events_stream(spark, str(d))
    assert stream.schema["ts"].dataType.typeName() == "timestamp"
    assert stream.isStreaming
