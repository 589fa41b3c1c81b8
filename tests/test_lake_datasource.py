"""Custom Python Data Source vs the native lake reader.

The connector must produce the same rows as the native multi-file CSV
scan on the same lake layout, and must parallelize the way the
reference's sequential loop doesn't: one input partition per listed
object.
"""

from __future__ import annotations

import pytest

from cost_of_living_data_etl_spark.plans.schemas import LAKE_SCHEMAS
from cost_of_living_data_etl_spark.sources.lake import LAKE_PREFIX, read_lake_csv
from cost_of_living_data_etl_spark.sources import lake_datasource
from cost_of_living_data_etl_spark.sources.lake_datasource import register

EXTRACT = "2024-06-01"


@pytest.fixture(scope="module")
def lake_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("lake_ds")
    d = root / LAKE_PREFIX / EXTRACT
    d.mkdir(parents=True)
    (d / "living_wage_1.csv").write_text(
        "wage_level,num_adults,num_children,num_working,county,usd_amount\n"
        "LIVING WAGE,2,2,1,Kent,21.34\n"
        "POVERTY WAGE,2,2,1,Kent,10.00\n"
    )
    (d / "living_wage_2.csv").write_text(
        "wage_level,num_adults,num_children,num_working,county,usd_amount\n"
        "LIVING WAGE,1,0,1,Sussex,15.50\n"
    )
    (d / "expenses_1.csv").write_text(
        "expense_category,num_adults,num_children,num_working,county,usd_amount\n"
        'HOUSING,2,2,1,Kent,"12,345.67"\n'
    )
    return str(root)


@pytest.fixture(scope="module")
def registered(spark):
    register(spark)
    return spark


def test_prefix_mirrors_native_constant():
    # the connector duplicates the literal to stay import-free for
    # by-value pickling; keep the two constants in lock-step
    assert lake_datasource.LAKE_PREFIX == LAKE_PREFIX


def _custom_read(spark, lake_root, category):
    return (
        spark.read.format("lake_objects")
        .schema(LAKE_SCHEMAS[category])
        .option("root", lake_root)
        .option("category", category)
        .option("extract_date", EXTRACT)
        .load()
    )


def test_matches_native_reader(registered, lake_root):
    custom = _custom_read(registered, lake_root, "living_wage")
    native = read_lake_csv(registered, lake_root, "living_wage", EXTRACT)
    assert custom.schema == native.schema
    assert sorted(map(tuple, custom.collect())) == sorted(
        map(tuple, native.collect())
    )


def test_category_filter_applies_at_listing(registered, lake_root):
    rows = _custom_read(registered, lake_root, "expenses").collect()
    assert len(rows) == 1
    # quoted comma-grouped money survives as the raw string (C2 cast
    # happens downstream in the transform, same as the native path)
    assert rows[0]["usd_amount"] == "12,345.67"


def test_one_partition_per_object(registered, lake_root):
    df = _custom_read(registered, lake_root, "living_wage")
    assert df.rdd.getNumPartitions() == 2  # two listed objects


def test_empty_listing_yields_empty_frame(registered, lake_root):
    df = (
        registered.read.format("lake_objects")
        .schema(LAKE_SCHEMAS["living_wage"])
        .option("root", lake_root)
        .option("category", "nonexistent")
        .option("extract_date", EXTRACT)
        .load()
    )
    assert df.count() == 0


# ---------------------------------------------------------------- streaming


def _write_wage_csv(root, extract_date, name, rows):
    from pathlib import Path

    d = Path(root) / LAKE_PREFIX / extract_date
    d.mkdir(parents=True, exist_ok=True)
    header = "wage_level,num_adults,num_children,num_working,county,usd_amount\n"
    (d / name).write_text(header + "".join(rows))


def test_stream_offset_model_is_set_difference(tmp_path):
    """Driver-side unit contract, no Spark: offsets are seen-file sets,
    a micro-batch is exactly the newly landed objects, replaying the
    same offset pair yields the same partitions."""
    from cost_of_living_data_etl_spark.sources.lake_datasource import (
        LakeObjectsStreamReader,
    )

    root = str(tmp_path)
    _write_wage_csv(root, "2024-06-01", "living_wage_a.csv", ["LIVING WAGE,2,2,1,Kent,21.34\n"])
    reader = LakeObjectsStreamReader(
        LAKE_SCHEMAS["living_wage"], {"root": root, "category": "living_wage"}
    )
    assert reader.initialOffset() == {"files": []}
    first = reader.latestOffset()
    assert len(first["files"]) == 1

    _write_wage_csv(root, "2024-06-02", "living_wage_b.csv", ["LIVING WAGE,1,0,1,Sussex,15.50\n"])
    second = reader.latestOffset()
    assert len(second["files"]) == 2

    delta = reader.partitions(first, second)
    assert [p.value for p in delta] == [
        f for f in second["files"] if f not in first["files"]
    ]
    # deterministic replay: same offsets -> same partitions
    assert [p.value for p in reader.partitions(first, second)] == [
        p.value for p in delta
    ]
    # batch 0 covers the pre-existing file
    assert len(reader.partitions(reader.initialOffset(), first)) == 1


def test_stream_discovers_new_objects_exactly_once(registered, tmp_path):
    """Two query lifetimes over one checkpoint: lifetime 1 ingests the
    initial objects, an object lands between lifetimes, lifetime 2
    ingests ONLY the delta — output equals the full multiset, nothing
    doubled, nothing lost (the incremental semantics the reference gets
    by manually re-invoking its batch job per extract date)."""
    root = str(tmp_path / "lake")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_wage_csv(root, "2024-06-01", "living_wage_a.csv", [
        "LIVING WAGE,2,2,1,Kent,21.34\n",
        "POVERTY WAGE,2,2,1,Kent,10.00\n",
    ])

    def run_one_lifetime():
        q = (
            registered.readStream.format("lake_objects")
            .schema(LAKE_SCHEMAS["living_wage"])
            .option("root", root)
            .option("category", "living_wage")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()

    run_one_lifetime()
    first = registered.read.parquet(out)
    assert first.count() == 2

    _write_wage_csv(root, "2024-06-02", "living_wage_b.csv", [
        "LIVING WAGE,1,0,1,Sussex,15.50\n",
    ])
    run_one_lifetime()
    final = registered.read.parquet(out)
    got = sorted((r["county"], r["usd_amount"]) for r in final.collect())
    assert got == [("Kent", 10.00), ("Kent", 21.34), ("Sussex", 15.50)]


def test_stream_writer_commit_protocol_is_replay_idempotent(tmp_path):
    """Unit contract, no Spark: staged objects live outside the lake
    prefix, commit publishes deterministic batch-keyed names + a
    manifest, re-committing the same batch id discards the re-staged
    copies, abort leaves the lake untouched."""
    import json
    from pathlib import Path

    from cost_of_living_data_etl_spark.sources.lake_datasource import (
        LakeObjectsStreamWriter,
    )
    from pyspark.sql import Row

    root = str(tmp_path)
    w = LakeObjectsStreamWriter(
        LAKE_SCHEMAS["living_wage"],
        {"root": root, "category": "living_wage", "extract_date": "2024-06-01"},
    )
    rows = [
        Row(wage_level="LIVING WAGE", num_adults=2, num_children=2,
            num_working=1, county="Kent", usd_amount=21.34),
    ]
    m1 = w.write(iter(rows))
    assert "_staging" in m1.staged and m1.rows == 1
    # nothing visible to readers before commit
    assert LAKE_PREFIX not in m1.staged
    w.commit([m1], batchId=0)
    lake_dir = Path(root) / LAKE_PREFIX / "2024-06-01"
    published = sorted(p.name for p in lake_dir.iterdir())
    assert published == ["living_wage_b0000000000_00000.csv"]
    manifest = json.loads((Path(root) / "_commits" / "0.json").read_text())
    assert manifest["rows"] == 1 and len(manifest["objects"]) == 1

    # replay: the same batch id re-staged then re-committed — no dup
    m1b = w.write(iter(rows))
    w.commit([m1b], batchId=0)
    assert sorted(p.name for p in lake_dir.iterdir()) == published
    assert not any((Path(root) / "_staging").iterdir())

    # abort: staged file removed, lake unchanged
    m2 = w.write(iter(rows))
    w.abort([m2], batchId=1)
    assert not Path(m2.staged).exists()
    assert sorted(p.name for p in lake_dir.iterdir()) == published


def test_stream_lake_to_lake_roundtrip(registered, tmp_path):
    """End-to-end: stream-read one lake root, stream-write a second —
    the written lake batch-reads back with identical rows, and only
    manifest-committed objects exist in the destination."""
    import json
    from pathlib import Path

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    _write_wage_csv(src, "2024-06-01", "living_wage_a.csv", [
        "LIVING WAGE,2,2,1,Kent,21.34\n",
        "POVERTY WAGE,2,2,1,Kent,10.00\n",
    ])
    q = (
        registered.readStream.format("lake_objects")
        .schema(LAKE_SCHEMAS["living_wage"])
        .option("root", src)
        .option("category", "living_wage")
        .load()
        .writeStream.format("lake_objects")
        .option("root", dst)
        .option("category", "living_wage")
        .option("extract_date", "2024-06-01")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()

    back = read_lake_csv(registered, dst, "living_wage", "2024-06-01")
    got = sorted((r["county"], r["usd_amount"]) for r in back.collect())
    assert got == [("Kent", 10.00), ("Kent", 21.34)]
    manifests = sorted((Path(dst) / "_commits").glob("*.json"))
    assert manifests, "commit manifests must exist"
    listed = {
        o for m in manifests for o in json.loads(m.read_text())["objects"]
    }
    on_disk = {
        str(p) for p in (Path(dst) / LAKE_PREFIX).rglob("*") if p.is_file()
    }
    assert on_disk == listed


def test_simple_stream_reader_backlog_throttle(tmp_path):
    """read(start) takes at most max_objects_per_batch new objects and
    advances the offset by exactly those; an exhausted backlog returns
    the start offset unchanged with no rows; readBetweenOffsets replays
    any planned pair deterministically — all stateless, so a 'restart'
    (fresh instance) behaves identically from the same offset."""
    from cost_of_living_data_etl_spark.sources.lake_datasource import (
        LakeObjectsSimpleStreamReader,
    )

    root = str(tmp_path)
    for i in range(3):
        _write_wage_csv(root, "2024-06-01", f"living_wage_{i}.csv",
                        [f"LIVING WAGE,1,0,1,C{i},1.0\n"])
    opts = {"root": root, "category": "living_wage",
            "max_objects_per_batch": "1"}
    r = LakeObjectsSimpleStreamReader(LAKE_SCHEMAS["living_wage"], opts)

    off = r.initialOffset()
    counties = []
    for expected in (1, 2, 3):
        rows, off = r.read(off)
        rows = list(rows)
        assert len(rows) == 1
        counties.append(rows[0][4])
        assert len(off["files"]) == expected
    assert counties == ["C0", "C1", "C2"]

    # exhausted backlog: offset must NOT advance, no rows
    rows, same = r.read(off)
    assert list(rows) == [] and same == off

    # stateless restart: a fresh instance resumes mid-backlog
    r2 = LakeObjectsSimpleStreamReader(LAKE_SCHEMAS["living_wage"], opts)
    mid = {"files": off["files"][:2]}
    rows, nxt = r2.read(mid)
    assert len(list(rows)) == 1 and len(nxt["files"]) == 3

    # replay of a planned pair returns the same rows
    assert [t[4] for t in r2.readBetweenOffsets(mid, nxt)] == ["C2"]


def test_stream_throttle_end_to_end_batches(registered, tmp_path):
    """E2E with max_objects_per_batch=1: three pre-landed objects are
    ingested completely, across >= 3 committed micro-batches."""
    from pathlib import Path

    root = str(tmp_path / "lake")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    for i in range(3):
        _write_wage_csv(root, "2024-06-01", f"living_wage_{i}.csv",
                        [f"LIVING WAGE,1,0,1,C{i},1.0\n"])
    q = (
        registered.readStream.format("lake_objects")
        .schema(LAKE_SCHEMAS["living_wage"])
        .option("root", root)
        .option("category", "living_wage")
        .option("max_objects_per_batch", "1")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    rows = registered.read.parquet(out).collect()
    assert sorted(r["county"] for r in rows) == ["C0", "C1", "C2"]
    n_batches = len(list((Path(ckpt) / "offsets").glob("[0-9]*")))
    assert n_batches >= 3


def test_stream_available_now_drains_and_terminates(registered, tmp_path):
    """Trigger.AvailableNow — the standard bounded-backfill invocation —
    must drain the current listing and terminate on its own."""
    root = str(tmp_path / "lake")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    for i in range(2):
        _write_wage_csv(root, "2024-06-01", f"living_wage_{i}.csv",
                        [f"LIVING WAGE,1,0,1,C{i},1.0\n"])
    q = (
        registered.readStream.format("lake_objects")
        .schema(LAKE_SCHEMAS["living_wage"])
        .option("root", root)
        .option("category", "living_wage")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "availableNow query must self-terminate"
    assert registered.read.parquet(out).count() == 2


def test_stream_writer_commit_sweeps_crashed_partial_publish(tmp_path):
    """Crash window: a prior attempt published objects but died before
    the manifest. The replay may publish FEWER files (different
    partitioning after restart) — commit must sweep the batch's stale
    objects so no orphan survives with duplicated rows."""
    import json
    from pathlib import Path

    from cost_of_living_data_etl_spark.sources.lake_datasource import (
        LakeObjectsStreamWriter,
    )
    from pyspark.sql import Row

    root = str(tmp_path)
    dest = Path(root) / LAKE_PREFIX / "2024-06-01"
    dest.mkdir(parents=True)
    # the crashed attempt's 3 published objects, no manifest
    for i in range(3):
        (dest / f"living_wage_b0000000007_{i:05d}.csv").write_text("crashed\n")

    w = LakeObjectsStreamWriter(
        LAKE_SCHEMAS["living_wage"],
        {"root": root, "category": "living_wage", "extract_date": "2024-06-01"},
    )
    row = Row(wage_level="LIVING WAGE", num_adults=1, num_children=0,
              num_working=1, county="Kent", usd_amount=1.0)
    m = w.write(iter([row]))  # replay stages ONE file this time
    w.commit([m], batchId=7)

    names = sorted(p.name for p in dest.iterdir())
    assert names == ["living_wage_b0000000007_00000.csv"]
    manifest = json.loads((Path(root) / "_commits" / "7.json").read_text())
    assert len(manifest["objects"]) == 1


def test_stream_writer_clears_staging_orphans(tmp_path):
    """A failed task attempt's staged file (never reported in a commit
    message) must not leak: commit and abort clear the run's staging
    dir wholesale."""
    from pathlib import Path

    from cost_of_living_data_etl_spark.sources.lake_datasource import (
        LakeObjectsStreamWriter,
    )
    from pyspark.sql import Row

    root = str(tmp_path)
    w = LakeObjectsStreamWriter(
        LAKE_SCHEMAS["living_wage"],
        {"root": root, "category": "living_wage", "extract_date": "2024-06-01"},
    )
    row = Row(wage_level="LIVING WAGE", num_adults=1, num_children=0,
              num_working=1, county="Kent", usd_amount=1.0)
    m = w.write(iter([row]))
    # orphan from a task attempt that died before returning its message
    orphan = Path(root) / "_staging" / w.run_id / "living_wage_orphan.csv"
    orphan.write_text("partial\n")
    w.commit([m], batchId=0)
    assert not (Path(root) / "_staging" / w.run_id).exists()

    m2 = w.write(iter([row]))
    orphan2 = Path(root) / "_staging" / w.run_id / "living_wage_orphan2.csv"
    orphan2.write_text("partial\n")
    w.abort([m2], batchId=1)
    assert not (Path(root) / "_staging" / w.run_id).exists()


def test_stream_writer_rejects_complete_mode(tmp_path):
    """outputMode('complete') passes overwrite=True; the append-only
    sink must refuse rather than silently duplicate snapshots."""
    from cost_of_living_data_etl_spark.sources.lake_datasource import (
        LakeObjectsDataSource,
    )

    ds = LakeObjectsDataSource(
        options={"root": str(tmp_path), "category": "living_wage",
                 "extract_date": "2024-06-01"}
    )
    with pytest.raises(ValueError, match="append-only"):
        ds.streamWriter(LAKE_SCHEMAS["living_wage"], overwrite=True)


def test_simple_stream_reader_rejects_non_positive_cap(tmp_path):
    from cost_of_living_data_etl_spark.sources.lake_datasource import (
        LakeObjectsSimpleStreamReader,
    )

    for bad in ("0", "-1"):
        with pytest.raises(ValueError, match="must be >= 1"):
            LakeObjectsSimpleStreamReader(
                LAKE_SCHEMAS["living_wage"],
                {"root": str(tmp_path), "category": "living_wage",
                 "max_objects_per_batch": bad},
            )


def test_stream_multi_batch_ingest_hash_matches_batch_and_duckdb(
    registered, tmp_path
):
    """Round-4 verdict item 6 — the oracle-twin for the STREAMING lake
    reader, the same discipline the JDBC connector got via Derby: a
    three-lifetime ingest (objects landing between lifetimes, so the
    rows arrive across ≥3 distinct micro-batches through the
    checkpointed offset model) must produce a final table value-equal
    to (a) the batch read of the same lake root and (b) an independent
    DuckDB scan of the raw CSV objects. Equality is on the full sorted
    row multiset — the same order-insensitive value comparison the
    driver's hash gate applies."""
    import glob

    import duckdb

    root = str(tmp_path / "lake")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    waves = [
        ("2024-06-01", "a.csv", [
            "LIVING WAGE,2,2,1,Kent,21.34\n",
            "POVERTY WAGE,2,2,1,Kent,10.00\n",
        ]),
        ("2024-06-02", "b.csv", [
            "LIVING WAGE,1,0,1,Sussex,15.50\n",
            "MINIMUM WAGE,1,0,1,Sussex,13.25\n",
        ]),
        ("2024-06-03", "c.csv", [
            "LIVING WAGE,2,0,2,New Castle,1234.56\n",
        ]),
    ]

    def run_one_lifetime():
        q = (
            registered.readStream.format("lake_objects")
            .schema(LAKE_SCHEMAS["living_wage"])
            .option("root", root)
            .option("category", "living_wage")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()

    for extract_date, name, rows in waves:
        _write_wage_csv(root, extract_date, f"living_wage_{name}", rows)
        run_one_lifetime()

    streamed = sorted(
        map(tuple, registered.read.parquet(out).collect())
    )

    # twin 1: the batch reader over the identical lake root (a batch
    # read is a per-extract-date point scan, so the twin is the union
    # over the three dates the stream ingested)
    batch_rows = []
    for extract_date, _, _ in waves:
        batch_rows.extend(
            map(
                tuple,
                registered.read.format("lake_objects")
                .schema(LAKE_SCHEMAS["living_wage"])
                .option("root", root)
                .option("category", "living_wage")
                .option("extract_date", extract_date)
                .load()
                .collect(),
            )
        )
    batch = sorted(batch_rows)
    assert streamed == batch
    assert len(streamed) == 5

    # twin 2: an independent engine over the raw objects, typed to the
    # connector's declared lake schema (the cast-downstream columns
    # stay VARCHAR there too — the cast is the operator, not the scan)
    files = sorted(glob.glob(f"{root}/{LAKE_PREFIX}/*/living_wage_*.csv"))
    types = (
        "{'wage_level':'VARCHAR','num_adults':'INTEGER',"
        "'num_children':'VARCHAR','num_working':'INTEGER',"
        "'county':'VARCHAR','usd_amount':'DOUBLE'}"
    )
    oracle = sorted(
        tuple(r)
        for r in duckdb.sql(
            f"SELECT * FROM read_csv({files!r}, header=true, "
            f"columns={types})"
        ).fetchall()
    )
    assert streamed == oracle


# ------------------------------------------- manifest-log offset variant


def _publish_manifest(root, batch_id, extract_date, name, rows):
    """Simulate one upstream commit: land an immutable object + its
    manifest in the _commits log (the shape LakeObjectsStreamWriter
    publishes)."""
    import json
    from pathlib import Path

    _write_wage_csv(root, extract_date, name, rows)
    obj = str(Path(root) / LAKE_PREFIX / extract_date / name)
    log = Path(root) / "_commits"
    log.mkdir(exist_ok=True)
    (log / f"{batch_id}.json").write_text(
        json.dumps({"batch_id": batch_id, "rows": len(rows), "objects": [obj]})
    )
    return obj


def test_manifest_log_offsets_are_positions(tmp_path):
    """Driver-side unit contract, no Spark: the offset is a log
    position (O(1) regardless of object count), a micro-batch expands
    exactly the manifests in (start, end], and a committed offset pair
    replays identically even after the log has grown."""
    import json

    from cost_of_living_data_etl_spark.sources.lake_datasource import (
        LakeManifestLogStreamReader,
    )

    root = str(tmp_path)
    objs = [
        _publish_manifest(root, b, "2024-06-01", f"living_wage_{b}.csv",
                          [f"LIVING WAGE,2,2,1,Kent,{b}.00\n"])
        for b in range(20)
    ]
    reader = LakeManifestLogStreamReader(
        LAKE_SCHEMAS["living_wage"], {"root": root, "category": "living_wage"}
    )
    assert reader.initialOffset() == {"last_batch": -1}
    first = reader.latestOffset()
    assert first == {"last_batch": 19}
    # O(1): the offset names a position, not the 20 objects
    assert len(json.dumps(first)) < 40
    batch = reader.partitions(reader.initialOffset(), first)
    assert sorted(p.value for p in batch) == sorted(objs)

    # log grows; the committed pair still replays to the same set
    _publish_manifest(root, 20, "2024-06-02", "living_wage_20.csv",
                      ["LIVING WAGE,1,0,1,Sussex,15.50\n"])
    replay = reader.partitions(reader.initialOffset(), first)
    assert sorted(p.value for p in replay) == sorted(objs)
    nxt = reader.latestOffset()
    assert nxt == {"last_batch": 20}
    delta = reader.partitions(first, nxt)
    assert [p.value for p in delta] == [
        str(tmp_path / LAKE_PREFIX / "2024-06-02" / "living_wage_20.csv")
    ]
    # category filter applies at manifest expansion
    other = LakeManifestLogStreamReader(
        LAKE_SCHEMAS["living_wage"], {"root": root, "category": "expenses"}
    )
    assert other.partitions(other.initialOffset(), other.latestOffset()) == []


def test_manifest_log_rejects_per_batch_throttle(tmp_path):
    from cost_of_living_data_etl_spark.sources.lake_datasource import (
        LakeObjectsDataSource,
    )

    ds = LakeObjectsDataSource({
        "root": str(tmp_path), "category": "living_wage",
        "offset_mode": "manifest_log", "max_objects_per_batch": "2",
    })
    with pytest.raises(ValueError, match="manifest"):
        ds.streamReader(LAKE_SCHEMAS["living_wage"])


def test_manifest_log_stream_exactly_once_with_o1_checkpoint(registered, tmp_path):
    """Two query lifetimes over one checkpoint in manifest-log mode:
    lifetime 1 ingests manifests 0-1, a manifest lands between
    lifetimes, lifetime 2 ingests ONLY the delta — and every offset
    file Spark checkpointed is a position, not an object list."""
    import json
    from pathlib import Path

    root = str(tmp_path / "lake")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _publish_manifest(root, 0, "2024-06-01", "living_wage_a.csv", [
        "LIVING WAGE,2,2,1,Kent,21.34\n",
        "POVERTY WAGE,2,2,1,Kent,10.00\n",
    ])
    _publish_manifest(root, 1, "2024-06-01", "living_wage_b.csv", [
        "LIVING WAGE,1,0,1,Sussex,15.50\n",
    ])

    def run_one_lifetime():
        q = (
            registered.readStream.format("lake_objects")
            .schema(LAKE_SCHEMAS["living_wage"])
            .option("root", root)
            .option("category", "living_wage")
            .option("offset_mode", "manifest_log")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()

    run_one_lifetime()
    assert registered.read.parquet(out).count() == 3

    _publish_manifest(root, 2, "2024-06-02", "living_wage_c.csv", [
        "LIVING WAGE,1,1,1,New Castle,18.25\n",
    ])
    run_one_lifetime()
    final = registered.read.parquet(out)
    got = sorted((r["county"], r["usd_amount"]) for r in final.collect())
    assert got == [
        ("Kent", 10.00), ("Kent", 21.34),
        ("New Castle", 18.25), ("Sussex", 15.50),
    ]
    # every checkpointed offset is O(1): a {"last_batch": N} position
    offset_files = [
        p for p in (Path(ckpt) / "offsets").iterdir() if not p.name.startswith(".")
    ]
    assert offset_files
    for p in offset_files:
        last = p.read_text().strip().splitlines()[-1]
        off = json.loads(last)
        assert set(off) == {"last_batch"}, off
        assert len(last) < 40


def test_manifest_log_reads_sink_published_commits(registered, tmp_path):
    """End-to-end pairing: objects published by LakeObjectsStreamWriter
    (manifest-committed) are consumed by the manifest-log reader with
    no listing of the lake prefix."""
    from pyspark.sql import Row

    from cost_of_living_data_etl_spark.sources.lake_datasource import (
        LakeObjectsStreamWriter,
    )

    root = str(tmp_path / "lake")
    w = LakeObjectsStreamWriter(
        LAKE_SCHEMAS["living_wage"],
        {"root": root, "category": "living_wage", "extract_date": "2024-06-01"},
    )
    for b, county in enumerate(["Kent", "Sussex"]):
        m = w.write(iter([Row(
            wage_level="LIVING WAGE", num_adults=2, num_children=1,
            num_working=1, county=county, usd_amount=20.0 + b,
        )]))
        w.commit([m], batchId=b)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        registered.readStream.format("lake_objects")
        .schema(LAKE_SCHEMAS["living_wage"])
        .option("root", root)
        .option("category", "living_wage")
        .option("offset_mode", "manifest_log")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    got = sorted((r["county"], r["usd_amount"])
                 for r in registered.read.parquet(out).collect())
    assert got == [("Kent", 20.0), ("Sussex", 21.0)]


def test_manifest_log_extract_date_filter(tmp_path):
    """The optional extract_date option restricts manifest expansion to
    that partition directory, same semantics as the listing reader."""
    from cost_of_living_data_etl_spark.sources.lake_datasource import (
        LakeManifestLogStreamReader,
    )

    root = str(tmp_path)
    a = _publish_manifest(root, 0, "2024-06-01", "living_wage_a.csv",
                          ["LIVING WAGE,2,2,1,Kent,21.34\n"])
    _publish_manifest(root, 1, "2024-06-02", "living_wage_b.csv",
                      ["LIVING WAGE,1,0,1,Sussex,15.50\n"])
    reader = LakeManifestLogStreamReader(
        LAKE_SCHEMAS["living_wage"],
        {"root": root, "category": "living_wage", "extract_date": "2024-06-01"},
    )
    batch = reader.partitions(reader.initialOffset(), reader.latestOffset())
    assert [p.value for p in batch] == [a]


def test_manifest_log_nested_object_matches_listing_semantics(tmp_path):
    """ADVICE r08: the listing reader matches any file recursively under
    {root}/{LAKE_PREFIX}/{extract_date}/**; the manifest filter must
    anchor on that path PREFIX, not require the object's immediate
    parent to BE the date dir — an object nested one level deeper
    (e.g. a sub-source subdirectory) was ingested by the listing reader
    but silently dropped in manifest mode. Also: an object OUTSIDE the
    lake prefix must be dropped even when extract_date is unset."""
    import json
    from pathlib import Path

    from cost_of_living_data_etl_spark.sources.lake_datasource import (
        LakeManifestLogStreamReader,
        _list_objects,
    )

    root = str(tmp_path)
    nested_dir = Path(root) / LAKE_PREFIX / "2024-06-01" / "vendor_a"
    nested_dir.mkdir(parents=True)
    nested = nested_dir / "living_wage_nested.csv"
    nested.write_text(
        "wage_level,num_children,num_adults,num_working,county,usd_amount\n"
        "LIVING WAGE,2,2,1,Kent,21.34\n"
    )
    outside = Path(root) / "elsewhere" / "living_wage_outside.csv"
    outside.parent.mkdir(parents=True)
    outside.write_text(nested.read_text())
    log = Path(root) / "_commits"
    log.mkdir()
    (log / "0.json").write_text(
        json.dumps({"batch_id": 0, "objects": [str(nested), str(outside)]})
    )

    listed = _list_objects(root, "living_wage", "2024-06-01")
    assert listed == [str(nested)]  # listing reader sees the nested object

    for extract_date in ("2024-06-01", None):
        reader = LakeManifestLogStreamReader(
            LAKE_SCHEMAS["living_wage"],
            {"root": root, "category": "living_wage",
             "extract_date": extract_date},
        )
        batch = reader.partitions(reader.initialOffset(), reader.latestOffset())
        assert [p.value for p in batch] == [str(nested)], extract_date


def test_manifest_log_out_of_order_id_degrades_gracefully(tmp_path):
    """The position-log contract requires increasing publication order;
    this pins what happens when a producer VIOLATES it (a straggler id
    below the consumed high-water mark):

    - no future window ever includes it (start >= high-water mark), so
      a committed batch's data can never double-process;
    - a replay of a NOT-yet-committed pair absorbs it (the failed
      attempt's output was discarded, so the straggler is processed
      exactly once); if the pair was already committed the straggler
      is skipped forever — the documented loss mode that motivates the
      'one log per producer, ids increase' contract."""
    from cost_of_living_data_etl_spark.sources.lake_datasource import (
        LakeManifestLogStreamReader,
    )

    root = str(tmp_path)
    _publish_manifest(root, 0, "2024-06-01", "living_wage_0.csv",
                      ["LIVING WAGE,2,2,1,Kent,21.34\n"])
    _publish_manifest(root, 5, "2024-06-01", "living_wage_5.csv",
                      ["LIVING WAGE,1,0,1,Sussex,15.50\n"])
    reader = LakeManifestLogStreamReader(
        LAKE_SCHEMAS["living_wage"], {"root": root, "category": "living_wage"}
    )
    first = reader.latestOffset()
    assert first == {"last_batch": 5}
    consumed = {p.value for p in reader.partitions(reader.initialOffset(), first)}
    assert len(consumed) == 2
    straggler = _publish_manifest(root, 3, "2024-06-01", "living_wage_3.csv",
                                  ["LIVING WAGE,1,1,1,New Castle,18.25\n"])
    nxt = reader.latestOffset()
    assert nxt == first  # no progress signalled by the straggler
    assert reader.partitions(first, nxt) == []  # never in a future window
    replay = {p.value for p in reader.partitions(reader.initialOffset(), first)}
    assert replay == consumed | {straggler}  # uncommitted replay absorbs it once
