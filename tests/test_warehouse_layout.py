"""Warehouse layout tests: partition pruning and bucketed co-location.

These prove the two load-time layout decisions that dominate read cost
at 100 TB actually take effect in the physical plan:

- hive-style ``partitionBy`` dirs → a partition-column filter scans
  only the matching directory (plan shows the partition filter and the
  non-matching partition's files are never listed as input),
- ``bucketBy`` on the join key → a same-key join of two bucketed
  tables runs with ZERO shuffle exchanges.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cost_of_living_data_etl_spark.sources.warehouse import Warehouse


def plan_str(df, mode: str = "formatted") -> str:
    jmode = df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_partitioned_append_prunes_on_read(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    base = spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 7).alias("v"),
    )
    # two snapshot loads, the incremental pattern of the reference ETL
    wh.append_partitioned(
        base.withColumn("snapshot_date", F.lit("2024-06-01")),
        "fact_demo",
        ["snapshot_date"],
    )
    wh.append_partitioned(
        base.withColumn("snapshot_date", F.lit("2024-06-02")),
        "fact_demo",
        ["snapshot_date"],
    )

    df = spark.read.parquet(wh.path("fact_demo")).filter(
        F.col("snapshot_date") == "2024-06-01"
    )
    assert df.count() == 1000  # not 2000: only one partition read

    plan = plan_str(df)
    # pruning happens at the partition level, not as a data filter
    assert "PartitionFilters" in plan
    assert "snapshot_date" in plan.split("PartitionFilters", 1)[1].split("\n", 2)[0]
    # the scan's file listing excludes the other partition
    assert "2024-06-02" not in plan


def test_schema_evolution_merge_schema(spark, tmp_path):
    """Appended loads may add columns; mergeSchema reconciles old files
    (missing column → NULL) without rewriting history — the schema-
    drift reality of a warehouse accreting loads over years."""
    wh = Warehouse(str(tmp_path / "whse"))
    v1 = spark.createDataFrame([(1, "a")], "k int, name string")
    v2 = spark.createDataFrame([(2, "b", 9.5)], "k int, name string, score double")
    wh.append(v1, "evolving")
    wh.append(v2, "evolving")

    df = spark.read.option("mergeSchema", "true").parquet(wh.path("evolving"))
    assert set(df.columns) == {"k", "name", "score"}
    rows = {r["k"]: (r["name"], r["score"]) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}


def test_merge_upsert(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "whm"))
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, name string, v double"
    )
    wh.overwrite(target, "dim_demo")

    # update k=2, insert k=4
    updates = spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)], "k int, name string, v double"
    )
    wh.merge_upsert(spark, updates, "dim_demo", ["k"])

    got = {
        r["k"]: (r["name"], r["v"])
        for r in wh.read(spark, "dim_demo").collect()
    }
    assert got == {1: ("a", 10.0), 2: ("b2", 21.0), 3: ("c", 30.0), 4: ("d", 40.0)}

    # upsert into a missing table = plain create
    wh.merge_upsert(spark, updates, "dim_new", ["k"])
    assert wh.read(spark, "dim_new").count() == 2


def test_bucketed_join_has_zero_exchanges(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "whb"))
    left = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    wh.save_bucketed(left, "bucketed_left", ["k"], n_buckets=8)
    wh.save_bucketed(right, "bucketed_right", ["k"], n_buckets=8)
    try:
        # force the non-broadcast path so the test exercises bucketing
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            l = spark.table("bucketed_left")
            r = spark.table("bucketed_right")
            joined = l.join(r, "k").select("k", "a", "b")
            plan = plan_str(joined, mode="simple")
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # co-located: no shuffle at all
            assert joined.count() == 5000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_left")
        spark.sql("DROP TABLE IF EXISTS bucketed_right")


def test_dynamic_partition_overwrite_is_idempotent(spark, tmp_path):
    """Re-running one extract date's load replaces only that partition
    — the idempotent-backfill semantics the reference's append-only
    write_pandas lacks (re-runs there duplicate rows)."""
    wh = Warehouse(str(tmp_path / "whd"))
    day1 = spark.range(0, 100).withColumn("snapshot_date", F.lit("2024-06-01"))
    day2 = spark.range(0, 200).withColumn("snapshot_date", F.lit("2024-06-02"))
    wh.overwrite_partitions(day1, "fact_dyn", ["snapshot_date"])
    wh.overwrite_partitions(day2, "fact_dyn", ["snapshot_date"])

    # re-run day1 (simulating a corrected backfill with fewer rows)
    day1_fixed = spark.range(0, 50).withColumn("snapshot_date", F.lit("2024-06-01"))
    wh.overwrite_partitions(day1_fixed, "fact_dyn", ["snapshot_date"])

    df = spark.read.parquet(wh.path("fact_dyn"))
    counts = {
        str(r["snapshot_date"]): r["n"]
        for r in df.groupBy("snapshot_date").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"2024-06-01": 50, "2024-06-02": 200}  # day2 untouched


def test_compact_collapses_small_files(spark, tmp_path):
    """Many tiny appended files → one file per partition after
    compact(), with identical data."""
    from pathlib import Path

    wh = Warehouse(str(tmp_path / "whc"))
    for batch in range(5):  # 5 appends × 8 shuffle partitions of files
        wh.append_partitioned(
            spark.range(batch * 10, batch * 10 + 10)
            .repartition(4)
            .withColumn("snapshot_date", F.lit("2024-06-01")),
            "fact_small",
            ["snapshot_date"],
        )
    part_dir = Path(wh.path("fact_small")) / "snapshot_date=2024-06-01"
    n_before = len(list(part_dir.glob("*.parquet")))
    assert n_before >= 5

    before = {r["id"] for r in spark.read.parquet(wh.path("fact_small")).collect()}
    wh.compact(spark, "fact_small", partition_cols=["snapshot_date"])

    part_dir = Path(wh.path("fact_small")) / "snapshot_date=2024-06-01"
    n_after = len(list(part_dir.glob("*.parquet")))
    assert n_after == 1
    after = {r["id"] for r in spark.read.parquet(wh.path("fact_small")).collect()}
    assert after == before == set(range(50))


def test_scd2_upsert_versions_history(spark, tmp_path):
    """Type-2 dimension merge: changed attributes close the old
    version and open a new one; unchanged and absent keys are
    untouched; re-applying the same batch is a no-op."""
    wh = Warehouse(str(tmp_path / "whs"))
    dim_v1 = spark.createDataFrame(
        [(1, "Kent", "DE"), (2, "Sussex", "DE"), (3, "New Castle", "DE")],
        ["location_id", "county", "state"],
    )
    wh.scd2_upsert(spark, dim_v1, "dim_location", ["location_id"],
                   ["county", "state"], as_of="2024-01-01")

    # day 2: county 2 renamed, county 4 appears, 1 and 3 unchanged
    dim_v2 = spark.createDataFrame(
        [(1, "Kent", "DE"), (2, "Sussex Renamed", "DE"), (4, "Ocean", "MD")],
        ["location_id", "county", "state"],
    )
    wh.scd2_upsert(spark, dim_v2, "dim_location", ["location_id"],
                   ["county", "state"], as_of="2024-06-01")

    rows = {
        (r["location_id"], r["county"], str(r["valid_from"]),
         str(r["valid_to"]), r["is_current"])
        for r in spark.read.parquet(wh.path("dim_location")).collect()
    }
    assert (2, "Sussex", "2024-01-01", "2024-06-01", False) in rows  # closed
    assert (2, "Sussex Renamed", "2024-06-01", "None", True) in rows  # reopened
    assert (1, "Kent", "2024-01-01", "None", True) in rows  # untouched
    assert (3, "New Castle", "2024-01-01", "None", True) in rows  # absent from batch
    assert (4, "Ocean", "2024-06-01", "None", True) in rows  # brand new
    assert len(rows) == 5

    # idempotence: re-apply the same batch → nothing changes
    wh.scd2_upsert(spark, dim_v2, "dim_location", ["location_id"],
                   ["county", "state"], as_of="2024-06-01")
    rows2 = {
        (r["location_id"], r["county"], str(r["valid_from"]),
         str(r["valid_to"]), r["is_current"])
        for r in spark.read.parquet(wh.path("dim_location")).collect()
    }
    assert rows2 == rows


def test_scd2_point_in_time_lookup(spark, tmp_path):
    """The version table answers as-of queries: which county name was
    current on a given date (valid_from <= d < valid_to-or-open)."""
    wh = Warehouse(str(tmp_path / "whp"))
    v1 = spark.createDataFrame([(2, "Sussex", "DE")], ["location_id", "county", "state"])
    v2 = spark.createDataFrame([(2, "Sussex Renamed", "DE")], ["location_id", "county", "state"])
    wh.scd2_upsert(spark, v1, "dim", ["location_id"], ["county"], as_of="2024-01-01")
    wh.scd2_upsert(spark, v2, "dim", ["location_id"], ["county"], as_of="2024-06-01")

    dim = spark.read.parquet(wh.path("dim"))

    def as_of(d):
        return (
            dim.filter(
                (F.col("valid_from") <= F.lit(d).cast("date"))
                & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(d).cast("date")))
            ).select("county").collect()
        )

    assert [r["county"] for r in as_of("2024-03-15")] == ["Sussex"]
    assert [r["county"] for r in as_of("2024-07-01")] == ["Sussex Renamed"]


def _scan_output_rows(df) -> int:
    """numOutputRows of the parquet FileScan node after an action —
    rows actually DECODED by the reader (post row-group skipping)."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()

    def walk(node):
        name = node.nodeName()
        if "Scan" in name and "parquet" in node.toString().lower():
            m = node.metrics().get("numOutputRows")
            if not m.isEmpty():
                return m.get().value()
        for i in range(node.children().size()):
            got = walk(node.children().apply(i))
            if got is not None:
                return got
        return None

    return walk(plan)


def test_sorted_layout_skips_row_groups(spark, tmp_path):
    """save_sorted clusters the key range per file AND per row group,
    so a selective key-range filter decodes a small fraction of the
    table; the same data in random layout decodes everything."""
    wh = Warehouse(str(tmp_path / "whsort"))
    n = 200_000
    base = (
        spark.range(0, n)
        .withColumn("k", F.pmod(F.col("id") * 7919, F.lit(n)))  # shuffle keys
        .withColumn("payload", F.md5(F.col("id").cast("string")))
    )
    # force small row groups so sf-scale data has >1 group per file.
    # NOTE: runtime spark.conf.set("spark.hadoop.*") does NOT reach
    # the parquet writer (spark.hadoop.* is only lifted into the
    # Hadoop conf at context startup) — set the Hadoop configuration
    # directly, which writers consult at write time.
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    prev = hconf.get("parquet.block.size")
    hconf.setInt("parquet.block.size", 64 * 1024)
    try:
        wh.save_sorted(base, "fact_sorted", ["k"], n_files=8)
        base.repartition(8).write.mode("overwrite").parquet(wh.path("fact_random"))
    finally:
        if prev is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", prev)

    pred = (F.col("k") >= 1000) & (F.col("k") < 1100)  # 0.05% of keys
    sorted_rows = _scan_output_rows(
        spark.read.parquet(wh.path("fact_sorted")).filter(pred)
    )
    random_rows = _scan_output_rows(
        spark.read.parquet(wh.path("fact_random")).filter(pred)
    )
    # both return the same answer…
    assert (
        spark.read.parquet(wh.path("fact_sorted")).filter(pred).count()
        == spark.read.parquet(wh.path("fact_random")).filter(pred).count()
        == 100
    )
    # …but the sorted layout decodes a small fraction of the rows
    assert sorted_rows is not None and random_rows is not None
    assert random_rows > n * 0.9
    assert sorted_rows < random_rows / 5  # ≥5x fewer rows decoded


def test_read_lake_jsonl(spark, tmp_path):
    """JSONL lake feed: same prefix/glob contract as CSV, explicit
    schema (no inference pass), permissive corrupt-record handling."""
    import json as _json

    from cost_of_living_data_etl_spark.sources.lake import read_lake_jsonl

    d = tmp_path / "lake" / "real_estate" / "cost_of_living" / "2024-06-01"
    d.mkdir(parents=True)
    rows = [
        {"county": "Kent", "usd_amount": "1,234.56"},
        {"county": "Sussex", "usd_amount": "99.50"},
    ]
    (d / "part_living_wage_0.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in rows)
    )
    (d / "part_expenses_0.jsonl").write_text(
        _json.dumps({"county": "IGNORED", "usd_amount": "0"})
    )

    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [StructField("county", StringType()), StructField("usd_amount", StringType())]
    )
    df = read_lake_jsonl(
        spark, str(tmp_path / "lake"), "living_wage", "2024-06-01", schema
    )
    got = {(r["county"], r["usd_amount"]) for r in df.collect()}
    assert got == {("Kent", "1,234.56"), ("Sussex", "99.50")}  # glob excluded expenses


def test_append_evolve_policies(spark, tmp_path):
    """Write-time schema-drift gate: strict rejects drift before any
    row lands; add_nullable absorbs added AND omitted columns by
    aligning each batch to the union schema; a type change is rejected
    under every policy with the column named."""
    wh = Warehouse(str(tmp_path / "whse"))
    v1 = spark.createDataFrame([(1, "a")], "k int, name string")
    wh.append_evolve(spark, v1, "facts")  # first write = table create

    drifted = spark.createDataFrame(
        [(2, "b", 9.5)], "k int, name string, score double"
    )
    with pytest.raises(ValueError, match="strict"):
        wh.append_evolve(spark, drifted, "facts")  # default strict
    # nothing landed on the failed append
    assert spark.read.parquet(wh.path("facts")).count() == 1

    wh.append_evolve(spark, drifted, "facts", policy="add_nullable")
    # batch OMITTING an existing column: written as typed nulls
    omitting = spark.createDataFrame([(3, 1.5)], "k int, score double")
    wh.append_evolve(spark, omitting, "facts", policy="add_nullable")

    got = {
        r["k"]: (r["name"], r["score"])
        for r in wh.read_evolved(spark, "facts").collect()
    }
    assert got == {1: ("a", None), 2: ("b", 9.5), 3: (None, 1.5)}

    # type change: rejected under BOTH policies, column named
    retyped = spark.createDataFrame([("4", "d")], "k string, name string")
    for pol in ("strict", "add_nullable"):
        with pytest.raises(ValueError, match="k: int -> string"):
            wh.append_evolve(spark, retyped, "facts", policy=pol)

    # post-evolution batches carry the FULL union schema: reading the
    # newest file with the plain (non-merge) reader still shows every
    # column — drift absorbed forward
    newest = spark.createDataFrame(
        [(5, "e", 0.0)], "k int, name string, score double"
    )
    wh.append_evolve(spark, newest, "facts", policy="add_nullable")
    assert set(wh.read_evolved(spark, "facts").columns) == {"k", "name", "score"}

    # the gate compares against the UNION schema, not an arbitrary
    # file's footer: on this multi-generation table a batch matching
    # the full union must pass strict deterministically
    wh.append_evolve(
        spark,
        spark.createDataFrame([(6, "f", 1.0)], "k int, name string, score double"),
        "facts",
        policy="strict",
    )
    assert wh.read_evolved(spark, "facts").count() == 5


def test_orc_parquet_format_parity(spark, tmp_path, sf_smoke):
    """The warehouse round-trips identically through parquet and ORC
    (Spark's two native columnar formats): same rows back, and BOTH
    scans carry the pushed filter — the declarative plan, not the
    format, owns pushdown."""
    from cost_of_living_data_etl_spark.sources.tables import load_table
    from cost_of_living_data_etl_spark.sources.warehouse import Warehouse

    orders = load_table(spark, sf_smoke, "orders")
    wh = Warehouse(str(tmp_path))
    wh.append(orders, "fact_pq")  # parquet default
    wh.append(orders, "fact_orc", fmt="orc")

    pq = wh.read(spark, "fact_pq")
    orc = wh.read(spark, "fact_orc", fmt="orc")
    assert pq.count() == orc.count() == orders.count()
    key = lambda r: r["o_orderkey"]  # noqa: E731
    assert sorted(pq.collect(), key=key) == sorted(orc.collect(), key=key)

    for df in (pq, orc):
        plan = df.filter(df.o_totalprice > 1000.0)._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "PushedFilters" in plan and "o_totalprice" in plan.split(
            "PushedFilters"
        )[1].split("]")[0]


def test_delete_where_rewrites_and_audits(spark, tmp_path):
    from cost_of_living_data_etl_spark.sources.warehouse import Warehouse

    wh = Warehouse(str(tmp_path / "wh"))
    df = spark.range(100).selectExpr("id", "id % 10 AS grp")
    wh.append(df, "t")
    audit = wh.delete_where(spark, "t", "grp = 3")
    assert audit == {"before": 100, "deleted": 10, "after": 90}
    back = wh.read(spark, "t")
    assert back.count() == 90
    assert back.filter("grp = 3").count() == 0
    # idempotent: the re-run deletes nothing and reports that
    assert wh.delete_where(spark, "t", "grp = 3") == {
        "before": 90, "deleted": 0, "after": 90,
    }


def test_forget_subject_propagates_across_tables(spark, tmp_path):
    """The GDPR sweep: one subject wiped from every mapped table, with
    a per-table audit; unmapped rows untouched; missing tables report
    zeros instead of failing."""
    from cost_of_living_data_etl_spark.sources.warehouse import Warehouse

    wh = Warehouse(str(tmp_path / "wh"))
    wh.append(
        spark.range(50).selectExpr("id AS user_id", "id * 2 AS v"), "facts_a"
    )
    wh.append(
        spark.range(30).selectExpr("id % 10 AS uid", "id AS v"), "facts_b"
    )
    audit = wh.forget_subject(
        spark,
        {"facts_a": "user_id", "facts_b": "uid", "ghost": "user_id"},
        [7, 9],
    )
    assert audit["facts_a"] == {"before": 50, "deleted": 2, "after": 48}
    assert audit["facts_b"] == {"before": 30, "deleted": 6, "after": 24}
    assert audit["ghost"] == {"before": 0, "deleted": 0, "after": 0}
    assert wh.read(spark, "facts_a").filter("user_id IN (7, 9)").count() == 0
    assert wh.read(spark, "facts_b").filter("uid IN (7, 9)").count() == 0


def test_forget_subject_hostile_string_ids(spark, tmp_path):
    """ADVICE r05: subject ids containing quotes/backslashes must be
    escaped for Spark SQL, not Python repr() — O'Brien and a
    backslashed id must be deleted exactly, siblings untouched, and a
    None id must be rejected loudly (NULL never matches an IN-list)."""
    import pytest

    from cost_of_living_data_etl_spark.sources.warehouse import Warehouse

    wh = Warehouse(str(tmp_path / "wh"))
    ids = ["O'Brien", 'say "hi"', r"back\slash", "plain", "keep'me"]
    df = spark.createDataFrame([(s, i) for i, s in enumerate(ids)], "subj string, v long")
    wh.append(df, "t")
    audit = wh.forget_subject(
        spark, {"t": "subj"}, ["O'Brien", 'say "hi"', r"back\slash"]
    )
    assert audit["t"] == {"before": 5, "deleted": 3, "after": 2}
    left = {r["subj"] for r in wh.read(spark, "t").collect()}
    assert left == {"plain", "keep'me"}
    with pytest.raises(ValueError, match="None subject_id"):
        wh.forget_subject(spark, {"t": "subj"}, [None])
