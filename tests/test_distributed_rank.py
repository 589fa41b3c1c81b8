"""operators/distributed_rank.py: the bucket-partitioned scan must be
bit-identical to the single-partition global window it replaces, for
every shape the catalog uses — positions (zipWithIndex), exclusive
prefix sums, and next-distinct-key — including hostile bucketings
(negative buckets, one giant bucket, one row per bucket, tiny sb_step
forcing the triangular superbucket carry)."""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from cost_of_living_data_etl_spark.operators.distributed_rank import (
    with_global_ntile,
    with_global_ntiles,
    with_global_position,
    with_next_key,
    with_prefix_sums,
)


def _frame(spark, n=2000, lo=-400, hi=400, seed=11):
    rng = random.Random(seed)
    rows = [(rng.randint(lo, hi), i) for i in range(n)]
    return spark.createDataFrame(rows, "v long, id long").repartition(7)


def _same(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


# bucket expressions built lazily (Column construction needs an
# active SparkContext, which doesn't exist at collection time)
BUCKETINGS = [
    ("coarse", lambda: F.floor(F.col("v") / F.lit(10)), 1 << 16),
    ("triangular", lambda: F.floor(F.col("v") / F.lit(10)), 4),
    ("one-bucket", lambda: F.lit(0), 1 << 16),
    ("one-per-value", lambda: F.col("v"), 16),
]


@pytest.mark.parametrize("name,bucket,sb", BUCKETINGS, ids=[b[0] for b in BUCKETINGS])
def test_position_matches_global_row_number(spark, name, bucket, sb):
    bucket = bucket()
    df = _frame(spark)
    got = with_global_position(df, ["v", "id"], bucket, sb_step=sb).select(
        "v", "id", "pos"
    )
    exp = df.select(
        "v", "id", (F.row_number().over(Window.orderBy("v", "id")) - 1).alias("pos")
    )
    assert _same(got, exp)


@pytest.mark.parametrize("name,bucket,sb", BUCKETINGS, ids=[b[0] for b in BUCKETINGS])
def test_prefix_sums_match_global_window(spark, name, bucket, sb):
    bucket = bucket()
    df = _frame(spark)
    cells = df.groupBy("v").agg(
        F.count(F.lit(1)).alias("c1"),
        F.sum(F.when(F.col("id") % 3 == 0, 1).otherwise(0)).alias("c2"),
    )
    got = with_prefix_sums(
        cells, ["v"], bucket, {"c1": "b1", "c2": "b2"}, sb_step=sb
    ).select("v", "b1", "b2")
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    exp = cells.select(
        "v",
        F.coalesce(F.sum("c1").over(w), F.lit(0)).alias("b1"),
        F.coalesce(F.sum("c2").over(w), F.lit(0)).alias("b2"),
    )
    assert _same(got, exp)


@pytest.mark.parametrize("name,bucket,sb", BUCKETINGS, ids=[b[0] for b in BUCKETINGS])
def test_next_key_matches_global_lead(spark, name, bucket, sb):
    bucket = bucket()
    dv = _frame(spark).select("v").distinct()
    got = with_next_key(dv, "v", bucket, out_col="nv", sb_step=sb)
    exp = dv.select("v", F.lead("v").over(Window.orderBy("v")).alias("nv"))
    assert _same(got, exp)


def test_position_is_plan_clean(spark):
    """The rewrite must not itself smuggle in an unpartitioned window:
    audit the physical plan with the plan_audit detector."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from plan_audit import count_global_windows

    df = _frame(spark, n=50)
    out = with_global_position(df, ["v", "id"], F.floor(F.col("v") / F.lit(10)))
    assert count_global_windows(out) == 0


def test_sparse_and_duplicate_heavy_positions(spark):
    """Sparse huge keys (superbucket gaps) and heavy duplication (ties
    broken by id) both reproduce the exact global order."""
    rng = random.Random(3)
    rows = [(rng.choice([7, 10**9, -(10**12), 42]), i) for i in range(800)]
    df = spark.createDataFrame(rows, "v long, id long").repartition(5)
    got = with_global_position(
        df, ["v", "id"], F.floor(F.col("v") / F.lit(1000)), sb_step=8
    ).select("v", "id", "pos")
    exp = df.select(
        "v", "id", (F.row_number().over(Window.orderBy("v", "id")) - 1).alias("pos")
    )
    assert _same(got, exp)


# --- bucket contract: NULL/NaN keys route to sentinel buckets (ADVICE r07) ---
# A raw NULL bucket used to silently DROP its row (the offset equi-join
# never matches NULL) and a raw NaN bucketed to 0 while windows order
# NaN last. The router must instead reproduce the global window
# bit-for-bit: NULL keys first (ASC NULLS FIRST), NaN keys last.


def test_null_bucket_keys_match_global_window(spark):
    rng = random.Random(5)
    rows = [(rng.choice([None, rng.randint(-50, 50)]), i) for i in range(600)]
    df = spark.createDataFrame(rows, "v long, id long").repartition(5)
    assert df.filter(F.col("v").isNull()).count() > 0
    got = with_global_position(df, ["v", "id"], F.col("v"), sb_step=8).select(
        "v", "id", "pos"
    )
    exp = df.select(
        "v", "id", (F.row_number().over(Window.orderBy("v", "id")) - 1).alias("pos")
    )
    assert _same(got, exp)
    assert got.count() == len(rows)  # no silent row loss


def test_nan_bucket_keys_match_global_window(spark):
    """NaN handed RAW to the helper (not pre-collapsed by floor) must
    land after every finite key, exactly like the window sort."""
    rng = random.Random(6)
    rows = [
        (rng.choice([float("nan"), float(rng.randint(-40, 40))]), i)
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "v double, id long").repartition(4)
    got = with_global_position(df, ["v", "id"], F.col("v"), sb_step=8).select(
        "id", "pos"
    )
    exp = df.select(
        "id", (F.row_number().over(Window.orderBy("v", "id")) - 1).alias("pos")
    )
    assert _same(got, exp)


def test_bucket_router_survives_join_condition_substitution(spark):
    """Catalyst's InferFiltersFromConstraints substitutes the bucket
    CASE into upstream join conditions, evaluating it on rows the
    join filter drops (d1 == d2 -> NULL slope). The router must be
    total: the round-8 raise_error variant failed exactly here."""
    df = spark.range(60).select(
        F.col("id").alias("d"), (F.col("id") * 3 % 17).cast("double").alias("r")
    )
    a = df.select(F.col("d").alias("d1"), F.col("r").alias("r1"))
    b = df.select(F.col("d").alias("d2"), F.col("r").alias("r2"))
    slopes = a.join(b, F.col("d1") < F.col("d2")).select(
        F.try_divide(F.col("r2") - F.col("r1"), F.col("d2") - F.col("d1")).alias(
            "slope"
        ),
        (F.col("d1") * 1000 + F.col("d2")).alias("pair_id"),
    )
    got = with_global_position(
        slopes, ["slope", "pair_id"], F.floor(F.col("slope")), sb_step=8
    ).select("pair_id", "pos")
    exp = slopes.select(
        "pair_id",
        (F.row_number().over(Window.orderBy("slope", "pair_id")) - 1).alias("pos"),
    )
    assert _same(got, exp)


def test_valid_buckets_unaffected_by_guard(spark):
    """The guard is a pass-through for contract-abiding inputs,
    including negative buckets."""
    df = _frame(spark, n=300)
    got = with_global_position(df, ["v", "id"], F.col("v")).select(
        "v", "id", "pos"
    )
    exp = df.select(
        "v", "id", (F.row_number().over(Window.orderBy("v", "id")) - 1).alias("pos")
    )
    assert _same(got, exp)


# --- multi-spec ntile: one shared pass ≡ k independent passes ----------------


def test_multi_ntile_matches_global_windows(spark):
    """with_global_ntiles over 3 orderings (asc, desc via negation,
    double keys) must be bit-identical to 3 global window ntiles."""
    rng = random.Random(7)
    rows = [
        (i, rng.randint(0, 50), rng.randint(1, 900), round(rng.uniform(1, 9e4), 2))
        for i in range(1500)
    ]
    df = spark.createDataFrame(
        rows, "k long, a long, b long, m double"
    ).repartition(6)
    got = with_global_ntiles(
        df,
        4,
        [
            (["a", "k"], F.col("a"), "ta"),
            ([-F.col("b"), F.col("k")], -F.col("b"), "tb"),
            ([-F.col("m"), F.col("k")], F.floor(-F.col("m")), "tm"),
        ],
        ["k"],
        sb_step=8,
    ).select("k", "a", "b", "m", "ta", "tb", "tm")
    exp = df.select(
        "k",
        "a",
        "b",
        "m",
        F.ntile(4).over(Window.orderBy("a", "k")).alias("ta"),
        F.ntile(4).over(Window.orderBy(F.desc("b"), F.asc("k"))).alias("tb"),
        F.ntile(4).over(Window.orderBy(F.desc("m"), F.asc("k"))).alias("tm"),
    )
    assert _same(got, exp)


def test_multi_ntile_matches_single_spec_helper(spark):
    """One melted pass ≡ sequential with_global_ntile calls (the shape
    q_rfm_segments replaced), including payload column passthrough."""
    df = _frame(spark, n=900).withColumn("payload", F.col("v") * 2 + 1)
    got = with_global_ntiles(
        df,
        5,
        [
            (["v", "id"], F.col("v"), "t_asc"),
            ([-F.col("v"), F.col("id")], -F.col("v"), "t_desc"),
        ],
        ["id"],
        sb_step=16,
    ).select("id", "v", "payload", "t_asc", "t_desc")
    exp = with_global_ntile(
        with_global_ntile(
            df, 5, ["v", "id"], F.col("v"), out_col="t_asc", sb_step=16
        ),
        5,
        [-F.col("v"), F.col("id")],
        -F.col("v"),
        out_col="t_desc",
        sb_step=16,
    ).select("id", "v", "payload", "t_asc", "t_desc")
    assert _same(got, exp)


def test_multi_ntile_is_plan_clean(spark):
    """The shared pass must not smuggle in an unpartitioned window."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from plan_audit import count_global_windows

    df = _frame(spark, n=60)
    out = with_global_ntiles(
        df,
        4,
        [
            (["v", "id"], F.col("v"), "t1"),
            ([-F.col("v"), F.col("id")], -F.col("v"), "t2"),
        ],
        ["id"],
    )
    assert count_global_windows(out) == 0


# --- hypothesis fuzz: random data × random bucket granularity ---------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_H_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    vals=st.lists(
        st.integers(min_value=-(10**9), max_value=10**9),
        min_size=1,
        max_size=400,
    ),
    divisor=st.sampled_from([1, 7, 1000, 10**6, 10**12]),
    sb=st.sampled_from([2, 16, 1 << 16]),
)
@settings(**_H_SETTINGS)
def test_position_fuzz_matches_reference(spark, vals, divisor, sb):
    """Any value distribution × any monotone bucket granularity ×
    any superbucket step reproduces the exact global order — checked
    against a pure-Python reference (no Spark window on the expected
    side, so the test cannot share a bug with the implementation)."""
    rows = [(v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "v long, id long").repartition(5)
    got = {
        (r["v"], r["id"]): r["pos"]
        for r in with_global_position(
            df, ["v", "id"], F.floor(F.col("v") / F.lit(divisor)), sb_step=sb
        ).collect()
    }
    expected = {
        (v, i): pos for pos, (v, i) in enumerate(sorted((v, i) for v, i in rows))
    }
    assert got == expected


@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=-(10**6), max_value=10**6),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=1,
        max_size=300,
        unique_by=lambda t: t[0],
    ),
    divisor=st.sampled_from([1, 13, 10**4]),
)
@settings(**_H_SETTINGS)
def test_prefix_sum_fuzz_matches_reference(spark, vals, divisor):
    df = spark.createDataFrame(vals, "k long, w long").repartition(3)
    got = {
        r["k"]: r["before"]
        for r in with_prefix_sums(
            df, ["k"], F.floor(F.col("k") / F.lit(divisor)), {"w": "before"},
            sb_step=4,
        ).collect()
    }
    acc, expected = 0, {}
    for k, w in sorted(vals):
        expected[k] = acc
        acc += w
    assert got == expected


# --- superbucket carry boundedness (round-8 verdict item 5) ------------------


def test_superbucket_carry_join_is_bounded(spark):
    """The cross-superbucket carry is a triangular self-join over the
    SUPERBUCKET frame only: its output has exactly one row per
    superbucket and the pair join underneath is <= |SB|^2 rows — the
    docstring's 100 TB arithmetic (10^12 rows -> ~15k superbuckets ->
    ~10^8 comparisons on a broadcast join) holds because |SB| =
    |buckets| / sb_step, independent of the ROW count per bucket."""
    import pyspark.sql.functions as F2

    from cost_of_living_data_etl_spark.operators.distributed_rank import (
        _SB,
        _superbucket_carry,
    )

    n_sb = 37
    sb_frame = spark.range(n_sb).select(
        F2.col("id").alias(_SB), (F2.col("id") * 10 + 1).alias("w")
    )
    carry = _superbucket_carry(sb_frame, ["w"])
    assert carry.count() == n_sb  # one row per superbucket
    # the triangular pair join the carry aggregates over
    a, b = sb_frame.alias("a"), sb_frame.alias("b")
    pairs = a.join(
        F2.broadcast(b), F2.col(f"b.{_SB}") < F2.col(f"a.{_SB}"), "left"
    ).count()
    assert pairs <= n_sb * n_sb
    # and the carry values are the exact exclusive prefix sums
    got = {r[_SB]: r["__carry_w"] for r in carry.collect()}
    acc, exp = 0, {}
    for i in range(n_sb):
        exp[i] = acc
        acc += i * 10 + 1
    assert got == exp


def test_superbucket_count_independent_of_rows_per_bucket(spark):
    """10x the rows per bucket must not change the superbucket frame:
    the carry join's size is a function of the BUCKET GRID, not the
    data volume — the property that keeps the primitive flat at 100 TB."""
    import pyspark.sql.functions as F2

    from cost_of_living_data_etl_spark.operators.distributed_rank import (
        _BKT,
        _SB,
        _with_buckets,
    )

    def n_superbuckets(rows_per_bucket: int) -> int:
        df = spark.range(200 * rows_per_bucket).select(
            (F2.col("id") % 200).alias("v"), F2.col("id").alias("id")
        )
        b = _with_buckets(df, F2.col("v"), sb_step=16)
        return b.select(_SB).distinct().count()

    assert n_superbuckets(10) == n_superbuckets(100) == 13  # ceil(200/16)


@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=-(10**6), max_value=10**6),
            st.integers(min_value=-(10**6), max_value=10**6),
        ),
        min_size=2,
        max_size=200,
    ),
    n_tiles=st.sampled_from([2, 4, 7]),
    divisor=st.sampled_from([1, 13, 10**4]),
)
@settings(**_H_SETTINGS)
def test_multi_ntile_fuzz_matches_reference(spark, vals, n_tiles, divisor):
    """Random frames x random tile counts x random bucket granularity:
    the shared melted pass must equal a pure-Python SQL-standard ntile
    over each spec's order (one asc, one desc via negation) — the
    expected side never touches a Spark window, so the test cannot
    share a bug with the implementation."""
    rows = [(i, a, b) for i, (a, b) in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, a long, b long").repartition(4)
    got = {
        r["k"]: (r["ta"], r["tb"])
        for r in with_global_ntiles(
            df,
            n_tiles,
            [
                (["a", "k"], F.floor(F.col("a") / F.lit(divisor)), "ta"),
                (
                    [-F.col("b"), F.col("k")],
                    F.floor(-F.col("b") / F.lit(divisor)),
                    "tb",
                ),
            ],
            ["k"],
            sb_step=4,
        ).collect()
    }

    def ref_ntile(order):
        n = len(order)
        big, small = n // n_tiles + 1, n // n_tiles
        cut = (n % n_tiles) * big
        out = {}
        for pos, key in enumerate(order):
            out[key] = (
                pos // big + 1
                if pos < cut
                else (n % n_tiles) + (pos - cut) // small + 1
            )
        return out

    ta = ref_ntile([k for a, k in sorted((a, k) for k, a, b in rows)])
    tb = ref_ntile([k for nb, k in sorted((-b, k) for k, a, b in rows)])
    assert got == {k: (ta[k], tb[k]) for k, a, b in rows}


def test_bucket_guard_is_type_derived(spark):
    """The NULL/NaN router emits the cheapest guard the bucket TYPE
    demands (round-9 perf fix: the unconditional three-branch CASE
    tripled per-row evaluation of wide arithmetic bucket keys — 2.0x
    on the Morton-code zorder plan). Pin the plan shape per type:
    float/double keep the NaN probe, nullable integrals get a bare
    coalesce, non-nullable buckets no guard at all."""
    from cost_of_living_data_etl_spark.operators.distributed_rank import (
        _with_buckets,
    )

    def plan(df, bucket):
        return _with_buckets(df, bucket, sb_step=8)._jdf.queryExecution(
        ).analyzed().toString()

    dbl = spark.createDataFrame([(1.0,)], "v double")
    p = plan(dbl, F.col("v"))
    assert "isnan" in p

    nullable_long = spark.createDataFrame([(1,)], "v long")
    assert nullable_long.schema["v"].nullable
    p = plan(nullable_long, F.col("v"))
    assert "isnan" not in p and "coalesce" in p

    nonnull = spark.range(3)  # id is non-nullable
    assert not nonnull.schema["id"].nullable
    p = plan(nonnull, F.col("id"))
    assert "isnan" not in p and "coalesce" not in p


# --- select_global_ranks (round 9: bucket-pruned selection) ---------------

from cost_of_living_data_etl_spark.operators.distributed_rank import (  # noqa: E402
    select_global_ranks,
)


@pytest.mark.parametrize("name,bucket,sb", BUCKETINGS, ids=[b[0] for b in BUCKETINGS])
def test_select_ranks_matches_position_filter(spark, name, bucket, sb):
    """Exact-rank selection ≡ with_global_position + filter, for a
    median-style single target and a multi-target grid (with an
    out-of-range rank that must match nothing)."""
    bucket = bucket()
    df = _frame(spark)
    ref = with_global_position(df, ["v", "id"], bucket, sb_step=sb)

    # single data-derived target: the lower median
    got = select_global_ranks(
        df,
        ["v", "id"],
        bucket,
        lambda nd: nd.select(
            (F.floor((F.col("n") + 1) / 2) - 1).cast("long").alias("__drank_k")
        ),
        n_col="n",
        sb_step=sb,
    ).select("v", "id", "pos")
    exp = ref.crossJoin(
        F.broadcast(df.groupBy().agg(F.count(F.lit(1)).alias("n")))
    ).filter(F.col("pos") == F.floor((F.col("n") + 1) / 2) - 1).select(
        "v", "id", "pos"
    )
    assert _same(got, exp)

    # grid of targets incl. duplicates-in-bucket and out-of-range
    ks = [(0,), (1,), (999,), (1999,), (10**9,)]
    tgt = lambda nd: spark.createDataFrame(ks, "k long").select(  # noqa: E731
        "k", F.col("k").alias("__drank_k")
    )
    got = select_global_ranks(df, ["v", "id"], bucket, tgt, sb_step=sb).select(
        "v", "id", "pos", "k"
    )
    kdf = spark.createDataFrame(ks, "k long")
    exp = ref.join(F.broadcast(kdf), F.col("pos") == F.col("k")).select(
        "v", "id", "pos", "k"
    )
    assert _same(got, exp)
    assert got.filter(F.col("k") == 10**9).count() == 0


def test_select_ranks_prefix_matches_position_filter(spark):
    """prefix=True ≡ position + (pos < k) join for a top-k grid."""
    df = _frame(spark, n=500)
    bucket = F.floor(F.col("v") / F.lit(10))
    ref = with_global_position(df, ["v", "id"], bucket)
    ks = [(1,), (10,), (250,)]
    kdf = spark.createDataFrame(ks, "k long")
    got = select_global_ranks(
        df,
        ["v", "id"],
        bucket,
        lambda nd: kdf.select("k", F.col("k").alias("__drank_k")),
        prefix=True,
    ).select("v", "id", "pos", "k")
    exp = ref.join(F.broadcast(kdf), F.col("pos") < F.col("k")).select(
        "v", "id", "pos", "k"
    )
    assert _same(got, exp)


def test_select_ranks_null_nan_buckets(spark):
    """NULL/NaN sort keys route through the sentinel buckets exactly
    like the position helper (module bucket contract)."""
    rows = [(None, 1), (float("nan"), 2), (3.0, 3), (1.0, 4), (2.0, 5)]
    df = spark.createDataFrame(rows, "v double, id long")
    bucket = F.col("v")
    ref = with_global_position(df, ["v", "id"], bucket)
    for k in range(5):
        got = select_global_ranks(
            df,
            ["v", "id"],
            bucket,
            lambda nd: spark.createDataFrame([(k,)], "__drank_k long"),
        ).select("v", "id", "pos")
        exp = ref.filter(F.col("pos") == k).select("v", "id", "pos")
        assert _same(got, exp), f"rank {k}"
