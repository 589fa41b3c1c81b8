"""Round-9 catalog additions.

Registered LAST in plans/all_queries.py so the driver's
unverified-first sampling picks the new names up immediately; the
catalog enters round 9 with 308/309 fingerprint-current, so the
~50-name sample has room for these 4 plus broad re-confirmation.

1. ``q_mixture_temperature_weights`` — temperature-scaled corpus
   mixture weights per source (the mT5/XLM-R sampling rule
   ``w_i ∝ n_i^α``) at α = 0.5 and α = 0.25, with the implied
   per-source effective epochs at a one-total-pass token budget.
   α values are deliberately powers of 1/2: ``sqrt`` is IEEE-754
   correctly rounded (unlike ``pow``/``exp``/``ln``, which may differ
   by an ulp between Java and C libm), so every float here is
   bit-identical across engines by construction.
2. ``q_table_diff_audit`` — version-diff audit between two dataset
   snapshots (v1 = deterministic 95% subset of customer, v2 = 95%
   overlapping subset with ~5% of balances restated): per-segment
   added / removed / changed / unchanged key counts and balance mass
   per side. The lakehouse "what changed between snapshots" primitive
   (MERGE pre-flight, CDC reconciliation, reproducibility audit) as
   one full-outer-join aggregate.
3. ``q_ivm_merge_equivalence`` — incremental view maintenance: the
   revenue-by-status aggregate maintained as three per-batch PARTIAL
   aggregates (count / integer-cent sum / max) merged by re-
   aggregation, proven equal to the from-scratch oracle. Money rides
   an exact BIGINT cent grid, so partial-merge order can never drift
   a ulp — the mergeable-state discipline every streaming/IVM sink
   needs at 100 TB.
4. ``q_join_size_estimate_cms`` — self-join cardinality estimation
   from Count-Min sketch inner products: estimate
   |lineitem ⋈ lineitem ON l_partkey| = Σ_k n(k)² as
   min_i Σ_b cell_i[b]² WITHOUT executing the join, vs the exact
   size; the AGMS/CMS estimate is a structural overcount, which the
   oracle hash pins (``overcount ≥ 0``). This is the optimizer-side
   cardinality-estimation primitive: at 100 TB the sketch is a fixed
   depth×width summary maintained per partition and merged cell-wise.

Float discipline per the house recipes: BIGINT as long as possible,
money on an exact integer cent grid where aggregated, unordered double
sums via the sorted fold ``det_sum``, shared final expression texts of
correctly-rounded ops (sqrt, *, /) on identical operands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cost_of_living_data_etl_spark.functions.columns import det_sum
from cost_of_living_data_etl_spark.plans.catalog import register
from cost_of_living_data_etl_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# 1. temperature-scaled mixture weights


#: shared texts: sqrt / * / / are IEEE correctly rounded, so identical
#: operands give identical bits on both engines — no det_sum needed
#: beyond the source-level totals.
_W_HALF = "sqrt(CAST(n_chars AS DOUBLE)) / t_half"
_W_QUARTER = "sqrt(sqrt(CAST(n_chars AS DOUBLE))) / t_quarter"
_EPOCHS = "CAST(total_chars AS DOUBLE) * {w} / CAST(n_chars AS DOUBLE)"

_MIXTURE_ORACLE = f"""
WITH per AS (
    SELECT source, CAST(sum(n_chars) AS BIGINT) AS n_chars
    FROM documents GROUP BY source
),
tot AS (
    SELECT CAST(sum(n_chars) AS BIGINT) AS total_chars,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_sort(list(sqrt(CAST(n_chars AS DOUBLE))))),
                       (a, b) -> a + b) AS t_half,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_sort(list(sqrt(sqrt(CAST(n_chars AS DOUBLE)))))),
                       (a, b) -> a + b) AS t_quarter
    FROM per
),
w AS (
    SELECT source, n_chars,
           {_W_HALF}    AS w_half,
           {_W_QUARTER} AS w_quarter,
           total_chars
    FROM per CROSS JOIN tot
)
SELECT source, n_chars, w_half, w_quarter,
       {_EPOCHS.format(w="w_half")}    AS epochs_half,
       {_EPOCHS.format(w="w_quarter")} AS epochs_quarter
FROM w
"""


@register(
    "q_mixture_temperature_weights",
    oracle=_MIXTURE_ORACLE,
    tags=("corpus", "mixture", "sampling", "llm-pipeline"),
)
def q_mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source temperature-sampling weights ``w_i ∝ n_i^α`` over
    character mass, at α = 0.5 and 0.25, plus the effective epochs each
    source is replayed for under a one-total-pass budget
    (``total · w_i / n_i`` — the low-resource upsampling factor the
    mixture implies). The standard multilingual-corpus balancing rule
    (mT5 §3.2, XLM-R §3.1) as one aggregate + broadcast-scalar join.

    Scale: the per-source rollup is a tiny aggregate; the totals row is
    a broadcast scalar. Everything after the groupBy is arithmetic on
    ≤ |sources| rows.
    """
    per = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum("n_chars").cast("long").alias("n_chars"))
    )
    tot = per.agg(
        F.sum("n_chars").cast("long").alias("total_chars"),
        det_sum("sqrt(CAST(n_chars AS DOUBLE))").alias("t_half"),
        det_sum("sqrt(sqrt(CAST(n_chars AS DOUBLE)))").alias("t_quarter"),
    )
    w = per.crossJoin(F.broadcast(tot)).selectExpr(
        "source",
        "n_chars",
        f"{_W_HALF} AS w_half",
        f"{_W_QUARTER} AS w_quarter",
        "total_chars",
    )
    return w.selectExpr(
        "source",
        "n_chars",
        "w_half",
        "w_quarter",
        f"{_EPOCHS.format(w='w_half')} AS epochs_half",
        f"{_EPOCHS.format(w='w_quarter')} AS epochs_quarter",
    )


# --------------------------------------------------------------------------
# 2. snapshot diff audit

#: md5 bucket on the key — the house deterministic split (reshape.py)
_DIFF_BUCKET_SPARK = (
    "cast(conv(substring(md5(cast(c_custkey AS STRING)), 1, 15), 16, 10)"
    " AS BIGINT) % 100"
)
_DIFF_BUCKET_SQL = (
    "CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)"
    " % 100"
)
#: restatement on the exact cent grid (see mllite SCD2 note: round()
#: disagrees between engines on .5-cent midpoints; floor(x*110+0.5)/100
#: evaluates identically)
_RESTATE = "floor(c_acctbal * 110.0 + 0.5) / 100.0"

_DIFF_ORACLE = f"""
WITH b AS (
    SELECT c_custkey, c_mktsegment, c_acctbal,
           {_DIFF_BUCKET_SQL} AS bk
    FROM customer
),
v1 AS (
    SELECT c_custkey, c_mktsegment, c_acctbal FROM b WHERE bk < 95
),
v2 AS (
    SELECT c_custkey, c_mktsegment,
           CASE WHEN bk >= 5 AND bk < 10 THEN {_RESTATE}
                ELSE c_acctbal END AS c_acctbal
    FROM b WHERE bk >= 5
),
d AS (
    SELECT COALESCE(v1.c_mktsegment, v2.c_mktsegment) AS segment,
           CASE WHEN v1.c_custkey IS NULL THEN 'added'
                WHEN v2.c_custkey IS NULL THEN 'removed'
                WHEN v1.c_acctbal <> v2.c_acctbal THEN 'changed'
                ELSE 'unchanged' END AS status,
           COALESCE(v1.c_acctbal, 0.0) AS bal_v1,
           COALESCE(v2.c_acctbal, 0.0) AS bal_v2
    FROM v1 FULL OUTER JOIN v2 ON v1.c_custkey = v2.c_custkey
)
SELECT segment, status, CAST(count(*) AS BIGINT) AS n_keys,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_sort(list(bal_v1))), (a, b) -> a + b) AS bal_v1,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_sort(list(bal_v2))), (a, b) -> a + b) AS bal_v2
FROM d GROUP BY segment, status
"""


@register(
    "q_table_diff_audit",
    oracle=_DIFF_ORACLE,
    tags=("cdc", "diff", "audit", "join"),
)
def q_table_diff_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-diff audit between two deterministic versions of the
    customer dimension (v1 = md5 buckets 0-94; v2 = buckets 5-99 with
    buckets 5-9 restated ×1.1 on the cent grid): per (segment, status ∈
    added/removed/changed/unchanged) key counts and balance mass per
    side — the "what changed between table versions" reconciliation
    every CDC/MERGE pipeline runs before applying a batch.

    Scale: one full outer join on the key (shuffle both sides by
    c_custkey — co-locatable via bucketing, see
    q_bucketed_colocated_join) followed by a small-cardinality
    aggregate. No row ever reaches the driver.
    """
    b = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.expr(_DIFF_BUCKET_SPARK).alias("bk"),
    )
    v1 = b.filter(F.col("bk") < 95).select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    v2 = b.filter(F.col("bk") >= 5).select(
        "c_custkey",
        "c_mktsegment",
        F.when(
            (F.col("bk") >= 5) & (F.col("bk") < 10), F.expr(_RESTATE)
        )
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    )
    d = v1.alias("v1").join(
        v2.alias("v2"),
        F.col("v1.c_custkey") == F.col("v2.c_custkey"),
        "full_outer",
    ).select(
        F.coalesce("v1.c_mktsegment", "v2.c_mktsegment").alias("segment"),
        F.when(F.col("v1.c_custkey").isNull(), F.lit("added"))
        .when(F.col("v2.c_custkey").isNull(), F.lit("removed"))
        .when(
            F.col("v1.c_acctbal") != F.col("v2.c_acctbal"), F.lit("changed")
        )
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        F.coalesce("v1.c_acctbal", F.lit(0.0)).alias("b1"),
        F.coalesce("v2.c_acctbal", F.lit(0.0)).alias("b2"),
    )
    return d.groupBy("segment", "status").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        det_sum("b1").alias("bal_v1"),
        det_sum("b2").alias("bal_v2"),
    )


# --------------------------------------------------------------------------
# 3. incremental view maintenance: partial-merge ≡ recompute

#: money on the exact integer cent grid: o_totalprice is generated on
#: 2 decimals, so floor(x*100+0.5) recovers exact cents as BIGINT and
#: every partial sum / merge is integer-exact in ANY order
_CENTS = "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)"

_IVM_ORACLE = f"""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT)      AS n_orders,
       CAST(sum({_CENTS}) AS BIGINT) AS revenue_cents,
       CAST(CAST(sum({_CENTS}) AS BIGINT) AS DOUBLE) / 100.0 AS revenue,
       CAST(CAST(max({_CENTS}) AS BIGINT) AS DOUBLE) / 100.0 AS max_order_value
FROM orders GROUP BY o_orderstatus
"""


@register(
    "q_ivm_merge_equivalence",
    oracle=_IVM_ORACLE,
    tags=("incremental", "ivm", "mergeable", "aggregate"),
)
def q_ivm_merge_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance by partial-aggregate merge: the
    orders table arrives as three deterministic batches
    (``o_orderkey % 3``); each batch contributes a PARTIAL aggregate
    (count, integer-cent revenue, integer-cent max) and the maintained
    view is the re-aggregation of the partials — count by sum, sum by
    sum, max by max. The oracle recomputes from scratch, so the hash
    match proves merge(partials) ≡ recompute EXACTLY — possible only
    because money rides a BIGINT cent grid (double partial sums would
    drift an ulp per merge order).

    This is the state discipline of every streaming sink /
    materialized view at 100 TB: ingest updates the view in O(delta),
    never rescanning history, and a midnight recompute can verify the
    maintained state bit-for-bit.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.expr(_CENTS).alias("cents")
    )
    partials = [
        orders.filter(F.col("o_orderkey") % 3 == i)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("pn"),
            F.sum("cents").cast("long").alias("pcents"),
            F.max("cents").cast("long").alias("pmax"),
        )
        for i in range(3)
    ]
    merged = partials[0].unionByName(partials[1]).unionByName(partials[2])
    view = merged.groupBy("o_orderstatus").agg(
        F.sum("pn").cast("long").alias("n_orders"),
        F.sum("pcents").cast("long").alias("revenue_cents"),
        F.max("pmax").cast("long").alias("max_cents"),
    )
    return view.selectExpr(
        "o_orderstatus",
        "n_orders",
        "revenue_cents",
        "CAST(revenue_cents AS DOUBLE) / 100.0 AS revenue",
        "CAST(max_cents AS DOUBLE) / 100.0 AS max_order_value",
    )


# --------------------------------------------------------------------------
# 4. CMS join-size estimation

_JS_DEPTH = 4
_JS_WIDTH = 512

_JS_BUCKET_SPARK = (
    "cast(conv(substring(md5(concat(cast(l_partkey AS STRING), '#',"
    " CAST(i AS STRING))), 1, 15), 16, 10) AS BIGINT) % " + str(_JS_WIDTH)
)
_JS_BUCKET_SQL = (
    "CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR) || '#' ||"
    f" CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % {_JS_WIDTH}"
)

_JS_ORACLE = f"""
WITH kc AS (
    SELECT l_partkey, CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_partkey
),
exact AS (
    SELECT CAST(sum(n * n) AS BIGINT) AS exact_join_size FROM kc
),
cells AS (
    SELECT i, {_JS_BUCKET_SQL} AS bucket, CAST(sum(n) AS BIGINT) AS cell
    FROM kc CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i)
    GROUP BY i, bucket
),
est AS (
    SELECT CAST(min(ip) AS BIGINT) AS cms_estimate
    FROM (SELECT i, sum(cell * cell) AS ip FROM cells GROUP BY i)
)
SELECT exact_join_size, cms_estimate,
       CAST(cms_estimate - exact_join_size AS BIGINT) AS overcount
FROM exact CROSS JOIN est
"""


@register(
    "q_join_size_estimate_cms",
    oracle=_JS_ORACLE,
    tags=("sketch", "count-min", "cardinality-estimation", "optimizer"),
)
def q_join_size_estimate_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation WITHOUT executing the join: the
    self-join size |lineitem ⋈ lineitem ON l_partkey| = Σ_k n(k)²
    estimated as the minimum over CMS rows of the sketch inner product
    Σ_b cell² (AGMS/Count-Min join-size estimate, Alon-Matias-Szegedy
    F₂ / Cormode-Muthukrishnan §4.2), next to the exact answer. The
    estimate structurally never undercounts — ``overcount ≥ 0`` is
    pinned by the oracle hash.

    Optimizer relevance at 100 TB: a {_JS_DEPTH}×{_JS_WIDTH} integer
    sketch per table (mergeable cell-wise across partitions/shards)
    prices any equi-join before running it — the difference between
    choosing a broadcast and materializing a 10¹² -row blow-up. All
    arithmetic is BIGINT-exact; md5-derived row hashes, no RNG.
    """
    kc = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    exact = kc.agg(
        F.sum(F.col("n") * F.col("n")).cast("long").alias("exact_join_size")
    )
    rows = F.array([F.lit(i) for i in range(_JS_DEPTH)])
    cells = (
        kc.select("l_partkey", "n", F.explode(rows).alias("i"))
        .select("i", F.expr(_JS_BUCKET_SPARK).alias("bucket"), "n")
        .groupBy("i", "bucket")
        .agg(F.sum("n").cast("long").alias("cell"))
    )
    est = (
        cells.groupBy("i")
        .agg(F.sum(F.col("cell") * F.col("cell")).alias("ip"))
        .agg(F.min("ip").cast("long").alias("cms_estimate"))
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_join_size",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_join_size"))
        .cast("long")
        .alias("overcount"),
    )
