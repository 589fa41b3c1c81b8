"""Deterministic distributed rank / prefix-scan primitives.

An unpartitioned window (``row_number() OVER (ORDER BY ...)``,
``sum(x) OVER (ORDER BY ...)`` with no PARTITION BY) is correct but a
scale-killer: Spark plans it as ``Exchange SinglePartition`` +
``WindowExec`` with no partition spec, so ONE task sorts and scans the
entire frame. Fine at 60k rows; the bottleneck at 100 TB.

This module replaces that shape with an exactly-equivalent two-level
bucket scan — the classic distributed prefix-scan / zipWithIndex
decomposition, expressed as plain Catalyst plans (no RDDs, no UDFs):

1. the caller supplies a **deterministic, weakly-monotone bucket
   expression** over the leading sort key (e.g. ``floor(price)``,
   ``floor(log-ish transform)``, the Morton code itself). Monotone ⇒
   bucket order == value order, so global order decomposes into
   (bucket order, within-bucket order);
2. per-bucket totals aggregate map-side (one shuffle keyed on bucket);
3. buckets roll up into superbuckets (``bucket div sb_step``); the
   cross-superbucket carry is a *triangular broadcast join* over the
   superbucket frame (|SB| = |buckets| / sb_step — a few hundred rows
   even at 10^12 input rows, so the O(|SB|²) join is bounded);
4. the within-superbucket carry and the within-bucket scan are
   ordinary **partitioned** windows (``PARTITION BY superbucket`` /
   ``PARTITION BY bucket``) — every task sees at most one bucket's
   rows, never the whole frame.

All arithmetic here is over BIGINT counts/weights and ``row_number``
ranks, so results are **bit-identical** to the single-partition global
window they replace — the DuckDB oracles (which keep the readable
global-window SQL) stay green. Float weights would re-associate the
sum and are deliberately unsupported.

Determinism: no sampling (unlike ``repartitionByRange``, whose
boundaries come from a reservoir sample), no ``spark_partition_id``,
no ``monotonically_increasing_id`` — positions depend only on the data
and the bucket expression, so replays and resumed stages agree.

tools/plan_audit.py enforces the policy side: its ``gwin`` column
counts unpartitioned Window nodes in every catalog plan, and
tests/test_global_window_audit.py pins the allowlist of queries whose
global windows run over provably bounded frames (calendar grids,
LITERAL-limited candidate lists, fixed bin counts).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

_BKT = "__drank_bkt"
_SB = "__drank_sb"

#: buckets per superbucket. 2^16 keeps the triangular superbucket join
#: trivially bounded: 10^12 rows at ~10^3 rows/bucket -> 10^9 buckets
#: -> ~15k superbuckets -> a 15k-row broadcast self-join.
DEFAULT_SB_STEP = 1 << 16

def _zero() -> Column:
    # built lazily: F.lit needs an active SparkContext at call time
    return F.lit(0).cast("long")


def _with_buckets(df: DataFrame, bucket: Column, sb_step: int) -> DataFrame:
    b = df.withColumn(_BKT, bucket.cast("long"))
    return b.withColumn(_SB, F.floor(F.col(_BKT) / F.lit(sb_step)).cast("long"))


def _superbucket_carry(
    sb_frame: DataFrame, cols: Sequence[str], *, agg: str = "sum",
    direction: str = "before",
) -> DataFrame:
    """Per-superbucket carry: for each _SB row, ``agg`` of each column
    over STRICTLY smaller (``before``) / larger (``after``) _SB values.
    The triangular self-join is bounded by |SB|² (see module note).
    ``sum`` carries default 0; ``min`` carries default NULL."""
    a, b = sb_frame.alias("a"), sb_frame.alias("b")
    cmp = (
        F.col(f"b.{_SB}") < F.col(f"a.{_SB}")
        if direction == "before"
        else F.col(f"b.{_SB}") > F.col(f"a.{_SB}")
    )
    fn = F.sum if agg == "sum" else F.min
    aggs = []
    for c in cols:
        e = fn(F.col(f"b.{c}"))
        if agg == "sum":
            e = F.coalesce(e, _zero())
        aggs.append(e.alias(f"__carry_{c}"))
    return (
        a.join(F.broadcast(b), cmp, "left")
        .groupBy(F.col(f"a.{_SB}").alias(_SB))
        .agg(*aggs)
    )


def _bucket_prefix_totals(
    bkt_frame: DataFrame, weight_cols: Sequence[str]
) -> DataFrame:
    """``bkt_frame``: one row per bucket carrying ``_SB``, ``_BKT`` and
    long-typed total-weight columns. Returns ``(_BKT, __off_<c>...)``
    where ``__off_<c>`` = total of ``c`` over strictly earlier buckets."""
    sb_tot = bkt_frame.groupBy(_SB).agg(
        *[F.sum(c).alias(c) for c in weight_cols]
    )
    sb_off = _superbucket_carry(sb_tot, weight_cols)
    w = Window.partitionBy(_SB).orderBy(_BKT).rowsBetween(
        Window.unboundedPreceding, -1
    )
    joined = bkt_frame.join(sb_off, _SB)
    sel = [F.col(_BKT)]
    for c in weight_cols:
        sel.append(
            (
                F.col(f"__carry_{c}")
                + F.coalesce(F.sum(c).over(w), _zero())
            ).alias(f"__off_{c}")
        )
    return joined.select(*sel)


def with_global_position(
    df: DataFrame,
    order_cols: Sequence[str | Column],
    bucket: Column,
    *,
    pos_col: str = "pos",
    n_col: str | None = None,
    sb_step: int = DEFAULT_SB_STEP,
) -> DataFrame:
    """Distributed zipWithIndex: adds ``pos_col`` = the 0-based global
    position of each row under ``ORDER BY order_cols`` — bit-identical
    to ``row_number() OVER (ORDER BY order_cols) - 1`` — without a
    single-partition window.

    ``order_cols`` must be a TOTAL order (include a unique tiebreak
    column) for positions to be deterministic. ``bucket`` must be a
    deterministic weakly-monotone function of the leading sort key
    (ascending): v1 < v2 ⟹ bucket(v1) <= bucket(v2).

    ``n_col``: optionally attach the TOTAL row count as a broadcast
    column of that name — derived from the tiny per-bucket rollup
    inside the same job, so callers don't pay a SEPARATE ``df.agg``
    action for it. Callers whose ``df`` is expensive to rebuild
    should materialize it first (``.transform(eager_checkpoint)``) —
    the helper reads ``df`` twice (rollup + position join).
    """
    b = _with_buckets(df, bucket, sb_step)
    cnt = "__drank_cnt"
    bkt_tot = b.groupBy(_SB, _BKT).agg(F.count(F.lit(1)).alias(cnt))
    offs = _bucket_prefix_totals(bkt_tot, [cnt])
    rn = F.row_number().over(Window.partitionBy(_BKT).orderBy(*order_cols))
    out = (
        b.join(offs, _BKT)
        .withColumn(pos_col, (F.col(f"__off_{cnt}") + rn - F.lit(1)).cast("long"))
        .drop(_BKT, _SB, f"__off_{cnt}")
    )
    if n_col is not None:
        n_tot = bkt_tot.groupBy().agg(F.sum(cnt).cast("long").alias(n_col))
        out = out.crossJoin(F.broadcast(n_tot))
    return out


def with_prefix_sums(
    df: DataFrame,
    order_cols: Sequence[str | Column],
    bucket: Column,
    weights: dict[str, str],
    *,
    sb_step: int = DEFAULT_SB_STEP,
) -> DataFrame:
    """Exclusive running sums: for each ``src -> out`` in ``weights``,
    adds ``out`` = sum of ``src`` over all rows STRICTLY BEFORE the
    current row in ``ORDER BY order_cols`` (0 for the first row) —
    bit-identical to ``sum(src) OVER (ORDER BY ... ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING)`` with ``coalesce(..., 0)``.

    Weights must be integral (BIGINT-safe): integer prefix sums are
    association-free, which is what makes the decomposition exact.
    ``df`` must have ONE row per distinct ``order_cols`` key (the
    usual distinct-value rollup) so "strictly before" is unambiguous;
    inclusive scans are just ``out + src`` on the caller's side.
    """
    b = _with_buckets(df, bucket, sb_step)
    srcs = list(weights)
    bkt_tot = b.groupBy(_SB, _BKT).agg(*[F.sum(c).alias(c) for c in srcs])
    offs = _bucket_prefix_totals(bkt_tot, srcs)
    wb = Window.partitionBy(_BKT).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, -1
    )
    out = b.join(offs, _BKT)
    for src, dst in weights.items():
        out = out.withColumn(
            dst,
            F.col(f"__off_{src}") + F.coalesce(F.sum(src).over(wb), _zero()),
        )
    return out.drop(_BKT, _SB, *[f"__off_{c}" for c in srcs])


def with_global_ntile(
    df: DataFrame,
    n_tiles: int,
    order_cols: Sequence[str | Column],
    bucket: Column,
    *,
    out_col: str = "tile",
    sb_step: int = DEFAULT_SB_STEP,
) -> DataFrame:
    """Exact distributed ``ntile(n) OVER (ORDER BY order_cols)``:
    positions from :func:`with_global_position`, then the closed-form
    ntile split (the first ``n mod n_tiles`` tiles hold ``⌈n/n_tiles⌉``
    rows, the rest ``⌊n/n_tiles⌋``) — bit-identical to the single-task
    window ntile. The total count comes free from the position
    helper's per-bucket rollup (``n_col``) — no extra scan of df."""
    pos = with_global_position(
        df,
        order_cols,
        bucket,
        pos_col="__ntile_pos",
        n_col="__ntile_n",
        sb_step=sb_step,
    )
    tile = F.expr(
        f"CAST(CASE WHEN __ntile_pos < (__ntile_n DIV {n_tiles} + 1)"
        f" * (__ntile_n % {n_tiles})"
        f" THEN __ntile_pos DIV (__ntile_n DIV {n_tiles} + 1) + 1"
        f" ELSE __ntile_n % {n_tiles}"
        f"  + (__ntile_pos - (__ntile_n DIV {n_tiles} + 1)"
        f"     * (__ntile_n % {n_tiles})) DIV (__ntile_n DIV {n_tiles}) + 1"
        f" END AS INT)"
    )
    return pos.withColumn(out_col, tile).drop("__ntile_pos", "__ntile_n")


def with_next_key(
    df: DataFrame,
    key_col: str,
    bucket: Column,
    *,
    out_col: str,
    sb_step: int = DEFAULT_SB_STEP,
) -> DataFrame:
    """Distributed ``lead(key) OVER (ORDER BY key)``: adds ``out_col``
    = the next larger distinct key (NULL for the global maximum).
    ``df`` must have one row per distinct ``key_col``. The within-
    bucket lead is a partitioned window; the bucket-boundary carry is
    a hierarchical suffix-min (min of later buckets' first keys within
    the superbucket + min over later superbuckets via the triangular
    join)."""
    b = _with_buckets(df, bucket, sb_step)
    kmin = "__drank_kmin"
    bkt_first = b.groupBy(_SB, _BKT).agg(F.min(key_col).alias(kmin))
    sb_first = bkt_first.groupBy(_SB).agg(F.min(kmin).alias(kmin))
    sb_after = _superbucket_carry(
        sb_first, [kmin], agg="min", direction="after"
    )
    # min of first keys over LARGER buckets in the same superbucket
    wafter = (
        Window.partitionBy(_SB)
        .orderBy(F.col(_BKT).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    nxt = (
        bkt_first.join(sb_after, _SB)
        .select(
            _BKT,
            F.least(
                F.min(kmin).over(wafter), F.col(f"__carry_{kmin}")
            ).alias("__drank_next_first"),
        )
    )
    lead_in = F.lead(key_col).over(Window.partitionBy(_BKT).orderBy(key_col))
    return (
        b.join(nxt, _BKT)
        .withColumn(out_col, F.coalesce(lead_in, F.col("__drank_next_first")))
        .drop(_BKT, _SB, "__drank_next_first")
    )
