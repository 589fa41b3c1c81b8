"""Stream hygiene: the event-time measurements that CONFIGURE the
streaming module.

`streaming/events.py` takes watermark delays and window sizes as
inputs; these three batch passes are where those numbers come from —
measured on the same event stream, not guessed:

- **lateness audit**: how out-of-order is arrival really? Per event
  type: inversion rate and worst/typical lateness against the
  per-user running event-time high-water mark (arrival order = the
  event_id ingest sequence);
- **inter-arrival gap percentiles**: exact p50/p90/p99 of per-user
  gaps per event type — the session-timeout / window-size evidence
  (`q_events_sessionization`'s 30-min gap becomes a measured choice);
- **watermark coverage curve**: for a ladder of candidate delays, the
  fraction of events a watermark that long would have accepted — read
  the delay off the curve at the coverage target instead of shipping
  a guess.

All event-time arithmetic is integral microseconds; percentiles are
exact per-group order statistics (selection, no interpolation);
coverage shares divide exact BIGINT counts once.

Fixture honesty: the driver's synthetic event stream is perfectly
in-order (event_id sequence == event-time order per user), so the
oracle gate pins the degenerate all-on-time outputs; the lateness
MECHANICS (running-max marks, per-user isolation, inclusive coverage
boundaries) are proven on constructed out-of-order arrivals in
`tests/test_hygiene.py`.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from cost_of_living_data_etl_spark.plans.catalog import register
from cost_of_living_data_etl_spark.sources.tables import load_table

# candidate watermark delays (seconds) — the coverage-curve ladder
WM_LADDER_S = (60, 300, 600, 1800)

# shared gap percentile ranks: lower order statistic at ceil(q * n)
GAP_QS = ((50, "p50_us"), (90, "p90_us"), (99, "p99_us"))


def _late_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, late_us): per event, how far its event time sits
    BEHIND the same user's running event-time maximum over earlier
    ARRIVALS (event_id order) — 0 for in-order events."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    arrival = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return ev.select(
        "event_type",
        F.greatest(
            F.lit(0),
            F.coalesce(F.max("ts_us").over(arrival) - F.col("ts_us"), F.lit(0)),
        ).alias("late_us"),
    )


_LATE_CTE = """late AS (
    SELECT event_type,
           greatest(0, coalesce(
               max(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING)
               - epoch_us(ts), 0)) AS late_us
    FROM events
)"""

_LATENESS_ORACLE = f"""
WITH {_LATE_CTE}
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late,
       CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS late_share,
       CAST(max(late_us) AS BIGINT) AS max_late_us,
       CAST(sum(late_us) AS BIGINT) AS total_late_us
FROM late GROUP BY event_type ORDER BY event_type
"""


@register(
    "q_event_lateness_audit",
    oracle=_LATENESS_ORACLE,
    tags=("events", "streaming-config", "data-quality"),
)
def q_event_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness of the event stream, per event type: how many
    events arrive with an event time BEHIND the user's running
    high-water mark, and by how much — the empirical basis for every
    watermark in `streaming/events.py` (a watermark shorter than real
    lateness silently drops data; longer holds state for nothing).

    The high-water mark is a per-user running max over ARRIVAL order
    (event_id is the ingest sequence) — exactly the quantity
    Structured Streaming's watermark tracks per partition.

    100 TB: one user_id window shuffle of (user, id, ts) triples, then
    a partial-aggregated rollup to |event types| rows; lateness stays
    integral microseconds end-to-end.
    """
    late = _late_events(spark, sf_dir)
    return (
        late.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("late_us") > 0, 1).otherwise(0)).alias(
                "n_late"
            ),
            F.max("late_us").alias("max_late_us"),
            F.sum("late_us").alias("total_late_us"),
        )
        .select(
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_late").cast("long").alias("n_late"),
            (F.col("n_late").cast("double") / F.col("n_events")).alias(
                "late_share"
            ),
            F.col("max_late_us").cast("long").alias("max_late_us"),
            F.col("total_late_us").cast("long").alias("total_late_us"),
        )
        .orderBy("event_type")
    )


_GAP_CTE = """gaps AS (
    SELECT event_type,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ) AS gap_us
    FROM events
)"""

# CAST AS DOUBLE: DuckDB parses bare decimal literals as DECIMAL and
# would compute the rank in exact decimal while Spark computes it in
# double — force both into the same double arithmetic (SPRT lesson)
_GAP_SELECTS = ",\n       ".join(
    f"CAST(min(CASE WHEN rk = CAST(ceil(CAST({q / 100.0} AS DOUBLE) * n)"
    f" AS BIGINT) THEN gap_us END) AS BIGINT) AS {name}"
    for q, name in GAP_QS
)

_GAPPCT_ORACLE = f"""
WITH {_GAP_CTE},
r AS (
    SELECT event_type, gap_us,
           row_number() OVER (PARTITION BY event_type ORDER BY gap_us) AS rk,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM gaps WHERE gap_us IS NOT NULL
)
SELECT event_type,
       CAST(min(n) AS BIGINT) AS n_gaps,
       {_GAP_SELECTS}
FROM r GROUP BY event_type ORDER BY event_type
"""


@register(
    "q_event_gap_percentiles",
    oracle=_GAPPCT_ORACLE,
    tags=("events", "streaming-config", "percentiles"),
)
def q_event_gap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of per-user inter-arrival gaps, per event
    type — the measurement behind session timeouts and window sizes
    (a 30-min session gap is defensible iff p99 of within-session
    gaps sits well below it).

    Percentile = the lower order statistic at rank ceil(q·n) under
    the total order (gap, then rank) — an exact element, engine-
    identical, not an interpolated quantile. Ties collapse to the
    same value, so `min(CASE WHEN rk = …)` is deterministic.

    100 TB: gaps need one user_id window; ranking partitions by
    EVENT TYPE (a handful of groups — for high-cardinality group keys
    the exact path hands over to `q_quantile_sketch_rollup`). Gaps
    stay integral microseconds.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    byuser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = ev.select(
        "event_type",
        (F.col("ts_us") - F.lag("ts_us").over(byuser)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    bytype = Window.partitionBy("event_type")
    r = gaps.select(
        "event_type",
        "gap_us",
        F.row_number().over(bytype.orderBy("gap_us")).alias("rk"),
        F.count(F.lit(1)).over(bytype).alias("n"),
    )
    aggs = [F.min("n").cast("long").alias("n_gaps")] + [
        F.min(
            F.when(
                F.col("rk")
                == F.ceil(F.lit(q / 100.0) * F.col("n")).cast("long"),
                F.col("gap_us"),
            )
        )
        .cast("long")
        .alias(name)
        for q, name in GAP_QS
    ]
    return r.groupBy("event_type").agg(*aggs).orderBy("event_type")


_WM_SELECTS = ", ".join(
    f"""CAST(sum(CASE WHEN late_us <= {s} * 1000000 THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*) AS covered_{s}s"""
    for s in WM_LADDER_S
)

_WMCURVE_ORACLE = f"""
WITH {_LATE_CTE}
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, {_WM_SELECTS}
FROM late GROUP BY event_type ORDER BY event_type
"""


@register(
    "q_watermark_coverage_curve",
    oracle=_WMCURVE_ORACLE,
    tags=("events", "streaming-config", "watermark"),
)
def q_watermark_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each candidate watermark delay (1/5/10/30 min), the share
    of events that delay would have ACCEPTED (lateness ≤ delay), per
    event type — the coverage curve you read the production watermark
    off at the loss target (e.g. smallest delay with ≥ 99.9%),
    replacing a guessed `withWatermark("ts", "10 minutes")` with a
    measured one.

    One pass over the lateness stream: the whole ladder is conditional
    sums in a single partial-aggregated rollup — adding a rung costs
    one counter, not another scan. Shares divide exact BIGINTs once.
    """
    late = _late_events(spark, sf_dir)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_events")] + [
        (
            F.sum(
                F.when(F.col("late_us") <= s * 1_000_000, 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1))
        ).alias(f"covered_{s}s")
        for s in WM_LADDER_S
    ]
    return late.groupBy("event_type").agg(*aggs).orderBy("event_type")
