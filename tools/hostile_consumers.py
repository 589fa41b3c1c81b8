"""Hostile-skew proof, pair-CONSUMER edition (round-6 verdict item 6).

tests/test_lsh_skew_guard.py proves the `max_bucket` cap at the MINER:
a boilerplate family of b identical docs otherwise emits b²/2
candidate pairs. This script runs the 50k-doc hostile corpus (sf1.0
grain: one family holding 10% of the corpus + organic twins) through
the downstream pair CONSUMERS and records what the capped pair set
buys them:

- q_dedup_clusters / q_pagerank_neardup_graph consume the MinHash-LSH
  pair plan → measured with `max_bucket=None` vs `max_bucket=50`
  (patched through the module global both consumers call);
- q_dedup_threshold_curve consumes the exact PPJoin pair set → its
  skew guard is `setsim_pairs(max_prefix_df=...)` (tokens too common
  to be discriminative never generate candidates), measured None vs 50.

Results go to SCALE.md §"hostile fixture through the pair consumers".

    python tools/hostile_consumers.py [n_docs] [boiler_frac]
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from cost_of_living_data_etl_spark.operators import dedup  # noqa: E402
from cost_of_living_data_etl_spark.plans import structural  # noqa: E402
from cost_of_living_data_etl_spark.session import get_spark  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
BOILER_FRAC = float(sys.argv[2]) if len(sys.argv) > 2 else 0.10
N_TWIN_PAIRS = 10
CAP = 50

_BOILER_TEXT = " ".join(f"standard legal footer clause {i}" for i in range(10))


def build_hostile_sf(spark, out_dir: str) -> str:
    """Write the hostile documents table in the fixture layout
    (documents.parquet with the columns the consumers read)."""
    n_boiler = int(N_DOCS * BOILER_FRAC)
    rows = [(i, _BOILER_TEXT) for i in range(n_boiler)]
    base_org = n_boiler
    n_org = N_DOCS - n_boiler - 2 * N_TWIN_PAIRS
    rows += [
        (base_org + i, " ".join(f"w{base_org + i}x{j}" for j in range(30)))
        for i in range(n_org)
    ]
    base = N_DOCS - 2 * N_TWIN_PAIRS
    for p in range(N_TWIN_PAIRS):
        text = " ".join(f"twin{p}tok{j}" for j in range(30))
        rows.append((base + 2 * p, text))
        rows.append((base + 2 * p + 1, text))
    (
        spark.createDataFrame(rows, "doc_id long, text string")
        .select(
            "doc_id",
            "text",
            F.lit("hostile").alias("source"),
            F.lit("en").alias("lang"),
            F.length("text").cast("long").alias("n_chars"),
        )
        .coalesce(8)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/documents.parquet")
    )
    return out_dir


def timed(fn, *args):
    t0 = time.perf_counter()
    n = fn(*args).count()
    return round(time.perf_counter() - t0, 2), n


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    sf = build_hostile_sf(spark, "/tmp/hostile_sf")
    results: dict[str, dict] = {}

    orig_mh = dedup.minhash_pair_plan
    orig_ss = structural.q_setsim_prefix_join

    def run(mode: str, max_bucket, max_prefix_df):
        dedup.minhash_pair_plan = functools.partial(
            orig_mh, max_bucket=max_bucket
        )
        structural.q_setsim_prefix_join = lambda s, d: structural.setsim_pairs(
            structural.load_table(s, d, "documents"),
            max_prefix_df=max_prefix_df,
        )
        try:
            for qname, fn in [
                ("q_dedup_clusters", dedup.q_dedup_clusters),
                ("q_pagerank_neardup_graph", dedup.q_pagerank_neardup_graph),
                (
                    "q_dedup_threshold_curve",
                    structural.q_dedup_threshold_curve,
                ),
            ]:
                secs, rows = timed(fn, spark, sf)
                results.setdefault(qname, {})[mode] = {
                    "sec": secs,
                    "rows": rows,
                }
                print(f"{qname} [{mode}]: {secs}s, {rows} rows", flush=True)
        finally:
            dedup.minhash_pair_plan = orig_mh
            structural.q_setsim_prefix_join = orig_ss

    # capped first (bounded by construction); uncapped second so a
    # runaway uncapped run still leaves the capped numbers on screen
    run("capped", CAP, CAP)
    run("uncapped", None, None)
    print(json.dumps({"n_docs": N_DOCS, "boiler_frac": BOILER_FRAC, "results": results}))


if __name__ == "__main__":
    main()
