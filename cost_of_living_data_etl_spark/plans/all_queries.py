"""Import every query-defining module so catalog registration runs."""

from cost_of_living_data_etl_spark.operators import (  # noqa: F401
    decontam,
    pii,
    dedup,
    multimodal,
    similarity,
    sketches,
    textstats,
)
from cost_of_living_data_etl_spark.plans import (  # noqa: F401
    # round4 imports FIRST: its queries are this round's verdict
    # done-criteria (ANN-fed mutual-NN, decimal money mode) and must
    # take the first unverified-sample slots — see round4.py docstring
    round4,
    advanced_joins,
    aggregates,
    cdc,
    corpus_prep,
    etl_shaped,
    events_queries,
    feature_prep,
    incremental,
    joins_setops,
    layout,
    relational,
    reshape,
    scalar_queries,
    sql_interface,
    tpch_suite,
    udtf_queries,
    windows,
    # keep NEW modules LAST: registration order feeds the driver's
    # unverified-first sampling — new queries must sort after the
    # already-pending ones so they never displace them from the
    # per-round verification sample
    analytics_extra,
    customer_analytics,
    stats_analytics,
    behavior_analytics,
    ops_analytics,
    mllite,
    structural,
    inference,
    mining,
    hygiene,
    survival_trend,
    spectral,
    rank_stats,
    spatial,
    forecast,
    curation,
    round4_stats,
    # round5 LAST: its 13 queries take the sample slots AFTER the 37
    # still-pending round-3/4 rows (37 + 13 = the driver's 50-sample)
    round5,
    attribution_markov,
    data_shapley,
    sequence_patterns,
    ts_features,
    raking,
    causal_obs,
    record_linkage,
    ab_guardrails,
    # round6: 10 + 4 queries, capped so 36 pending + 14 new = 50
    # = the driver's sample — round 6's sample closed the catalog
    round6,
    round6b,
    # round7 LAST: the catalog enters round 7 fully verified, so the
    # driver's 50-sample starts with these new names
    round7,
    # round8: 8 new names; the r08 sample must also absorb the 16
    # fingerprint-invalidated round-7 rewrites (verification.py), so
    # additions stay well under the ~50-name window
    round8,
    # round9: 4 new names; the catalog enters round 9 with 308/309
    # fingerprint-current, so the sample re-confirms old names too
    round9,
    # round9b: 3 lakehouse table-ops names (compaction planner,
    # skipping audit, delete-cascade pre-flight); together with the 23
    # names the round-9 type-aware bucket guard re-fingerprinted this
    # keeps the churn under the ~50-name sample window
    round9b,
)
