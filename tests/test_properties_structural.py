"""Property-based checks for the structural/survival families
(SURVEY.md §5.4 discipline): adversarial inputs via hypothesis, the
REAL catalog query on one side, an independent Python reference on the
other. Spark jobs are slow → few examples, no deadline.
"""

from __future__ import annotations

import datetime
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

BASE = datetime.datetime(2024, 1, 1)

# small vocab forces shingle overlap between docs
_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"])
_doc = st.lists(_word, min_size=1, max_size=12).map(" ".join)


def _shingles(text: str) -> frozenset:
    ws = text.strip().split()
    if len(ws) < 3:
        return frozenset([text.strip()])
    return frozenset(" ".join(ws[i : i + 3]) for i in range(len(ws) - 2))


@settings(**_SETTINGS)
@given(st.lists(_doc, min_size=2, max_size=12))
def test_setsim_prefix_join_equals_bruteforce(spark, tmp_path_factory, texts):
    """The prefix-filter cascade (global rarest-first order + size +
    positional filters) must be LOSSLESS: for any corpus, the join's
    pair set and Jaccard values equal the brute-force all-pairs
    computation over the same shingle definition."""
    from cost_of_living_data_etl_spark.plans.structural import (
        SETSIM_T,
        q_setsim_prefix_join,
    )

    path = tmp_path_factory.mktemp("setsim")
    spark.createDataFrame(
        [(i, t, "en", "t", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")

    want = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a, b = _shingles(texts[i]), _shingles(texts[j])
            jac = len(a & b) / len(a | b)
            if jac >= SETSIM_T:
                want[(i, j)] = jac

    got = {
        (r["doc_id_1"], r["doc_id_2"]): r["jaccard"]
        for r in q_setsim_prefix_join(spark, str(path)).collect()
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert math.isclose(got[k], v, rel_tol=0, abs_tol=0)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # user
            st.integers(min_value=0, max_value=2000),  # ts seconds
        ),
        min_size=1,
        max_size=40,
    )
)
def test_interval_islands_equal_python_union(spark, tmp_path_factory, evs):
    """Island count and covered time equal a brute-force interval
    union per user for any event pattern (duplicates, bursts, gaps)."""
    from cost_of_living_data_etl_spark.plans.structural import (
        IDLE_GAP_US,
        q_interval_merge_islands,
    )

    path = tmp_path_factory.mktemp("islands")
    spark.createDataFrame(
        [
            (i, BASE + datetime.timedelta(seconds=s), u, "view", 1.0, "{}")
            for i, (u, s) in enumerate(evs)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")

    gap_s = IDLE_GAP_US // 1_000_000
    want = {}
    by_user: dict[int, list[int]] = {}
    for u, s in evs:
        by_user.setdefault(u, []).append(s)
    for u, starts in by_user.items():
        islands = []
        for s in sorted(starts):
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], s + gap_s)
            else:
                islands.append([s, s + gap_s])
        want[u] = (
            len(islands),
            sum((e - s) for s, e in islands) * 1_000_000,
        )

    got = {
        r["user_id"]: (r["n_islands"], r["covered_us"])
        for r in q_interval_merge_islands(spark, str(path)).collect()
    }
    assert got == want


@settings(**_SETTINGS)
@given(st.integers(min_value=1, max_value=60))
def test_hierarchy_rollup_matches_walk_any_size(spark, tmp_path_factory, n):
    """Pointer doubling equals a Python parent walk for any forest
    size (roots only, shallow, deep)."""
    from cost_of_living_data_etl_spark.plans.structural import (
        HIER_ROOTS,
        q_hierarchy_rollup,
    )

    path = tmp_path_factory.mktemp("hier")
    spark.createDataFrame(
        [(k, f"s{k}", 0, float(k)) for k in range(n)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).write.mode("overwrite").parquet(f"{path}/supplier.parquet")

    import collections

    agg = collections.defaultdict(lambda: [0, 0, 0.0])
    for k in range(n):
        node, depth = k, 0
        while node >= HIER_ROOTS:
            node = (node - HIER_ROOTS) // 2
            depth += 1
        agg[node][0] += 1
        agg[node][1] = max(agg[node][1], depth)
        agg[node][2] += float(k)
    got = {
        r["root"]: (r["n_nodes"], r["max_depth"], r["acctbal_total"])
        for r in q_hierarchy_rollup(spark, str(path)).collect()
    }
    assert got == {r: (c, d, b) for r, (c, d, b) in agg.items()}


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "N", "R"]),
            st.integers(min_value=1, max_value=20),  # price (whole units)
            st.integers(min_value=1, max_value=9),  # quantity weight
        ),
        min_size=1,
        max_size=40,
    )
)
def test_weighted_median_crossing_property(spark, tmp_path_factory, rows):
    """The weighted median is the smallest price whose cumulative
    weight reaches half the group total — checked against a direct
    Python computation for any (flag, price, weight) multiset."""
    from cost_of_living_data_etl_spark.plans.structural import (
        q_weighted_median_price,
    )

    path = tmp_path_factory.mktemp("wmed")
    d = BASE
    spark.createDataFrame(
        [
            (i, 1, 1, 1, float(w), float(p), 0.0, 0.0, f, "F", d)
            for i, (f, p, w) in enumerate(rows)
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")

    want = {}
    groups: dict[str, dict[int, int]] = {}
    for f, p, w in rows:
        groups.setdefault(f, {}).setdefault(p, 0)
        groups[f][p] += w
    for f, pw in groups.items():
        tot = sum(pw.values())
        cum = 0
        for p in sorted(pw):
            cum += pw[p]
            if 2 * cum >= tot:
                want[f] = (float(p), float(tot))
                break
    got = {
        r["l_returnflag"]: (r["w_median_price"], r["total_weight"])
        for r in q_weighted_median_price(spark, str(path)).collect()
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),  # first-event day
            st.one_of(
                st.none(), st.integers(min_value=0, max_value=6)
            ),  # purchase offset (days after first) or censored
        ),
        min_size=1,
        max_size=12,
    )
)
def test_km_curve_matches_python_reference(spark, tmp_path_factory, users):
    """Kaplan-Meier risk sets and survival values match a direct
    Python implementation for any censoring pattern. The global censor
    horizon is pinned by an extra all-observed sentinel user so the
    reference's tmax is stable."""
    from cost_of_living_data_etl_spark.plans.survival_trend import (
        q_km_survival_conversion,
    )

    path = tmp_path_factory.mktemp("km")
    rows = []
    eid = 0
    HORIZON = 20
    # sentinel user 999: defines tmax = day 20, converts at day 0
    rows.append((eid, BASE + datetime.timedelta(days=HORIZON), 999, "purchase", 1.0, "{}"))
    eid += 1
    durs = []  # (duration_days, observed)
    for uid, (d0, poff) in enumerate(users):
        rows.append(
            (eid, BASE + datetime.timedelta(days=d0), uid, "view", 1.0, "{}")
        )
        eid += 1
        if poff is not None:
            rows.append(
                (
                    eid,
                    BASE + datetime.timedelta(days=d0 + poff),
                    uid,
                    "purchase",
                    1.0,
                    "{}",
                )
            )
            eid += 1
            durs.append((poff, True))
        else:
            durs.append((HORIZON - d0, False))
    durs.append((0, True))  # the sentinel converts at duration 0
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")

    # Python KM
    times = sorted({t for t, _ in durs})
    at_risk = len(durs)
    surv = 1.0
    want = []
    for t in times:
        d = sum(1 for tt, ev in durs if tt == t and ev)
        c = sum(1 for tt, ev in durs if tt == t and not ev)
        if d > 0:
            surv *= 1.0 - d / at_risk
            want.append((t, at_risk, d, surv))
        at_risk -= d + c

    got = [
        (r["t_day"], r["n_risk"], r["d_events"], r["survival"])
        for r in q_km_survival_conversion(spark, str(path)).collect()
    ]
    assert [(t, n, d) for t, n, d, _ in got] == [
        (t, n, d) for t, n, d, _ in want
    ]
    for (_, _, _, sg), (_, _, _, sw) in zip(got, want):
        assert math.isclose(sg, sw, rel_tol=1e-12)
