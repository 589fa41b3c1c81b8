"""Positive-path tests for the zero-on-fixture detectors.

The round-6 trivial-column census found several audit queries whose
violation counts are all zero on the driver fixtures (clean by
construction). Zero is the CORRECT fixture answer — but the oracle
gate then never exercises the detection predicates, so each detector
needs a planted-dirty fixture proving it fires (the winnowing lesson
applied to columns instead of rows).
"""

from __future__ import annotations

import datetime

from cost_of_living_data_etl_spark.plans.catalog import catalog

TS = datetime.datetime(2024, 6, 1, 12, 0)


def _write(spark, tmp_path, table, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/{table}.parquet"
    )


ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def test_data_contract_rules_each_fire(spark, tmp_path):
    """One dirty row per rule + one clean row; every per-rule counter
    reads exactly 1 and rows_in_violation counts DISTINCT dirty rows
    (the double-violation row counts once)."""
    rows = [
        (1, 10, "O", 100.0, TS, "1-URGENT"),  # clean
        (None, 10, "O", 100.0, TS, "1-URGENT"),  # null key
        (3, 10, "O", -5.0, TS, "1-URGENT"),  # bad price
        (4, 10, "O", 100.0, datetime.datetime(1970, 1, 1), "1-URGENT"),  # date
        (5, 10, "X", 100.0, TS, "1-URGENT"),  # bad enum
        (6, 10, None, 100.0, TS, "1-URGENT"),  # NULL enum (review catch:
        #   NULL NOT IN (...) is NULL — must still flag)
        (7, 10, "O", 100.0, TS, "  "),  # blank priority
        (8, 10, "X", -1.0, TS, "1-URGENT"),  # double violation, one row
    ]
    _write(spark, tmp_path, "orders", rows, ORDERS_SCHEMA)
    r = catalog()["q_data_contract_violations"].fn(spark, str(tmp_path)).collect()[0]
    assert r["n_rows"] == 8
    assert r["null_key"] == 1
    assert r["bad_price"] == 2  # -5.0 and the double-violation -1.0
    assert r["bad_date"] == 1
    assert r["bad_status"] == 3  # 'X', NULL, and the double-violation 'X'
    assert r["bad_priority"] == 1
    assert r["rows_in_violation"] == 7  # all but the clean row


def test_dq_violations_each_check_fires(spark, tmp_path):
    """Referential orphans, PK duplicates, domain violations: every
    check in the star-schema report reads its planted count."""
    _write(
        spark,
        tmp_path,
        "customer",
        [(10, "c", 1, 0.0, "SEG")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    orders = [
        (1, 10, "O", 100.0, TS, "1-URGENT"),
        (1, 10, "O", 100.0, TS, "1-URGENT"),  # duplicate o_orderkey
        (2, None, "O", 100.0, TS, "1-URGENT"),  # null custkey
        (3, 99, "O", -1.0, TS, "1-URGENT"),  # orphan custkey + bad price
    ]
    _write(spark, tmp_path, "orders", orders, ORDERS_SCHEMA)
    _write(
        spark,
        tmp_path,
        "lineitem",
        [
            (1, 1, 1, 1, 1.0, 10.0, 0.05, 0.0, "N", "O", TS),
            (77, 1, 1, 1, 1.0, 10.0, 1.5, 0.0, "N", "O", TS),  # orphan + bad disc
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    got = {
        r["check_name"]: r["n_violations"]
        for r in catalog()["q_dq_violations_report"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {
        "orders_null_custkey": 1,
        "orders_nonpositive_price": 1,
        "orders_dup_orderkey": 1,
        # both the custkey-99 miss AND the null custkey join nothing:
        # a null FK is an orphan too under the anti-join definition
        "orders_orphan_custkey": 2,
        "lineitem_orphan_orderkey": 1,
        "lineitem_discount_range": 1,
    }, got


def test_pii_scan_counts_planted_documents(spark, tmp_path):
    """The scan query's per-source counters fire on planted PII (the
    regexes are also exercised by the redaction tests; this pins the
    QUERY wiring — grouping, flag-once-per-doc, zero on clean)."""
    docs = [
        (1, "contact me at alice@example.com or bob@test.org", "en", "A", 0),
        (2, "ssn is 123-45-6789 ok", "en", "A", 0),
        (3, "server at 10.1.2.3 responded", "en", "B", 0),
        (4, "perfectly clean text here", "en", "B", 0),
    ]
    docs = [(i, t, lang, s, len(t)) for i, t, lang, s, _ in docs]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["source"]: (r["n_docs"], r["n_email_docs"], r["n_ssn_docs"], r["n_ip_docs"])
        for r in catalog()["q_pii_scan_stats"].fn(spark, str(tmp_path)).collect()
    }
    assert got["A"] == (2, 1, 1, 0)  # doc 1 counts ONCE despite 2 emails
    assert got["B"] == (2, 0, 0, 1)
