"""Positive-path tests for the PII redaction operator on planted PII
(the fixture corpus is PII-free by construction, so the catalog query
only verifies zeros — these tests prove the detectors actually fire).
"""

import pyspark.sql.functions as F
import pytest

from cost_of_living_data_etl_spark.operators.pii import (
    PII_PATTERNS,
    redact_documents,
    redact_pii,
)


@pytest.fixture(scope="module")
def pii_df(spark):
    rows = [
        (1, "contact me at alice.smith+work@example.co.uk for details"),
        (2, "my ssn is 123-45-6789 thanks"),
        (3, "card 4111111111111111 expires soon"),
        (4, "call +1 (555) 123-4567 or 555-987-6543"),
        (5, "server at 192.168.0.1 is down"),
        (6, "no pii here at all"),
        (7, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_redact_pii_replaces_every_type(spark, pii_df):
    out = {
        r["doc_id"]: r["red"]
        for r in pii_df.select(
            "doc_id", redact_pii(F.col("text")).alias("red")
        ).collect()
    }
    assert out[1] == "contact me at <EMAIL> for details"
    assert out[2] == "my ssn is <SSN> thanks"
    assert out[3] == "card <CARD> expires soon"
    assert "<PHONE>" in out[4] and "555" not in out[4]
    assert out[5] == "server at <IP> is down"
    assert out[6] == "no pii here at all"
    assert out[7] == ""


def test_redact_documents_counts_and_total(spark, pii_df):
    out = {r["doc_id"]: r for r in redact_documents(pii_df).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_pii"] == 1
    assert out[2]["n_ssn"] == 1
    assert out[3]["n_card"] == 1
    assert out[4]["n_phone"] == 2 and out[4]["n_pii"] == 2
    assert out[5]["n_ipv4"] == 1
    assert out[6]["n_pii"] == 0
    # redacted text column replaces the original in place
    assert "<EMAIL>" in out[1]["text"]


def test_no_pii_rows_unchanged(spark, pii_df):
    clean = pii_df.filter(F.col("doc_id") >= 6)
    red = redact_documents(clean)
    assert [r["text"] for r in red.orderBy("doc_id").collect()] == [
        "no pii here at all",
        "",
    ]


def test_redaction_plan_is_native(spark, pii_df):
    """The whole scrub must stay in codegen: no Python eval nodes."""
    plan = redact_documents(pii_df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_card_not_double_counted_as_phone(spark):
    df = spark.createDataFrame([(1, "pay 4111111111111111 now")], ["doc_id", "text"])
    row = redact_documents(df).collect()[0]
    assert row["n_card"] == 1
    assert "<CARD>" in row["text"]
    assert "<PHONE>" not in row["text"]
