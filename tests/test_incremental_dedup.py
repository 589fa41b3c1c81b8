"""Incremental dedup against a PERSISTED signature table.

q_dedup_incremental_batch's scale contract says the daily run reads
the historical corpus's minhash signatures from warehouse parquet and
never re-reads corpus text. These tests make that claim concrete: the
corpus half of the signature frame round-trips through parquet, the
new batch is signed fresh, and the mined pair set is identical to the
all-in-memory run.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from cost_of_living_data_etl_spark.operators.dedup import (
    NEW_BATCH_MOD,
    minhash_signatures,
    neardup_pairs_from_sigs,
)
from cost_of_living_data_etl_spark.sources.tables import load_table

from conftest import TESTDATA

SF = f"{TESTDATA}/sf0.01"


def _pairs(df):
    return {(r["doc_id_1"], r["doc_id_2"]) for r in df.collect()}


def test_incremental_pairs_from_parquet_signature_table(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    is_new = F.col("doc_id") % NEW_BATCH_MOD == 0

    # nightly state: corpus signatures persisted to the warehouse
    corpus_sigs = minhash_signatures(docs.filter(~is_new))
    corpus_sigs.write.mode("overwrite").parquet(str(tmp_path / "minhash_signatures"))

    # daily run: sign ONLY the new batch, union with the stored table
    stored = spark.read.parquet(str(tmp_path / "minhash_signatures"))
    batch_sigs = minhash_signatures(docs.filter(is_new))
    mh = stored.withColumn("is_new", F.lit(False)).unionByName(
        batch_sigs.withColumn("is_new", F.lit(True))
    )
    incremental = _pairs(neardup_pairs_from_sigs(mh, touching_only="is_new"))

    # reference: the all-in-memory catalog plan
    all_mem = minhash_signatures(docs).withColumn("is_new", is_new)
    expected = _pairs(neardup_pairs_from_sigs(all_mem, touching_only="is_new"))

    assert incremental == expected and len(expected) > 0


def test_signature_table_is_slim(spark, tmp_path):
    """The persisted frame must carry hashes only — storing text would
    silently reintroduce the corpus re-read the design forbids."""
    docs = load_table(spark, SF, "documents")
    sigs = minhash_signatures(docs)
    assert "text" not in sigs.columns
    assert {"doc_id", "hset"} <= set(sigs.columns)
    assert any(c.startswith("mh") for c in sigs.columns)
