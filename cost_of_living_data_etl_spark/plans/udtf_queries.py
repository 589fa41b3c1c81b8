"""Python UDTF (user-defined TABLE function) surface.

The reference's UDF surface is three scalar lambdas (reference
app.py:54,71,83,102); this engine's sanctioned custom-logic paths are
native expressions > pandas UDF (Arrow) > UDTF > mapPartitions, in
that order. This module covers the UDTF rung: a table function used
through a SQL LATERAL join, the Spark-4 API for one-row-to-many-rows
custom logic (the reference has nothing comparable — cited as absent,
SURVEY.md §2.6).

Scale note: a UDTF is row-at-a-time Python and belongs on SMALL or
pre-filtered inputs; the equivalent native plan (split + explode) is
what q_text_token_counts uses on the hot path. The oracle here proves
the UDTF's semantics are exactly the declarative ones, which is what
makes the two interchangeable.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from cost_of_living_data_etl_spark.plans.catalog import register
from cost_of_living_data_etl_spark.sources.tables import load_table


@register(
    "q_udtf_sentences",
    oracle=r"""
    WITH split AS (
        SELECT doc_id, unnest(string_split_regex(text, '[.!?]+')) AS raw
        FROM documents
    ),
    cleaned AS (
        SELECT doc_id, trim(raw, ' ' || chr(9) || chr(10) || chr(13)) AS sentence
        FROM split
    )
    SELECT
        doc_id,
        sentence,
        CAST(length(string_split_regex(sentence, '\s+')) AS INT) AS n_words
    FROM cleaned
    WHERE sentence <> ''
    """,
    tags=("udtf", "text", "lateral-join"),
)
def q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-split UDTF applied per document via LATERAL join.

    One input row → N output rows with a typed schema, the canonical
    UDTF shape. The DuckDB oracle re-expresses the same split
    declaratively, pinning the UDTF's semantics.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence: string, n_words: int")
    class SplitSentences:
        def eval(self, text: str):
            if text is None:
                return
            for raw in re.split(r"[.!?]+", text):
                s = raw.strip()
                if s:
                    yield s, len(s.split())

    spark.udtf.register("split_sentences", SplitSentences)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, s.sentence, s.n_words
        FROM documents_udtf d, LATERAL split_sentences(d.text) s
        """
    )
