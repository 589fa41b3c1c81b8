"""Semantic tests for the round-6 late additions (plans/round6b.py).

The oracle gate proves Spark ↔ DuckDB agreement; these pin INTENT on
constructed fixtures — the cases where a plausible-but-wrong
implementation would still agree with a plausible-but-wrong oracle.
"""

from __future__ import annotations

import math

from cost_of_living_data_etl_spark.plans.catalog import catalog


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")


def _write_embeddings(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")


def test_mmr_prefers_diverse_over_clone(spark, tmp_path):
    """Pure-relevance top-k would rank the exact clone of the best hit
    second; MMR must rank the equally-relevant-but-diverse vector
    second and push the clone to third.

    Geometry (unit 2-d vectors): query = [1,0]; v1 = [.9,.436] and
    v3 = [.9,-.436] tie on relevance 0.9 (tie-break picks v1);
    v2 = clone of v1. Step-2 scores: clone .7·.9 − .3·1.0 = .33 vs
    diverse .7·.9 − .3·sim(v3,v1)=.7·.9 − .3·.62 ≈ .444 → diverse
    wins. Step 3: the clone (.33) beats the orthogonal fillers
    (rel 0, score < 0)."""
    y = 0.43589  # sqrt(1 - 0.9^2) to float precision
    _write_embeddings(
        spark,
        tmp_path,
        [
            (0, [1.0, 0.0], 0),  # query
            (1, [0.9, y], 0),
            (2, [0.9, y], 0),  # exact clone of 1
            (3, [0.9, -y], 0),  # equally relevant, diverse
            (4, [0.0, 1.0], 0),
            (5, [0.0, -1.0], 0),
        ],
    )
    rows = (
        catalog()["q_mmr_diversified_topk"]
        .fn(spark, str(tmp_path))
        .orderBy("sel_rank")
        .collect()
    )
    order = [r["vec_id"] for r in rows]
    assert order[0] == 1, order  # tie with 3 broken by vec_id
    assert order[1] == 3, order  # diversity beats the clone
    assert order[2] == 2, order  # clone only after the diverse pick
    assert len(order) == 5
    # relevance column carries the raw cosine, not the MMR score
    assert math.isclose(rows[0]["relevance"], 0.9, rel_tol=1e-4)
    assert math.isclose(rows[0]["mmr_score"], 0.7 * rows[0]["relevance"], rel_tol=1e-12)


def test_distinct_ngram_diversity_hand_counts(spark, tmp_path):
    """Two identical 4-word docs in A: corpus totals double, distincts
    don't — the cross-doc sameness this metric exists to expose. A
    2-word doc has no trigrams: the (B, 3) group is absent, not 0."""
    _write_docs(
        spark,
        tmp_path,
        [
            (1, "a b a b", "en", "A", 7),
            (2, "a b a b", "en", "A", 7),
            (3, "x y", "en", "B", 3),
        ],
    )
    got = {
        (r["source"], r["n"]): (
            r["total_ngrams"],
            r["distinct_ngrams"],
            r["distinct_ratio"],
        )
        for r in catalog()["q_distinct_ngram_diversity"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got[("A", 1)] == (8, 2, 0.25)
    assert got[("A", 2)] == (6, 2, 2 / 6)
    assert got[("A", 3)] == (4, 2, 0.5)
    assert got[("B", 1)] == (2, 2, 1.0)
    assert got[("B", 2)] == (1, 1, 1.0)
    assert ("B", 3) not in got


def test_padding_waste_bucket_boundaries(spark, tmp_path):
    """Power-of-2 caps are exact at the boundaries: 4 tokens stays in
    the 4-bucket (not 8), 5 rolls to 8, 8 stays in 8, 9 rolls to 16."""
    docs = [
        (i, " ".join(["w"] * n), "en", "S", 2 * n)
        for i, n in enumerate([1, 2, 3, 4, 5, 8, 9])
    ]
    _write_docs(spark, tmp_path, docs)
    got = {
        r["bucket_cap"]: (r["n_docs"], r["padding_tokens"], r["waste_frac"])
        for r in catalog()["q_padding_waste_buckets"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got[1] == (1, 0, 0.0)
    assert got[2] == (1, 0, 0.0)
    assert got[4] == (2, 1, 1 / 8)  # tokens 3 + 4 in two 4-slots
    assert got[8] == (2, 3, 3 / 16)  # tokens 5 + 8 in two 8-slots
    assert got[16] == (1, 7, 7 / 16)  # token 9 in one 16-slot
    assert set(got) == {1, 2, 4, 8, 16}


def test_jsd_identical_zero_disjoint_absent_known_value(spark, tmp_path):
    """JSD is 0 for identical distributions, the row is absent for
    fully disjoint vocabularies (JSD exactly 1 by convention), and the
    (2/3,1/3) vs (1/3,2/3) pair hits the closed form 1 − H(2/3) ≈
    0.08170."""
    _write_docs(
        spark,
        tmp_path,
        [
            (1, "a a b", "en", "A", 5),
            (2, "a b b", "en", "B", 5),
            (3, "a b a a b b", "en", "C", 11),  # same dist as uniform AB mix
            (4, "a a b a a b", "en", "D", 11),  # identical dist to A
            (5, "q r s", "en", "Z", 5),  # disjoint from everyone
        ],
    )
    rows = catalog()["q_source_unigram_jsd"].fn(spark, str(tmp_path)).collect()
    got = {(r["source_a"], r["source_b"]): r["jsd_bits"] for r in rows}
    # identical distributions -> 0 exactly (every term is p*log2(1/2)+p*log2(1/2) summed to -2)
    assert math.isclose(got[("A", "D")], 0.0, abs_tol=1e-12)
    # closed form: 1 - H(2/3,1/3)
    h = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert math.isclose(got[("A", "B")], 1 - h, rel_tol=1e-9)
    # disjoint vocabulary: no shared words -> pair omitted (JSD = 1)
    assert not any("Z" in k for k in got), got
    # symmetry of the construction: (A,B) == (B-like pairs via C)
    assert all(0.0 <= v <= 1.0 + 1e-12 for v in got.values())


def test_empty_docs_are_no_phantom_tokens(spark, tmp_path):
    """split(trim(''), '\\s+') yields [''] on both engines; the ''
    token must NOT become a shared word (JSD) or an n-gram
    (diversity). Two vocabulary-disjoint sources each holding an
    empty doc stay disjoint — no JSD row — and the empty docs add
    zero n-grams."""
    _write_docs(
        spark,
        tmp_path,
        [
            (1, "a b", "en", "A", 3),
            (2, "", "en", "A", 0),
            (3, "x y", "en", "B", 3),
            (4, "   ", "en", "B", 3),
        ],
    )
    jsd = catalog()["q_source_unigram_jsd"].fn(spark, str(tmp_path)).collect()
    assert jsd == [], jsd  # disjoint sources share nothing, '' included
    div = {
        (r["source"], r["n"]): r["total_ngrams"]
        for r in catalog()["q_distinct_ngram_diversity"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert div[("A", 1)] == 2  # just "a b"; the empty doc adds nothing
    assert div[("B", 1)] == 2
    assert ("A", 3) not in div and ("B", 3) not in div


def test_jsd_shared_word_count(spark, tmp_path):
    """n_shared_words counts the vocabulary INTERSECTION, not tokens."""
    _write_docs(
        spark,
        tmp_path,
        [
            (1, "a a a b c", "en", "A", 9),
            (2, "a b b d", "en", "B", 7),
        ],
    )
    r = catalog()["q_source_unigram_jsd"].fn(spark, str(tmp_path)).collect()[0]
    assert (r["source_a"], r["source_b"]) == ("A", "B")
    assert r["n_shared_words"] == 2  # {a, b}; c and d are unshared
