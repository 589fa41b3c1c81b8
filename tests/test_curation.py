"""Semantic regression tests for the curation / tokenizer / semantic-
dedup family — independent Python references and degenerate cases the
shared-spec oracle gate can't distinguish (both engines could be wrong
the same way; these compare against collections.Counter math instead).
"""

from __future__ import annotations

import math
from collections import Counter

from cost_of_living_data_etl_spark.operators.similarity import (
    SEMDEDUP_TAU,
    q_semdedup_cluster_prune,
)
from cost_of_living_data_etl_spark.plans.curation import (
    GOPHER_MIN_MEAN_WORD_LEN,
    GOPHER_MIN_WORDS,
    q_bpe_merge_candidates,
    q_char_trigram_entropy,
    q_dsir_importance_topk,
    q_gopher_quality_rules,
)

_DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, (t, lang, src) in enumerate(rows)],
        _DOCS_SCHEMA,
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")


def _py_trigram_entropy(text: str) -> float:
    grams = [text[i : i + 3] for i in range(len(text) - 2)]
    n = len(grams)
    cnt = Counter(grams)
    return math.log(n) - sum(c * math.log(c) for c in cnt.values()) / n


def test_entropy_matches_python_counter(spark, tmp_path):
    """H for constant, mixed, and all-distinct texts equals the
    Counter reference; the constant text is exactly 0.0 (all runs in
    one gram), the all-distinct text is exactly ln n."""
    texts = [
        "aaaaaaaaaa",  # one distinct trigram -> H = 0
        "abcdefghij",  # all trigrams distinct -> H = ln 8
        "abababababcdcdcdcd",
        "the quick brown fox jumps over the lazy dog",
    ]
    _write_docs(spark, tmp_path, [(t, "en", "s") for t in texts])
    row = q_char_trigram_entropy(spark, str(tmp_path)).collect()[0]
    want = [_py_trigram_entropy(t) for t in texts]
    assert row["n_docs"] == len(texts)
    assert math.isclose(row["min_entropy"], min(want), rel_tol=1e-12, abs_tol=1e-12)
    assert math.isclose(row["max_entropy"], max(want), rel_tol=1e-12)
    assert math.isclose(
        row["avg_entropy"], sum(want) / len(want), rel_tol=1e-12
    )
    assert min(want) == 0.0  # the constant doc pins the degenerate case
    assert math.isclose(want[1], math.log(8), rel_tol=1e-12)  # all-distinct doc


def test_entropy_skips_docs_shorter_than_one_trigram(spark, tmp_path):
    _write_docs(
        spark, tmp_path, [("ab", "en", "s"), ("", "en", "s"), ("abcd", "en", "s")]
    )
    rows = q_char_trigram_entropy(spark, str(tmp_path)).collect()
    assert len(rows) == 1 and rows[0]["n_docs"] == 1


def test_gopher_rules_fire_individually(spark, tmp_path):
    """One doc engineered per rule, each failing EXACTLY its own rule
    (symbol chars ride inside alpha words so the symbol doc keeps its
    word length, alpha fraction, and stopword intact), and the clean
    doc passes all five."""
    the = "the "  # supplies the stopword + sane word length
    clean = (the * GOPHER_MIN_WORDS).strip()  # 50 words, mwl 3, alpha ok
    short = "the cat"  # < 50 words
    longwords = ("the " + "abcdefghijklmnop " * 60).strip()  # mwl > 10
    # 44 clean 'the' + 6 'the####': 24 '#' / 50 words = 0.48 > 0.1,
    # mwl (44*3 + 6*7)/50 = 3.48 in [3, 10], every word has alpha
    symbols = (the * 44 + "the#### " * 6).strip()
    nonalpha = (the + "123 " * 99).strip()  # 99% digit words
    nostop = ("zzz " * GOPHER_MIN_WORDS).strip()  # no 'the'
    _write_docs(
        spark,
        tmp_path,
        [(t, "en", "s") for t in (clean, short, longwords, symbols, nonalpha, nostop)],
    )
    r = q_gopher_quality_rules(spark, str(tmp_path)).collect()[0]
    assert r["n_docs"] == 6
    assert r["n_fail_word_count"] == 1  # short
    assert r["n_fail_word_length"] == 1  # longwords
    assert r["n_fail_symbol_ratio"] == 1  # symbols
    assert r["n_fail_alpha_words"] == 1  # nonalpha
    assert r["n_fail_stopwords"] == 1  # nostop
    assert r["n_pass"] == 1  # clean only


def _py_gopher_pass(text: str) -> bool:
    ws = text.split()
    n = len(ws)
    if n == 0:
        return False
    mwl = sum(len(w) for w in ws) / n
    sym = (text.count("#") + text.count("...")) / n
    alpha = sum(1 for w in ws if any(ch.isalpha() for ch in w)) / n
    stop = sum(1 for s in ("the", "be", "to", "of", "and", "that", "have", "with")
               if s in [w.lower() for w in ws])
    return (
        GOPHER_MIN_WORDS <= n <= 100_000
        and GOPHER_MIN_MEAN_WORD_LEN <= mwl <= 10.0
        and sym <= 0.1
        and alpha >= 0.8
        and stop >= 1
    )


def test_gopher_pass_count_matches_python_reference(spark, tmp_path):
    texts = [
        ("the " * 60).strip(),
        ("the cat sat"),
        ("the " + "abcdefghijklmnop " * 60).strip(),
        (("the " * 60).strip() + " " + "# " * 20),
        ("the " + "123 " * 99).strip(),
        ("zzz " * 60).strip(),
        ("of and that " * 25).strip(),
    ]
    _write_docs(spark, tmp_path, [(t, "en", "s") for t in texts])
    r = q_gopher_quality_rules(spark, str(tmp_path)).collect()[0]
    want_pass = sum(1 for t in texts if _py_gopher_pass(t))
    assert r["n_pass"] == want_pass
    assert math.isclose(r["retention"], want_pass / len(texts), rel_tol=1e-12)


def test_bpe_counts_match_python_counter(spark, tmp_path):
    """Pair counts = Σ over the frequency-weighted word vocabulary of
    adjacent character pairs — checked against a Counter reference,
    including the repeated-word weighting and the repeated-pair-within-
    word case ('banana' contributes 'an' twice per occurrence)."""
    texts = [
        "banana banana split",
        "the theme of the thesis",
        "aa aa aa b",
    ]
    _write_docs(spark, tmp_path, [(t, "en", "s") for t in texts])
    import re

    vocab = Counter(
        w for t in texts for w in re.findall(r"[a-z0-9]+", t.lower())
    )
    want = Counter()
    for w, f in vocab.items():
        for i in range(len(w) - 1):
            want[w[i : i + 2]] += f
    got = {
        r["pair"]: r["merge_count"]
        for r in q_bpe_merge_candidates(spark, str(tmp_path)).collect()
    }
    top = dict(
        sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[: len(got)]
    )
    assert got == top
    assert want["an"] == 2 * 2  # 'banana' freq 2, pair 'an' twice per word


def test_dsir_targetlike_docs_outrank_rawlike(spark, tmp_path):
    """Docs whose bigrams match the lang-'en' (target) profile must
    carry strictly higher importance weight than docs made of
    raw-only bigrams — the defining DSIR property."""
    target_text = "alpha beta alpha beta alpha beta"
    raw_text = "gamma delta gamma delta gamma delta"
    rows = (
        [(target_text, "en", "s")] * 3
        + [(raw_text, "de", "s")] * 3
        + [(target_text, "xx", "s"), (raw_text, "xx", "s")]
    )
    _write_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: r["weight"]
        for r in q_dsir_importance_topk(spark, str(tmp_path)).collect()
    }
    # doc 6 is target-like, doc 7 raw-like (both lang 'xx')
    assert got[6] > got[7]


def test_semdedup_removes_exact_twin_keeps_singletons(spark, tmp_path):
    """8 one-hot seed vectors (the deterministic Lloyd init) plus an
    exact copy of vector 0: the copy pair is the only τ-similar pair,
    so exactly ONE vector is removed corpus-wide, and the removed one
    is the HIGHER vec_id (equal centroid cosine ties break to keep
    the smaller id)."""
    dims = 8
    rows = []
    for i in range(dims):
        v = [0.0] * dims
        v[i] = 1.0
        rows.append((i, v, i))
    rows.append((8, [1.0] + [0.0] * (dims - 1), 0))  # twin of vec 0
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    got = q_semdedup_cluster_prune(spark, str(tmp_path)).collect()
    assert sum(r["n_vectors"] for r in got) == 9
    assert sum(r["n_removed"] for r in got) == 1
    twin_cell = [r for r in got if r["n_vectors"] == 2]
    assert len(twin_cell) == 1 and twin_cell[0]["n_kept"] == 1
    assert SEMDEDUP_TAU < 1.0  # the twin pair (cos = 1.0) must qualify


def test_encoding_audit_fires_each_rule_once(spark, tmp_path):
    """One dirty doc per rule + one clean doc, all in one source: each
    counter reads exactly 1, n_any counts distinct dirty DOCS (the
    double-dirty doc counts once), and a clean source stays all-zero."""
    from cost_of_living_data_etl_spark.plans.curation import (
        q_encoding_anomaly_audit,
    )

    rows = [
        ("binary leak \x07 here", "en", "dirty"),
        ("lossy decode � mark", "en", "dirty"),
        ("residual &nbsp; entity", "en", "dirty"),
        ("unstripped <div> tag", "en", "dirty"),
        ("curly quote mojibake â€™s", "en", "dirty"),
        # entity AND tag in one doc: rule counters both increment,
        # n_any counts the DOC once
        ("double &amp; <p> trouble", "en", "dirty"),
        ("perfectly clean prose", "en", "dirty"),
        ("clean in its own source", "en", "clean"),
    ]
    _write_docs(spark, tmp_path, rows)
    got = {
        r["source"]: r
        for r in q_encoding_anomaly_audit(spark, str(tmp_path)).collect()
    }
    d = got["dirty"]
    assert (d["n_ctrl"], d["n_replacement"]) == (1, 1)
    assert (d["n_entity"], d["n_tag"]) == (2, 2)
    assert d["n_mojibake"] == 1
    assert d["n_any"] == 6 and d["n_docs"] == 7
    c = got["clean"]
    assert c["n_any"] == 0 and c["n_docs"] == 1
