"""Pretraining-corpus curation operators: published rule-based and
importance-based document selection.

Published techniques every large-scale LM data pipeline runs between
raw crawl and tokenizer, each as a native-expression Catalyst plan:

- **Gopher quality rules** (Rae et al. 2021, "Scaling Language Models",
  Appendix A1.1): the reference rule set for cheap document filtering —
  word-count bounds, mean-word-length bounds, symbol-to-word ratio,
  alphabetic-word fraction, required-stopword presence. Reported here
  as a per-source rule-rejection audit (which rule fires how often),
  the report a curation run reviews before committing a filter config.
- **DSIR** (Xie et al. 2023, "Data Selection for Language Models via
  Importance Resampling"): hashed-bigram importance weights
  ``w(x) = Σ_b c_b(x)·(ln p_target[b] − ln p_raw[b])`` scoring every
  raw document by how target-domain-like its n-gram profile is.
- **Character-trigram entropy**: the distribution-level gibberish /
  boilerplate detector (low entropy → repeated boilerplate, near-max
  entropy → encrypted/random noise) run at character level, the
  complement of the word-level unigram surprisal score
  (operators/textstats.py::q_unigram_surprisal).
- **BPE merge-candidate counting** (Sennrich et al. 2016): the
  frequency-weighted adjacent-pair counts that pick a byte-pair
  tokenizer's next merge — the corpus-scale inner loop of tokenizer
  training.

All of these are single text passes whose shuffles carry only short keys
and counts (never document text), so they scale like the rest of the
dedup/textstats families: 100 TB in, map-side feature extraction,
vocab- or bucket-bounded aggregation out.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from cost_of_living_data_etl_spark.functions.checkpoints import (
    eager_checkpoint,
)
from cost_of_living_data_etl_spark.functions.columns import det_sum
from cost_of_living_data_etl_spark.plans.catalog import register
from cost_of_living_data_etl_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, Appendix A1.1)
# ---------------------------------------------------------------------------
# The published bounds. Line-shape rules (bullet-start / ellipsis-end
# line fractions) are omitted: the fixture corpus is single-line by
# construction (0 docs contain a newline at any SF), so those two rules
# are degenerate here; the five below are the ones with signal.

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
# The paper requires ≥2 of the eight; the fixture corpus's synthetic
# vocabulary contains exactly ONE of them ("the"), so the published
# threshold degenerates to reject-all here — the audit would carry no
# signal. 1 keeps the rule live on this corpus (docs with vs without
# "the"); a production config restores 2.
GOPHER_MIN_STOPWORDS = 1

# whitespace words of the trimmed text; empty text → empty array
# (split('') would yield [''], a phantom 1-token document)
_WS_SPARK = (
    "CASE WHEN length(trim(text)) = 0 THEN array() "
    "ELSE split(trim(text), '\\\\s+') END"
)
_WS_SQL = (
    "CASE WHEN length(trim(text)) = 0 THEN [] "
    "ELSE string_split_regex(trim(text), '\\s+') END"
)

_GOPHER_STOP_SQL = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)

_GOPHER_ORACLE = f"""
WITH feat AS (
    SELECT
        source,
        len(ws)                                                    AS n_words,
        length(regexp_replace(trim(text), '\\s+', '', 'g')) * 1.0
            / greatest(len(ws), 1)                                 AS mean_word_len,
        (length(regexp_extract_all(text, '#'))
         + length(regexp_extract_all(text, '\\.\\.\\.'))) * 1.0
            / greatest(len(ws), 1)                                 AS symbol_ratio,
        len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) * 1.0
            / greatest(len(ws), 1)                                 AS alpha_frac,
        len(list_filter([{_GOPHER_STOP_SQL}],
                        s -> list_contains(list_transform(ws, w -> lower(w)), s)))
                                                                   AS n_stop
    FROM (SELECT source, text, {_WS_SQL} AS ws FROM documents)
),
flags AS (
    SELECT
        source,
        (n_words < {GOPHER_MIN_WORDS} OR n_words > {GOPHER_MAX_WORDS}) AS f_words,
        (mean_word_len < {GOPHER_MIN_MEAN_WORD_LEN}
         OR mean_word_len > {GOPHER_MAX_MEAN_WORD_LEN})                AS f_wordlen,
        (symbol_ratio > {GOPHER_MAX_SYMBOL_RATIO})                     AS f_symbol,
        (alpha_frac < {GOPHER_MIN_ALPHA_WORD_FRAC})                    AS f_alpha,
        (n_stop < {GOPHER_MIN_STOPWORDS})                              AS f_stop
    FROM feat
)
SELECT
    source,
    CAST(count(*) AS BIGINT)                        AS n_docs,
    CAST(count(*) FILTER (f_words) AS BIGINT)       AS n_fail_word_count,
    CAST(count(*) FILTER (f_wordlen) AS BIGINT)     AS n_fail_word_length,
    CAST(count(*) FILTER (f_symbol) AS BIGINT)      AS n_fail_symbol_ratio,
    CAST(count(*) FILTER (f_alpha) AS BIGINT)       AS n_fail_alpha_words,
    CAST(count(*) FILTER (f_stop) AS BIGINT)        AS n_fail_stopwords,
    CAST(count(*) FILTER (NOT (f_words OR f_wordlen OR f_symbol
                               OR f_alpha OR f_stop)) AS BIGINT) AS n_pass,
    count(*) FILTER (NOT (f_words OR f_wordlen OR f_symbol
                          OR f_alpha OR f_stop)) * 1.0 / count(*) AS retention
FROM flags
GROUP BY source
"""


@register(
    "q_gopher_quality_rules",
    oracle=_GOPHER_ORACLE,
    tags=("text", "quality", "curation", "training-data"),
)
def q_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-based document filter audit (Rae et al. 2021,
    A1.1): per source, how many documents each rule rejects and what
    fraction survives all five — the dry-run report reviewed before a
    filter config is committed to a corpus build.

    Rules: word count in [{GOPHER_MIN_WORDS}, {GOPHER_MAX_WORDS}],
    mean word length in [3, 10], symbol-to-word ratio ('#' and '...')
    ≤ 0.1, ≥ 80% words containing an alphabetic character, ≥ 2 of the
    eight Gopher stopwords present.

    Plan shape: one projection computes every feature in a single
    text pass (each regex runs exactly once per row — features are
    materialized BEFORE the aggregate, same discipline as
    q_text_quality_by_source), then a 20-group conditional aggregate.
    Nothing but (source, 5 bools) crosses the Exchange: curation-audit
    cost at 100 TB is the parquet scan, full stop. The ratio
    thresholds compare single-division doubles — one IEEE op from
    exact integers on both engines, so the booleans (and therefore
    every count) are bit-identical; ``retention`` is one further
    division of exact counts.
    """
    ws = F.expr(_WS_SPARK)
    n_words = F.size(ws)
    feat = load_table(spark, sf_dir, "documents").select(
        "source",
        n_words.alias("n_words"),
        (
            F.length(F.regexp_replace(F.trim(F.col("text")), r"\s+", ""))
            / F.greatest(n_words, F.lit(1))
        ).alias("mean_word_len"),
        (
            (
                F.regexp_count(F.col("text"), F.lit("#"))
                + F.regexp_count(F.col("text"), F.lit(r"\.\.\."))
            )
            / F.greatest(n_words, F.lit(1))
        ).alias("symbol_ratio"),
        (
            F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]")))
            / F.greatest(n_words, F.lit(1))
        ).alias("alpha_frac"),
        F.size(
            F.filter(
                F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
                lambda s: F.array_contains(
                    F.transform(ws, lambda w: F.lower(w)), s
                ),
            )
        ).alias("n_stop"),
    )
    flags = feat.select(
        "source",
        (
            (F.col("n_words") < GOPHER_MIN_WORDS)
            | (F.col("n_words") > GOPHER_MAX_WORDS)
        ).alias("f_words"),
        (
            (F.col("mean_word_len") < GOPHER_MIN_MEAN_WORD_LEN)
            | (F.col("mean_word_len") > GOPHER_MAX_MEAN_WORD_LEN)
        ).alias("f_wordlen"),
        (F.col("symbol_ratio") > GOPHER_MAX_SYMBOL_RATIO).alias("f_symbol"),
        (F.col("alpha_frac") < GOPHER_MIN_ALPHA_WORD_FRAC).alias("f_alpha"),
        (F.col("n_stop") < GOPHER_MIN_STOPWORDS).alias("f_stop"),
    )
    fails = (
        F.col("f_words")
        | F.col("f_wordlen")
        | F.col("f_symbol")
        | F.col("f_alpha")
        | F.col("f_stop")
    )
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if("f_words").alias("n_fail_word_count"),
        F.count_if("f_wordlen").alias("n_fail_word_length"),
        F.count_if("f_symbol").alias("n_fail_symbol_ratio"),
        F.count_if("f_alpha").alias("n_fail_alpha_words"),
        F.count_if("f_stop").alias("n_fail_stopwords"),
        F.count_if(~fails).alias("n_pass"),
        (F.count_if(~fails) / F.count(F.lit(1))).alias("retention"),
    )


# ---------------------------------------------------------------------------
# DSIR hashed-bigram importance weights (Xie et al. 2023)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 256  # hashed feature dimension B
DSIR_TARGET_LANG = "en"  # the "target domain" slice
DSIR_TOPK = 25

# md5-prefix bucketing, the same 15-hex-digit trick the dedup /
# sampling families pin on both engines (15 hex < 2^60 — no int64
# overflow, no sign issues)
_BUCKET_SPARK = (
    f"cast(conv(substring(md5(bigram), 1, 15), 16, 10) AS BIGINT) % {DSIR_BUCKETS}"
)
_BUCKET_SQL = (
    f"CAST(('0x' || substr(md5(bigram), 1, 15)) AS BIGINT) % {DSIR_BUCKETS}"
)

# lowercased word tokens → adjacent-pair bigrams (identical extraction
# on both engines; see operators/textstats.py::lower_word_array)
_DSIR_WORDS_SPARK = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
_DSIR_WORDS_SQL = "regexp_extract_all(lower(text), '[a-z0-9]+')"
_DSIR_BIGRAMS_SPARK = (
    "zip_with(slice(ws, 1, greatest(size(ws) - 1, 0)), "
    "slice(ws, 2, greatest(size(ws) - 1, 0)), "
    "(a, b) -> concat(a, ' ', b))"
)
_DSIR_BIGRAMS_SQL = (
    "list_transform(range(1, greatest(length(ws), 1)), "
    "i -> ws[i] || ' ' || ws[i + 1])"
)

_DSIR_ORACLE = f"""
WITH docs_ws AS (
    SELECT doc_id, lang, {_DSIR_WORDS_SQL} AS ws FROM documents
),
occ AS (
    SELECT doc_id, lang, {_BUCKET_SQL} AS bucket
    FROM (
        SELECT doc_id, lang, unnest({_DSIR_BIGRAMS_SQL}) AS bigram
        FROM docs_ws
    )
),
dist AS (
    SELECT bucket,
           count(*) FILTER (lang = '{DSIR_TARGET_LANG}') AS c_t,
           count(*)                                      AS c_r
    FROM occ GROUP BY bucket
),
tot AS (
    SELECT sum(c_t) AS t_total, sum(c_r) AS r_total FROM dist
),
ratio AS (
    SELECT bucket,
           ln((c_t + 1.0) / (t_total + {DSIR_BUCKETS}))
           - ln((c_r + 1.0) / (r_total + {DSIR_BUCKETS})) AS log_ratio
    FROM dist, tot
),
doc_bucket AS (
    SELECT doc_id, bucket, count(*) AS cnt FROM occ GROUP BY doc_id, bucket
),
weights AS (
    SELECT d.doc_id,
           list_reduce(list_sort(list(d.cnt * r.log_ratio)),
                       (a, b) -> a + b)         AS weight,
           CAST(count(*) AS BIGINT)             AS n_buckets
    FROM doc_bucket d JOIN ratio r USING (bucket)
    GROUP BY d.doc_id
)
SELECT doc_id, weight, n_buckets
FROM weights
ORDER BY weight DESC, doc_id
LIMIT {DSIR_TOPK}
"""


@register(
    "q_dsir_importance_topk",
    oracle=_DSIR_ORACLE,
    tags=("text", "curation", "importance-sampling", "training-data"),
)
def q_dsir_importance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): score every raw
    document by how target-domain-like its hashed-bigram profile is —
    ``w(x) = Σ_b c_b(x)·(ln p̂_target[b] − ln p̂_raw[b])`` with
    Laplace-smoothed bucket distributions over B={DSIR_BUCKETS}
    hashed-bigram features; target slice = lang-'{DSIR_TARGET_LANG}'
    documents. Emits the top-{DSIR_TOPK} docs by weight — the ones
    importance resampling would draw first. Documents with < 2 word
    tokens have no bigram features and are out of scope (they carry
    no evidence either way).

    Plan shape (the DSIR paper's map-reduce layout, expressed in
    Catalyst): one text pass builds bigrams and hashes them to bucket
    ids IN the scan projection, so only (doc_id, bucket) pairs ever
    reach an Exchange — text and bigram strings stay map-side, the
    same no-strings-in-any-Exchange contract the setsim/minhash
    families pin. The two distributions come from ONE conditional
    aggregate over {DSIR_BUCKETS} groups; the 256-row log-ratio table
    broadcasts back; per-doc weights are a (doc_id, bucket, cnt)
    aggregate joined to that broadcast. At 100 TB: the only
    corpus-scale shuffle carries (doc_id, bucket, cnt) triples, and
    the final top-k is TakeOrderedAndProject (per-partition heaps, no
    global sort).

    Float determinism: per-doc weight folds cnt·log_ratio in sorted
    order from 0.0 on both engines (det_sum ≡ list_reduce∘list_sort)
    — bit-identical, so the (weight, doc_id) rank order the driver
    hashes cannot drift.
    """
    # parallel=True: the bigram build + hash is the serial map kernel;
    # every output is an exact count or a det_sum fold (order-free).
    # ONE explode pass (round 9; previously the occurrence stream was
    # derived twice — once for the distributions, once for the per-doc
    # counts): the (doc_id, lang, bucket) rollup is materialized and
    # BOTH the 256-bucket distributions and the per-doc weights derive
    # from it by exact-integer sums.
    occ = (
        load_table(spark, sf_dir, "documents", parallel=True)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    _DSIR_BIGRAMS_SPARK.replace("ws", f"({_DSIR_WORDS_SPARK})")
                )
            ).alias("bigram"),
        )
        .select("doc_id", "lang", F.expr(_BUCKET_SPARK).alias("bucket"))
    )
    dlb = (
        occ.groupBy("doc_id", "lang", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .transform(eager_checkpoint)
    )
    dist = dlb.groupBy("bucket").agg(
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, F.col("cnt")).otherwise(0)
        ).alias("c_t"),
        F.sum("cnt").alias("c_r"),
    )
    tot = dist.groupBy().agg(
        F.sum("c_t").alias("t_total"), F.sum("c_r").alias("r_total")
    )
    ratio = dist.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.log((F.col("c_t") + 1.0) / (F.col("t_total") + DSIR_BUCKETS))
            - F.log((F.col("c_r") + 1.0) / (F.col("r_total") + DSIR_BUCKETS))
        ).alias("log_ratio"),
    )
    doc_bucket = dlb.select("doc_id", "bucket", "cnt")
    weights = (
        doc_bucket.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            det_sum("cnt * log_ratio").alias("weight"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
    )
    return weights.orderBy(F.desc("weight"), F.asc("doc_id")).limit(DSIR_TOPK)


# ---------------------------------------------------------------------------
# character-trigram entropy (gibberish / boilerplate detector)
# ---------------------------------------------------------------------------

# Per-doc trigram-count run-length encoding, entirely inside the row:
# sort the trigram array, find run starts, difference consecutive
# starts into run lengths (= per-gram counts). No char-level row ever
# leaves the scan projection.
_SORTED_SPARK = (
    "array_sort(transform(sequence(1, length(text) - 2), "
    "i -> substring(text, i, 3)))"
)
# DuckDB range(a, b) is half-open [a, b); Spark sequence(a, b) is
# inclusive [a, b] — hence the +1. text[i : i + 2] is DuckDB's
# 1-based INCLUSIVE slice = 3 chars.
_SORTED_SQL = (
    "list_sort(list_transform(range(1, length(text) - 1), "
    "i -> text[i : i + 2]))"
)
# Per-doc entropy as ONE expression. Two structural tricks:
# - let-binding via `transform(array(X), s -> body)[1]`: Catalyst's
#   projection collapse inlines a column alias into EVERY downstream
#   reference, and higher-order functions are codegen-fallback (no
#   subexpression elimination) — a staged sorted/starts/lens pipeline
#   re-sorted the trigram array ~5× per row (measured SLOWER than the
#   explode plan it replaced). Binding the sorted array as a lambda
#   variable forces exactly one evaluation.
# - single left-to-right fold over positions with (run_start, acc)
#   struct state: a run closes at position i when i is last or
#   sorted[i+1] ≠ sorted[i], contributing c·ln c for c = i−start+1.
#   Runs close in ascending gram order from acc = 0.0 — an order both
#   engines reproduce exactly, so the fold is bit-identical without
#   any value re-sort.
_ENTROPY_DOC_SPARK = """
element_at(transform(array(
    array_sort(transform(sequence(1, length(text) - 2),
                         i -> substring(text, i, 3)))
), s ->
    ln(cast(size(s) AS DOUBLE)) -
    aggregate(
        sequence(1, size(s)),
        named_struct('st', 1, 'acc', cast(0.0 AS DOUBLE)),
        (a, i) -> CASE
            WHEN i = size(s)
                 OR try_element_at(s, i + 1) != element_at(s, i)
            THEN named_struct(
                'st', i + 1,
                'acc', a.acc + cast(i - a.st + 1 AS DOUBLE)
                              * ln(cast(i - a.st + 1 AS DOUBLE)))
            ELSE a END,
        a -> a.acc
    ) / cast(size(s) AS DOUBLE)
), 1)
"""

# DuckDB replay: same sorted array, run lengths via start-position
# differencing (ascending gram order = the Spark fold's run order),
# folded from a prepended 0.0. DuckDB range(a, b) is half-open;
# text[i : i + 2] is the 1-based INCLUSIVE 3-char slice.
_ENTROPY_ORACLE = """
WITH s1 AS (
    SELECT source,
           list_sort(list_transform(range(1, length(text) - 1),
                                    i -> text[i : i + 2])) AS sorted
    FROM documents WHERE length(text) >= 3
),
s2 AS (
    SELECT source, sorted,
           list_filter(range(1, len(sorted) + 1),
                       i -> i = 1 OR sorted[i] <> sorted[i - 1]) AS starts
    FROM s1
),
s3 AS (
    SELECT source, sorted,
           list_transform(range(1, len(starts) + 1),
                          j -> coalesce(starts[j + 1], len(sorted) + 1)
                               - starts[j]) AS lens
    FROM s2
),
doc AS (
    SELECT source,
           ln(CAST(len(sorted) AS DOUBLE))
           - list_reduce(
                 list_prepend(CAST(0.0 AS DOUBLE),
                              list_transform(lens,
                                  c -> CAST(c AS DOUBLE)
                                       * ln(CAST(c AS DOUBLE)))),
                 (acc, x) -> acc + x
             ) / CAST(len(sorted) AS DOUBLE) AS entropy_nats
    FROM s3
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       avg(entropy_nats)        AS avg_entropy,
       min(entropy_nats)        AS min_entropy,
       max(entropy_nats)        AS max_entropy
FROM doc GROUP BY source
"""


@register(
    "q_char_trigram_entropy",
    oracle=_ENTROPY_ORACLE,
    tags=("text", "quality", "curation"),
)
def q_char_trigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source character-trigram Shannon entropy of each document,
    H = ln n − (Σ c·ln c)/n nats — the distribution-shape quality
    signal: boilerplate and template spam repeat trigrams (entropy
    collapses toward 0), binary-in-text and mojibake push toward the
    ln(alphabet³) ceiling, natural prose sits in a stable band. The
    character-level complement of the word-level unigram surprisal
    filter; docs shorter than one trigram carry no distribution and
    are out of scope.

    Plan shape: the per-doc trigram distribution never leaves the row
    — sort the trigram array IN the scan projection (let-bound so it
    is computed exactly once; see _ENTROPY_DOC_SPARK), then a single
    left-to-right fold closes runs and accumulates Σ c·ln c. The first
    cut exploded one row per character position and partially
    aggregated (doc_id, gram) pairs — at sf0.1 that shuffle made this
    the single slowest bench query (3.7 s); the in-row form's only
    Exchange is the 20-group per-source rollup carrying (source, H)
    doubles. One text pass, zero data-scale shuffles at 100 TB.

    Float determinism: runs close in ascending gram order on both
    engines, so the Σ c·ln c additions happen in the identical
    sequence from 0.0, and H is derived with the same three IEEE ops;
    the per-source avg/min/max then aggregate bit-identical per-doc
    values.
    """
    doc = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") >= 3)
        .select("source", F.expr(_ENTROPY_DOC_SPARK).alias("entropy_nats"))
    )
    return doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("entropy_nats").alias("avg_entropy"),
        F.min("entropy_nats").alias("min_entropy"),
        F.max("entropy_nats").alias("max_entropy"),
    )


# ---------------------------------------------------------------------------
# BPE merge-candidate counting (Sennrich et al. 2016, the corpus-scale
# inner loop of byte-pair-encoding tokenizer training)
# ---------------------------------------------------------------------------

BPE_TOPK = 20


_BPE_ORACLE = f"""
WITH vocab AS (
    SELECT word, CAST(count(*) AS BIGINT) AS f
    FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
        FROM documents
    )
    GROUP BY word
),
pairs AS (
    SELECT pair, CAST(sum(f) AS BIGINT) AS merge_count
    FROM (
        SELECT f,
               unnest(list_transform(range(1, length(word)),
                                     i -> word[i : i + 1])) AS pair
        FROM vocab WHERE length(word) >= 2
    )
    GROUP BY pair
)
SELECT pair, merge_count
FROM pairs
ORDER BY merge_count DESC, pair
LIMIT {BPE_TOPK}
"""


@register(
    "q_bpe_merge_candidates",
    oracle=_BPE_ORACLE,
    tags=("text", "tokenizer", "bpe", "training-data"),
)
def q_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, iteration 1 (Sennrich et al. 2016):
    count adjacent-symbol pair frequencies over the corpus — each
    word contributes every adjacent character pair, weighted by the
    word's corpus frequency — and emit the top-{BPE_TOPK} merge
    candidates. The highest-count pair IS the first BPE merge; later
    iterations re-run this exact plan over re-segmented symbol
    sequences, so this query is the corpus-scale inner loop that
    dominates tokenizer-training cost (the merge table itself is
    O(vocab), driver-side).

    Plan shape: pass 1 collapses the corpus to the frequency-weighted
    word vocabulary (the shuffle carries (word, count) — vocab-bounded,
    the same contract as q_word_frequency_topk); pass 2 generates
    adjacent pairs IN the row (a CASE-guarded transform — Spark's
    sequence(1, 0) counts DOWN, so short words need the explicit
    empty-array branch), explodes per distinct word (not per
    occurrence), and aggregates over an alphabet²-bounded key space.
    Top-k is TakeOrderedAndProject. All counts are exact BIGINTs —
    nothing to pin.
    """
    vocab = (
        load_table(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    pairs = vocab.filter(F.length("word") >= 2).select(
        "f",
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1), "
                "i -> substring(word, i, 2))"
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("f").alias("merge_count"))
        .orderBy(F.desc("merge_count"), F.asc("pair"))
        .limit(BPE_TOPK)
    )


# ---------------------------------------------------------------------------
# encoding / markup anomaly audit (the CCNet/C4 cleanup gate)
# ---------------------------------------------------------------------------

#: rule predicates: (name, regex-or-literal). Booleans from exact
#: matches — nothing float anywhere — so the two engines only need to
#: agree on the VALUE; the regex dialect differs (Spark regexp_like vs
#: DuckDB regexp_matches), hence per-engine renderers below.
_ENC_RULES = [
    ("n_ctrl", ("re", r"[\x00-\x08\x0B\x0C\x0E-\x1F]")),
    ("n_replacement", ("lit", "�")),
    ("n_entity", ("re", "&(amp|lt|gt|quot|nbsp|#[0-9]+);")),
    ("n_tag", ("re", "</?(p|div|span|br|a|html|body)[ />]")),
    ("n_mojibake", ("lit2", "\u00e2\u20ac", "\u00c3\u00a9")),
]


def _enc_pred(rule: tuple, fn_re: str) -> str:
    """Render one rule for an engine: ``fn_re`` names its regex-match
    function (Spark ``regexp_like`` / DuckDB ``regexp_matches``), and
    Spark's string-literal parser consumes one level of backslash that
    DuckDB's does not — the VALUE is what must agree, not the text."""
    kind = rule[0]
    if kind == "re":
        pat = rule[1]
        if fn_re == "regexp_like":  # Spark literal: re-escape backslashes
            pat = pat.replace("\\", "\\\\")
        return f"{fn_re}(text, '{pat}')"
    if kind == "lit":
        return f"contains(text, '{rule[1]}')"
    return (
        f"contains(text, '{rule[1]}') OR contains(text, '{rule[2]}')"
    )


_ENC_ORACLE = f"""
WITH checks AS (
    SELECT source,
{",".join(f"           CASE WHEN {_enc_pred(r, 'regexp_matches')} THEN 1 ELSE 0 END AS {name}" for name, r in _ENC_RULES)}
    FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
{",".join(f"       CAST(sum({name}) AS BIGINT) AS {name}" for name, _ in _ENC_RULES)},
       CAST(sum(CASE WHEN {" + ".join(n for n, _ in _ENC_RULES)} > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_any
FROM checks
GROUP BY source
"""


@register(
    "q_encoding_anomaly_audit",
    oracle=_ENC_ORACLE,
    tags=("curation", "encoding", "mojibake", "audit"),
)
def q_encoding_anomaly_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source encoding/markup anomaly audit — the cleanup gate
    every web-scale corpus pipeline (C4, CCNet, RefinedWeb) runs
    before the statistical filters: control characters (binary leaked
    into text fields), U+FFFD replacement characters (a decode already
    went lossy upstream — unfixable, only detectable), residual HTML
    entities and tag fragments (boilerplate extraction failed), and
    the classic UTF-8-decoded-as-Latin-1 mojibake digraphs ('â€…',
    'Ã©'). Word-statistics rules (q_gopher_quality_rules) are blind to
    all five: a mojibake'd document has perfectly normal word lengths.

    Every rule is a regex/literal match evaluated once per row in one
    projection; only (source, 5 booleans) reach the Exchange; counts
    are exact BIGINTs — nothing float anywhere, so cross-engine
    equality is structural. Scale: one partial-aggregated scan,
    |sources| output rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    checks = docs.selectExpr(
        "source",
        *[
            f"CASE WHEN {_enc_pred(r, 'regexp_like')} THEN 1 ELSE 0 END"
            f" AS {name}"
            for name, r in _ENC_RULES
        ],
    )
    any_rule = None
    for name, _ in _ENC_RULES:
        any_rule = F.col(name) if any_rule is None else any_rule + F.col(name)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_docs")]
    aggs += [
        F.sum(name).cast("long").alias(name) for name, _ in _ENC_RULES
    ]
    aggs.append(F.sum((any_rule > 0).cast("int")).cast("long").alias("n_any"))
    return checks.groupBy("source").agg(*aggs)
