"""Property-based checks (SURVEY.md §5.4).

Each property generates adversarial inputs with hypothesis, ships them
through the REAL Spark expressions in one batch per example, and
compares against an independent Python reference. Spark jobs are slow,
so examples are capped and deadlines disabled.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cost_of_living_data_etl_spark.functions.columns import (
    decomma_to_double,
    with_county_suffix,
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# comma-grouped numerals like "1,234.56" / "-12,345" / "0.5"
_grouped_number = st.builds(
    lambda sign, intpart, frac: sign + f"{intpart:,}" + (f".{frac:02d}" if frac is not None else ""),
    st.sampled_from(["", "-"]),
    st.integers(min_value=0, max_value=10**12),
    st.one_of(st.none(), st.integers(min_value=0, max_value=99)),
)


@settings(**_SETTINGS)
@given(st.lists(_grouped_number, min_size=1, max_size=50))
def test_decomma_matches_python_float(spark, values):
    """decomma_to_double(x) == float(x.replace(',', '')) for any
    comma-grouped numeral (the reference's C2 lambda semantics)."""
    df = spark.createDataFrame([(v,) for v in values], "raw string")
    got = [r["d"] for r in df.select(decomma_to_double("raw").alias("d")).collect()]
    want = [float(v.replace(",", "")) for v in values]
    assert got == want


@settings(**_SETTINGS)
@given(st.lists(st.text(min_size=0, max_size=30), min_size=1, max_size=50))
def test_county_suffix_is_plain_concat(spark, values):
    """Suffix concat matches Python '+' for arbitrary unicode county
    names (C3) — no trimming, casefolding, or escaping surprises."""
    df = spark.createDataFrame([(v,) for v in values], "c string")
    got = [r["s"] for r in df.select(with_county_suffix("c").alias("s")).collect()]
    assert got == [v + " COUNTY" for v in values]


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=60),
    st.lists(st.integers(min_value=0, max_value=20), min_size=0, max_size=10),
)
def test_inner_join_count_bounded_union_additive(spark, fact_keys, dim_keys):
    """Inner-join output ≤ |fact| × max-dup-factor; with a UNIQUE dim,
    output ≤ |fact| exactly; union-all counts are additive."""
    fact = spark.createDataFrame([(k,) for k in fact_keys], "k int")
    dim = spark.createDataFrame(
        [(k,) for k in sorted(set(dim_keys))] or [(None,)], "k int"
    ).filter(F.col("k").isNotNull())
    joined = fact.join(dim, "k", "inner")
    assert joined.count() == sum(1 for k in fact_keys if k in set(dim_keys))
    assert fact.unionAll(fact).count() == 2 * len(fact_keys)


@settings(**_SETTINGS)
@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=80))
def test_split_assignment_partitions_and_is_stable(spark, ids):
    """Every id lands in exactly one of train/val/test, assignment is a
    pure function of the id (same id duplicated → same split), and the
    three counts sum to the input size."""
    rows = [(i,) for i in ids] + [(i,) for i in ids]  # duplicates on purpose
    df = spark.createDataFrame(rows, "doc_id long")
    b = F.expr(
        "cast(conv(substring(md5(cast(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % 100"
    )
    split = F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    out = df.select("doc_id", split.alias("split")).collect()
    by_id: dict[int, set[str]] = {}
    for r in out:
        by_id.setdefault(r["doc_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_id.values())  # stable per id
    assert len(out) == 2 * len(ids)


def test_minhash_bucket_cap_is_subset(spark):
    """The capped pair plan returns a subset of the uncapped pairs
    (it can only DROP candidates), and a cap of 1 kills all pairs
    (every matching bucket has ≥2 members by construction)."""
    from cost_of_living_data_etl_spark.operators.dedup import minhash_pair_plan

    sf = "/root/testdata/sf0.001"
    full = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in minhash_pair_plan(spark, sf).collect()
    }
    capped = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in minhash_pair_plan(spark, sf, max_bucket=3).collect()
    }
    assert capped <= full
    assert minhash_pair_plan(spark, sf, max_bucket=1).count() == 0
    assert len(full) > 0


@settings(**_SETTINGS)
@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=40), min_size=1, max_size=30))
def test_identical_texts_get_identical_shingles(spark, texts):
    """shingle_docs is a pure function of text: duplicated documents
    produce element-wise identical shingle sets (the invariant MinHash
    dedup correctness rests on)."""
    from cost_of_living_data_etl_spark.operators.dedup import shingle_docs

    n = len(texts)
    rows = [(i, t) for i, t in enumerate(texts)] + [
        (i + n, t) for i, t in enumerate(texts)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = {r["doc_id"]: r["shingles"] for r in shingle_docs(docs).collect()}
    for i in range(n):
        assert sh[i] == sh[i + n]


@settings(**_SETTINGS)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="ascii", exclude_characters="\x00"
            ),
            min_size=0,
            max_size=80,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_pii_redaction_is_idempotent(spark, texts):
    """redact(redact(x)) == redact(x): replacement tokens contain no
    characters any detector matches, so a second pass is a no-op —
    the property that makes re-running a scrub job safe."""
    from cost_of_living_data_etl_spark.operators.pii import redact_pii

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["i", "text"]
    )
    out = df.select(
        "i",
        redact_pii(F.col("text")).alias("once"),
        redact_pii(redact_pii(F.col("text"))).alias("twice"),
    )
    assert all(r["once"] == r["twice"] for r in out.collect())


@settings(**_SETTINGS)
@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=100,
    )
)
def test_histogram_bins_partition_all_rows(spark, values):
    """Clamped equi-width binning loses no rows: bin counts sum to the
    row count and every bin id is in [0, nbins)."""
    lo, hi, nbins = 0.0, 400_000.0, 20
    width = (hi - lo) / nbins
    df = spark.createDataFrame([(v,) for v in values], ["x"])
    bin_id = F.least(
        F.greatest(F.floor((F.col("x") - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(nbins - 1),
    ).cast("long")
    rows = df.select(bin_id.alias("b")).groupBy("b").count().collect()
    assert sum(r["count"] for r in rows) == len(values)
    assert all(0 <= r["b"] < nbins for r in rows)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from("ab cd"), min_size=0, max_size=400
        ),
        min_size=1,
        max_size=12,
    )
)
def test_chunking_covers_every_token_with_correct_overlap(spark, texts):
    """Sliding-window chunking invariants for arbitrary texts:
    (1) chunk count matches the shared integer formula,
    (2) token coverage: chunk token counts sum to n + (n_chunks-1)*overlap
        for docs longer than one window (full chunks overlap by W-S), and
    (3) every chunk except the last has exactly W tokens when n > W
        ... verified against a pure-Python re-implementation."""
    from cost_of_living_data_etl_spark.plans.corpus_prep import (
        CHUNK_STRIDE,
        CHUNK_W,
        q_chunk_documents_overlap,
    )

    rows = [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        out = q_chunk_documents_overlap(spark, d).collect()

    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["n_chunk_tokens"], r["chunk_hash"])
        )
    for i, t in enumerate(texts):
        toks = [x for x in t.strip().split() if x] if t.strip() else []
        n = len(toks)
        n_chunks = 1 if n <= CHUNK_W else (n - CHUNK_W + CHUNK_STRIDE - 1) // CHUNK_STRIDE + 1
        chunks = sorted(got.get(i, []))
        assert len(chunks) == n_chunks, (i, n, len(chunks), n_chunks)
        # python reference of every chunk
        import hashlib

        for idx, (cidx, ntok, chash) in enumerate(chunks):
            ref = toks[idx * CHUNK_STRIDE : idx * CHUNK_STRIDE + CHUNK_W]
            assert cidx == idx
            assert ntok == len(ref)
            assert chash == hashlib.md5(" ".join(ref).encode()).hexdigest()


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "B", "C"]),
            st.integers(min_value=0, max_value=10**6),
        ),
        min_size=1,
        max_size=80,
    ),
    st.integers(min_value=0, max_value=80),
)
def test_incremental_merge_equals_one_pass_for_any_split_point(spark, rows, cut):
    """Partial-aggregate maintenance must be split-point-invariant:
    merging (sum, count) partials of ANY base/delta partition of the
    input equals the one-pass aggregate."""
    df = spark.createDataFrame(
        [(g, float(v) / 100.0, i) for i, (g, v) in enumerate(rows)],
        "grp string, val double, seq long",
    )

    def partial(d):
        return d.groupBy("grp").agg(
            F.sum("val").alias("s"), F.count(F.lit(1)).alias("c")
        )

    merged = (
        partial(df.filter(F.col("seq") < cut))
        .unionByName(partial(df.filter(F.col("seq") >= cut)))
        .groupBy("grp")
        .agg(F.round(F.sum("s"), 6).alias("s"), F.sum("c").alias("c"))
    )
    direct = df.groupBy("grp").agg(
        F.round(F.sum("val"), 6).alias("s"), F.count(F.lit(1)).alias("c")
    )
    got = {r["grp"]: (r["s"], r["c"]) for r in merged.collect()}
    want = {r["grp"]: (r["s"], r["c"]) for r in direct.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1]
        assert abs(got[k][0] - want[k][0]) < 1e-6
